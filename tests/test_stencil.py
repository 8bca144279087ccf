"""Container + SpMV tests against the scipy oracle (SURVEY.md §4 tier 1).

The reference's dominant test style [recall:med]: build a stencil matrix with
random band data, convert with tocsr/toarray, assert banded dot ≡ CSR dot.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from poms_tpu.core.matrix import StencilMatrix
from poms_tpu.core.space import StencilVectorSpace
from poms_tpu.core.vector import StencilVector


def random_stencil(npts, pads, periodic=False, seed=0):
    """Random banded operator with boundary-legal rows (non-periodic)."""
    rng = np.random.default_rng(seed)
    space = StencilVectorSpace(npts=npts, pads=pads, periodic=periodic)
    band = rng.standard_normal(space.npts + space.band_shape)
    # zero out entries reaching outside the domain in non-periodic dims
    for a, (n, p, per) in enumerate(zip(space.npts, space.pads, space.periodic)):
        if per:
            continue
        i = np.arange(n).reshape([-1 if b == a else 1 for b in range(space.ndim)]
                                 + [1] * space.ndim)
        off = np.arange(2 * p + 1).reshape(
            [1] * space.ndim + [-1 if b == a else 1 for b in range(space.ndim)])
        col = i + off - p
        band = np.where((col < 0) | (col >= n), 0.0, band)
    A = StencilMatrix.from_band(space, band)
    return space, A


CASES = [
    ((13,), (2,), (False,)),
    ((16,), (3,), (True,)),
    ((9, 11), (2, 1), (False, False)),
    ((8, 8), (2, 2), (True, False)),
    ((6, 7, 8), (1, 2, 1), (False, False, False)),
    ((6, 6, 6), (2, 2, 2), (True, True, True)),
]


@pytest.mark.parametrize("npts,pads,periodic", CASES)
def test_spmv_vs_scipy(npts, pads, periodic):
    space, A = random_stencil(npts, pads, periodic, seed=42)
    rng = np.random.default_rng(7)
    x_int = rng.standard_normal(npts)
    x = StencilVector.from_interior(space, x_int)
    y = A.dot(x)
    y_ref = A.tocsr() @ x_int.ravel()
    np.testing.assert_allclose(y.toarray(), y_ref, rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("npts,pads,periodic", CASES[:4])
def test_interchange_roundtrip(npts, pads, periodic):
    space, A = random_stencil(npts, pads, periodic, seed=3)
    coo = A.tocoo()
    B = StencilMatrix.from_coo(space, coo.row, coo.col, coo.data)
    np.testing.assert_allclose(np.asarray(B.band), np.asarray(A.band),
                               rtol=0, atol=1e-14)
    # dense round trip
    np.testing.assert_allclose(B.toarray(), A.toarray(), atol=1e-14)


def test_toarray_matches_manual_1d():
    space, A = random_stencil((6,), (1,), (False,), seed=1)
    D = A.toarray()
    band = np.asarray(A.band)
    for i in range(6):
        for k in range(3):
            j = i + k - 1
            if 0 <= j < 6:
                assert D[i, j] == pytest.approx(band[i, k])


def test_transpose():
    space, A = random_stencil((9, 7), (2, 2), (False, False), seed=5)
    At = A.transpose()
    np.testing.assert_allclose(At.toarray(), A.toarray().T, atol=1e-14)


def test_diagonal():
    space, A = random_stencil((5, 5), (1, 1), (False, False), seed=2)
    np.testing.assert_allclose(np.asarray(A.diagonal()).ravel(),
                               np.diag(A.toarray()), atol=1e-14)


def test_vector_algebra_and_norm():
    space = StencilVectorSpace(npts=(10, 5), pads=(2, 1), periodic=False)
    rng = np.random.default_rng(0)
    a_int = rng.standard_normal((10, 5))
    b_int = rng.standard_normal((10, 5))
    va = StencilVector.from_interior(space, a_int)
    vb = StencilVector.from_interior(space, b_int)
    np.testing.assert_allclose(float(va.dot(vb)), np.vdot(a_int, b_int),
                               rtol=1e-13)
    np.testing.assert_allclose(float(va.norm()), np.linalg.norm(a_int),
                               rtol=1e-13)
    vc = va.axpy(2.5, vb)
    np.testing.assert_allclose(np.asarray(vc.interior), a_int + 2.5 * b_int,
                               rtol=1e-13)


def test_periodic_ghost_wrap():
    space = StencilVectorSpace(npts=(8,), pads=(2,), periodic=True)
    x = StencilVector.from_interior(space, np.arange(8.0))
    xg = x.update_ghost_regions()
    np.testing.assert_allclose(np.asarray(xg.data[:2]), [6.0, 7.0])
    np.testing.assert_allclose(np.asarray(xg.data[-2:]), [0.0, 1.0])


def test_bsr_view():
    space, A = random_stencil((8, 8), (1, 1), (False, False), seed=9)
    bsr = A.tobsr(blocksize=(4, 4))
    np.testing.assert_allclose(bsr.toarray(), A.toarray(), atol=1e-14)
