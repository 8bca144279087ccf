"""On-chip Pallas smoke test (VERDICT r2 ask #9; SURVEY §4 tier b).

The suite runs on the CPU mesh (conftest pins jax_platforms=cpu), so a
Mosaic regression would otherwise surface only as a bad BENCH number.
This test spawns a subprocess WITHOUT the cpu override, compiles the tiny
production kernels on the real chip under a hard timeout, and checks them
against the jnp twins.

Gating: runs when POMS_ONCHIP_TEST=1 is set, or when a quick probe finds a
reachable TPU; skips cleanly otherwise (including when the tunnel is
wedged — probe timeout == skip, not failure).
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # excluded from the default fast selection

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))

_WORKER = r"""
import jax, jax.numpy as jnp, numpy as np
assert jax.devices()[0].platform not in ("cpu", "gpu"), jax.devices()
from poms_tpu.ops.spmv import spmv_banded_jnp
from poms_tpu.ops.pallas.spmv import (spmv_banded_pallas,
                                      jacobi_fused_pallas,
                                      residual_fused_pallas,
                                      rbgs_color_pallas)
rng = np.random.default_rng(0)
npts, pads = (8, 16, 128), (2, 2, 2)
w = tuple(2 * p + 1 for p in pads)
band = jnp.asarray(rng.standard_normal(w + npts), jnp.float32) / 16.0
# diagonally dominant: smoother updates divide by diag, and a random
# near-zero diagonal amplifies f32 rounding into O(1) spurious "errors"
band = band.at[pads].add(2.0)
x = jnp.asarray(rng.standard_normal(tuple(n + 2 * p for n, p in
                                          zip(npts, pads))), jnp.float32)
b = jnp.asarray(rng.standard_normal(npts), jnp.float32)
ref = spmv_banded_jnp(band, x, npts, pads)
out = spmv_banded_pallas(band, x, npts, pads)
err = float(jnp.max(jnp.abs(out - ref)))
assert err < 1e-4 * float(jnp.max(jnp.abs(ref))), ("spmv", err)
diag = band[pads]
x_int = x[tuple(slice(p, p + n) for n, p in zip(npts, pads))]
ref_j = x_int + 0.8 * (b - ref) / diag
out_j = jacobi_fused_pallas(band, x, b, 0.8, npts, pads)
errj = float(jnp.max(jnp.abs(out_j - ref_j)))
assert errj < 1e-3, ("jacobi", errj)
out_r = residual_fused_pallas(band, x, b, npts, pads)
errr = float(jnp.max(jnp.abs(out_r - (b - ref))))
assert errr < 1e-3, ("residual", errr)
from poms_tpu.mg.smoother import color_mask
s = ref - diag * x_int
gs = (b - s) / diag
mask = color_mask(npts, 0, None)
ref_c = jnp.where(mask, 0.2 * x_int + 0.8 * gs, x_int)
out_c = rbgs_color_pallas(band, x, b, 0.8, 0, npts, pads)
errc = float(jnp.max(jnp.abs(out_c - ref_c)))
assert errc < 1e-3, ("rbgs", errc)
# fused kron apply vs the XLA path (forced off via env for the reference)
import os
from poms_tpu.core.kron import KroneckerSumOperator
from poms_tpu.core.space import StencilVectorSpace
from poms_tpu.ops.pallas.kron import kron_apply_pallas
kn = (8, 16, 128)
sp_k = StencilVectorSpace(npts=kn, pads=(2, 2, 2), periodic=False,
                          dtype=jnp.float32)
Ks = [jnp.asarray(rng.standard_normal((n, 5)), jnp.float32) / 4 for n in kn]
Ms = [jnp.asarray(rng.standard_normal((n, 5)), jnp.float32) / 4 for n in kn]
terms = [[Ks[b] if b == a else Ms[b] for b in range(3)] for a in range(3)]
op = KroneckerSumOperator(sp_k, terms)
xk = jnp.asarray(rng.standard_normal(kn), jnp.float32)
os.environ["POMS_TPU_KRON"] = "jnp"
ref_k = op._apply_interior(xk)
del os.environ["POMS_TPU_KRON"]
out_k = kron_apply_pallas(op.terms, xk, kn, (2, 2, 2), (False,) * 3)
errk = float(jnp.max(jnp.abs(out_k - ref_k)))
assert errk < 1e-3 * float(jnp.max(jnp.abs(ref_k))), ("kron", errk)
print("ONCHIP_OK", err, errj, errr, errc, errk)
"""


def _tpu_reachable(timeout_s: int = 45) -> bool:
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "assert jax.devices()[0].platform not in ('cpu','gpu');"
             "jnp.ones(4).block_until_ready()"],
            timeout=timeout_s, capture_output=True, env=_clean_env())
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _clean_env():
    env = dict(os.environ)
    # drop the suite's CPU-mesh flags so the child sees the real backend
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.parametrize("engine", ["v1", "v2"])
def test_pallas_kernels_on_chip(engine):
    """Both production engines on the real chip (VERDICT r3 ask #2: the
    round-3 smoke test only ever exercised the default v1)."""
    if not os.environ.get("POMS_ONCHIP_TEST") and not _tpu_reachable():
        pytest.skip("no reachable TPU (set POMS_ONCHIP_TEST=1 to force)")
    env = _clean_env()
    env["POMS_TPU_SPMV"] = engine
    try:
        proc = subprocess.run([sys.executable, "-c", _WORKER],
                              timeout=900, capture_output=True, text=True,
                              env=env)
    except subprocess.TimeoutExpired:
        pytest.fail("on-chip smoke test timed out (tunnel stall?)")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "ONCHIP_OK" in proc.stdout, proc.stdout
