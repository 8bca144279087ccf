"""Halo-padded stencil vectors (functional, pytree-registered).

TPU-native analogue of the reference's ``StencilVector`` (SURVEY.md §2 C2,
[recall:high]).  Differences forced by JAX semantics:

- vectors are immutable; every operation returns a new ``StencilVector``
  (XLA turns the copies into in-place buffer reuse under jit);
- ``update_ghost_regions`` is a pure function.  In serial it fills ghosts by
  periodic wrap or zeros; the distributed version (ppermute over a mesh axis)
  lives in :mod:`poms_tpu.parallel.halo` and is used inside ``shard_map``
  (SURVEY.md §2 C10, §5.7/8).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from poms_tpu.core.space import StencilVectorSpace

__all__ = ["StencilVector", "update_ghosts_serial"]


def _axis_slices(ndim: int, axis: int, sl: slice) -> Tuple[slice, ...]:
    return tuple(sl if a == axis else slice(None) for a in range(ndim))


def update_ghosts_serial(data: jnp.ndarray, space: StencilVectorSpace) -> jnp.ndarray:
    """Fill the ghost regions of a padded array (single-device semantics).

    Periodic dims wrap the opposite interior slab into the ghosts; non-periodic
    dims get zeros.  Mirrors the reference's ``update_ghost_regions`` contract
    (SURVEY.md §3.4) without any communication.
    """
    nd = space.ndim
    for a, (n, p, per) in enumerate(zip(space.npts, space.pads, space.periodic)):
        if p == 0:
            continue
        lo_ghost = _axis_slices(nd, a, slice(0, p))
        hi_ghost = _axis_slices(nd, a, slice(p + n, p + n + p))
        if per:
            lo_src = _axis_slices(nd, a, slice(n, n + p))        # last p interior
            hi_src = _axis_slices(nd, a, slice(p, p + p))        # first p interior
            data = data.at[lo_ghost].set(data[lo_src])
            data = data.at[hi_ghost].set(data[hi_src])
        else:
            zeros_lo = jnp.zeros(data[lo_ghost].shape, data.dtype)
            zeros_hi = jnp.zeros(data[hi_ghost].shape, data.dtype)
            data = data.at[lo_ghost].set(zeros_lo)
            data = data.at[hi_ghost].set(zeros_hi)
    return data


@jax.tree_util.register_pytree_node_class
class StencilVector:
    """A field over a :class:`StencilVectorSpace`, stored padded with ghosts.

    ``data`` has shape ``space.padded_shape``; the interior is
    ``data[space.interior]``.  Arithmetic operates on the whole padded array
    (ghosts are refreshed before any stencil application, so stale ghosts are
    harmless); reductions (dot, norm) use only the interior.
    """

    __slots__ = ("space", "data")

    def __init__(self, space: StencilVectorSpace, data: jnp.ndarray | None = None):
        self.space = space
        if data is None:
            data = jnp.zeros(space.padded_shape, space.dtype)
        self.data = data

    # -- constructors -------------------------------------------------------
    @classmethod
    def from_interior(cls, space: StencilVectorSpace, interior) -> "StencilVector":
        interior = jnp.asarray(interior, space.dtype)
        if interior.shape != space.shape:
            raise ValueError(f"interior shape {interior.shape} != {space.shape}")
        pads = [(p, p) for p in space.pads]
        return cls(space, jnp.pad(interior, pads))

    @classmethod
    def zeros(cls, space: StencilVectorSpace) -> "StencilVector":
        return cls(space)

    # -- views --------------------------------------------------------------
    @property
    def interior(self) -> jnp.ndarray:
        return self.data[self.space.interior]

    def toarray(self):
        """Flattened interior as a host numpy array (scipy interop)."""
        import numpy as np

        return np.asarray(self.interior).ravel()

    # -- ghost management ---------------------------------------------------
    def update_ghost_regions(self) -> "StencilVector":
        return StencilVector(self.space, update_ghosts_serial(self.data, self.space))

    # -- algebra ------------------------------------------------------------
    def __add__(self, other):
        return StencilVector(self.space, self.data + other.data)

    def __sub__(self, other):
        return StencilVector(self.space, self.data - other.data)

    def __mul__(self, scalar):
        return StencilVector(self.space, self.data * scalar)

    __rmul__ = __mul__

    def __neg__(self):
        return StencilVector(self.space, -self.data)

    def axpy(self, alpha, other: "StencilVector") -> "StencilVector":
        return StencilVector(self.space, self.data + alpha * other.data)

    def dot(self, other: "StencilVector") -> jnp.ndarray:
        """Interior inner product (serial; distributed version uses psum)."""
        return jnp.vdot(self.interior, other.interior)

    def norm(self) -> jnp.ndarray:
        return jnp.sqrt(self.dot(self))

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        return (self.data,), self.space

    @classmethod
    def tree_unflatten(cls, space, children):
        (data,) = children
        return cls(space, data)

    def __repr__(self):
        return f"StencilVector(space={self.space.npts}, pads={self.space.pads})"
