"""Distributed multigrid over a device mesh (BASELINE.json config 4).

Architecture (round 1 — see SURVEY.md §7.1.6):

- The **finest level** (which dominates the cycle's work — SURVEY.md §3.2)
  is block-partitioned over a `jax.sharding.Mesh` with one named axis per
  grid dimension.  Smoother sweeps and residual SpMVs run inside
  `jax.shard_map` with per-dim `ppermute` halo exchange
  (:mod:`poms_tpu.parallel.halo`) and `psum` norms.
- **Coarser levels** are agglomerated: the restricted residual is
  `all_gather`-ed (tiled) and the inner cycle runs replicated on every
  device — the standard coarse-grid agglomeration strategy.  Distributing
  the transfer/RAP chain level-by-level is the round-2 refinement.

Grid sizes need not divide the mesh: the fine level is padded to the next
multiple with *decoupled identity rows* (diag 1, zero coupling, zero RHS),
which XLA-style tiling makes exactly invisible to the solve — padded
entries stay 0, norms and residuals are unchanged (tests assert sharded ≡
serial to f64 roundoff).
"""
from __future__ import annotations

import math
import time
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from poms_tpu.core.vector import StencilVector
from poms_tpu.mg.cycles import CycleConfig, cycle
from poms_tpu.mg.hierarchy import build_hierarchy
from poms_tpu.mg.smoother import color_mask
from poms_tpu.mg.solver import SolveResult
from poms_tpu.models.poisson import PoissonProblem
from poms_tpu.ops.transfer import apply_transfer
from poms_tpu.parallel.halo import (HaloSpec, dist_norm2, dist_spmv,
                                    dist_spmv_offdiag, local_starts)

__all__ = ["DistributedMG"]

_AXIS_NAMES = ("ax0", "ax1", "ax2", "ax3")


def _pad_band_identity(band: np.ndarray, npts, N, pads) -> np.ndarray:
    """Pad grid dims to N with decoupled identity rows."""
    d = len(npts)
    pad_widths = [(0, N[a] - npts[a]) for a in range(d)] + [(0, 0)] * d
    bp = np.pad(np.asarray(band), pad_widths)
    # set diagonal 1 on padded rows
    diag_idx = tuple(pads)
    mask = np.zeros(N, bool)
    for a in range(d):
        idx = [slice(None)] * d
        idx[a] = slice(npts[a], N[a])
        mask[tuple(idx)] = True
    diag_view = bp[(Ellipsis,) + diag_idx]  # basic indexing -> view
    diag_view[mask] = 1.0
    return bp


class DistributedMG:
    """Sharded-fine-level multigrid solver (semantics ≡ MultigridSolver)."""

    def __init__(self, problem: PoissonProblem, num_levels: int,
                 mesh_shape: Tuple[int, ...],
                 cfg: CycleConfig = CycleConfig(), devices=None):
        if num_levels < 2:
            raise ValueError("DistributedMG needs >= 2 levels")
        if cfg.smoother.kind not in ("jacobi", "rbgs"):
            raise ValueError(
                f"smoother {cfg.smoother.kind!r} is not distributed "
                "(gs_lex is sequential — SURVEY.md §7.2.2)")
        d = problem.dim
        mesh_shape = tuple(mesh_shape) + (1,) * (d - len(mesh_shape))
        self.cfg = cfg
        self.problem = problem
        self.levels = build_hierarchy(problem, num_levels)
        self.names = _AXIS_NAMES[:d]
        devices = devices if devices is not None else jax.devices()
        ndev = math.prod(mesh_shape)
        if ndev > len(devices):
            raise ValueError(f"mesh {mesh_shape} needs {ndev} devices, "
                             f"have {len(devices)}")
        self.mesh = jax.make_mesh(mesh_shape, self.names,
                                  devices=devices[:ndev])

        sp = problem.space
        npts, pads = sp.npts, sp.pads
        self.npts = npts
        self.N = tuple(-(-npts[a] // mesh_shape[a]) * mesh_shape[a]
                       for a in range(d))
        n_loc = tuple(self.N[a] // mesh_shape[a] for a in range(d))
        self.spec = HaloSpec.build(self.names, mesh_shape, n_loc, pads,
                                   sp.periodic)
        # padded fine-level data
        fine = self.levels[0]
        self.band_pad = jnp.asarray(
            _pad_band_identity(np.asarray(fine.A.band), npts, self.N, pads),
            sp.dtype)
        self._grid_spec = P(*self.names)
        self._band_spec = P(*(self.names + (None,) * d))
        self._step = jax.jit(self._build_step())

    # ------------------------------------------------------------------
    def _pad_global(self, arr_int) -> jnp.ndarray:
        arr = jnp.asarray(arr_int)
        return jnp.pad(arr, [(0, self.N[a] - self.npts[a])
                             for a in range(len(self.N))])

    def _build_step(self):
        spec = self.spec
        cfg = self.cfg
        names = self.names
        npts = self.npts
        N = self.N
        coarse_levels = self.levels[1:]
        restrict0 = self.levels[0].restrict
        prolong0 = self.levels[0].prolong
        n_loc = spec.n_loc
        omega = cfg.smoother.omega
        kind = cfg.smoother.kind

        def smooth(band_loc, diag_loc, x_loc, b_loc):
            if kind == "jacobi":
                Ax = dist_spmv(band_loc, x_loc, spec)
                return x_loc + omega * (b_loc - Ax) / diag_loc
            # rbgs with global parity
            starts = local_starts(spec)
            for color in (0, 1):
                mask = color_mask(n_loc, color, starts)
                s = dist_spmv_offdiag(band_loc, x_loc, spec)
                gs = (b_loc - s) / diag_loc
                x_loc = jnp.where(mask, (1 - omega) * x_loc + omega * gs,
                                  x_loc)
            return x_loc

        def body(band_loc, x_loc, b_loc, coarse, restr, prol):
            diag_loc = band_loc[(...,) + tuple(spec.pads)]
            for _ in range(cfg.nu1):
                x_loc = smooth(band_loc, diag_loc, x_loc, b_loc)
            r_loc = b_loc - dist_spmv(band_loc, x_loc, spec)
            # agglomerate: tiled all_gather along each sharded dim
            r_full = r_loc
            for a, name in enumerate(names):
                r_full = jax.lax.all_gather(r_full, name, axis=a, tiled=True)
            r_int = r_full[tuple(slice(0, n) for n in npts)]
            b_c_int = apply_transfer(restr, r_int)
            sp_c = coarse[0].A.space
            b_c = StencilVector.from_interior(sp_c, b_c_int)
            x_c = StencilVector.zeros(sp_c)
            for _ in range(cfg.gamma):
                x_c = cycle(coarse, 0, x_c, b_c, cfg)
            corr = apply_transfer(prol, x_c.interior)
            corr_pad = jnp.pad(corr, [(0, N[a] - npts[a])
                                      for a in range(len(N))])
            starts = local_starts(spec)
            corr_loc = jax.lax.dynamic_slice(corr_pad, starts, n_loc)
            x_loc = x_loc + corr_loc
            for _ in range(cfg.nu2):
                x_loc = smooth(band_loc, diag_loc, x_loc, b_loc)
            r_loc = b_loc - dist_spmv(band_loc, x_loc, spec)
            rn = dist_norm2(r_loc, spec)
            return x_loc, rn

        rep = P()
        coarse_specs = jax.tree.map(lambda _: rep, coarse_levels)
        restr_specs = jax.tree.map(lambda _: rep, restrict0)
        prol_specs = jax.tree.map(lambda _: rep, prolong0)
        return jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(self._band_spec, self._grid_spec, self._grid_spec,
                      coarse_specs, restr_specs, prol_specs),
            out_specs=(self._grid_spec, rep))

    # ------------------------------------------------------------------
    def step(self, x_glob: jnp.ndarray, b_glob: jnp.ndarray):
        """One cycle on padded global arrays; returns (x, ‖r‖)."""
        return self._step(self.band_pad, x_glob, b_glob, self.levels[1:],
                          self.levels[0].restrict, self.levels[0].prolong)

    def solve(self, b: StencilVector = None, tol: float = 1e-10,
              maxiter: int = 50) -> SolveResult:
        b = b if b is not None else self.problem.b
        b_glob = self._pad_global(b.interior)
        x_glob = jnp.zeros_like(b_glob)
        # r0 = ||b|| since x0 = 0
        residuals = [float(jnp.linalg.norm(b.interior))]
        wall = []
        it, converged = 0, residuals[-1] <= tol
        while not converged and it < maxiter:
            t0 = time.perf_counter()
            x_glob, rn = self.step(x_glob, b_glob)
            rn = float(rn)
            wall.append(time.perf_counter() - t0)
            residuals.append(rn)
            it += 1
            converged = rn <= tol
        # host-side unpad (eager slicing of a sharded array is restricted
        # under sharding-in-types; the solve is over, so a host copy is fine)
        x_int = np.asarray(x_glob)[tuple(slice(0, n) for n in self.npts)]
        x = StencilVector.from_interior(self.problem.space, x_int)
        return SolveResult(x=x, residuals=residuals, iterations=it,
                           converged=converged, wall_times=wall)
