"""Roofline benchmark harness: achieved GB/s and nnz/s vs speed-of-light.

SURVEY.md §5.1 / BASELINE.md: every hot kernel is profiled against the HBM
roofline.  Banded stencil SpMV streams the band coefficients once
((2p+1)^d × 4B per grid point — the dominant term for d ≥ 2), reads x and
writes y, so

    bytes = (band_terms + 2) * grid_points * dtype_size       (+ O(halo))
    nnz   = band_terms * grid_points

Timing methodology (important on this machine): the TPU is reached through
an async tunnel where per-call dispatch/fetch timing is unreliable
(block_until_ready can return early and host reads can stall).  So kernels
are timed as K *chained* iterations inside one jitted ``lax.fori_loop``
(device-side loop, one dispatch + one 4-byte scalar fetch per measurement)
and two runs with K and 2K iterations are differenced to cancel fixed
overheads.
"""
from __future__ import annotations

import math
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["sol_bandwidth", "bench_spmv", "bench_vcycle", "BenchResult",
           "time_step_loop"]

# Public HBM bandwidth specs (GB/s) by TPU generation keyword.
_HBM_GBPS = {
    "v5 lite": 819.0, "v5e": 819.0,
    "v4": 1228.0,
    "v5p": 2765.0,
    "v6 lite": 1640.0, "v6e": 1640.0,
}


def sol_bandwidth(device=None) -> float:
    """Best-known HBM bandwidth (GB/s) for the local device."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, bw in _HBM_GBPS.items():
        if key in kind:
            return bw
    return 819.0  # conservative default (v5e)


@dataclass
class BenchResult:
    name: str
    dtype: str
    grid: tuple
    wall_s: float
    gbytes_per_s: float
    gnnz_per_s: float
    pct_sol: float

    def row(self) -> str:
        return (f"{self.name:28s} {self.dtype:8s} {str(self.grid):>18s} "
                f"{self.wall_s * 1e3:8.3f} ms "
                f"{self.gbytes_per_s:8.1f} GB/s {self.gnnz_per_s:8.2f} Gnnz/s "
                f"{self.pct_sol:6.1f} %SoL")


def time_step_loop(step, x0, consts=(), iters: int = 20) -> float:
    """Seconds per application of ``step`` (x -> x, same shape/dtype).

    Runs ``lax.fori_loop`` with K and 2K chained steps in single jit calls;
    returns (t_2K − t_K)/K.  ``consts`` are loop-invariant arrays (streamed
    every iteration, e.g. the band).
    """
    import sys

    def stage(msg):
        print(f"[bench] {msg}", file=sys.stderr, flush=True)

    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def run(x, n, *cs):
        return jax.lax.fori_loop(0, n, lambda i, xx: step(xx, *cs), x)

    def fetch(out):
        leaf = jax.tree.leaves(out)[0]
        return float(jnp.sum(leaf))     # one scalar fetch forces completion

    stage("compile+warm start")
    fetch(run(x0, iters, *consts))      # compile + warm
    fetch(run(x0, 2 * iters, *consts))
    stage("compile+warm done")
    best_k = best_2k = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        fetch(run(x0, iters, *consts))
        best_k = min(best_k, time.perf_counter() - t0)
        t0 = time.perf_counter()
        fetch(run(x0, 2 * iters, *consts))
        best_2k = min(best_2k, time.perf_counter() - t0)
        stage(f"timed rep {rep}: K={best_k:.4f}s 2K={best_2k:.4f}s "
              f"({iters} iters)")
    # K/2K differencing cancels the fixed dispatch+fetch overhead (~24 ms
    # per measurement through this machine's tunnel — it silently inflated
    # every round-2/3 per-iter number by ~overhead/K).  When the diff
    # drowns in tunnel variance (tiny kernels), fall back to the 2K run's
    # per-iter time, which is an upper bound.
    diff = (best_2k - best_k) / iters
    floor = 0.25 * best_2k / (2 * iters)
    return diff if diff > floor else best_2k / (2 * iters)


def bench_spmv(npts, degree: int = 3, dtype=jnp.float32, iters: int = 20,
               impl: str = "jnp") -> BenchResult:
    """Benchmark banded stencil SpMV on random (contracting) band data.

    The step chains y = A·x back into the next input (re-padded with zero
    ghosts), so K iterations are data-dependent on device.  The band is
    scaled to be contracting so chained values decay instead of overflowing.
    """
    d = len(npts)
    npts = tuple(npts)
    pads = (degree,) * d
    band_shape = tuple(2 * degree + 1 for _ in range(d))
    terms = math.prod(band_shape)
    if impl == "kron":
        # structure-exploiting operator: random 1D bands with the same
        # widths as the Poisson Kronecker sum; 'nnz' counts the equivalent
        # banded operator (this is the apples-to-apples comparison: same
        # matrix action, O(n) data instead of the (2p+1)^d-per-point band)
        from poms_tpu.core.kron import KroneckerSumOperator
        from poms_tpu.core.space import StencilVectorSpace

        space = StencilVectorSpace(npts=npts, pads=pads, periodic=False,
                                   dtype=dtype)
        rng = np.random.default_rng(1)
        scale = 1.0 / (2.0 * (2 * degree + 1))
        Ks = [jnp.asarray(rng.standard_normal((n, 2 * degree + 1)) * scale,
                          dtype) for n in npts]
        Ms = [jnp.asarray(rng.standard_normal((n, 2 * degree + 1)) * scale,
                          dtype) for n in npts]
        kron_terms = [[Ks[b] if b == a else Ms[b] for b in range(d)]
                      for a in range(d)]
        op = KroneckerSumOperator(space, kron_terms)

        def step(x_int, *cs):
            return op._apply_interior(x_int)

        x0i = jnp.full(npts, 1e-3, dtype)
        wall = time_step_loop(step, x0i, iters=iters)
    elif impl == "streamfloor":
        # Pallas-pipeline band-stream probe: contiguous band stream through
        # the same BlockSpec auto-pipeline as the v1 kernel (one add per
        # coefficient plane, no stencil work).  With corrected K/2K timing
        # it measures 762 GB/s — agreeing with the plain-XLA ``xlastream``
        # (763): the Pallas pipeline was never the limiter; round-3's lower
        # numbers were fixed dispatch overhead (BASELINE.md round-4).
        from poms_tpu.bench.kernel_probe import probe_stream

        if npts != (npts[0],) * len(npts) or jnp.dtype(dtype) != jnp.float32:
            # probe_stream benchmarks an npts[0]^3 f32 problem; any other
            # shape/dtype would silently mis-account GB/s (ADVICE r3)
            raise ValueError("streamfloor probe supports cubic f32 grids "
                             f"only, got npts={npts} dtype={dtype}")
        wall, _ = probe_stream(npts[0], degree, contiguous=True)
    elif impl == "xlastreamrw":
        # Elementwise read+WRITE stream over a band-sized array (x' = ax+b
        # chained through the carry): measures the aggregate HBM rate for
        # a symmetric read/write mix.  Charged bytes = read + write.
        @jax.jit
        def make_big():
            return jnp.full((terms * math.prod(npts),), 0.5, dtype)

        big = make_big()
        jax.block_until_ready(big)

        def step(x):
            return x * jnp.float32(0.9999) + jnp.float32(1e-7)

        wall = time_step_loop(step, big, iters=iters)
        isize = jnp.dtype(dtype).itemsize
        nbytes = 2 * terms * math.prod(npts) * isize   # read + write
        gbps = nbytes / wall / 1e9
        sol = sol_bandwidth()
        return BenchResult(
            name=f"spmv_banded_{impl}_{len(npts)}d_p{degree}",
            dtype=str(jnp.dtype(dtype)), grid=npts, wall_s=wall,
            gbytes_per_s=gbps, gnnz_per_s=0.0,
            pct_sol=100.0 * gbps / sol)
    elif impl == "xlastream":
        # Non-Pallas measured ceiling: a plain XLA multiply-accumulate
        # stream over the SAME traffic as the banded kernel (band read once,
        # x broadcast-read, y written), chained through the loop carry so
        # LICM cannot hoist the band read.  This is the honest "what the
        # chip can actually stream" number the banded kernels are judged
        # against — measured 763 GB/s (93% of spec) round 4; it agrees with
        # the Pallas streamc probe once the K/2K timing fix removed the
        # ~24 ms/measurement tunnel overhead that poisoned rounds 2-3.
        @jax.jit
        def make_band():
            k = jax.random.PRNGKey(0)
            flat = jax.random.normal(k, (terms, math.prod(npts)), dtype)
            return flat / (2.0 * math.sqrt(terms))

        band_flat = make_band()
        jax.block_until_ready(band_flat)

        def step(x, bnd):
            return jnp.tanh((bnd * x[None, :]).sum(0))

        x0f = jnp.full((math.prod(npts),), 1e-3, dtype)
        wall = time_step_loop(step, x0f, consts=(band_flat,), iters=iters)
    else:
        # IMPORTANT: generate operands ON DEVICE.  The 3D cubic band is
        # ~GBs; host->device transfer through this machine's TPU tunnel is
        # far slower than the kernel being measured (and can stall).
        @jax.jit
        def make_operands():
            k1, k2 = jax.random.split(jax.random.PRNGKey(0))
            # offset-major band (win..., grid...) — core/matrix.py layout
            band_t = jax.random.normal(k1, band_shape + npts, dtype)
            band_t = band_t / (2.0 * math.sqrt(terms))
            x0 = jax.random.normal(
                k2, tuple(n + 2 * degree for n in npts), dtype)
            return band_t, x0

        band, x0 = make_operands()
        jax.block_until_ready(band)
        if impl == "jnp":
            from poms_tpu.ops.spmv import spmv_banded_jnp as spmv_fn
        elif impl == "pallas":
            from poms_tpu.ops.pallas.spmv import spmv_banded_pallas as spmv_fn
        elif impl == "fold2":
            # lane-folded small-lane 3D path: band pre-folded at setup
            # (operator-lifetime relayout, like pack_band_v2) — see
            # ops/spmv.py::spmv_banded_fold2_jnp
            from poms_tpu.ops.spmv import fold2_band, spmv_banded_fold2_jnp

            band_f = jax.jit(fold2_band, static_argnames=("npts",))(
                band, npts)
            jax.block_until_ready(band_f)

            def step(x_pad, bf):
                y = spmv_banded_fold2_jnp(bf, x_pad, npts, pads)
                return jnp.pad(y, [(degree, degree)] * d)

            wall = time_step_loop(step, x0, consts=(band_f,), iters=iters)
            points = math.prod(npts)
            isize = jnp.dtype(dtype).itemsize
            nbytes = (terms + 2) * points * isize
            gbps = nbytes / wall / 1e9
            return BenchResult(
                name=f"spmv_banded_{impl}_{d}d_p{degree}",
                dtype=str(jnp.dtype(dtype)), grid=npts, wall_s=wall,
                gbytes_per_s=gbps, gnnz_per_s=terms * points / wall / 1e9,
                pct_sol=100.0 * gbps / sol_bandwidth())
        else:
            raise ValueError(impl)

        pad_widths = [(degree, degree)] * d

        packed = None
        if impl == "pallas" and d == 3:
            import os

            if os.environ.get("POMS_TPU_SPMV") == "v2":
                # v2 engine: the one-time band relayout (pack_band_v2) is
                # operator setup, not per-apply work — pack outside the
                # timed loop exactly as production callers do
                from poms_tpu.ops.pallas.spmv import pack_band_v2

                packed = pack_band_v2(band, npts, pads)
                jax.block_until_ready(packed["blk"])

        if packed is not None:
            # thread the packed arrays as loop ARGS: captured as closure
            # constants, multi-GB operands get embedded into the HLO and
            # stall the remote compiler
            meta = {k: packed[k] for k in ("tile", "N", "npts", "pads")}

            def step(x_pad, bnd, blk, dg):
                y = spmv_fn(bnd, x_pad, npts, pads,
                            packed={**meta, "blk": blk, "diag": dg})
                return jnp.pad(y, pad_widths)

            wall = time_step_loop(step, x0,
                                  consts=(band, packed["blk"],
                                          packed["diag"]), iters=iters)
        else:
            def step(x_pad, bnd):
                y = spmv_fn(bnd, x_pad, npts, pads)
                return jnp.pad(y, pad_widths)

            wall = time_step_loop(step, x0, consts=(band,), iters=iters)
    points = math.prod(npts)
    isize = jnp.dtype(dtype).itemsize
    nbytes = (terms + 2) * points * isize
    nnz = terms * points
    gbps = nbytes / wall / 1e9
    sol = sol_bandwidth()
    return BenchResult(
        name=f"spmv_banded_{impl}_{d}d_p{degree}", dtype=str(jnp.dtype(dtype)),
        grid=npts, wall_s=wall, gbytes_per_s=gbps,
        gnnz_per_s=nnz / wall / 1e9, pct_sol=100.0 * gbps / sol)


def bench_vcycle(dim: int, n_el: int, degree: int, num_levels: int,
                 dtype=jnp.float32, iters: int = 5):
    """Seconds per V-cycle (chained on device, overhead-cancelled)."""
    from poms_tpu.core.vector import StencilVector
    from poms_tpu.mg.cycles import CycleConfig, cycle
    from poms_tpu.mg.hierarchy import build_hierarchy
    from poms_tpu.mg.smoother import SmootherConfig
    from poms_tpu.models.poisson import poisson_problem

    prob = poisson_problem(dim, n_el, degree=degree, dtype=dtype)
    cfg = CycleConfig(smoother=SmootherConfig("jacobi", 0.8))
    levels = build_hierarchy(prob, num_levels)
    b = prob.b

    def step(x, *consts):
        return cycle(levels, 0, x, b, cfg)

    x0 = StencilVector.zeros(prob.space)
    wall = time_step_loop(step, x0, consts=(), iters=iters)
    return wall, prob
