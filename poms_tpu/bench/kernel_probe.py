"""Kernel-limit probes: what caps the banded-SpMV Pallas kernel?

Isolates the two candidate bottlenecks of the chunked stencil kernel
(ops/pallas/spmv.py) on real hardware:

- ``stream``  — DMA-only: stream the band through VMEM with ONE multiply-add
  per plane (no halo window, no shifted reads).  Upper bound for any kernel
  that must read the whole band; measures the achievable HBM bandwidth for
  the band's block/stride pattern.
- ``streamc`` — same, but with the band pre-transposed to the
  DMA-contiguous layout (k1, i, k2, k3, j, l) so each grid step copies one
  fully contiguous slab.  Isolates the cost of the strided block pattern.
- ``compute`` — the real kernel with the band REUSED from a single VMEM
  block (index map pinned to block 0): full compute (rotates + 49 MACs per
  chunk), ~no HBM band traffic.  Measures the pure compute time per tile.

Usage:  python -m poms_tpu.bench.kernel_probe [probe] [n] [p]
"""
from __future__ import annotations

import math
import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from poms_tpu.bench.roofline import sol_bandwidth, time_step_loop

_LANE = 128


def probe_stream(n: int, p: int, contiguous: bool):
    """Band-stream-only kernel: out[i,j,l] += sum_plane coeff."""
    w = 2 * p + 1
    t2 = n if n <= 128 else 128
    grid = (n, n // t2, n // _LANE, w)

    if contiguous:
        shape = (w, n, w, w, n, n)          # (k1, i, k2, k3, j, l)
        block = (1, 1, w, w, t2, _LANE)
        imap = lambda i, j, l, k: (k, i, 0, 0, j, l)
    else:
        shape = (w, w, w, n, n, n)          # library layout (win..., grid...)
        block = (1, w, w, 1, t2, _LANE)
        imap = lambda i, j, l, k: (k, 0, 0, i, j, l)

    def kernel(x_ref, band_ref, out_ref):
        # x_ref: the loop carry, consumed INSIDE the kernel — without it the
        # pallas_call is loop-invariant and XLA hoists it clean out of the
        # timing fori_loop (round-2's "1.4 ms stream floor" was exactly that
        # artifact: 2083 GB/s ≫ the 819 GB/s HBM spec).  x adds n³·4 B of
        # traffic (~0.3% of the band), which the nbytes accounting includes.
        k = pl.program_id(3)
        acc = None
        for k2 in range(w):
            for k3 in range(w):
                if contiguous:
                    plane = band_ref[0, 0, k2, k3]
                else:
                    plane = band_ref[0, k2, k3, 0]
                acc = plane if acc is None else acc + plane

        @pl.when(k == 0)
        def _():
            out_ref[...] = acc.reshape(1, t2, _LANE) + 1e-6 * x_ref[...]

        @pl.when(k > 0)
        def _():
            out_ref[...] = out_ref[...] + acc.reshape(1, t2, _LANE)

    @jax.jit
    def make():
        band = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
        return band * (1.0 / (2 * math.sqrt(w ** 3)))

    band = make()
    jax.block_until_ready(band)
    out_shape = jax.ShapeDtypeStruct((n, n, n), jnp.float32)
    xvec_spec = pl.BlockSpec((1, t2, _LANE), lambda i, j, l, k: (i, j, l),
                             memory_space=pltpu.VMEM)

    def step(x, bnd):
        return pl.pallas_call(
            kernel, grid=grid,
            in_specs=[xvec_spec,
                      pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)],
            out_specs=xvec_spec,
            out_shape=out_shape)(x, bnd)

    x0 = jnp.zeros((n, n, n), jnp.float32)
    wall = time_step_loop(step, x0, consts=(band,), iters=20)
    nbytes = (w ** 3 + 2) * n ** 3 * 4
    gbps = nbytes / wall / 1e9
    sol = sol_bandwidth()
    name = "streamc" if contiguous else "stream"
    print(f"RESULT {name}: {wall*1e3:.3f} ms  {gbps:.1f} GB/s  "
          f"{100*gbps/sol:.1f}% SoL", flush=True)
    return wall, gbps


def probe_compute(n: int, p: int):
    """Full stencil compute with the band pinned to one VMEM block."""
    from poms_tpu.ops.pallas import spmv as _sp

    w = 2 * p + 1
    npts = (n, n, n)
    pads = (p, p, p)
    tile = _sp._choose_tiles(npts, pads, 4)
    win_al = _sp._window_sizes(tile, pads)
    kc = w
    grid = (n // tile[0], n // tile[1], n // tile[2], kc)
    kernel = _sp._make_kernel(tile, pads, "spmv", win_al, kc, grid[:3])

    # band ref block pinned to tile (0,0,0): zero HBM band traffic after
    # the first tile; everything else identical to the real kernel
    band_spec = pl.BlockSpec(
        (1, w, w, 1, tile[1], tile[2]),
        lambda i, j, l, k, *_: (k, 0, 0, 0, 0, 0),
        memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, tile[1], tile[2]),
                            lambda i, j, l, k, *_: (i, j, l),
                            memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    scratch = [pltpu.VMEM((2,) + win_al, jnp.float32),
               pltpu.SemaphoreType.DMA((2,))]

    @jax.jit
    def make():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        band = jax.random.normal(k1, (w, w, w) + npts, jnp.float32)
        band = band / (2.0 * math.sqrt(w ** 3))
        x0 = jax.random.normal(k2, tuple(x + 2 * q for x, q in
                                         zip(npts, pads)), jnp.float32)
        return band, x0

    band, x0 = make()
    jax.block_until_ready(band)
    extra = [win_al[a] - (tile[a] + 2 * pads[a]) for a in range(3)]
    extra[0] = 0
    x0 = jnp.pad(x0, [(0, e) for e in extra])

    def step(x_pad, bnd):
        y = pl.pallas_call(
            kernel, grid=grid, in_specs=[x_spec, band_spec],
            out_specs=vec_spec,
            out_shape=jax.ShapeDtypeStruct(npts, jnp.float32),
            scratch_shapes=scratch)(x_pad, bnd)
        return jnp.pad(y, [(p, p + e) for e in extra])

    wall = time_step_loop(step, x0, consts=(band,), iters=20)
    print(f"RESULT compute: {wall*1e3:.3f} ms "
          f"(vs band-stream floor {w**3 * n**3 * 4 / sol_bandwidth() / 1e6:.3f} ms)",
          flush=True)


def probe_v15(n: int, p: int, t0: int = 8, t2: int = 8):
    """Prototype of the plane-shift-cached SpMV kernel (round-2 redesign).

    The compute probe showed the v1 kernel is VPU-bound (~7 vreg-ops per
    nnz: every (k1,k2,k3) operand is a fresh shifted-window materialization
    used once).  v15 tiles the leading grid dim at t0 > 1 and caches each
    input plane's (w2·w3) shifted forms in VMEM scratch; each cached form
    is reused by up to w1 output planes → ~4 ops/nnz (coeff load + operand
    load + fma + amortized shift)."""
    w = 2 * p + 1
    npts = (n, n, n)
    kc = w
    t3 = _LANE
    win = (t0 + 2 * p, ((t2 + 2 * p + 7) // 8) * 8,
           ((t3 + 2 * p + 127) // 128) * 128)
    nq = t0 + 2 * p
    grid = (n // t0, n // t2, n // t3, kc)
    GI, GJ, GL = grid[:3]
    n_tiles = GI * GJ * GL

    def window_copy(ids, xw, sem, slot, x_hbm):
        src = x_hbm.at[pl.ds(ids[0] * t0, win[0]),
                       pl.ds(ids[1] * t2, win[1]),
                       pl.ds(ids[2] * t3, win[2])]
        return pltpu.make_async_copy(src, xw.at[slot], sem.at[slot])

    def kernel(x_hbm, band_ref, out_ref, xw, cache, sem):
        k = pl.program_id(3)
        ids = [pl.program_id(a) for a in range(3)]
        t_lin = (ids[0] * GJ + ids[1]) * GL + ids[2]
        slot = jax.lax.rem(t_lin, jnp.int32(2))

        def fill(q):
            for k2 in range(w):
                for k3 in range(w):
                    v = xw[slot, q, pl.ds(k2, t2), pl.ds(k3, t3)]
                    cache[q, k2, k3] = v

        @pl.when(k == 0)
        def _():
            @pl.when(t_lin == 0)
            def _():
                window_copy(ids, xw, sem, 0, x_hbm).start()

            window_copy(ids, xw, sem, slot, x_hbm).wait()
            nxt = t_lin + 1

            @pl.when(nxt < n_tiles)
            def _():
                l2 = jax.lax.rem(nxt, jnp.int32(GL))
                j2 = jax.lax.rem(nxt // GL, jnp.int32(GJ))
                i2 = nxt // (GJ * GL)
                window_copy((i2, j2, l2), xw, sem, 1 - slot, x_hbm).start()

            for c in range(t0):
                fill(c)

        @pl.when(k > 0)
        def _():
            fill(k + t0 - 1)

        acc = [None] * t0
        for k2 in range(w):
            for k3 in range(w):
                for i1 in range(t0):
                    coeff = band_ref[0, k2, k3, i1]
                    operand = cache[k + i1, k2, k3]
                    term = coeff * operand
                    acc[i1] = term if acc[i1] is None else acc[i1] + term

        @pl.when(k == 0)
        def _():
            for i1 in range(t0):
                out_ref[i1] = acc[i1]

        @pl.when(k > 0)
        def _():
            for i1 in range(t0):
                out_ref[i1] = out_ref[i1] + acc[i1]

    band_spec = pl.BlockSpec(
        (1, w, w, t0, t2, t3),
        lambda i, j, l, k: (k, 0, 0, i, j, l),
        memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((t0, t2, t3), lambda i, j, l, k: (i, j, l),
                            memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    scratch = [pltpu.VMEM((2,) + win, jnp.float32),
               pltpu.VMEM((nq, w, w, t2, t3), jnp.float32),
               pltpu.SemaphoreType.DMA((2,))]

    @jax.jit
    def make():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        band = jax.random.normal(k1, (w, w, w) + npts, jnp.float32)
        band = band / (2.0 * math.sqrt(w ** 3))
        x0 = jax.random.normal(k2, tuple(x + 2 * p for x in npts),
                               jnp.float32)
        return band, x0

    band, x0 = make()
    jax.block_until_ready(band)
    extra = [win[a] - (dims + 2 * p)
             for a, dims in enumerate((t0, t2, t3))]
    extra[0] = 0
    x0p = jnp.pad(x0, [(0, e) for e in extra])

    def step(x_pad, bnd):
        y = pl.pallas_call(
            kernel, grid=grid, in_specs=[x_spec, band_spec],
            out_specs=vec_spec,
            out_shape=jax.ShapeDtypeStruct(npts, jnp.float32),
            scratch_shapes=scratch)(x_pad, bnd)
        return jnp.pad(y, [(p, p + e) for e in extra])

    # correctness vs jnp reference first (one call)
    from poms_tpu.ops.spmv import spmv_banded_jnp

    import numpy as np

    y = pl.pallas_call(
        kernel, grid=grid, in_specs=[x_spec, band_spec],
        out_specs=vec_spec,
        out_shape=jax.ShapeDtypeStruct(npts, jnp.float32),
        scratch_shapes=scratch)(x0p, band)
    ref = spmv_banded_jnp(band, x0, npts, (p, p, p))
    err = float(jnp.max(jnp.abs(y - ref)))
    print(f"v15 correctness: max err {err:.3e}", flush=True)

    wall = time_step_loop(step, x0p, consts=(band,), iters=20)
    nbytes = (w ** 3 + 2) * n ** 3 * 4
    gbps = nbytes / wall / 1e9
    sol = sol_bandwidth()
    print(f"RESULT v15(t0={t0},t2={t2}): {wall*1e3:.3f} ms  {gbps:.1f} GB/s  "
          f"{100*gbps/sol:.1f}% SoL", flush=True)


def probe_ablate(n: int, p: int, variant: str, t2o: int = 0):
    """v1-kernel ablations (timing only — results intentionally wrong):

    - ``noshift``: replace the per-(k2) sublane-shifted operand with the
      unshifted xs rows → isolates the sublane-funnel cost.
    - ``nolane``:  use k3=0's lane slice for all k3 → isolates lane-rotate.
    - ``nomul``:   acc += shifted (no coeff multiply) → isolates coeff load.
    - ``full``:    faithful v1 inner loop (sanity: should match compute probe).
    """
    w = 2 * p + 1
    npts = (n, n, n)
    t2 = t2o or 128
    t3 = _LANE
    kc = w
    win = (w, ((t2 + 2 * p + 7) // 8) * 8,
           ((t3 + 2 * p + 127) // 128) * 128)
    grid = (n, n // t2, n // t3, kc)
    GI, GJ, GL = grid[:3]
    n_tiles = GI * GJ * GL

    def window_copy(ids, xw, sem, slot, x_hbm):
        src = x_hbm.at[pl.ds(ids[0], win[0]),
                       pl.ds(ids[1] * t2, win[1]),
                       pl.ds(ids[2] * t3, win[2])]
        return pltpu.make_async_copy(src, xw.at[slot], sem.at[slot])

    def kernel(x_hbm, band_ref, out_ref, xw, sem):
        k = pl.program_id(3)
        ids = [pl.program_id(a) for a in range(3)]
        t_lin = (ids[0] * GJ + ids[1]) * GL + ids[2]
        slot = jax.lax.rem(t_lin, jnp.int32(2))

        @pl.when(k == 0)
        def _():
            @pl.when(t_lin == 0)
            def _():
                window_copy(ids, xw, sem, 0, x_hbm).start()

            window_copy(ids, xw, sem, slot, x_hbm).wait()
            nxt = t_lin + 1

            @pl.when(nxt < n_tiles)
            def _():
                l2 = jax.lax.rem(nxt, jnp.int32(GL))
                j2 = jax.lax.rem(nxt // GL, jnp.int32(GJ))
                i2 = nxt // (GJ * GL)
                window_copy((i2, j2, l2), xw, sem, 1 - slot, x_hbm).start()

        acc = None
        for k3 in range(w):
            k3e = 0 if variant == "nolane" else k3
            xs = xw[slot, pl.ds(k, 1), :, pl.ds(k3e, t3)]
            xs = xs.reshape(win[1], t3)
            for k2 in range(w):
                shifted = (xs[0:t2, :] if variant == "noshift"
                           else xs[k2:k2 + t2, :])
                if variant == "nomul":
                    term = shifted
                else:
                    coeff = band_ref[0, k2, k3, 0]
                    term = coeff * shifted
                acc = term if acc is None else acc + term
        acc = acc.reshape(1, t2, t3)

        @pl.when(k == 0)
        def _():
            out_ref[...] = acc

        @pl.when(k > 0)
        def _():
            out_ref[...] = out_ref[...] + acc

    band_spec = pl.BlockSpec(
        (1, w, w, 1, t2, t3), lambda i, j, l, k: (k, 0, 0, i, j, l),
        memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, t2, t3), lambda i, j, l, k: (i, j, l),
                            memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    scratch = [pltpu.VMEM((2,) + win, jnp.float32),
               pltpu.SemaphoreType.DMA((2,))]

    @jax.jit
    def make():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        band = jax.random.normal(k1, (w, w, w) + npts, jnp.float32)
        band = band / (2.0 * math.sqrt(w ** 3))
        x0 = jax.random.normal(k2, tuple(x + 2 * p for x in npts),
                               jnp.float32)
        return band, x0

    band, x0 = make()
    jax.block_until_ready(band)
    extra = [win[a] - (dims + 2 * p) for a, dims in enumerate((1, t2, t3))]
    extra[0] = 0
    x0p = jnp.pad(x0, [(0, e) for e in extra])

    def step(x_pad, bnd):
        y = pl.pallas_call(
            kernel, grid=grid, in_specs=[x_spec, band_spec],
            out_specs=vec_spec,
            out_shape=jax.ShapeDtypeStruct(npts, jnp.float32),
            scratch_shapes=scratch)(x_pad, bnd)
        return jnp.pad(y, [(p, p + e) for e in extra])

    wall = time_step_loop(step, x0p, consts=(band,), iters=20)
    print(f"RESULT ablate[{variant},t2={t2}]: {wall*1e3:.3f} ms", flush=True)


def _enable_persistent_cache():
    """Reuse compiled executables across probe processes — the remote
    compile service on this machine is intermittently minutes-slow, and
    every subprocess otherwise recompiles from scratch."""
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/.cache/jax_poms")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — older jax: flag absent; run uncached
        pass


def main():
    _enable_persistent_cache()
    probe = sys.argv[1] if len(sys.argv) > 1 else "stream"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    p = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    if probe == "stream":
        probe_stream(n, p, contiguous=False)
    elif probe == "streamc":
        probe_stream(n, p, contiguous=True)
    elif probe == "compute":
        probe_compute(n, p)
    elif probe == "v15":
        t0 = int(sys.argv[4]) if len(sys.argv) > 4 else 8
        t2 = int(sys.argv[5]) if len(sys.argv) > 5 else 8
        probe_v15(n, p, t0, t2)
    elif probe == "ablate":
        variant = sys.argv[4] if len(sys.argv) > 4 else "full"
        t2 = int(sys.argv[5]) if len(sys.argv) > 5 else 0
        probe_ablate(n, p, variant, t2)
    else:
        raise SystemExit(f"unknown probe {probe}")


if __name__ == "__main__":
    main()
