"""Weak/strong-scaling harness for the distributed V-cycle (config 5).

Weak scaling: grow the global grid with the mesh so each device keeps a
fixed local block; efficiency(N) = t(1) / t(N) (target ≥ 75% at N ≥ 2
hosts — BASELINE.json:5).  Strong scaling: fixed global grid, growing mesh.

On this round's hardware (one chip) the harness runs on the virtual CPU
mesh, which validates wiring and *counts collectives*, not ICI performance;
the same entry point measures for real on a pod slice
(``python -m poms_tpu.bench.scaling --weak``).
"""
from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp

__all__ = ["run_weak_scaling", "run_strong_scaling", "ScalingPoint"]


@dataclass
class ScalingPoint:
    mesh_shape: Tuple[int, ...]
    n_devices: int
    n_el: Tuple[int, ...]
    seconds_per_cycle: float
    efficiency: float  # vs the 1-device point


def _mesh_shapes(dim: int, max_devices: int) -> List[Tuple[int, ...]]:
    shapes = []
    n = 1
    while n <= max_devices:
        # factor n into dim roughly-equal powers of two
        shape = [1] * dim
        rem = n
        a = 0
        while rem > 1:
            shape[a % dim] *= 2
            rem //= 2
            a += 1
        shapes.append(tuple(shape))
        n *= 2
    return shapes


def _time_cycles(mg, b_glob, x_glob, iters: int = 5) -> float:
    import time

    x, rn = mg.step(x_glob, b_glob)           # compile + warm
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x, rn = mg.step(x, b_glob)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters


def run_weak_scaling(dim: int = 3, n_el_local: int = 16, degree: int = 2,
                     num_levels: int = 2, max_devices: int | None = None,
                     smoother: str = "chebyshev", verbose: bool = True):
    from poms_tpu.mg.cycles import CycleConfig
    from poms_tpu.mg.smoother import SmootherConfig
    from poms_tpu.models.poisson import poisson_problem
    from poms_tpu.parallel.dist import DistributedMG

    max_devices = max_devices or len(jax.devices())
    cfg = CycleConfig(nu1=1, nu2=1,
                      smoother=SmootherConfig(kind=smoother,
                                              cheb_fraction=16.0))
    points: List[ScalingPoint] = []
    t1 = None
    for mesh_shape in _mesh_shapes(dim, max_devices):
        n_el = tuple(n_el_local * m for m in mesh_shape)
        prob = poisson_problem(dim, n_el, degree=degree)
        mg = DistributedMG(prob, num_levels=num_levels,
                           mesh_shape=mesh_shape, cfg=cfg)
        b_glob = mg._pad_global(prob.b.interior)
        x_glob = jnp.zeros_like(b_glob)
        sec = _time_cycles(mg, b_glob, x_glob)
        ndev = math.prod(mesh_shape)
        t1 = sec if t1 is None else t1
        eff = t1 / sec if sec > 0 else 0.0
        points.append(ScalingPoint(mesh_shape, ndev, n_el, sec, eff))
        if verbose:
            print(f"weak  mesh={mesh_shape} devices={ndev:2d} "
                  f"n_el={n_el} {sec*1e3:8.2f} ms/cycle  eff={eff:5.2f}")
    return points


def run_strong_scaling(dim: int = 2, n_el: int = 64, degree: int = 2,
                       num_levels: int = 3, max_devices: int | None = None,
                       smoother: str = "chebyshev", verbose: bool = True):
    from poms_tpu.mg.cycles import CycleConfig
    from poms_tpu.mg.smoother import SmootherConfig
    from poms_tpu.models.poisson import poisson_problem
    from poms_tpu.parallel.dist import DistributedMG

    max_devices = max_devices or len(jax.devices())
    cfg = CycleConfig(nu1=1, nu2=1,
                      smoother=SmootherConfig(kind=smoother,
                                              cheb_fraction=16.0))
    prob = poisson_problem(dim, n_el, degree=degree)
    points: List[ScalingPoint] = []
    t1 = None
    for mesh_shape in _mesh_shapes(dim, max_devices):
        mg = DistributedMG(prob, num_levels=num_levels,
                           mesh_shape=mesh_shape, cfg=cfg)
        b_glob = mg._pad_global(prob.b.interior)
        x_glob = jnp.zeros_like(b_glob)
        sec = _time_cycles(mg, b_glob, x_glob)
        ndev = math.prod(mesh_shape)
        t1 = sec if t1 is None else t1
        speedup = t1 / sec if sec > 0 else 0.0
        eff = speedup / ndev
        points.append(ScalingPoint(mesh_shape, ndev, (n_el,) * dim, sec, eff))
        if verbose:
            print(f"strong mesh={mesh_shape} devices={ndev:2d} "
                  f"{sec*1e3:8.2f} ms/cycle  speedup={speedup:5.2f} "
                  f"eff={eff:5.2f}")
    return points


def write_json(points: List[ScalingPoint], kind: str, path: str) -> None:
    """Persist a scaling run as a machine-checkable artifact (VERDICT r2
    ask #5: 'bench/scaling.py prints, no artifact')."""
    import json

    import jax as _jax

    dev = _jax.devices()[0]
    doc = {
        "kind": kind,
        "platform": dev.platform,
        "device_kind": getattr(dev, "device_kind", "?"),
        "n_devices_visible": len(_jax.devices()),
        "n_processes": _jax.process_count(),
        "note": ("CPU virtual mesh validates wiring/collective counts, not "
                 "ICI bandwidth" if dev.platform == "cpu" else ""),
        "points": [{"mesh_shape": list(pt.mesh_shape),
                    "n_devices": pt.n_devices,
                    "n_el": list(pt.n_el),
                    "seconds_per_cycle": pt.seconds_per_cycle,
                    "efficiency": pt.efficiency} for pt in points],
    }
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    import sys

    kind = sys.argv[1] if len(sys.argv) > 1 else "--weak"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    if kind == "--weak":
        points = run_weak_scaling()
    else:
        points = run_strong_scaling()
    if out:
        write_json(points, kind.lstrip("-"), out)
        print(f"wrote {out}")
