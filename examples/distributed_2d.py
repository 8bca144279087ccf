"""Config-4 driver: block-partitioned 2D V-cycle over a device mesh.

Halo exchange rides `lax.ppermute` (ICI on real hardware); norms are psum.
On a machine with one chip, simulate with
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python examples/distributed_2d.py

Run:  python examples/distributed_2d.py [n_el] [mesh_rows] [mesh_cols]
"""
import sys

import jax

from poms_tpu.mg.cycles import CycleConfig
from poms_tpu.mg.smoother import SmootherConfig
from poms_tpu.mg.solver import MultigridSolver
from poms_tpu.models.poisson import poisson_problem
from poms_tpu.parallel.dist import DistributedMG


def main(n_el=32, m1=None, m2=None):
    ndev = len(jax.devices())
    if m1 is None:
        m1 = 2 if ndev >= 2 else 1
        m2 = max(1, min(ndev // m1, 4))
    print(f"devices: {ndev}; mesh = ({m1}, {m2})")
    prob = poisson_problem(2, n_el, degree=3)
    cfg = CycleConfig(smoother=SmootherConfig(kind="jacobi", omega=0.8))
    mg = DistributedMG(prob, num_levels=2, mesh_shape=(m1, m2), cfg=cfg)
    res = mg.solve(tol=1e-10, maxiter=60)
    for i, r in enumerate(res.residuals):
        print(f"cycle {i:3d}  ||r|| = {r:.6e}")
    serial = MultigridSolver(prob, num_levels=2, cfg=cfg).solve(
        tol=1e-10, maxiter=60)
    drift = max(abs(a - b) for a, b in zip(res.residuals, serial.residuals))
    print(f"max |distributed - serial| residual drift: {drift:.3e}")


if __name__ == "__main__":
    main(*[int(a) for a in sys.argv[1:4]])
