"""Analytic weak-scaling model for the distributed production solve.

VERDICT r4 missing #4: real ≥2-host runs are hardware-blocked (one chip
behind the tunnel), so this module converts the ≥75% weak-scaling target
(BASELINE.json:5) into a FALSIFIABLE prediction the first real pod run can
check against a number instead of starting from zero.

Method
------
1. **Census (the error-prone part, measured not hand-derived):** build the
   production distributed config (kron operator + sharded twofloat defect
   correction, Chebyshev(4) smoother) on a virtual CPU mesh, trace ONE
   outer step with ``jax.make_jaxpr``, and walk the jaxpr for every
   ``ppermute`` equation, recording slab shapes/dtypes.  This pins the
   exchanges-per-cycle count the same way
   tests/test_dist_kron.py::test_dist_kron_fused_exchange_fewer_collectives
   pins the fused-exchange count.
2. **Rescale:** each halo slab has one thin dim (the pad width p) and
   scales with the local block in the others.  Slab bytes at a production
   per-device block b³ follow analytically.
3. **Model:**
       T_comm(b, mesh) = Σ_slabs bytes / BW_ici  +  n_coll · t_launch
       eff_no_overlap  = T_comp / (T_comp + T_comm)
       eff_overlap     = T_comp / max(T_comp, T_comm)   (upper bound — the
                         linearity-split formulation makes the interior
                         SpMV independent of the ppermutes)
   with T_comp the measured single-chip per-cycle wall at block b³
   (BENCH_r04/r05 rows) and BW_ici the public one-way per-link ICI
   bandwidth of the v5e (2D torus, ~45 GB/s per direction per axis — the
   scaling-book number; both axis neighbors transfer concurrently on
   their own links, and send/recv are full duplex).

Run:  python -m poms_tpu.bench.scaling_model [out.json]
"""
from __future__ import annotations

import json
import sys

# -- public v5e interconnect/model constants --------------------------------
ICI_GBPS_PER_DIR = 45.0      # one-way per-link per-direction, TPU v5e
T_LAUNCH_S = 2e-6            # per-collective launch/latency charge
# measured single-chip per-cycle compute (s) per local block edge — the
# twofloat defect-correction outer iteration (cycle + dw residual + norm),
# BENCH_r04 ("vcycle3d per_iter_s") + r5 256³ leg; 32³ extrapolated /8.
MEASURED_T_COMP = {32: 0.0030 / 8, 64: 0.00345, 128: 0.01284, 256: 0.156}


def _walk_ppermutes(jaxpr, out):
    """Collect (shape, dtype) for every ppermute eqn, recursing into
    nested jaxprs (shard_map/pjit/while/cond bodies)."""
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "ppermute":
            v = eqn.invars[0]
            out.append((tuple(v.aval.shape), str(v.aval.dtype)))
        for val in eqn.params.values():
            for j in _sub_jaxprs(val):
                _walk_ppermutes(j, out)
    return out


def _sub_jaxprs(val):
    import jax.extend.core as jex_core

    if isinstance(val, jex_core.ClosedJaxpr):
        yield val.jaxpr
    elif isinstance(val, jex_core.Jaxpr):
        yield val
    elif isinstance(val, (tuple, list)):
        for v in val:
            yield from _sub_jaxprs(v)


def census(mesh_shape=(2, 2, 2), n_el_per_dev=8, degree=3):
    """Trace one production outer step and count halo slabs per level.

    Returns a list of {"shape", "dtype", "count"} rows plus the per-level
    classification used by the rescaling step.
    """
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from poms_tpu.mg.cycles import CycleConfig
    from poms_tpu.mg.smoother import SmootherConfig
    from poms_tpu.models.poisson import poisson_problem
    from poms_tpu.parallel.dist import DistributedMG

    d = len(mesh_shape)
    n_el = tuple(n_el_per_dev * m for m in mesh_shape)
    prob = poisson_problem(d, n_el, degree=degree, dtype=jnp.float64,
                           operator="kron")
    cfg = CycleConfig(nu1=1, nu2=1,
                      smoother=SmootherConfig("chebyshev",
                                              cheb_fraction=16.0,
                                              cheb_degree=4))
    mg = DistributedMG(prob, num_levels=3, mesh_shape=mesh_shape, cfg=cfg,
                       mixed=True, operator="kron",
                       mixed_residual="twofloat")
    bp = mg._pad_global(prob.b.interior)
    from poms_tpu.ops.twofloat import split_f64

    bh, bl = split_f64(bp)
    xh, xl = jnp.zeros_like(bh), jnp.zeros_like(bl)
    jaxpr = jax.make_jaxpr(mg._step_raw)(xh, xl, bh, bl)
    slabs = _walk_ppermutes(jaxpr.jaxpr, [])
    # aggregate identical slabs
    agg = {}
    for shape, dtype in slabs:
        agg[(shape, dtype)] = agg.get((shape, dtype), 0) + 1
    rows = [{"shape": list(s), "dtype": dt, "count": c}
            for (s, dt), c in sorted(agg.items())]
    return {"mesh_shape": list(mesh_shape), "n_el_per_dev": n_el_per_dev,
            "degree": degree, "dist_levels": mg.L_dist,
            "pads": list(prob.space.pads), "slabs": rows}


def classify(census_doc):
    """Label each slab row with (level, axis) from its thin/thick dims.

    Levels halve the local extent; the thin dim (== pad or a small
    multiple for transfer halos) marks the exchange axis.
    """
    import math

    # empirical fine local extent: the largest thick extent seen (slab
    # thick dims at level l are ~ base/2^l, transfer slabs sit between
    # levels — the log-ratio rounds them to the nearer level)
    base = max(max(row["shape"]) for row in census_doc["slabs"]
               if row["shape"])
    out = []
    for row in census_doc["slabs"]:
        shape = row["shape"]
        itemsize = 8 if row["dtype"] == "float64" else (
            2 if row["dtype"] == "bfloat16" else 4)
        if not shape:           # scalar permute (none expected)
            continue
        # thin axis = argmin extent; remaining extents identify the level
        axis = min(range(len(shape)), key=lambda a: shape[a])
        thick = [shape[a] for a in range(len(shape)) if a != axis]
        tmean = sum(thick) / max(len(thick), 1)
        level = min(3, max(0, round(math.log2(base / max(tmean, 1)))))
        out.append({"level": level, "axis": axis, "thin": shape[axis],
                    "count": row["count"], "itemsize": itemsize,
                    "shape": shape})
    return out


def predict(classified, pads, block_edge, mesh_dims, t_comp,
            ici_gbps=ICI_GBPS_PER_DIR):
    """Per-cycle comm time and efficiency for a b³ local block.

    ``mesh_dims``: how many grid axes are sharded (1 for 2 chips, 2 for
    4, 3 for 8+).  Axes beyond the sharded count exchange nothing; slabs
    on sharded axes transfer concurrently per axis (each axis has its own
    ICI links on the torus) — the serialized-per-axis time is also
    reported as the pessimistic variant.
    """
    per_axis_bytes = {}
    n_coll = 0
    for row in classified:
        if row["axis"] >= mesh_dims:
            continue
        l = row["level"]
        edge = block_edge >> l
        # slab = thin × edge² (3D block), itemsize from the trace
        nbytes = row["thin"] * edge * edge * row["itemsize"] * row["count"]
        per_axis_bytes[row["axis"]] = (per_axis_bytes.get(row["axis"], 0.0)
                                       + nbytes)
        n_coll += row["count"]
    bw = ici_gbps * 1e9
    t_serial = sum(per_axis_bytes.values()) / bw + n_coll * T_LAUNCH_S
    t_concurrent = (max(per_axis_bytes.values(), default=0.0) / bw
                    + n_coll * T_LAUNCH_S)
    return {
        "t_comp_s": t_comp,
        "t_comm_serial_s": t_serial,
        "t_comm_concurrent_s": t_concurrent,
        "eff_no_overlap": t_comp / (t_comp + t_concurrent),
        "eff_no_overlap_serial_links": t_comp / (t_comp + t_serial),
        "eff_full_overlap": t_comp / max(t_comp, t_concurrent),
        "n_collectives_per_cycle": n_coll,
    }


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "scaling_model_r05.json"
    import os

    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # noqa: BLE001 — backends already live
        pass
    doc = census()
    cls = classify(doc)
    doc["classified"] = cls
    doc["model_constants"] = {"ici_gbps_per_dir": ICI_GBPS_PER_DIR,
                              "t_launch_s": T_LAUNCH_S,
                              "t_comp_measured_s": MEASURED_T_COMP}
    chips_to_meshdims = {2: 1, 4: 2, 8: 3, 16: 3}
    table = {}
    cross75 = None
    for b in sorted(MEASURED_T_COMP):
        table[b] = {}
        for chips, md in chips_to_meshdims.items():
            table[b][chips] = predict(cls, doc["pads"], b, md,
                                      MEASURED_T_COMP[b])
        worst = min(v["eff_no_overlap"] for v in table[b].values())
        if cross75 is None and worst >= 0.75:
            cross75 = b
    doc["prediction"] = {
        str(b): {str(c): {k: (round(v, 6) if isinstance(v, float) else v)
                          for k, v in r.items()}
                 for c, r in by_chips.items()}
        for b, by_chips in table.items()}
    doc["crosses_75pct_at_block_edge"] = cross75
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"dist_levels={doc['dist_levels']} "
          f"collectives/cycle={sum(r['count'] for r in cls)}")
    hdr = "block/dev  " + "".join(f"{c:>10d}ch" for c in chips_to_meshdims)
    print(hdr)
    for b in sorted(table):
        row = f"{b:>3d}^3      " + "".join(
            f"{table[b][c]['eff_no_overlap']:>11.3f}"
            for c in chips_to_meshdims)
        print(row)
    print(f"predicted >=75% weak-scaling efficiency first reached at "
          f"block edge {cross75} (no-overlap model; overlap raises it)")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
