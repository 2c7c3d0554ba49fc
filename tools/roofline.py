"""Static roofline analysis of the serving pipeline (CPU-only, no chip).

Walks the jaxpr of the EXACT bench pipeline (bench._build_pipeline, honoring
SKYEYE_INT8 / SKYEYE_FUSED_CSP) and accounts every conv_general_dilated and
dot_general: FLOPs, operand/result HBM bytes, and the v5e roofline time for
each (max of MXU time at 197 TF/s bf16 and HBM time at 819 GB/s, assuming
perfect elementwise fusion — i.e. each activation tensor is read once and
written once by its producing conv).

This is the lower bound XLA/Pallas can approach but not beat at these shapes;
comparing it against the measured hlo_stats (tools/profile_bench.py) separates
"XLA is leaving time on the table" from "the shape itself is the limit".

Usage:
  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/roofline.py \
      [--img 1280] [--batch 16] [--variant s] [--out profiles/roofline.json]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

HBM_GBPS = 819e9     # v5e HBM bandwidth
MXU_BF16 = 197e12    # v5e bf16 peak
MXU_INT8 = 394e12    # v5e int8 peak


def _bytes(aval) -> int:
    import numpy as np

    return int(np.prod(aval.shape)) * aval.dtype.itemsize


def walk(jaxpr, rows, prefix=""):
    from jax._src.core import Jaxpr

    for eqn in jaxpr.eqns:
        prim = eqn.primitive.name
        if prim in ("conv_general_dilated", "dot_general"):
            out = eqn.outvars[0].aval
            lhs, rhs = (v.aval for v in eqn.invars[:2])
            if prim == "conv_general_dilated":
                dn = eqn.params["dimension_numbers"]
                fgc = eqn.params.get("feature_group_count", 1)
                # HWIO rhs: kh, kw, cin/g, cout
                k_elems = 1
                for d in rhs.shape:
                    k_elems *= d
                cin = rhs.shape[dn.rhs_spec[1]] * fgc
                cout = rhs.shape[dn.rhs_spec[0]]
                spatial_out = 1
                for d in dn.out_spec[2:]:
                    spatial_out *= out.shape[d]
                batch = out.shape[dn.out_spec[0]]
                kh_kw = k_elems // (rhs.shape[dn.rhs_spec[1]] * cout)
                flops = 2 * batch * spatial_out * cout * (cin // fgc) * kh_kw
            else:
                dnums = eqn.params["dimension_numbers"]
                (lc, rc), (lb, rb) = dnums
                import numpy as np

                m = int(np.prod([d for i, d in enumerate(lhs.shape)
                                 if i not in set(lc) | set(lb)]))
                k = int(np.prod([lhs.shape[i] for i in lc]))
                n = int(np.prod([d for i, d in enumerate(rhs.shape)
                                 if i not in set(rc) | set(rb)]))
                b = int(np.prod([lhs.shape[i] for i in lb]))
                flops = 2 * b * m * n * k
            by = _bytes(lhs) + _bytes(rhs) + _bytes(out)
            is_int8 = lhs.dtype.itemsize == 1 and rhs.dtype.itemsize == 1
            peak = MXU_INT8 if is_int8 else MXU_BF16
            rows.append({
                "op": prim, "shape_out": list(out.shape),
                "lhs": list(lhs.shape), "rhs": list(rhs.shape),
                "dtype": str(out.dtype),
                "gflops": round(flops / 1e9, 3),
                "mbytes": round(by / 1e6, 3),
                "mxu_us": round(flops / peak * 1e6, 2),
                "hbm_us": round(by / HBM_GBPS * 1e6, 2),
                "roofline_us": round(max(flops / peak, by / HBM_GBPS) * 1e6, 2),
                "bound": "HBM" if by / HBM_GBPS > flops / peak else "MXU",
            })
        for sub in eqn.params.values():
            if hasattr(sub, "jaxpr"):
                inner = sub.jaxpr if isinstance(getattr(sub, "jaxpr", None),
                                                Jaxpr) else sub.jaxpr
                walk(inner, rows, prefix)
            elif isinstance(sub, (list, tuple)):
                for s in sub:
                    if hasattr(s, "jaxpr"):
                        walk(s.jaxpr, rows, prefix)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--img", type=int, default=1280)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--variant", default="s")
    ap.add_argument("--out", default="profiles/roofline.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    import bench

    pipeline, _b, _m, _v, _body = bench._build_pipeline(
        args.variant, args.img, 10, args.batch
    )
    frames = jnp.zeros(
        (args.batch, args.img // 4, args.img // 4, 48), jnp.uint8
    )
    jaxpr = jax.make_jaxpr(pipeline.__wrapped__)(frames).jaxpr

    rows = []
    walk(jaxpr, rows)
    total_ms = sum(r["roofline_us"] for r in rows) / 1000
    mxu_ms = sum(r["mxu_us"] for r in rows) / 1000
    hbm_ms = sum(r["hbm_us"] for r in rows) / 1000
    gflops = sum(r["gflops"] for r in rows)
    hbm_bound = [r for r in rows if r["bound"] == "HBM"]

    print(f"{len(rows)} matmul/conv ops, {gflops:.0f} GFLOP/batch")
    print(f"roofline (sum of per-op max(MXU, HBM)): {total_ms:.2f} ms/batch")
    print(f"  pure-MXU time: {mxu_ms:.2f} ms; pure-HBM time: {hbm_ms:.2f} ms")
    print(f"  {len(hbm_bound)}/{len(rows)} ops HBM-bound "
          f"({sum(r['roofline_us'] for r in hbm_bound)/1000:.2f} ms of the bound)")
    print(f"\n top ops by roofline time:")
    for r in sorted(rows, key=lambda r: -r["roofline_us"])[:18]:
        print(f"  {r['roofline_us']:8.1f} us  [{r['bound']}] {r['op'][:4]} "
              f"out{r['shape_out']} lhs{r['lhs']} rhs{r['rhs']} "
              f"{r['gflops']:.1f}GF {r['mbytes']:.0f}MB")

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps({
        "img": args.img, "batch": args.batch, "variant": args.variant,
        "n_ops": len(rows), "gflops_per_batch": round(gflops, 1),
        "roofline_ms_per_batch": round(total_ms, 3),
        "mxu_ms": round(mxu_ms, 3), "hbm_ms": round(hbm_ms, 3),
        "ops": sorted(rows, key=lambda r: -r["roofline_us"]),
    }, indent=1))
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
