"""On-chip evidence that the Pallas kernels run inside the production pipeline.

VERDICT.md #1 ("Done = a jax.profiler trace showing the kernels executing
inside the bench pipeline"). Two artifacts:

  1. compiled-HLO scan: lowers and compiles the EXACT bench pipeline
     (bench.py's fwd+decode+NMS graph) for the TPU backend and greps the
     optimized HLO for `tpu_custom_call` custom-calls — the op Pallas kernels
     compile to. Prints each custom-call with its enclosing computation name.
  2. jax.profiler trace of the running pipeline, saved under profiles/ for
     inspection with TensorBoard/XProf.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_bench.py \
           [--img 640] [--batch 8] [--trace-dir profiles]

The pipeline profiled is bench.py's own `_build_pipeline` (so SKYEYE_INT8 /
SKYEYE_FUSED_CSP env switches profile exactly what bench.py would run). After
the trace, the xplane is converted through xprof's hlo_stats tool into a
categorized self-time summary (`hlo_stats_summary.json`): ms by HLO op
category plus the top ops — the per-stage evidence VERDICT-style reviews ask
for, produced in one chip run.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def summarize_hlo_stats(xplane_paths, n_launches, full_out: Path = None) -> dict:
    """xplane trace -> {category: ms/launch} + top ops, via xprof hlo_stats.

    With `full_out`, ALL per-op rows are additionally dumped as JSON — the
    input tools/roofline_attrib.py joins against the optimized HLO text to
    compute per-op roofline floors (VERDICT r3 missing #1)."""
    from xprof.convert import raw_to_tool_data as r

    data, _ = r.xspace_to_tool_data([str(p) for p in xplane_paths],
                                    "hlo_stats", {})
    tab = json.loads(data if isinstance(data, str) else data.decode())
    cols = [c["id"] for c in tab["cols"]]
    i_cat = cols.index("category")
    i_name = cols.index("hlo_op_name")
    i_self = cols.index("total_self_time")
    i_occ = cols.index("occurrences")
    by_cat, ops = {}, []
    for row in tab["rows"]:
        c = [cell["v"] for cell in row["c"]]
        ms = float(c[i_self]) / 1000.0 / max(n_launches, 1)
        by_cat[c[i_cat]] = by_cat.get(c[i_cat], 0.0) + ms
        ops.append({"op": c[i_name], "category": c[i_cat],
                    "self_ms_per_launch": round(ms, 4),
                    "occurrences": int(c[i_occ])})
    ops.sort(key=lambda o: -o["self_ms_per_launch"])
    total = sum(by_cat.values())
    if full_out is not None:
        full_out.write_text(json.dumps(
            {"n_launches": n_launches, "ops": ops}, indent=1))
        print(f"wrote {full_out} ({len(ops)} ops)")
    return {
        "total_device_ms_per_launch": round(total, 3),
        "ms_by_category": {k: round(v, 3) for k, v in
                           sorted(by_cat.items(), key=lambda kv: -kv[1])},
        "top_ops": ops[:25],
    }


def dump_hlo(compiled, trace_dir: Path) -> None:
    """Save the optimized HLO text (gz) for offline per-op attribution."""
    import gzip

    try:
        txt = compiled.as_text()
        p = trace_dir / "optimized_hlo.txt.gz"
        trace_dir.mkdir(parents=True, exist_ok=True)
        with gzip.open(p, "wt") as f:
            f.write(txt)
        print(f"wrote {p} ({len(txt)//1000} kB text)")
    except Exception as e:
        print(f"HLO dump failed: {e}", file=sys.stderr)


def _profile_train(args):
    """Trace the train step (bench --config train640 protocol) and summarize
    device time by HLO category — the serving pipeline got all the profile
    attention in rounds 1-3 while config #5 (405 img/s @640 b16) was never
    profiled. Writes the same artifacts as the serving path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from skyeye_tpu.config import DEFAULT_HYP, ModelConfig
    from skyeye_tpu.losses import ComputeLoss
    from skyeye_tpu.models import SkyEyeDetectorModule
    from skyeye_tpu.train import (
        build_optimizer_runtime, create_train_state, host_schedule,
        make_train_step,
    )

    cfg = ModelConfig.from_variant(args.variant, nc=10)
    loss_fn = ComputeLoss(jnp.asarray(cfg.anchors), cfg.nc,
                          dense=bool(os.environ.get("SKYEYE_DENSE_LOSS")))
    sched = host_schedule(DEFAULT_HYP, epochs=100, steps_per_epoch=100)
    rng = np.random.default_rng(0)
    images_np = rng.uniform(
        0, 1, (args.batch, args.img, args.img, 3)).astype(np.float32)
    if args.canonical_stem:
        images = jnp.asarray(images_np)
    else:
        # bench train640 / cli/train default: s2d4 packed-stem training with
        # the loader packing frames host-side (ops/packed_stem_train.py)
        from skyeye_tpu.ops.packed_stem import s2d4_host

        images = jnp.asarray(s2d4_host(images_np))
    targets = np.zeros((args.batch, 32, 6), np.float32)
    mask = np.zeros((args.batch, 32), bool)
    for b in range(args.batch):
        for t in range(8):
            targets[b, t] = [0, rng.integers(0, 10), rng.uniform(0.2, 0.8),
                             rng.uniform(0.2, 0.8), rng.uniform(0.05, 0.2),
                             rng.uniform(0.05, 0.2)]
            mask[b, t] = True
    batch_d = {
        "images": images, "targets": jnp.asarray(targets),
        "mask": jnp.asarray(mask),
        "n_valid": jnp.asarray(args.batch, jnp.int32),
        "opt_hyperparams": {k: jnp.float32(v) for k, v in sched(0).items()},
    }
    module = SkyEyeDetectorModule(config=cfg, dtype=jnp.bfloat16,
                                  packed_stem_train=not args.canonical_stem)
    variables = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((2, args.img, args.img, 3)), train=True)
    tx = build_optimizer_runtime(DEFAULT_HYP, variables["params"],
                                 batch_size=args.batch)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(module, loss_fn, tx))

    t0 = time.time()
    compiled_step = step.lower(state, batch_d).compile()
    dump_hlo(compiled_step, args.trace_dir)
    step = compiled_step
    state, _ = step(state, batch_d)
    jax.block_until_ready(state.params)
    print(f"compiled+first step in {time.time()-t0:.0f}s")

    args.trace_dir.mkdir(parents=True, exist_ok=True)
    n_launches = 3
    with jax.profiler.trace(str(args.trace_dir)):
        for _ in range(n_launches):
            state, metrics = step(state, batch_d)
        jax.block_until_ready(state.params)
    produced = sorted(args.trace_dir.rglob("*.xplane.pb"),
                      key=lambda f: f.stat().st_mtime)
    print(f"trace written: {[str(f) for f in produced][-2:]}")
    evidence = {"mode": "train", "img": args.img, "batch": args.batch,
                "variant": args.variant,
                "trace_files": [str(f) for f in produced][-4:]}
    try:
        summary = summarize_hlo_stats(
            produced[-1:], n_launches,
            full_out=args.trace_dir / "hlo_stats_full.json")
        evidence["hlo_stats"] = summary
        sp = args.trace_dir / "hlo_stats_summary.json"
        sp.write_text(json.dumps(summary, indent=1))
        print(f"device ms/step: {summary['total_device_ms_per_launch']}")
        for k, v in summary["ms_by_category"].items():
            print(f"  {v:8.3f} ms  {k}")
        print("wrote", sp)
    except Exception as e:
        print(f"hlo_stats summary failed: {e}", file=sys.stderr)
    out_path = args.trace_dir / "train_profile.json"
    out_path.write_text(json.dumps(evidence, indent=1))
    print("wrote", out_path)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--img", type=int, default=640)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--variant", default="s")
    p.add_argument("--trace-dir", type=Path, default=Path("profiles"))
    p.add_argument("--skip-trace", action="store_true")
    p.add_argument("--auto-layout", action="store_true",
                   help="AOT-compile with Layout.AUTO inputs (the shipped "
                        "bench configuration) so the trace matches bench.py")
    p.add_argument("--canonical-stem", action="store_true",
                   help="with --train: profile the canonical (unpacked) stem "
                        "instead of the packed_stem_train default that bench "
                        "config #5 / cli/train actually run")
    p.add_argument("--train", action="store_true",
                   help="profile the TRAIN step (fwd+bwd+optimizer+EMA, the "
                        "bench --config train640 protocol, bf16 activations) "
                        "instead of the serving pipeline")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    print("devices:", jax.devices())

    import bench
    from skyeye_tpu.ops.packed_stem import s2d4_host

    if args.train:
        _profile_train(args)
        return

    pipeline, _burst, module, variables, _body = bench._build_pipeline(
        args.variant, args.img, 10, args.batch
    )

    rng = np.random.default_rng(0)
    packed = s2d4_host(
        rng.integers(0, 255, (args.batch, args.img, args.img, 3)).astype(np.uint8))
    frames = jnp.asarray(packed)

    # -- 1. compiled HLO scan ---------------------------------------------------
    t0 = time.time()
    if args.auto_layout:
        from jax.experimental.layout import Format, Layout

        compiled = (
            jax.jit(_body, in_shardings=Format(Layout.AUTO))
            .lower(jax.ShapeDtypeStruct(frames.shape, jnp.uint8))
            .compile()
        )
        fmt = compiled.input_formats[0][0]
        frames = jax.device_put(packed, fmt)
        pipeline = compiled
        print(f"AUTO input layout: {fmt.layout.major_to_minor}")
    else:
        compiled = pipeline.lower(frames).compile()
    print(f"compiled in {time.time()-t0:.0f}s")
    dump_hlo(compiled, args.trace_dir)
    hlo = compiled.as_text()
    calls = []
    for m in re.finditer(r'custom-call[^\n]*custom_call_target="([^"]+)"[^\n]*', hlo):
        line = m.group(0)
        name_m = re.search(r"%?([\w.\-]*) ?= ?", line)
        calls.append({"target": m.group(1),
                      "op": (name_m.group(1) if name_m else "?")[:80]})
    pallas_calls = [c for c in calls if "tpu_custom_call" in c["target"]]
    print(f"custom-calls in optimized HLO: {len(calls)}, "
          f"Pallas (tpu_custom_call): {len(pallas_calls)}")
    for c in pallas_calls:
        print("  PALLAS:", c["op"])
    # kernel names survive in metadata op_name fields
    kernels = sorted(set(re.findall(
        r'op_name="[^"]*?([\w_]*(?:nms|flash|attention)_?kernel[\w_]*)[^"]*"', hlo)))
    named = sorted(set(re.findall(r"(pallas_[\w]+|greedy_nms[\w]*|flash_attention[\w]*)", hlo)))
    print("kernel name mentions in HLO:", kernels or named)

    evidence = {
        "img": args.img, "batch": args.batch,
        "n_custom_calls": len(calls),
        "n_pallas_calls": len(pallas_calls),
        "pallas_ops": [c["op"] for c in pallas_calls],
        "kernel_names": kernels or named,
    }

    # -- 2. profiler trace + hlo_stats summary ----------------------------------
    if not args.skip_trace:
        args.trace_dir.mkdir(parents=True, exist_ok=True)
        jax.block_until_ready(pipeline(frames))  # warm
        n_launches = 3
        with jax.profiler.trace(str(args.trace_dir)):
            for _ in range(n_launches):
                out = pipeline(frames)
            jax.block_until_ready(out)
        produced = sorted(args.trace_dir.rglob("*.xplane.pb"),
                          key=lambda f: f.stat().st_mtime)
        print(f"trace written: {[str(f) for f in produced][-2:]}")
        evidence["trace_files"] = [str(f) for f in produced][-4:]
        try:
            summary = summarize_hlo_stats(
                produced[-1:], n_launches,
                full_out=args.trace_dir / "hlo_stats_full.json")
            evidence["hlo_stats"] = summary
            sp = args.trace_dir / "hlo_stats_summary.json"
            sp.write_text(json.dumps(summary, indent=1))
            print(f"device ms/launch: {summary['total_device_ms_per_launch']}")
            for k, v in summary["ms_by_category"].items():
                print(f"  {v:8.3f} ms  {k}")
            print("wrote", sp)
        except Exception as e:  # tool-version drift must not kill the evidence
            print(f"hlo_stats summary failed: {e}", file=sys.stderr)

    out_path = args.trace_dir / "pallas_evidence.json"
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(evidence, indent=1))
    print("wrote", out_path)
    if not pallas_calls:
        print("WARNING: no Pallas custom-calls found — kernels NOT in pipeline",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
