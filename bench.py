"""Benchmark: images/sec/chip for the full inference pipeline at 1280px, batch 16.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The measured pipeline is the north-star path (BASELINE.json): normalize -> skyeye_s
forward (bfloat16) -> anchor decode -> fixed-shape NMS, all inside one jit launch on
a single TPU chip. `vs_baseline` compares against the repaired reference PyTorch
pipeline measured on this host's CPU (no CUDA GPU exists in this environment; the
reference publishes no numbers — BASELINE.md). The torch number is cached in
.bench_baseline.json so repeat runs skip the slow CPU measurement.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

IMG = 1280
BATCH = 16
VARIANT = "s"
NC = 10
BASELINE_CACHE = Path(__file__).parent / ".bench_baseline.json"


def measure_tpu() -> dict:
    import jax
    import jax.numpy as jnp

    from skyeye_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from skyeye_tpu.config import ModelConfig
    from skyeye_tpu.models import SkyEyeDetectorModule, decode_predictions
    from skyeye_tpu.ops.nms import _nms_single_impl
    from skyeye_tpu.ops.packed_stem import pack_stem_variables, s2d4_host
    from functools import partial

    cfg = ModelConfig.from_variant(VARIANT, nc=NC)
    # serving form: BN folded into conv kernels + s2d-packed first stage (exact
    # weight remaps; equivalence asserted by tests/test_packed_stem.py).
    # NOTE: the fused-CSP Pallas kernel (ops/pallas/csp_kernel.py, fused_csp=True)
    # beats XLA ~6% on csp1 standalone but its resident-image window exceeds the
    # Mosaic scoped-vmem budget inside this full pipeline — not enabled here.
    module = SkyEyeDetectorModule(config=cfg, dtype=jnp.bfloat16, packed_stem=True)
    canonical = SkyEyeDetectorModule(config=cfg, dtype=jnp.bfloat16)
    variables = canonical.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3), jnp.float32), train=False
    )
    from skyeye_tpu.utils.checkpoint import fuse_conv_bn

    variables = pack_stem_variables(fuse_conv_bn(variables))
    anchors = jnp.asarray(cfg.anchors)

    @jax.jit
    def pipeline(frames):  # uint8 (B, H/4, W/4, 48) host-packed (s2d4_host)
        x = frames.astype(jnp.bfloat16) / 255.0
        outs = module.apply(variables, x, train=False)
        dec = decode_predictions(outs, anchors, (IMG, IMG))
        det, n = jax.vmap(
            # approx_max_k: the exact lax.top_k over ~100k candidate scores was
            # 38% of pipeline time (sort-bound; profiles/trace_1280); the
            # TPU-native approximate top-k is the serving-mode candidate cut
            partial(_nms_single_impl, conf_thres=0.25, iou_thres=0.45,
                    multi_label=False, agnostic=False, max_det=300, max_nms=4096,
                    approx_topk=True)
        )(dec)
        return det, n

    rng = np.random.default_rng(0)
    frames = [
        jnp.asarray(s2d4_host(
            rng.integers(0, 255, (BATCH, IMG, IMG, 3)).astype(np.uint8)))
        for _ in range(2)
    ]

    t0 = time.time()
    jax.block_until_ready(pipeline(frames[0]))
    compile_s = time.time() - t0
    print(f"# compile: {compile_s:.1f}s", file=sys.stderr)

    # analytic forward FLOPs for the MFU figure (XLA cost analysis when available)
    flops_per_img = None
    try:
        from skyeye_tpu.utils.profiling import flops_of

        f = flops_of(lambda fr: module.apply(variables, fr.astype(jnp.bfloat16) / 255.0,
                                             train=False), frames[0])
        if f:
            flops_per_img = f / BATCH
    except Exception as e:
        print(f"# cost analysis unavailable: {e}", file=sys.stderr)

    # latency mode: one batch in flight
    times = []
    for i in range(8):
        t0 = time.perf_counter()
        jax.block_until_ready(pipeline(frames[i % 2]))
        times.append(time.perf_counter() - t0)
    lat = float(np.median(times))
    print(f"# latency: {lat * 1000:.1f} ms/batch ({BATCH / lat:.1f} img/s)",
          file=sys.stderr)

    # throughput mode (the headline): K batches in flight, sync once — serving-style
    # pipelining that amortizes the per-launch dispatch overhead
    K = 16
    t0 = time.perf_counter()
    outs = [pipeline(frames[i % 2]) for i in range(K)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / K
    ips = BATCH / dt
    mfu = None
    if flops_per_img:
        # v5e bf16 peak 197 TFLOP/s
        mfu = round(ips * flops_per_img / 197e12 * 100, 2)
        print(f"# fwd FLOPs/img {flops_per_img / 1e9:.1f} GF -> MFU {mfu}%",
              file=sys.stderr)
    return {"ips": ips, "latency_ips": BATCH / lat, "mfu_pct": mfu,
            "compile_s": round(compile_s, 1)}


def measure_torch_reference() -> float:
    """Repaired reference torch pipeline on host CPU (cached)."""
    if BASELINE_CACHE.exists():
        try:
            return float(json.loads(BASELINE_CACHE.read_text())["ips"])
        except Exception:
            pass

    import importlib.util
    import types

    import torch

    REF = Path("/root/reference/skyeye/core/models")
    if not REF.exists():
        return 0.0
    pkg = types.ModuleType("refmod_bench")
    pkg.__path__ = [str(REF)]
    sys.modules["refmod_bench"] = pkg
    for name in ["blocks", "attention", "backbone", "detector"]:
        spec = importlib.util.spec_from_file_location(
            f"refmod_bench.{name}", REF / f"{name}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmod_bench.{name}"] = mod
        spec.loader.exec_module(mod)
    det = sys.modules["refmod_bench.detector"]
    bb = sys.modules["refmod_bench.backbone"]

    class FixedBackbone(bb.SkyEyeBackbone):
        def __init__(self, base_channels=64, depth_multiple=1.0, width_multiple=1.0):
            super().__init__(base_channels, depth_multiple, width_multiple)
            sc = lambda x: max(round(x * width_multiple), 1)
            self.channels = [sc(base_channels * 4), sc(base_channels * 8),
                             sc(base_channels * 16)]

    det.SkyEyeBackbone = FixedBackbone
    det.SkyEyeDetector._initialize_weights = lambda self: None
    # reference neck only works at width 1.0; use base 32 / d 0.33 as the closest
    # runnable stand-in for the s-variant compute budget
    model = det.SkyEyeDetector(
        {"nc": NC, "base_channels": 32, "depth_multiple": 0.33, "width_multiple": 1.0},
        3,
    ).eval()

    b = 2  # small batch, extrapolate (CPU)
    x = torch.rand(b, 3, IMG, IMG)
    with torch.no_grad():
        model(x)  # warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            model(x)
            times.append(time.perf_counter() - t0)
    ips = b / float(np.median(times))
    BASELINE_CACHE.write_text(json.dumps({"ips": ips, "note": "torch CPU, repaired reference, batch 2"}))
    return ips


LAST_GOOD = Path(__file__).parent / ".bench_last_good.json"


def device_reachable(timeout_s: int = 300) -> bool:
    """Probe backend init in a subprocess: a wedged TPU relay blocks forever inside
    jax.devices(), which would hang the whole benchmark (seen after a SIGKILLed
    client leaked its chip claim — ROUND1_NOTES.md)."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True,
        )
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    metric_name = (f"skyeye_{VARIANT} e2e inference images/sec/chip @{IMG}px "
                   f"batch {BATCH} (fwd+decode+NMS, pipelined)")
    if not device_reachable():
        # NEVER emit a cached number silently: mark it loudly so the record can't
        # be mistaken for a live measurement
        print("# TPU backend unreachable (wedged relay?); trying cached measurement",
              file=sys.stderr)
        if LAST_GOOD.exists():
            rec = json.loads(LAST_GOOD.read_text())
            rec["cached"] = True
            rec["metric"] = rec["metric"] + " [CACHED — live measurement failed]"
            print(json.dumps(rec))
            return
        print(json.dumps({"metric": metric_name, "value": 0.0,
                          "unit": "images/sec", "vs_baseline": 0.0,
                          "cached": False}))
        return

    m = measure_tpu()
    try:
        baseline = measure_torch_reference()
    except Exception as e:
        print(f"# baseline measurement failed: {e}", file=sys.stderr)
        baseline = 0.0
    vs = m["ips"] / baseline if baseline > 0 else 0.0
    line = json.dumps({
        "metric": metric_name,
        "value": round(m["ips"], 2),
        "unit": "images/sec",
        # no CUDA GPU exists in this environment: vs_baseline is the repaired
        # reference's torch pipeline on host CPU (see BASELINE.md for context)
        "vs_baseline": round(vs, 2),
        "latency_images_per_s": round(m["latency_ips"], 2),
        "mfu_pct": m["mfu_pct"],
        "cached": False,
    })
    LAST_GOOD.write_text(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
