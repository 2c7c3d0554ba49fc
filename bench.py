"""Benchmark: images/sec/chip for the full inference pipeline at 1280px, batch 16.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The measured pipeline is the north-star path (BASELINE.json): normalize -> skyeye_s
forward (bfloat16) -> anchor decode -> fixed-shape NMS, all inside one jit launch on
a single TPU chip. Two throughput numbers are measured LIVE every run:

  * streaming_ips (the headline `value`): fresh uint8 frames each batch, host
    s2d4 pack (thread-pipelined), per-batch H2D transfer, device pipeline, and
    D2H of detections + counts — the full frames-arriving-to-boxes path.
  * device_only_ips: device-resident input buffers re-fed (pure pipeline compute,
    what rounds 1-2 reported as the headline).

Latency is reported two ways: single-batch round trip (dominated by the ~28 ms
axon relay dispatch) and burst mode (K batches in ONE launch via lax.scan, which
amortizes the dispatch overhead for latency-sensitive multi-batch requests).

`vs_baseline` compares streaming_ips against the repaired reference PyTorch
pipeline measured on this host's CPU (no CUDA GPU exists in this environment; the
reference publishes no numbers — BASELINE.md). The torch number is cached in
.bench_baseline.json so repeat runs skip the slow CPU measurement.

Extra configs (BASELINE.json #1/#2/#3/#5) run with
--config single640 | transformer1280 | tiled4k | train640
(not part of the driver's default invocation; results recorded in BASELINE.md).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

IMG = 1280
BATCH = 16
VARIANT = "s"
NC = 10
BURST = 4  # batches per burst launch
BASELINE_CACHE = Path(__file__).parent / ".bench_baseline.json"


def _build_pipeline(variant: str, img: int, nc: int, batch: int):
    """Compile-free builder: returns (pipeline_fn, burst_fn, module, variables)."""
    import jax
    import jax.numpy as jnp

    from skyeye_tpu.config import ModelConfig
    from skyeye_tpu.models import SkyEyeDetectorModule, decode_predictions
    from skyeye_tpu.ops.nms import nms_batched
    from skyeye_tpu.ops.packed_stem import pack_stem_variables
    from skyeye_tpu.utils.checkpoint import fuse_conv_bn

    import os

    # "<v>_transformer" engages the flash-attention P5 head (configs/models/
    # skyeye_l_transformer.yaml equivalent)
    kw = {}
    if variant.endswith("_transformer"):
        variant = variant[: -len("_transformer")]
        kw["transformer_heads"] = True
    cfg = ModelConfig.from_variant(variant, nc=nc, **kw)
    # serving form: BN folded into conv kernels + s2d-packed first stage (exact
    # weight remaps; equivalence asserted by tests/test_packed_stem.py).
    # SKYEYE_FUSED_CSP=1 additionally swaps stage-1 CSP for the fused Pallas
    # kernel (ops/pallas/csp_kernel.py csp_fused_v2, halo-DMA variant).
    fused = bool(os.environ.get("SKYEYE_FUSED_CSP"))
    int8 = bool(os.environ.get("SKYEYE_INT8"))
    # packed stage 1 (ops/packed_csp.py) is the serving default: exact remap,
    # removes the 2-4x lane-padding HBM waste of the C=32/64 csp1 tensors
    # (profiles/r3_1280: the 3x3 32->32 alone was 3.1 ms vs 0.26 roofline).
    # SKYEYE_NO_PACKED_STAGE1=1 opts out; exclusive with fused/int8 paths.
    pstage1 = not (fused or int8 or os.environ.get("SKYEYE_NO_PACKED_STAGE1"))
    # merged cv1+cv2 split convs (ops/merged_csp.py): every CSP's two 1x1 split
    # convs read the same input; one 2h-channel conv reads it from HBM once.
    # Exact remap (tests/test_merged_csp.py). SKYEYE_NO_MERGED_CSP=1 opts out.
    merged = not os.environ.get("SKYEYE_NO_MERGED_CSP")
    # W-pair packed bottleneck chains for narrow CSPs (ops/packed_csp.py
    # pack_csp_m_variables): the hidden-64 m-convs of csp2/fpn3 run at ~26% of
    # their floor on 64/128 lanes (profiles/r4s1_1280); W-pairing fills the
    # lanes at 2x nominal MXU. Measured on-chip @1280 b16: 733.8 vs 771.0
    # img/s — a 4.8% REGRESSION (profiles/r4s2_packedm), so OFF by default;
    # SKYEYE_PACKED_M=1 opts in (the remap itself is exact, tests pass).
    packedm = bool(os.environ.get("SKYEYE_PACKED_M"))
    module = SkyEyeDetectorModule(config=cfg, dtype=jnp.bfloat16, packed_stem=True,
                                  fused_csp=fused, int8_early=int8,
                                  packed_stage1=pstage1, merged_csp=merged,
                                  packed_m_csp=packedm)
    canonical = SkyEyeDetectorModule(config=cfg, dtype=jnp.bfloat16)
    variables = canonical.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3), jnp.float32), train=False
    )
    variables = fuse_conv_bn(variables)
    if pstage1:
        from skyeye_tpu.ops.packed_csp import pack_stage1_variables

        # down1_p2p: down1 emits the 2x2-s2d layout PackedStage1 consumes
        variables = pack_stage1_variables(
            pack_stem_variables(variables, down1_p2p=True))
    else:
        variables = pack_stem_variables(variables)
    if fused:
        from skyeye_tpu.ops.fused_csp import fuse_csp_variables

        variables = fuse_csp_variables(variables, path=("backbone", "csp1"))
        print("# fused-CSP Pallas kernel ENABLED (stage-1)", file=sys.stderr)
    if int8:
        # SPEED measurement: scales don't affect timing, so synthesize ranges
        # instead of paying a capture_intermediates compile on chip (real
        # calibration is the accuracy path, tools/approx_topk_eval-style)
        from skyeye_tpu.models.backbone import scaled_depth
        from skyeye_tpu.ops.int8_stage import (
            _range_key_map, quantize_early_variables,
        )

        nb1 = scaled_depth(3, cfg.depth_multiple)
        nb2 = scaled_depth(9, cfg.depth_multiple)
        keys = set()
        for v in _range_key_map(nb1, nb2).values():
            if isinstance(v, tuple):
                keys.update(v[1:])
            elif v:
                keys.add(v)
        ranges = {k: {"pctl": 4.0, "absmax": 6.0} for k in keys}
        variables = quantize_early_variables(variables, ranges, cfg)
        print("# int8 early backbone ENABLED (stages 1-2)", file=sys.stderr)
    anchors = jnp.asarray(cfg.anchors)

    # late decode (ops/late_decode.py) is the serving default: candidate cut on
    # RAW head logits, decode only the ~1k survivors — skips the (*, no)-minor
    # lane-padded full-decode intermediates (~8.5x logical bytes in HBM copies
    # at no=15; profiles/r3_1280 copy.76/78/81). SKYEYE_NO_LATE_DECODE=1 opts
    # back into decode-everything-then-cut for A/B.
    late = not os.environ.get("SKYEYE_NO_LATE_DECODE")

    # fold the /255 normalization into the stem kernel (exact: conv(x*s, k) ==
    # conv(x, k*s)) — the standalone normalize pass cost a 1.13 ms layout copy
    # of its bf16[B,320,320,48] output per batch (profiles/r3_1280_latedecode
    # copy.179). Excluded under int8 (its calibration expects [0,1] input);
    # SKYEYE_NO_FOLD_SCALE=1 opts out for A/B.
    fold_scale = not (int8 or os.environ.get("SKYEYE_NO_FOLD_SCALE"))
    if fold_scale:
        from skyeye_tpu.ops.packed_stem import fold_input_scale

        variables = fold_input_scale(variables)

    # int8 neck (ops/int8_neck.py): every FPN/PAN conv s8xs8->s32 with static
    # activation scales — the round-4 unit-level 1.28x at neck-class shapes
    # (profiles/int8_deep_bench.json), end-to-end. Must rewrite the CANONICAL
    # neck subtree, so it runs before the merged-cv12 walk (which then skips
    # the flattened int8 params). SKYEYE_INT8_NECK=1 opts in (A/B).
    int8_neck = bool(os.environ.get("SKYEYE_INT8_NECK")) and not int8
    if int8_neck:
        from skyeye_tpu.ops.int8_neck import (
            _range_key_map as _neck_range_keys,
            quantize_neck_variables,
        )

        # SPEED measurement: synthesized ranges (scales don't affect timing —
        # same rationale as the int8-early path above); real calibration is
        # tools/int8_serving_gate.py
        keys = set()
        for v in _neck_range_keys(3).values():
            keys.update(v[1:] if isinstance(v, tuple) else (v,))
        nranges = {k: {"pctl": 4.0, "absmax": 6.0} for k in keys}
        variables = quantize_neck_variables(variables, nranges, cfg)
        module = module.clone(int8_neck=True)
        print("# int8 neck ENABLED (s8 x s8 -> s32 MXU, FPN/PAN)", file=sys.stderr)

    if merged:
        from skyeye_tpu.ops.merged_csp import merge_csp_cv12_variables

        # signature-driven walk: rewrites every remaining canonical CSP subtree
        # (packed/int8-replaced stages are left alone)
        variables = merge_csp_cv12_variables(variables)
    if packedm:
        from skyeye_tpu.ops.packed_csp import pack_csp_m_variables

        variables = pack_csp_m_variables(variables)

    # int8 stem (ops/int8_stem.py): the stem conv runs s8xs8->s32 on the 2x
    # int8 MXU path, consuming the uint8 frames directly — the round-4
    # attribution's biggest single-conv residue (1.90 ms vs 0.61 floor: XLA
    # convolves the u8 operand at ~50% MXU efficiency). Exact input path;
    # weights per-channel s8. SKYEYE_INT8_STEM=1 opts in (A/B).
    int8_stem = (bool(os.environ.get("SKYEYE_INT8_STEM"))
                 and not int8 and fold_scale)  # needs raw-u8 folded weights
    if int8_stem:
        from skyeye_tpu.ops.int8_stem import quantize_stem_variables

        variables = quantize_stem_variables(variables)
        module = module.clone(int8_stem=True)
        print("# int8 stem ENABLED (u8 x s8 -> s32 MXU)", file=sys.stderr)

    def body(frames):  # uint8 (B, H/4, W/4, 48) host-packed (s2d4_host)
        # under the int8 stem the model consumes the uint8 frames directly
        x = frames if int8_stem else frames.astype(jnp.bfloat16)
        if os.environ.get("SKYEYE_STEM_BF16_MATERIALIZE"):
            # A/B probe: XLA sinks this convert INTO the stem conv (the fused
            # conv reads u8 operands directly, profiles/r4s4_1280_barrier
            # fused_computation.9) and that conv runs at ~50% of its MXU floor.
            # The barrier forces a materialized bf16 input plane (+~0.3 ms HBM)
            # to test whether a bf16-operand conv emitter recovers more.
            x = jax.lax.optimization_barrier(x)
        if not fold_scale:
            x = x / 255.0
        outs = module.apply(variables, x, train=False)
        if late:
            from skyeye_tpu.ops.late_decode import late_decode_nms

            # approx_max_k: the exact lax.top_k over ~100k candidate scores was
            # 38% of pipeline time (sort-bound; profiles/trace_1280); the
            # TPU-native approximate top-k is the serving-mode candidate cut
            # (exact-vs-approx mAP delta measured on chip: BASELINE.md)
            # SKYEYE_TOPK_RECALL tunes the ApproxTopK recall target for every
            # approx cut (late_decode.default_recall_target; default 0.95 fell
            # back to a full sort at P3 geometry)
            return late_decode_nms(outs, anchors, (img, img), conf_thres=0.25,
                                   iou_thres=0.45, max_det=300, max_nms=1024,
                                   approx_topk=True)
        # serving: skip the reference-order transpose (row order is
        # irrelevant to NMS; saves a ~75 MB relayout per batch)
        dec = decode_predictions(outs, anchors, (img, img), anchor_major=False)
        det, n = nms_batched(
            dec, conf_thres=0.25, iou_thres=0.45,
            multi_label=False, agnostic=False, max_det=300, max_nms=1024,
            approx_topk=True)
        return det, n

    pipeline = jax.jit(body)

    @jax.jit
    def pipeline_burst(stack):  # (K, B, H/4, W/4, 48): K batches, ONE launch
        return jax.lax.scan(lambda c, fr: (c, body(fr)), 0, stack)[1]

    # the raw step fn, for callers that re-jit with AOT options (measure_tpu
    # compiles an input-layout-AUTO executable from it)
    return pipeline, pipeline_burst, module, variables, body


def _put_with_format(host_arr, fmt, _preps={}):
    """Materialize a host array on device in an explicit Format.

    NOT via jax.device_put(np_array, Format): that path is unreliable through
    this environment's relay — it nondeterministically returns a different
    layout than requested (live-observed (0,1,3,2) and (0,1,2,4,3) instead of
    the requested ones, with and without the persistent compilation cache).
    Instead: default-layout H2D, then an AOT identity executable whose OUTPUT
    format is pinned via out_shardings — the layout is enforced by the
    executable itself, which live-verification shows always honors it. The
    result layout is still asserted so any residual mismatch aborts the
    AUTO-layout path instead of wedging the device with a doomed execution."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format

    key = (host_arr.shape, str(host_arr.dtype), str(fmt.layout))
    preps = _preps.get(key)
    if preps is None:
        spec = jax.ShapeDtypeStruct(host_arr.shape, host_arr.dtype)
        out = Format(fmt.layout, fmt.sharding)
        # two DISTINCT executables for the same relayout: the failure mode is
        # per-process-sticky for a given executable (the relay returns the
        # input's layout metadata instead of the pinned output layout on every
        # call), so a second, structurally different HLO is the useful retry
        preps = [
            jax.jit(lambda x: x, out_shardings=out).lower(spec).compile(),
            jax.jit(lambda x: jax.lax.optimization_barrier(x),
                    out_shardings=out).lower(spec).compile(),
        ]
        _preps[key] = preps
    last = None
    for prep in preps:
        for _ in range(2):
            arr = prep(jnp.asarray(host_arr))
            if arr.format.layout == fmt.layout:
                return arr
            last = arr.format.layout
            arr.delete()
    raise RuntimeError(f"relayout produced {last}, wanted {fmt.layout}")


def _probe_batched_nms_kernel():
    """Compile-probe the batched lockstep NMS kernel on a tiny shape; on any
    Mosaic failure set SKYEYE_NO_BATCHED_NMS so every pipeline built afterwards
    falls back to the known-good vmapped per-image kernel — the headline bench
    must never break on a kernel-compile regression."""
    import os

    import jax
    import jax.numpy as jnp

    try:
        from skyeye_tpu.ops.pallas.nms_kernel import pallas_batched_greedy_nms

        jax.block_until_ready(pallas_batched_greedy_nms(
            jnp.zeros((8, 128, 4), jnp.float32),
            jnp.full((8, 128), -1.0, jnp.float32), max_det=16))
    except Exception as e:
        os.environ["SKYEYE_NO_BATCHED_NMS"] = "1"
        print(f"# batched NMS kernel compile failed; using vmapped per-image "
              f"kernel: {str(e)[:200]}", file=sys.stderr)


def measure_tpu() -> dict:
    import jax
    import jax.numpy as jnp

    from skyeye_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    _probe_batched_nms_kernel()

    from skyeye_tpu.ops.packed_stem import s2d4_host

    pipeline, pipeline_burst, module, variables, body = _build_pipeline(
        VARIANT, IMG, NC, BATCH
    )

    rng = np.random.default_rng(0)
    raw_frames = [
        rng.integers(0, 255, (BATCH, IMG, IMG, 3)).astype(np.uint8)
        for _ in range(4)
    ]
    packed_host = [s2d4_host(f) for f in raw_frames[:2]]

    # input-layout AUTO: by default jit pins inputs to the row-major default
    # layout and the compiled program relayouts them on chip EVERY launch
    # (profiles/r3s4_1280 copy.145: 0.89 ms/launch just re-tiling the uint8
    # frames). AOT-compiling with Layout.AUTO lets XLA pick the input tiling,
    # and device_put-ing the frames in that format once makes every timed
    # launch start from the layout the convs want. Exact same program.
    # SKYEYE_NO_AUTO_LAYOUT=1 opts out; any failure falls back to default.
    # ORDERING MATTERS (live-verified): a plain jnp.asarray of the same
    # host shape BEFORE the formatted put installs a default-layout transfer
    # program that later device_put(..., Format) calls silently reuse (JAX
    # transfer cache is keyed without the layout) — so the default-layout
    # `frames` placement must only happen on the fallback path.
    import os

    put_input = jnp.asarray  # H2D in whatever layout the pipeline expects
    compile_s = None
    frames = None
    if not os.environ.get("SKYEYE_NO_AUTO_LAYOUT"):
        try:
            from jax.experimental.layout import Format, Layout

            t0 = time.time()
            compiled = (
                jax.jit(body, in_shardings=Format(Layout.AUTO))
                .lower(jax.ShapeDtypeStruct(packed_host[0].shape, jnp.uint8))
                .compile()
            )
            fmt = compiled.input_formats[0][0]
            opt_frames = [_put_with_format(p, fmt) for p in packed_host]
            jax.block_until_ready(compiled(opt_frames[0]))
            compile_s = time.time() - t0
            pipeline, frames = compiled, opt_frames
            put_input = lambda p: _put_with_format(p, fmt)  # noqa: E731
            print(f"# input-layout AUTO engaged: "
                  f"{fmt.layout.major_to_minor}", file=sys.stderr)
        except Exception as e:
            print(f"# input-layout AUTO unavailable ({str(e)[:150]}); "
                  f"default layout", file=sys.stderr)

    if frames is None:
        frames = [jnp.asarray(p) for p in packed_host]
        t0 = time.time()
        jax.block_until_ready(pipeline(frames[0]))
        compile_s = time.time() - t0
    print(f"# compile: {compile_s:.1f}s", file=sys.stderr)

    # analytic forward FLOPs for the MFU figure (traced-jaxpr conv/dot count).
    # MFU uses the CANONICAL model's FLOPs: the packed-domain serving transforms
    # (ops/packed_stem.py, ops/packed_csp.py) inflate nominal FLOPs with
    # structured zeros, and counting those would overstate utilization.
    flops_per_img = None
    try:
        from skyeye_tpu.config import ModelConfig
        from skyeye_tpu.models import SkyEyeDetectorModule
        canon_kw = {}
        v = VARIANT
        if v.endswith("_transformer"):
            v = v[: -len("_transformer")]
            canon_kw["transformer_heads"] = True
        canon = SkyEyeDetectorModule(
            config=ModelConfig.from_variant(v, nc=NC, **canon_kw),
            dtype=jnp.bfloat16)
        cvars = canon.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, IMG, IMG, 3), jnp.float32), train=False)
        from skyeye_tpu.utils.profiling import flops_by_trace

        f = flops_by_trace(lambda fr: canon.apply(cvars, fr, train=False),
                           jnp.zeros((BATCH, IMG, IMG, 3), jnp.bfloat16))
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

    # burst latency: BURST batches in ONE launch (lax.scan) — amortizes the fixed
    # ~28 ms relay dispatch that dominates single-batch latency (VERDICT r2 #9)
    burst_ips = None
    try:
        host_stack = np.stack([packed_host[i % 2] for i in range(BURST)])
        stack = None  # formatted put must precede any same-shape asarray
        if not os.environ.get("SKYEYE_NO_AUTO_LAYOUT"):
            try:
                from jax.experimental.layout import Format, Layout

                def burst_body(st):
                    return jax.lax.scan(
                        lambda c, fr: (c, body(fr)), 0, st)[1]

                bc = (
                    jax.jit(burst_body, in_shardings=Format(Layout.AUTO))
                    .lower(jax.ShapeDtypeStruct(host_stack.shape, jnp.uint8))
                    .compile()
                )
                bfmt = bc.input_formats[0][0]
                stack = _put_with_format(host_stack, bfmt)
                pipeline_burst = bc
            except Exception as e:
                print(f"# burst AUTO layout unavailable ({str(e)[:120]})",
                      file=sys.stderr)
        if stack is None:
            stack = jnp.asarray(host_stack)
        t0 = time.time()
        jax.block_until_ready(pipeline_burst(stack))
        print(f"# burst compile+run: {time.time() - t0:.1f}s", file=sys.stderr)
        btimes = []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(pipeline_burst(stack))
            btimes.append(time.perf_counter() - t0)
        bl = float(np.median(btimes))
        burst_ips = BURST * BATCH / bl
        print(f"# burst latency: {bl * 1000:.1f} ms/{BURST} batches "
              f"({burst_ips:.1f} img/s)", file=sys.stderr)
    except Exception as e:
        print(f"# burst mode failed: {e}", file=sys.stderr)

    # device-only throughput: K batches in flight over device-resident buffers
    K = 16
    t0 = time.perf_counter()
    outs = [pipeline(frames[i % 2]) for i in range(K)]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / K
    device_ips = BATCH / dt

    # pipelined-burst throughput: the scan-of-BURST launch, several in flight.
    # Same per-image work as the row above (the model still runs b16 per scan
    # step); the scan packs 4 micro-batches into one launch so the per-launch
    # relay gap (~1.6 ms at 16-in-flight single-batch launches) amortizes 4x.
    burst_pipelined_ips = None
    if burst_ips is not None:
        try:
            KB = 6
            t0 = time.perf_counter()
            bouts = [pipeline_burst(stack) for _ in range(KB)]
            jax.block_until_ready(bouts)
            bdt = (time.perf_counter() - t0) / KB
            burst_pipelined_ips = BURST * BATCH / bdt
            print(f"# pipelined burst: {bdt * 1000:.1f} ms/{BURST}-batch launch "
                  f"({burst_pipelined_ips:.1f} img/s)", file=sys.stderr)
        except Exception as e:
            print(f"# pipelined burst failed: {e}", file=sys.stderr)

    # raw H2D bandwidth probe: in this environment the chip sits behind the axon
    # network relay, so host->device transfers can be ~20 MB/s instead of PCIe's
    # ~10 GB/s — in that regime streaming throughput measures the relay, not the
    # framework, and the headline falls back to device_only (documented below)
    probe = jnp.asarray(raw_frames[0])
    jax.block_until_ready(probe)
    t0 = time.perf_counter()
    jax.block_until_ready(jnp.asarray(raw_frames[1]))
    h2d_mbps = raw_frames[1].nbytes / (time.perf_counter() - t0) / 1e6
    print(f"# H2D bandwidth: {h2d_mbps:.0f} MB/s", file=sys.stderr)

    # STREAMING throughput: fresh host frames each batch -> s2d4 host pack
    # (3 pipelined pack threads; numpy releases the GIL) -> H2D -> device
    # pipeline -> D2H of (det, n). This is the full uint8-frames-arriving-to-boxes
    # path the north star describes (VERDICT r2 #3).
    from concurrent.futures import ThreadPoolExecutor

    KS = 24 if h2d_mbps > 500 else 6  # don't spend minutes when relay-bound
    with ThreadPoolExecutor(3) as ex:
        pack_futs = [
            ex.submit(s2d4_host, raw_frames[i % len(raw_frames)])
            for i in range(min(3, KS))
        ]
        t0 = time.perf_counter()
        results = []
        for i in range(KS):
            packed = pack_futs[i % 3].result()
            if i + 3 < KS:
                pack_futs[i % 3] = ex.submit(
                    s2d4_host, raw_frames[(i + 3) % len(raw_frames)]
                )
            det, n = pipeline(put_input(packed))  # H2D + launch, async
            results.append((det, n))
            if len(results) > 3:  # bounded in-flight queue, serving-style
                d, nn = results.pop(0)
                np.asarray(d), np.asarray(nn)  # D2H: boxes + counts to host
        for d, nn in results:
            np.asarray(d), np.asarray(nn)
        dt_s = (time.perf_counter() - t0) / KS
    streaming_ips = BATCH / dt_s

    # SIMULATED-PCIE streaming (VERDICT r3 #6): the honest streaming row above
    # is relay-bound (~20-45 MB/s H2D through the axon tunnel), so round 3 could
    # only EXTRAPOLATE "at PCIe rates H2D overlaps compute". This measures it:
    # stage 4 batches HBM-resident, then feed the pipeline on a paced clock —
    # batch i is released only after i*ingest_budget has elapsed, modeling
    # frames arriving over a PCIe-class link (78.6 MB/batch at ~12 GB/s =
    # 6.5 ms/batch) — with the same bounded in-flight queue + D2H drain as the
    # real streaming loop. The skipped DMA itself would cost ~0.1 ms of HBM
    # time per batch (78.6 MB / 819 GB/s), negligible next to ~21 ms compute.
    # Claim proven if throughput ~= device_only.
    sim_pcie_ips = None
    SIM_INGEST_S = 0.0065
    try:
        import queue as _queue
        import threading

        sim_frames = [put_input(s2d4_host(f)) for f in raw_frames]
        jax.block_until_ready(sim_frames)
        # D2H must be modeled at PCIe budgets too, like H2D: the full payload
        # is (16,300,6) f32 = 115 KB/batch = ~10 us at PCIe — but through the
        # axon tunnel it costs ~7 ms/batch of pure tunnel BANDWIDTH (16-43
        # MB/s), which amortizing cannot hide (it is linear in bytes, not a
        # round trip; the first cut of this fix fetched full boxes per
        # DRAIN_G=8 group and still read 606 vs 785 device-only — re-measuring
        # the tunnel, exactly what this mode exists to factor out). So the
        # side-thread drain fetches a device-REDUCED summary per group: every
        # batch's valid count plus a checksum over all its box coordinates —
        # a data-dependent value derived from every detection, ~70 bytes per
        # DRAIN_G=16 batches, so only the relay round trip (not its bandwidth)
        # stays in the loop, amortized 16x.
        # Backpressure is REAL, not asserted: the producer may run at most 2
        # undrained groups ahead (semaphore released only after the drain's
        # device fetch completes), so worst-case launch depth is bounded at
        # 2*DRAIN_G + (DRAIN_G-1) = 23 batches — a serving-style bounded
        # pipeline, not an unbounded fire-and-forget (advisor r4, medium).
        DRAIN_G = 8
        sem = threading.Semaphore(2)
        summarize = jax.jit(lambda ds, ns: (
            jnp.stack(ns),
            sum(jnp.sum(d, dtype=jnp.float32) for d in ds)))
        drain_err: list = []

        def drain(q):
            try:
                while True:
                    group = q.get()
                    if group is None:
                        return
                    try:
                        ds, ns = zip(*group)
                        sn, chk = summarize(list(ds), list(ns))
                        np.asarray(sn), np.asarray(chk)  # tiny D2H per group
                    finally:
                        sem.release()
            except Exception as e:  # re-raised on the main thread
                drain_err.append(e)
                while True:  # keep unblocking the producer so it can notice
                    if q.get() is None:
                        return
                    sem.release()

        # warm the summary jit + one fetch OUTSIDE the timed window
        warm = [pipeline(sim_frames[0]) for _ in range(DRAIN_G)]
        wn_, wchk = summarize([d for d, _ in warm], [n for _, n in warm])
        np.asarray(wn_), np.asarray(wchk)

        q: _queue.Queue = _queue.Queue(maxsize=2)
        th = threading.Thread(target=drain, args=(q,), daemon=True)
        th.start()
        KP = 48
        # a partial final group would retrace `summarize` (different list
        # length) inside the timed window — seconds through the relay
        assert KP % DRAIN_G == 0, (KP, DRAIN_G)
        pend = []
        t_start = time.perf_counter()
        for i in range(KP):
            budget = t_start + (i + 1) * SIM_INGEST_S
            now = time.perf_counter()
            if now < budget:  # frame not "arrived" yet at PCIe pace
                time.sleep(budget - now)
            det, n = pipeline(sim_frames[i % len(sim_frames)])
            pend.append((det, n))
            if len(pend) == DRAIN_G:
                sem.acquire()  # backpressure: at most 2 undrained groups
                q.put(pend)
                pend = []
        q.put(None)
        th.join()
        if drain_err:
            raise drain_err[0]
        sim_pcie_ips = BATCH * KP / (time.perf_counter() - t_start)
        print(f"# simulated-PCIe streaming ({SIM_INGEST_S*1000:.1f} ms/batch "
              f"ingest): {sim_pcie_ips:.1f} img/s", file=sys.stderr)
    except Exception as e:
        print(f"# simulated-PCIe streaming failed: {e}", file=sys.stderr)

    def mfu_of(ips):
        if not flops_per_img:
            return None
        return round(ips * flops_per_img / 197e12 * 100, 2)  # v5e bf16 peak 197 TF/s

    if flops_per_img:
        print(f"# fwd FLOPs/img {flops_per_img / 1e9:.1f} GF -> streaming MFU "
              f"{mfu_of(streaming_ips)}% device-only MFU {mfu_of(device_ips)}%",
              file=sys.stderr)
    print(f"# streaming: {streaming_ips:.1f} img/s | device-only: "
          f"{device_ips:.1f} img/s", file=sys.stderr)
    # headline: streaming when the chip is locally attached (H2D at PCIe rates);
    # behind the slow axon relay the streaming number measures the tunnel, so the
    # headline stays device-side and streaming is reported alongside.
    relay_bound = h2d_mbps < 500
    return {
        "ips": device_ips if relay_bound else streaming_ips,
        "streaming_ips": streaming_ips,
        "device_only_ips": device_ips,
        "burst_pipelined_ips": burst_pipelined_ips,
        "relay_bound": relay_bound,
        "h2d_mbps": round(h2d_mbps, 1),
        "latency_ips": BATCH / lat,
        "burst_latency_ips": burst_ips,
        "sim_pcie_ips": sim_pcie_ips,
        "sim_ingest_ms": SIM_INGEST_S * 1000,
        "mfu_pct": mfu_of(device_ips if relay_bound else streaming_ips),
        "mfu_device_only_pct": mfu_of(device_ips),
        "compile_s": round(compile_s, 1),
    }


def measure_burst_sweep(ks=(1, 2, 4, 8, 16)) -> dict:
    """VERDICT r3 #8: the latency/throughput frontier of the burst launch.

    For each K: ONE lax.scan launch carries K micro-batches of BATCH images.
    ms_to_first_result = the single-launch round trip (relay dispatch + K
    batches of compute — the latency a K-batch request pays), pipelined_ips =
    throughput with several K-launches in flight. K=1 is the plain pipeline.
    A deployment picks its point: small K for latency, large K for throughput.
    """
    import jax
    import jax.numpy as jnp

    from skyeye_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    _probe_batched_nms_kernel()
    from skyeye_tpu.ops.packed_stem import s2d4_host

    _, _, _, _, body = _build_pipeline(VARIANT, IMG, NC, BATCH)
    rng = np.random.default_rng(0)
    packed = s2d4_host(
        rng.integers(0, 255, (BATCH, IMG, IMG, 3)).astype(np.uint8))

    rows = []
    for K in ks:
        if K == 1:
            fn = jax.jit(body)
            host = packed
        else:
            def burst_body(st):
                return jax.lax.scan(lambda c, fr: (c, body(fr)), 0, st)[1]

            fn = jax.jit(burst_body)
            host = np.stack([packed] * K)
        stack = jnp.asarray(host)
        t0 = time.time()
        jax.block_until_ready(fn(stack))
        compile_s = time.time() - t0
        lats = []
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(stack))
            lats.append(time.perf_counter() - t0)
        lat_ms = float(np.median(lats)) * 1000
        KB = max(2, 24 // K)
        t0 = time.perf_counter()
        outs = [fn(stack) for _ in range(KB)]
        jax.block_until_ready(outs)
        ips = K * BATCH * KB / (time.perf_counter() - t0)
        rows.append({"k": K, "ms_to_first_result": round(lat_ms, 1),
                     "single_launch_images_per_s": round(K * BATCH / lat_ms * 1000, 1),
                     "pipelined_images_per_s": round(ips, 1),
                     "compile_s": round(compile_s, 1)})
        print(f"# K={K}: {lat_ms:.1f} ms/launch "
              f"({K * BATCH / lat_ms * 1000:.1f} img/s single, "
              f"{ips:.1f} pipelined)", file=sys.stderr)
    return {
        "metric": f"burst-K latency/throughput frontier @{IMG}px b{BATCH} "
                  "(K micro-batches per lax.scan launch)",
        "value": rows[-1]["pipelined_images_per_s"], "unit": "images/sec",
        "sweep": rows, "cached": False,
    }


def measure_transformer_1280(batch: int = 4) -> dict:
    """BASELINE config #2: skyeye_l high-res 1280px, transformer P5 head."""
    import jax
    import jax.numpy as jnp

    from skyeye_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    _probe_batched_nms_kernel()
    from skyeye_tpu.ops.packed_stem import s2d4_host

    pipeline, _, module, variables, _body = _build_pipeline(
        "l_transformer", IMG, NC, batch
    )
    rng = np.random.default_rng(0)
    frames = [
        jnp.asarray(s2d4_host(
            rng.integers(0, 255, (batch, IMG, IMG, 3)).astype(np.uint8)))
        for _ in range(2)
    ]
    t0 = time.time()
    jax.block_until_ready(pipeline(frames[0]))
    compile_s = time.time() - t0
    print(f"# compile: {compile_s:.1f}s", file=sys.stderr)

    # Pallas-kernel engagement evidence: scan the optimized HLO of the exact
    # executable for tpu_custom_call kernels (round-2 protocol)
    kernels = []
    try:
        hlo = pipeline.lower(frames[0]).compile().as_text()
        n_calls = hlo.count("tpu_custom_call")
        for name in ("flash", "nms", "csp"):
            if name in hlo:
                kernels.append(name)
        print(f"# tpu_custom_call x{n_calls}; kernels: {kernels}", file=sys.stderr)
    except Exception as e:
        n_calls = None
        print(f"# HLO scan unavailable: {e}", file=sys.stderr)

    flops_per_img = None
    try:
        from skyeye_tpu.utils.profiling import flops_of

        f = flops_of(lambda fr: module.apply(
            variables, fr.astype(jnp.bfloat16) / 255.0, train=False), frames[0])
        if f:
            flops_per_img = f / batch
    except Exception as e:
        print(f"# cost analysis unavailable: {e}", file=sys.stderr)

    K = 12
    t0 = time.perf_counter()
    outs = [pipeline(frames[i % 2]) for i in range(K)]
    jax.block_until_ready(outs)
    ips = batch / ((time.perf_counter() - t0) / K)
    mfu = (round(ips * flops_per_img / 197e12 * 100, 2) if flops_per_img else None)
    return {
        "metric": f"skyeye_l_transformer e2e inference images/sec/chip @{IMG}px "
                  f"batch {batch} (fwd+decode+NMS, pipelined)",
        "value": round(ips, 2), "unit": "images/sec", "mfu_pct": mfu,
        "tpu_custom_calls": n_calls, "pallas_kernels_in_hlo": kernels,
        "compile_s": round(compile_s, 1), "cached": False,
    }


def measure_tiled_4k(batch: int = 2) -> dict:
    """BASELINE config #3: batched 4K drone-frame inference with tiled slicing."""
    import jax
    import jax.numpy as jnp

    from skyeye_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    _probe_batched_nms_kernel()
    from functools import partial

    from skyeye_tpu.config import ModelConfig
    from skyeye_tpu.models import SkyEyeDetectorModule
    from skyeye_tpu.ops.tiling import detect_tiled, tile_grid
    from skyeye_tpu.utils.checkpoint import fuse_conv_bn

    H, W, tile = 2160, 3840, 1280
    cfg = ModelConfig.from_variant(VARIANT, nc=NC)
    module = SkyEyeDetectorModule(config=cfg, dtype=jnp.bfloat16)
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, tile, tile, 3), jnp.float32),
        train=False,
    )
    variables = fuse_conv_bn(variables)
    T = tile_grid((H, W), tile, overlap=0.2).shape[0]

    @jax.jit
    def run(frames):
        return detect_tiled(
            module, variables, cfg.anchors, frames,
            tile=tile, overlap=0.2, conf_thres=0.25, iou_thres=0.45,
            dtype=jnp.bfloat16,
        )
    rng = np.random.default_rng(0)
    clips = [
        jnp.asarray(rng.integers(0, 255, (batch, H, W, 3)).astype(np.uint8))
        for _ in range(2)
    ]
    t0 = time.time()
    jax.block_until_ready(run(clips[0]))
    compile_s = time.time() - t0
    print(f"# compile: {compile_s:.1f}s ({T} tiles/frame)", file=sys.stderr)

    K = 8
    t0 = time.perf_counter()
    outs = [run(clips[i % 2]) for i in range(K)]
    jax.block_until_ready(outs)
    fps = batch / ((time.perf_counter() - t0) / K)
    return {
        "metric": f"skyeye_{VARIANT} tiled 4K video inference frames/sec/chip "
                  f"({H}x{W}, {T} tiles of {tile}px, batch {batch}, "
                  "per-tile NMS + global merge NMS)",
        "value": round(fps, 2), "unit": "frames/sec",
        "tiles_per_frame": T, "tile_ips": round(fps * T, 1),
        "compile_s": round(compile_s, 1), "cached": False,
    }


def measure_single_640(batch: int = 1) -> dict:
    """BASELINE config #1: skyeye_s single-image inference at 640px
    (s2d-pack -> backbone -> heads -> decode -> NMS in one launch)."""
    import jax
    import jax.numpy as jnp

    from skyeye_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    _probe_batched_nms_kernel()
    from skyeye_tpu.ops.packed_stem import s2d4_host

    pipeline, _, _, _, _body = _build_pipeline(VARIANT, 640, NC, batch)
    rng = np.random.default_rng(0)
    frames = [
        jnp.asarray(s2d4_host(
            rng.integers(0, 255, (batch, 640, 640, 3)).astype(np.uint8)))
        for _ in range(2)
    ]
    t0 = time.time()
    jax.block_until_ready(pipeline(frames[0]))
    compile_s = time.time() - t0

    times = []
    for i in range(16):
        t0 = time.perf_counter()
        jax.block_until_ready(pipeline(frames[i % 2]))
        times.append(time.perf_counter() - t0)
    lat_ms = float(np.median(times)) * 1000

    K = 32
    t0 = time.perf_counter()
    outs = [pipeline(frames[i % 2]) for i in range(K)]
    jax.block_until_ready(outs)
    ips = batch * K / (time.perf_counter() - t0)
    return {
        "metric": f"skyeye_{VARIANT} single-image inference @640px "
                  "(pack+fwd+decode+NMS, one launch)",
        "value": round(lat_ms, 2), "unit": "ms/image",
        "pipelined_images_per_s": round(ips, 1),
        "compile_s": round(compile_s, 1), "cached": False,
    }


def measure_train_640(batch: int = 16, steps: int = 24) -> dict:
    """BASELINE config #5 protocol: skyeye_s train-step throughput at 640px
    batch 16 (fwd+bwd+optimizer+EMA in one launch; runtime-scalar schedules
    as shipped by cli/train). Headline is the bf16-activation step (`--half`,
    the analogue of the reference's AMP-on protocol: f32 params/optimizer,
    bf16 compute on the MXU); the f32 step is recorded alongside."""
    import jax
    import jax.numpy as jnp

    from skyeye_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from skyeye_tpu.config import DEFAULT_HYP, ModelConfig
    from skyeye_tpu.losses import ComputeLoss
    from skyeye_tpu.models import SkyEyeDetectorModule
    from skyeye_tpu.train import (
        build_optimizer_runtime, create_train_state, host_schedule,
        make_train_step,
    )

    cfg = ModelConfig.from_variant(VARIANT, nc=NC)
    # SKYEYE_DENSE_LOSS=1: dense-cotangent loss A/B (losses/detection.py
    # _level_dense — kills the gather-VJP scatter-adds + no-minor layout
    # churn, ~2.3 ms of the 28 ms step in profiles/r4s5_train640)
    loss_fn = ComputeLoss(jnp.asarray(cfg.anchors), cfg.nc,
                          dense=bool(os.environ.get("SKYEYE_DENSE_LOSS")))
    sched = host_schedule(DEFAULT_HYP, epochs=100, steps_per_epoch=100)

    from skyeye_tpu.ops.packed_stem import s2d4_host

    rng = np.random.default_rng(0)
    images_np = rng.uniform(0, 1, (batch, 640, 640, 3)).astype(np.float32)
    images = jnp.asarray(images_np)
    packed_images = jnp.asarray(s2d4_host(images_np))
    targets = np.zeros((batch, 32, 6), np.float32)
    mask = np.zeros((batch, 32), bool)
    for b in range(batch):
        for t in range(8):
            targets[b, t] = [0, rng.integers(0, NC), rng.uniform(0.2, 0.8),
                             rng.uniform(0.2, 0.8), rng.uniform(0.05, 0.2),
                             rng.uniform(0.05, 0.2)]
            mask[b, t] = True
    base_batch = {
        "targets": jnp.asarray(targets), "mask": jnp.asarray(mask),
        "n_valid": jnp.asarray(batch, jnp.int32),
        "opt_hyperparams": {k: jnp.float32(v) for k, v in sched(0).items()},
    }

    def run_one(dtype, packed=True):
        # packed=True is the cli/train default: stem+down1 in the s2d4 input
        # domain with canonical params (ops/packed_stem_train.py), the loader
        # packing frames host-side — numerically equivalent, equivalence-tested
        module = SkyEyeDetectorModule(config=cfg, dtype=dtype,
                                      packed_stem_train=packed)
        variables = module.init(jax.random.PRNGKey(0),
                                jnp.zeros((2, 640, 640, 3)), train=True)
        tx = build_optimizer_runtime(DEFAULT_HYP, variables["params"],
                                     batch_size=batch)
        state = create_train_state(variables, tx)
        step = jax.jit(make_train_step(module, loss_fn, tx))
        batch_d = dict(base_batch,
                       images=packed_images if packed else images)
        t0 = time.time()
        state, _ = step(state, batch_d)
        jax.block_until_ready(state.params)
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        metrics = None
        for _ in range(steps):
            state, metrics = step(state, batch_d)
        jax.block_until_ready(state.params)
        dt = (time.perf_counter() - t0) / steps
        assert np.isfinite(float(metrics["loss"]))
        return batch / dt, dt * 1000, compile_s

    ips_bf16, ms_bf16, comp_bf16 = run_one(jnp.bfloat16)
    print(f"# bf16 packed-stem train step: {ips_bf16:.1f} img/s ({ms_bf16:.1f} ms)",
          file=sys.stderr)
    if os.environ.get("SKYEYE_TRAIN640_BF16_ONLY"):
        # headline-only mode: the canonical/f32 secondary rows each cost a
        # cold ~10-min remote compile; skip them when the chip-time budget is
        # the constraint (their values are recorded in BASELINE.md)
        ips_canon = ms_canon = ips_f32 = ms_f32 = None
        comp_canon = comp_f32 = 0.0
    else:
        ips_canon, ms_canon, comp_canon = run_one(jnp.bfloat16, packed=False)
        print(f"# bf16 canonical train step: {ips_canon:.1f} img/s "
              f"({ms_canon:.1f} ms)", file=sys.stderr)
        ips_f32, ms_f32, comp_f32 = run_one(jnp.float32)
        print(f"# f32 train step: {ips_f32:.1f} img/s ({ms_f32:.1f} ms)",
              file=sys.stderr)

    # analytic train-step FLOPs (fwd+bwd+optimizer, canonical stem — the
    # packed domains compute structured zeros that would overstate MFU), so
    # the train row carries an MFU column like the serving rows (VERDICT r3 #3)
    train_mfu = None
    try:
        from skyeye_tpu.utils.profiling import flops_by_trace

        module = SkyEyeDetectorModule(config=cfg, dtype=jnp.bfloat16,
                                      packed_stem_train=False)
        variables = module.init(jax.random.PRNGKey(0),
                                jnp.zeros((2, 640, 640, 3)), train=True)
        tx = build_optimizer_runtime(DEFAULT_HYP, variables["params"],
                                     batch_size=batch)
        state = create_train_state(variables, tx)
        f = flops_by_trace(make_train_step(module, loss_fn, tx), state,
                           dict(base_batch, images=images))
        if f:
            train_mfu = round(ips_bf16 * (f / batch) / 197e12 * 100, 2)
            print(f"# train FLOPs/img {f / batch / 1e9:.1f} GF -> "
                  f"MFU {train_mfu}%", file=sys.stderr)
    except Exception as e:
        print(f"# train cost analysis unavailable: {e}", file=sys.stderr)
    return {
        "metric": f"skyeye_{VARIANT} train step @640px b{batch} "
                  "(fwd+bwd+optimizer+EMA, one launch, bf16 activations, "
                  "packed stem — the cli/train default)",
        "value": round(ips_bf16, 1), "unit": "images/sec",
        "ms_per_step": round(ms_bf16, 1),
        "canonical_images_per_s": None if ips_canon is None else round(ips_canon, 1),
        "canonical_ms_per_step": None if ms_canon is None else round(ms_canon, 1),
        "f32_images_per_s": None if ips_f32 is None else round(ips_f32, 1),
        "f32_ms_per_step": None if ms_f32 is None else round(ms_f32, 1),
        "mfu_pct": train_mfu,
        "compile_s": round(comp_bf16 + comp_canon + comp_f32, 1),
        "cached": False,
    }


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


def pick_burst_k(latency_target_ms: float, table_path=None):
    """Pick the burst size K for a latency SLO from the measured frontier.

    The burst-K frontier (bench --config burstsweep; committed as
    profiles/burstsweep_r*.json) trades time-to-first-result against
    single-launch throughput: K=1 returns in ~44 ms at 364 img/s, K=16 in
    ~339 ms at 756 img/s (@1280 b16, r4 measurements). This makes the
    BASELINE.md deployment guidance executable: the largest measured K whose
    ms_to_first_result fits the target (VERDICT r4 #8).

    Returns the chosen sweep row (dict) — K plus its measured expectations.
    """
    import glob as _glob

    if table_path is None:
        cands = sorted(_glob.glob(str(Path(__file__).parent
                                      / "profiles/burstsweep_r*.json")))
        if not cands:
            raise FileNotFoundError("no profiles/burstsweep_r*.json frontier; "
                                    "run: python bench.py --config burstsweep")
        table_path = cands[-1]
    sweep = json.loads(Path(table_path).read_text())["sweep"]
    fits = [row for row in sweep if row["ms_to_first_result"] <= latency_target_ms]
    row = max(fits, key=lambda r: r["k"]) if fits else min(
        sweep, key=lambda r: r["k"])
    return dict(row, latency_target_ms=latency_target_ms, table=str(table_path),
                target_met=bool(fits))


def main():
    if "--latency-target" in sys.argv:
        ms = float(sys.argv[sys.argv.index("--latency-target") + 1])
        print(json.dumps({"metric": "burst-K pick for latency target",
                          "unit": "K (micro-batches per scan launch)",
                          **pick_burst_k(ms)}))
        return
    if "--config" in sys.argv:
        which = sys.argv[sys.argv.index("--config") + 1]
        if not device_reachable():
            print(json.dumps({"metric": f"config {which}", "value": 0.0,
                              "unit": "images/sec", "error": "TPU unreachable"}))
            return
        fn = {"transformer1280": measure_transformer_1280,
              "tiled4k": measure_tiled_4k,
              "single640": measure_single_640,
              "train640": measure_train_640,
              "burstsweep": measure_burst_sweep}[which]
        print(json.dumps(fn()))
        return

    metric_name = (f"skyeye_{VARIANT} e2e inference images/sec/chip @{IMG}px "
                   f"batch {BATCH} (fwd+decode+NMS, pipelined; streaming path "
                   "reported separately)")
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
        # full fresh-frames->boxes path incl. host pack + per-batch H2D + D2H;
        # when relay_bound the chip is behind the ~20 MB/s axon network tunnel
        # and this measures the tunnel, not the framework (h2d_mbps recorded)
        "streaming_images_per_s": round(m["streaming_ips"], 2),
        "streaming_relay_bound": m["relay_bound"],
        "h2d_mbps": m["h2d_mbps"],
        "device_only_images_per_s": round(m["device_only_ips"], 2),
        # paced-feed measurement of the PCIe-class streaming claim (VERDICT r3
        # #6): batches released at sim_ingest_ms intervals (PCIe H2D budget for
        # 78.6 MB), HBM-resident inputs, same bounded queue + D2H as streaming
        "streaming_simulated_pcie_ips": (
            round(m["sim_pcie_ips"], 2) if m.get("sim_pcie_ips") else None),
        "sim_ingest_ms_per_batch": m.get("sim_ingest_ms"),
        # scan-of-4 micro-batch launches, pipelined: same per-image work, the
        # per-launch relay gap amortized 4x (reported separately, not headline)
        "burst_pipelined_images_per_s": (
            round(m["burst_pipelined_ips"], 2)
            if m.get("burst_pipelined_ips") else None),
        "latency_images_per_s": round(m["latency_ips"], 2),
        "burst_latency_images_per_s": (
            round(m["burst_latency_ips"], 2) if m["burst_latency_ips"] else None),
        "mfu_pct": m["mfu_pct"],
        "mfu_device_only_pct": m["mfu_device_only_pct"],
        "cached": False,
    })
    LAST_GOOD.write_text(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
