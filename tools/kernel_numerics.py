"""On-chip Pallas kernel numerics regression (round-2 VERDICT #5).

Runs the COMPILED (non-interpret) Pallas kernels on the real TPU chip against
their lax/einsum references for a fixed seed set and records max-abs diffs to
profiles/kernel_numerics_r{N}.json. The CPU test suite only exercises interpret
mode — a Mosaic miscompile would ship silently without this.

Checks:
  1. pallas_greedy_nms == _greedy_nms (exact keep-set equality, 16 seeds)
  1b. pallas_batched_greedy_nms == vmapped _greedy_nms (serving geometry +
      row/lane padding paths, 8 seeds)
  2. padded_flash_attention == einsum attention (f32, detection-head shapes)
  3. csp_fused == canonical CSPBlock (bf16 tolerance class)
  4. approx_max_k candidate-cut recall vs exact top-k (informational)

Usage: python tools/kernel_numerics.py [--out profiles/kernel_numerics_r03.json]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="profiles/kernel_numerics_r03.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from skyeye_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    platform = jax.devices()[0].platform
    if platform not in ("tpu", "axon"):
        print(f"ERROR: need a TPU backend, got {platform}", file=sys.stderr)
        sys.exit(1)

    results = {"platform": platform, "device": str(jax.devices()[0]),
               "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"), "checks": {}}

    # -- 1. NMS kernel vs lax reference: exact keep-set equality -----------------
    from skyeye_tpu.ops.nms import _greedy_nms
    from skyeye_tpu.ops.pallas.nms_kernel import pallas_greedy_nms

    n_match, n_total, mismatches = 0, 0, []
    for seed in range(16):
        rng = np.random.default_rng(seed)
        # odd seeds use k=1008 (the 128px-image candidate count) to exercise
        # the non-lane-aligned padding path that crashed Mosaic before the
        # pad-to-8x128 fix in pallas_greedy_nms
        k, n_real = (1024, 400) if seed % 2 == 0 else (1008, 400)
        cx = rng.uniform(50, 1200, k)
        cy = rng.uniform(50, 1200, k)
        w = rng.uniform(8, 120, k)
        h = rng.uniform(8, 120, k)
        cls = rng.integers(0, 10, k).astype(np.float32)
        boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
        boxes = (boxes + cls[:, None] * 7680.0).astype(np.float32)
        scores = rng.uniform(0.05, 1.0, k).astype(np.float32)
        scores[n_real:] = -1.0

        bj, sj = jnp.asarray(boxes), jnp.asarray(scores)
        ref_idx, ref_valid = jax.jit(
            lambda b, s: _greedy_nms(b, s, 0.45, 300)
        )(bj, sj)
        got_idx, got_valid = pallas_greedy_nms(bj, sj, max_det=300, iou_thres=0.45)
        rv, gv = np.asarray(ref_valid), np.asarray(got_valid)
        ri, gi = np.asarray(ref_idx), np.asarray(got_idx)
        n_total += 1
        same = bool((rv == gv).all() and (ri[rv] == gi[gv]).all())
        n_match += same
        if not same:
            mismatches.append({"seed": seed, "ref_kept": int(rv.sum()),
                               "got_kept": int(gv.sum()),
                               "first_diff": int(np.argmax(ri != gi))})
    results["checks"]["pallas_nms_vs_lax"] = {
        "seeds_exact_match": n_match, "seeds_total": n_total,
        "mismatches": mismatches, "pass": n_match == n_total,
    }
    print(f"NMS kernel: {n_match}/{n_total} seeds exact keep-set match")

    # -- 1b. Batched lockstep NMS kernel vs per-image lax reference --------------
    from skyeye_tpu.ops.pallas.nms_kernel import pallas_batched_greedy_nms

    bn_match, bn_total, bn_mismatches = 0, 0, []
    for seed in range(8):
        rng = np.random.default_rng(1000 + seed)
        # serving geometry (b16 x k1024) on even seeds; odd seeds use a
        # non-aligned b/k to exercise the row+lane padding paths
        b, k = (16, 1024) if seed % 2 == 0 else (6, 1008)
        boxes = np.zeros((b, k, 4), np.float32)
        scores = np.zeros((b, k), np.float32)
        for i in range(b):
            n_real = int(rng.integers(0, k))
            cx = rng.uniform(50, 1200, k)
            cy = rng.uniform(50, 1200, k)
            w = rng.uniform(8, 120, k)
            h = rng.uniform(8, 120, k)
            cls = rng.integers(0, 10, k).astype(np.float32)
            bx = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1)
            boxes[i] = bx + cls[:, None] * 7680.0
            scores[i] = rng.uniform(0.05, 1.0, k)
            scores[i, n_real:] = -1.0
        bj, sj = jnp.asarray(boxes), jnp.asarray(scores)
        got_idx, got_valid = pallas_batched_greedy_nms(
            bj, sj, max_det=300, iou_thres=0.45)
        gi, gv = np.asarray(got_idx), np.asarray(got_valid)
        ref_idx, ref_valid = jax.jit(jax.vmap(
            lambda b_, s_: _greedy_nms(b_, s_, 0.45, 300)))(bj, sj)
        ri, rv = np.asarray(ref_idx), np.asarray(ref_valid)
        bn_total += 1
        same = bool((rv == gv).all() and (ri[rv] == gi[gv]).all())
        bn_match += same
        if not same:
            bad = [int(i) for i in range(b)
                   if not ((rv[i] == gv[i]).all() and
                           (ri[i][rv[i]] == gi[i][gv[i]]).all())]
            bn_mismatches.append({"seed": seed, "bad_rows": bad})
    results["checks"]["pallas_batched_nms_vs_lax"] = {
        "seeds_exact_match": bn_match, "seeds_total": bn_total,
        "mismatches": bn_mismatches, "pass": bn_match == bn_total,
    }
    print(f"batched NMS kernel: {bn_match}/{bn_total} seeds exact keep-set match")

    # -- 2. Flash attention vs einsum reference ----------------------------------
    from skyeye_tpu.ops.pallas.attention_kernel import (
        attention_reference, padded_flash_attention,
    )

    # Gate: the kernel's matmuls run at default MXU precision (bf16 input
    # passes), so the miscompile test is "no worse than the precision envelope"
    # — err(flash vs fp32-ref) <= max(2x err(default-precision einsum vs
    # fp32-ref), 5e-3 rel). A Mosaic miscompile produces errors orders of
    # magnitude past the bf16 envelope; precision noise does not.
    flash_checks = []
    for (B, N, hd) in [(16, 400, 64), (8, 1600, 64), (4, 1600, 128)]:
        rng = np.random.default_rng(N + hd)
        q = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
        with jax.default_matmul_precision("highest"):
            ref = np.asarray(jax.jit(attention_reference)(q, k, v))
        ref_def = np.asarray(jax.jit(attention_reference)(q, k, v))
        got = np.asarray(jax.jit(padded_flash_attention)(q, k, v))
        diff = float(np.abs(ref - got).max())
        env = float(np.abs(ref - ref_def).max())
        rel = diff / (float(np.abs(ref).max()) + 1e-12)
        ok = diff <= max(2.0 * env, 5e-3 * float(np.abs(ref).max()))
        flash_checks.append({"shape": [B, N, hd], "max_abs_diff": diff,
                             "precision_envelope": env, "rel_to_max": rel,
                             "pass": ok})
        print(f"flash attention {B}x{N}x{hd}: max abs diff {diff:.2e} "
              f"(rel {rel:.2e}, bf16 envelope {env:.2e})")
    results["checks"]["flash_attention_vs_einsum"] = {
        "cases": flash_checks, "pass": all(c["pass"] for c in flash_checks),
    }

    # -- 3. Fused CSP kernel vs canonical CSPBlock -------------------------------
    # The fused-CSP kernel is NOT in the shipped default pipeline (it loses to
    # XLA at stage-2 shapes and its v2 halo-DMA form crashes the Mosaic
    # compiler — BASELINE.md round-3 analysis). Its numerics are still checked
    # and recorded, but only gate the overall PASS when SKYEYE_FUSED_CSP=1
    # ships it.
    import os

    csp_shipped = bool(os.environ.get("SKYEYE_FUSED_CSP"))
    try:
        import jax.tree_util as jtu

        from skyeye_tpu.models.blocks import CSPBlock
        from skyeye_tpu.ops.fused_csp import fuse_csp_variables
        from skyeye_tpu.ops.pallas.csp_kernel import csp_fused_v2 as csp_fused
        from skyeye_tpu.utils.checkpoint import fuse_conv_bn

        csp_checks = []
        for (nb, C, H) in [(1, 64, 320), (2, 128, 160)]:
            key = jax.random.PRNGKey(C)
            m = CSPBlock(C, nb, dtype=jnp.bfloat16)
            x = jax.random.normal(key, (2, H, H, C), jnp.float32)
            vv = m.init(key, x, train=False)
            leaves, treedef = jtu.tree_flatten(vv)
            rngs = jax.random.split(key, len(leaves))
            vv = jtu.tree_unflatten(
                treedef,
                [l + 0.1 * jax.random.normal(r, l.shape)
                 for l, r in zip(leaves, rngs)],
            )
            vv = jtu.tree_map(
                lambda l: jnp.abs(l) + 0.05 if l.ndim == 1 else l, vv)
            vf = fuse_conv_bn(vv)
            ref = np.asarray(
                jax.jit(lambda xx: m.apply(vf, xx, train=False))(
                    x.astype(jnp.bfloat16)), np.float32)
            wrapped = {"params": {"backbone": {"csp1": vf["params"]}},
                       "batch_stats": {"backbone": {"csp1": vf["batch_stats"]}}}
            weights = fuse_csp_variables(wrapped)["params"]["backbone"]["csp1"]
            got = np.asarray(
                csp_fused(x.astype(jnp.bfloat16), weights, num_blocks=nb,
                          tile_rows=32), np.float32)
            diff = float(np.abs(ref - got).max())
            rel = diff / (float(np.abs(ref).max()) + 1e-12)
            csp_checks.append({"shape": [nb, C, H], "max_abs_diff": diff,
                               "rel_to_max": rel, "pass": rel < 0.03})
            print(f"fused CSP nb={nb} C={C} H={H}: max abs diff {diff:.2e} "
                  f"(rel {rel:.2e})")
        results["checks"]["csp_fused_vs_canonical"] = {
            "cases": csp_checks, "shipped": csp_shipped,
            "pass": all(c["pass"] for c in csp_checks) or not csp_shipped,
        }
    except Exception as e:
        results["checks"]["csp_fused_vs_canonical"] = {
            "error": str(e)[:500], "shipped": csp_shipped,
            "pass": not csp_shipped,
        }
        print(f"fused CSP check failed ({'SHIPPED' if csp_shipped else 'not shipped'}): {str(e)[:200]}")

    # -- 4. approx_max_k candidate recall (informational) ------------------------
    recalls = []
    for seed in range(8):
        rng = np.random.default_rng(100 + seed)
        scores = rng.uniform(0, 1, 100_000).astype(np.float32)
        sj = jnp.asarray(scores)
        k = 4096
        _, exact_idx = jax.jit(lambda s: jax.lax.top_k(s, k))(sj)
        _, approx_idx = jax.jit(lambda s: jax.lax.approx_max_k(s, k))(sj)
        e = set(np.asarray(exact_idx).tolist())
        a = set(np.asarray(approx_idx).tolist())
        recalls.append(len(e & a) / k)
    results["checks"]["approx_max_k_recall"] = {
        "mean_recall": float(np.mean(recalls)), "min_recall": float(np.min(recalls)),
        "k": 4096, "n": 100_000,
    }
    print(f"approx_max_k recall vs exact top-k: mean {np.mean(recalls):.4f} "
          f"min {np.min(recalls):.4f}")

    results["pass"] = all(
        c.get("pass", True) for c in results["checks"].values()
    )
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(f"{'PASS' if results['pass'] else 'FAIL'} -> {out}")
    sys.exit(0 if results["pass"] else 2)


if __name__ == "__main__":
    main()
