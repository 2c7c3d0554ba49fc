"""Pallas kernel tests (interpret mode on the CPU test mesh)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from skyeye_tpu.ops.nms import _greedy_nms
from skyeye_tpu.ops.pallas import attention_reference, flash_attention, pallas_greedy_nms
from skyeye_tpu.ops.pallas.attention_kernel import padded_flash_attention


def make_candidates(rng, k=256, n_real=100):
    cx = rng.uniform(50, 600, k)
    cy = rng.uniform(50, 600, k)
    w = rng.uniform(10, 80, k)
    h = rng.uniform(10, 80, k)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1).astype(np.float32)
    scores = rng.uniform(0.1, 1.0, k).astype(np.float32)
    scores[n_real:] = -1.0  # padding slots
    return boxes, scores


def test_pallas_nms_matches_lax_reference():
    rng = np.random.default_rng(0)
    boxes, scores = make_candidates(rng)
    ref_idx, ref_valid = _greedy_nms(jnp.asarray(boxes), jnp.asarray(scores), 0.45, 64)
    got_idx, got_valid = pallas_greedy_nms(
        jnp.asarray(boxes), jnp.asarray(scores), max_det=64, iou_thres=0.45,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(ref_valid), np.asarray(got_valid))
    np.testing.assert_array_equal(np.asarray(ref_idx), np.asarray(got_idx))


def test_pallas_nms_empty():
    boxes = jnp.zeros((128, 4), jnp.float32)
    scores = jnp.full((128,), -1.0, jnp.float32)
    idx, valid = pallas_greedy_nms(boxes, scores, max_det=16, interpret=True)
    assert not np.asarray(valid).any()


def test_pallas_nms_identical_boxes_suppressed():
    boxes = jnp.tile(jnp.array([[10.0, 10.0, 50.0, 50.0]]), (128, 1))
    scores = jnp.linspace(1.0, 0.5, 128)
    idx, valid = pallas_greedy_nms(boxes, scores, max_det=16, iou_thres=0.5,
                                   interpret=True)
    v = np.asarray(valid)
    assert v.sum() == 1
    assert int(np.asarray(idx)[0]) == 0  # highest score wins


def test_pallas_batched_nms_matches_per_image_reference():
    """The lockstep batched kernel must be row-wise identical to the per-image
    lax greedy loop — including rows that exhaust early (lockstep no-op steps)
    and the row/lane padding paths (b=5 pads to 8 sublanes, k=200 to 256 lanes)."""
    from skyeye_tpu.ops.pallas import pallas_batched_greedy_nms

    rng = np.random.default_rng(7)
    b, k = 5, 200
    boxes = np.zeros((b, k, 4), np.float32)
    scores = np.zeros((b, k), np.float32)
    n_real = [150, 40, 0, 1, 200]  # mixed exhaustion points incl. an empty row
    for i in range(b):
        boxes[i], scores[i] = make_candidates(rng, k=k, n_real=n_real[i])
    got_idx, got_valid = pallas_batched_greedy_nms(
        jnp.asarray(boxes), jnp.asarray(scores), max_det=64, iou_thres=0.45,
        interpret=True,
    )
    for i in range(b):
        ref_idx, ref_valid = _greedy_nms(
            jnp.asarray(boxes[i]), jnp.asarray(scores[i]), 0.45, 64)
        np.testing.assert_array_equal(np.asarray(ref_valid),
                                      np.asarray(got_valid)[i], err_msg=f"row {i}")
        np.testing.assert_array_equal(np.asarray(ref_idx),
                                      np.asarray(got_idx)[i], err_msg=f"row {i}")


def test_pallas_batched_nms_all_empty():
    from skyeye_tpu.ops.pallas import pallas_batched_greedy_nms

    boxes = jnp.zeros((3, 128, 4), jnp.float32)
    scores = jnp.full((3, 128), -1.0, jnp.float32)
    idx, valid = pallas_batched_greedy_nms(boxes, scores, max_det=16,
                                           interpret=True)
    assert idx.shape == (3, 16) and valid.shape == (3, 16)
    assert not np.asarray(valid).any()


@pytest.mark.parametrize("multi_label,agnostic", [(False, False), (True, False),
                                                  (False, True)])
def test_nms_batched_routes_identically(multi_label, agnostic):
    """nms_batched (vmapped candidate cut + batched suppression) must equal the
    per-image _nms_single_impl pipeline on the same decoded predictions."""
    from skyeye_tpu.ops.nms import _nms_single_impl, nms_batched

    rng = np.random.default_rng(11)
    B, N, nc = 3, 512, 8
    pred = np.concatenate(
        [
            rng.uniform(20, 600, (B, N, 2)),          # cx, cy
            rng.uniform(8, 60, (B, N, 2)),            # w, h
            rng.uniform(0, 1, (B, N, 1)) ** 2,        # obj
            rng.uniform(0, 1, (B, N, nc)),            # cls
        ],
        axis=-1,
    ).astype(np.float32)
    det_b, n_b = nms_batched(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45,
                             max_det=32, max_nms=256, multi_label=multi_label,
                             agnostic=agnostic)
    for i in range(B):
        det_s, n_s = _nms_single_impl(jnp.asarray(pred[i]), conf_thres=0.25,
                                      iou_thres=0.45, max_det=32, max_nms=256,
                                      multi_label=multi_label, agnostic=agnostic)
        assert int(n_s) == int(np.asarray(n_b)[i])
        np.testing.assert_allclose(np.asarray(det_s), np.asarray(det_b)[i],
                                   rtol=1e-6, atol=1e-6)


def test_flash_attention_matches_reference():
    rng = np.random.default_rng(1)
    B, N, hd = 2, 256, 64
    q = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
    ref = attention_reference(q, k, v)
    got = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("N,hd", [(400, 64), (1600, 128), (400, 96)])
def test_padded_flash_attention_matches_reference(N, hd):
    """Detection-head token counts (P5 @640 = 400, @1280 = 1600) and head dims that
    need zero-padding + in-kernel masking to tile onto the MXU."""
    rng = np.random.default_rng(3)
    B = 2
    q = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
    ref = attention_reference(q, k, v)
    got = padded_flash_attention(q, k, v, interpret=True)
    assert got.shape == (B, N, hd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_padded_flash_attention_gradient_matches_reference():
    """The custom VJP (einsum-recompute backward) must give the exact attention
    gradient — this is what makes the flash forward safe inside jax.grad when a
    transformer variant trains on TPU (ADVICE round 2, medium)."""
    rng = np.random.default_rng(7)
    B, N, hd = 2, 400, 64
    q = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(padded_flash_attention(q, k, v, interpret=True) * w)

    def loss_ref(q, k, v):
        return jnp.sum(attention_reference(q, k, v) * w)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=2e-4,
                                   atol=2e-4)


def test_mhsa_flash_gate_trainable(monkeypatch):
    """jax.grad through MultiHeadSelfAttention with the flash path FORCED ON must
    work and match the einsum path's gradient (the round-2 failure mode:
    pallas_call has no transpose rule, so training a transformer variant on TPU
    at >= 256 tokens crashed in the backward pass)."""
    from skyeye_tpu.models.attention import MultiHeadSelfAttention

    m = MultiHeadSelfAttention(num_heads=4)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 400, 64))
    variables = m.init(jax.random.PRNGKey(1), x)

    def loss(params):
        out = m.apply({"params": params}, x)
        return jnp.sum(out**2)

    g_einsum = jax.grad(loss)(variables["params"])
    monkeypatch.setenv("SKYEYE_FLASH_INTERPRET", "1")  # flash branch, interpreted
    g_flash = jax.grad(loss)(variables["params"])
    for ge, gf in zip(
        jax.tree_util.tree_leaves(g_einsum), jax.tree_util.tree_leaves(g_flash)
    ):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(ge), rtol=5e-3,
                                   atol=1e-3)


def test_pallas_nms_under_vmap():
    """nms_batched vmaps the kernel over images; interpret mode checks the lowering."""
    rng = np.random.default_rng(4)
    boxes = []
    scores = []
    for _ in range(3):
        b, s = make_candidates(rng, k=256, n_real=150)
        boxes.append(b)
        scores.append(s)
    bb, ss = jnp.asarray(np.stack(boxes)), jnp.asarray(np.stack(scores))
    got_idx, got_valid = jax.vmap(
        lambda b, s: pallas_greedy_nms(b, s, max_det=64, iou_thres=0.45, interpret=True)
    )(bb, ss)
    ref_idx, ref_valid = jax.vmap(lambda b, s: _greedy_nms(b, s, 0.45, 64))(bb, ss)
    np.testing.assert_array_equal(np.asarray(got_valid), np.asarray(ref_valid))
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(ref_idx))


def test_flash_attention_numerically_stable_large_logits():
    rng = np.random.default_rng(2)
    B, N, hd = 1, 128, 64
    q = jnp.asarray(rng.normal(0, 30, (B, N, hd)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 30, (B, N, hd)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (B, N, hd)).astype(np.float32))
    got = np.asarray(flash_attention(q, k, v, interpret=True))
    assert np.isfinite(got).all()
    ref = np.asarray(attention_reference(q, k, v))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.slow
class TestFusedCSP:
    """Fused CSP Pallas kernel (ops/pallas/csp_kernel.py) vs canonical CSPBlock."""

    def _folded_csp(self, nb, C, H, key):
        import jax.tree_util as jtu

        from skyeye_tpu.models.blocks import CSPBlock
        from skyeye_tpu.utils.checkpoint import fuse_conv_bn

        m = CSPBlock(C, nb, dtype=jnp.bfloat16)
        x = jax.random.normal(key, (2, H, H, C), jnp.float32)
        v = m.init(key, x, train=False)
        # non-trivial BN stats so folding is exercised
        leaves, treedef = jtu.tree_flatten(v)
        rngs = jax.random.split(key, len(leaves))
        v = jtu.tree_unflatten(
            treedef,
            [l + 0.1 * jax.random.normal(r, l.shape) for l, r in zip(leaves, rngs)],
        )
        v = jtu.tree_map(lambda l: jnp.abs(l) + 0.05 if l.ndim == 1 else l, v)
        return m, fuse_conv_bn(v), x

    @pytest.mark.parametrize("nb,C,H,th", [(1, 64, 32, 8), (3, 128, 16, 4),
                                           (2, 96, 24, 24)])
    def test_matches_canonical(self, nb, C, H, th):
        from skyeye_tpu.ops.fused_csp import fuse_csp_variables
        from skyeye_tpu.ops.pallas.csp_kernel import csp_fused

        m, vf, x = self._folded_csp(nb, C, H, jax.random.PRNGKey(0))
        ref = np.asarray(m.apply(vf, x.astype(jnp.bfloat16), train=False),
                         np.float32)
        wrapped = {"params": {"backbone": {"csp1": vf["params"]}},
                   "batch_stats": {"backbone": {"csp1": vf["batch_stats"]}}}
        weights = fuse_csp_variables(wrapped)["params"]["backbone"]["csp1"]
        out = np.asarray(
            csp_fused(x.astype(jnp.bfloat16), weights, num_blocks=nb,
                      tile_rows=th, interpret=True),
            np.float32,
        )
        # both paths are bf16; tolerance is the bf16 accumulation-order class
        assert np.abs(ref - out).max() <= 0.02 * np.abs(ref).max() + 1e-3

    def test_requires_folded_variables(self):
        from skyeye_tpu.ops.fused_csp import fuse_csp_variables

        m, vf, x = self._folded_csp(1, 64, 16, jax.random.PRNGKey(1))
        # un-fold: non-identity scale must be rejected
        vf["params"]["cv1"]["bn"]["scale"] = (
            np.asarray(vf["params"]["cv1"]["bn"]["scale"]) * 2.0
        )
        wrapped = {"params": {"backbone": {"csp1": vf["params"]}},
                   "batch_stats": {"backbone": {"csp1": vf["batch_stats"]}}}
        with pytest.raises(ValueError, match="BN-folded"):
            fuse_csp_variables(wrapped)

    def test_full_detector_fused_csp(self):
        """fused_csp=True detector forward == canonical with same weights."""
        from skyeye_tpu.config import ModelConfig
        from skyeye_tpu.models import SkyEyeDetectorModule
        from skyeye_tpu.ops.fused_csp import fuse_csp_variables
        from skyeye_tpu.utils.checkpoint import fuse_conv_bn

        cfg = ModelConfig(nc=3, base_channels=16, depth_multiple=0.33,
                          width_multiple=0.5)
        canonical = SkyEyeDetectorModule(config=cfg, dtype=jnp.bfloat16)
        fused = SkyEyeDetectorModule(config=cfg, dtype=jnp.bfloat16,
                                     fused_csp=True)
        x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
        v = canonical.init(jax.random.PRNGKey(0), x, train=False)
        vf = fuse_conv_bn(v)
        ref = canonical.apply(vf, x, train=False)
        vfc = fuse_csp_variables(vf, path=("backbone", "csp1"))
        out = fused.apply(vfc, x, train=False)
        for a, b in zip(ref, out):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            assert np.abs(a - b).max() <= 0.05 * np.abs(a).max() + 1e-2


@pytest.mark.slow
class TestFusedCSPv2:
    """Halo-DMA + wide-dot fused CSP (csp_fused_v2) vs canonical CSPBlock."""

    @pytest.mark.parametrize("nb,C,H,th", [(1, 64, 32, 8), (3, 128, 16, 4),
                                           (2, 96, 24, 24)])
    def test_matches_canonical(self, nb, C, H, th):
        from skyeye_tpu.ops.fused_csp import fuse_csp_variables
        from skyeye_tpu.ops.pallas.csp_kernel import csp_fused_v2

        m, vf, x = TestFusedCSP()._folded_csp(nb, C, H, jax.random.PRNGKey(0))
        ref = np.asarray(m.apply(vf, x.astype(jnp.bfloat16), train=False),
                         np.float32)
        wrapped = {"params": {"backbone": {"csp1": vf["params"]}},
                   "batch_stats": {"backbone": {"csp1": vf["batch_stats"]}}}
        weights = fuse_csp_variables(wrapped)["params"]["backbone"]["csp1"]
        out = np.asarray(
            csp_fused_v2(x.astype(jnp.bfloat16), weights, num_blocks=nb,
                         tile_rows=th, interpret=True),
            np.float32,
        )
        assert np.abs(ref - out).max() <= 0.02 * np.abs(ref).max() + 1e-3

    def test_v2_matches_v1(self):
        from skyeye_tpu.ops.fused_csp import fuse_csp_variables
        from skyeye_tpu.ops.pallas.csp_kernel import csp_fused, csp_fused_v2

        m, vf, x = TestFusedCSP()._folded_csp(1, 64, 32, jax.random.PRNGKey(5))
        wrapped = {"params": {"backbone": {"csp1": vf["params"]}},
                   "batch_stats": {"backbone": {"csp1": vf["batch_stats"]}}}
        weights = fuse_csp_variables(wrapped)["params"]["backbone"]["csp1"]
        v1 = np.asarray(csp_fused(x.astype(jnp.bfloat16), weights, num_blocks=1,
                                  tile_rows=8, interpret=True), np.float32)
        v2 = np.asarray(csp_fused_v2(x.astype(jnp.bfloat16), weights,
                                     num_blocks=1, tile_rows=8, interpret=True),
                        np.float32)
        assert np.abs(v1 - v2).max() <= 0.01 * np.abs(v1).max() + 1e-3
