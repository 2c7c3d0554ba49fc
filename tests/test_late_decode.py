"""Late-decode serving path == canonical decode-then-NMS (ops/late_decode.py).

The serving fast path ranks candidates on RAW head logits and decodes only the
top-k survivors; these tests assert it produces byte-identical detections to
`decode_predictions` + `_nms_single_impl` (single-label, exact top-k) whenever
per-level survivors fit their quotas — the regime every serving conf threshold
lives in (reference protocol: /root/reference/skyeye/utils/metrics.py:361-457).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from skyeye_tpu.models.head import decode_predictions
from skyeye_tpu.ops.late_decode import late_decode_nms, level_quotas
from skyeye_tpu.ops.nms import _nms_single_impl

IMG = 128
NA, NC = 3, 8
NO = NC + 5
ANCHORS = np.array(
    [[[1.25, 1.625], [2.0, 3.75], [4.125, 2.875]],
     [[1.875, 3.8125], [3.875, 2.8125], [3.6875, 7.4375]],
     [[3.625, 2.8125], [4.875, 6.1875], [11.65625, 10.1875]]],
    np.float32,
)


def _raw_outputs(rng, batch=2, n_pos=25):
    """Per-level raw head logits with obj mostly off and n_pos planted positives."""
    outs = []
    for stride in (8, 16, 32):
        g = IMG // stride
        o = rng.normal(size=(batch, g, g, NA, NO)).astype(np.float32)
        o[..., 4] = rng.normal(size=(batch, g, g, NA)) * 0.5 - 6.0  # obj off
        outs.append(o)
    for b in range(batch):
        for _ in range(n_pos):
            li = rng.integers(0, 3)
            g = IMG // (8, 16, 32)[li]
            y, x, a = rng.integers(0, g), rng.integers(0, g), rng.integers(0, NA)
            outs[li][b, y, x, a, 4] = 2.0 + rng.normal() * 1.5      # obj on
            outs[li][b, y, x, a, 5 + rng.integers(0, NC)] = 3.0
    return [jnp.asarray(o) for o in outs]


def _canonical(outs, conf=0.25, iou=0.45, max_det=100, max_nms=512,
               agnostic=False, class_mask=None):
    import jax
    from functools import partial

    dec = decode_predictions(outs, ANCHORS, (IMG, IMG), anchor_major=False)
    return jax.vmap(
        partial(_nms_single_impl, conf_thres=conf, iou_thres=iou,
                multi_label=False, agnostic=agnostic, max_det=max_det,
                max_nms=max_nms, class_mask=class_mask, approx_topk=False)
    )(dec)


@pytest.mark.parametrize("agnostic", [False, True])
def test_late_decode_matches_canonical(agnostic):
    rng = np.random.default_rng(0)
    outs = _raw_outputs(rng)
    det_ref, n_ref = _canonical(outs, agnostic=agnostic)
    det, n = late_decode_nms(outs, ANCHORS, (IMG, IMG), conf_thres=0.25,
                             iou_thres=0.45, agnostic=agnostic, max_det=100,
                             max_nms=512, approx_topk=False)
    np.testing.assert_array_equal(np.asarray(n), np.asarray(n_ref))
    np.testing.assert_allclose(np.asarray(det), np.asarray(det_ref),
                               rtol=1e-5, atol=1e-4)


def test_late_decode_class_mask():
    rng = np.random.default_rng(1)
    outs = _raw_outputs(rng)
    mask = jnp.zeros((NC,), bool).at[jnp.asarray([1, 4, 6])].set(True)
    det_ref, n_ref = _canonical(outs, class_mask=mask)
    det, n = late_decode_nms(outs, ANCHORS, (IMG, IMG), conf_thres=0.25,
                             iou_thres=0.45, max_det=100, max_nms=512,
                             approx_topk=False, class_mask=mask)
    np.testing.assert_array_equal(np.asarray(n), np.asarray(n_ref))
    np.testing.assert_allclose(np.asarray(det), np.asarray(det_ref),
                               rtol=1e-5, atol=1e-4)
    kept_cls = np.asarray(det)[np.asarray(det)[..., 4] > 0][:, 5]
    assert set(np.unique(kept_cls)).issubset({1.0, 4.0, 6.0})


def test_level_quotas_never_exceed_level_size():
    for counts in ([768, 192, 48], [12, 48, 192], [76800, 19200, 4800]):
        ks = level_quotas(counts, 4096)
        for k, c in zip(ks, counts):
            assert 1 <= k <= c
    # flagship geometry: quotas are 128-lane multiples
    for k in level_quotas([76800, 19200, 4800], 4096):
        assert k % 128 == 0


def test_late_decode_empty_image():
    rng = np.random.default_rng(2)
    outs = _raw_outputs(rng, n_pos=0)
    det, n = late_decode_nms(outs, ANCHORS, (IMG, IMG), conf_thres=0.25,
                             iou_thres=0.45, max_det=100, max_nms=512,
                             approx_topk=False)
    assert np.asarray(n).sum() == 0
    assert np.asarray(det).sum() == 0.0


def test_recall_target_plumbing(monkeypatch):
    """SKYEYE_TOPK_RECALL reaches every approx cut through
    default_recall_target, and the approx path still matches exact on CPU
    (approx_max_k is exact there — this pins the wiring, not TPU recall;
    the on-chip mAP gate is tools/approx_topk_eval.py)."""
    from skyeye_tpu.ops.late_decode import (approx_or_exact_topk,
                                            default_recall_target)

    monkeypatch.setenv("SKYEYE_TOPK_RECALL", "0.8")
    assert default_recall_target() == 0.8
    topk = approx_or_exact_topk(True)
    assert topk.keywords["recall_target"] == 0.8
    assert approx_or_exact_topk(True, 0.9).keywords["recall_target"] == 0.9
    import jax
    assert approx_or_exact_topk(False) is jax.lax.top_k

    rng = np.random.default_rng(3)
    outs = _raw_outputs(rng)
    det_ref, n_ref = _canonical(outs)
    det, n = late_decode_nms(outs, ANCHORS, (IMG, IMG), conf_thres=0.25,
                             iou_thres=0.45, max_det=100, max_nms=512,
                             approx_topk=True, recall_target=0.8)
    np.testing.assert_array_equal(np.asarray(n), np.asarray(n_ref))
    np.testing.assert_allclose(np.asarray(det), np.asarray(det_ref),
                               rtol=1e-5, atol=1e-4)
