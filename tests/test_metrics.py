"""Metric machinery tests: AP on synthetic PR data, matching, confusion matrix."""
import numpy as np

from skyeye_tpu.utils.metrics import (
    ConfusionMatrix,
    ap_per_class,
    box_iou_np,
    compute_ap,
    process_batch,
)


def test_compute_ap_perfect():
    ap, _, _ = compute_ap(np.array([0.5, 1.0]), np.array([1.0, 1.0]))
    assert ap > 0.99


def test_compute_ap_half():
    # all predictions wrong after 50% recall with precision dropping
    ap, _, _ = compute_ap(np.array([0.5]), np.array([0.5]))
    assert 0.2 < ap < 0.8


def test_ap_per_class_perfect_detection():
    """Predictions identical to GT -> AP 1.0 (SURVEY.md §4 integration seam)."""
    n = 20
    tp = np.ones((n, 10), bool)
    conf = np.linspace(0.9, 0.5, n)
    pred_cls = np.zeros(n)
    target_cls = np.zeros(n)
    tp_c, fp_c, p, r, f1, ap, classes = ap_per_class(tp, conf, pred_cls, target_cls)
    assert ap.shape == (1, 10)
    assert ap[0, 0] > 0.99
    assert r[0] > 0.99


def test_ap_per_class_all_wrong():
    n = 10
    tp = np.zeros((n, 10), bool)
    conf = np.random.default_rng(0).uniform(0.3, 0.9, n)
    tp_c, fp_c, p, r, f1, ap, classes = ap_per_class(tp, conf, np.zeros(n), np.zeros(n))
    assert ap[0, 0] < 0.05


def test_process_batch_matching():
    iouv = np.linspace(0.5, 0.95, 10)
    # one detection exactly on GT, one off
    det = np.array(
        [
            [10, 10, 50, 50, 0.9, 0],
            [100, 100, 140, 140, 0.8, 1],
        ],
        np.float32,
    )
    labels = np.array([[0, 10, 10, 50, 50]], np.float32)
    correct = process_batch(det, labels, iouv)
    assert correct.shape == (2, 10)
    assert correct[0].all()  # perfect match at every threshold
    assert not correct[1].any()  # no GT for class 1


def test_process_batch_greedy_dedup():
    iouv = np.array([0.5])
    det = np.array(
        [
            [10, 10, 50, 50, 0.9, 0],
            [11, 11, 51, 51, 0.95, 0],  # overlaps same GT with higher IoU order
        ],
        np.float32,
    )
    labels = np.array([[0, 10, 10, 50, 50]], np.float32)
    correct = process_batch(det, labels, iouv)
    assert correct.sum() == 1  # only one detection credited


def test_confusion_matrix():
    cm = ConfusionMatrix(nc=3)
    det = np.array([[10, 10, 50, 50, 0.9, 0], [200, 200, 240, 240, 0.8, 2]], np.float32)
    labels = np.array([[0, 10, 10, 50, 50], [1, 300, 300, 340, 340]], np.float32)
    cm.process_batch(det, labels)
    assert cm.matrix[0, 0] == 1      # class 0 correct
    assert cm.matrix[3, 1] == 1      # class 1 GT missed -> background FN
    assert cm.matrix[2, 3] == 1      # class 2 det unmatched -> background FP
    tp, fp = cm.tp_fp()
    assert tp[0] == 1 and fp[2] == 1

    # no detections -> all GT to background FN
    cm2 = ConfusionMatrix(nc=3)
    cm2.process_batch(None, labels)
    assert cm2.matrix[3, 0] == 1 and cm2.matrix[3, 1] == 1


def test_confusion_matrix_foreign_classes_dropped():
    """Detections with class ids >= nc (model trained with more classes than
    the eval dataset defines) must be dropped, not IndexError (found live:
    validate --weights skyeye_s against an 8-class data.yaml)."""
    cm = ConfusionMatrix(nc=3)
    det = np.array([[10, 10, 50, 50, 0.9, 29],   # foreign class: dropped
                    [10, 10, 50, 50, 0.8, 0]], np.float32)
    labels = np.array([[0, 10, 10, 50, 50]], np.float32)
    cm.process_batch(det, labels)
    assert cm.matrix[0, 0] == 1          # in-range det still credited
    assert cm.matrix.sum() == 1          # foreign det contributed nothing


def test_box_iou_np():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]], np.float32)
    iou = box_iou_np(a, b)
    np.testing.assert_allclose(iou[0], [1.0, 25 / 175, 0.0], atol=1e-4)


def test_autoanchor_kmeans_recovers_clusters():
    from skyeye_tpu.utils.autoanchor import anchor_fitness, check_anchors, kmean_anchors

    rng = np.random.default_rng(0)
    # three clear size clusters
    wh = np.concatenate([
        rng.normal([10, 12], 1.0, (200, 2)),
        rng.normal([40, 30], 3.0, (200, 2)),
        rng.normal([120, 100], 8.0, (200, 2)),
    ]).clip(2)
    k = kmean_anchors(wh, n=3, iterations=100)
    assert k.shape == (3, 2)
    areas = np.sort(k.prod(1))
    assert areas[0] < 300 and areas[2] > 5000  # spans the clusters
    assert anchor_fitness(wh, k) > 0.7

    bpr = check_anchors(wh, [k / 8], strides=[8])
    assert bpr > 0.95


def test_fit_anchors_for_dataset_shape():
    from skyeye_tpu.utils.autoanchor import fit_anchors_for_dataset

    class FakeDS:
        labels = [np.array([[0, .5, .5, w, h]] * 6, np.float32)
                  for w, h in [(0.02, 0.03), (0.1, 0.08), (0.3, 0.25), (0.05, 0.04),
                               (0.15, 0.2), (0.4, 0.35)]]
        shapes = np.array([[640, 480]] * 6, np.float64)

    anchors = fit_anchors_for_dataset(FakeDS(), img_size=640)
    assert len(anchors) == 3 and len(anchors[0]) == 3
    # grid-unit anchors positive and finite
    flat = np.array(anchors).reshape(-1, 2)
    assert (flat > 0).all() and np.isfinite(flat).all()


def test_profiling_model_info_and_flops():
    import jax.numpy as jnp

    from skyeye_tpu.config import ModelConfig
    from skyeye_tpu.models import SkyEyeDetectorModule
    from skyeye_tpu.utils.profiling import count_params, flops_of, model_info

    import jax

    cfg = ModelConfig(nc=2, base_channels=16, depth_multiple=0.33, width_multiple=0.25)
    module = SkyEyeDetectorModule(config=cfg)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    n = count_params(variables["params"])
    assert n > 10_000
    info = model_info(module, variables, img_size=64)
    assert info["parameters"] == n
    # FLOPs from XLA cost analysis for a simple matmul sanity-check
    f = flops_of(lambda x: x @ x, jnp.zeros((64, 64)))
    assert f is None or f >= 2 * 64**3 * 0.9
