"""Tiled high-res inference tests."""
import numpy as np
import jax
import jax.numpy as jnp

from skyeye_tpu.ops.tiling import merge_tile_detections, slice_tiles, tile_grid


def test_tile_grid_coverage():
    grid = tile_grid((2160, 3840), tile=1280, overlap=0.2)
    # every pixel covered
    cov = np.zeros((2160, 3840), bool)
    for y, x in grid:
        cov[y : y + 1280, x : x + 1280] = True
    assert cov.all()
    # overlap respected: adjacent x-origins differ by <= 1280*(1-0.2)
    xs = sorted(set(grid[:, 1]))
    assert all(b - a <= 1024 for a, b in zip(xs, xs[1:]))


def test_tile_grid_small_frame_single_tile():
    grid = tile_grid((640, 640), tile=1280)
    assert grid.shape == (1, 2)
    np.testing.assert_array_equal(grid, [[0, 0]])


def test_slice_tiles_content():
    frames = jnp.asarray(
        np.arange(2 * 8 * 8 * 3, dtype=np.float32).reshape(2, 8, 8, 3)
    )
    origins = np.array([[0, 0], [0, 4], [4, 0], [4, 4]], np.int32)
    tiles = slice_tiles(frames, origins, 4)
    assert tiles.shape == (8, 4, 4, 3)
    # tiles-major order: first 2 tiles are origin (0,0) for both frames
    np.testing.assert_array_equal(np.asarray(tiles[0]), np.asarray(frames[0, :4, :4]))
    np.testing.assert_array_equal(np.asarray(tiles[1]), np.asarray(frames[1, :4, :4]))
    np.testing.assert_array_equal(np.asarray(tiles[2]), np.asarray(frames[0, :4, 4:8]))


def test_merge_tile_detections_dedups_overlap():
    """The same physical object seen by two overlapping tiles -> one detection."""
    origins = np.array([[0, 0], [0, 512]], np.int32)  # two x-overlapping tiles
    T, B, md = 2, 1, 8
    det = np.zeros((T * B, md, 6), np.float32)
    n = np.zeros((T * B,), np.int32)
    # object at frame x=600..680 (inside both tiles)
    # tile 0 coords: 600..680; tile 1 coords: 88..168
    det[0, 0] = [600, 100, 680, 180, 0.9, 2]
    n[0] = 1
    det[1, 0] = [88, 100, 168, 180, 0.85, 2]
    n[1] = 1
    merged, counts = merge_tile_detections(
        jnp.asarray(det), jnp.asarray(n), origins, batch=B, iou_thres=0.45, max_det=16
    )
    merged, counts = np.asarray(merged), np.asarray(counts)
    assert counts[0] == 1  # duplicate suppressed
    np.testing.assert_allclose(merged[0, 0, :4], [600, 100, 680, 180], atol=1e-4)
    assert merged[0, 0, 4] == np.float32(0.9)  # higher-confidence copy wins


def test_merge_keeps_distinct_objects():
    origins = np.array([[0, 0], [0, 512]], np.int32)
    det = np.zeros((2, 8, 6), np.float32)
    n = np.zeros((2,), np.int32)
    det[0, 0] = [100, 100, 180, 180, 0.9, 0]   # only in tile 0
    n[0] = 1
    det[1, 0] = [300, 300, 380, 380, 0.8, 1]   # tile-1 coords -> frame x 812..892
    n[1] = 1
    merged, counts = merge_tile_detections(
        jnp.asarray(det), jnp.asarray(n), origins, batch=1, max_det=16
    )
    assert int(counts[0]) == 2
    m = np.asarray(merged[0, :2])
    xs = sorted(m[:, 0].tolist())
    assert abs(xs[0] - 100) < 1e-3 and abs(xs[1] - 812) < 1e-3


def test_detect_tiled_end_to_end_tiny():
    """Full tiled pipeline on a tiny model and 2-tile frame."""
    from skyeye_tpu.config import ModelConfig
    from skyeye_tpu.models import SkyEyeDetectorModule
    from skyeye_tpu.ops.tiling import detect_tiled

    cfg = ModelConfig(nc=3, base_channels=16, depth_multiple=0.33, width_multiple=0.25)
    module = SkyEyeDetectorModule(config=cfg)
    variables = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    frames = jnp.zeros((1, 64, 96, 3), jnp.uint8)  # 2 tiles of 64 with overlap
    det, n = detect_tiled(module, variables, cfg.anchors, frames, tile=64,
                          overlap=0.25, conf_thres=0.5, max_det=32, max_det_tile=32)
    assert det.shape == (1, 32, 6)
    assert n.shape == (1,)
