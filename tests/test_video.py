"""Video source loading + detect video-writer path."""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def video_file(tmp_path_factory):
    root = tmp_path_factory.mktemp("video")
    path = root / "clip.mp4"
    w = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, (320, 240))
    rng = np.random.default_rng(0)
    for i in range(12):
        frame = np.full((240, 320, 3), 40, np.uint8)
        x = 20 + i * 15
        cv2.rectangle(frame, (x, 80), (x + 60, 160), (250, 60, 60), -1)
        w.write(frame)
    w.release()
    assert path.stat().st_size > 1000
    return path


def test_load_images_video_iteration(video_file):
    from skyeye_tpu.data import LoadImages

    di = LoadImages(str(video_file), img_size=320)
    assert di.nf == 1
    frames = 0
    for path, img, img0, cap, s in di:
        assert di.mode == "video"
        assert img0.shape == (240, 320, 3)
        assert img.shape[2] == 3
        frames += 1
    assert frames == 12


def test_detect_cli_on_video(video_file, tmp_path):
    from skyeye_tpu.cli.detect import run
    from skyeye_tpu.config import ModelConfig
    from skyeye_tpu.models import create_detector
    from skyeye_tpu.utils.checkpoint import save_checkpoint

    # tiny random model checkpoint
    cfg = ModelConfig(nc=2, base_channels=16, depth_multiple=0.33, width_multiple=0.25)
    module, variables = create_detector(cfg)
    save_checkpoint(tmp_path / "w", {
        "params": variables["params"],
        "batch_stats": variables["batch_stats"],
        "config": cfg.to_dict(),
    })

    out_dir = run(
        weights=str(tmp_path / "w"),
        source=str(video_file),
        imgsz=(128, 128),
        conf_thres=0.5,
        project=str(tmp_path),
        name="viddet",
    )
    vids = list(out_dir.glob("*.mp4"))
    assert len(vids) == 1
    cap = cv2.VideoCapture(str(vids[0]))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 12
    cap.release()
