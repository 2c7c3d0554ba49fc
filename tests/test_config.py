"""Config system tests, including the shipped YAML files."""
from pathlib import Path

import numpy as np
import pytest

from skyeye_tpu.config import (
    DEFAULT_ANCHORS,
    DataConfig,
    ModelConfig,
    load_hyp,
    load_model_config,
)

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.parametrize("name,d,w", [("skyeye_s", 0.33, 0.50),
                                      ("skyeye_m", 0.67, 0.75),
                                      ("skyeye_l", 1.0, 1.0)])
def test_shipped_model_yamls(name, d, w):
    cfg = ModelConfig.from_yaml(REPO / "configs" / "models" / f"{name}.yaml")
    assert cfg.depth_multiple == d and cfg.width_multiple == w
    assert cfg.nc == 80
    assert np.allclose(np.asarray(cfg.anchors), np.asarray(DEFAULT_ANCHORS))


def test_shipped_variant_yamls():
    enh = ModelConfig.from_yaml(REPO / "configs" / "models" / "skyeye_l_enhanced.yaml")
    assert enh.enhanced and not enh.transformer_heads
    tr = ModelConfig.from_yaml(REPO / "configs" / "models" / "skyeye_l_transformer.yaml")
    assert tr.transformer_heads and not tr.enhanced


def test_shipped_data_yamls():
    drone = DataConfig.from_yaml(REPO / "configs" / "data" / "drone.yaml")
    assert drone.nc == 10 and drone.names[0] == "pedestrian"
    assert drone.train.endswith("images/train")


def test_variant_name_resolution():
    for spec in ("s", "skyeye_s", "skyeye_s.yaml"):
        cfg = load_model_config(spec)
        assert cfg.width_multiple == 0.50, spec


def test_config_yaml_roundtrip(tmp_path):
    cfg = ModelConfig.from_variant("m", nc=10)
    cfg.save_yaml(tmp_path / "m.yaml")
    back = ModelConfig.from_yaml(tmp_path / "m.yaml")
    assert back.nc == 10 and back.width_multiple == cfg.width_multiple
    assert np.allclose(np.asarray(back.anchors), np.asarray(cfg.anchors))


def test_flat_anchor_format():
    cfg = ModelConfig.from_dict({
        "nc": 3,
        "anchors": [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119],
                    [116, 90, 156, 198, 373, 326]],
    })
    assert cfg.num_anchors == 3 and cfg.num_levels == 3
    assert cfg.anchors[0][1] == (16, 30)


def test_hyp_override(tmp_path):
    (tmp_path / "h.yaml").write_text("lr0: 0.02\nmosaic: 0.0\n")
    hyp = load_hyp(tmp_path / "h.yaml")
    assert hyp["lr0"] == 0.02 and hyp["mosaic"] == 0.0
    assert hyp["momentum"] == 0.937  # defaults preserved
