"""skyeye_tpu — TPU-native aerial object detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the SkyEye (YOLOv5-family) aerial detector
capability surface: CSP-Darknet+CBAM backbone, FPN/PAN neck, anchor-based 3-scale
detection head, enhanced cross-layer-attention variant, training/validation/detection
pipelines, and fixed-shape on-device decode+NMS.
"""

__version__ = "0.1.0"

from .api import Results, SkyEyeDetector  # noqa: E402
from .config import DataConfig, ModelConfig, load_hyp  # noqa: E402
from .models.detector import construct_model, create_detector, parse_model  # noqa: E402
from .ops.nms import non_max_suppression  # noqa: E402
from .utils.checkpoint import load_model  # noqa: E402

__all__ = [
    "Results",
    "SkyEyeDetector",
    "DataConfig",
    "ModelConfig",
    "load_hyp",
    "construct_model",
    "create_detector",
    "parse_model",
    "non_max_suppression",
    "load_model",
    "__version__",
]
