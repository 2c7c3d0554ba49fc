"""Model components: blocks, attention, backbone, neck, head, detector assembly."""
from .attention import (
    CBAM,
    SwinBlock,
    shift_window_mask,
    window_partition,
    window_reverse,
    ChannelAttention,
    CrossLayerAttention,
    SpatialAttention,
    TransformerLayer,
    WindowedSelfAttention,
)
from .backbone import CSPDarknet, feature_channels
from .blocks import (
    Bottleneck,
    ConvBlock,
    CSPBlock,
    DepthwiseSeparable,
    FocusBlock,
    SPPBlock,
    space_to_depth_2x2,
)
from .detector import (
    SkyEyeDetectorModule,
    construct_model,
    create_detector,
    model_strides,
    parse_model,
)
from .head import DetectionHead, decode_predictions, to_reference_layout
from .neck import FeatureNeck, upsample_nearest_2x

__all__ = [
    "CBAM",
    "SwinBlock",
    "shift_window_mask",
    "window_partition",
    "window_reverse",
    "ChannelAttention",
    "CrossLayerAttention",
    "SpatialAttention",
    "TransformerLayer",
    "WindowedSelfAttention",
    "CSPDarknet",
    "feature_channels",
    "Bottleneck",
    "ConvBlock",
    "CSPBlock",
    "DepthwiseSeparable",
    "FocusBlock",
    "SPPBlock",
    "space_to_depth_2x2",
    "SkyEyeDetectorModule",
    "construct_model",
    "create_detector",
    "model_strides",
    "parse_model",
    "DetectionHead",
    "decode_predictions",
    "to_reference_layout",
    "FeatureNeck",
    "upsample_nearest_2x",
]
