from streamyolo_tpu.nn.blocks import (
    BaseConv,
    Bottleneck,
    CSPLayer,
    DWConv,
    Focus,
    ResLayer,
    SPPBottleneck,
    get_activation,
    space_to_depth_focus,
)

__all__ = [
    "BaseConv",
    "Bottleneck",
    "CSPLayer",
    "DWConv",
    "Focus",
    "ResLayer",
    "SPPBottleneck",
    "get_activation",
    "space_to_depth_focus",
]
