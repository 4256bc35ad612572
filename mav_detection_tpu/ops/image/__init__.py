from mav_detection_tpu.ops.image.metrics import (
    get_magnitude,
    get_rho,
    calculate_tpr_fpr,
    calculate_tpr_fpr_batch,
)
from mav_detection_tpu.ops.image.visualize import (
    flow_radial_device,
    flow_to_color,
    flow_to_color_device,
    apply_colormap,
    to_int,
    to_rgb,
    colorwheel_image,
    colorbar_image,
)
from mav_detection_tpu.ops.image.resize import resize, resize_percent
from mav_detection_tpu.ops.image.boxes import get_simple_bounding_box, get_simple_bounding_box_device

__all__ = [
    "get_magnitude",
    "get_rho",
    "calculate_tpr_fpr",
    "calculate_tpr_fpr_batch",
    "flow_radial_device",
    "flow_to_color",
    "flow_to_color_device",
    "apply_colormap",
    "to_int",
    "to_rgb",
    "colorwheel_image",
    "colorbar_image",
    "resize",
    "resize_percent",
    "get_simple_bounding_box",
    "get_simple_bounding_box_device",
]
