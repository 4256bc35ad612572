from mav_detection_tpu.ops.geometry.foe import (
    line_intersections,
    foe_ransac,
    get_foe_dense,
    get_phi,
)
from mav_detection_tpu.ops.geometry.derotation import derotation_field, derotate
from mav_detection_tpu.ops.geometry.thresholds import (
    dynamic_angle_mask,
    fixed_angle_mask,
    detection_masks,
)

__all__ = [
    "line_intersections",
    "foe_ransac",
    "get_foe_dense",
    "get_phi",
    "derotation_field",
    "derotate",
    "dynamic_angle_mask",
    "fixed_angle_mask",
    "detection_masks",
]
