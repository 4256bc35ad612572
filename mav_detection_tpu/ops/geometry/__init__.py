from mav_detection_tpu.ops.geometry.foe import (
    line_intersections,
    foe_ransac,
    get_foe_dense,
    get_foe_sparse,
    get_foe_sparse_traced,
    trace_init,
    trace_update,
    TraceState,
    get_phi,
)
from mav_detection_tpu.ops.geometry.derotation import derotation_field, derotate
from mav_detection_tpu.ops.geometry.thresholds import (
    dynamic_angle_mask,
    fixed_angle_mask,
    detection_masks,
)
from mav_detection_tpu.ops.geometry.ransac_fits import (
    fit_affine_ransac,
    fit_homography_lstsq,
    fit_homography_ransac,
    fit_fundamental_ransac,
    fit_essential_ransac,
    decompose_essential,
    rotation_matrix_to_euler,
)
from mav_detection_tpu.ops.geometry.kmeans import kmeans, cluster_image
from mav_detection_tpu.ops.geometry.warp import (
    remap_bilinear,
    warp_affine,
    warp_perspective,
)
from mav_detection_tpu.ops.geometry.global_motion import (
    affine_motion_field,
    homography_motion_field,
    subtract_global_motion,
)

__all__ = [
    "line_intersections",
    "foe_ransac",
    "get_foe_dense",
    "get_foe_sparse",
    "get_foe_sparse_traced",
    "trace_init",
    "trace_update",
    "TraceState",
    "get_phi",
    "derotation_field",
    "derotate",
    "dynamic_angle_mask",
    "fixed_angle_mask",
    "detection_masks",
    "fit_affine_ransac",
    "fit_homography_lstsq",
    "fit_homography_ransac",
    "fit_fundamental_ransac",
    "fit_essential_ransac",
    "decompose_essential",
    "rotation_matrix_to_euler",
    "kmeans",
    "cluster_image",
    "remap_bilinear",
    "warp_affine",
    "warp_perspective",
    "affine_motion_field",
    "homography_motion_field",
    "subtract_global_motion",
]
