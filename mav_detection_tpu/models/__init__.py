from mav_detection_tpu.models.raft import RAFT, RAFTConfig, raft_flow, create_raft
from mav_detection_tpu.models.sky_segmentation import SkyUNet, create_sky_model, sky_mask
from mav_detection_tpu.models.yolo import TinyYOLO, create_yolo, detect_boxes

__all__ = [
    "RAFT",
    "RAFTConfig",
    "raft_flow",
    "create_raft",
    "SkyUNet",
    "create_sky_model",
    "sky_mask",
    "TinyYOLO",
    "create_yolo",
    "detect_boxes",
]
