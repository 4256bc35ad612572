from mav_detection_tpu.core.rectangle import Rectangle
from mav_detection_tpu.core.flo import read_flow, write_flow
from mav_detection_tpu.core.frame_result import FrameResult
from mav_detection_tpu.core.config import Mode, DatasetType, Algorithm, RunConfig

__all__ = [
    "Rectangle",
    "read_flow",
    "write_flow",
    "FrameResult",
    "Mode",
    "DatasetType",
    "Algorithm",
    "RunConfig",
]
