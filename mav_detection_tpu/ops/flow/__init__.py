from mav_detection_tpu.ops.flow.farneback import farneback_flow, FarnebackParams

__all__ = ["farneback_flow", "FarnebackParams"]
