from mav_detection_tpu.ops.flow.farneback import (
    FarnebackParams,
    farneback_flow,
    tuned_flow_params,
)

__all__ = ["farneback_flow", "FarnebackParams", "tuned_flow_params"]
