from mav_detection_tpu.ops.flow.farneback import (
    FarnebackParams,
    effective_pallas_config,
    farneback_flow,
    tuned_flow_params,
)

__all__ = ["farneback_flow", "FarnebackParams", "tuned_flow_params",
           "effective_pallas_config"]
