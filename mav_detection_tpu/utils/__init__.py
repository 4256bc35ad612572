from mav_detection_tpu.utils.tracing import Tracer, stage, trace_to

__all__ = ["Tracer", "stage", "trace_to"]
