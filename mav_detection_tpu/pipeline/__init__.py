from mav_detection_tpu.pipeline.detector import DetectionStep, detect_frame_pair
from mav_detection_tpu.pipeline.processor import Processor

__all__ = ["DetectionStep", "detect_frame_pair", "Processor"]
