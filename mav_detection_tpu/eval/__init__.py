from mav_detection_tpu.eval.validator import Validator

__all__ = ["Validator"]
