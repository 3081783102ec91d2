from .der import BaseMetric, DiarizationErrorRate, DetectionErrorRate

__all__ = ["BaseMetric", "DiarizationErrorRate", "DetectionErrorRate"]
