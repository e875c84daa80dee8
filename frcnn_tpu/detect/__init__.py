from frcnn_tpu.detect.detector import Detector, DetectionResult

__all__ = ["Detector", "DetectionResult"]
