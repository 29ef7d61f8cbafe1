from .aligner import DEFAULT_REFERENCE_LANDMARKS, FaceAligner, NormalizationProcessor
from .detector import FaceDetector, ScrfdFaceDetector, create_face_detector
from .pipeline import (
    PreprocessingOutput,
    PreprocessingPipeline,
    create_pipeline_from_config,
)
from .quality_checker import QualityChecker

__all__ = [
    "DEFAULT_REFERENCE_LANDMARKS",
    "FaceAligner",
    "FaceDetector",
    "NormalizationProcessor",
    "PreprocessingOutput",
    "PreprocessingPipeline",
    "QualityChecker",
    "ScrfdFaceDetector",
    "create_face_detector",
    "create_pipeline_from_config",
]
