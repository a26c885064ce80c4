"""Evaluation layer (reference: src/ahsd/evaluation/)."""

from posteriflow_tpu.evaluation.benchmarks import (
    JointParameterEstimation, SimpleIterativeSubtraction,
    StandardHierarchicalSubtraction)
from posteriflow_tpu.evaluation.metrics import (BiasMetrics,
                                                ComparisonMetrics,
                                                PerformanceMetrics,
                                                RecoveryMetrics)
from posteriflow_tpu.evaluation.noise_analysis import NoiseAnalyzer
from posteriflow_tpu.evaluation.validation import ResultValidator

__all__ = ["BiasMetrics", "PerformanceMetrics", "RecoveryMetrics",
           "ComparisonMetrics", "ResultValidator", "NoiseAnalyzer",
           "StandardHierarchicalSubtraction", "SimpleIterativeSubtraction",
           "JointParameterEstimation"]
