"""Core/overlap layer (reference: src/ahsd/core/): PriorityNet lives in
models.priority_net; here the hierarchical subtract-and-reinfer pipeline,
adaptive subtraction, bias correction, output calibration."""

from posteriflow_tpu.core.bias_corrector import BiasCorrector, BiasEstimator
from posteriflow_tpu.core.calibrator import OutputCalibrator
from posteriflow_tpu.core.pipeline import AHSDPipeline
from posteriflow_tpu.core.subtractor import AdaptiveSubtractor
from posteriflow_tpu.models.priority_net import PriorityNet

__all__ = ["AHSDPipeline", "AdaptiveSubtractor", "BiasCorrector",
           "BiasEstimator", "OutputCalibrator", "PriorityNet"]
