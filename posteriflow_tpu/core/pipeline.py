"""AHSDPipeline: hierarchical subtract-and-reinfer decomposition of
overlapping signals.

Reference surface (src/ahsd/core/ahsd_pipeline.py decompose_overlapping_
signals, :102-830): prioritize -> extract_and_subtract -> quality gate ->
bias correction -> residual feeds the next iteration; per-stage metrics.

TPU-native form: each stage is (amortized NPE on the residual) + (exact FD
template subtraction) — both jitted programs on device; the loop is a short
Python orchestration over at most max_signals stages, and whole events fan
out across pod slices via the inference batch dimension (BASELINE
configs[4] pod-scale overlap pipeline).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from posteriflow_tpu.core.bias_corrector import BiasCorrector
from posteriflow_tpu.core.subtractor import AdaptiveSubtractor
from posteriflow_tpu.inference.pipeline import InferenceEngine, infer
from posteriflow_tpu.inference.preprocessing import PreparedData
from posteriflow_tpu.inference.result import PosteriorResult


class AHSDPipeline:
    def __init__(self, engine: InferenceEngine,
                 subtractor: Optional[AdaptiveSubtractor] = None,
                 bias_corrector: Optional[BiasCorrector] = None,
                 max_signals: int = 5, quality_threshold: float = 0.3,
                 n_samples: int = 2048):
        self.engine = engine
        self.subtractor = subtractor or AdaptiveSubtractor(
            quality_threshold=quality_threshold)
        self.bias_corrector = bias_corrector
        self.max_signals = max_signals
        self.n_samples = n_samples

    def decompose(self, prepared: PreparedData, seed: int = 0) -> Dict:
        """Iteratively extract signals from a whitened event.

        Each stage: rank-0 amortized inference on the CURRENT residual
        (after subtraction the next-loudest signal IS rank 0) -> posterior-
        mean template subtraction -> quality gate -> optional bias
        correction of the NEXT stage's posterior."""
        strain = np.array(prepared.strain, copy=True)
        d0_power = float((strain ** 2).sum())
        stages: List[Dict] = []
        results: List[PosteriorResult] = []

        for stage in range(self.max_signals):
            data = PreparedData(
                strain=strain, asds=prepared.asds,
                asd_bands=prepared.asd_bands,
                detectors_present=prepared.detectors_present,
                quality=prepared.quality, warnings=prepared.warnings,
                timings={}, gps_time=prepared.gps_time)
            res = infer(self.engine, data=data, rank=0,
                        n_samples=self.n_samples, seed=seed + stage)

            sub = self.subtractor.subtract(strain, res.samples[:512])
            residual_ratio = float((sub["residual"] ** 2).sum() / d0_power)

            if self.bias_corrector is not None and stage > 0:
                corrected = self.bias_corrector.correct(
                    res.samples, stage, sub["quality"], sub["alpha"],
                    residual_ratio)
                if corrected["applied"]:
                    res.samples = corrected["samples"]
                    res.diagnostics["bias_corrected"] = True

            stage_rec = {
                "stage": stage,
                "fit_snr": sub["fit_snr"],
                "template_snr": sub["template_snr"],
                "quality": sub["quality"],
                "alpha": sub["alpha"],
                "residual_power_ratio": residual_ratio,
                "accepted": sub["accepted"],
            }
            stages.append(stage_rec)

            if not sub["accepted"]:
                break                      # quality gate: stop extracting
            results.append(res)
            strain = sub["residual"].astype(np.float32)

        return {
            "results": results,
            "n_extracted": len(results),
            "stages": stages,
            "final_residual_power_ratio":
                stages[-1]["residual_power_ratio"] if stages else 1.0,
        }
