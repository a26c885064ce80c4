"""Inference layer (reference: src/ahsd/inference/__init__.py:15-21):
infer, infer_overlapping, load_model, PosteriorResult, prepare_real,
prepare_simulated, fetch_gwosc, OOD scoring, refinement gate, importance
correction, ranking."""

from posteriflow_tpu.inference.gating import refinement_gate
from posteriflow_tpu.inference.importance import (ISResult,
                                                  importance_correct,
                                                  make_log_likelihood,
                                                  make_marginalized_log_likelihood,
                                                  run_smc_prior,
                                                  symmetrized_log_q)
from posteriflow_tpu.inference.ood import (ContextStats, confidence_verdict,
                                           fit_context_stats, score_context)
from posteriflow_tpu.inference.pipeline import (InferenceEngine, infer,
                                                infer_overlapping,
                                                load_model)
from posteriflow_tpu.inference.preprocessing import (PreparedData,
                                                     fetch_gwosc,
                                                     prepare_real,
                                                     prepare_simulated)
from posteriflow_tpu.inference.ranking import rank_overlapping
from posteriflow_tpu.inference.result import PosteriorResult

__all__ = [
    "infer", "infer_overlapping", "load_model", "InferenceEngine",
    "PosteriorResult", "PreparedData", "prepare_real", "prepare_simulated",
    "fetch_gwosc", "fit_context_stats", "score_context",
    "confidence_verdict", "ContextStats", "refinement_gate",
    "importance_correct", "make_log_likelihood",
    "make_marginalized_log_likelihood", "run_smc_prior",
    "symmetrized_log_q", "ISResult", "rank_overlapping",
]
