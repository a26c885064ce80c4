"""infer(): strain -> PosteriorResult in one call; infer_overlapping() for
rank-conditioned multi-signal events.

Reference hot path (src/ahsd/inference/pipeline.py:89-272, SURVEY.md §3.1):
data-prep dispatch → cached model → encode once → batched flow sampling
with circular wrap + railing mask + physical-units log-prob via the scaler
Jacobian → m1≥m2 enforcement → runtime/memory diagnostics → OOD score +
confidence verdict → refinement-gate attach.

TPU redesign: the whole sampling path (base draws → coupling-flow inverse →
wrap → denormalize → physical log-prob) is ONE jitted program — no 4096-
sample batching loop, no 110 sequential MADE passes. The per-call cost is
one device dispatch; throughput is bench.py's headline metric.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from posteriflow_tpu.inference.gating import refinement_gate
from posteriflow_tpu.inference.ood import (ContextStats, confidence_verdict,
                                           score_context)
from posteriflow_tpu.inference.preprocessing import (PreparedData,
                                                     prepare_real,
                                                     prepare_simulated)
from posteriflow_tpu.inference.result import PosteriorResult
from posteriflow_tpu.models.npe import LeanNPE
from posteriflow_tpu.scaler import ParamScaler


class InferenceEngine:
    """A loaded checkpoint + its jitted encode/sample programs.

    Mirrors the reference's cached load_model (pipeline.py:31-54); the jits
    are compiled once per (engine, n_samples) and cached."""

    def __init__(self, params, cfg, ood_stats: Optional[ContextStats] = None,
                 bias_map: Optional[dict] = None):
        self.params = params
        self.cfg = cfg
        self.model = LeanNPE(cfg.npe)
        self.scaler = ParamScaler(cfg.npe.param_names,
                                  premerger=cfg.npe.premerger)
        self.ood_stats = ood_stats
        self.bias_map = bias_map
        self._encode = jax.jit(self._encode_impl)
        self._sample = {}

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str | Path, name: str = "best"):
        from posteriflow_tpu.inference.gating import load_bias_map
        from posteriflow_tpu.train.checkpoints import CheckpointManager
        # a git-committed release export (params.msgpack at the top level)
        # loads directly — training checkpoints under model/ are ephemeral
        # (gitignored), release dirs are the durable deployment format
        if (Path(ckpt_dir) / "params.msgpack").exists():
            params, cfg, _meta = CheckpointManager.load_release(ckpt_dir)
            ood_path = Path(ckpt_dir) / "ood_stats.npz"
            # NOTE: no local ContextStats import here — a function-local
            # import would shadow the module-level name for the WHOLE
            # function scope and leave the training-checkpoint branch
            # below with an UnboundLocalError
            stats = (ContextStats.load(ood_path) if ood_path.exists()
                     else None)
            bias_map = (load_bias_map(Path(ckpt_dir) / "twin_grid.json")
                        or load_bias_map())
            return cls(params, cfg, ood_stats=stats, bias_map=bias_map)
        cm = CheckpointManager(ckpt_dir)
        state, cfg, _meta = cm.restore(name)
        ood_path = Path(ckpt_dir) / "ood_stats.npz"
        stats = ContextStats.load(ood_path) if ood_path.exists() else None
        # arm the amortization-bias gate: checkpoint-local twin grid wins,
        # else the repo-level artifact (round-1 gap: bias_map stayed None
        # and the twin-grid indicator was dead — VERDICT item 7)
        bias_map = (load_bias_map(Path(ckpt_dir) / "twin_grid.json")
                    or load_bias_map())
        return cls(state.params, cfg, ood_stats=stats, bias_map=bias_map)

    def _encode_impl(self, params, strain, asd_bands):
        asd = asd_bands if self.cfg.npe.uses_asd_bands else None
        return self.model.apply(params, strain, asd, method=LeanNPE.encode)

    def encode(self, strain: jnp.ndarray, asd_bands: jnp.ndarray):
        return self._encode(self.params, strain, asd_bands)

    def _sample_fn(self, n_samples: int):
        if n_samples not in self._sample:
            model, scaler = self.model, self.scaler

            def sample(params, key, ctx, rank):
                theta, y_raw, log_q_norm = model.apply(
                    params, key, ctx, rank, n_samples,
                    method=LeanNPE.sample_from_context)
                railed = scaler.railing_mask(y_raw)
                # physical-units density: log q_phys(x) = log q_norm(y) +
                # log|d normalize/dx| (reference: pipeline.py:57-76)
                log_q_phys = log_q_norm + scaler.log_abs_det_jacobian(theta)
                # enforce m1 >= m2 (reference: pipeline.py:184-186)
                m1 = jnp.maximum(theta[..., 0], theta[..., 1])
                m2 = jnp.minimum(theta[..., 0], theta[..., 1])
                theta = theta.at[..., 0].set(m1).at[..., 1].set(m2)
                return theta, log_q_phys, railed

            self._sample[n_samples] = jax.jit(sample)
        return self._sample[n_samples]

    def sample_posterior(self, key, context, rank: int, n_samples: int):
        r = jnp.full((context.shape[0],), rank, dtype=jnp.int32)
        return self._sample_fn(n_samples)(self.params, key, context, r)


_ENGINE_CACHE: Dict[str, InferenceEngine] = {}


def load_model(ckpt_dir: str | Path, name: str = "best") -> InferenceEngine:
    key = f"{ckpt_dir}::{name}"
    if key not in _ENGINE_CACHE:
        _ENGINE_CACHE[key] = InferenceEngine.from_checkpoint(ckpt_dir, name)
    return _ENGINE_CACHE[key]


def _prepare(engine: InferenceEngine, data=None, strain=None, gps=None,
             inject=None, seed: int = 0) -> PreparedData:
    """Data-prep dispatch (reference: pipeline.py:117-137)."""
    if isinstance(data, PreparedData):
        return data
    if inject is not None:
        return prepare_simulated(inject, seed=seed,
                                 psd_bands=engine.cfg.npe.psd_bands,
                                 param_names=engine.cfg.npe.param_names)
    if strain is not None:
        return prepare_real(strain, gps_time=gps or 0.0,
                            psd_bands=engine.cfg.npe.psd_bands)
    raise ValueError("provide PreparedData, raw strain, or an injection")


def infer(engine: InferenceEngine, data=None, strain=None, gps=None,
          inject=None, rank: int = 0, n_samples: int = 5000,
          seed: int = 0) -> PosteriorResult:
    """One-call amortized inference -> PosteriorResult."""
    timings = {}
    prepared = _prepare(engine, data, strain, gps, inject, seed)
    timings.update(prepared.timings)

    t0 = time.perf_counter()
    s = jnp.asarray(prepared.strain)[None]
    ab = jnp.asarray(prepared.asd_bands)[None]
    ctx = engine.encode(s, ab)
    ctx.block_until_ready()
    timings["encode"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    key = jax.random.PRNGKey(seed + 7)
    theta, log_q, railed = engine.sample_posterior(key, ctx, rank, n_samples)
    theta.block_until_ready()
    timings["sampling"] = time.perf_counter() - t0

    samples = np.asarray(theta[0])
    railed_np = np.asarray(railed[0])
    railing_frac = float(railed_np.mean())

    # OOD + verdict + refinement gate
    if engine.ood_stats is not None:
        _, pct = score_context(engine.ood_stats, np.asarray(ctx))
        ood_pct = float(pct[0])
    else:
        ood_pct = 0.0
    verdict = confidence_verdict(ood_pct, railing_frac, prepared.warnings)
    gate = refinement_gate(verdict, ood_pct, railing_frac, samples,
                           bias_map=engine.bias_map)

    diag = {
        "runtime": timings,
        "ood_percentile": ood_pct,
        "quality_warnings": prepared.warnings,
        "n_samples": n_samples,
        "draws_per_sec": n_samples / max(timings["sampling"], 1e-9),
    }
    return PosteriorResult(samples=samples, log_prob=np.asarray(log_q[0]),
                           param_names=tuple(engine.cfg.npe.param_names),
                           rank=rank, railed=railed_np, diagnostics=diag,
                           gate=gate, verdict=verdict,
                           gps_time=prepared.gps_time)


def infer_overlapping(engine: InferenceEngine, data=None, n_signals: int = 2,
                      n_samples: int = 5000, seed: int = 0,
                      **prep_kwargs) -> List[PosteriorResult]:
    """One posterior per rank, reusing the PreparedData and the encoder
    context (reference: pipeline.py:236-272); ranking is delegated to
    inference.ranking.rank_overlapping."""
    prepared = _prepare(engine, data, seed=seed, **prep_kwargs)
    results = []
    for r in range(n_signals):
        results.append(infer(engine, data=prepared, rank=r,
                             n_samples=n_samples, seed=seed))
    return results
