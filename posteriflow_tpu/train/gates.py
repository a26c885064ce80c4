"""Calibration-gated checkpoint selection — the system's headline safety
feature.

The reference README documents this machinery (per-epoch spurious_railing,
base-space concentration E‖z‖²/D, cov90[/high-SNR], SBC pass fraction; gate
--max_spurious_railing 0.10; best = lowest-val-NLL epoch PASSING the gate)
but its snapshot trainer never implements it — SURVEY.md §2.4 directs the
rebuild to treat the README as the spec, with the ingredients measured the
way scripts/validate_checkpoint.py:92-127 does offline.

Device side (jitted): railing fraction, base concentration, coverage
(overall + high-SNR), SBC ranks. Host side: SBC KS uniformity p-values
(scipy), the gate decision, and gated best-epoch selection.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from posteriflow_tpu.models.npe import LeanNPE
from posteriflow_tpu.physics.simulator import EventBatch
from posteriflow_tpu.train.trainer import TrainConfig


@dataclasses.dataclass(frozen=True)
class CalibrationGate:
    """Pass thresholds (README spec + validate_checkpoint.py:173-199)."""
    max_spurious_railing: float = 0.10
    base_conc_range: tuple = (0.5, 2.0)
    min_cov90: float = 0.80
    min_sbc_pass_frac: float = 9.0 / 11.0
    sbc_ks_p: float = 1e-3

    def passes(self, m: dict) -> bool:
        return (m["spurious_railing"] <= self.max_spurious_railing
                and self.base_conc_range[0] <= m["base_conc"]
                <= self.base_conc_range[1]
                and m["cov90_mean"] >= self.min_cov90
                and m.get("sbc_pass_frac", 1.0) >= self.min_sbc_pass_frac)


def make_calibration_metrics(cfg: TrainConfig, n_events: int = 256,
                             n_post: int = 128, high_snr: float = 15.0):
    """Jitted fn(params, batch, key) -> device metrics dict + SBC ranks."""
    model = LeanNPE(cfg.npe)
    scaler_dummy = None  # scaler lives inside the model

    @jax.jit
    def metrics(params, batch: EventBatch, key: jax.Array):
        n = min(n_events, batch.strain.shape[0])
        strain = batch.strain[:n]
        theta0 = batch.params[:n, 0, :]
        asd = batch.asd_bands[:n] if cfg.npe.uses_asd_bands else None
        rank0 = jnp.zeros((n,), dtype=jnp.int32)
        live = (batch.n_sig[:n] > 0).astype(jnp.float32)
        n_live = jnp.maximum(jnp.sum(live), 1.0)

        ctx = model.apply(params, strain, asd, method=LeanNPE.encode)

        # base-space concentration: z = forward(normalize(truth)); E‖z‖²/D
        # ≈ 1 for a calibrated flow (README base_conc)
        full_ctx = model.apply(params, ctx, rank0,
                               method=LeanNPE.full_context)
        from posteriflow_tpu.scaler import ParamScaler
        scaler = ParamScaler(cfg.npe.param_names,
                             premerger=cfg.npe.premerger)
        y_true = scaler.normalize(theta0)
        z, _ = model.apply(params, y_true, full_ctx,
                           method=lambda m, y, c: m.flow.forward(y, c))
        conc = jnp.sum(z ** 2, axis=-1) / cfg.npe.n_params
        base_conc = jnp.sum(conc * live) / n_live

        # posterior draws (raw normalized y for railing + physical for
        # coverage/SBC)
        theta_s, y_raw, _ = model.apply(params, key, ctx, rank0, n_post,
                                        method=LeanNPE.sample_from_context)

        railed = scaler.railing_mask(y_raw)                 # [n, n_post]
        spurious_railing = (jnp.sum(railed * live[:, None])
                            / (n_live * n_post))

        lo90 = jnp.quantile(theta_s, 0.05, axis=1)
        hi90 = jnp.quantile(theta_s, 0.95, axis=1)
        in90 = ((theta0 >= lo90) & (theta0 <= hi90)).astype(jnp.float32)
        cov90 = jnp.sum(in90 * live[:, None], axis=0) / n_live

        hs = live * (batch.net_snr[:n] >= high_snr).astype(jnp.float32)
        n_hs = jnp.maximum(jnp.sum(hs), 1.0)
        cov90_hs = jnp.sum(in90 * hs[:, None], axis=0) / n_hs

        # SBC ranks: position of the truth among posterior draws, per param
        ranks = jnp.sum((theta_s < theta0[:, None, :]).astype(jnp.int32),
                        axis=1)                              # [n, P]

        return {
            "spurious_railing": spurious_railing,
            "base_conc": base_conc,
            "cov90_all": cov90,
            "cov90_mean": jnp.mean(cov90),
            "cov90_highsnr_mean": jnp.mean(cov90_hs),
            "sbc_ranks": ranks,
            "live_mask": live,
        }

    return metrics


def sbc_pass_frac(ranks: np.ndarray, live: np.ndarray, n_post: int,
                  p_thresh: float = 1e-3) -> tuple[float, np.ndarray]:
    """Host: KS-uniformity p per parameter over live events; returns
    (fraction of params with p > threshold, p-values [P])."""
    from scipy.stats import kstest
    ranks = np.asarray(ranks)[np.asarray(live) > 0]
    if ranks.shape[0] < 8:
        return 1.0, np.ones(ranks.shape[-1])
    u = (ranks + 0.5) / (n_post + 1.0)
    ps = np.array([kstest(u[:, j], "uniform").pvalue
                   for j in range(u.shape[1])])
    return float(np.mean(ps > p_thresh)), ps


def evaluate_gate(cfg: TrainConfig, params, batch: EventBatch,
                  key: jax.Array, gate: CalibrationGate = CalibrationGate(),
                  n_post: int = 128, metrics_fn=None) -> dict:
    """Full host-side gate evaluation: device metrics + SBC KS + verdict.

    Pass a prebuilt metrics_fn (from make_calibration_metrics) when calling
    per-epoch — building it here creates a fresh jit closure every call,
    re-tracing the metrics program each epoch (round-1 weak spot #4)."""
    fn = metrics_fn or make_calibration_metrics(cfg, n_post=n_post)
    m = fn(params, batch, key)
    out = {k: float(v) for k, v in m.items()
           if k not in ("sbc_ranks", "live_mask", "cov90_all")}
    out["cov90_all"] = np.asarray(m["cov90_all"]).tolist()
    frac, ps = sbc_pass_frac(m["sbc_ranks"], m["live_mask"], n_post,
                             gate.sbc_ks_p)
    out["sbc_pass_frac"] = frac
    out["sbc_ks_p"] = ps.tolist()
    out["gate_passed"] = gate.passes(out)
    return out


def select_best(history: list[dict], select_key: str = "select_nll") -> int:
    """Gated best-epoch selection (README sticky-calibrated semantics):
    lowest selection NLL among gate-passing epochs; if none passes yet,
    fall back to lowest NLL overall."""
    passing = [h for h in history if h.get("gate_passed")]
    pool = passing if passing else history
    best = min(pool, key=lambda h: h[select_key])
    return best["epoch"]
