"""Per-epoch conditional-inference diagnostics (jitted).

The reference's run_diagnostics (experiments/train_lean_npe.py:130-178),
answering every epoch: is the flow actually conditioning on the data?

  shuffle_delta_nll — val NLL with contexts shuffled across events minus
                      matched-context NLL (~0 ⇒ marginal fit, should grow)
  dist_corr         — corr(log posterior-median distance, log true distance)
  cov50 / cov90     — empirical central credible-interval coverage for all
                      11 params from n_post posterior draws per event
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from posteriflow_tpu.models.npe import LeanNPE
from posteriflow_tpu.physics.simulator import EventBatch
from posteriflow_tpu.train.trainer import TrainConfig

DIST_IDX = 2     # luminosity_distance in PARAM_NAMES


def make_diagnostics(cfg: TrainConfig, n_events: int = 256,
                     n_post: int = 128):
    """Returns diagnostics(params, batch, key) -> dict of scalars/arrays.
    Uses rank-0 (primary signal) labels only, like the reference."""
    model = LeanNPE(cfg.npe)

    @jax.jit
    def diagnostics(params, batch: EventBatch, key: jax.Array):
        n = min(n_events, batch.strain.shape[0])
        strain = batch.strain[:n]
        theta0 = batch.params[:n, 0, :]
        asd = batch.asd_bands[:n] if cfg.npe.uses_asd_bands else None
        rank0 = jnp.zeros((n,), dtype=jnp.int32)
        live = (batch.n_sig[:n] > 0).astype(jnp.float32)
        n_live = jnp.maximum(jnp.sum(live), 1.0)

        ctx = model.apply(params, strain, asd, method=LeanNPE.encode)
        nll_true = model.apply(params, ctx, theta0, rank0,
                               method=LeanNPE.nll_from_context)
        k_perm, k_samp = jax.random.split(key)
        perm = jax.random.permutation(k_perm, n)
        nll_shuf = model.apply(params, ctx[perm], theta0, rank0,
                               method=LeanNPE.nll_from_context)
        mean_true = jnp.sum(nll_true * live) / n_live
        # pair mask: both the event and its shuffled context-donor are live
        pair = live * live[perm]
        mean_shuf = jnp.sum(nll_shuf * pair) / jnp.maximum(jnp.sum(pair), 1.0)

        samples, _, _ = model.apply(params, k_samp, ctx, rank0, n_post,
                                    method=LeanNPE.sample_from_context)
        # [n, n_post, P] physical

        lo50 = jnp.quantile(samples, 0.25, axis=1)
        hi50 = jnp.quantile(samples, 0.75, axis=1)
        lo90 = jnp.quantile(samples, 0.05, axis=1)
        hi90 = jnp.quantile(samples, 0.95, axis=1)
        in50 = ((theta0 >= lo50) & (theta0 <= hi50)).astype(jnp.float32)
        in90 = ((theta0 >= lo90) & (theta0 <= hi90)).astype(jnp.float32)
        cov50 = jnp.sum(in50 * live[:, None], axis=0) / n_live
        cov90 = jnp.sum(in90 * live[:, None], axis=0) / n_live

        d_med = jnp.median(samples[:, :, DIST_IDX], axis=1)
        d_true = jnp.maximum(theta0[:, DIST_IDX], 1.0)
        x = jnp.log(jnp.maximum(d_med, 1.0))
        y = jnp.log(d_true)
        xm = jnp.sum(x * live) / n_live
        ym = jnp.sum(y * live) / n_live
        cov_xy = jnp.sum((x - xm) * (y - ym) * live) / n_live
        var_x = jnp.sum((x - xm) ** 2 * live) / n_live
        var_y = jnp.sum((y - ym) ** 2 * live) / n_live
        dist_corr = cov_xy / jnp.sqrt(jnp.maximum(var_x * var_y, 1e-12))

        return {
            "val_nll_diag": mean_true,
            "shuffle_delta_nll": mean_shuf - mean_true,
            "dist_corr": dist_corr,
            "dist_cov50": cov50[DIST_IDX],
            "dist_cov90": cov90[DIST_IDX],
            "cov50_all": cov50,
            "cov90_all": cov90,
        }

    return diagnostics
