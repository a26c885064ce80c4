"""Hierarchical-bias correction network.

Reference surface (src/ahsd/core/bias_corrector.py, 1696 LoC): a residual
MLP predicting (parameter corrections, uncertainties, variance scales) for
posteriors estimated on residual data after earlier subtractions, plus
physics-bounds enforcement and a training entry point. Flax re-design:
compact residual MLP, normalized-space corrections (so bounds are the
scaler's ±1 box), trainable against simulator-ground-truth bias pairs.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from posteriflow_tpu import N_PARAMS
from posteriflow_tpu.scaler import ParamScaler


class ResidualMLP(nn.Module):
    hidden: int = 128
    n_blocks: int = 3

    @nn.compact
    def __call__(self, x):
        h = nn.gelu(nn.Dense(self.hidden)(x))
        for _ in range(self.n_blocks):
            r = nn.gelu(nn.Dense(self.hidden)(h))
            r = nn.Dense(self.hidden)(r)
            h = nn.gelu(h + r)
        return h


class BiasEstimator(nn.Module):
    """(normalized params of the candidate, subtraction-stage features) ->
    (correction, uncertainty, variance-scale) per parameter."""
    hidden: int = 128

    @nn.compact
    def __call__(self, y_params: jnp.ndarray, stage_feats: jnp.ndarray):
        h = ResidualMLP(self.hidden)(
            jnp.concatenate([y_params, stage_feats], axis=-1))
        corr = 0.2 * jnp.tanh(nn.Dense(N_PARAMS, name="corr")(h))
        sigma = nn.softplus(nn.Dense(N_PARAMS, name="sigma")(h)) + 1e-3
        vscale = 1.0 + nn.softplus(nn.Dense(N_PARAMS, name="vscale")(h))
        return corr, sigma, vscale


class BiasCorrector:
    """Applies a trained BiasEstimator to a posterior estimated on residual
    data (reference correct_hierarchical_biases: bias_corrector.py:1049)."""

    STAGE_FEATS = 4   # (stage index, quality, alpha, residual power ratio)

    def __init__(self, params=None, scaler: Optional[ParamScaler] = None):
        self.model = BiasEstimator()
        self.params = params
        self.scaler = scaler or ParamScaler()

    def init(self, key):
        self.params = self.model.init(
            key, jnp.zeros((1, N_PARAMS)), jnp.zeros((1, self.STAGE_FEATS)))
        return self.params

    def correct(self, samples: np.ndarray, stage: int, quality: float,
                alpha: float, residual_ratio: float) -> Dict:
        """samples [N, P] physical -> corrected physical samples with
        variance inflation; bounds enforced by the scaler box."""
        if self.params is None:
            return {"samples": samples, "applied": False}
        y = self.scaler.normalize(jnp.asarray(samples))
        feats = jnp.broadcast_to(
            jnp.asarray([[float(stage), quality, alpha, residual_ratio]]),
            (y.shape[0], self.STAGE_FEATS))
        corr, _sigma, vscale = self.model.apply(self.params, y, feats)
        mean = jnp.mean(y, axis=0, keepdims=True)
        y_new = mean + (y - mean) * jnp.sqrt(vscale) + corr
        y_new = self.scaler.wrap(y_new)
        return {"samples": np.asarray(self.scaler.denormalize(y_new)),
                "applied": True,
                "mean_correction": np.asarray(jnp.mean(corr, axis=0)),
                "mean_vscale": np.asarray(jnp.mean(vscale, axis=0))}

    # ── training (reference train_bias_estimator: bias_corrector.py:1324) ────
    def make_loss(self):
        model, scaler = self.model, self.scaler

        def loss_fn(params, y_est, stage_feats, y_true):
            """Gaussian NLL of the true (normalized) params under the
            corrected estimate: teaches corrections AND honest widths."""
            corr, sigma, _ = model.apply(params, y_est, stage_feats)
            err = (y_est + corr) - y_true
            return jnp.mean(0.5 * (err / sigma) ** 2 + jnp.log(sigma))

        return loss_fn
