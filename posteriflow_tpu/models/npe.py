"""LeanNPE: encoder + rank embedding + coupling-NSF flow (flax.linen).

The production model — rank-conditioned amortized posterior over the 11 CBC
parameters, pure-NLL objective (reference: src/ahsd/models/lean_npe.py:255-338).
The flow context is [encoder(strain) ∥ rank_embedding(rank)] so one encoder
pass serves every overlapping signal's posterior query (rank conditioning is
design decision #3 in the reference's docstring).

Functional API (everything jit/vmap/pjit-friendly):
    nll(params, strain, theta_phys, rank, asd_bands)   -> [B]
    encode(params, strain, asd_bands)                  -> [B, context_dim]
    nll_from_context(params, context, theta, rank)     -> [B]
    sample(params, key, strain, rank, n)               -> [B, n, 11] physical
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from posteriflow_tpu import PARAM_NAMES
from posteriflow_tpu.models.encoder import CoherentEncoder, LeanStrainEncoder
from posteriflow_tpu.models.flow import CouplingNSF
from posteriflow_tpu.scaler import ParamScaler


@dataclasses.dataclass(frozen=True)
class NPEConfig:
    """Static model configuration, stored verbatim in checkpoints
    (reference bundles args in best_model.pth: train_lean_npe.py:423-427)."""
    param_names: tuple = PARAM_NAMES
    context_dim: int = 256
    rank_dim: int = 32
    max_signals: int = 5
    flow_layers: int = 10
    flow_hidden: int = 256
    flow_bins: int = 16
    tail_bound: float = 5.0
    encoder_type: str = "coherent"       # "conv" | "coherent"
    psd_cond: bool = False
    psd_bands: int = 16
    premerger: bool = False
    d_model: int = 192
    enc_layers: int = 3
    enc_heads: int = 6
    flow_dtype: str = "bfloat16"     # conditioner matmul dtype (RQS is f32)
    # encoder matmul/conv dtype; "float32" default keeps pre-existing
    # checkpoints bit-exact, production configs set "bfloat16" (MXU speed —
    # see encoder.py mixed-precision notes)
    encoder_dtype: str = "float32"

    @property
    def n_params(self) -> int:
        return len(self.param_names)

    @property
    def uses_asd_bands(self) -> bool:
        # the coherent encoder always ingests asd_bands (lean_npe.py:269-271)
        return self.psd_cond or self.encoder_type == "coherent"


class LeanNPE(nn.Module):
    cfg: NPEConfig = NPEConfig()

    def setup(self):
        c = self.cfg
        enc_kw = dict(context_dim=c.context_dim, d_model=c.d_model,
                      n_layers=c.enc_layers, n_heads=c.enc_heads,
                      psd_bands=c.psd_bands if c.uses_asd_bands else 0,
                      compute_dtype=c.encoder_dtype)
        if c.encoder_type == "coherent":
            self.encoder = CoherentEncoder(**enc_kw)
        else:
            self.encoder = LeanStrainEncoder(**enc_kw)
        self.rank_embed = nn.Embed(c.max_signals, c.rank_dim)
        self.flow = CouplingNSF(
            features=c.n_params,
            context_features=c.context_dim + c.rank_dim,
            num_layers=c.flow_layers, hidden=c.flow_hidden,
            num_bins=c.flow_bins, tail_bound=c.tail_bound,
            compute_dtype=c.flow_dtype)
        self.scaler = ParamScaler(c.param_names, premerger=c.premerger)

    def encode(self, strain: jnp.ndarray,
               asd_bands: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if self.cfg.uses_asd_bands:
            return self.encoder(strain, asd_bands)
        return self.encoder(strain)

    def full_context(self, context: jnp.ndarray,
                     rank: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate([context, self.rank_embed(rank)], axis=-1)

    def nll_from_context(self, context: jnp.ndarray, theta_phys: jnp.ndarray,
                         rank: jnp.ndarray) -> jnp.ndarray:
        """context [B, C]; theta_phys [B, P] physical; rank [B] int -> [B]."""
        ctx = self.full_context(context, rank)
        y = self.scaler.normalize(theta_phys)
        return -self.flow.log_prob(y, ctx)

    def nll(self, strain: jnp.ndarray, theta_phys: jnp.ndarray,
            rank: jnp.ndarray,
            asd_bands: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        return self.nll_from_context(self.encode(strain, asd_bands),
                                     theta_phys, rank)

    def sample_from_context(self, key: jax.Array, context: jnp.ndarray,
                            rank: jnp.ndarray, n_samples: int):
        """context [B, C], rank [B] -> physical samples [B, n, P].

        Raw flow output is wrapped (exact for circular params) then
        denormalized (reference: lean_npe.py:318-332)."""
        ctx = self.full_context(context, rank)               # [B, C+R]
        b = ctx.shape[0]
        z = jax.random.normal(key, (b, n_samples, self.cfg.n_params))
        # ctx keeps a broadcast dim: the flow's context projection then runs
        # once per event, not once per draw (see Conditioner docstring)
        y, log_q = self.flow.sample_with_log_prob(z, ctx[:, None, :])
        y = self.scaler.wrap(y)
        return self.scaler.denormalize(y), y, log_q

    def sample(self, key: jax.Array, strain: jnp.ndarray, rank: int = 0,
               n_samples: int = 256,
               asd_bands: Optional[jnp.ndarray] = None):
        context = self.encode(strain, asd_bands)
        r = jnp.full((context.shape[0],), rank, dtype=jnp.int32)
        theta, _, _ = self.sample_from_context(key, context, r, n_samples)
        return theta

    def __call__(self, strain: jnp.ndarray, theta_phys: jnp.ndarray,
                 rank: jnp.ndarray,
                 asd_bands: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        return self.nll(strain, theta_phys, rank, asd_bands)
