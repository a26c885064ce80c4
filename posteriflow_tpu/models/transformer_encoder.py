"""Legacy/auxiliary strain encoders: lightweight patch transformer +
gated pretrained-audio-encoder variant.

Reference surface (src/ahsd/models/transformer_encoder.py): a
Whisper-small-based encoder (frozen early layers, positional adapter) with
a LightweightTransformerEncoder fallback; used by PriorityNet when
use_transformer_encoder is set. The rebuild's production encoders live in
models/encoder.py; this family exists for parity and ablations:

  - LightweightTransformerEncoder: patch-embed raw whitened strain (no
    convs) + pre-norm transformer + mean/max pooling — the reference's
    fallback, TPU-native;
  - PretrainedAudioEncoder: wraps a HuggingFace Whisper encoder when its
    weights are available locally (gated — this image has `transformers`
    but no model cache; raises a clear error otherwise).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from posteriflow_tpu.models.encoder import TransformerBlock, \
    sinusoidal_positions


class LightweightTransformerEncoder(nn.Module):
    """[B, n_det, T] whitened strain -> [B, out_dim]."""
    patch: int = 256
    d_model: int = 96
    n_layers: int = 4
    n_heads: int = 6
    out_dim: int = 64

    @nn.compact
    def __call__(self, strain: jnp.ndarray) -> jnp.ndarray:
        b, d, t = strain.shape
        x = jnp.clip(jnp.nan_to_num(strain), -100.0, 100.0)
        n_patch = t // self.patch
        x = jnp.arcsinh(x[..., : n_patch * self.patch])
        x = x.reshape(b, d, n_patch, self.patch)
        tok = nn.Dense(self.d_model, name="patch_embed")(x)   # [B,D,L,dm]
        tok = tok + sinusoidal_positions(n_patch, self.d_model)[None, None]
        det = self.param("det_embed", nn.initializers.normal(0.02),
                         (d, self.d_model))
        tok = (tok + det[None, :, None, :]).reshape(b, d * n_patch,
                                                    self.d_model)
        for i in range(self.n_layers):
            tok = TransformerBlock(self.d_model, self.n_heads,
                                   name=f"block_{i}")(tok)
        pooled = jnp.concatenate([tok.mean(axis=1), tok.max(axis=1)],
                                 axis=-1)
        return nn.Dense(self.out_dim, name="out")(pooled)


class PretrainedAudioEncoder:
    """Gated Whisper-encoder front-end (reference: transformer_encoder.py
    Whisper-small path). Requires locally cached HF weights."""

    def __init__(self, model_name: str = "openai/whisper-small",
                 out_dim: int = 64):
        self.out_dim = out_dim
        try:
            from transformers import FlaxWhisperModel  # noqa
            self._model = FlaxWhisperModel.from_pretrained(
                model_name, local_files_only=True)
        except Exception as e:
            raise RuntimeError(
                f"PretrainedAudioEncoder needs locally cached weights for "
                f"{model_name!r} (zero-egress environment). Use "
                f"LightweightTransformerEncoder instead.") from e

    @classmethod
    def from_config(cls, config, out_dim: int = 64):
        """Random-init Whisper encoder from a transformers.WhisperConfig —
        the offline entry point (no weight download), used for ablations
        and to exercise the encode path in the zero-egress test suite.
        Expects strain shaped [B, config.num_mel_bins, T] with
        T == 2 * config.max_source_positions (Whisper's stride-2 stem)."""
        from transformers import FlaxWhisperModel
        self = cls.__new__(cls)
        self.out_dim = out_dim
        self._model = FlaxWhisperModel(config, seed=0)
        return self

    def encode(self, strain: jnp.ndarray) -> jnp.ndarray:
        feats = self._model.encode(
            input_features=strain).last_hidden_state
        return feats.mean(axis=1)[..., : self.out_dim]
