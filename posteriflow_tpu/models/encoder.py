"""Strain encoders (flax.linen): whitened [B, 3, 16384] -> context vector.

Functional re-design of the reference's LeanStrainEncoder + CoherentEncoder
(src/ahsd/models/lean_npe.py:131-252, src/ahsd/models/coherent_encoder.py),
keeping every measured-to-matter design decision:

  - NO normalization on the amplitude path: convs see asinh-compressed raw
    strain (whitened data is already unit-scale), so absolute amplitude —
    the distance/SNR cue — survives (lean_npe.py docstring, failure #1);
  - an explicit per-window log-energy branch computed from RAW strain that
    no LayerNorm can erase (lean_npe.py:181-184);
  - one flat context vector with learned-query attention pooling
    (failure #2: per-parameter readouts collapse);
  - optional PSD-conditioning branch on a per-detector log-ASD-vs-design
    band summary (lean_npe.py:149-155);
  - CoherentEncoder: geometry features (band powers, power-weighted complex
    coherence, GCC arrival-time delays + peak sharpness, amplitude ratios)
    injected as transformer tokens BEFORE pooling (coherent_encoder.py).

TPU notes: convolutions and attention run in the MXU; geometry features are
rfft + segment-sums (clean XLA); everything is static-shaped. Params live in
fp32; matmuls accumulate in fp32.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from posteriflow_tpu.physics.constants import (F_LOWER, F_UPPER, N_SAMPLES,
                                               SAMPLE_RATE)


def sinusoidal_positions(n: int, d_model: int) -> jnp.ndarray:
    """[n, d_model] fixed sin/cos position encoding."""
    pos = np.arange(n, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * (-math.log(10000.0) / d_model))
    pe = np.zeros((n, d_model), dtype=np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(pe)


class ConvStem(nn.Module):
    """Norm-free strided conv1d stack: 16384 samples -> 61 tokens.
    Same receptive-field schedule as the reference stem
    (lean_npe.py:158-163): k64/s8 → k16/s4 → k8/s4 → k4/s2."""
    d_model: int = 192
    dtype: jnp.dtype = jnp.float32    # conv compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: [B, T] -> [B, L, d_model]
        h = x[..., None]                                  # [B, T, 1]
        for feat, k, s in ((32, 64, 8), (64, 16, 4), (128, 8, 4),
                           (self.d_model, 4, 2)):
            h = nn.Conv(feat, kernel_size=(k,), strides=(s,),
                        padding="VALID", dtype=self.dtype)(h)
            h = nn.gelu(h)
        return h


class TransformerBlock(nn.Module):
    """Pre-norm transformer encoder layer (reference fusion config:
    lean_npe.py:167-172 — d_model 192, 6 heads, ff 4×, GELU).

    Mixed precision: the residual stream and LayerNorms stay float32;
    attention and MLP matmuls run in `dtype` (bf16 on the MXU) and their
    outputs promote back to f32 at the residual add."""
    d_model: int = 192
    n_heads: int = 6
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True):
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model,
            deterministic=deterministic, dropout_rate=self.dropout,
            dtype=self.dtype)(h, h)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(4 * self.d_model, dtype=self.dtype)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype)(h)
        return x + h


class AttentionPool(nn.Module):
    """n_queries learned queries cross-attend into the token sequence
    (lean_npe.py:174-175)."""
    d_model: int = 192
    n_heads: int = 6
    n_queries: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        b = tokens.shape[0]
        q = self.param("queries",
                       nn.initializers.normal(1.0 / math.sqrt(self.d_model)),
                       (self.n_queries, self.d_model))
        q = jnp.broadcast_to(q, (b, self.n_queries, self.d_model))
        pooled = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model,
            dtype=self.dtype)(q, tokens)
        return pooled.reshape(b, -1).astype(jnp.float32)  # [B, nq*d]


class LeanStrainEncoder(nn.Module):
    """Whitened 3-detector strain -> flat context [B, context_dim]."""
    n_detectors: int = 3
    d_model: int = 192
    n_layers: int = 3
    n_heads: int = 6
    n_pool_queries: int = 8
    n_energy_windows: int = 16
    context_dim: int = 256
    psd_bands: int = 0
    dropout: float = 0.0
    # matmul/conv compute dtype ("bfloat16" halves MXU time; params, the
    # residual stream, LayerNorms, and all geometry/energy physics features
    # stay float32). Default float32 so pre-existing checkpoints reproduce
    # bit-exactly (NPEConfig.encoder_dtype).
    compute_dtype: str = "float32"

    def geometry_tokens(self, strain: jnp.ndarray) -> Optional[jnp.ndarray]:
        """Subclass hook (CoherentEncoder): [B, n, d_model] tokens prepended
        to the fusion transformer input (lean_npe.py:227-228)."""
        return None

    @nn.compact
    def __call__(self, strain: jnp.ndarray,
                 asd_bands: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        b, d, t = strain.shape
        strain = jnp.clip(jnp.nan_to_num(strain, nan=0.0, posinf=100.0,
                                         neginf=-100.0), -100.0, 100.0)

        # ── energy branch from RAW strain ─────────────────────────────────────
        w = self.n_energy_windows
        win = strain[..., : (t // w) * w].reshape(b, d, w, -1)
        log_energy = jnp.log(jnp.mean(win ** 2, axis=-1) + 1e-8)
        e = log_energy.reshape(b, -1)
        e = nn.gelu(nn.Dense(64, name="energy_fc1")(e))
        energy_feat = nn.gelu(nn.Dense(64, name="energy_fc2")(e))

        # ── geometry tokens (subclass hook, computed on cleaned strain) ───────
        extra = self.geometry_tokens(strain)

        # ── token branch on asinh-compressed strain ──────────────────────────
        dt_c = jnp.dtype(self.compute_dtype)
        x = jnp.arcsinh(strain).reshape(b * d, t)
        tokens = ConvStem(self.d_model, dtype=dt_c,
                          name="stem")(x)                 # [B*D, L, dm]
        length = tokens.shape[1]
        tokens = tokens + sinusoidal_positions(length, self.d_model)[None]
        det_embed = self.param("detector_embed", nn.initializers.normal(0.02),
                               (self.n_detectors, self.d_model))
        tokens = tokens.reshape(b, d, length, self.d_model)
        tokens = tokens + det_embed[None, :, None, :]
        tokens = tokens.reshape(b, d * length, self.d_model)
        if extra is not None:
            tokens = jnp.concatenate([extra, tokens], axis=1)

        tokens = tokens.astype(jnp.float32)           # f32 residual stream
        for i in range(self.n_layers):
            tokens = TransformerBlock(self.d_model, self.n_heads,
                                      self.dropout, dtype=dt_c,
                                      name=f"fusion_{i}")(
                tokens, deterministic)

        pooled = AttentionPool(self.d_model, self.n_heads,
                               self.n_pool_queries, dtype=dt_c,
                               name="pool")(tokens)

        feats = [pooled, energy_feat]
        if self.psd_bands > 0:
            # zeros = design-sensitivity reference when not supplied
            # (lean_npe.py:236-242)
            if asd_bands is None:
                asd_bands = jnp.zeros((b, self.n_detectors, self.psd_bands))
            a = asd_bands.reshape(b, -1)
            a = nn.gelu(nn.Dense(64, name="noise_fc1")(a))
            feats.append(nn.gelu(nn.Dense(32, name="noise_fc2")(a)))

        h = jnp.concatenate(feats, axis=-1)
        h = nn.gelu(nn.Dense(512, name="out_fc1")(h))
        return nn.Dense(self.context_dim, name="out_fc2")(h)


class CoherentEncoder(LeanStrainEncoder):
    """LeanStrainEncoder made geometry-aware (coherent_encoder.py): K log
    bands over [20, 1024] Hz of the unitary rfft; per-detector band log
    power; per-pair power-weighted complex coherence (|γ|, cosφ, sinφ); GCC
    arrival-time delay within the ±30 ms light-travel window + peak
    sharpness; per-pair log-amplitude ratio — MLP'd into n_geom_tokens
    conditioning tokens."""
    geometry_bands: int = 16
    geom_hidden: int = 128
    n_geom_tokens: int = 4
    tau_max_ms: float = 30.0

    def _band_matrix(self):
        freqs = np.fft.rfftfreq(N_SAMPLES, 1.0 / SAMPLE_RATE)
        band = (freqs >= F_LOWER) & (freqs < F_UPPER)
        lo = int(np.argmax(band))
        nf = int(band.sum())
        fb = freqs[band]
        edges = np.geomspace(F_LOWER, F_UPPER, self.geometry_bands + 1)
        bsum = np.zeros((self.geometry_bands, nf), dtype=np.float32)
        for k in range(self.geometry_bands):
            bsum[k] = ((fb >= edges[k]) & (fb < edges[k + 1]))
        return lo, nf, jnp.asarray(bsum), jnp.asarray(
            np.maximum(bsum.sum(1), 1.0))

    def _lag_matrices(self, lo: int, nf: int, maxlag: int):
        """Cos/sin lag matrices [nf, n_lags] for the GCC cross-correlation:
        cc(τ_l) ∝ xr·cos(2π k l/N) − xi·sin(2π k l/N) summed over band bins
        k. A [B, nf] × [nf, 247] matmul replaces the full-length irfft —
        same argmax/peak features (scale-invariant), a fraction of the
        compile-time/FLOPs (the irfft per pair was the dominant term in the
        coherent encoder's 386 s TPU compile)."""
        k_idx = np.arange(lo, lo + nf, dtype=np.float64)
        lags = np.arange(-maxlag, maxlag + 1, dtype=np.float64)
        phase = 2.0 * np.pi * np.outer(k_idx, lags) / N_SAMPLES
        return (jnp.asarray(np.cos(phase), dtype=jnp.float32),
                jnp.asarray(np.sin(phase), dtype=jnp.float32))

    def geometry_tokens(self, strain: jnp.ndarray) -> jnp.ndarray:
        b = strain.shape[0]
        lo, nf, bsum, bcount = self._band_matrix()
        maxlag = int(self.tau_max_ms * 1e-3 * SAMPLE_RATE)
        cos_l, sin_l = self._lag_matrices(lo, nf, maxlag)

        fd = jnp.fft.rfft(strain, axis=-1) / math.sqrt(N_SAMPLES)  # unitary
        dslice = fd[..., lo:lo + nf]                               # [B,D,Nf]
        dr, di = dslice.real, dslice.imag
        power = dr ** 2 + di ** 2
        amp = jnp.sqrt(power + 1e-12)
        e_band = jnp.einsum("bdf,kf->bdk", power, bsum) / bcount
        feats = [jnp.log(e_band + 1e-8).reshape(b, -1)]

        pairs = [(i, j) for i in range(self.n_detectors)
                 for j in range(i + 1, self.n_detectors)]
        lags_norm = jnp.arange(-maxlag, maxlag + 1, dtype=jnp.float32) / maxlag
        for (i, j) in pairs:
            xr = dr[:, i] * dr[:, j] + di[:, i] * di[:, j]   # Re(d_i d_j*)
            xi = di[:, i] * dr[:, j] - dr[:, i] * di[:, j]   # Im(d_i d_j*)
            num_r = jnp.einsum("bf,kf->bk", xr, bsum)
            num_i = jnp.einsum("bf,kf->bk", xi, bsum)
            den = jnp.einsum("bf,kf->bk", amp[:, i] * amp[:, j], bsum) + 1e-8
            gr, gi = num_r / den, num_i / den
            gmag = jnp.sqrt(gr ** 2 + gi ** 2) + 1e-8
            feats += [gmag, gr / gmag, gi / gmag]

            # GCC delay: lag-limited cross-correlation as a matmul (exact
            # match of the irfft window up to a constant scale; argmax and
            # peak-to-average are scale-invariant)
            win = xr @ cos_l - xi @ sin_l                   # [B, n_lags]
            a = jnp.abs(win)
            k_idx = jnp.argmax(a, axis=-1)
            tau = lags_norm[k_idx][:, None]
            peak = (jnp.max(a, axis=-1)
                    / (jnp.mean(a, axis=-1) + 1e-8))[:, None]
            feats += [tau, peak]

            ei = jnp.sum(power[:, i], axis=-1)
            ej = jnp.sum(power[:, j], axis=-1)
            feats.append((jnp.log(ei + 1e-8) - jnp.log(ej + 1e-8))[:, None])

        g = jnp.concatenate(feats, axis=-1)
        g = nn.gelu(nn.Dense(self.geom_hidden, name="geom_fc1")(g))
        g = nn.gelu(nn.Dense(self.geom_hidden, name="geom_fc2")(g))
        g = nn.Dense(self.n_geom_tokens * self.d_model,
                     name="geom_to_tokens")(g)
        return g.reshape(b, self.n_geom_tokens, self.d_model)
