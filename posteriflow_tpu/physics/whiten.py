"""Whitening, matched-filter SNR, and colored-noise synthesis — pure JAX.

All device-side functions take the **ASD** (amplitude spectral density),
never the PSD: detector PSDs (~1e-47 1/Hz) underflow float32, so every
expression divides by the ASD BEFORE squaring (see psd.py float32 contract).

Conventions (the reference's, so whitened data means the same thing):

  - whitening makes correctly-modeled noise unit-variance white Gaussian —
    physics-validation check #1 (reference: bilby_pipeline.py:355-395,
    scripts/validate_pipeline_physics.py:2-10):
        y = irfft( rfft(x) / (ASD(f) · sqrt(fs/2)) );
  - matched-filter SNR is measured (never targeted) with the continuous-FT
    normalization fix:  ρ² = 4 df Σ_k |rfft(h)[k]/fs|² / S_n(f_k), summed
    over f ≥ f_lower (reference: bilby_pipeline.py:464-483);
  - a whitened signal's L2 norm equals its matched-filter SNR — the
    identity the training augmentations rely on (remix_data.py:280-286).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from posteriflow_tpu.physics.constants import (DELTA_F, F_LOWER, FREQS,
                                               N_SAMPLES, SAMPLE_RATE)

_FREQS = jnp.asarray(FREQS, dtype=jnp.float32)


def whiten_fd(h_fd: jnp.ndarray, asd: jnp.ndarray,
              delta_f: float = DELTA_F) -> jnp.ndarray:
    """Whiten a continuous-FT FD strain: h̃_w = (h̃/ASD)·sqrt(4 df)
    (bilby matched-filter normalization h/sqrt(PSD/4df), divide-first for
    float32 safety). In this normalization ρ = ||h̃_w||₂ over rfft bins."""
    return (h_fd / jnp.maximum(asd, 1e-38)) * jnp.sqrt(4.0 * delta_f)


def whiten_td(strain: jnp.ndarray, asd: jnp.ndarray) -> jnp.ndarray:
    """Whiten time-domain strain [..., N] against asd [..., N_RFFT]:
    y = irfft(rfft(x) / (ASD · sqrt(fs/2))). Unit-variance noise + L2=SNR."""
    x_fd = jnp.fft.rfft(strain, axis=-1) / jnp.maximum(asd, 1e-38)
    return jnp.fft.irfft(x_fd / jnp.sqrt(SAMPLE_RATE / 2.0),
                         n=strain.shape[-1], axis=-1)


def fd_white_to_td(h_w_fd: jnp.ndarray, n: int = N_SAMPLES) -> jnp.ndarray:
    """Continuous-FT whitened FD strain [..., N_RFFT] -> whitened TD samples
    [..., n], in the SAME normalization as whiten_td (L2 norm = SNR):
    s_w = irfft(h̃_w · sqrt(N/2))."""
    return jnp.fft.irfft(h_w_fd * jnp.sqrt(n / 2.0), n=n, axis=-1)


def matched_filter_snr_fd(h_fd: jnp.ndarray, asd: jnp.ndarray,
                          f_lower: float = F_LOWER) -> jnp.ndarray:
    """Optimal SNR from a continuous-FT FD waveform [..., N_RFFT]:
    ρ = sqrt(4 df Σ (|h(f)|/ASD)²) over f ≥ f_lower."""
    r = jnp.abs(h_fd) / jnp.maximum(asd, 1e-38)
    integ = jnp.where(_FREQS >= f_lower, r * r, 0.0)
    return jnp.sqrt(jnp.maximum(4.0 * DELTA_F * jnp.sum(integ, axis=-1), 0.0))


def matched_filter_snr_td(h_td: jnp.ndarray, asd: jnp.ndarray,
                          f_lower: float = F_LOWER) -> jnp.ndarray:
    """Optimal SNR of a time-domain waveform (reference fs² normalization:
    bilby_pipeline.py:464-483)."""
    h_fd = jnp.fft.rfft(h_td, axis=-1) / SAMPLE_RATE
    return matched_filter_snr_fd(h_fd, asd, f_lower)


def network_snr_whitened(sig_white: jnp.ndarray,
                         det_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Network SNR of a whitened signal [..., n_det, T]: the L2 norm over
    kept detectors (exact for unit-variance whitened data)."""
    e = jnp.sum(sig_white ** 2, axis=-1)             # [..., n_det]
    if det_mask is not None:
        e = e * det_mask
    return jnp.sqrt(jnp.sum(e, axis=-1))


def colored_noise_td(key: jax.Array, asd: jnp.ndarray,
                     n: int = N_SAMPLES) -> jnp.ndarray:
    """Colored Gaussian noise with one-sided ASD [N_RFFT] -> [n] float32.

    FD synthesis with E[|X[k]|²] = n·fs·S_n(f_k)/2 per complex DFT bin, so
    the series has the target spectral density (the reference documents the
    n·S_n/2 pitfall at bilby_pipeline.py:309-322; the extra fs converts its
    per-sample DFT convention to ours)."""
    n_rfft = n // 2 + 1
    kr, ki = jax.random.split(key)
    re = jax.random.normal(kr, (n_rfft,))
    im = jax.random.normal(ki, (n_rfft,))
    amp = asd * (jnp.sqrt(n * SAMPLE_RATE) / 2.0)
    x = (re + 1j * im) * amp
    # DC and Nyquist bins are real
    x = x.at[0].set(re[0] * amp[0] * jnp.sqrt(2.0))
    x = x.at[-1].set(re[-1] * amp[-1] * jnp.sqrt(2.0))
    return jnp.fft.irfft(x, n=n)
