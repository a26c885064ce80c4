"""GCC-as-matmul parity: the lag-matrix cross-correlation must match the
full-length irfft window (up to constant scale) — same argmax lag, same
peak-to-average sharpness."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posteriflow_tpu.models.encoder import CoherentEncoder
from posteriflow_tpu.physics.constants import (F_LOWER, F_UPPER, N_SAMPLES,
                                               SAMPLE_RATE)


def _irfft_reference(xr, xi, lo, nf, maxlag):
    n_rfft = N_SAMPLES // 2 + 1
    xfull = np.zeros((xr.shape[0], n_rfft), dtype=np.complex64)
    xfull[:, lo:lo + nf] = xr + 1j * xi
    cc = np.fft.irfft(xfull, n=N_SAMPLES, axis=-1)
    return np.concatenate([cc[:, -maxlag:], cc[:, :maxlag + 1]], axis=1)


def test_lag_matmul_matches_irfft():
    enc = CoherentEncoder()
    lo, nf, _, _ = enc._band_matrix()
    maxlag = int(enc.tau_max_ms * 1e-3 * SAMPLE_RATE)
    cos_l, sin_l = enc._lag_matrices(lo, nf, maxlag)

    rng = np.random.default_rng(0)
    xr = rng.standard_normal((4, nf)).astype(np.float32)
    xi = rng.standard_normal((4, nf)).astype(np.float32)

    win_mm = np.asarray(jnp.asarray(xr) @ cos_l - jnp.asarray(xi) @ sin_l)
    win_ref = _irfft_reference(xr, xi, lo, nf, maxlag)

    # irfft includes 1/N; the matmul omits it (constant scale)
    scale = N_SAMPLES / 2.0
    np.testing.assert_allclose(win_mm / scale, win_ref, atol=2e-3)
    # the features derived from the window are identical
    np.testing.assert_array_equal(np.argmax(np.abs(win_mm), axis=1),
                                  np.argmax(np.abs(win_ref), axis=1))
    p_mm = np.abs(win_mm).max(1) / np.abs(win_mm).mean(1)
    p_ref = np.abs(win_ref).max(1) / np.abs(win_ref).mean(1)
    np.testing.assert_allclose(p_mm, p_ref, rtol=1e-3)


def test_coherent_encoder_detects_true_delay():
    """A signal delayed between detectors must move the GCC argmax."""
    from posteriflow_tpu.inference.preprocessing import prepare_simulated
    BBH = {"mass_1": 36.0, "mass_2": 29.0, "luminosity_distance": 300.0,
           "ra": 1.0, "dec": -0.5, "theta_jn": 0.2, "psi": 0.3,
           "phase": 1.0, "geocent_time": 0.0, "a1": 0.0, "a2": 0.0}
    prep = prepare_simulated([BBH], seed=0, add_noise=False)
    enc = CoherentEncoder(context_dim=32, d_model=32, n_layers=1,
                          n_heads=4, psd_bands=16)
    x = jnp.asarray(prep.strain)[None]
    v = enc.init(jax.random.PRNGKey(0), x,
                 jnp.zeros((1, 3, 16)))
    out = enc.apply(v, x, jnp.zeros((1, 3, 16)))
    assert out.shape == (1, 32)
    assert np.isfinite(np.asarray(out)).all()
