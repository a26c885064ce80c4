"""Reduced-order SVD basis for whitened FD waveforms.

Reference surface (src/ahsd/models/build_svd_basis.py): stack whitened
plus-polarization FD waveforms over the BBH range with random time-shift
phase ramps; complex SVD -> basis (Bre/Bim) saved to svd_basis.npz — an
alternative compressed front-end for encoders (and the standard front-end
for long-BNS embedding, SURVEY.md §5 long-context note).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from posteriflow_tpu.physics.constants import FREQS
from posteriflow_tpu.physics.psd import aligo_psd, asd_from_psd
from posteriflow_tpu.physics.waveforms import imr_polarizations
from posteriflow_tpu.physics.whiten import whiten_fd

_FREQS = jnp.asarray(FREQS, dtype=jnp.float32)


def build_svd_basis(n_waveforms: int = 512, n_basis: int = 64,
                    mass_range=(5.0, 100.0), time_shift_max: float = 1.5,
                    seed: int = 0, out: Optional[str | Path] = None):
    """-> (basis [n_basis, N_RFFT] complex64, singular_values).

    Training waveforms: whitened h+ over log-uniform masses with random
    time-shift phase ramps (so the basis spans the in-window time range,
    reference: build_svd_basis.py:25)."""
    asd = asd_from_psd(aligo_psd(FREQS))
    key = jax.random.PRNGKey(seed)
    k_m, k_t = jax.random.split(key)
    logm = jax.random.uniform(k_m, (n_waveforms, 2),
                              minval=np.log(mass_range[0]),
                              maxval=np.log(mass_range[1]))
    m = jnp.exp(logm)
    m1 = jnp.maximum(m[:, 0], m[:, 1])
    m2 = jnp.minimum(m[:, 0], m[:, 1])
    dt = jax.random.uniform(k_t, (n_waveforms,), minval=-time_shift_max,
                            maxval=time_shift_max)

    @jax.jit
    def make(m1, m2, dt):
        hp, _ = imr_polarizations(_FREQS, m1, m2, 0.0, 0.0, 500.0, 0.0, 0.0)
        ramp = jnp.exp(-2j * jnp.pi * jnp.mod(_FREQS * dt, 1.0))
        return whiten_fd(hp * ramp, asd)

    hw = jax.vmap(make)(m1, m2, dt)                      # [N, F] complex
    hw = np.asarray(hw)
    norms = np.linalg.norm(hw, axis=1, keepdims=True)
    hw = hw / np.maximum(norms, 1e-12)

    # complex SVD on the host (one-time offline stage)
    _, s, vh = np.linalg.svd(hw, full_matrices=False)
    basis = vh[:n_basis].astype(np.complex64)
    if out:
        np.savez(out, Bre=basis.real, Bim=basis.imag,
                 singular_values=s[:n_basis])
    return basis, s[:n_basis]


def project_onto_basis(h_fd: jnp.ndarray, basis: jnp.ndarray) -> jnp.ndarray:
    """Whitened FD strain [..., F] -> basis coefficients [..., n_basis]
    (complex inner products; returned as stacked re/im floats)."""
    coeff = jnp.einsum("...f,bf->...b", h_fd, jnp.conj(basis))
    return jnp.concatenate([coeff.real, coeff.imag], axis=-1)


def load_svd_basis(path: str | Path) -> np.ndarray:
    d = np.load(path)
    return (d["Bre"] + 1j * d["Bim"]).astype(np.complex64)
