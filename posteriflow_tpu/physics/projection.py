"""Project source-frame polarizations onto the detector network — pure JAX.

Replaces bilby's `ifo.get_detector_response` (reference:
src/ahsd/data/bilby_pipeline.py:242-247): antenna-pattern weighting plus a
frequency-domain time shift placing the merger at its in-window position

    τ_d = T/2 + t_off + Δt_d(ra, dec, t_gps),

where t_off is the geocent-time label (offset from GPS_REF, the window
center — reference convention: parameter_sampler.py:116-121) and Δt_d the
geocentric arrival delay. The shift is circular in time, exactly like the
reference's fixed-window FD generation.
"""

from __future__ import annotations

import jax.numpy as jnp

from posteriflow_tpu.physics.constants import DURATION, GPS_REF
from posteriflow_tpu.physics.detectors import (OMEGA_EARTH, gmst_from_gps,
                                               network_response)

# GMST at the canonical window center, precomputed host-side in float64
GMST_REF = gmst_from_gps(GPS_REF)


def project_to_network(freqs: jnp.ndarray, h_plus: jnp.ndarray,
                       h_cross: jnp.ndarray, ra, dec, psi, t_off,
                       gmst_ref: float = GMST_REF,
                       duration: float = DURATION) -> jnp.ndarray:
    """FD polarizations [F] -> per-detector FD strain [n_det, F] complex64.

    Scalar extrinsics (vmap for batches). The sidereal time is evaluated at
    the true event time: gmst_ref (host-precomputed float64, mod 2π) plus
    Earth-rotation-rate × t_off on device — float32-safe. RA enters only
    through gha = gmst − ra (the convention trap documented at reference
    dynesty_bridge.py:20-24)."""
    gmst = gmst_ref + OMEGA_EARTH * t_off
    f_plus, f_cross, dt = network_response(ra, dec, psi, gmst)   # each [n_det]

    h = (f_plus[:, None] * h_plus[None, :]
         + f_cross[:, None] * h_cross[None, :])                 # [n_det, F]

    tau = (duration / 2.0 + t_off + dt).astype(jnp.float32)     # [n_det]
    # e^{-2πifτ}: delay under the h(t)=∫h̃e^{+2πift}df convention. Computed
    # via mod-1 cycles to keep float32 phase error ≪ a radian at 2 kHz.
    cycles = jnp.mod(freqs[None, :] * tau[:, None], 1.0)
    shift = jnp.exp((-2j * jnp.pi) * cycles)
    return (h * shift).astype(jnp.complex64)
