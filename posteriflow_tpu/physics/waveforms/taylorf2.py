"""TaylorF2: 3.5PN stationary-phase-approximation inspiral waveform, pure JAX.

Replaces the LALSuite C approximants the reference reaches through bilby
(reference: src/ahsd/data/bilby_pipeline.py:205-247) for the inspiral part.
Closed-form, fully differentiable, vmappable over parameter batches.

Conventions:
  - continuous-FT units, h̃(f) in strain/Hz, evaluated on the rfft grid of
    the 4 s / 4096 Hz window (df = 0.25 Hz);
  - coalescence at t = 0 of the FFT epoch; callers place the merger inside
    the data window with a frequency-domain time shift (circular in time,
    matching the reference's fixed-window bilby generation);
  - h̃₊(f) = A(f) (1+cos²ι)/2 e^{-iΨ(f)}, h̃ₓ(f) = i A(f) cosι e^{-iΨ(f)},
    with Ψ = 2πf t_c − 2φ_c − π/4 + (3/128ηv⁵)Σφₖvᵏ, which together with the
    numpy irfft sign convention (h(t) = Σ h̃ e^{+2πift}) yields an
    increasing-frequency chirp terminating at t_c.

Phase: complete non-spinning 3.5PN series plus the dominant aligned-spin
terms (1.5PN spin-orbit β, 2PN spin-spin σ, 2.5PN spin-orbit γ). Amplitude:
leading (Newtonian) order. Higher-order amplitude/spin corrections are a
waveform-family refinement, not a framework feature; the NPE trains and
evaluates against this same simulator (self-consistency is the contract —
see SURVEY.md §7 hard-parts note (a)).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from posteriflow_tpu.physics.constants import (C_SI, EULER_GAMMA, MPC_SI,
                                               MTSUN_SI, STRAIN_SCALE)


def isco_frequency(total_mass_msun: jnp.ndarray) -> jnp.ndarray:
    """Schwarzschild ISCO GW frequency [Hz]: f = 1/(6^{3/2} π M_sec)."""
    m_sec = total_mass_msun * MTSUN_SI
    return 1.0 / (6.0 ** 1.5 * math.pi * m_sec)


def taylorf2_amp_phase(freqs: jnp.ndarray, mass_1, mass_2, chi_1, chi_2,
                       luminosity_distance, phase_c, f_lower: float = 20.0):
    """Amplitude A(f) [strain/Hz] and phase Ψ(f) [rad] of the SPA inspiral.

    freqs [F]; scalars for the intrinsic parameters (vmap for batches).
    Returns (amp [F], psi [F]); amp is zeroed below f_lower (band edge) —
    the high-frequency cutoff is applied by the caller (ISCO for bare
    TaylorF2, the ringdown stitch for the IMR extension).
    """
    m1 = mass_1 * MTSUN_SI
    m2 = mass_2 * MTSUN_SI
    m = m1 + m2
    eta = (m1 * m2) / (m * m)
    delta = (m1 - m2) / m
    chi_s = 0.5 * (chi_1 + chi_2)
    chi_a = 0.5 * (chi_1 - chi_2)
    mc = m * eta ** 0.6

    f = jnp.maximum(freqs, 1.0)          # avoid 0^negative at DC; masked below
    # cbrt instead of pow (pow = exp·log on the VPU; this file runs per
    # (signal, bin) — the train step's hottest transcendental site,
    # reports/sim_profile.json); every other fractional power below is
    # derived from v by multiplication/sqrt
    v = jnp.cbrt(jnp.pi * m * f)
    v2, v3 = v * v, v * v * v
    v4, v5, v6 = v2 * v2, v2 * v3, v3 * v3
    v7 = v3 * v4
    logv = jnp.log(v)

    # ── non-spinning 3.5PN phase coefficients ─────────────────────────────────
    p0 = 1.0
    p2 = 3715.0 / 756.0 + 55.0 * eta / 9.0
    p3_ns = -16.0 * math.pi
    p4_ns = 15293365.0 / 508032.0 + 27145.0 * eta / 504.0 + 3085.0 * eta ** 2 / 72.0
    p5_const_ns = math.pi * (38645.0 / 756.0 - 65.0 * eta / 9.0)
    p6 = (11583231236531.0 / 4694215680.0 - 640.0 * math.pi ** 2 / 3.0
          - 6848.0 * EULER_GAMMA / 21.0
          + eta * (-15737765635.0 / 3048192.0 + 2255.0 * math.pi ** 2 / 12.0)
          + eta ** 2 * 76055.0 / 1728.0 - eta ** 3 * 127825.0 / 1296.0
          - 6848.0 / 21.0 * math.log(4.0))
    p6_log = -6848.0 / 21.0
    p7 = math.pi * (77096675.0 / 254016.0 + 378515.0 * eta / 1512.0
                    - 74045.0 * eta ** 2 / 756.0)

    # ── dominant aligned-spin terms ───────────────────────────────────────────
    # 1.5PN spin-orbit β, 2PN spin-spin σ (enters as −10σ·v⁴), 2.5PN
    # spin-orbit γ (enters with −γ alongside the 2.5PN log structure).
    beta = (113.0 / 3.0) * (chi_s + delta * chi_a) - (76.0 / 3.0) * eta * chi_s
    sigma = (-(721.0 / 48.0) * eta * (chi_s ** 2 - chi_a ** 2)
             + (719.0 / 96.0) * ((chi_s ** 2 + chi_a ** 2)
                                 + 2.0 * delta * chi_s * chi_a
                                 - 2.0 * eta * (chi_s ** 2 - chi_a ** 2)))
    gamma = ((732985.0 / 2268.0 - 24260.0 * eta / 81.0
              - 340.0 * eta ** 2 / 9.0) * chi_s
             + (732985.0 / 2268.0 - 140.0 * eta / 9.0) * delta * chi_a)

    p3 = p3_ns + beta
    p4 = p4_ns - 10.0 * sigma
    p5_const = p5_const_ns - gamma

    series = (p0
              + p2 * v2
              + p3 * v3
              + p4 * v4
              + p5_const * (1.0 + 3.0 * logv) * v5
              + (p6 + p6_log * logv) * v6
              + p7 * v7)
    psi = (3.0 / (128.0 * eta * v5)) * series - 2.0 * phase_c - math.pi / 4.0

    # ── Newtonian amplitude (SCALED strain units — constants.STRAIN_SCALE) ───
    # f^(-7/6) from the already-computed v: f = v³/(πm), so
    # f^(7/6) = v^3.5/(πm)^(7/6) and v^3.5 = v³·√v (one sqrt, no pow)
    d = luminosity_distance * MPC_SI
    k = (math.sqrt(5.0 / 24.0) * math.pi ** (-2.0 / 3.0) * STRAIN_SCALE
         * C_SI) * mc ** (5.0 / 6.0) * (jnp.pi * m) ** (7.0 / 6.0) / d
    amp = k / (v3 * jnp.sqrt(v))
    amp = jnp.where(freqs >= f_lower, amp, 0.0)
    return amp, psi


def taylorf2_polarizations(freqs: jnp.ndarray, mass_1, mass_2, chi_1, chi_2,
                           luminosity_distance, theta_jn, phase_c,
                           f_lower: float = 20.0):
    """(h̃₊ [F], h̃ₓ [F]) complex64, coalescence at t=0, cut at ISCO."""
    amp, psi = taylorf2_amp_phase(freqs, mass_1, mass_2, chi_1, chi_2,
                                  luminosity_distance, phase_c, f_lower)
    f_isco = isco_frequency(mass_1 + mass_2)
    amp = jnp.where(freqs <= f_isco, amp, 0.0)
    ci = jnp.cos(theta_jn)
    e = jnp.exp(-1j * psi.astype(jnp.float32))
    h_plus = (amp * 0.5 * (1.0 + ci * ci)) * e
    h_cross = (amp * ci) * (1j * e)
    return h_plus.astype(jnp.complex64), h_cross.astype(jnp.complex64)
