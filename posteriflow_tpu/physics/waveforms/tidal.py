"""Matter effects: tidal phase + merger/disruption tapers, pure JAX.

Branchless per-event-type waveform dispatch. The reference selects a
different LAL approximant per event type — IMRPhenomXP (BBH),
IMRPhenomD_NRTidalv2 (BNS), IMRPhenomNSBH (reference:
src/ahsd/data/bilby_pipeline.py:42-47) — via Python string dispatch, which
on TPU would mean three compiled programs and `lax.cond` trees. This module
instead makes matter effects a SMOOTH FUNCTION OF THE SAMPLED MASSES, so a
single jitted code path serves all types:

  - each companion gets a tidal deformability Λ(m) from a representative
    EOS relation, identically ZERO for masses above the NS maximum
    (the prior's NS/BH mass boxes are disjoint at 2.5 vs 3.0 Msun —
    prior.py:34-37 — so the gate never sits on a boundary);
  - BBH events therefore get Λ₁=Λ₂=0 and this module reduces EXACTLY to
    the underlying point-particle PhenomD (zero extra phase, taper at
    infinity); BNS gets both-companion tidal phase + merger taper; NSBH
    gets secondary-only tidal phase + a tidal-disruption amplitude taper.

The tidal phase is the closed-form PN series in the effective deformability
Λ̃ (5PN −39/2·Λ̃·v¹⁰ and 6PN −3115/64·Λ̃·v¹² terms of the TaylorF2 phase;
Favata 2014 / Wade et al. 2014 convention — the terms every NRTidal-family
model reduces to at low frequency). The NR-calibrated Padé resummation of
NRTidalv2 proper is a few-percent refinement near merger; the framework's
self-consistency contract (train/inference/importance all use THIS
simulator — SURVEY.md §7 hard-part (a)) makes the PN form the honest
choice over transcribing coefficients not derivable from the papers here.

Reference behavior note: the reference never samples lambda_1/lambda_2, so
its bilby BNS calls run NRTidalv2 with λ=0 defaults — this module's mass-
keyed Λ gives the rebuild MORE tidal physics than the reference snapshot,
with measurable dephasing (tests/test_physics.py::test_tidal_dephasing).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from posteriflow_tpu.physics.constants import MTSUN_SI

# NS matter constants
NS_MAX_MASS = 3.0        # Λ(m)=0 above this (BH); prior NS boxes end at 2.5
LAMBDA_14 = 330.0        # Λ at 1.4 Msun (SLy/APR4-class EOS, GW170817-consistent)
LAMBDA_SLOPE = -6.0      # d lnΛ / d ln m (common-radius approximation,
                         # De et al. 2018)
LAMBDA_MAX = 5000.0      # prior-style cap (low-mass divergence guard)
K2_LOVE = 0.10           # representative quadrupole Love number for R(Λ)


def lambda_from_mass(m: jnp.ndarray) -> jnp.ndarray:
    """Representative EOS tidal deformability Λ(m); 0 for BH masses.

    Power-law in mass about Λ(1.4)=LAMBDA_14 — the "common radius"
    approximation Λ ∝ m⁻⁶ — hard-gated to zero above NS_MAX_MASS (the
    prior's NS/BH boxes are disjoint so the gate is never marginal)."""
    lam = LAMBDA_14 * (m / 1.4) ** LAMBDA_SLOPE
    lam = jnp.clip(lam, 0.0, LAMBDA_MAX)
    return jnp.where(m < NS_MAX_MASS, lam, 0.0)


def effective_lambda(m1, m2, lambda1, lambda2):
    """Λ̃ — the combination the phase measures at leading order
    (Wade et al. 2014 Eq. 5, mass-explicit form)."""
    mt = m1 + m2
    return (16.0 / 13.0) * ((m1 + 12.0 * m2) * m1 ** 4 * lambda1
                            + (m2 + 12.0 * m1) * m2 ** 4 * lambda2) / mt ** 5


def tidal_phase(freqs: jnp.ndarray, m1, m2, lambda1, lambda2) -> jnp.ndarray:
    """Tidal GW phase correction ψ_T(f) [rad], to ADD to the point-particle
    TaylorF2/PhenomD phase Ψ. 5PN + 6PN Λ̃ terms:

        Ψ ⊃ 3/(128 η v⁵) · [ −(39/2) Λ̃ v¹⁰ − (3115/64) Λ̃ v¹² ]

    (the δΛ̃ 6PN piece is dropped, standard practice — it is ~Λ̃/100 for
    the mass ratios in band). Identically zero when both Λs are zero."""
    m = (m1 + m2) * MTSUN_SI
    eta = (m1 * m2) / (m1 + m2) ** 2
    lam_t = effective_lambda(m1, m2, lambda1, lambda2)
    f = jnp.maximum(freqs, 1.0)
    v = jnp.cbrt(jnp.pi * m * f)        # cbrt, not pow (TPU VPU cost)
    v2 = v * v
    v5 = v2 * v2 * v
    v7 = v5 * v2
    return -(3.0 / (128.0 * eta)) * lam_t * (
        (39.0 / 2.0) * v5 + (3115.0 / 64.0) * v7)


def ns_radius_sec(m, lam):
    """NS radius in SECONDS (geometric), from Λ = (2/3) k₂ (R/Gm)⁵ with a
    representative k₂: R = Gm/c² · (3Λ / 2k₂)^{1/5}. Λ=0 → R=0."""
    return m * MTSUN_SI * (1.5 * lam / K2_LOVE) ** 0.2


def bns_merger_frequency(m1, m2, lambda1, lambda2) -> jnp.ndarray:
    """Contact-frequency estimate of the BNS merger GW frequency [Hz]:
    f_GW = (1/π)·√(M/d³) with d = R₁+R₂ (geometric units). For Λ→0 the
    radii vanish and f → ∞ (no taper — the BBH limit)."""
    m = (m1 + m2) * MTSUN_SI
    d = ns_radius_sec(m1, lambda1) + ns_radius_sec(m2, lambda2)
    d = jnp.maximum(d, 1e-12)
    f = jnp.sqrt(m / d ** 3) / math.pi
    # Λ=0 ⇒ d=2e-12 ⇒ f astronomically large; cap to keep f32-finite
    return jnp.minimum(f, 1e9)


def nsbh_disruption_frequency(m_bh, m_ns, lambda_ns) -> jnp.ndarray:
    """Tidal-disruption GW frequency estimate [Hz] for an NSBH: the orbital
    separation where the BH's tide unbinds the NS, d_td ≈ R_ns·(M_bh/M_ns)^⅓
    (Newtonian Roche scaling), converted to GW frequency via Kepler.
    Exceeds the ringdown frequency for high mass ratio / compact NS — then
    the min() in nsbh-style tapering leaves the BBH waveform untouched."""
    m = (m_bh + m_ns) * MTSUN_SI
    r_ns = ns_radius_sec(m_ns, lambda_ns)
    d = jnp.maximum(r_ns * (m_bh / jnp.maximum(m_ns, 0.1)) ** (1.0 / 3.0),
                    1e-12)
    return jnp.minimum(jnp.sqrt(m / d ** 3) / math.pi, 1e9)


def merger_taper(freqs: jnp.ndarray, f_end, rolloff: float = 0.12):
    """Smooth amplitude rolloff beyond f_end: sigmoid in log-frequency with
    fractional width `rolloff` (≈ a Planck taper without the branch
    structure). ≡1 well below f_end; for f_end ≥ Nyquist it is 1 in band."""
    f = jnp.maximum(freqs, 1.0)
    x = jnp.log(f / jnp.maximum(f_end, 1.0)) / rolloff
    return 1.0 / (1.0 + jnp.exp(jnp.clip(x, -30.0, 30.0)))


def matter_effects(freqs: jnp.ndarray, m1, m2):
    """(ψ_T [F], taper [F]) for a binary with masses m1 ≥ m2 [Msun] —
    the single branchless dispatch point:

      BBH  : Λ₁=Λ₂=0  → ψ_T ≡ 0, taper ≡ 1        (exact PhenomD)
      BNS  : both Λ>0 → tidal phase + contact-frequency merger taper
      NSBH : Λ₂>0 only → secondary tidal phase + disruption taper

    The effective cutoff is min(f_merger, f_disrupt); whichever companion
    structure is absent pushes its frequency to ~1e9 Hz (no-op).
    """
    lam1 = lambda_from_mass(m1)
    lam2 = lambda_from_mass(m2)
    psi_t = tidal_phase(freqs, m1, m2, lam1, lam2)

    f_merg = bns_merger_frequency(m1, m2, lam1, lam2)
    # NSBH regime: lam1 == 0, lam2 > 0. bns_merger_frequency already
    # degrades gracefully there (d = R_ns), but the Roche scaling is the
    # physical estimate — take the smaller of the two cutoffs.
    f_disr = nsbh_disruption_frequency(m1, m2, lam2)
    f_end = jnp.minimum(f_merg, f_disr)
    return psi_t, merger_taper(freqs, f_end)


def phenomd_matter_amp_phase(freqs: jnp.ndarray, mass_1, mass_2, chi_1,
                             chi_2, luminosity_distance, phase_c,
                             f_lower: float = 20.0):
    """(amp, psi) of PhenomD × matter effects: the tidal phase ADDS to the
    point-particle phase and the taper MULTIPLIES the amplitude BEFORE the
    single e^{-iΨ} is formed — no second complex exponential per bin."""
    from posteriflow_tpu.physics.waveforms.phenomd import phenomd_amp_phase
    amp, psi = phenomd_amp_phase(freqs, mass_1, mass_2, chi_1, chi_2,
                                 luminosity_distance, phase_c, f_lower)
    psi_t, taper = matter_effects(freqs, mass_1, mass_2)
    return amp * taper, psi + psi_t


def phenomd_matter_polarizations(freqs: jnp.ndarray, mass_1, mass_2, chi_1,
                                 chi_2, luminosity_distance, theta_jn,
                                 phase_c, f_lower: float = 20.0):
    """PhenomD × matter effects — the production auto-dispatch approximant
    (standard approximant signature; waveforms/__init__.py registry).
    BBH limit (Λ=0): tidal phase ≡ 0, taper ≡ 1 — exact PhenomD."""
    amp, psi = phenomd_matter_amp_phase(freqs, mass_1, mass_2, chi_1,
                                        chi_2, luminosity_distance,
                                        phase_c, f_lower)
    ci = jnp.cos(theta_jn)
    e = jnp.exp(-1j * psi.astype(jnp.float32))
    h_plus = (amp * 0.5 * (1.0 + ci * ci)) * e
    h_cross = (amp * ci) * (1j * e)
    return h_plus.astype(jnp.complex64), h_cross.astype(jnp.complex64)
