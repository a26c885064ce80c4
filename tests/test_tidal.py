"""Matter-effects (tidal/NSBH) waveform tests — the per-event-type physics
the reference reaches via approximant dispatch (bilby_pipeline.py:42-47),
here a branchless function of the sampled masses (physics/waveforms/tidal.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from posteriflow_tpu.physics import constants as C
from posteriflow_tpu.physics.waveforms import (phenomd_matter_polarizations,
                                               phenomd_polarizations)
from posteriflow_tpu.physics.waveforms.tidal import (bns_merger_frequency,
                                                     effective_lambda,
                                                     lambda_from_mass,
                                                     matter_effects,
                                                     tidal_phase)

FREQS = jnp.asarray(C.FREQS, dtype=jnp.float32)


def test_lambda_mass_gate():
    m = jnp.asarray([1.0, 1.4, 2.0, 2.5, 3.0, 5.0, 30.0])
    lam = np.asarray(lambda_from_mass(m))
    assert lam[1] == np.float32(330.0)              # anchor at 1.4
    assert np.all(lam[:4] > 0) and np.all(np.diff(lam[:4]) < 0)  # falls w/ m
    assert np.all(lam[4:] == 0.0)                   # BH masses exactly 0
    assert lam[0] <= 5000.0                         # cap


def test_bbh_limit_bit_exact():
    """Λ=0 ⇒ matter wrapper must reproduce point-particle PhenomD exactly."""
    args = (FREQS, 36.0, 29.0, 0.3, -0.1, 410.0, 0.7, 1.2)
    hp0, hc0 = jax.jit(phenomd_polarizations)(*args)
    hp1, hc1 = jax.jit(phenomd_matter_polarizations)(*args)
    np.testing.assert_array_equal(np.asarray(hp0), np.asarray(hp1))
    np.testing.assert_array_equal(np.asarray(hc0), np.asarray(hc1))


def test_tidal_dephasing_measurable():
    """BNS tidal phase vs λ=0: several radians by 1 kHz (VERDICT r2 item 2:
    'a BNS-band injection shows measurable tidal dephasing vs λ=0')."""
    lam = lambda_from_mass(jnp.asarray(1.4))
    psi = tidal_phase(FREQS, 1.4, 1.4, lam, lam)
    i1000 = int(1000.0 / C.DELTA_F)
    assert abs(float(psi[i1000])) > 2.0             # radians at 1 kHz
    # monotone-growing magnitude with frequency, zero sign flips
    band = np.asarray(psi[int(30 / C.DELTA_F):i1000])
    assert np.all(np.diff(-band) > 0)
    # and ψ_T == 0 identically for a BBH
    psi_bbh = tidal_phase(FREQS, 36.0, 29.0, 0.0, 0.0)
    assert float(jnp.max(jnp.abs(psi_bbh))) == 0.0


def test_effective_lambda_equal_mass():
    """Equal masses, equal Λ ⇒ Λ̃ = Λ (Wade et al. normalization)."""
    lt = float(effective_lambda(1.4, 1.4, 400.0, 400.0))
    assert abs(lt - 400.0) < 1e-3


def test_bns_merger_taper_in_band():
    """1.4+1.4 BNS merger estimate lands in the astrophysical 1-2.5 kHz
    range and the amplitude rolls off there; a BBH is untapered in band."""
    lam = lambda_from_mass(jnp.asarray(1.4))
    f_m = float(bns_merger_frequency(1.4, 1.4, lam, lam))
    assert 1000.0 < f_m < 2500.0
    _, taper = matter_effects(FREQS, 1.4, 1.4)
    i_low = int(300 / C.DELTA_F)
    assert float(taper[i_low]) > 0.99               # untouched inspiral
    assert float(taper[-1]) < 0.6                   # rolled off at Nyquist
    _, taper_bbh = matter_effects(FREQS, 36.0, 29.0)
    assert float(jnp.min(taper_bbh)) > 0.999999     # BBH: no taper anywhere


def test_nsbh_secondary_only():
    """NSBH (m1=10 BH, m2=1.4 NS): tidal phase present but much smaller
    than the BNS case (Λ̃ suppressed by the mass ratio), primary Λ=0."""
    psi_t, taper = matter_effects(FREQS, 10.0, 1.4)
    lam = lambda_from_mass(jnp.asarray(1.4))
    psi_bns = tidal_phase(FREQS, 1.4, 1.4, lam, lam)
    i800 = int(800 / C.DELTA_F)
    assert 0.0 < abs(float(psi_t[i800])) < 0.2 * abs(float(psi_bns[i800]))
    # heavy NSBH: disruption above band, in-band amplitude survives
    assert float(taper[int(1000 / C.DELTA_F)]) > 0.95


def test_matter_waveform_finite_and_differentiable():
    def snr_like(m2):
        hp, _ = phenomd_matter_polarizations(FREQS, 1.6, m2, 0.0, 0.0,
                                             100.0, 0.5, 0.0)
        return jnp.sum(jnp.abs(hp) ** 2)

    g = jax.grad(snr_like)(jnp.asarray(1.4))
    assert np.isfinite(float(g)) and float(g) != 0.0
