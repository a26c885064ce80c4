"""Precessing twist-up tests (physics/waveforms/precession.py).

The reference names IMRPhenomXP but zeroes every tilt
(reference: src/ahsd/data/bilby_pipeline.py:42-47 + 63-65); this module is
the rebuild's genuine precession capability, so the tests pin the physics
the construction must satisfy: exact aligned-limit reduction, rotation
unitarity (power conservation across the m-modes), the precession cone
opening with frequency, and actual amplitude modulation at chi_p > 0.
"""

import jax
import jax.numpy as jnp
import numpy as np

from posteriflow_tpu.physics import constants as C
from posteriflow_tpu.physics.waveforms import (phenomd_matter_polarizations,
                                               phenomp_polarizations)
from posteriflow_tpu.physics.waveforms.precession import (precession_angles,
                                                          wigner_d2_col2)

FREQS = jnp.asarray(C.FREQS, dtype=jnp.float32)
ARGS = (36.0, 29.0, 0.3, -0.1, 410.0, 0.7, 1.2)   # m1 m2 chi1 chi2 dL θ φc


def test_aligned_limit_reduces_to_phenomd_matter():
    """chi_p = 0: β ≡ 0, ε ≡ α — the twist cancels to f32 roundoff."""
    hp0, hc0 = jax.jit(phenomd_matter_polarizations)(FREQS, *ARGS)
    hp1, hc1 = jax.jit(phenomp_polarizations)(FREQS, *ARGS, chi_p=0.0)
    scale = float(jnp.max(jnp.abs(hp0)))
    np.testing.assert_allclose(np.asarray(hp1), np.asarray(hp0),
                               atol=2e-5 * scale)
    np.testing.assert_allclose(np.asarray(hc1), np.asarray(hc0),
                               atol=2e-5 * scale)


def test_wigner_column_unitary():
    """Σ_m d²_{m,2}(β)² = 1 for any β — the twist conserves mode power."""
    cb = jnp.linspace(-1.0, 1.0, 41)
    d = wigner_d2_col2(cb)
    total = sum(np.asarray(x, dtype=np.float64) ** 2 for x in d)
    np.testing.assert_allclose(total, 1.0, atol=1e-6)


def test_cone_opens_with_frequency():
    """L = ηM²/v shrinks as f grows ⇒ cos β must fall monotonically in
    band (S held fixed at leading order)."""
    cb, alpha, eps = precession_angles(FREQS, 36.0, 29.0, 0.3, -0.1,
                                       chi_p=0.6)
    band = np.asarray(FREQS) >= 20.0
    cbv = np.asarray(cb)[band]
    assert np.all(np.diff(cbv) <= 1e-7)
    assert 0.0 < cbv[-1] < cbv[0] < 1.0


def test_alpha_accumulates_many_cycles():
    """A 36+29 BBH from 20 Hz accumulates O(1) precession cycles (heavy
    binaries precess slowly); α must be monotone-increasing and reach at
    least one full cycle by merger."""
    _, alpha, eps = precession_angles(FREQS, 36.0, 29.0, 0.3, -0.1,
                                      chi_p=0.6)
    a = np.asarray(alpha)
    assert np.all(np.diff(a) >= 0.0)
    assert a[-1] > 2.0 * np.pi
    # ε tracks α scaled by cos β < 1
    assert 0.0 < float(eps[-1]) < a[-1]


def test_chi_p_modulates_amplitude():
    """chi_p > 0 must imprint sideband modulation: the |h̃₊| ratio to the
    aligned waveform varies across the band (not a constant rescale)."""
    hp0, _ = jax.jit(phenomd_matter_polarizations)(FREQS, *ARGS)
    hp1, hc1 = jax.jit(phenomp_polarizations)(FREQS, *ARGS, chi_p=0.6)
    band = (np.asarray(FREQS) >= 25.0) & (np.asarray(FREQS) <= 220.0)
    r = np.abs(np.asarray(hp1))[band] / np.abs(np.asarray(hp0))[band]
    assert r.std() > 0.02 * r.mean()
    # and the twisted waveform remains finite/nonzero
    assert np.all(np.isfinite(np.asarray(hp1)))
    assert float(jnp.max(jnp.abs(hc1))) > 0.0


def test_total_polarization_power_preserved_face_on():
    """Face-on (θ_JN = 0): the aligned waveform puts all power in m = 2;
    the twist redistributes across m but the band-integrated |h₊|² + |h×|²
    must stay within a few % (leading-order twist conserves the (2,|2|)
    power budget; inclination-averaged exactness is the unitarity test)."""
    args = (36.0, 29.0, 0.3, -0.1, 410.0, 0.0, 1.2)
    hp0, hc0 = jax.jit(phenomd_matter_polarizations)(FREQS, *args)
    hp1, hc1 = jax.jit(phenomp_polarizations)(FREQS, *args, chi_p=0.4)
    p0 = float(jnp.sum(jnp.abs(hp0) ** 2 + jnp.abs(hc0) ** 2))
    p1 = float(jnp.sum(jnp.abs(hp1) ** 2 + jnp.abs(hc1) ** 2))
    assert 0.5 * p0 < p1 <= 1.05 * p0   # power moves to |m|<2, some off-axis


def test_general_projection_matches_fused_kernel_at_chi_p_zero():
    """precessing_signal_white_fd(chi_p=0) must reproduce the simulator's
    fused aligned projection (signal_white_fd) — same waveform, same
    antenna response, same time shift, same whitening normalization."""
    from posteriflow_tpu.physics.psd import default_network_asd
    from posteriflow_tpu.physics.simulator import signal_white_fd
    from posteriflow_tpu.physics.waveforms.precession import \
        precessing_signal_white_fd

    asd = default_network_asd()
    theta = jnp.asarray([36.0, 29.0, 410.0, 1.1, -0.4, 0.7, 0.9, 1.2,
                         0.05, 0.3, -0.1], dtype=jnp.float32)
    h0 = jax.jit(lambda t: signal_white_fd(t, asd))(theta)
    h1 = jax.jit(lambda t: precessing_signal_white_fd(t, 0.0, asd))(theta)
    scale = float(jnp.max(jnp.abs(h0)))
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h0),
                               atol=3e-5 * scale)


def test_registry_entry():
    from posteriflow_tpu.physics.waveforms import APPROXIMANTS
    fn = APPROXIMANTS["IMRPhenomP_Matter"]
    hp, hc = jax.jit(fn)(FREQS, *ARGS)
    hp0, _ = jax.jit(phenomd_matter_polarizations)(FREQS, *ARGS)
    scale = float(jnp.max(jnp.abs(hp0)))
    np.testing.assert_allclose(np.asarray(hp), np.asarray(hp0),
                               atol=2e-5 * scale)
