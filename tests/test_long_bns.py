"""Long-BNS sequence-parallel encoder: multibanding + sharded-vs-unsharded
exactness on the 8-device CPU mesh (BASELINE configs[3])."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from posteriflow_tpu.models.long_bns import (LongBNSEncoder,
                                             make_sharded_encoder,
                                             multiband_tokens)
from posteriflow_tpu.models.encoder import sinusoidal_positions
from posteriflow_tpu.parallel.mesh import make_mesh

SEQ = 256
FEAT = 6
CFG = dict(d_model=32, n_layers=2, n_heads=4, context_dim=16)


def test_multiband_tokens_shapes():
    freqs = np.fft.rfftfreq(16384, 1.0 / 4096)
    h = jnp.ones((2, 3, len(freqs)), dtype=jnp.complex64)
    tok = multiband_tokens(h, freqs, n_bands=16, per_band=8)
    assert tok.shape == (2, 16 * 8, 6)       # 3 det × (re, im)
    assert np.isfinite(np.asarray(tok)).all()


def test_multiband_preserves_band_energy_ordering():
    """A signal confined to low frequencies must light up early tokens."""
    freqs = np.fft.rfftfreq(16384, 1.0 / 4096)
    h = jnp.zeros((1, 3, len(freqs)), dtype=jnp.complex64)
    low = (freqs >= 20) & (freqs < 40)
    h = h.at[:, :, np.where(low)[0]].set(1.0 + 0.0j)
    tok = np.asarray(multiband_tokens(h, freqs, n_bands=16, per_band=8))
    energy = (tok ** 2).sum(axis=-1)[0]
    assert energy[:16].sum() > 10 * energy[64:].sum()


def test_sharded_matches_unsharded():
    mesh = make_mesh(8, model_parallel=4)    # 2 data × 4 model
    init_fn, apply_fn, apply_ref = make_sharded_encoder(mesh, SEQ, FEAT,
                                                        CFG)
    tokens = jax.random.normal(jax.random.PRNGKey(0), (4, SEQ, FEAT))
    params = init_fn(jax.random.PRNGKey(1), tokens[0])
    out_ref = apply_ref(params, tokens)
    out_sharded = apply_fn(params, tokens)
    assert out_ref.shape == (4, 16)
    np.testing.assert_allclose(np.asarray(out_sharded),
                               np.asarray(out_ref), atol=2e-4)


def test_unsharded_module_standalone():
    enc = LongBNSEncoder(seq_axis=None, **CFG)
    tokens = jax.random.normal(jax.random.PRNGKey(2), (SEQ, FEAT))
    pos = sinusoidal_positions(SEQ, CFG["d_model"])
    params = enc.init(jax.random.PRNGKey(3), tokens, pos)
    out = enc.apply(params, tokens, pos)
    assert out.shape == (16,)
    assert np.isfinite(np.asarray(out)).all()


def test_simulate_long_bns_and_train_step():
    """FD-only long-BNS batch + one NPE training step (configs[3] e2e)."""
    import optax
    from posteriflow_tpu.models.long_bns import (LongBNSNPE,
                                                 simulate_long_bns_batch)

    sim = jax.jit(lambda k: simulate_long_bns_batch(
        k, 4, duration=16.0, n_bands=16, per_band=8))
    tokens, theta = sim(jax.random.PRNGKey(0))
    assert tokens.shape == (4, 128, 6)
    assert np.isfinite(np.asarray(tokens)).all()
    t = np.asarray(theta)
    assert (t[:, 0] <= 2.5 + 1e-5).all()        # BNS masses
    # tokens carry non-degenerate content (mean-pooling shrinks the noise
    # std by sqrt(bins-per-coefficient), so O(0.1) is expected)
    assert np.asarray(tokens).std() > 0.05

    model = LongBNSNPE(enc=dict(d_model=32, n_layers=1, n_heads=4,
                                context_dim=16),
                       flow_layers=2, flow_hidden=32, flow_bins=4)
    params = model.init(jax.random.PRNGKey(1), tokens, theta)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        tok, th = simulate_long_bns_batch(key, 4, duration=16.0,
                                          n_bands=16, per_band=8)
        loss, g = jax.value_and_grad(
            lambda p: model.apply(p, tok, th))(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    losses = []
    for i in range(4):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(2 + i))
        losses.append(float(loss))
    assert all(np.isfinite(losses)), losses


def test_sharded_nll_and_grads_match_unsharded():
    """The sequence-parallel TRAINING loss (make_sharded_nll) and its
    gradients match the plain LongBNSNPE loss on a 4-device CPU mesh —
    the exactness contract behind training configs[3] through the
    sharded path (VERDICT r3 weak-#5: the v1 run never exercised it)."""
    from jax.sharding import Mesh
    from posteriflow_tpu.models.long_bns import (LongBNSNPE,
                                                 make_sharded_nll,
                                                 simulate_long_bns_batch)

    tokens, theta = jax.jit(lambda k: simulate_long_bns_batch(
        k, 4, duration=16.0, n_bands=16, per_band=8))(jax.random.PRNGKey(0))
    model = LongBNSNPE(enc=dict(d_model=32, n_layers=1, n_heads=4,
                                context_dim=16),
                       flow_layers=2, flow_hidden=32, flow_bins=4)
    params = model.init(jax.random.PRNGKey(1), tokens, theta)

    devices = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devices, ("data", "model"))
    loss_sh = make_sharded_nll(mesh, tokens.shape[1], model)

    l0, g0 = jax.value_and_grad(lambda p: model.apply(p, tokens, theta))(
        params)
    l1, g1 = jax.value_and_grad(lambda p: loss_sh(p, tokens, theta))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-5)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    assert len(flat0) == len(flat1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


# ── v3 chirp-adapted heterodyned front-end ───────────────────────────────────

def _small_grid(**kw):
    from posteriflow_tpu.models.long_bns import build_chirp_token_grid
    cfg = dict(duration=16.0, f_hi=256.0, pad_multiple=32)
    cfg.update(kw)
    return build_chirp_token_grid(**cfg)


def test_chirp_tokens_pooling_exactness():
    """cumsum+gather segment pooling == brute-force per-segment means."""
    from posteriflow_tpu.models.long_bns import chirp_tokens

    grid = _small_grid()
    rng = np.random.default_rng(0)
    n = grid["cut"]
    h = (rng.normal(size=(3, n)) + 1j * rng.normal(size=(3, n))
         ).astype(np.complex64)
    tok = np.asarray(chirp_tokens(jnp.asarray(h), grid))
    assert tok.shape == (grid["L"], 11)
    assert np.isfinite(tok).all()

    x = h[:, grid["i_lo"]:] * grid["het"][None, :]
    for t in [0, 1, grid["n_tok"] // 2, grid["n_tok"] - 1]:
        s, e = grid["starts"][t], grid["ends"][t]
        k = float(grid["counts"][t])
        ref = x[:, s:e].sum(axis=1) / np.sqrt(2.0 * k)
        np.testing.assert_allclose(tok[t, :3], ref.real, atol=1e-3)
        np.testing.assert_allclose(tok[t, 3:6], ref.imag, atol=1e-3)
        ref_e = ((np.abs(x[:, s:e]) ** 2).sum(axis=1) - 2 * k) / (
            2 * np.sqrt(k))
        np.testing.assert_allclose(tok[t, 6:9], ref_e, atol=2e-3)


def test_chirp_tokens_snr_retention():
    """The v3 front-end keeps >=80% of SNR^2 at the prior corners (the v1
    mean-pool front-end measured ~13% — the v2 conditioning failure)."""
    from posteriflow_tpu.models.long_bns import (build_chirp_token_grid,
                                                 chirp_tokens)
    from posteriflow_tpu.physics.psd import default_network_psd
    from posteriflow_tpu.physics.projection import project_to_network
    from posteriflow_tpu.physics.waveforms.taylorf2 import \
        taylorf2_polarizations
    from posteriflow_tpu.physics.whiten import whiten_fd

    grid = build_chirp_token_grid(duration=32.0, f_hi=256.0)
    freqs = jnp.asarray(grid["freqs"], jnp.float32)
    psd = default_network_psd(grid["freqs"])
    asd = jnp.asarray(np.sqrt(psd) * 1e23, jnp.float32)

    @jax.jit
    def sig_tok(m, t_off):
        hp, hc = taylorf2_polarizations(freqs, m, m, 0.0, 0.0, 100.0,
                                        0.5, 1.0)
        h_det = project_to_network(freqs, hp, hc, 1.0, 0.3, 0.7, t_off,
                                   duration=grid["duration"])
        h_w = whiten_fd(h_det, asd, 1.0 / grid["duration"])
        return h_w, chirp_tokens(h_w, grid)

    for m, t_off in [(1.4, 0.0), (1.0, -1.5), (2.5, 1.5)]:
        h_w, tok = sig_tok(m, t_off)
        hb = np.asarray(h_w)[:, grid["i_lo"]:]
        rho2 = float((np.abs(hb) ** 2).sum() / 2.0)
        c = np.asarray(tok[:, :3]) + 1j * np.asarray(tok[:, 3:6])
        retained = float((np.abs(c) ** 2).sum()) / rho2
        assert retained > 0.80, (m, t_off, retained)


def test_simulate_v3_and_train_step():
    """v3 batch synthesis + one training step with the patched encoder."""
    import optax
    from posteriflow_tpu.models.long_bns import (LongBNSNPE,
                                                 simulate_long_bns_batch_v3)

    grid = _small_grid()
    sim = jax.jit(lambda k: simulate_long_bns_batch_v3(k, 4, grid))
    tokens, theta = sim(jax.random.PRNGKey(0))
    assert tokens.shape == (4, grid["L"], 11)
    assert np.isfinite(np.asarray(tokens)).all()
    assert (np.asarray(theta)[:, 0] <= 2.5 + 1e-5).all()

    model = LongBNSNPE(enc=dict(d_model=32, n_layers=1, n_heads=4,
                                context_dim=16, patch=4),
                       flow_layers=2, flow_hidden=32, flow_bins=4)
    params = model.init(jax.random.PRNGKey(1), tokens, theta)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        tok, th = simulate_long_bns_batch_v3(key, 4, grid)
        loss, g = jax.value_and_grad(
            lambda p: model.apply(p, tok, th))(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    for i in range(2):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(2 + i))
        assert np.isfinite(float(loss))
    draws = model.apply(params, jax.random.PRNGKey(9), tokens, 8,
                        method=LongBNSNPE.sample)
    assert draws.shape == (4, 8, 11)


def test_sharded_patch_encoder_matches_unsharded():
    """Patch embedding stays EXACT under sequence parallelism (the design
    reason for non-overlapping patches: no halo exchange)."""
    mesh = make_mesh(8, model_parallel=4)
    cfg = dict(d_model=32, n_layers=2, n_heads=4, context_dim=16, patch=4)
    init_fn, apply_fn, apply_ref = make_sharded_encoder(mesh, SEQ, 11, cfg)
    tokens = jax.random.normal(jax.random.PRNGKey(0), (4, SEQ, 11))
    params = init_fn(jax.random.PRNGKey(1), tokens[0])
    np.testing.assert_allclose(np.asarray(apply_fn(params, tokens)),
                               np.asarray(apply_ref(params, tokens)),
                               atol=2e-4)


def test_sharded_nll_matches_with_patch():
    from posteriflow_tpu.models.long_bns import (LongBNSNPE,
                                                 make_sharded_nll,
                                                 simulate_long_bns_batch_v3)

    grid = _small_grid()
    tokens, theta = jax.jit(lambda k: simulate_long_bns_batch_v3(
        k, 4, grid))(jax.random.PRNGKey(0))
    model = LongBNSNPE(enc=dict(d_model=32, n_layers=1, n_heads=4,
                                context_dim=16, patch=4),
                       flow_layers=2, flow_hidden=32, flow_bins=4)
    params = model.init(jax.random.PRNGKey(1), tokens, theta)

    devices = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devices, ("data", "model"))
    loss_sh = make_sharded_nll(mesh, tokens.shape[1], model)
    l0, g0 = jax.value_and_grad(lambda p: model.apply(p, tokens, theta))(
        params)
    l1, g1 = jax.value_and_grad(lambda p: loss_sh(p, tokens, theta))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


# ── v4: trigger-conditioned heterodyne ────────────────────────────────────


def _trigger_grid(**kw):
    from posteriflow_tpu.models.long_bns import build_trigger_token_grid
    cfg = dict(duration=16.0, f_hi=256.0, pad_multiple=32)
    cfg.update(kw)
    return build_trigger_token_grid(**cfg)


def test_trigger_grid_static_and_compact():
    """The v4 grid is deterministic and ~30x more compact than v3's (the
    point of trigger conditioning: residual time-frequency area)."""
    g1, g2 = _trigger_grid(), _trigger_grid()
    np.testing.assert_array_equal(g1["starts"], g2["starts"])
    assert g1["n_tok"] < 200
    assert g1["L"] % 32 == 0
    assert (g1["ends"][: g1["n_tok"]] > g1["starts"][: g1["n_tok"]]).all()
    # segments tile the band contiguously
    assert g1["ends"][g1["n_tok"] - 1] == len(g1["freqs"]) - g1["i_lo"]


def test_trigger_tokens_snr_retention_worst_case():
    """>=90% of SNR^2 survives v4 pooling even at WORST-CASE trigger
    errors (the bound the grid's alpha accounting promises; measured
    production retention is >99% at drawn errors)."""
    from posteriflow_tpu.models.long_bns import trigger_tokens
    from posteriflow_tpu.physics.projection import (GMST_REF, OMEGA_EARTH,
                                                    network_response,
                                                    project_to_network)
    from posteriflow_tpu.physics.psd import default_network_psd
    from posteriflow_tpu.physics.waveforms.taylorf2 import \
        taylorf2_polarizations
    from posteriflow_tpu.physics.waveforms.tidal import matter_effects
    from posteriflow_tpu.physics.whiten import whiten_fd

    grid = _trigger_grid(duration=32.0)
    freqs = jnp.asarray(grid["freqs"], jnp.float32)
    asd = jnp.asarray(np.sqrt(default_network_psd(grid["freqs"])) * 1e23,
                      jnp.float32)

    @jax.jit
    def sig_tok(m1, m2, chi, t_off, sgn):
        hp, hc = taylorf2_polarizations(freqs, m1, m2, chi, chi, 100.0,
                                        0.5, 1.0)
        psi_t, taper = matter_effects(freqs, m1, m2)
        fac = (taper * jnp.exp(-1j * psi_t.astype(jnp.float32))
               ).astype(jnp.complex64)
        ra, dec, psi_a = 1.0, 0.3, 0.7
        h_det = project_to_network(freqs, hp * fac, hc * fac, ra, dec,
                                   psi_a, t_off,
                                   duration=grid["duration"])
        h_w = whiten_fd(h_det, asd, 1.0 / grid["duration"])
        mc = (m1 * m2) ** 0.6 * (m1 + m2) ** -0.2
        _, _, dt = network_response(ra, dec, psi_a,
                                    GMST_REF + OMEGA_EARTH * t_off)
        # worst-case trigger: every error railed at +-trunc sigma
        mc_hat = mc * (1.0 + sgn * grid["trunc"] * grid["sigma_mc_rel"])
        t_hat = t_off + dt - sgn * grid["trunc"] * grid["sigma_t"]
        return h_w, trigger_tokens(h_w, grid, mc_hat, t_hat)

    for m1, m2, chi, t_off, sgn in [(1.4, 1.4, 0.0, 0.0, 1.0),
                                    (2.5, 1.0, 0.05, -1.5, -1.0),
                                    (1.0, 1.0, -0.05, 1.5, 1.0)]:
        h_w, tok = sig_tok(m1, m2, chi, t_off, sgn)
        hb = np.asarray(h_w)[:, grid["i_lo"]:]
        rho2 = float((np.abs(hb) ** 2).sum() / 2.0)
        c = np.asarray(tok[:, :3]) + 1j * np.asarray(tok[:, 3:6])
        retained = float((np.abs(c) ** 2).sum()) / rho2
        assert retained > 0.90, (m1, m2, chi, t_off, retained)


def test_trigger_scaler_roundtrip_and_bounds():
    from posteriflow_tpu.models.long_bns import (TriggerScaler,
                                                 simulate_long_bns_batch_v4)

    grid = _trigger_grid()
    _, theta, trig = jax.jit(lambda k: simulate_long_bns_batch_v4(
        k, 16, grid))(jax.random.PRNGKey(0))
    sc = TriggerScaler(grid["sigma_mc_rel"], grid["sigma_t"],
                       grid["trunc"], grid["q_min"])
    y = sc.normalize(theta, trig)
    assert np.isfinite(np.asarray(y)).all()
    # custom coords live strictly inside [-1, 1] (wrap/clamp-safe)
    for i in (0, 1, 8):
        assert float(jnp.max(jnp.abs(y[:, i]))) < 1.0, i
    theta2 = sc.denormalize(y, trig)
    np.testing.assert_allclose(np.asarray(theta2), np.asarray(theta),
                               atol=1e-4, rtol=1e-5)


def test_simulate_v4_and_train_step():
    """v4 batch synthesis + one training step + trig-aware sampling."""
    import optax
    from posteriflow_tpu.models.long_bns import (LongBNSNPEv4,
                                                 simulate_long_bns_batch_v4)

    grid = _trigger_grid()
    sim = jax.jit(lambda k: simulate_long_bns_batch_v4(k, 4, grid))
    tokens, theta, trig = sim(jax.random.PRNGKey(0))
    assert tokens.shape == (4, grid["L"], 11)
    assert trig.shape == (4, 4)
    assert np.isfinite(np.asarray(tokens)).all()

    # noise-only counterfactual: same theta/trigger, different tokens
    tok0, th0, tr0 = jax.jit(lambda k: simulate_long_bns_batch_v4(
        k, 4, grid, 0.0))(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(th0), np.asarray(theta))
    np.testing.assert_allclose(np.asarray(tr0), np.asarray(trig))
    assert float(jnp.max(jnp.abs(tok0 - tokens))) > 1e-4

    model = LongBNSNPEv4(enc=dict(d_model=32, n_layers=1, n_heads=4,
                                  context_dim=16, patch=4),
                         flow_layers=2, flow_hidden=32, flow_bins=4,
                         sigma_mc_rel=grid["sigma_mc_rel"],
                         sigma_t=grid["sigma_t"])
    params = model.init(jax.random.PRNGKey(1), tokens, theta, trig)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        tok, th, tr = simulate_long_bns_batch_v4(key, 4, grid)
        loss, g = jax.value_and_grad(
            lambda p: model.apply(p, tok, th, tr))(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    for i in range(2):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(2 + i))
        assert np.isfinite(float(loss))
    draws = model.apply(params, jax.random.PRNGKey(9), tokens, trig, 8,
                        method=LongBNSNPEv4.sample)
    assert draws.shape == (4, 8, 11)
    d = np.asarray(draws)
    assert (d[..., 0] >= d[..., 1] - 1e-5).all()      # m1 >= m2
    # sampled chirp mass stays inside the trigger residual prior
    mc_d = (d[..., 0] * d[..., 1]) ** 0.6 / (d[..., 0] + d[..., 1]) ** 0.2
    rel = np.abs(mc_d / np.asarray(trig)[:, None, 0] - 1.0)
    assert rel.max() < 5.0 * grid["sigma_mc_rel"] + 1e-4


def test_sharded_nll_v4_matches():
    from posteriflow_tpu.models.long_bns import (LongBNSNPEv4,
                                                 make_sharded_nll_v4,
                                                 simulate_long_bns_batch_v4)

    grid = _trigger_grid()
    tokens, theta, trig = jax.jit(lambda k: simulate_long_bns_batch_v4(
        k, 4, grid))(jax.random.PRNGKey(0))
    model = LongBNSNPEv4(enc=dict(d_model=32, n_layers=1, n_heads=4,
                                  context_dim=16, patch=4),
                         flow_layers=2, flow_hidden=32, flow_bins=4,
                         sigma_mc_rel=grid["sigma_mc_rel"],
                         sigma_t=grid["sigma_t"])
    params = model.init(jax.random.PRNGKey(1), tokens, theta, trig)

    devices = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devices, ("data", "model"))
    loss_sh = make_sharded_nll_v4(mesh, tokens.shape[1], model)
    l0, g0 = jax.value_and_grad(
        lambda p: model.apply(p, tokens, theta, trig))(params)
    l1, g1 = jax.value_and_grad(
        lambda p: loss_sh(p, tokens, theta, trig))(params)
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)
