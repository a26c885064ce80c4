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
