"""Premerger / Mc-oversampling / glitch augmentation + cosmology helpers
(reference analogs: dataset_generator premerger branch, --mc_oversample,
add_glitches, data/utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posteriflow_tpu.physics.cosmology import (chi_eff, chirp_mass,
                                               luminosity_distance,
                                               mass_ratio,
                                               redshift_from_luminosity_distance,
                                               source_frame_masses)
from posteriflow_tpu.physics.simulator import SimConfig, simulate_batch
from posteriflow_tpu.prior import PriorConfig, sample_batch


def test_premerger_conversion():
    cfg = PriorConfig(premerger_fraction=0.5, overlap_fraction=0.0,
                      noise_fraction=0.0)
    p, n = jax.jit(lambda k: sample_batch(k, 512, cfg))(jax.random.PRNGKey(0))
    p, n = np.asarray(p), np.asarray(n)
    pm = p[:, 0, 8] > 2.0
    assert 0.35 < pm.mean() < 0.65
    # merger past window end by [0.5, 3] s
    assert (p[pm, 0, 8] >= 2.5 - 1e-5).all()
    assert (p[pm, 0, 8] <= 5.0 + 1e-5).all()
    # nearby distance redraw
    assert (p[pm, 0, 2] <= 400.0 + 1e-3).all()
    # multi-signal events never converted
    cfg2 = PriorConfig(premerger_fraction=1.0, overlap_fraction=1.0,
                       noise_fraction=0.0)
    p2, n2 = jax.jit(lambda k: sample_batch(k, 256, cfg2))(
        jax.random.PRNGKey(1))
    p2, n2 = np.asarray(p2), np.asarray(n2)
    assert (p2[n2 >= 2, 0, 8] <= 1.5 + 1e-5).all()


def test_mc_oversample_shifts_masses():
    base = PriorConfig(type_probs=(1.0, 0.0, 0.0))
    over = PriorConfig(type_probs=(1.0, 0.0, 0.0), mc_oversample=1.0)
    p0, _ = jax.jit(lambda k: sample_batch(k, 1024, base))(
        jax.random.PRNGKey(2))
    p1, _ = jax.jit(lambda k: sample_batch(k, 1024, over))(
        jax.random.PRNGKey(2))
    m0 = float(np.median(np.asarray(p0)[:, :, 0]))
    m1 = float(np.median(np.asarray(p1)[:, :, 0]))
    assert m1 > 1.5 * m0
    # bounds still respected
    assert np.asarray(p1)[:, :, 0].max() <= 100.0 + 1e-3


def test_glitch_injection():
    cfg = SimConfig(glitch_prob=1.0,
                    prior=PriorConfig(noise_fraction=1.0))
    b = jax.jit(lambda k: simulate_batch(k, 8, cfg))(jax.random.PRNGKey(3))
    s = np.asarray(b.strain)
    assert np.isfinite(s).all()
    # noise-only events with forced glitches: peak well above Gaussian 4σ
    assert np.abs(s).max() > 5.0
    # glitches land in ONE detector per event: at most one det per event
    # with extreme excursions
    extreme = (np.abs(s) > 5.0).any(axis=-1).sum(axis=-1)
    assert (extreme <= 1).all()


def test_cosmology_roundtrip_and_known_values():
    d = float(luminosity_distance(0.1))
    assert d == pytest.approx(476.0, rel=0.02)       # Planck18 ballpark
    z = float(redshift_from_luminosity_distance(d))
    assert z == pytest.approx(0.1, abs=1e-3)
    m1s, m2s, z2 = source_frame_masses(36.0, 29.0, 440.0)
    assert float(m1s) < 36.0                         # redshifted down
    assert float(chi_eff(30.0, 20.0, 0.5, -0.2)) == pytest.approx(0.22)
    assert float(chirp_mass(30.0, 30.0)) == pytest.approx(26.12, rel=1e-3)
    assert float(mass_ratio(30.0, 15.0)) == pytest.approx(0.5)


def test_group_mean_loss():
    from posteriflow_tpu.utils.noise_marginalization import (
        group_mean_loss, repeat_params_k_noise)
    losses = jnp.asarray([1.0, 3.0, 10.0])       # groups: [0, 0, 1]
    gids = jnp.asarray([0, 0, 1])
    # group means: 2.0 and 10.0 -> 6.0 (NOT the flat mean 4.67)
    out = float(group_mean_loss(losses, gids, 2))
    assert out == pytest.approx(6.0)
    rep, g, keys = repeat_params_k_noise(jax.random.PRNGKey(0),
                                         jnp.ones((4, 11)), 3)
    assert rep.shape == (12, 11) and g.shape == (12,)
    assert (np.asarray(g) == np.repeat(np.arange(4), 3)).all()


def test_lightweight_transformer_encoder():
    from posteriflow_tpu.models.transformer_encoder import (
        LightweightTransformerEncoder)
    enc = LightweightTransformerEncoder(patch=256, d_model=32, n_layers=1,
                                        n_heads=4, out_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 16384))
    p = enc.init(jax.random.PRNGKey(1), x)
    out = enc.apply(p, x)
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_pretrained_audio_encoder_gated():
    from posteriflow_tpu.models.transformer_encoder import (
        PretrainedAudioEncoder)
    with pytest.raises(RuntimeError, match="locally cached"):
        PretrainedAudioEncoder()


def test_pretrained_audio_encoder_from_config():
    """Exercise the Whisper encode path offline (random-init tiny config;
    reference: transformer_encoder.py Whisper-small front-end)."""
    from transformers import WhisperConfig
    from posteriflow_tpu.models.transformer_encoder import (
        PretrainedAudioEncoder)
    cfg = WhisperConfig(num_mel_bins=3, d_model=32, encoder_layers=1,
                        encoder_attention_heads=2, decoder_layers=1,
                        decoder_attention_heads=2, encoder_ffn_dim=64,
                        decoder_ffn_dim=64, max_source_positions=128,
                        max_target_positions=32, vocab_size=100)
    enc = PretrainedAudioEncoder.from_config(cfg, out_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 256))
    out = enc.encode(x)
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_simulate_batch_deterministic():
    """Same key -> identical batch (reproducibility contract; the remix
    analog is the seeded per-(epoch,item) RNG, remix_data.py:220)."""
    cfg = SimConfig(prior=PriorConfig(max_signals=2))
    f = jax.jit(lambda k: simulate_batch(k, 4, cfg))
    b1 = f(jax.random.PRNGKey(9))
    b2 = f(jax.random.PRNGKey(9))
    np.testing.assert_array_equal(np.asarray(b1.strain),
                                  np.asarray(b2.strain))
    np.testing.assert_array_equal(np.asarray(b1.params),
                                  np.asarray(b2.params))


def test_all_augmentations_together_train_step():
    """premerger + mc_oversample + glitches + det dropout in ONE config
    must still produce a finite training step (premerger scaler enabled)."""
    from posteriflow_tpu.models.npe import NPEConfig
    from posteriflow_tpu.train.trainer import (TrainConfig, init_state,
                                               make_train_step)
    cfg = TrainConfig(
        npe=NPEConfig(context_dim=32, rank_dim=8, flow_layers=2,
                      flow_hidden=32, flow_bins=4, encoder_type="conv",
                      d_model=32, enc_layers=1, enc_heads=4,
                      premerger=True),
        sim=SimConfig(prior=PriorConfig(max_signals=2,
                                        premerger_fraction=0.3,
                                        mc_oversample=0.5),
                      det_dropout=0.2, glitch_prob=0.3),
        batch_size=8, warmup_steps=2, total_steps=10)
    state = init_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg)
    for i in range(3):
        state, m = step(state, jax.random.PRNGKey(i))
        assert np.isfinite(float(m["nll"])), (i, m)
