"""Real-noise bank: format roundtrip, jittable crops, exact re-coloring,
and the real-noise training path (reference: remix_data.py real path +
download_gwosc_noise_bank.py format)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posteriflow_tpu.data.noise_bank import (NoiseBank, load_noise_bank,
                                             make_synthetic_bank,
                                             recolor_signal,
                                             sample_real_noise,
                                             save_bank_segment)
from posteriflow_tpu.physics.constants import N_RFFT, N_SAMPLES
from posteriflow_tpu.physics.simulator import SimConfig, simulate_batch
from posteriflow_tpu.prior import PriorConfig


@pytest.fixture(scope="module")
def bank():
    return make_synthetic_bank(jax.random.PRNGKey(0), n_segments=3)


def test_synthetic_bank_shapes(bank):
    assert bank.segments.shape[0] == 3          # detectors
    assert bank.recolor.shape[-1] == N_RFFT
    assert bank.asd_bands.shape[-1] == 16


def test_sample_real_noise_jits(bank):
    noise, filt, bands = jax.jit(lambda k: sample_real_noise(k, bank))(
        jax.random.PRNGKey(1))
    assert noise.shape == (3, N_SAMPLES)
    assert 0.8 < float(jnp.std(noise)) < 1.2
    assert np.isfinite(np.asarray(bands)).all()
    # different key -> different crop
    noise2, _, _ = sample_real_noise(jax.random.PRNGKey(2), bank)
    assert not np.allclose(np.asarray(noise), np.asarray(noise2))


def test_recolor_identity_filter(bank):
    sig = jax.random.normal(jax.random.PRNGKey(3), (3, N_SAMPLES))
    out = recolor_signal(sig, jnp.ones((3, N_RFFT)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(sig), atol=1e-4)


def test_recolor_scales_spectrum(bank):
    """A 2x filter doubles the signal amplitude exactly (linear op)."""
    sig = jax.random.normal(jax.random.PRNGKey(4), (3, N_SAMPLES))
    out = recolor_signal(sig, 2.0 * jnp.ones((3, N_RFFT)))
    np.testing.assert_allclose(np.asarray(out), 2 * np.asarray(sig),
                               atol=1e-4)


def test_bank_format_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    for det in ("H1", "L1", "V1"):
        save_bank_segment(tmp_path, det, 1234567890,
                          rng.standard_normal(4 * N_SAMPLES),
                          np.full(N_RFFT, 4e-24))
    bank = load_noise_bank(tmp_path)
    assert bank.n_segments == 1
    assert bank.segments.shape[2] == 4 * N_SAMPLES
    assert np.isfinite(np.asarray(bank.recolor)).all()


def test_simulate_batch_with_real_noise(bank):
    cfg = SimConfig(prior=PriorConfig(max_signals=2), real_noise_prob=1.0)
    batch = jax.jit(lambda k: simulate_batch(k, 8, cfg, bank=bank))(
        jax.random.PRNGKey(5))
    assert np.isfinite(np.asarray(batch.strain)).all()
    # real-noise events carry non-zero asd_bands (sensitivity summary)
    ab = np.asarray(batch.asd_bands)
    assert np.abs(ab).max() > 1e-4
    std = np.asarray(jnp.std(batch.strain, axis=(-2, -1)))
    assert (std > 0.8).all() and (std < 2.5).all()


def test_real_noise_prob_zero_matches_gaussian(bank):
    """With p=0, passing a bank must not change the batch at all."""
    cfg = SimConfig(prior=PriorConfig(max_signals=2), real_noise_prob=0.0)
    b1 = jax.jit(lambda k: simulate_batch(k, 4, cfg, bank=bank))(
        jax.random.PRNGKey(6))
    b2 = jax.jit(lambda k: simulate_batch(k, 4, cfg))(jax.random.PRNGKey(6))
    np.testing.assert_allclose(np.asarray(b1.strain),
                               np.asarray(b2.strain), atol=1e-5)


def test_train_step_with_bank(bank):
    from posteriflow_tpu.models.npe import NPEConfig
    from posteriflow_tpu.train.trainer import (TrainConfig, init_state,
                                               make_train_step)
    cfg = TrainConfig(
        npe=NPEConfig(context_dim=32, rank_dim=8, flow_layers=2,
                      flow_hidden=32, flow_bins=4, encoder_type="conv",
                      d_model=32, enc_layers=1, enc_heads=4, psd_cond=True),
        sim=SimConfig(prior=PriorConfig(max_signals=2),
                      real_noise_prob=0.5),
        batch_size=8, warmup_steps=2, total_steps=10)
    state = init_state(jax.random.PRNGKey(0), cfg)
    step = make_train_step(cfg, with_bank=True)
    state, m = step(state, jax.random.PRNGKey(1), bank)
    assert np.isfinite(float(m["nll"]))
