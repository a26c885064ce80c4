"""PriorityNet trainer: scenario synthesis, loss decreases, top-1 beats
chance (reference analog: experiments/train_priority_net.py +
test_priority_net.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posteriflow_tpu.data.snr_utils import (classify_snr_regime,
                                            estimate_snr_from_params,
                                            network_snr,
                                            normalize_priorities)
from posteriflow_tpu.train.train_priority import (PriorityTrainConfig,
                                                  fit_priority,
                                                  load_priority_net,
                                                  make_priority_batch)

CFG = PriorityTrainConfig(batch_size=8, max_signals=3, d_model=32)


def test_priority_batch_shapes():
    segs, cand, mask, targets, snr, snr_est = make_priority_batch(
        jax.random.PRNGKey(0), CFG)
    assert segs.shape == (8, 3, 3, 2048)
    assert cand.shape == (8, 3, 11)
    assert mask.shape == (8, 3) and targets.shape == (8, 3)
    t = np.asarray(targets)
    m = np.asarray(mask)
    assert (t[m > 0] <= 1.0 + 1e-6).all() and (t[m > 0] >= 0.0).all()
    # the loudest live candidate always has target 1
    for i in range(8):
        if m[i].sum() >= 1:
            assert t[i][m[i] > 0].max() == pytest.approx(1.0, abs=1e-5)
    # the physics expected-SNR feature tracks the true injected SNR up to
    # candidate jitter (it is the same amplitude chain on jittered params)
    live = np.asarray(m) > 0
    s_true = np.asarray(snr)[live]
    s_est = np.asarray(snr_est)[live]
    assert s_est.shape == s_true.shape and np.isfinite(s_est).all()
    if live.sum() >= 4:
        assert np.corrcoef(s_true, s_est)[0, 1] > 0.8


def test_fit_priority_learns(tmp_path):
    params, hist = fit_priority(tmp_path, CFG, steps=60, eval_every=30)
    assert (tmp_path / "priority_params.msgpack").exists()
    assert hist[-1]["loss"] < hist[0]["loss"]
    # reload roundtrip
    net, params2 = load_priority_net(
        tmp_path / "priority_params.msgpack", d_model=32)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


CFG_V7 = PriorityTrainConfig(batch_size=8, max_signals=3, d_model=32,
                             use_dt=True, residual_snr=True, mine_pool=2)


def test_mine_pool_selects_hardest():
    """mine_pool=2 keeps the batch whose closest normalized-target pair is
    tightest: every kept multi-signal event must have min pair separation
    <= the unmined batch's median (same key, pool contains the batch)."""
    k = jax.random.PRNGKey(3)
    _, _, m0, t0, _, _ = make_priority_batch(
        k, PriorityTrainConfig(batch_size=16, max_signals=3, d_model=32))
    _, _, m1, t1, _, _ = make_priority_batch(
        k, PriorityTrainConfig(batch_size=8, max_signals=3, d_model=32,
                               mine_pool=2))

    def min_seps(t, m):
        out = []
        for i in range(t.shape[0]):
            live = np.asarray(m[i]) > 0
            tg = np.asarray(t[i])[live]
            if len(tg) < 2:
                out.append(np.inf)
            else:
                d = np.abs(tg[:, None] - tg[None, :])
                out.append(d[~np.eye(len(tg), dtype=bool)].min())
        return np.asarray(out)

    pool, mined = min_seps(t0, m0), min_seps(t1, m1)
    # the mined batch is exactly the 8 hardest of the 16-event pool
    assert np.allclose(np.sort(mined), np.sort(pool)[:8])


def test_pair_time_features_semantics():
    from posteriflow_tpu.models.priority_net import pair_time_features
    params = np.zeros((1, 3, 11), np.float32)
    params[0, :, 8] = [0.0, 0.1, 2.0]     # two close mergers + one far
    mask = jnp.asarray([[1.0, 1.0, 1.0]])
    snr = jnp.asarray([[10.0, 20.0, 5.0]])
    f = np.asarray(pair_time_features(jnp.asarray(params), mask, snr))
    # candidate 0: nearest is 0.1 s away, one inside the 0.25 s window,
    # contamination from candidate 1 (20 * (1-0.1/0.25) = 12)
    assert f[0, 0, 0] == pytest.approx(np.arcsinh(0.1 / 0.25), abs=1e-5)
    assert f[0, 0, 1] == 1.0 and f[0, 2, 1] == 0.0
    assert f[0, 0, 2] == pytest.approx(np.arcsinh(12.0 / 8.0), abs=1e-4)
    # the isolated candidate sees zero contamination
    assert f[0, 2, 2] == 0.0
    # a dead slot is excluded from everyone's crowding
    mask2 = jnp.asarray([[1.0, 0.0, 1.0]])
    f2 = np.asarray(pair_time_features(jnp.asarray(params), mask2, snr))
    assert f2[0, 0, 1] == 0.0 and f2[0, 0, 2] == 0.0


def test_residual_head_starts_at_oracle():
    """With residual_snr, the freshly initialized score equals the
    normalized physics-SNR oracle exactly (zero-init head + res_w=1)."""
    from posteriflow_tpu.models.priority_net import PriorityNet
    k = jax.random.PRNGKey(0)
    segs, cand, mask, _, _, snr_est = make_priority_batch(k, CFG_V7)
    net = PriorityNet(d_model=32, use_energy=True, use_snr_est=True,
                      use_dt=True, residual_snr=True)
    p = net.init(k, segs, cand, mask, with_aux=True, snr_est=snr_est)
    sc, _ = net.apply(p, segs, cand, mask, snr_est=snr_est)
    live = np.asarray(mask) > 0
    nmax = np.max(np.where(live, np.asarray(snr_est), 0), axis=-1,
                  keepdims=True)
    oracle = np.asarray(snr_est) / np.maximum(nmax, 1e-6)
    assert np.allclose(np.asarray(sc)[live], oracle[live], atol=1e-5)


def test_fit_priority_v7_roundtrip(tmp_path):
    params, hist = fit_priority(tmp_path, CFG_V7, steps=40, eval_every=20)
    assert hist[-1]["loss"] < hist[0]["loss"]
    net, params2 = load_priority_net(tmp_path / "priority_params.msgpack")
    assert net.use_dt and net.residual_snr
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_snr_utils():
    assert classify_snr_regime(5.0) == "weak"
    assert classify_snr_regime(15.0) == "medium"
    assert classify_snr_regime(100.0) == "loud"
    assert network_snr([3.0, 4.0]) == pytest.approx(5.0)
    # louder (closer/heavier) systems estimate higher
    assert estimate_snr_from_params(40, 35, 200) > \
        estimate_snr_from_params(10, 8, 1000)
    p = normalize_priorities([20.0, 10.0, 1e-9])
    assert p[0] == 1.0 and p[1] == pytest.approx(0.5) and p[2] >= 0.05
