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
