"""Checkpoint/resume + calibration-gate contracts (SURVEY.md §5 rebuild
mapping: orbax checkpoints storing full config + calibration gate state)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posteriflow_tpu.models.npe import NPEConfig
from posteriflow_tpu.physics.simulator import SimConfig, simulate_batch
from posteriflow_tpu.prior import PriorConfig
from posteriflow_tpu.train.checkpoints import CheckpointManager, cfg_from_dict
from posteriflow_tpu.train.gates import (CalibrationGate, evaluate_gate,
                                         select_best)
from posteriflow_tpu.train.trainer import TrainConfig, init_state

TINY = TrainConfig(
    npe=NPEConfig(context_dim=32, rank_dim=8, flow_layers=2, flow_hidden=32,
                  flow_bins=4, encoder_type="conv", d_model=32,
                  enc_layers=1, enc_heads=4),
    sim=SimConfig(prior=PriorConfig(max_signals=2)),
    batch_size=8, warmup_steps=5, total_steps=50)


def test_checkpoint_roundtrip(tmp_path):
    state = init_state(jax.random.PRNGKey(0), TINY)
    cm = CheckpointManager(tmp_path)
    cm.save("best", state, TINY, {"val_nll": 1.5}, epoch=3)

    state2, cfg2, meta = cm.restore("best")
    assert cfg2 == TINY                      # full config fidelity
    assert meta["epoch"] == 3
    assert meta["metrics"]["val_nll"] == 1.5
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fine_tune_restore_fresh_optimizer(tmp_path):
    state = init_state(jax.random.PRNGKey(0), TINY)
    state = state.replace(step=jnp.asarray(100))
    cm = CheckpointManager(tmp_path)
    cm.save("best", state, TINY, epoch=9)
    ft, meta = cm.fine_tune_restore("best", TINY)
    assert int(ft.step) == 0                 # fresh optimizer/schedule
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(ft.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gate_evaluation_runs():
    state = init_state(jax.random.PRNGKey(0), TINY)
    batch = jax.jit(lambda k: simulate_batch(k, 32, TINY.sim))(
        jax.random.PRNGKey(1))
    out = evaluate_gate(TINY, state.params, batch, jax.random.PRNGKey(2),
                        n_post=64)
    assert 0.0 <= out["spurious_railing"] <= 1.0
    assert np.isfinite(out["base_conc"])
    assert 0.0 <= out["sbc_pass_frac"] <= 1.0
    assert isinstance(out["gate_passed"], bool)
    assert len(out["cov90_all"]) == 11


def test_select_best_gated_semantics():
    hist = [
        {"epoch": 1, "select_nll": 1.0, "gate_passed": False},
        {"epoch": 2, "select_nll": 2.0, "gate_passed": True},
        {"epoch": 3, "select_nll": 1.5, "gate_passed": True},
    ]
    # lowest NLL overall is epoch 1, but it fails the gate -> best passing
    assert select_best(hist) == 3
    # none passing -> fall back to lowest overall
    for h in hist:
        h["gate_passed"] = False
    assert select_best(hist) == 1


def test_gate_thresholds():
    g = CalibrationGate()
    good = {"spurious_railing": 0.01, "base_conc": 1.0, "cov90_mean": 0.9,
            "sbc_pass_frac": 1.0}
    assert g.passes(good)
    assert not g.passes({**good, "spurious_railing": 0.5})
    assert not g.passes({**good, "base_conc": 5.0})
    assert not g.passes({**good, "cov90_mean": 0.5})
    assert not g.passes({**good, "sbc_pass_frac": 0.5})


def test_export_release_roundtrip(tmp_path):
    """scripts/export_release.py: ckpt -> release dir -> load_release gives
    back identical params + config (the committed deployment format
    pipeline.py:59-66 loads)."""
    import sys
    sys.path.insert(0, "scripts")
    import export_release

    state = init_state(jax.random.PRNGKey(0), TINY)
    cm = CheckpointManager(tmp_path / "ckpt")
    cm.save("best", state, TINY, {"val_nll": -1.0}, epoch=7)
    run_dir = tmp_path / "run"
    run_dir.mkdir()
    (run_dir / "history.json").write_text("[]")
    out = tmp_path / "release"
    export_release.main(["--ckpt", str(tmp_path / "ckpt"),
                         "--run-dir", str(run_dir), "--out", str(out)])
    params, cfg, meta = CheckpointManager.load_release(out)
    assert cfg == TINY and meta["epoch"] == 7
    assert (out / "history.json").exists()
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
