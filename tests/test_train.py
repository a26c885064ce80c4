"""Trainer integration: jitted simulate+train step, loss decreases, and the
8-device CPU mesh shards the full step (SURVEY.md §4 rebuild mapping —
multi-device tests via xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posteriflow_tpu.models.npe import NPEConfig
from posteriflow_tpu.parallel.mesh import make_mesh
from posteriflow_tpu.physics.simulator import SimConfig, simulate_batch
from posteriflow_tpu.prior import PriorConfig
from posteriflow_tpu.train.diagnostics import make_diagnostics
from posteriflow_tpu.train.trainer import (TrainConfig, batch_nll,
                                           init_state, make_eval_nll,
                                           make_train_step)

# Tiny configuration: fast CPU compile, still exercises every code path
TINY = TrainConfig(
    npe=NPEConfig(context_dim=32, rank_dim=8, flow_layers=2, flow_hidden=32,
                  flow_bins=4, encoder_type="conv", d_model=32,
                  enc_layers=1, enc_heads=4),
    sim=SimConfig(prior=PriorConfig(max_signals=2), det_dropout=0.1),
    batch_size=8, warmup_steps=5, total_steps=50, lr=1e-3)


@pytest.fixture(scope="module")
def state():
    return init_state(jax.random.PRNGKey(0), TINY)


def test_init_param_count(state):
    n = sum(x.size for x in jax.tree.leaves(state.params))
    assert 1_000 < n < 5_000_000


def test_train_step_runs_and_improves(state):
    step = make_train_step(TINY)
    # the step donates its input state — hand it a copy so the module-scoped
    # fixture's buffers survive for the other tests
    s = jax.tree.map(jnp.array, state)
    losses = []
    for i in range(8):
        s, m = step(s, jax.random.PRNGKey(i))
        losses.append(float(m["nll"]))
        assert np.isfinite(losses[-1]), (i, m)
    # identity-init flow on [-1,1] data: NLL starts near the standard-normal
    # baseline and must move down as the flow tightens
    assert losses[-1] < losses[0] + 0.5, losses


def test_eval_and_diagnostics(state):
    eval_nll = make_eval_nll(TINY)
    batch = jax.jit(lambda k: simulate_batch(k, 16, TINY.sim))(
        jax.random.PRNGKey(42))
    v = float(eval_nll(state.params, batch))
    assert np.isfinite(v)

    diag = make_diagnostics(TINY, n_events=16, n_post=32)
    d = diag(state.params, batch, jax.random.PRNGKey(1))
    for k in ("val_nll_diag", "shuffle_delta_nll", "dist_corr",
              "dist_cov50", "dist_cov90"):
        assert np.isfinite(float(d[k])), k
    assert d["cov50_all"].shape == (11,)
    # identity-init flow ≈ same density for all contexts ⇒ shuffle Δ ≈ 0
    assert abs(float(d["shuffle_delta_nll"])) < 1.0


def test_multichip_mesh_step():
    """Full train step sharded over an 8-device CPU mesh — the multi-chip
    dry-run contract (dryrun_multichip)."""
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh(8)
    step = make_train_step(TINY, mesh=mesh)
    s = init_state(jax.random.PRNGKey(0), TINY)
    s, m = step(s, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["nll"]))
    s, m = step(s, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["nll"]))


def test_mesh_matches_single_device_loss():
    """The sharded loss equals the unsharded loss (same key, same batch)."""
    mesh = make_mesh(8)
    s1 = init_state(jax.random.PRNGKey(0), TINY)
    s2 = init_state(jax.random.PRNGKey(0), TINY)
    step1 = make_train_step(TINY)
    step2 = make_train_step(TINY, mesh=mesh)
    _, m1 = step1(s1, jax.random.PRNGKey(7))
    _, m2 = step2(s2, jax.random.PRNGKey(7))
    assert np.isclose(float(m1["nll"]), float(m2["nll"]), rtol=1e-3)
