"""Flow-core correctness: RQS bijection analytics and the coupling flow.

Parity gates per SURVEY.md §7 item 3: exact inverse roundtrip, logdet vs
autodiff Jacobian, density normalization, tail behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posteriflow_tpu.models.flow import CouplingNSF
from posteriflow_tpu.ops.rqs import rqs_forward, rqs_inverse

KEY = jax.random.PRNGKey(0)
NUM_BINS = 8


def _raw_params(key, shape):
    return jax.random.normal(key, (*shape, 3 * NUM_BINS - 1)) * 0.7


def test_rqs_roundtrip():
    x = jnp.clip(jax.random.normal(KEY, (64, 4)) * 2.0, -4.9, 4.9)
    raw = _raw_params(jax.random.PRNGKey(1), (64, 4))
    y, ld = jax.jit(lambda x, r: rqs_forward(x, r, NUM_BINS))(x, raw)
    x2, ld2 = jax.jit(lambda y, r: rqs_inverse(y, r, NUM_BINS))(y, raw)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld + ld2), 0.0, atol=2e-4)


def test_rqs_logdet_matches_autodiff():
    raw = _raw_params(jax.random.PRNGKey(2), (1,))[0]

    def f_scalar(xs):
        y, _ = rqs_forward(xs[None], raw[None], NUM_BINS)
        return y[0]

    for xv in [-4.0, -1.3, 0.0, 0.7, 3.9]:
        x = jnp.asarray(xv)
        dydx = jax.grad(lambda x: f_scalar(x)[()])(x)
        _, ld = rqs_forward(x[None], raw[None], NUM_BINS)
        assert np.isclose(float(ld), float(jnp.log(jnp.abs(dydx))),
                          atol=1e-4), xv


def test_rqs_identity_tails():
    x = jnp.asarray([-7.0, 6.0, 10.0])
    raw = _raw_params(jax.random.PRNGKey(3), (3,))
    y, ld = rqs_forward(x, raw, NUM_BINS, tail_bound=5.0)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)
    assert float(jnp.abs(ld)) < 1e-6


def test_rqs_monotone():
    x = jnp.linspace(-4.9, 4.9, 512)
    raw = jnp.broadcast_to(_raw_params(jax.random.PRNGKey(4), (1,)),
                           (512, 3 * NUM_BINS - 1))
    y, _ = rqs_forward(x, raw, NUM_BINS)
    assert (np.diff(np.asarray(y)) > 0).all()


@pytest.fixture(scope="module")
def flow_setup():
    flow = CouplingNSF(features=11, context_features=16, num_layers=6,
                       hidden=64, num_bins=8)
    ctx = jax.random.normal(jax.random.PRNGKey(5), (32, 16))
    y = jnp.clip(jax.random.normal(jax.random.PRNGKey(6), (32, 11)) * 0.5,
                 -0.99, 0.99)
    params = flow.init(jax.random.PRNGKey(7), y, ctx)
    return flow, params, y, ctx


def test_flow_roundtrip(flow_setup):
    flow, params, y, ctx = flow_setup
    z, ld = jax.jit(lambda p, y, c: flow.apply(p, y, c, method=flow.forward)
                    )(params, y, ctx)
    y2, ld_inv = jax.jit(lambda p, z, c: flow.apply(p, z, c,
                                                    method=flow.inverse)
                         )(params, z, ctx)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld + ld_inv), 0.0, atol=1e-3)


def test_flow_logprob_matches_autodiff_jacobian(flow_setup):
    flow, params, y, ctx = flow_setup

    def fwd_one(yi, ci):
        z, _ = flow.apply(params, yi[None], ci[None], method=flow.forward)
        return z[0]

    for i in range(3):
        jac = jax.jacfwd(lambda yy: fwd_one(yy, ctx[i]))(y[i])
        _, ld = flow.apply(params, y[i][None], ctx[i][None],
                           method=flow.forward)
        sign, logdet_ref = np.linalg.slogdet(np.asarray(jac))
        assert np.isclose(float(ld[0]), logdet_ref, atol=1e-3), i


def test_flow_identity_at_init(flow_setup):
    """Zero-init conditioners + unit-derivative bias ⇒ the flow starts as
    (a permutation of) the identity, so z ≈ y."""
    flow, params, y, ctx = flow_setup
    z, ld = flow.apply(params, y, ctx, method=flow.forward)
    np.testing.assert_allclose(np.asarray(jnp.sort(z, axis=-1)),
                               np.asarray(jnp.sort(y, axis=-1)), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ld), 0.0, atol=1e-3)


def test_flow_conditioning_changes_density(flow_setup):
    """After a random (non-zero) perturbation of the conditioner weights,
    different contexts must give different densities."""
    flow, params, y, ctx = flow_setup
    import flax
    leaves, tree = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(8), len(leaves))
    params2 = jax.tree.unflatten(
        tree, [l + 0.3 * jax.random.normal(k, l.shape)
               for l, k in zip(leaves, keys)])
    lp1 = flow.apply(params2, y, ctx, method=flow.log_prob)
    lp2 = flow.apply(params2, y, jnp.roll(ctx, 1, axis=0),
                     method=flow.log_prob)
    assert float(jnp.max(jnp.abs(lp1 - lp2))) > 1e-3


def test_flow_sample_log_prob_consistent(flow_setup):
    """log q from sampling must equal log_prob re-evaluated at the sample."""
    flow, params, y, ctx = flow_setup
    z = jax.random.normal(jax.random.PRNGKey(9), (32, 11))
    ys, log_q = flow.apply(params, z, ctx, method=flow.sample_with_log_prob)
    lp = flow.apply(params, ys, ctx, method=flow.log_prob)
    np.testing.assert_allclose(np.asarray(log_q), np.asarray(lp), atol=1e-3)
