"""ParamScaler contract tests (reference analog:
tests/test_parameter_scaler_roundtrip.py — lossless roundtrip for all 11
params, plus wrap/Jacobian semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posteriflow_tpu import PARAM_NAMES
from posteriflow_tpu.prior import sample_signal_params
from posteriflow_tpu.scaler import ParamScaler


@pytest.fixture(scope="module")
def scaler():
    return ParamScaler()


@jax.jit
def _draw_fn(keys):
    return jax.vmap(sample_signal_params)(keys)


def _prior_draws(n=256):
    return _draw_fn(jax.random.split(jax.random.PRNGKey(7), n))


def test_roundtrip_lossless(scaler):
    x = _prior_draws()
    y = scaler.normalize(x)
    x2 = scaler.denormalize(y)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), rtol=2e-4,
                               atol=2e-4)


def test_normalized_in_bounds(scaler):
    y = scaler.normalize(_prior_draws())
    assert float(jnp.max(jnp.abs(y))) <= 1.0 + 1e-6


def test_wrap_circular_exact(scaler):
    # ra at y=1.2 is the same angle as y=-0.8 (one full period = 2 in y)
    names = list(PARAM_NAMES)
    y = jnp.zeros((1, len(names)))
    y_over = y.at[0, names.index("ra")].set(1.2)
    wrapped = scaler.wrap(y_over)
    assert np.isclose(float(wrapped[0, names.index("ra")]), -0.8, atol=1e-6)
    # non-circular dims clamp
    y_over2 = y.at[0, names.index("mass_1")].set(1.7)
    assert np.isclose(float(scaler.wrap(y_over2)[0, names.index("mass_1")]),
                      1.0)


def test_wrap_inside_identity(scaler):
    y = scaler.normalize(_prior_draws(64))
    np.testing.assert_allclose(np.asarray(scaler.wrap(y)), np.asarray(y),
                               atol=1e-6)


def test_jacobian_matches_autodiff(scaler):
    x = _prior_draws(8)

    def norm_one(xi):
        return scaler.normalize(xi)

    for i in range(x.shape[0]):
        jac = jax.jacfwd(norm_one)(x[i])
        ref = float(jnp.sum(jnp.log(jnp.abs(jnp.diag(jac)))))
        got = float(scaler.log_abs_det_jacobian(x[i]))
        assert np.isclose(got, ref, rtol=1e-4), (i, got, ref)


def test_premerger_widens_time():
    s = ParamScaler(premerger=True)
    x = _prior_draws(4)
    idx = list(PARAM_NAMES).index("geocent_time")
    x = x.at[:, idx].set(5.0)   # premerger t_c past window end
    y = s.normalize(x)
    assert float(jnp.max(jnp.abs(y[:, idx]))) < 1.0
    np.testing.assert_allclose(np.asarray(s.denormalize(y)[:, idx]), 5.0,
                               rtol=1e-5)


def test_railing_mask(scaler):
    names = list(PARAM_NAMES)
    y = jnp.zeros((2, len(names)))
    y = y.at[0, names.index("mass_1")].set(0.9995)   # railed (non-circular)
    y = y.at[1, names.index("ra")].set(0.9995)       # circular: not railing
    m = scaler.railing_mask(y)
    assert bool(m[0]) and not bool(m[1])
