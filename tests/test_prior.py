"""Prior sampling invariants (reference analog: the prior-distribution checks
in scripts/validate_pipeline_physics.py and tests/diag_sample_snr.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from posteriflow_tpu.prior import (BBH, PriorConfig, log_prior_bbh,
                                   sample_batch, sample_signal_params,
                                   loudness)

CFG = PriorConfig()


@jax.jit
def _draw_fn(keys):
    return jax.vmap(sample_signal_params)(keys)


def _draws(n=4096, seed=1):
    return np.asarray(_draw_fn(jax.random.split(jax.random.PRNGKey(seed), n)))


def test_shapes_and_finite():
    x = _draws(512)
    assert x.shape == (512, 11)
    assert np.isfinite(x).all()


def test_mass_ordering_and_bounds():
    x = _draws()
    m1, m2 = x[:, 0], x[:, 1]
    assert (m1 >= m2 - 1e-6).all()
    assert (m1 >= 1.0).all() and (m1 <= 100.0).all()
    assert (m2 >= 1.0).all()


def test_angles_in_range():
    x = _draws()
    assert (x[:, 3] >= 0).all() and (x[:, 3] <= 2 * np.pi).all()      # ra
    assert (np.abs(x[:, 4]) <= np.pi / 2).all()                        # dec
    assert (x[:, 5] >= 0).all() and (x[:, 5] <= np.pi).all()           # theta_jn
    assert (x[:, 6] >= 0).all() and (x[:, 6] <= np.pi).all()           # psi
    assert (np.abs(x[:, 8]) <= 1.5).all()                              # t_off
    assert (x[:, 9] >= 0).all() and (x[:, 9] <= 0.99).all()            # a1


def test_isotropy_moments():
    x = _draws()
    # sin(dec) and cos(theta_jn) should be ~U(-1,1): mean 0, var 1/3
    s = np.sin(x[:, 4])
    c = np.cos(x[:, 5])
    assert abs(s.mean()) < 0.05 and abs(s.var() - 1 / 3) < 0.03
    assert abs(c.mean()) < 0.05 and abs(c.var() - 1 / 3) < 0.03


def test_event_structure():
    params, n_sig = jax.jit(sample_batch, static_argnums=(1, 2))(
        jax.random.PRNGKey(3), 2048, CFG)
    n = np.asarray(n_sig)
    assert ((n >= 0) & (n <= CFG.max_signals)).all()
    # mixture fractions: ~5% noise, ~45% overlaps, ~50% single
    assert abs((n == 0).mean() - CFG.noise_fraction) < 0.03
    assert abs((n >= 2).mean() - CFG.overlap_fraction) < 0.04
    assert abs((n == 1).mean() - 0.50) < 0.04


def test_log_prior_finite_on_bbh_draws():
    # BBH-constrained draws must have finite training-prior density
    cfg = PriorConfig(type_probs=(1.0, 0.0, 0.0))
    keys = jax.random.split(jax.random.PRNGKey(5), 512)
    x = jax.jit(jax.vmap(lambda k: sample_signal_params(k, cfg)))(keys)
    lp = np.asarray(jax.jit(jax.vmap(log_prior_bbh))(x))
    assert np.isfinite(lp).all()


def test_log_prior_is_normalized():
    """MC-integrate exp(log_prior_bbh) against an exactly-known uniform
    density over the full support. Regression: the m1 term once subtracted
    lr instead of log(lr), mis-normalizing the whole prior by e^-1.899 —
    invisible to self-normalized weights and marginal KS tests, but fatal
    to evidence estimates and the tempered IS defensive mixture."""
    import math
    rng = np.random.default_rng(0)
    n = 300000
    m1u = rng.uniform(5, 100, n)
    m2u = rng.uniform(5, 100, n)
    th = np.column_stack([
        np.maximum(m1u, m2u), np.minimum(m1u, m2u),
        rng.uniform(50, 2000, n), rng.uniform(0, 2 * math.pi, n),
        rng.uniform(-math.pi / 2, math.pi / 2, n),
        rng.uniform(0, math.pi, n), rng.uniform(0, math.pi, n),
        rng.uniform(0, 2 * math.pi, n), rng.uniform(-1.5, 1.5, n),
        rng.uniform(0, 0.99, n), rng.uniform(0, 0.99, n)])
    log_u = (math.log(2) - 2 * math.log(95) - math.log(1950)
             - 2 * math.log(2 * math.pi) - 3 * math.log(math.pi)
             - math.log(3) - 2 * math.log(0.99))
    lp = np.asarray(jax.jit(jax.vmap(log_prior_bbh))(
        jnp.asarray(th, jnp.float32)), np.float64)
    w = np.exp(np.where(np.isfinite(lp), lp, -np.inf) - log_u)
    assert 0.7 < w.mean() < 1.3, w.mean()


def test_log_prior_rejects_outside():
    x = _draws(4)
    x = x.copy()
    x[0, 0] = 200.0      # m1 beyond BBH bound
    lp = np.asarray(jax.jit(jax.vmap(log_prior_bbh))(jnp.asarray(x)))
    assert np.isneginf(lp[0])


def test_loudness_monotone_in_distance():
    l_near = loudness(jnp.asarray(30.0), jnp.asarray(30.0), jnp.asarray(200.0))
    l_far = loudness(jnp.asarray(30.0), jnp.asarray(30.0), jnp.asarray(800.0))
    assert float(l_near) > float(l_far)
