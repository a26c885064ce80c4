"""Pallas RQS kernel parity vs the pure-JAX reference (interpret mode on
CPU; the same kernel compiles natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posteriflow_tpu.ops.pallas_rqs import (pallas_rqs_forward,
                                            pallas_rqs_inverse)
from posteriflow_tpu.ops.rqs import rqs_forward, rqs_inverse

K = 8


@pytest.fixture(scope="module")
def data():
    kx, kr = jax.random.split(jax.random.PRNGKey(0))
    x = jnp.clip(jax.random.normal(kx, (300, 5)) * 2.5, -6.0, 6.0)
    raw = jax.random.normal(kr, (300, 5, 3 * K - 1)) * 0.7
    return x, raw


def test_forward_parity(data):
    x, raw = data
    y_ref, ld_ref = rqs_forward(x, raw, K)
    y_pl, ld_pl = pallas_rqs_forward(x, raw, K, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld_pl), np.asarray(ld_ref),
                               atol=2e-4)


def test_inverse_parity(data):
    x, raw = data
    y_ref, ld_ref = rqs_inverse(x, raw, K)
    y_pl, ld_pl = pallas_rqs_inverse(x, raw, K, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(ld_pl), np.asarray(ld_ref),
                               atol=2e-4)


def test_roundtrip_through_kernel(data):
    x, raw = data
    x_in = jnp.clip(x, -4.9, 4.9)
    y, ld = pallas_rqs_forward(x_in, raw, K, interpret=True)
    x2, ld2 = pallas_rqs_inverse(y, raw, K, interpret=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x_in), atol=3e-5)
    np.testing.assert_allclose(np.asarray(ld + ld2), 0.0, atol=3e-4)


def test_non_multiple_of_tile(data):
    """Row counts that don't divide the tile pad correctly."""
    x, raw = data
    y_ref, _ = rqs_forward(x[:37], raw[:37], K)
    y_pl, _ = pallas_rqs_forward(x[:37], raw[:37], K, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               atol=2e-5)
