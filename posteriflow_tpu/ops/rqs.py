"""Rational-quadratic-spline bijection (Durkan et al. NSF), pure JAX.

The numerical core of the posterior flow. Unlike the reference — nflows
MaskedPiecewiseRationalQuadraticAutoregressiveTransform, whose INVERSE needs
features×layers (= 110) sequential MADE passes per sample batch
(reference: src/ahsd/models/flows.py:363-655, SURVEY.md §3.1 "the flow
inverse is the dominant cost") — this framework uses these splines inside
COUPLING layers, so both directions are a single fused elementwise pass:
the analytic RQS inverse solves one quadratic per element. That design is
what turns ~1.1e3 draws/s (reference, laptop) into ≥1e6 draws/s/chip.

Linear tails outside [-tail_bound, tail_bound] (identity with logdet 0),
matching the reference flow's tails='linear', tail_bound=5.0
(lean_npe.py:285-295).

Shapes: inputs [..., D]; raw spline parameters [..., D, 3K-1] (K widths,
K heights, K-1 interior derivatives). Everything is elementwise over the
batch and feature dims — VPU-friendly, fuses under XLA, and has a Pallas
twin in ops/pallas_rqs.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def _normalize_params(raw: jnp.ndarray, num_bins: int, tail_bound: float,
                      min_bin_width: float = DEFAULT_MIN_BIN_WIDTH,
                      min_bin_height: float = DEFAULT_MIN_BIN_HEIGHT,
                      min_derivative: float = DEFAULT_MIN_DERIVATIVE):
    """raw [..., 3K-1] -> knot positions/derivatives on [-B, B].

    Returns (x_knots [..., K+1], y_knots [..., K+1], deriv [..., K+1]);
    boundary derivatives pinned to 1 so the spline meets the identity tails
    with a continuous derivative (the standard 'linear tails' construction).
    """
    w_raw = raw[..., :num_bins]
    h_raw = raw[..., num_bins:2 * num_bins]
    d_raw = raw[..., 2 * num_bins:]

    widths = jax.nn.softmax(w_raw, axis=-1)
    widths = min_bin_width + (1.0 - min_bin_width * num_bins) * widths
    heights = jax.nn.softmax(h_raw, axis=-1)
    heights = min_bin_height + (1.0 - min_bin_height * num_bins) * heights

    two_b = 2.0 * tail_bound
    x_knots = jnp.concatenate(
        [jnp.zeros_like(widths[..., :1]), jnp.cumsum(widths, axis=-1)],
        axis=-1) * two_b - tail_bound
    y_knots = jnp.concatenate(
        [jnp.zeros_like(heights[..., :1]), jnp.cumsum(heights, axis=-1)],
        axis=-1) * two_b - tail_bound
    # exact endpoints despite cumsum rounding
    x_knots = x_knots.at[..., -1].set(tail_bound)
    y_knots = y_knots.at[..., -1].set(tail_bound)

    d_interior = min_derivative + jax.nn.softplus(d_raw)
    ones = jnp.ones_like(d_interior[..., :1])
    deriv = jnp.concatenate([ones, d_interior, ones], axis=-1)
    return x_knots, y_knots, deriv


def _searchsorted(knots: jnp.ndarray, x: jnp.ndarray,
                  num_bins: int) -> jnp.ndarray:
    """Bin index of x in its own knot row: count of interior knots <= x.
    knots [..., K+1], x [...] -> int32 [...] in [0, K-1]."""
    inner = knots[..., 1:-1]                       # [..., K-1]
    idx = jnp.sum(x[..., None] >= inner, axis=-1)
    return jnp.clip(idx, 0, num_bins - 1)


def _gather_bin(a: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """a [..., K+1], idx [...] -> a[..., idx] elementwise.

    One-hot contraction instead of take_along_axis: TPU lowers dynamic
    gathers poorly, while a K+1-wide masked sum is a handful of fused VPU
    ops."""
    k = a.shape[-1]
    onehot = (idx[..., None] == jnp.arange(k)).astype(a.dtype)
    return jnp.sum(a * onehot, axis=-1)


def rqs_forward(x: jnp.ndarray, raw_params: jnp.ndarray, num_bins: int,
                tail_bound: float = 5.0):
    """y = f(x), log|f'(x)| — elementwise spline with identity tails.

    x [..., D]; raw_params [..., D, 3K-1]. Returns (y, logdet) with logdet
    summed over the last axis.
    """
    xk, yk, dk = _normalize_params(raw_params, num_bins, tail_bound)
    inside = jnp.abs(x) <= tail_bound
    xs = jnp.clip(x, -tail_bound, tail_bound)

    idx = _searchsorted(xk, xs, num_bins)
    x_lo = _gather_bin(xk, idx)
    x_hi = _gather_bin(xk, idx + 1)
    y_lo = _gather_bin(yk, idx)
    y_hi = _gather_bin(yk, idx + 1)
    d_lo = _gather_bin(dk, idx)
    d_hi = _gather_bin(dk, idx + 1)

    w = x_hi - x_lo
    h = y_hi - y_lo
    s = h / w                                       # bin slope
    theta = jnp.clip((xs - x_lo) / w, 0.0, 1.0)
    t1m = 1.0 - theta
    tt = theta * t1m

    denom = s + (d_hi + d_lo - 2.0 * s) * tt
    y_in = y_lo + h * (s * theta ** 2 + d_lo * tt) / denom
    dydx = (s ** 2 * (d_hi * theta ** 2 + 2.0 * s * tt + d_lo * t1m ** 2)
            / denom ** 2)

    y = jnp.where(inside, y_in, x)
    ld = jnp.where(inside, jnp.log(jnp.maximum(dydx, 1e-30)), 0.0)
    return y, jnp.sum(ld, axis=-1)


def rqs_inverse(y: jnp.ndarray, raw_params: jnp.ndarray, num_bins: int,
                tail_bound: float = 5.0):
    """x = f⁻¹(y), log|df⁻¹/dy| — analytic quadratic solve per element
    (NO iteration, NO sequential passes). Same shapes as rqs_forward."""
    xk, yk, dk = _normalize_params(raw_params, num_bins, tail_bound)
    inside = jnp.abs(y) <= tail_bound
    ys = jnp.clip(y, -tail_bound, tail_bound)

    idx = _searchsorted(yk, ys, num_bins)
    x_lo = _gather_bin(xk, idx)
    x_hi = _gather_bin(xk, idx + 1)
    y_lo = _gather_bin(yk, idx)
    y_hi = _gather_bin(yk, idx + 1)
    d_lo = _gather_bin(dk, idx)
    d_hi = _gather_bin(dk, idx + 1)

    w = x_hi - x_lo
    h = y_hi - y_lo
    s = h / w
    dy = ys - y_lo
    dsum = d_hi + d_lo - 2.0 * s

    # Solve a·θ² + b·θ + c = 0 for θ ∈ [0,1] (Durkan et al. appendix):
    a = h * (s - d_lo) + dy * dsum
    b = h * d_lo - dy * dsum
    c = -s * dy
    disc = jnp.maximum(b ** 2 - 4.0 * a * c, 0.0)
    # numerically-stable root: θ = 2c / (−b − √disc)
    theta = 2.0 * c / (-b - jnp.sqrt(disc) - 1e-30)
    theta = jnp.clip(theta, 0.0, 1.0)

    x_in = x_lo + theta * w
    t1m = 1.0 - theta
    tt = theta * t1m
    denom = s + dsum * tt
    dydx = (s ** 2 * (d_hi * theta ** 2 + 2.0 * s * tt + d_lo * t1m ** 2)
            / denom ** 2)

    x = jnp.where(inside, x_in, y)
    ld = jnp.where(inside, -jnp.log(jnp.maximum(dydx, 1e-30)), 0.0)
    return x, jnp.sum(ld, axis=-1)
