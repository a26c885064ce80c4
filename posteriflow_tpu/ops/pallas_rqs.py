"""Pallas TPU kernel: fused rational-quadratic-spline forward/inverse.

The Pallas twin of ops/rqs.py (same signatures, same math — parity-tested
against it). One kernel fuses, per tile held in VMEM: softmax bin
normalization, knot cumsum, branchless bin selection, the rational-
quadratic evaluation (or its analytic quadratic-root inverse), and the
log-det contribution — so raw conditioner outputs never round-trip to HBM
between those steps.

Status note (honest benchmarking, round 1): after the one-hot-gather
rewrite the XLA version already fuses well (bench.py: 6.3M draws/s/chip vs
the 1e6 target), so the Pallas path is OPTIONAL (flow flag use_pallas /
POSTERIFLOW_PALLAS=1) and off by default until it measures faster on the
training NLL path. It runs in interpreter mode on CPU for tests.

Layout: inputs are flattened to rows [N, D] with raw params [N, D·(3K−1)];
the grid tiles N; inside a tile everything is [TILE, D, ·] elementwise VPU
work with reductions over the last (bin) axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from posteriflow_tpu.ops.rqs import (DEFAULT_MIN_BIN_HEIGHT,
                                     DEFAULT_MIN_BIN_WIDTH,
                                     DEFAULT_MIN_DERIVATIVE)

TILE = 512


def _spline_tile(x, raw, num_bins, tail_bound, inverse):
    """The fused spline body on one VMEM tile.
    x [T, D]; raw [T, D, 3K-1] -> (out [T, D], logdet [T, D])."""
    k = num_bins
    w_raw = raw[..., :k]
    h_raw = raw[..., k:2 * k]
    d_raw = raw[..., 2 * k:]

    w = jax.nn.softmax(w_raw, axis=-1)
    w = DEFAULT_MIN_BIN_WIDTH + (1.0 - DEFAULT_MIN_BIN_WIDTH * k) * w
    h = jax.nn.softmax(h_raw, axis=-1)
    h = DEFAULT_MIN_BIN_HEIGHT + (1.0 - DEFAULT_MIN_BIN_HEIGHT * k) * h

    two_b = 2.0 * tail_bound
    xk = jnp.cumsum(w, axis=-1) * two_b - tail_bound      # right edges
    yk = jnp.cumsum(h, axis=-1) * two_b - tail_bound
    xk = xk.at[..., -1].set(tail_bound)
    yk = yk.at[..., -1].set(tail_bound)
    x_left = jnp.concatenate(
        [jnp.full_like(xk[..., :1], -tail_bound), xk[..., :-1]], axis=-1)
    y_left = jnp.concatenate(
        [jnp.full_like(yk[..., :1], -tail_bound), yk[..., :-1]], axis=-1)

    d_int = DEFAULT_MIN_DERIVATIVE + jax.nn.softplus(d_raw)
    ones = jnp.ones_like(d_int[..., :1])
    d_all = jnp.concatenate([ones, d_int, ones], axis=-1)  # [.., K+1]
    d_lo_all = d_all[..., :-1]
    d_hi_all = d_all[..., 1:]

    inside = jnp.abs(x) <= tail_bound
    xs = jnp.clip(x, -tail_bound, tail_bound)

    # branchless one-hot bin membership
    edges_right = yk if inverse else xk
    idx = jnp.sum((xs[..., None] >= edges_right[..., :-1]).astype(jnp.int32),
                  axis=-1)
    onehot = (idx[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, edges_right.shape, edges_right.ndim - 1)).astype(x.dtype)

    def pick(a):
        return jnp.sum(a * onehot, axis=-1)

    x_lo, y_lo = pick(x_left), pick(y_left)
    wb, hb = pick(w) * two_b, pick(h) * two_b
    d_lo, d_hi = pick(d_lo_all), pick(d_hi_all)
    s = hb / wb
    dsum = d_hi + d_lo - 2.0 * s

    if not inverse:
        theta = jnp.clip((xs - x_lo) / wb, 0.0, 1.0)
    else:
        dy = xs - y_lo
        a = hb * (s - d_lo) + dy * dsum
        b = hb * d_lo - dy * dsum
        c = -s * dy
        disc = jnp.maximum(b * b - 4.0 * a * c, 0.0)
        theta = jnp.clip(2.0 * c / (-b - jnp.sqrt(disc) - 1e-30), 0.0, 1.0)

    t1m = 1.0 - theta
    tt = theta * t1m
    denom = s + dsum * tt
    dydx = (s * s * (d_hi * theta * theta + 2.0 * s * tt + d_lo * t1m * t1m)
            / (denom * denom))
    y_val = y_lo + hb * (s * theta * theta + d_lo * tt) / denom
    out_in = x_lo + theta * wb if inverse else y_val

    out = jnp.where(inside, out_in, x)
    ld = jnp.where(inside, jnp.log(jnp.maximum(dydx, 1e-30)), 0.0)
    ld = jnp.where(inverse, -ld, ld)
    return out, ld


def _kernel(x_ref, raw_ref, out_ref, ld_ref, *, num_bins, tail_bound,
            inverse, d):
    x = x_ref[...]
    raw = raw_ref[...].reshape(x.shape[0], d, 3 * num_bins - 1)
    out, ld = _spline_tile(x, raw, num_bins, tail_bound, inverse)
    out_ref[...] = out
    ld_ref[...] = ld


def _pallas_rqs(x: jnp.ndarray, raw: jnp.ndarray, num_bins: int,
                tail_bound: float, inverse: bool, interpret: bool):
    """x [..., D]; raw [..., D, 3K-1] -> (out [..., D], logdet [...])."""
    batch_shape = x.shape[:-1]
    d = x.shape[-1]
    n = 1
    for s in batch_shape:
        n *= s
    n_raw = 3 * num_bins - 1
    xf = x.reshape(n, d)
    rawf = raw.reshape(n, d * n_raw)

    pad = (-n) % TILE
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
        rawf = jnp.pad(rawf, ((0, pad), (0, 0)))
    n_pad = n + pad

    out, ld = pl.pallas_call(
        functools.partial(_kernel, num_bins=num_bins,
                          tail_bound=tail_bound, inverse=inverse, d=d),
        grid=(n_pad // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d * n_raw), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d), x.dtype),
            jax.ShapeDtypeStruct((n_pad, d), x.dtype),
        ],
        interpret=interpret,
    )(xf, rawf)

    out = out[:n].reshape(*batch_shape, d)
    ld = jnp.sum(ld[:n].reshape(*batch_shape, d), axis=-1)
    return out, ld


def pallas_rqs_forward(x, raw_params, num_bins, tail_bound: float = 5.0,
                       interpret: bool = False):
    """Drop-in for ops.rqs.rqs_forward."""
    return _pallas_rqs(x, raw_params, num_bins, tail_bound, inverse=False,
                       interpret=interpret)


def pallas_rqs_inverse(y, raw_params, num_bins, tail_bound: float = 5.0,
                       interpret: bool = False):
    """Drop-in for ops.rqs.rqs_inverse."""
    return _pallas_rqs(y, raw_params, num_bins, tail_bound, inverse=True,
                       interpret=interpret)
