"""Conditional coupling-layer rational-quadratic-spline flow (flax.linen).

The posterior head of the NPE. Functional twin of the reference's
NSFPosteriorFlow (src/ahsd/models/flows.py:363-779: 10 layers, hidden 256,
16 bins, tail_bound 5.0, standard-normal base, pinned temperature) with one
deliberate architectural change mandated by the TPU design (BASELINE
north_star, SURVEY.md §7 item 3): COUPLING layers instead of autoregressive
MADE. The reference's inverse runs features×layers = 110 sequential
conditioner passes per batch; a coupling inverse is the same single pass as
the forward — each layer is one dense conditioner (MXU) plus an analytic
elementwise spline solve (VPU). Sampling throughput stops being the
bottleneck by construction.

Each layer: fixed permutation → split into (identity, transform) halves →
conditioner MLP(identity ∥ context) emits raw spline params → RQS bijection
on the transform half. Permutations are seeded round-robin shuffles so every
dimension is transformed by ~half the layers and mixes with all others.

NaN/railing hygiene mirrors the reference (flows.py:620-655): sampling
sanitizes non-finite outputs and the scaler's wrap/clamp bounds the result.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from posteriflow_tpu.ops.rqs import rqs_forward, rqs_inverse

# derivative-channel init bias: min_derivative + softplus(b) = 1 exactly,
# i.e. b = log(expm1(1 - min_derivative)) with ops/rqs.py's 1e-3 minimum
_DERIV_BIAS = float(np.log(np.expm1(1.0 - 1e-3)))


def _make_permutations(features: int, num_layers: int,
                       seed: int = 1234) -> np.ndarray:
    """[L, D] deterministic permutations, one per layer."""
    rng = np.random.default_rng(seed)
    perms = []
    for _ in range(num_layers):
        perms.append(rng.permutation(features))
    return np.stack(perms).astype(np.int32)


class Conditioner(nn.Module):
    """MLP (identity half + context) -> raw RQS params for the transform
    half. Zero-init output with a derivative bias solving softplus(b) =
    1 − min_derivative, so every layer starts as the identity map.

    The context enters through its OWN first-layer projection, broadcast-
    added to the x projection. For sampling, callers pass context with a
    broadcast dim ([B, 1, C] against x [B, n, D]) and the context matmul
    runs once per event instead of once per draw — the flow's per-draw cost
    is then independent of context width."""
    n_transform: int
    num_bins: int
    hidden: int = 256
    n_hidden_layers: int = 2
    compute_dtype: jnp.dtype = jnp.bfloat16   # matmul dtype; params stay f32

    @nn.compact
    def __call__(self, x_id: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        dt = self.compute_dtype
        h = nn.gelu(nn.Dense(self.hidden, name="in_x", dtype=dt)(x_id)
                    + nn.Dense(self.hidden, name="in_ctx", dtype=dt)(context))
        for i in range(self.n_hidden_layers - 1):
            h = nn.gelu(nn.Dense(self.hidden, name=f"mid_{i}", dtype=dt)(h))
        n_raw = 3 * self.num_bins - 1
        # final projection accumulates in f32: raw spline params feed the
        # f32 RQS solve (SURVEY.md hard-part (b): spline numerics stay f32)
        out = nn.Dense(self.n_transform * n_raw,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros, name="out",
                       dtype=jnp.float32)(h.astype(jnp.float32))
        out = out.reshape(*out.shape[:-1], self.n_transform, n_raw)
        # identity-at-init: uniform bins (zeros) + unit derivatives
        deriv_bias = jnp.zeros((n_raw,)).at[2 * self.num_bins:].set(
            _DERIV_BIAS)
        return out + deriv_bias


class CouplingNSF(nn.Module):
    """Conditional normalizing flow: data y ∈ [-1,1]^D ↔ base z ~ N(0, I).

    forward  : y -> (z, logdet dz/dy)   [density evaluation / NLL]
    inverse  : z -> (y, logdet dy/dz)   [sampling]
    """
    features: int = 11
    context_features: int = 288
    num_layers: int = 10
    hidden: int = 256
    num_bins: int = 16
    tail_bound: float = 5.0
    compute_dtype: str = "bfloat16"    # conditioner matmul dtype
    use_pallas: bool = False           # fused Pallas spline kernel
                                       # (ops/pallas_rqs.py; XLA path is
                                       # currently as fast — see its note)

    def _rqs(self, inverse: bool):
        if self.use_pallas:
            from posteriflow_tpu.ops.pallas_rqs import (pallas_rqs_forward,
                                                        pallas_rqs_inverse)
            return pallas_rqs_inverse if inverse else pallas_rqs_forward
        return rqs_inverse if inverse else rqs_forward

    def setup(self):
        perms = _make_permutations(self.features, self.num_layers)
        self._perms = [tuple(p) for p in perms]
        self._inv_perms = [tuple(np.argsort(p)) for p in perms]
        n_id = self.features // 2 + self.features % 2          # 6 for D=11
        self._n_id = n_id
        self.conditioners = [
            Conditioner(n_transform=self.features - n_id,
                        num_bins=self.num_bins, hidden=self.hidden,
                        compute_dtype=jnp.dtype(self.compute_dtype),
                        name=f"cond_{i}")
            for i in range(self.num_layers)
        ]

    def _layer_forward(self, i: int, y: jnp.ndarray, context: jnp.ndarray):
        y = y[..., np.asarray(self._perms[i])]
        y_id, y_tr = y[..., :self._n_id], y[..., self._n_id:]
        raw = self.conditioners[i](y_id, context)
        z_tr, ld = self._rqs(False)(y_tr, raw, self.num_bins,
                                    self.tail_bound)
        z = jnp.concatenate([y_id, z_tr], axis=-1)
        return z, ld

    def _layer_inverse(self, i: int, z: jnp.ndarray, context: jnp.ndarray):
        z_id, z_tr = z[..., :self._n_id], z[..., self._n_id:]
        raw = self.conditioners[i](z_id, context)
        y_tr, ld = self._rqs(True)(z_tr, raw, self.num_bins,
                                   self.tail_bound)
        y = jnp.concatenate([z_id, y_tr], axis=-1)
        return y[..., np.asarray(self._inv_perms[i])], ld

    def forward(self, y: jnp.ndarray, context: jnp.ndarray):
        """y [..., D], context [..., C] -> (z, logdet) with logdet [...]."""
        ld_total = jnp.zeros(y.shape[:-1], dtype=y.dtype)
        for i in range(self.num_layers):
            y, ld = self._layer_forward(i, y, context)
            ld_total = ld_total + ld
        return y, ld_total

    def inverse(self, z: jnp.ndarray, context: jnp.ndarray):
        """z [..., D], context [..., C] -> (y, logdet)."""
        ld_total = jnp.zeros(z.shape[:-1], dtype=z.dtype)
        for i in reversed(range(self.num_layers)):
            z, ld = self._layer_inverse(i, z, context)
            ld_total = ld_total + ld
        return z, ld_total

    def log_prob(self, y: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        """log q(y | context) under the standard-normal base (the reference's
        density path: flows.py:727-779 with σ = 1)."""
        z, ld = self.forward(y, context)
        log_base = -0.5 * jnp.sum(z ** 2, axis=-1) \
            - 0.5 * self.features * jnp.log(2.0 * jnp.pi)
        return log_base + ld

    def sample_with_log_prob(self, z: jnp.ndarray, context: jnp.ndarray):
        """Push base samples z through the inverse; returns (y, log q(y)).
        Non-finite outputs are sanitized to 0 (reference: flows.py:626-655)."""
        y, ld = self.inverse(z, context)
        y = jnp.nan_to_num(y, nan=0.0, posinf=0.0, neginf=0.0)
        log_base = -0.5 * jnp.sum(z ** 2, axis=-1) \
            - 0.5 * self.features * jnp.log(2.0 * jnp.pi)
        return y, log_base - ld

    def __call__(self, y: jnp.ndarray, context: jnp.ndarray):
        return self.log_prob(y, context)
