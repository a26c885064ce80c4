"""K-noise-realization loss grouping: E_θ[E_noise[NLL]].

Reference surface (src/ahsd/utils/noise_marginalization.py): when a batch
contains K noise realizations per parameter set, average the loss within
each θ-group first so every θ contributes equally regardless of K.

The on-device simulator draws fresh noise every step, which IS the K→∞
limit — these helpers exist for offline datasets generated with
noise_augmentation_k > 1 (scripts/generate_dataset.py) and for variance-
reduction experiments that pair noise draws."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def group_mean_loss(losses: jnp.ndarray, group_ids: jnp.ndarray,
                    n_groups: int) -> jnp.ndarray:
    """Per-sample losses [N] with integer group ids [N] -> mean over groups
    of within-group means (jittable; n_groups static)."""
    sums = jax.ops.segment_sum(losses, group_ids, num_segments=n_groups)
    counts = jax.ops.segment_sum(jnp.ones_like(losses), group_ids,
                                 num_segments=n_groups)
    live = counts > 0
    group_means = jnp.where(live, sums / jnp.maximum(counts, 1.0), 0.0)
    return jnp.sum(group_means) / jnp.maximum(jnp.sum(live), 1.0)


def repeat_params_k_noise(key: jax.Array, params: jnp.ndarray, k: int):
    """[B, ...] parameter sets -> ([B*K, ...] repeated params, [B*K] group
    ids, [B*K] fresh per-copy noise keys) — the K-realizations-per-θ batch
    layout (reference dataset_generator noise_augmentation_k)."""
    b = params.shape[0]
    rep = jnp.repeat(params, k, axis=0)
    gids = jnp.repeat(jnp.arange(b), k)
    keys = jax.random.split(key, b * k)
    return rep, gids, keys
