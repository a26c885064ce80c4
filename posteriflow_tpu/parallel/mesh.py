"""Mesh construction + canonical shardings.

Parallelism layout (new capability — the reference is single-device, see
SURVEY.md §2.11):

  axis "data"  — batch dimension of simulation, encoding, flow, gradients.
                 At 6M params the model is replicated; gradients reduce over
                 ICI via the partitioner's all-reduce (psum) automatically.
  axis "model" — reserved for tensor-parallel flow ensembles / the long-BNS
                 sequence-sharded config (BASELINE configs[3]); size 1 in
                 the default layout so the same code runs 1-chip and pod.

Everything uses jit + NamedSharding (GSPMD): annotate inputs/outputs, let
XLA insert collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data", "model"),
              model_parallel: int = 1) -> Mesh:
    """1D data-parallel mesh (optionally × model axis) over the first
    n_devices visible devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = np.asarray(devs[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(devs, axis_names=axis_names)


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over "data"; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Apply a batch-leading sharding constraint to every array in a pytree
    (used INSIDE jit on the simulated batch so the partitioner splits
    on-device data synthesis across the mesh)."""
    def constrain(x):
        if x.ndim == 0:
            return x
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))))
    return jax.tree.map(constrain, tree)
