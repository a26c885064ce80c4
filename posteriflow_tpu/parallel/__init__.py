"""Device-mesh / sharding helpers (the framework's parallelism substrate).

The reference is single-device (SURVEY.md §2.11); everything here is NEW
TPU-native capability: data-parallel simulate+train over ICI via jit with
NamedShardings, batched vmapped inference, and (later) sequence sharding
for the long-BNS config.
"""

from posteriflow_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                           replicated, shard_batch)

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch"]
