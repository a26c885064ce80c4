"""Mesh construction + canonical shardings, single-host and multi-host.

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

Multi-host/multi-slice (SURVEY.md §5 "distributed communication backend"):
`init_distributed()` wires `jax.distributed.initialize` (TPU pods
auto-discover; CPU/GPU fleets pass coordinator/num/id explicitly), and
`make_mesh` builds a DCN-aware layout — the DATA axis is laid out with the
slowest-varying mesh dimension across processes, so the only cross-slice
traffic is the gradient all-reduce (rides DCN once per step) while every
other collective stays on ICI. Validate without hardware via
`XLA_FLAGS=--xla_force_host_platform_device_count=N` per process (see
tests/test_multihost.py).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

log = logging.getLogger("posteriflow.parallel")


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize the multi-process JAX runtime (idempotent).

    On TPU pods all arguments auto-discover from the metadata server; on
    CPU/GPU test fleets pass them (or set JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID). Returns jax.process_count().
    No-op when the runtime is already initialized or single-process with
    no coordinator configured.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    # already-initialized check WITHOUT touching the backend —
    # jax.process_count() would initialize XLA, after which
    # jax.distributed.initialize() refuses to run. Prefer the public API
    # (newer JAX); fall back to the private state probe, whose layout may
    # drift across releases — hence also the RuntimeError catch below.
    try:
        already = jax.distributed.is_initialized()
    except AttributeError:
        try:
            from jax._src import distributed as _dist_state
            already = getattr(_dist_state.global_state, "client",
                              None) is not None
        except Exception:
            already = False
    if already:
        return jax.process_count()
    if coordinator_address is None and num_processes in (None, 1):
        return 1                            # single-process run
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:               # last-resort re-entry guard
        if "already initialized" not in str(e).lower():
            raise
    log.info("jax.distributed: process %d/%d, %d local / %d global devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())
    return jax.process_count()


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data", "model"),
              model_parallel: int = 1) -> Mesh:
    """Data-parallel mesh (optionally × model axis).

    Single-process: the first n_devices visible devices. Multi-process:
    n_devices must be None or the GLOBAL device count (a multi-host mesh
    cannot silently truncate — every process's local devices must appear
    exactly once), and the device grid is ordered process-major so the
    "data" axis's major dimension spans processes: within one slice the
    gradient psum rides ICI, across slices exactly one DCN all-reduce.
    """
    n_proc = jax.process_count()
    if n_proc > 1:
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        n = len(devs)
        if n_devices is not None and n_devices != n:
            raise ValueError(
                f"multi-process mesh must use all {n} global devices; "
                f"got n_devices={n_devices} (a truncated mesh would drop "
                "some process's local devices)")
        if n % model_parallel:
            raise ValueError(f"{n} devices not divisible by "
                             f"model_parallel={model_parallel}")
        grid = np.asarray(devs).reshape(n // model_parallel, model_parallel)
        return Mesh(grid, axis_names=axis_names)
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
