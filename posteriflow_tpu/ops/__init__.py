"""Numerical kernels: pure-JAX references + Pallas TPU twins."""

from posteriflow_tpu.ops.rqs import rqs_forward, rqs_inverse

__all__ = ["rqs_forward", "rqs_inverse"]
