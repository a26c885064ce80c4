"""Training layer: jitted simulate+train steps, diagnostics, gates
(reference: experiments/train_lean_npe.py)."""

from posteriflow_tpu.train.diagnostics import make_diagnostics
from posteriflow_tpu.train.trainer import (TrainConfig, TrainState,
                                           batch_nll, init_state,
                                           make_eval_nll, make_optimizer,
                                           make_train_step)

__all__ = ["TrainConfig", "TrainState", "init_state", "make_train_step",
           "make_eval_nll", "make_optimizer", "batch_nll",
           "make_diagnostics"]
