"""Config/logging substrate (reference: src/ahsd/utils/)."""

from posteriflow_tpu.utils.config import (ConfigDict, load_config,
                                          save_config, to_train_config)
from posteriflow_tpu.utils.logging import TimingLogger, setup_logging

__all__ = ["ConfigDict", "load_config", "save_config", "to_train_config",
           "setup_logging", "TimingLogger"]
