"""Data layer: real-noise bank, GWTC catalog, dataset I/O
(reference: src/ahsd/data/ minus the physics engine, which lives in
posteriflow_tpu.physics)."""

from posteriflow_tpu.data.noise_bank import (NoiseBank, load_noise_bank,
                                             make_synthetic_bank,
                                             recolor_signal,
                                             sample_real_noise,
                                             save_bank_segment)

__all__ = ["NoiseBank", "load_noise_bank", "make_synthetic_bank",
           "sample_real_noise", "recolor_signal", "save_bank_segment"]
