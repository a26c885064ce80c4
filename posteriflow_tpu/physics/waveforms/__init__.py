"""Frequency-domain waveform approximants (pure JAX).

Registry keyed by name, mirroring the reference's per-event-type approximant
dispatch (src/ahsd/data/bilby_pipeline.py:42-47). All approximants share the
signature (freqs, m1, m2, chi1, chi2, d_L, theta_jn, phase) -> (h+, h×).
"""

from posteriflow_tpu.physics.waveforms.imr import (final_state,
                                                   imr_polarizations,
                                                   qnm_frequency)
from posteriflow_tpu.physics.waveforms.taylorf2 import (isco_frequency,
                                                        taylorf2_amp_phase,
                                                        taylorf2_polarizations)

APPROXIMANTS = {
    "TaylorF2": taylorf2_polarizations,
    "IMRPhenomJ": imr_polarizations,      # this framework's IMR construction
}

__all__ = ["APPROXIMANTS", "taylorf2_polarizations", "taylorf2_amp_phase",
           "isco_frequency", "imr_polarizations", "final_state",
           "qnm_frequency"]
