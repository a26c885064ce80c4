"""Frequency-domain waveform approximants (pure JAX).

Registry keyed by name, mirroring the reference's per-event-type approximant
dispatch (src/ahsd/data/bilby_pipeline.py:42-47). All approximants share the
signature (freqs, m1, m2, chi1, chi2, d_L, theta_jn, phase) -> (h+, h×).

The production default (`imr_polarizations`) is IMRPhenomD built from the
published coefficient tables (phenomd.py); the round-1 phenomenological
stitch stays registered as the regression baseline ("IMRPhenomJ").
"""

from posteriflow_tpu.physics.waveforms.imr import (final_state,
                                                   imr_stitch_polarizations,
                                                   qnm_frequency)
from posteriflow_tpu.physics.waveforms.phenomd import (phenomd_amp_phase,
                                                       phenomd_polarizations)
from posteriflow_tpu.physics.waveforms.taylorf2 import (isco_frequency,
                                                        taylorf2_amp_phase,
                                                        taylorf2_polarizations)
from posteriflow_tpu.physics.waveforms.precession import (
    phenomp_polarizations, precession_angles, twist_factors)
from posteriflow_tpu.physics.waveforms.tidal import (
    lambda_from_mass, matter_effects, phenomd_matter_polarizations,
    tidal_phase)

# the framework-wide production approximant: PhenomD with mass-keyed matter
# effects — the branchless equivalent of the reference's per-event-type
# dispatch (bilby_pipeline.py:42-47): BBH reduces bit-exactly to PhenomD,
# BNS gets tidal phase + merger taper, NSBH secondary tidal + disruption
# taper (tidal.py)
imr_polarizations = phenomd_matter_polarizations

APPROXIMANTS = {
    "TaylorF2": taylorf2_polarizations,
    "IMRPhenomD": phenomd_polarizations,
    "IMRPhenomD_Matter": phenomd_matter_polarizations,   # production
    # precessing twist-up; the standard-signature entry runs chi_p = 0
    # (the reference's actual behavior — it names IMRPhenomXP but zeroes
    # every tilt, bilby_pipeline.py:63-65). Precessing injections call
    # precession.phenomp_polarizations with chi_p > 0 explicitly.
    "IMRPhenomP_Matter": phenomp_polarizations,
    "IMRPhenomJ": imr_stitch_polarizations,   # round-1 stitch (baseline)
}

__all__ = ["APPROXIMANTS", "taylorf2_polarizations", "taylorf2_amp_phase",
           "isco_frequency", "imr_polarizations", "phenomd_polarizations",
           "phenomd_amp_phase", "phenomd_matter_polarizations",
           "matter_effects", "tidal_phase", "lambda_from_mass",
           "phenomp_polarizations", "precession_angles", "twist_factors",
           "imr_stitch_polarizations", "final_state", "qnm_frequency"]
