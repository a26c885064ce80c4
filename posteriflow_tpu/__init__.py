"""posteriflow-tpu: TPU-native amortized neural posterior estimation for
compact-binary gravitational-wave signals, in JAX.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of PosteriFlow
(reference layer map: SURVEY.md §1). The physics simulator
(IMRPhenom-style frequency-domain waveforms, detector projection, PSD
whitening) is pure jittable JAX so training data is synthesized on-device;
the posterior flow is a coupling-layer rational-quadratic-spline flow with
O(1)-depth analytic inversion; training shards simulation+gradient batches
data-parallel over an ICI mesh via jit-with-shardings.

Public surface mirrors the reference's `ahsd` package
(reference: src/ahsd/__init__.py):

    posteriflow_tpu.physics     — waveforms, detectors, PSDs, simulator
    posteriflow_tpu.models      — encoders, flows, NPE, PriorityNet
    posteriflow_tpu.ops         — Pallas kernels + pure-JAX references
    posteriflow_tpu.train       — jitted trainer, diagnostics, gates
    posteriflow_tpu.parallel    — mesh/sharding helpers
    posteriflow_tpu.inference   — infer(), PosteriorResult, OOD, gating, IS
    posteriflow_tpu.evaluation  — metrics, benchmarks, validation
"""

__version__ = "0.1.0"

PARAM_NAMES = (
    "mass_1", "mass_2", "luminosity_distance",
    "ra", "dec", "theta_jn", "psi", "phase",
    "geocent_time", "a1", "a2",
)
N_PARAMS = len(PARAM_NAMES)

# The full 15-parameter precessing-BBH set (BASELINE.json north star:
# "15-parameter BBH NPE"): the 11 base parameters with a1/a2 reinterpreted
# as total spin MAGNITUDES plus the standard precession angles at the
# reference frequency — tilt_i = angle(S_i, L), phi_12 = azimuth between
# the in-plane spin components, phi_jl = azimuth of L about J. This is the
# parameterization the reference NAMES via IMRPhenomXP but never samples
# (it pins tilt_1 = tilt_2 = 0: reference src/ahsd/data/
# bilby_pipeline.py:63-65); here it is a first-class trained flow.
PARAM_NAMES_PRECESSING = PARAM_NAMES + (
    "tilt_1", "tilt_2", "phi_12", "phi_jl",
)
N_PARAMS_PRECESSING = len(PARAM_NAMES_PRECESSING)
