"""Physical constants and framework-wide data conventions.

Values follow the CODATA/IAU conventions used by LALSuite so waveform
amplitudes/timescales agree with the reference's bilby/LAL stack
(reference: src/ahsd/data/config.py:9-30, src/ahsd/data/bilby_pipeline.py:36-39).
"""

import numpy as np

# ── Fundamental constants (SI) ───────────────────────────────────────────────
C_SI = 299792458.0                  # speed of light [m/s]
G_SI = 6.67430e-11                  # gravitational constant [m^3 kg^-1 s^-2]
MSUN_SI = 1.988409870698051e30      # solar mass [kg]
MTSUN_SI = 4.925490947641267e-6     # G*Msun/c^3 [s] — one solar mass in seconds
MRSUN_SI = 1.476625038050125e3      # G*Msun/c^2 [m] — one solar mass in meters
MPC_SI = 3.085677581491367e22      # megaparsec [m]

EULER_GAMMA = 0.5772156649015329

# ── float32 strain units ─────────────────────────────────────────────────────
# GW strain (~1e-23) squares below the float32 subnormal range, and XLA's
# algebraic simplifier freely rewrites (a/b)² -> a²/b² (measured: 0/0 -> NaN
# in fused SNR reductions). ALL device-side strain-domain quantities —
# waveform amplitudes, ASDs, raw/colored strain — therefore carry a fixed
# 1e23 scale ("scaled strain units"). Whitened quantities are ratios, so the
# scale cancels and whitened data is identical to the unscaled convention.
# Physical export divides by STRAIN_SCALE.
STRAIN_SCALE = 1e23

# ── Data conventions (match the reference generation pipeline) ───────────────
SAMPLE_RATE = 4096                  # Hz
DURATION = 4.0                      # s
N_SAMPLES = int(SAMPLE_RATE * DURATION)        # 16384
N_RFFT = N_SAMPLES // 2 + 1                     # 8193
DELTA_F = 1.0 / DURATION                        # 0.25 Hz
DELTA_T = 1.0 / SAMPLE_RATE
F_LOWER = 20.0                      # analysis band lower edge [Hz]
F_UPPER = 1024.0                    # encoder band upper edge [Hz]
F_NYQUIST = SAMPLE_RATE / 2.0       # 2048 Hz
F_REF = 50.0                        # waveform reference frequency [Hz]

DETECTORS = ("H1", "L1", "V1")
N_DETECTORS = len(DETECTORS)

# O4-era reference GPS epoch (2023-05-24 18:00:00 UTC). The 4 s data window is
# [GPS_REF - 2, GPS_REF + 2]; geocent_time labels are offsets from GPS_REF
# (reference: src/ahsd/data/parameter_sampler.py:23, bilby_pipeline.py:39).
GPS_REF = 1369224018.0

# rfft frequency grid for the canonical window (float64 for phase accuracy)
FREQS = np.fft.rfftfreq(N_SAMPLES, DELTA_T)     # [N_RFFT], 0 .. 2048 Hz
