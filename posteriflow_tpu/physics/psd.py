"""Analytic detector noise spectral densities.

Replaces the reference's bilby PSD files (`PowerSpectralDensity.from_aligo`
/ `.from_advancedvirgo`, reference: src/ahsd/data/bilby_pipeline.py:512-526)
with closed-form design-sensitivity fits so the whole whitening/SNR path is
file-free. Curves are pluggable everywhere (consumers take an [N_RFFT]
array), so measured spectra slot in for real data.

FLOAT32 CONTRACT: PSD values (~1e-47 1/Hz) UNDERFLOW float32 (min normal
1.2e-38), so the device-side interface is the **ASD** (~4e-24, representable)
and consumers divide by ASD before squaring (see whiten.py). PSDs here are
computed host-side in numpy float64; only the ASD is shipped to the device.

aLIGO uses the published broadband analytic fit (Ajith 2011 style),
  S_n(f) = 1e-48 (0.0152 x⁻⁴ + 0.2935 x^{9/4} + 2.7951 x^{3/2}
           − 6.5080 x^{3/4} + 17.7622),  x = f / 245.4 Hz,
which reproduces the zero-detuned high-power curve to tens of percent over
the 20–1024 Hz analysis band (minimum ≈1.4e-47 near 245 Hz). AdVirgo is a
documented approximation: the same family rescaled to the AdV design floor
(ASD minimum ≈4.5e-24 near 270 Hz). Train/whiten/SNR are self-consistent by
construction; swap in measured spectra for LAL-exact work.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from posteriflow_tpu.physics.constants import (DETECTORS, FREQS, N_RFFT,
                                                STRAIN_SCALE)

PSD_FLOOR = 1e-50
PSD_CAP = 1e-38     # value assigned below the low-frequency cutoff


def _aligo_family(f: np.ndarray, f_scale: float, amp: float) -> np.ndarray:
    x = np.maximum(np.asarray(f, dtype=np.float64), 1.0) / f_scale
    s = (0.0152 * x ** -4.0 + 0.2935 * x ** 2.25 + 2.7951 * x ** 1.5
         - 6.5080 * x ** 0.75 + 17.7622)
    return amp * np.maximum(s, PSD_FLOOR / amp)


def aligo_psd(f: np.ndarray, f_cut: float = 10.0) -> np.ndarray:
    """aLIGO zero-detuned high-power design PSD [1/Hz], float64 numpy."""
    s = _aligo_family(f, 245.4, 1e-48)
    return np.where(np.asarray(f) < f_cut, PSD_CAP, s)


def advirgo_psd(f: np.ndarray, f_cut: float = 10.0) -> np.ndarray:
    """Advanced-Virgo-like design PSD: aLIGO family rescaled to the AdV floor
    (≈2.1× aLIGO power, minimum shifted to ≈270 Hz). Approximation — swap in
    a measured PSD where LAL-file parity matters."""
    s = _aligo_family(np.asarray(f) * (245.4 / 270.0), 245.4, 2.1e-48)
    return np.where(np.asarray(f) < f_cut, PSD_CAP, s)


def psd_for(detector: str, f: np.ndarray = FREQS) -> np.ndarray:
    return advirgo_psd(f) if detector == "V1" else aligo_psd(f)


def default_network_psd(freqs: np.ndarray = FREQS) -> np.ndarray:
    """[n_det, N_RFFT] float64 numpy design PSD stack (H1, L1, V1)."""
    return np.stack([psd_for(d, freqs) for d in DETECTORS])


def default_network_asd(freqs: np.ndarray = FREQS) -> jnp.ndarray:
    """[n_det, N_RFFT] float32 DEVICE array of design ASDs in SCALED strain
    units (× constants.STRAIN_SCALE) — the canonical device-side
    representation (see the float32 contract in constants.py)."""
    return jnp.asarray(np.sqrt(default_network_psd(freqs)) * STRAIN_SCALE,
                       dtype=jnp.float32)


def load_asd_file(path, freqs: np.ndarray = FREQS) -> np.ndarray:
    """Measured ASD/PSD text file -> float64 physical ASD on the rfft grid.

    The reference consumes measured spectra through bilby's
    PowerSpectralDensity file machinery (src/ahsd/data/bilby_pipeline.py:
    95-99 via _make_psd, and infer.py --psd); this is the TPU framework's
    equivalent for the standard two-column (frequency, value) text format
    GWOSC/LVK publish (whitespace- or comma-separated, '#' comments).

    - auto-detects ASD vs PSD by magnitude (ASDs ~1e-24..1e-19 strain/√Hz;
      PSDs are their squares, ≤1e-38) and returns the ASD;
    - log-log interpolation onto `freqs` (spectra are smooth in log-log;
      linear interp would overshoot across decades), edge-held outside the
      file's span;
    - below the file's first frequency or 10 Hz the seismic-wall cap
      sqrt(PSD_CAP) applies, matching the analytic curves' convention.

    Feed the result to asd_from_psd(asd**2) — or directly multiply by
    STRAIN_SCALE — for the device-side scaled-ASD convention.
    """
    raw = np.loadtxt(path, comments="#", delimiter=None)
    if raw.ndim != 2 or raw.shape[1] < 2:
        raise ValueError(f"{path}: expected columns (frequency, ASD|PSD)")
    f_file = np.asarray(raw[:, 0], dtype=np.float64)
    v_file = np.asarray(raw[:, 1], dtype=np.float64)
    good = (f_file > 0) & (v_file > 0) & np.isfinite(v_file)
    f_file, v_file = f_file[good], v_file[good]
    if f_file.size < 2:
        raise ValueError(f"{path}: fewer than 2 usable rows")
    order = np.argsort(f_file)
    f_file, v_file = f_file[order], v_file[order]
    if np.median(v_file) < 1e-30:                 # PSD magnitudes
        v_file = np.sqrt(v_file)
    f = np.maximum(np.asarray(freqs, dtype=np.float64), 1e-3)
    asd = np.exp(np.interp(np.log(f), np.log(f_file), np.log(v_file)))
    wall = max(10.0, float(f_file[0]))
    return np.where(np.asarray(freqs) < wall, np.sqrt(PSD_CAP), asd)


def load_network_asd(paths, freqs: np.ndarray = FREQS) -> jnp.ndarray:
    """Per-detector ASD files -> [n_det, N_RFFT] float32 DEVICE array in
    scaled strain units. `paths`: dict {det: path} (missing detectors fall
    back to the design curve) or a sequence ordered like DETECTORS."""
    if isinstance(paths, dict):
        rows = [load_asd_file(paths[d], freqs) if d in paths
                else np.sqrt(psd_for(d, freqs)) for d in DETECTORS]
    else:
        rows = [load_asd_file(p, freqs) for p in paths]
    return jnp.asarray(np.stack(rows) * STRAIN_SCALE, dtype=jnp.float32)


def asd_from_psd(psd: np.ndarray) -> jnp.ndarray:
    """Host float64 physical PSD -> device float32 ASD in scaled strain
    units (× constants.STRAIN_SCALE)."""
    return jnp.asarray(
        np.sqrt(np.maximum(np.asarray(psd, dtype=np.float64), PSD_FLOOR))
        * STRAIN_SCALE, dtype=jnp.float32)


assert N_RFFT == FREQS.shape[0]
