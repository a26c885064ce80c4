"""Real-noise bank: per-segment-whitened detector noise + re-coloring
filters, served as jittable device-side crops.

Reference machinery (experiments/remix_data.py real-noise path +
scripts/download_gwosc_noise_bank.py): a directory of
  {det}_{gps}_strain.npy   float16, per-segment-whitened long strain
  {det}_{gps}_asd.npy      float32 measured ASD of that segment
  design_asd_{det}.npy     the design ASD the training set is whitened to
with, at train time: random 4 s crops (time-flip+sign decorrelation),
design-whitened signals RE-COLORED into the segment's whitening by the
exact linear filter  sig_seg = irfft(rfft(sig_design)·ASD_design/ASD_meas),
and asd_bands = band-mean log(recolor filter) (remix_data.py:203-311).

TPU redesign: the whole bank ships to device once ([n_seg, L] f16 + filter
table [n_seg, N_RFFT] f32); crop selection, flip, re-coloring, and
asd_bands all run INSIDE the jitted training step — no DataLoader workers.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from posteriflow_tpu.physics.constants import (DETECTORS, FREQS, N_RFFT,
                                               N_SAMPLES, SAMPLE_RATE)
from posteriflow_tpu.physics.psd import default_network_psd

RECOLOR_CLAMP = 50.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class NoiseBank:
    """Device-resident bank (a pytree — crosses jit boundaries as data).
    segments [n_det, n_seg, L] float16 whitened strain; recolor
    [n_det, n_seg, N_RFFT] float32 design/measured filter; asd_bands
    [n_det, n_seg, K] precomputed band summaries."""
    segments: jax.Array
    recolor: jax.Array
    asd_bands: jax.Array

    @property
    def n_segments(self) -> int:
        return self.segments.shape[1]

    @property
    def segment_len(self) -> int:
        return self.segments.shape[2]


def _band_mean_log(filt: np.ndarray, psd_bands: int) -> np.ndarray:
    edges = np.geomspace(20.0, SAMPLE_RATE / 2.0, psd_bands + 1)
    out = np.zeros(psd_bands, dtype=np.float32)
    logf = np.log(np.maximum(filt, 1e-30))
    for k in range(psd_bands):
        sel = (FREQS >= edges[k]) & (FREQS < edges[k + 1])
        out[k] = float(logf[sel].mean()) if sel.any() else 0.0
    return out


def load_noise_bank(bank_dir: str | Path, psd_bands: int = 16,
                    max_segments: Optional[int] = None) -> NoiseBank:
    """Load a reference-format bank directory onto the device."""
    bank_dir = Path(bank_dir)
    design = {d: np.load(bank_dir / f"design_asd_{d}.npy")
              for d in DETECTORS}
    segs: Dict[str, list] = {d: [] for d in DETECTORS}
    filts: Dict[str, list] = {d: [] for d in DETECTORS}
    bands: Dict[str, list] = {d: [] for d in DETECTORS}
    for d in DETECTORS:
        for f in sorted(bank_dir.glob(f"{d}_*_strain.npy")):
            asd_f = Path(str(f).replace("_strain", "_asd"))
            if not asd_f.exists():
                continue
            strain = np.load(f).astype(np.float16)
            asd = np.load(asd_f).astype(np.float64)
            filt = np.clip(design[d] / np.maximum(asd, 1e-60),
                           1.0 / RECOLOR_CLAMP, RECOLOR_CLAMP
                           ).astype(np.float32)
            segs[d].append(strain)
            filts[d].append(filt)
            bands[d].append(_band_mean_log(filt, psd_bands))
            if max_segments and len(segs[d]) >= max_segments:
                break
        if not segs[d]:
            raise ValueError(f"noise bank incomplete under {bank_dir}: "
                             f"no segments for {d}")
    n = min(len(segs[d]) for d in DETECTORS)
    length = min(min(s.shape[0] for s in segs[d]) for d in DETECTORS)
    return NoiseBank(
        segments=jnp.asarray(np.stack(
            [np.stack([s[:length] for s in segs[d][:n]])
             for d in DETECTORS])),
        recolor=jnp.asarray(np.stack([np.stack(filts[d][:n])
                                      for d in DETECTORS])),
        asd_bands=jnp.asarray(np.stack([np.stack(bands[d][:n])
                                        for d in DETECTORS])))


def make_synthetic_bank(key: jax.Array, n_segments: int = 4,
                        segment_len: int = 4 * N_SAMPLES,
                        psd_bands: int = 16,
                        sensitivity_jitter: float = 0.3) -> NoiseBank:
    """Synthetic 'real-like' bank for tests/offline work: unit white
    segments whose implied measured ASD differs from design by a smooth
    random factor (so the recolor filter and asd_bands are non-trivial)."""
    k1, k2 = jax.random.split(key)
    segs = jax.random.normal(
        k1, (len(DETECTORS), n_segments, segment_len)).astype(jnp.float16)
    # smooth log-sensitivity deviation per segment
    n_knot = 8
    knots = sensitivity_jitter * jax.random.normal(
        k2, (len(DETECTORS), n_segments, n_knot))
    x = jnp.linspace(0, 1, N_RFFT)
    xk = jnp.linspace(0, 1, n_knot)
    dev = jax.vmap(jax.vmap(lambda kk: jnp.interp(x, xk, kk)))(knots)
    filt = jnp.clip(jnp.exp(dev), 1.0 / RECOLOR_CLAMP, RECOLOR_CLAMP)
    bands = np.stack([[_band_mean_log(np.asarray(filt[d, s]), psd_bands)
                       for s in range(n_segments)]
                      for d in range(len(DETECTORS))])
    return NoiseBank(segments=segs, recolor=filt.astype(jnp.float32),
                     asd_bands=jnp.asarray(bands))


def sample_real_noise(key: jax.Array, bank: NoiseBank):
    """One event's real-noise draw — fully jittable.

    Returns (noise [n_det, N_SAMPLES] f32, recolor [n_det, N_RFFT],
    asd_bands [n_det, K]). Per detector: random segment, random 4 s crop,
    time-flip+sign with p=1/2 (decorrelates reused segments,
    remix_data.py:203-216)."""
    n_det = bank.segments.shape[0]
    k_seg, k_off, k_flip = jax.random.split(key, 3)
    seg_idx = jax.random.randint(k_seg, (n_det,), 0, bank.n_segments)
    off = jax.random.randint(k_off, (n_det,), 0,
                             bank.segment_len - N_SAMPLES)
    flip = jax.random.bernoulli(k_flip, 0.5, (n_det,))

    # Static unroll over detectors + ONE flat dynamic_slice per crop.
    # (The previous vmap(per_det) made `d` a traced index, so
    # segments[d, seg_idx[d]] gathered a full 512 KB segment ROW per
    # draw — ~790 MB of HBM gather traffic per batch-256 event batch,
    # the dominant sim cost once the waveform passes were fixed.)
    crops, filts, bandss = [], [], []
    for d in range(n_det):
        flat = bank.segments[d].reshape(-1)      # metadata-only reshape
        start = seg_idx[d] * bank.segment_len + off[d]
        crop = jax.lax.dynamic_slice(flat, (start,),
                                     (N_SAMPLES,)).astype(jnp.float32)
        crops.append(jnp.where(flip[d], -crop[::-1], crop))
        filts.append(bank.recolor[d, seg_idx[d]])
        bandss.append(bank.asd_bands[d, seg_idx[d]])
    return jnp.stack(crops), jnp.stack(filts), jnp.stack(bandss)


def recolor_signal(sig_white_td: jnp.ndarray,
                   recolor: jnp.ndarray) -> jnp.ndarray:
    """Exact re-coloring of a design-whitened signal into a segment's
    whitening: irfft(rfft(sig)·filter) (remix_data.py:253-258). The filter
    is diagonal in frequency, so it commutes with every linear
    augmentation applied before it."""
    fd = jnp.fft.rfft(sig_white_td, axis=-1)
    return jnp.fft.irfft(fd * recolor, n=sig_white_td.shape[-1], axis=-1)


def save_bank_segment(bank_dir: str | Path, det: str, gps: int,
                      strain_white: np.ndarray, measured_asd: np.ndarray):
    """Write one segment in the reference's bank format."""
    bank_dir = Path(bank_dir)
    bank_dir.mkdir(parents=True, exist_ok=True)
    np.save(bank_dir / f"{det}_{gps}_strain.npy",
            strain_white.astype(np.float16))
    np.save(bank_dir / f"{det}_{gps}_asd.npy",
            measured_asd.astype(np.float32))
    design_f = bank_dir / f"design_asd_{det}.npy"
    if not design_f.exists():
        d = np.sqrt(default_network_psd())
        np.save(design_f, d[list(DETECTORS).index(det)])
