"""Host-side real-noise feed: the native crop server + async device_put.

Completes the big-bank story (data/noise_bank.py keeps small banks in HBM;
runtime/bankd.cpp serves memmapped crops for banks larger than HBM): a
background thread keeps the NEXT batch of crops staged on device while the
current training step runs, so the host path never stalls the TPU.

The feed supplies (noise [B,3,T], recolor [B,3,F], asd_bands [B,3,K]) —
exactly the per-event quantities simulate_batch consumes via its
`real_feed` argument.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Optional, Tuple

import jax
import numpy as np

from posteriflow_tpu.data.native_bank import NativeBankServer
from posteriflow_tpu.data.noise_bank import RECOLOR_CLAMP, _band_mean_log
from posteriflow_tpu.physics.constants import DETECTORS, N_SAMPLES


class HostNoiseFeed:
    """Prefetching real-noise batch source backed by the native server.

    next() -> (noise, recolor, asd_bands) as DEVICE arrays for B events;
    deterministic in (seed, batch index)."""

    def __init__(self, bank_dir: str | Path, batch_size: int,
                 psd_bands: int = 16, seed: int = 0, depth: int = 2,
                 n_threads: int = 4):
        self.bank_dir = Path(bank_dir)
        self.batch_size = batch_size
        self.seed = seed
        self.server = NativeBankServer(self.bank_dir, n_threads=n_threads)

        # per-segment recolor filters + band summaries (host, tiny)
        design = {d: np.load(self.bank_dir / f"design_asd_{d}.npy")
                  for d in DETECTORS}
        self._filters, self._bands = [], []
        for d in DETECTORS:
            fs, bs = [], []
            for f in sorted(self.bank_dir.glob(f"{d}_*_strain.npy")):
                asd = np.load(Path(str(f).replace("_strain", "_asd"))
                              ).astype(np.float64)
                filt = np.clip(design[d] / np.maximum(asd, 1e-60),
                               1.0 / RECOLOR_CLAMP, RECOLOR_CLAMP
                               ).astype(np.float32)
                fs.append(filt)
                bs.append(_band_mean_log(filt, psd_bands))
            self._filters.append(np.stack(fs))
            self._bands.append(np.stack(bs))

        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._idx = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _make(self, i: int):
        crops, seg_idx = self.server.sample(
            seed=self.seed * 1_000_003 + i, n_events=self.batch_size,
            crop_len=N_SAMPLES)
        recolor = np.stack([self._filters[d][seg_idx[:, d]]
                            for d in range(len(DETECTORS))], axis=1)
        bands = np.stack([self._bands[d][seg_idx[:, d]]
                          for d in range(len(DETECTORS))], axis=1)
        return (jax.device_put(crops), jax.device_put(recolor),
                jax.device_put(bands))

    def _producer(self):
        i = 0
        while not self._stop.is_set():
            item = self._make(i)
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.5)
                    break
                except queue.Full:
                    continue
            i += 1

    def next(self) -> Tuple[jax.Array, jax.Array, jax.Array]:
        return self._q.get()

    def close(self):
        self._stop.set()
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=2.0)
        self.server.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()
