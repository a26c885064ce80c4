"""ctypes bindings for the native noise-bank crop server (runtime/bankd.cpp).

The native path exists for banks too large to live in HBM: segments stay
memmapped on the host; each training step asks for [n, 3, T] float32 crops
(multithreaded f16→f32 with flip/sign decorrelation) into a staging buffer
that is then device_put. Falls back transparently to the pure-numpy path
when the shared library hasn't been built (`make -C runtime`).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from posteriflow_tpu.physics.constants import DETECTORS, N_SAMPLES

_LIB_PATH = Path(__file__).resolve().parents[2] / "runtime" / "libpfbank.so"


def build_native(quiet: bool = True) -> bool:
    """Compile the shared library in-place; returns success."""
    try:
        subprocess.run(["make", "-C", str(_LIB_PATH.parent)],
                       check=True, capture_output=quiet)
        return _LIB_PATH.exists()
    except Exception:
        return False


def _load_lib() -> Optional[ctypes.CDLL]:
    if not _LIB_PATH.exists() and not build_native():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.pf_bank_open.restype = ctypes.c_void_p
    lib.pf_bank_open.argtypes = [ctypes.c_char_p]
    lib.pf_bank_n_segments.restype = ctypes.c_int
    lib.pf_bank_n_segments.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.pf_bank_sample.restype = ctypes.c_int
    lib.pf_bank_sample.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int]
    lib.pf_bank_close.restype = None
    lib.pf_bank_close.argtypes = [ctypes.c_void_p]
    return lib


class NativeBankServer:
    """Host-side crop server. sample(seed, n) -> (crops [n,3,T] f32,
    seg_idx [n,3] i32). Deterministic in (seed, event index)."""

    def __init__(self, bank_dir: str | Path, n_threads: int = 4):
        self.bank_dir = Path(bank_dir)
        self.n_threads = n_threads
        self._lib = _load_lib()
        self._handle = None
        if self._lib is not None:
            h = self._lib.pf_bank_open(str(self.bank_dir).encode())
            self._handle = h or None
        if self._handle is None:
            # numpy fallback: memmap the same files
            self._segments = {
                d: [np.load(f, mmap_mode="r") for f in
                    sorted(self.bank_dir.glob(f"{d}_*_strain.npy"))]
                for d in DETECTORS}
            if any(not v for v in self._segments.values()):
                raise ValueError(f"no bank segments under {self.bank_dir}")

    @property
    def native(self) -> bool:
        return self._handle is not None

    def n_segments(self, det: int = 0) -> int:
        if self.native:
            return self._lib.pf_bank_n_segments(
                ctypes.c_void_p(self._handle), det)
        return len(self._segments[DETECTORS[det]])

    def sample(self, seed: int, n_events: int,
               crop_len: int = N_SAMPLES) -> Tuple[np.ndarray, np.ndarray]:
        out = np.empty((n_events, 3, crop_len), dtype=np.float32)
        idx = np.empty((n_events, 3), dtype=np.int32)
        if self.native:
            rc = self._lib.pf_bank_sample(
                ctypes.c_void_p(self._handle), ctypes.c_uint64(seed),
                n_events, crop_len,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                self.n_threads)
            if rc != 0:
                raise RuntimeError(f"pf_bank_sample failed rc={rc}")
            return out, idx
        # numpy fallback (distributionally identical; different RNG stream)
        rng = np.random.default_rng(seed)
        for i in range(n_events):
            for d, det in enumerate(DETECTORS):
                segs = self._segments[det]
                k = int(rng.integers(len(segs)))
                seg = segs[k]
                off = int(rng.integers(0, len(seg) - crop_len + 1))
                c = np.asarray(seg[off:off + crop_len], dtype=np.float32)
                if rng.uniform() < 0.5:
                    c = -c[::-1]
                out[i, d] = c
                idx[i, d] = k
        return out, idx

    def close(self):
        if self.native and self._handle is not None:
            self._lib.pf_bank_close(ctypes.c_void_p(self._handle))
            self._handle = None
