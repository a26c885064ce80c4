"""The asym_q convergence study's likelihood wrapper (scripts/
anchor_convergence) must only ever call the underlying likelihood at
the two batch shapes the committed anchor run already compiled — a
fresh shape costs minutes of tunnel compile — while returning exact
values for any request size."""

import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

from anchor_convergence import CHUNK, _chunked


def _spy_log_l(seen):
    def log_l(theta):
        seen.append(theta.shape[0])
        return np.sum(theta, axis=-1)
    return log_l


def test_chunked_exact_and_shape_canonical():
    rng = np.random.default_rng(0)
    seen = []
    wrapped = _chunked(_spy_log_l(seen))
    for n in (24, 400, 401, 799, 1600):
        theta = rng.normal(size=(n, 15)).astype(np.float32)
        np.testing.assert_allclose(wrapped(theta),
                                   np.sum(theta, axis=-1), rtol=1e-6)
    assert set(seen) <= {24, CHUNK}, f"uncached shapes dispatched: {seen}"


def test_chunked_pads_with_first_row():
    # padding must not poison results (pad rows are sliced off)
    seen = []
    wrapped = _chunked(_spy_log_l(seen), chunk=8, small=2)
    theta = np.arange(10, dtype=np.float32).reshape(5, 2)
    np.testing.assert_allclose(wrapped(theta), theta.sum(-1))
    assert seen == [8]
