"""Order per-rank posteriors into an extraction sequence.

Reference semantics (src/ahsd/inference/ranking.py): per-rank posterior
medians -> SNR proxy + 0.5 s whitened strain segments around each inferred
merger -> PriorityNet scores (or the proxy fallback) -> candidate order.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from posteriflow_tpu.models.priority_net import (SEG_LEN, PriorityNet,
                                                 loudness_fallback)
from posteriflow_tpu.physics.constants import DURATION, SAMPLE_RATE


def extract_segments(strain: np.ndarray, t_offs: np.ndarray) -> np.ndarray:
    """[3, T] whitened strain + per-candidate merger offsets [n] ->
    [n, 3, SEG_LEN] segments centered on each inferred merger
    (reference: ranking.py:60-74)."""
    t = strain.shape[-1]
    centers = ((np.asarray(t_offs) + DURATION / 2) * SAMPLE_RATE).astype(int)
    half = SEG_LEN // 2
    out = np.zeros((len(centers), strain.shape[0], SEG_LEN),
                   dtype=np.float32)
    for i, c in enumerate(centers):
        lo = np.clip(c - half, 0, t - SEG_LEN)
        out[i] = strain[:, lo:lo + SEG_LEN]
    return out


_DEFAULT_NET = None
# release export first (git-committed, durable), then the ephemeral
# training dir (model/ is gitignored — weights there do not survive)
_DEFAULT_NET_PATHS = (
    # v7: oracle-residual head + time-crowding features + hard-pair
    # mining — close-pair bin 0.713 / top-1 0.917 / tau 0.812
    # (reports/priority_eval_v7.json; v5 was 0.665/0.904/0.781)
    Path("model_release/priority_v7/priority_params.msgpack"),
    Path("model_release/priority_v5/priority_params.msgpack"),
    Path("model/priority_v5/priority_params.msgpack"),
)


def _default_priority_net():
    """Lazily load the repo's trained PriorityNet when present (reference
    load_priority_net default-checkpoint behavior)."""
    global _DEFAULT_NET
    if _DEFAULT_NET is None:
        for p in _DEFAULT_NET_PATHS:
            if p.exists():
                from posteriflow_tpu.train.train_priority import \
                    load_priority_net
                _DEFAULT_NET = load_priority_net(p)
                break
    return _DEFAULT_NET


def rank_overlapping(results: List, strain: np.ndarray,
                     priority_params=None,
                     priority_model: Optional[PriorityNet] = None,
                     use_default_net: bool = True):
    """results: per-rank PosteriorResults; strain: [3, T] whitened.

    Returns (order, scores): order[i] = index into `results` of the i-th
    highest-priority candidate. Uses, in order: an explicitly passed
    PriorityNet, the repo-trained default (model/priority_v1) when
    present, else the loudness-proxy fallback."""
    medians = np.stack([r.median() for r in results])        # [n, 11]
    segs = extract_segments(strain, medians[:, 8])
    mask = jnp.ones((1, len(results)))

    if priority_model is None and use_default_net:
        loaded = _default_priority_net()
        if loaded is not None:
            priority_model, priority_params = loaded

    if priority_model is not None and priority_params is not None:
        snr_est = None
        if getattr(priority_model, "use_snr_est", False):
            # physics expected SNR of each candidate from its posterior
            # medians (same feature the trainer computes on jittered truth)
            import jax

            from posteriflow_tpu.physics.psd import default_network_asd
            from posteriflow_tpu.physics.simulator import \
                signal_snr_amp_only
            asd = default_network_asd()
            snr_est = jax.jit(jax.vmap(
                lambda q: signal_snr_amp_only(q, asd)))(
                jnp.asarray(medians, dtype=jnp.float32))[None]
        scores, _sigma = priority_model.apply(
            priority_params, jnp.asarray(segs)[None],
            jnp.asarray(medians)[None], mask, snr_est=snr_est)
        scores = np.asarray(scores[0])
    else:
        scores = np.asarray(loudness_fallback(jnp.asarray(medians)))

    order = np.argsort(-scores)
    return order.tolist(), scores.tolist()
