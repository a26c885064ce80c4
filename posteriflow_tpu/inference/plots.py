"""Diagnostic plots: PP-plots, SBC histograms, whitened-strain
reconstruction overlays, marginal CDFs.

Reference surface (src/ahsd/inference/plots.py + the PP/SBC figures of
scripts/lean_npe_diagnostics.py). matplotlib only (corner-pkg optional in
the reference; result.plot_corner covers that surface).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from posteriflow_tpu import PARAM_NAMES


def _mpl():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def pp_plot(ranks: np.ndarray, live: Optional[np.ndarray], n_post: int,
            path: str | Path, param_names: Sequence[str] = PARAM_NAMES):
    """Probability–probability plot from SBC ranks [N, P]: for a calibrated
    posterior the empirical CDF of rank quantiles is the diagonal. The
    BASELINE.json headline calibration figure."""
    plt = _mpl()
    ranks = np.asarray(ranks)
    if live is not None:
        ranks = ranks[np.asarray(live) > 0]
    u = (ranks + 0.5) / (n_post + 1.0)
    n = u.shape[0]
    grid = np.linspace(0, 1, 101)
    fig, ax = plt.subplots(figsize=(6, 6))
    # 3σ binomial confidence band around the diagonal
    band = 3.0 * np.sqrt(grid * (1 - grid) / max(n, 1))
    ax.fill_between(grid, grid - band, grid + band, color="0.9",
                    label=r"3σ band")
    for j, name in enumerate(param_names):
        ecdf = np.searchsorted(np.sort(u[:, j]), grid) / max(n, 1)
        ax.plot(grid, ecdf, lw=1, label=name)
    ax.plot([0, 1], [0, 1], "k--", lw=1)
    ax.set_xlabel("credible level")
    ax.set_ylabel("empirical coverage")
    ax.set_title(f"PP plot ({n} events × {n_post} draws)")
    ax.legend(fontsize=7, ncol=2)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def sbc_histograms(ranks: np.ndarray, n_post: int, path: str | Path,
                   param_names: Sequence[str] = PARAM_NAMES,
                   n_bins: int = 20):
    """Per-parameter SBC rank histograms (uniform = calibrated)."""
    plt = _mpl()
    ranks = np.asarray(ranks)
    fig, axes = plt.subplots(3, 4, figsize=(14, 8))
    expect = ranks.shape[0] / n_bins
    for j, name in enumerate(param_names):
        ax = axes.flat[j]
        ax.hist(ranks[:, j], bins=n_bins, range=(0, n_post),
                color="#4477aa")
        ax.axhline(expect, color="k", ls="--", lw=1)
        ax.set_title(name, fontsize=9)
    for j in range(len(param_names), 12):
        axes.flat[j].axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def reconstruction_overlay(strain_white: np.ndarray,
                           samples: np.ndarray, path: str | Path,
                           n_draws: int = 20, window_s: float = 1.0):
    """Whitened data with posterior-draw waveform reconstructions overlaid
    around the inferred merger (reference: plots.py reconstruction plot)."""
    import jax.numpy as jnp
    from posteriflow_tpu.physics.constants import (DETECTORS, DURATION,
                                                   SAMPLE_RATE)
    from posteriflow_tpu.physics.psd import default_network_asd
    from posteriflow_tpu.physics.simulator import signal_white_fd
    from posteriflow_tpu.physics.whiten import fd_white_to_td

    plt = _mpl()
    asd = default_network_asd()
    t_med = float(np.median(samples[:, 8]))
    c = int((t_med + DURATION / 2) * SAMPLE_RATE)
    half = int(window_s * SAMPLE_RATE / 2)
    lo, hi = max(c - half, 0), min(c + half, strain_white.shape[-1])
    t_axis = (np.arange(lo, hi) / SAMPLE_RATE) - DURATION / 2

    fig, axes = plt.subplots(3, 1, figsize=(12, 8), sharex=True)
    idx = np.random.default_rng(0).choice(len(samples),
                                          min(n_draws, len(samples)),
                                          replace=False)
    recon = np.stack([
        np.asarray(fd_white_to_td(signal_white_fd(
            jnp.asarray(samples[i], dtype=jnp.float32), asd)))
        for i in idx])
    for d, det in enumerate(DETECTORS):
        ax = axes[d]
        ax.plot(t_axis, strain_white[d, lo:hi], color="0.6", lw=0.5,
                label="whitened data")
        for r in recon:
            ax.plot(t_axis, r[d, lo:hi], color="#cc3311", alpha=0.15,
                    lw=0.8)
        ax.set_ylabel(det)
    axes[0].legend(loc="upper left", fontsize=8)
    axes[-1].set_xlabel("time from window center [s]")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path


def marginal_cdfs(samples: np.ndarray, path: str | Path,
                  truths: Optional[np.ndarray] = None,
                  param_names: Sequence[str] = PARAM_NAMES):
    plt = _mpl()
    fig, axes = plt.subplots(3, 4, figsize=(14, 8))
    for j, name in enumerate(param_names):
        ax = axes.flat[j]
        s = np.sort(samples[:, j])
        ax.plot(s, np.linspace(0, 1, len(s)), color="#4477aa")
        if truths is not None:
            ax.axvline(truths[j], color="#cc3311", ls="--", lw=1)
        ax.set_title(name, fontsize=9)
    for j in range(len(param_names), 12):
        axes.flat[j].axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
    return path
