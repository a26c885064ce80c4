#!/usr/bin/env python3
"""Data-exploration walkthrough (reference analog: notebooks/01 data
exploration, as a reproducible script).

Synthesizes a batch with the training simulator, then renders: whitened
strain with signal overlays, prior corner-style histograms, the SNR/regime
distribution, a time-frequency view, and band statistics — everything a
new user needs to see to trust the data pipeline.

Run: python examples/explore_data.py [--out /tmp/explore]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/explore")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np
    from posteriflow_tpu.data.snr_utils import regime_fractions
    from posteriflow_tpu.physics.constants import (DETECTORS, DURATION,
                                                   SAMPLE_RATE)
    from posteriflow_tpu.physics.simulator import SimConfig, simulate_batch

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    cfg = SimConfig()
    b = jax.jit(lambda k: simulate_batch(k, args.batch, cfg))(
        jax.random.PRNGKey(args.seed))
    strain = np.asarray(b.strain)
    params = np.asarray(b.params)
    n_sig = np.asarray(b.n_sig)
    snr = np.asarray(b.net_snr)

    # 1. loudest event: whitened strain per detector
    i = int(np.argmax(snr))
    t = np.arange(strain.shape[-1]) / SAMPLE_RATE - DURATION / 2
    fig, axes = plt.subplots(3, 1, figsize=(12, 7), sharex=True)
    for d, det in enumerate(DETECTORS):
        axes[d].plot(t, strain[i, d], lw=0.4, color="0.5")
        axes[d].set_ylabel(det)
    for k in range(n_sig[i]):
        for ax in axes:
            ax.axvline(params[i, k, 8], color="#cc3311", ls="--", lw=1)
    axes[0].set_title(f"event {i}: n_sig={n_sig[i]} net SNR={snr[i]:.1f} "
                      f"(dashed = merger times)")
    axes[-1].set_xlabel("t - GPS_REF [s]")
    fig.tight_layout()
    fig.savefig(out / "strain.png", dpi=110)
    plt.close(fig)

    # 2. prior histograms of live signals
    live = np.arange(params.shape[1])[None] < n_sig[:, None]
    p = params[live]
    fig, axes = plt.subplots(3, 4, figsize=(14, 8))
    from posteriflow_tpu import PARAM_NAMES
    for j, name in enumerate(PARAM_NAMES):
        axes.flat[j].hist(p[:, j], bins=30, color="#4477aa")
        axes.flat[j].set_title(name, fontsize=9)
    axes.flat[11].hist(snr[n_sig > 0], bins=30, color="#ee7733")
    axes.flat[11].set_title("network SNR", fontsize=9)
    fig.tight_layout()
    fig.savefig(out / "priors.png", dpi=110)
    plt.close(fig)

    # 3. spectrogram of the loudest event's H1
    fig, ax = plt.subplots(figsize=(10, 4))
    ax.specgram(strain[i, 0], NFFT=256, Fs=SAMPLE_RATE, noverlap=192,
                cmap="viridis")
    ax.set_ylim(0, 512)
    ax.set_xlabel("t [s]")
    ax.set_ylabel("f [Hz]")
    ax.set_title("H1 spectrogram (loudest event)")
    fig.tight_layout()
    fig.savefig(out / "spectrogram.png", dpi=110)
    plt.close(fig)

    print("batch stats:")
    print("  n_sig distribution:",
          {int(k): int(v) for k, v in
           zip(*np.unique(n_sig, return_counts=True))})
    print("  SNR regimes:", regime_fractions(snr[n_sig > 0]))
    print("  whitened std:", round(float(strain.std()), 3))
    print(f"figures -> {out}")


if __name__ == "__main__":
    main()
