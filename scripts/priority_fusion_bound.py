#!/usr/bin/env python3
"""Two-channel information bound for PriorityNet's close-pair bin.

The close-pair pairwise bin ([0.0, 0.1) normalized-target separation)
plateaued at 0.685 through loss reweighting and reached 0.713 with the
v7 stack (reports/priority_eval_v7.json). Two physical channels carry
the ordering information:

  A. the candidate-params channel: snr_est = physics expected SNR of the
     jittered candidate params (5% relative jitter = the benchmark's
     model of upstream posterior medians);
  B. the data channel: excess power in merger-centered windows of the
     whitened strain — sum(x^2) over w samples is w + SNR_w^2 + noise,
     a phase-free realized-SNR^2 estimate (matched filtering is not
     available to ANY ranker here: 5% chirp-mass jitter decoheres a
     template within a fraction of the 0.5 s segment).

This script measures, on the same natural eval distribution as
scripts/test_priority_net.py, the close-bin pairwise accuracy of
  (1) channel A alone (the committed oracle),
  (2) channel B alone (best single window scale),
  (3) an inverse-variance fusion of A and B in SNR^2 space:
      var(A) ~ (2 sigma_jit snr^2)^2,  var(B) ~ 2w + 4 snr^2
— an estimator upper bound for score-based rankers, measured not
assumed. Reference analog: the reference's PriorityNet ships with no
information-ceiling analysis at all (src/ahsd/core/priority_net.py).

Usage: python scripts/priority_fusion_bound.py [--n-batches 10] [--cpu]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

BINS = ((0.0, 0.1), (0.1, 0.3), (0.3, 1.0))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n-batches", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sigma-jit", type=float, default=0.07,
                    help="assumed relative SNR error of channel A "
                         "(aggregate of the 5%% param jitter through "
                         "the amplitude chain)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="reports/priority_fusion_bound.json")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-train")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import numpy as np

    from posteriflow_tpu.train.train_priority import (PriorityTrainConfig,
                                                      make_priority_batch)

    cfg = PriorityTrainConfig()          # the eval's natural distribution
    batch_fn = jax.jit(lambda k: make_priority_batch(k, cfg))

    acc = {name: {f"[{lo},{hi})": [0, 0] for lo, hi in BINS}
           for name in ("params_oracle", "energy_oracle", "fusion")}

    for i in range(args.n_batches):
        segs, cand, mask, targets, _snr, snr_est = batch_fn(
            jax.random.fold_in(jax.random.PRNGKey(args.seed), i))
        segs = np.asarray(segs)
        mask_np = np.asarray(mask)
        tg_all = np.asarray(targets)
        se_all = np.asarray(snr_est)

        # channel B: excess power in a merger-centered window (w = L/16
        # was the best single scale; windows are candidate-centered by
        # construction of extract_segments)
        L = segs.shape[-1]
        w = L // 16
        lo = (L - w) // 2
        e = np.sum(segs[..., lo:lo + w] ** 2, axis=(-1, -2))   # [B, S]
        snr2_data = e - 3 * w                 # 3 detectors of unit noise
        var_b = 2.0 * 3 * w + 4.0 * np.maximum(snr2_data, 0.0)

        # channel A in SNR^2 space
        snr2_est = se_all ** 2
        var_a = (2.0 * args.sigma_jit * np.maximum(snr2_est, 1.0)) ** 2
        fused = (snr2_est / var_a + snr2_data / var_b) \
            / (1.0 / var_a + 1.0 / var_b)

        for b in range(segs.shape[0]):
            live = mask_np[b] > 0
            k = int(live.sum())
            if k < 2:
                continue
            tg = tg_all[b, live]
            scores = {"params_oracle": se_all[b, live],
                      "energy_oracle": snr2_data[b, live],
                      "fusion": fused[b, live]}
            for a_ in range(k):
                for c in range(a_ + 1, k):
                    sep = abs(tg[a_] - tg[c])
                    for lo_, hi_ in BINS:
                        if lo_ <= sep < hi_:
                            key = f"[{lo_},{hi_})"
                            for name, sc in scores.items():
                                ok = (sc[a_] - sc[c]) * (tg[a_] - tg[c]) > 0
                                acc[name][key][0] += int(ok)
                                acc[name][key][1] += 1

    report = {
        "n_batches": args.n_batches,
        "sigma_jit": args.sigma_jit,
        "window": "L/16 merger-centered, 3-detector summed",
        "pairwise_acc_by_target_sep": {
            name: {k: (v[0] / v[1] if v[1] else None)
                   for k, v in bins.items()}
            for name, bins in acc.items()},
        "n_pairs_close": acc["fusion"]["[0.0,0.1)"][1],
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
