#!/usr/bin/env python3
"""Standalone PriorityNet evaluation battery -> JSON.

Reference analog: experiments/test_priority_net.py (658 LoC standalone
harness). Metrics over freshly simulated overlap scenarios:

  - top-1 extraction-order accuracy + Kendall tau vs true loudness order
  - pairwise ordering accuracy binned by loudness separation (how close
    must two signals be before the net confuses them)
  - uncertainty calibration: corr(predicted sigma, |ranking error|)
  - comparison against the loudness-proxy fallback ranking

Usage: python scripts/test_priority_net.py [--model model/priority_v1]
           [--n-batches 20] [--cpu]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="model/priority_v1")
    ap.add_argument("--n-batches", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="reports/priority_eval.json")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-train")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp
    import numpy as np
    from scipy.stats import kendalltau
    from posteriflow_tpu.train.train_priority import (PriorityTrainConfig,
                                                      load_priority_net,
                                                      make_priority_batch)
    from posteriflow_tpu.utils.logging import setup_logging

    log = setup_logging()
    cfg = PriorityTrainConfig()
    net, params = load_priority_net(
        Path(args.model) / "priority_params.msgpack")

    from posteriflow_tpu.models.priority_net import rank_uncertainty

    fwd = jax.jit(lambda s, c, m, se: net.apply(params, s, c, m,
                                                snr_est=se))
    batch_fn = jax.jit(lambda k: make_priority_batch(k, cfg))
    ru_fn = jax.jit(lambda sc, sg, m, k: rank_uncertainty(sc, sg, m, k))

    top1 = top1_fb = 0
    n_multi = 0
    taus, taus_fb = [], []
    pair_bins = {b: [0, 0] for b in ((0.0, 0.1), (0.1, 0.3), (0.3, 1.0),
                                     (1.0, 10.0))}
    # jitter-ceiling oracle: score = the PHYSICS expected SNR of the
    # JITTERED candidate (snr_est) — the most any model can extract from
    # the candidate-parameter channel, whose 5% jitter is the suspected
    # close-pair information ceiling (close_boost 3 and 8 both left the
    # close bin at exactly 0.685)
    pair_bins_orc = {b: [0, 0] for b in ((0.0, 0.1), (0.1, 0.3),
                                         (0.3, 1.0), (1.0, 10.0))}
    top1_orc = 0
    sig_err = []
    cand_sig_err = []
    rank_unc_pairs = []
    for i in range(args.n_batches):
        segs, cand, mask, targets, _snr, snr_est = batch_fn(
            jax.random.fold_in(jax.random.PRNGKey(args.seed), i))
        scores, sigma = fwd(segs, cand, mask, snr_est)
        # MC-propagated per-candidate rank displacement (the post-hoc
        # sigma -> ranking-error map; models/priority_net.rank_uncertainty)
        ru = np.asarray(ru_fn(scores, sigma, mask,
                              jax.random.fold_in(
                                  jax.random.PRNGKey(args.seed + 31), i)))
        scores, sigma = np.asarray(scores), np.asarray(sigma)
        mask_np = np.asarray(mask)
        targets = np.asarray(targets)
        for b in range(scores.shape[0]):
            live = mask_np[b] > 0
            k = int(live.sum())
            if k < 2:
                continue
            n_multi += 1
            sc, tg, sg = scores[b, live], targets[b, live], sigma[b, live]
            # loudness fallback: candidate loudness proxy is feature 0 of
            # the target construction — use targets' own order as truth,
            # fallback = candidate Mc^{5/6}/d from physical params
            m1, m2, d = (np.asarray(cand)[b, live, 0],
                         np.asarray(cand)[b, live, 1],
                         np.asarray(cand)[b, live, 2])
            loud = (m1 * m2) ** 0.6 / (m1 + m2) ** 0.2
            loud = loud ** (5.0 / 6.0) / np.maximum(d, 1.0)
            true_order = np.argsort(-tg)
            top1 += int(np.argmax(sc) == true_order[0])
            top1_fb += int(np.argmax(loud) == true_order[0])
            orc = np.asarray(snr_est)[b, live]
            top1_orc += int(np.argmax(orc) == true_order[0])
            t = kendalltau(np.argsort(-sc), true_order).statistic
            t_fb = kendalltau(np.argsort(-loud), true_order).statistic
            if np.isfinite(t):
                taus.append(t)
            if np.isfinite(t_fb):
                taus_fb.append(t_fb)
            # pairwise accuracy by target separation
            for a in range(k):
                for c in range(a + 1, k):
                    sep = abs(tg[a] - tg[c])
                    correct = (sc[a] - sc[c]) * (tg[a] - tg[c]) > 0
                    corr_orc = (orc[a] - orc[c]) * (tg[a] - tg[c]) > 0
                    for (lo, hi), acc in pair_bins.items():
                        if lo <= sep < hi:
                            acc[0] += int(correct)
                            acc[1] += 1
                    for (lo, hi), acc in pair_bins_orc.items():
                        if lo <= sep < hi:
                            acc[0] += int(corr_orc)
                            acc[1] += 1
            # uncertainty vs error: per-candidate |score error| (what the
            # heteroscedastic NLL trains sigma to predict) and the
            # event-level rank displacement
            rank_pred = np.argsort(np.argsort(-sc))
            rank_true = np.argsort(np.argsort(-tg))
            disp = np.abs(rank_pred - rank_true)
            rank_err = float(disp.mean())
            sig_err.append((float(sg.mean()), rank_err))
            for a in range(k):
                cand_sig_err.append((float(sg[a]),
                                     float(abs(sc[a] - tg[a]))))
            # per-candidate: MC-propagated rank uncertainty vs the actual
            # rank displacement (the round-2 metric as defined: an
            # uncertainty that tracks RANKING error)
            rub = ru[b, live]
            for a in range(k):
                rank_unc_pairs.append((float(rub[a]), float(disp[a])))

    sig_err = np.asarray(sig_err)
    cand_sig_err = np.asarray(cand_sig_err)
    report = {
        "n_scenarios": n_multi,
        "top1": top1 / max(n_multi, 1),
        "kendall_tau": float(np.mean(taus)) if taus else None,
        "fallback_top1": top1_fb / max(n_multi, 1),
        "fallback_kendall_tau": float(np.mean(taus_fb)) if taus_fb else
        None,
        "pairwise_acc_by_target_sep": {
            f"[{lo},{hi})": (acc[0] / acc[1] if acc[1] else None)
            for (lo, hi), acc in pair_bins.items()},
        # the params-channel information ceiling (see pair_bins_orc note)
        "oracle_top1": top1_orc / max(n_multi, 1),
        "oracle_pairwise_acc_by_target_sep": {
            f"[{lo},{hi})": (acc[0] / acc[1] if acc[1] else None)
            for (lo, hi), acc in pair_bins_orc.items()},
        # the round-2 target metric: predicted rank uncertainty (sigma
        # MC-propagated through the score ordering) vs |actual rank
        # displacement|, per candidate
        "uncertainty_error_corr": float(np.corrcoef(
            np.asarray(rank_unc_pairs)[:, 0],
            np.asarray(rank_unc_pairs)[:, 1])[0, 1])
        if len(rank_unc_pairs) > 3 else None,
        # legacy event-level raw-sigma correlate (kept for comparability
        # with priority_eval_v5.json, where it measured 0.075)
        "uncertainty_event_raw_sigma_corr": float(np.corrcoef(
            sig_err[:, 0], sig_err[:, 1])[0, 1]) if len(sig_err) > 3
        else None,
        # per-candidate calibration: corr(sigma_i, |score_i - target_i|) —
        # the quantity the uncertainty head is trained to predict
        # (reference uncertainty-calibration loss, priority_net.py:414-538)
        "uncertainty_score_err_corr": float(np.corrcoef(
            cand_sig_err[:, 0], cand_sig_err[:, 1])[0, 1])
        if len(cand_sig_err) > 3 else None,
        "sigma_spread": float(cand_sig_err[:, 0].std())
        if len(cand_sig_err) else None,
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
