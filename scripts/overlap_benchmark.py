#!/usr/bin/env python3
"""Overlap benchmark: per-rank calibration/accuracy vs multiplicity and
merger separation, ranking accuracy, and k-rank wall time.

Reference analog: scripts/overlap_benchmark.py -> analysis/
overlap_benchmark.json (the paper's core claim — reference numbers in
BASELINE.md: rank-0 cov90 0.909, k-rank runtimes 0.38/1.02/1.55 s on a
laptop; sequential dynesty 418.7 s/signal).

Usage:
  python scripts/overlap_benchmark.py --ckpt model/run/ckpt \
      [--n-events 100] [--n-samples 400] --out analysis/overlap_benchmark.json
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

DT_BINS = ((0.0, 0.25), (0.25, 1.0), (1.0, 2.0), (2.0, 3.2))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--name", default="best")
    ap.add_argument("--n-events", type=int, default=100)
    ap.add_argument("--n-samples", type=int, default=400)
    ap.add_argument("--max-signals", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="analysis/overlap_benchmark.json")
    args = ap.parse_args(argv)

    from posteriflow_tpu.utils.logging import setup_logging
    log = setup_logging()

    import jax
    import numpy as np
    from posteriflow_tpu import PARAM_NAMES
    from posteriflow_tpu.inference import (infer_overlapping, load_model,
                                           prepare_simulated,
                                           rank_overlapping)
    from posteriflow_tpu.prior import sample_signal_params, loudness

    engine = load_model(args.ckpt, args.name)
    rng = np.random.default_rng(args.seed)

    def draw_params(i, t_off):
        k = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
        p = np.array(sample_signal_params(k))    # copy: jax arrays are RO
        p[8] = t_off
        return dict(zip(PARAM_NAMES, map(float, p)))

    def coverage(samples, truth, level):
        lo = np.quantile(samples, 0.5 - level / 2, axis=0)
        hi = np.quantile(samples, 0.5 + level / 2, axis=0)
        return (truth >= lo) & (truth <= hi)

    per_rank = {}
    dt_bins_out = []
    runtime = {}
    rank_hits, rank_total = 0, 0
    kendall_sum, kendall_n = 0, 0

    for n_sig in range(1, args.max_signals + 1):
        key_r = f"n{n_sig}"
        covs = {r: {"c50": [], "c90": [], "mc_fe": [], "tc_ae": []}
                for r in range(n_sig)}
        times = []
        dt_records = []
        for i in range(args.n_events):
            t0s = rng.uniform(-1.2, 1.2, n_sig)
            plist = [draw_params(i * 10 + j, t0s[j])
                     for j in range(n_sig)]
            prep = prepare_simulated(plist, seed=args.seed + i,
                                     psd_bands=engine.cfg.npe.psd_bands)
            truth = prep.truth            # rank-ordered by the simulator
            n_live = truth.shape[0]
            t0 = time.perf_counter()
            results = infer_overlapping(engine, data=prep,
                                        n_signals=n_sig,
                                        n_samples=args.n_samples,
                                        seed=args.seed + i)
            times.append(time.perf_counter() - t0)

            for r in range(min(n_sig, n_live)):
                s = results[r].samples
                tr = truth[r]
                c50 = coverage(s, tr, 0.5)
                c90 = coverage(s, tr, 0.9)
                mc_t = (tr[0] * tr[1]) ** 0.6 / (tr[0] + tr[1]) ** 0.2
                mc_s = (s[:, 0] * s[:, 1]) ** 0.6 / (s[:, 0]
                                                     + s[:, 1]) ** 0.2
                covs[r]["c50"].append(c50)
                covs[r]["c90"].append(c90)
                covs[r]["mc_fe"].append(
                    abs(np.median(mc_s) - mc_t) / mc_t)
                covs[r]["tc_ae"].append(
                    abs(np.median(s[:, 8]) - tr[8]))

            if n_sig == 2 and n_live >= 2:
                dt_records.append((abs(truth[0, 8] - truth[1, 8]),
                                   covs[0]["c90"][-1].mean(),
                                   covs[1]["c90"][-1].mean()))

            # ranking accuracy vs true loudness order
            if n_sig >= 2 and n_live >= 2:
                order, _ = rank_overlapping(results, prep.strain)
                true_loud = np.asarray(loudness(truth[:, 0], truth[:, 1],
                                                truth[:, 2]))
                true_order = list(np.argsort(-true_loud))
                rank_total += 1
                rank_hits += int(order[0] == true_order[0])
                # Kendall tau between predicted and true order
                from scipy.stats import kendalltau
                tau = kendalltau(order[:n_live],
                                 true_order[:n_live]).statistic
                if np.isfinite(tau):
                    kendall_sum += tau
                    kendall_n += 1

        runtime[key_r] = float(np.median(times))
        for r in range(n_sig):
            if covs[r]["c50"]:
                per_rank[f"{key_r}_rank{r}"] = {
                    "cov50_mean": float(np.mean(
                        np.stack(covs[r]["c50"]))),
                    "cov90_mean": float(np.mean(
                        np.stack(covs[r]["c90"]))),
                    "mc_frac_err_median": float(np.median(covs[r]["mc_fe"])),
                    "tc_abs_err_median": float(np.median(covs[r]["tc_ae"])),
                    "n": len(covs[r]["c50"]),
                }
        if n_sig == 2 and dt_records:
            arr = np.asarray(dt_records)
            for lo, hi in DT_BINS:
                sel = (arr[:, 0] >= lo) & (arr[:, 0] < hi)
                if sel.any():
                    dt_bins_out.append({
                        "dt_bin": [lo, hi], "n": int(sel.sum()),
                        "rank0_cov90": float(arr[sel, 1].mean()),
                        "rank1_cov90": float(arr[sel, 2].mean())})
        log.info("n_sig=%d done: median k-rank time %.3fs", n_sig,
                 runtime[key_r])

    report = {
        "per_rank": per_rank,
        "dt_bins": dt_bins_out,
        "runtime": runtime,
        "ranking": {
            "top1": rank_hits / max(rank_total, 1),
            "kendall_tau": kendall_sum / max(kendall_n, 1),
            "n": rank_total,
        },
        "n_events_per_multiplicity": args.n_events,
        "n_samples": args.n_samples,
    }
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    log.info("-> %s", out)
    print(json.dumps(report["runtime"], indent=2))
    return report


if __name__ == "__main__":
    main()
