#!/usr/bin/env python3
"""Offline calibration audit: coverage at 50/68/90/95, SBC + KS, PP plots,
shuffle-ΔNLL, distance-vs-SNR — figure + JSON outputs.

Reference analog: scripts/lean_npe_diagnostics.py (+ the extended-eval
error-vs-SNR-band breakdown of scripts/lean_npe_extended_eval.py).

Usage:
  python scripts/npe_diagnostics.py --ckpt model/run/ckpt --out reports/diag
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--name", default="best")
    ap.add_argument("--n-events", type=int, default=512)
    ap.add_argument("--n-post", type=int, default=256)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--out", default="reports/diag")
    args = ap.parse_args(argv)

    from posteriflow_tpu.utils.logging import setup_logging
    log = setup_logging()

    import jax
    import numpy as np
    from posteriflow_tpu import PARAM_NAMES
    from posteriflow_tpu.inference.pipeline import InferenceEngine
    from posteriflow_tpu.inference.plots import pp_plot, sbc_histograms
    from posteriflow_tpu.models.npe import LeanNPE
    from posteriflow_tpu.physics.simulator import simulate_batch
    from posteriflow_tpu.train.checkpoints import CheckpointManager
    from posteriflow_tpu.train.diagnostics import make_diagnostics
    from posteriflow_tpu.train.gates import (make_calibration_metrics,
                                             sbc_pass_frac)
    from posteriflow_tpu.data.snr_utils import classify_snr_regime

    state, cfg, meta = CheckpointManager(args.ckpt).restore(args.name)
    engine = InferenceEngine(state.params, cfg)
    model = LeanNPE(cfg.npe)

    key = jax.random.PRNGKey(args.seed)
    batch = jax.jit(lambda k: simulate_batch(k, args.n_events, cfg.sim))(key)

    diag = make_diagnostics(cfg, n_events=args.n_events,
                            n_post=args.n_post)(state.params, batch, key)
    cal = make_calibration_metrics(cfg, n_events=args.n_events,
                                   n_post=args.n_post)(state.params, batch,
                                                       key)
    ranks = np.asarray(cal["sbc_ranks"])
    live = np.asarray(cal["live_mask"])
    frac, ps = sbc_pass_frac(ranks, live, args.n_post)

    # coverage at several levels (reference audits 50/68/90/95)
    ctx = engine.encode(batch.strain, batch.asd_bands)
    import jax.numpy as jnp
    rank0 = jnp.zeros((args.n_events,), dtype=jnp.int32)
    theta_s, _, _ = model.apply(state.params, jax.random.fold_in(key, 9),
                                ctx, rank0, args.n_post,
                                method=LeanNPE.sample_from_context)
    theta_s = np.asarray(theta_s)
    truth = np.asarray(batch.params[:, 0, :])
    cov = {}
    for lvl in (0.5, 0.68, 0.9, 0.95):
        lo = np.quantile(theta_s, 0.5 - lvl / 2, axis=1)
        hi = np.quantile(theta_s, 0.5 + lvl / 2, axis=1)
        inside = ((truth >= lo) & (truth <= hi)) * live[:, None]
        cov[str(lvl)] = (inside.sum(0) / max(live.sum(), 1)).round(3).tolist()

    # error vs SNR regime (extended eval)
    snr = np.asarray(batch.net_snr)
    safe = np.maximum(truth[:, :2], 1.0)    # dead slots are zero-filled
    mc_t = (safe[:, 0] * safe[:, 1]) ** 0.6 / (safe[:, 0]
                                               + safe[:, 1]) ** 0.2
    mc_s = (theta_s[:, :, 0] * theta_s[:, :, 1]) ** 0.6 \
        / (theta_s[:, :, 0] + theta_s[:, :, 1]) ** 0.2
    mc_err = np.abs(np.median(mc_s, axis=1) - mc_t) / np.maximum(mc_t, 1e-9)
    by_regime = {}
    for i in range(args.n_events):
        if live[i] < 1:
            continue
        r = classify_snr_regime(float(snr[i]))
        by_regime.setdefault(r, []).append(float(mc_err[i]))
    regime_err = {k: {"mc_frac_err_median": float(np.median(v)), "n": len(v)}
                  for k, v in by_regime.items()}

    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)
    pp_plot(ranks, live, args.n_post, outdir / "pp.png")
    sbc_histograms(ranks[live > 0], args.n_post, outdir / "sbc.png")

    report = {
        "checkpoint": str(Path(args.ckpt) / args.name),
        "epoch": meta.get("epoch"),
        "shuffle_delta_nll": float(diag["shuffle_delta_nll"]),
        "dist_corr": float(diag["dist_corr"]),
        "coverage": cov,
        "sbc_pass_frac": frac,
        "sbc_ks_p": dict(zip(PARAM_NAMES, np.round(ps, 5).tolist())),
        "spurious_railing": float(cal["spurious_railing"]),
        "base_conc": float(cal["base_conc"]),
        "mc_err_by_snr_regime": regime_err,
        "n_events": args.n_events, "n_post": args.n_post,
    }
    (outdir / "diagnostics.json").write_text(json.dumps(report, indent=2))
    log.info("shuffle-dNLL %.2f | dist_corr %.2f | SBC pass %.2f | "
             "railing %.3f -> %s", report["shuffle_delta_nll"],
             report["dist_corr"], frac, report["spurious_railing"], outdir)
    return report


if __name__ == "__main__":
    main()
