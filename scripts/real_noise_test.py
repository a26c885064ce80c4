#!/usr/bin/env python3
"""Robustness check: design-whitened signals injected into real (or
real-like) noise crops — NLL/coverage gap vs the Gaussian domain.

Reference analog: scripts/real_noise_test.py (design-whitened signals into
O3 crops). The real-vs-Gaussian NLL gap < 3 nats is a CI gate.

Usage:
  python scripts/real_noise_test.py --ckpt model/run/ckpt \
      [--bank data/noise_bank] [--n-events 256]
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
    ap.add_argument("--bank", default=None,
                    help="noise bank dir (default: synthetic bank)")
    ap.add_argument("--n-events", type=int, default=256)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from posteriflow_tpu.utils.logging import setup_logging
    log = setup_logging()

    import dataclasses
    import jax
    from posteriflow_tpu.data.noise_bank import (load_noise_bank,
                                                 make_synthetic_bank)
    from posteriflow_tpu.physics.simulator import simulate_batch
    from posteriflow_tpu.train.checkpoints import CheckpointManager
    from posteriflow_tpu.train.diagnostics import make_diagnostics
    from posteriflow_tpu.train.trainer import make_eval_nll

    state, cfg, _ = CheckpointManager(args.ckpt).restore(args.name)
    bank = (load_noise_bank(args.bank) if args.bank
            else make_synthetic_bank(jax.random.PRNGKey(0), n_segments=4))

    key = jax.random.PRNGKey(args.seed)
    gauss = jax.jit(lambda k: simulate_batch(k, args.n_events, cfg.sim))(key)
    real_cfg = dataclasses.replace(cfg.sim, real_noise_prob=1.0)
    real = jax.jit(lambda k: simulate_batch(k, args.n_events, real_cfg,
                                            bank=bank))(key)

    eval_nll = make_eval_nll(cfg)
    diag = make_diagnostics(cfg, n_events=args.n_events)
    g_nll = float(eval_nll(state.params, gauss))
    r_nll = float(eval_nll(state.params, real))
    g_d = diag(state.params, gauss, key)
    r_d = diag(state.params, real, key)

    report = {
        "gaussian_nll": g_nll, "real_nll": r_nll,
        "nll_gap": r_nll - g_nll,
        "gap_within_gate": bool(abs(r_nll - g_nll) < 3.0),
        "gaussian_dist_corr": float(g_d["dist_corr"]),
        "real_dist_corr": float(r_d["dist_corr"]),
        "gaussian_cov90": float(g_d["dist_cov90"]),
        "real_cov90": float(r_d["dist_cov90"]),
        "bank": args.bank or "synthetic",
        "n_events": args.n_events,
    }
    log.info("NLL gap %.2f nats (gate <3): %s", report["nll_gap"],
             "PASS" if report["gap_within_gate"] else "FAIL")
    if args.out:
        Path(args.out).parent.mkdir(parents=True, exist_ok=True)
        Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
