#!/usr/bin/env python3
"""Frozen-encoder probes: what does the context actually encode?

Reference analog: scripts/probe_tiers_and_amplitude.py — linear probes on
frozen contexts for amplitude/SNR/energy (and the predecessor's measured
failure: probe R² < 0 for every parameter, lean_npe.py docstring). Ridge
probes from context -> {net SNR, log distance, chirp mass, t_c, per-window
log energy} report R² per target.

Usage:
  python scripts/probe_context.py --ckpt model/run/ckpt
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
    ap.add_argument("--n-events", type=int, default=1024)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="analysis/context_probes.json")
    args = ap.parse_args(argv)

    from posteriflow_tpu.utils.logging import setup_logging
    log = setup_logging()

    import jax
    import numpy as np
    from posteriflow_tpu.models.npe import LeanNPE
    from posteriflow_tpu.physics.simulator import simulate_batch
    from posteriflow_tpu.train.checkpoints import CheckpointManager

    state, cfg, _ = CheckpointManager(args.ckpt).restore(args.name)
    model = LeanNPE(cfg.npe)

    @jax.jit
    def batch_ctx(key):
        b = simulate_batch(key, 256, cfg.sim)
        asd = b.asd_bands if cfg.npe.uses_asd_bands else None
        ctx = model.apply(state.params, b.strain, asd,
                          method=LeanNPE.encode)
        return ctx, b.params[:, 0, :], b.net_snr, b.n_sig

    ctxs, thetas, snrs, nsigs = [], [], [], []
    for i in range(max(1, args.n_events // 256)):
        c, t, s, n = batch_ctx(jax.random.fold_in(
            jax.random.PRNGKey(args.seed), i))
        ctxs.append(np.asarray(c))
        thetas.append(np.asarray(t))
        snrs.append(np.asarray(s))
        nsigs.append(np.asarray(n))
    ctx = np.concatenate(ctxs)
    theta = np.concatenate(thetas)
    snr = np.concatenate(snrs)
    live = np.concatenate(nsigs) > 0
    ctx, theta, snr = ctx[live], theta[live], snr[live]

    mc = (theta[:, 0] * theta[:, 1]) ** 0.6 / (theta[:, 0]
                                               + theta[:, 1]) ** 0.2
    targets = {
        "net_snr": snr,
        "log_net_snr": np.log(np.maximum(snr, 1e-3)),
        "log_distance": np.log(theta[:, 2]),
        "chirp_mass": mc,
        "geocent_time": theta[:, 8],
        "cos_theta_jn": np.cos(theta[:, 5]),
    }

    from sklearn.linear_model import Ridge
    from sklearn.model_selection import cross_val_score
    probes = {}
    for name, y in targets.items():
        r2 = cross_val_score(Ridge(alpha=1.0), ctx, y, cv=4,
                             scoring="r2").mean()
        probes[name] = float(r2)
        log.info("probe %-14s R2 = %+.3f", name, r2)

    report = {"probes": probes, "n_events": int(live.sum()),
              "context_std_across_events": float(ctx.std(axis=0).mean())}
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
