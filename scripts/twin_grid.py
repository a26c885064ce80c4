#!/usr/bin/env python3
"""Twin-injection amortization-bias grid over (Mc, q, theta_jn) at fixed
SNR — the measured bias map the refinement gate consumes.

Reference analog: scripts/twin_grid.py -> analysis/twin_grid_v3.json (the
q-attractor band (0.30, 0.80) documented at inference/gating.py:36-67).
For each grid point: inject twice with different noise, infer both, record
the median-recovery bias; the gate distrusts regions where the bias is
systematic.

Usage:
  python scripts/twin_grid.py --ckpt model/run/ckpt --out analysis/twin_grid.json
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
    ap.add_argument("--target-snr", type=float, default=24.0)
    ap.add_argument("--n-samples", type=int, default=400)
    ap.add_argument("--mc-grid", type=int, default=4)
    ap.add_argument("--q-grid", type=int, default=4)
    ap.add_argument("--out", default="analysis/twin_grid.json")
    args = ap.parse_args(argv)

    from posteriflow_tpu.utils.logging import setup_logging
    log = setup_logging()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from posteriflow_tpu.inference import infer, load_model, prepare_simulated
    from posteriflow_tpu.physics.psd import default_network_asd
    from posteriflow_tpu.physics.simulator import signal_white_fd

    engine = load_model(args.ckpt, args.name)
    names = tuple(engine.cfg.npe.param_names)
    asd = default_network_asd()

    # jitted: eager PhenomD hits the axon backend's per-primitive
    # UNIMPLEMENTED path (fine under jit)
    snr_jit = jax.jit(lambda th: jnp.sqrt(jnp.sum(
        jnp.abs(signal_white_fd(th, asd)) ** 2)))

    def snr_of(p):
        theta = jnp.asarray([p.get(k, 0.0) for k in names],
                            dtype=jnp.float32)
        return float(snr_jit(theta))

    rng = np.random.default_rng(7)
    grid = []
    for mc in np.geomspace(12.0, 45.0, args.mc_grid):
        for q in np.linspace(0.35, 0.95, args.q_grid):
            m1 = mc * (1 + q) ** 0.2 / q ** 0.6
            m2 = q * m1
            p = dict(mass_1=float(m1), mass_2=float(m2),
                     luminosity_distance=500.0, ra=1.3, dec=-0.2,
                     theta_jn=0.8, psi=0.5, phase=1.0, geocent_time=0.1,
                     a1=0.0, a2=0.0)
            if len(names) >= 15:
                # a 15-D flagship is gated on PRECESSING events — probe
                # the bias with seeded isotropic tilts, moderate spins
                p.update(a1=0.4, a2=0.2,
                         tilt_1=float(np.arccos(rng.uniform(-1, 1))),
                         tilt_2=float(np.arccos(rng.uniform(-1, 1))),
                         phi_12=float(rng.uniform(0, 2 * np.pi)),
                         phi_jl=float(rng.uniform(0, 2 * np.pi)))
            # rescale distance to the target SNR (amplitude ∝ 1/d)
            rho = snr_of(p)
            p["luminosity_distance"] = float(np.clip(
                p["luminosity_distance"] * rho / args.target_snr,
                45.0, 2100.0))

            biases = []
            for twin in range(2):
                prep = prepare_simulated([p], seed=1000 + twin,
                                         psd_bands=engine.cfg.npe.psd_bands,
                                         param_names=names)
                res = infer(engine, data=prep, n_samples=args.n_samples,
                            seed=twin)
                med = res.median()
                mc_r = (med[0] * med[1]) ** 0.6 / (med[0] + med[1]) ** 0.2
                q_r = med[1] / max(med[0], 1e-6)
                biases.append({"mc_bias_frac": float((mc_r - mc) / mc),
                               "q_bias": float(q_r - q)})
            grid.append({"mc": float(mc), "q": float(q),
                         "distance": p["luminosity_distance"],
                         "twins": biases,
                         "mc_bias_frac_mean": float(np.mean(
                             [b["mc_bias_frac"] for b in biases])),
                         "q_bias_mean": float(np.mean(
                             [b["q_bias"] for b in biases]))})
            log.info("Mc=%.1f q=%.2f -> mc bias %+.3f, q bias %+.3f",
                     mc, q, grid[-1]["mc_bias_frac_mean"],
                     grid[-1]["q_bias_mean"])

    # locate the q-attractor: band of q with systematic |q bias| > 0.05
    qs = sorted({g["q"] for g in grid})
    band = [q for q in qs if np.mean([abs(g["q_bias_mean"]) for g in grid
                                      if g["q"] == q]) > 0.05]
    from posteriflow_tpu.utils.provenance import artifact_meta
    report = {"grid": grid,
              "q_attractor_band": [min(band), max(band)] if band else None,
              "target_snr": args.target_snr,
              "_meta": artifact_meta(args.ckpt)}
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    log.info("-> %s (attractor band: %s)", out, report["q_attractor_band"])
    return report


if __name__ == "__main__":
    main()
