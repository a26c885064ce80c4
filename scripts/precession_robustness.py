#!/usr/bin/env python3
"""Precession systematics study: how does the aligned-spin-trained NPE
respond to genuinely PRECESSING injections?

The reference never generates a precessing waveform (it names IMRPhenomXP
but zeroes tilts — src/ahsd/data/bilby_pipeline.py:42-47 + 63-65), so its
amortized posterior has never been exposed to precession either. This
study quantifies the rebuild's behavior under that systematic: identical
injections at chi_p ∈ {0, 0.3, 0.6}, same noise seed, through the full
inference pipeline (posterior + OOD verdict + refinement gate).

What to look for:
  - chi_p = 0 is the control (matches training physics);
  - growing chi_p: mass/distance medians may shift (waveform systematics)
    and the OOD score should rise — the safety net the live OOD gate
    tests (scripts/validate_checkpoint.py) exists exactly for inputs the
    training distribution never covered.

Usage:
  python scripts/precession_robustness.py --ckpt model_release/npe_r3_best \
      --out reports/precession_robustness.json
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

# injection: moderately inclined (precession modulation visible), mid-band
# masses, a1 = 0.3 aligned primary spin the twist precesses around
_TRUTH = {
    "mass_1": 36.0, "mass_2": 29.0, "luminosity_distance": 600.0,
    "ra": 1.1, "dec": -0.4, "theta_jn": 1.05, "psi": 0.9, "phase": 1.2,
    "geocent_time": 0.05, "a1": 0.3, "a2": -0.1,
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="model_release/npe_r3_best")
    ap.add_argument("--name", default="best")
    ap.add_argument("--chi-p", type=float, nargs="+",
                    default=[0.0, 0.3, 0.6])
    ap.add_argument("--n-samples", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--out", default="reports/precession_robustness.json")
    args = ap.parse_args(argv)

    from posteriflow_tpu.utils.logging import setup_logging
    log = setup_logging()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from posteriflow_tpu import PARAM_NAMES
    from posteriflow_tpu.inference import infer, load_model
    from posteriflow_tpu.inference.preprocessing import (PreparedData,
                                                         _DESIGN_ASD)
    from posteriflow_tpu.physics.constants import (DETECTORS, N_SAMPLES)
    from posteriflow_tpu.physics.psd import default_network_asd
    from posteriflow_tpu.physics.simulator import fd_white_to_td
    from posteriflow_tpu.physics.waveforms.precession import \
        precessing_signal_white_fd

    engine = load_model(args.ckpt, args.name)
    asd = default_network_asd()
    theta = jnp.asarray([_TRUTH[k] for k in PARAM_NAMES], dtype=jnp.float32)

    # one jitted program serves every chi_p (chi_p is a traced argument)
    @jax.jit
    def make_strain(chi_p, key):
        sig_fd = precessing_signal_white_fd(theta, chi_p, asd)
        sig_td = fd_white_to_td(sig_fd, N_SAMPLES)
        noise = jax.random.normal(key, sig_td.shape, dtype=jnp.float32)
        snr = jnp.sqrt(jnp.sum(jnp.abs(sig_fd) ** 2))
        return sig_td + noise, snr

    key = jax.random.PRNGKey(args.seed)
    rows = []
    for chi_p in args.chi_p:
        t0 = time.time()
        strain, snr = make_strain(jnp.float32(chi_p), key)  # same noise ∀ χp
        data = PreparedData(
            strain=np.asarray(strain), asds=_DESIGN_ASD.copy(),
            asd_bands=np.zeros((3, engine.cfg.npe.psd_bands), np.float32),
            detectors_present=list(DETECTORS), quality={}, warnings=[],
            timings={}, truth=np.asarray(theta)[None])
        res = infer(engine, data=data, n_samples=args.n_samples,
                    seed=args.seed)
        samp = np.asarray(res.samples)
        med = np.median(samp, axis=0)
        std = samp.std(axis=0)
        z = (med - np.asarray(theta)) / np.maximum(std, 1e-9)
        row = {
            "chi_p": float(chi_p),
            "injected_snr": float(snr),
            "verdict": res.verdict,
            "ood_percentile": float(res.diagnostics.get(
                "ood_percentile", float("nan"))),
            "refine": bool(res.gate.get("refine", False)),
            "median": {k: float(m) for k, m in zip(PARAM_NAMES, med)},
            "posterior_std": {k: float(s)
                              for k, s in zip(PARAM_NAMES, std)},
            "z_offset": {k: float(v) for k, v in zip(PARAM_NAMES, z)},
            "max_abs_z": float(np.max(np.abs(z))),
            "wall_s": round(time.time() - t0, 2),
        }
        rows.append(row)
        log.info("chi_p=%.1f snr=%.1f verdict=%s ood=%.1f%% max|z|=%.2f",
                 chi_p, row["injected_snr"], row["verdict"],
                 row["ood_percentile"], row["max_abs_z"])

    out = {
        "truth": _TRUTH,
        "ckpt": args.ckpt,
        "n_samples": args.n_samples,
        "note": ("aligned-trained NPE on precessing twist-up injections; "
                 "reference parity: its IMRPhenomXP calls always run with "
                 "tilt_1=tilt_2=0 (bilby_pipeline.py:63-65), so chi_p=0 is "
                 "reference-equivalent and chi_p>0 is capability beyond it"),
        "cases": rows,
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    log.info("-> %s", args.out)


if __name__ == "__main__":
    main()
