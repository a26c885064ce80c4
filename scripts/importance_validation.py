#!/usr/bin/env python3
"""Importance-sampling validation battery -> analysis/importance_validation.json.

For reference-like injections, run amortized inference with the flagship
checkpoint, importance-correct against the exact Whittle likelihood, and
record ESS / efficiency / evidence / ladder diagnostics per case. The
round-1 artifact showed degenerate numbers (efficiency 1.0, logZ 0.0) from
the flat-final-weights bug — regenerating with the exact re-anchored ladder
is VERDICT item 4's done-criterion.

Usage: python scripts/importance_validation.py --ckpt model/run/ckpt \
           [--n-samples 4096] [--out analysis/importance_validation.json]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

CASES = {
    "gw150914_like": dict(mass_1=36.0, mass_2=29.0,
                          luminosity_distance=400.0),
    "gw170814_like": dict(mass_1=30.6, mass_2=25.2,
                          luminosity_distance=540.0),
    "gw170608_like": dict(mass_1=11.0, mass_2=7.6,
                          luminosity_distance=320.0),
    "weak_distant": dict(mass_1=35.0, mass_2=28.0,
                         luminosity_distance=1500.0),
}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--name", default="best")
    ap.add_argument("--n-samples", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--cross-check", action="store_true",
                    help="also run the flow-independent prior-anchored "
                         "SMC sampler per case and record the logZ gap "
                         "between the two estimators (exactness evidence)")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the untimed compile-warmup pass; per-case "
                         "wall_s then includes one-time jit compilation")
    ap.add_argument("--out", default="analysis/importance_validation.json")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-train")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import jax.numpy as jnp
    import numpy as np
    from posteriflow_tpu.inference import (importance_correct, infer,
                                           prepare_simulated)
    from posteriflow_tpu.inference.importance import \
        make_marginalized_log_likelihood
    from posteriflow_tpu.inference.pipeline import InferenceEngine
    from posteriflow_tpu.utils.logging import setup_logging

    log = setup_logging()
    engine = InferenceEngine.from_checkpoint(args.ckpt, args.name)
    names = tuple(engine.cfg.npe.param_names)
    from posteriflow_tpu.prior import PriorConfig
    # the flow-independent cross-check must integrate the SAME parameter
    # space as the flow-IS evidence (15-D prior for a 15-D flagship) or
    # the logZ gap compares different model classes
    prior_cfg = PriorConfig(precessing=len(names) >= 15)

    out = {}
    if not args.no_warmup:
        # One untimed pass through the full pipeline (same shapes as every
        # case) so per-case wall_s is the steady-state production cost; the
        # one-time jit compile lands in _meta.warmup_s instead of being
        # charged to whichever case runs first.
        t0 = time.time()
        p0 = next(iter(CASES.values()))
        full0 = {"ra": 1.0, "dec": 0.3, "theta_jn": 0.6, "psi": 0.4,
                 "phase": 1.0, "geocent_time": 0.1, "a1": 0.1, "a2": 0.05,
                 **p0}
        prep0 = prepare_simulated([full0], seed=args.seed,
                                  param_names=names)
        res0 = infer(engine, data=prep0, n_samples=args.n_samples,
                     seed=args.seed)
        ctx0 = engine.encode(jnp.asarray(prep0.strain)[None],
                             jnp.asarray(prep0.asd_bands)[None])
        log_l0 = make_marginalized_log_likelihood(prep0.strain)
        importance_correct(engine, ctx0[0], 0, res0.samples, res0.log_prob,
                           res0.railed, log_l0, marginalized=True,
                           seed=args.seed)
        if args.cross_check:
            from posteriflow_tpu.inference.importance import run_smc_prior
            run_smc_prior(log_l0, seed=args.seed + 99, marginalized=True,
                          prior_cfg=prior_cfg)
        from posteriflow_tpu.utils.provenance import artifact_meta
        out["_meta"] = artifact_meta(args.ckpt,
                                     warmup_s=round(time.time() - t0, 1))
        log.info("compile warmup: %.1f s", out["_meta"]["warmup_s"])

    for i, (case, p) in enumerate(CASES.items()):
        full = {"ra": 1.0 + i, "dec": 0.3 - 0.15 * i, "theta_jn": 0.6,
                "psi": 0.4, "phase": 1.0, "geocent_time": 0.1,
                "a1": 0.1, "a2": 0.05, **p}
        t0 = time.time()
        prep = prepare_simulated([full], seed=args.seed + i,
                                 param_names=names)
        res = infer(engine, data=prep, n_samples=args.n_samples,
                    seed=args.seed + i)
        ctx = engine.encode(jnp.asarray(prep.strain)[None],
                            jnp.asarray(prep.asd_bands)[None])
        log_l = make_marginalized_log_likelihood(prep.strain)
        is_res = importance_correct(engine, ctx[0], 0, res.samples,
                                    res.log_prob, res.railed, log_l,
                                    marginalized=True,
                                    seed=args.seed + i)
        med = np.median(is_res.samples[
            np.random.default_rng(0).choice(
                len(is_res.samples), 2000,
                p=is_res.weights / is_res.weights.sum())], axis=0)
        out[case] = {
            "truth_mc": round((p["mass_1"] * p["mass_2"]) ** 0.6
                              / (p["mass_1"] + p["mass_2"]) ** 0.2, 2),
            "n": int(len(is_res.samples)),
            "ess": round(float(is_res.ess), 1),
            "efficiency": round(float(is_res.efficiency), 4),
            "n_stages": int(is_res.n_stages),
            "converged": bool(is_res.converged),
            "beta_ladder": is_res.beta_ladder,
            "mcmc_acceptance": is_res.mcmc_acceptance,
            "log_evidence_ratio": round(float(is_res.log_evidence_ratio),
                                        2),
            "corrected_mc_median": round(float(
                (med[0] * med[1]) ** 0.6 / (med[0] + med[1]) ** 0.2), 2),
            "wall_s": round(time.time() - t0, 1),
        }
        if args.cross_check:
            from posteriflow_tpu.inference.importance import run_smc_prior
            t1 = time.time()
            smc = run_smc_prior(log_l, seed=args.seed + 100 + i,
                                marginalized=True, prior_cfg=prior_cfg)
            med_s = np.median(smc.samples[
                np.random.default_rng(1).choice(
                    len(smc.samples), 2000,
                    p=smc.weights / smc.weights.sum())], axis=0)
            out[case]["smc_prior"] = {
                "converged": bool(smc.converged),
                "n_stages": int(smc.n_stages),
                "efficiency": round(float(smc.efficiency), 4),
                "log_evidence_ratio": round(float(smc.log_evidence_ratio),
                                            2),
                "logz_gap_vs_flow_is": round(
                    float(smc.log_evidence_ratio)
                    - out[case]["log_evidence_ratio"], 2),
                "mc_median": round(float(
                    (med_s[0] * med_s[1]) ** 0.6
                    / (med_s[0] + med_s[1]) ** 0.2), 2),
                "wall_s": round(time.time() - t1, 1),
            }
        log.info("%s: ess=%.1f eff=%.4f stages=%d logZ=%.2f conv=%s",
                 case, out[case]["ess"], out[case]["efficiency"],
                 out[case]["n_stages"], out[case]["log_evidence_ratio"],
                 out[case]["converged"])

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps({k: {kk: v[kk] for kk in
                          ("ess", "efficiency", "n_stages",
                           "log_evidence_ratio", "converged")}
                      for k, v in out.items()
                      if not k.startswith("_")}, indent=2))
    return out


if __name__ == "__main__":
    main()
