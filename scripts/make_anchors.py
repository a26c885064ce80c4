#!/usr/bin/env python3
"""Sampler-anchor evidence: NPE vs IS-corrected NPE vs nested sampling on
identical injections (VERDICT r2 missing-#2; reference:
scripts/benchmark_real_events.py:2-12, analysis/twin_dynesty/, anchors/).

Runs dynesty_bridge.run_comparison (offline fallback nested sampler — no
network needed) on injections spanning the twin-grid corners and commits
per-parameter KL / Wasserstein / median-offset between the three
posteriors to analysis/anchors.json.

Usage: python scripts/make_anchors.py --ckpt model/npe_r2 [--out analysis/anchors.json]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

# Twin-grid-corner injections: (Mc low/high) x (q near-equal / asymmetric),
# plus the razor-thin-Mc case the IS battery flags (gw170608-like) and a
# loud GW150914-like anchor. Distances tuned for SNR ~15-25.
ANCHORS = [
    dict(name="gw150914_like", mass_1=36.0, mass_2=29.0,
         luminosity_distance=700.0),
    dict(name="low_mc_razor", mass_1=11.0, mass_2=7.6,
         luminosity_distance=450.0),
    dict(name="high_mc", mass_1=60.0, mass_2=45.0,
         luminosity_distance=1500.0),
    dict(name="asym_q", mass_1=30.1, mass_2=8.3,
         luminosity_distance=600.0),
    dict(name="q_attractor", mass_1=25.0, mass_2=15.0,
         luminosity_distance=800.0),
]
_BASE = dict(ra=1.7, dec=-0.8, theta_jn=0.9, psi=0.6, phase=2.1,
             geocent_time=0.1, a1=0.2, a2=0.1)


def _seed_of(name: str) -> int:
    """Deterministic per-anchor seed (process-independent, unlike hash())."""
    import zlib
    return zlib.crc32(name.encode()) % 2 ** 16


def _injection_params(spec: dict, names) -> dict:
    """Anchor spec -> full injection dict (precessing block appended for
    15-D checkpoints, seeded per anchor)."""
    params = {k: v for k, v in spec.items() if k != "name"}
    params.update(_BASE)
    if len(names) >= 15:
        import numpy as _np
        rng_a = _np.random.default_rng(_seed_of(spec["name"]))
        params.update(
            a1=0.5, a2=0.2,
            tilt_1=float(_np.arccos(rng_a.uniform(-1, 1))),
            tilt_2=float(_np.arccos(rng_a.uniform(-1, 1))),
            phi_12=float(rng_a.uniform(0, 2 * _np.pi)),
            phi_jl=float(rng_a.uniform(0, 2 * _np.pi)))
    return params


def _self_check(engine, prepared, nlive: int, maxiter: int,
                seeds=(11, 1011), n_keep: int = 3000) -> dict:
    """Audit the sampler AGAINST ITSELF (VERDICT r4 weak-#2: per-param
    NPE-vs-sampler disagreement cannot be attributed without knowing the
    sampler's own run-to-run scatter): two independent nested runs on the
    SAME data must agree to ~1 nat in logZ and O(1) width ratios before
    their posterior is treated as an anchor."""
    import numpy as np

    from posteriflow_tpu.evaluation.metrics import ComparisonMetrics
    from posteriflow_tpu.inference.dynesty_bridge import run_dynesty
    from posteriflow_tpu.inference.importance import \
        make_marginalized_log_likelihood

    log_l = make_marginalized_log_likelihood(prepared.strain)
    runs, kept = [], []
    for s in seeds:
        t0 = time.time()
        r = run_dynesty(log_l, nlive=nlive, seed=s, maxiter=maxiter,
                        ndim=engine.cfg.npe.n_params)
        idx = np.random.default_rng(s).choice(
            len(r["samples"]), size=min(n_keep, len(r["samples"])),
            p=r["weights"])
        kept.append(r["samples"][idx])
        runs.append({"seed": s, "logz": float(r["logz"]),
                     "n_like_calls": int(r.get("n_like_calls", -1)),
                     "wall_s": round(time.time() - t0, 1)})
    names = tuple(engine.cfg.npe.param_names)
    comp = ComparisonMetrics().compare_posteriors(kept[0], kept[1],
                                                  param_names=names)
    comp.pop("phase", None)
    comp.pop("geocent_time", None)
    return {"nlive": nlive, "runs": runs,
            "logz_gap_run0_minus_run1": runs[0]["logz"] - runs[1]["logz"],
            "summary": ComparisonMetrics.summarize(comp),
            "per_param": comp}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="model/npe_r2")
    ap.add_argument("--name", default="best")
    ap.add_argument("--n-samples", type=int, default=3000)
    ap.add_argument("--nlive", type=int, default=400)
    ap.add_argument("--maxiter", type=int, default=12000)
    ap.add_argument("--sampler", choices=("nested", "smc_prior"),
                    default="nested",
                    help="smc_prior = flow-independent tempered SMC from "
                         "the training prior (on-device, gives an "
                         "evidence in the same convention as IS)")
    ap.add_argument("--only", help="comma list of anchor names")
    ap.add_argument("--self-check", metavar="NAME",
                    help="instead of anchoring: run the nested sampler "
                         "TWICE (independent seeds) on this anchor's "
                         "injection and record their mutual agreement "
                         "(sampler_self_consistency block)")
    ap.add_argument("--out", default="analysis/anchors.json")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-train")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from posteriflow_tpu import PARAM_NAMES
    from posteriflow_tpu.inference import load_model, prepare_simulated
    from posteriflow_tpu.inference.dynesty_bridge import run_comparison
    from posteriflow_tpu.utils.logging import setup_logging

    log = setup_logging()
    engine = load_model(args.ckpt, args.name)
    sel = set(args.only.split(",")) if args.only else None

    out_path = Path(args.out)
    from posteriflow_tpu.utils.provenance import artifact_meta
    report = {"ckpt": args.ckpt, "n_samples": args.n_samples,
              "nlive": args.nlive, "sampler": args.sampler, "anchors": {},
              "_meta": artifact_meta(args.ckpt)}
    if out_path.exists():                      # resume across invocations
        # merge ONLY the finished anchors; keep the fresh _meta for the
        # CURRENT --ckpt, and refuse to mix anchors from a different model
        # under its provenance (ADVICE r4)
        prev = json.loads(out_path.read_text())
        prev_hash = (prev.get("_meta") or {}).get("config_hash")
        if prev_hash and prev_hash != report["_meta"]["config_hash"]:
            raise SystemExit(
                f"{out_path} was generated from config_hash {prev_hash}, "
                f"current --ckpt hashes {report['_meta']['config_hash']}: "
                "refusing to mix anchors across models (delete the file "
                "or pass a matching --ckpt)")
        report["anchors"] = prev.get("anchors", {})

    if args.self_check:
        spec = next(s for s in ANCHORS if s["name"] == args.self_check)
        names = tuple(engine.cfg.npe.param_names)
        params = _injection_params(spec, names)
        prepared = prepare_simulated([params], seed=_seed_of(spec["name"]),
                                     psd_bands=engine.cfg.npe.psd_bands,
                                     param_names=names)
        sc = _self_check(engine, prepared, args.nlive, args.maxiter)
        sc["case"] = spec["name"]
        sc["injected"] = params
        report["sampler_self_consistency"] = sc
        out_path.parent.mkdir(parents=True, exist_ok=True)
        out_path.write_text(json.dumps(report, indent=2, default=float))
        print(json.dumps({"case": sc["case"],
                          "logz_gap": sc["logz_gap_run0_minus_run1"],
                          "mean_width_ratio":
                              sc["summary"]["mean_width_ratio"],
                          "mean_js": sc["summary"]["mean_js"]}, indent=2))
        return

    for spec in ANCHORS:
        name = spec["name"]
        if sel and name not in sel:
            continue
        if name in report["anchors"]:
            log.info("%s: already done, skipping", name)
            continue
        params = _injection_params(spec, tuple(engine.cfg.npe.param_names))
        names = tuple(engine.cfg.npe.param_names)
        prepared = prepare_simulated([params], seed=_seed_of(name),
                                     psd_bands=engine.cfg.npe.psd_bands,
                                     param_names=names)
        t0 = time.time()
        cmp = run_comparison(engine, prepared, n_samples=args.n_samples,
                             nlive=args.nlive, maxiter=args.maxiter,
                             importance=True, sampler=args.sampler)
        from posteriflow_tpu.evaluation.metrics import ComparisonMetrics
        entry = {
            "injected": params,
            "sampler_marginalized": True,
            "summary_npe": ComparisonMetrics.summarize(cmp["comparison"]),
            "summary_is": ComparisonMetrics.summarize(
                cmp["is_comparison"]),
            "comparison_npe_vs_sampler": cmp["comparison"],
            "comparison_is_vs_sampler": cmp["is_comparison"],
            "is": cmp["is"],
            "logz_gap_is_minus_sampler": cmp["logz_gap"],
            "sampler": {k: cmp["nested"][k] for k in
                        ("logz", "sampler", "n_like_calls")},
            "t_npe_s": round(cmp["t_npe_s"], 2),
            "t_nested_s": round(cmp["t_nested_s"], 2),
            "t_total_s": round(time.time() - t0, 1),
            "param_names": list(engine.cfg.npe.param_names),
        }
        report["anchors"][name] = entry
        out_path.parent.mkdir(parents=True, exist_ok=True)
        out_path.write_text(json.dumps(report, indent=2, default=float))
        log.info("%s done in %.0fs: logz_gap %.2f", name,
                 entry["t_total_s"], cmp["logz_gap"])

    print(json.dumps({k: {"logz_gap": v["logz_gap_is_minus_sampler"],
                          "t_total_s": v["t_total_s"]}
                      for k, v in report["anchors"].items()}, indent=2))


if __name__ == "__main__":
    main()
