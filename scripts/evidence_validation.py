#!/usr/bin/env python3
"""Close the evidence question (VERDICT r3 missing-#4): demonstrate — not
assert — that the flow-IS evidence estimator is exact and that the
prior-SMC baseline's logZ deficit is its random-walk volume bias.

Part A (synthetic, CPU): a Gaussian likelihood over four UNIFORM-prior
dims (psi, geocent_time, a1, a2) has an ANALYTIC evidence
    Z = prod_i (sigma_i*sqrt(2*pi)/w_i) * [Phi((hi-mu)/sig)-Phi((lo-mu)/sig)]
so both estimators face a known truth:
  1. IS from a well-matched proposal (the flow-IS analog: prior except a
     1.5-sigma Gaussian on the likelihood dims) must land within ~0.01
     nats — the estimator itself is exact given a good proposal;
  2. tempered prior-SMC (the exact machinery run_smc_prior uses,
     importance._tempered_is) at rejuvenation walk lengths n_mcmc in
     {1, 3, 10, 30}: short walks leave the resampled cloud
     under-dispersed, biasing logZ LOW; the bias must shrink toward 0 as
     the walk lengthens — the mechanism behind the committed prior-SMC
     vs flow-IS gaps (analysis/importance_validation.json, 2.7-41 nats
     LOW, direction consistent).

Part B (--real, TPU, needs a release): one injection; flow-IS logZ
(importance_correct, the production path) against run_smc_prior at
increasing n_mcmc — prior-SMC must converge TOWARD the flow-IS number.

Reference anchor: the exactness contract the IS layer exists to provide
(reference src/ahsd/inference/importance.py:204-328, which leans on
bilby's battle-tested likelihood; this rebuild's likelihood is
self-contained, hence this validation).

Usage:
  python scripts/evidence_validation.py                    # Part A (CPU)
  python scripts/evidence_validation.py --real \
      --release model_release/npe_r6_best                  # adds Part B
"""
from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# likelihood dims (PARAM_NAMES indices), centers, widths
_L_DIMS = (6, 8, 9, 10)                 # psi, geocent_time, a1, a2
_MU = (1.1, 0.25, 0.40, 0.30)
_SIG = (0.05, 0.02, 0.03, 0.03)
_BOX = ((0.0, math.pi), (-1.5, 1.5), (0.0, 0.99), (0.0, 0.99))


def _truth_logz() -> float:
    from scipy.stats import norm
    lz = 0.0
    for mu, sig, (lo, hi) in zip(_MU, _SIG, _BOX):
        frac = norm.cdf((hi - mu) / sig) - norm.cdf((lo - mu) / sig)
        lz += math.log(sig * math.sqrt(2 * math.pi) * frac / (hi - lo))
    return lz


def synthetic_log_l(theta):
    """Un-normalized Gaussian log-likelihood over the four dims (vectorized
    over [..., 11] or [..., 15])."""
    import numpy as np
    th = np.asarray(theta, dtype=np.float64)
    out = 0.0
    for d, mu, sig in zip(_L_DIMS, _MU, _SIG):
        out = out - (th[..., d] - mu) ** 2 / (2.0 * sig * sig)
    return out


def part_a(n: int = 4096, seed: int = 0, n_rep: int = 3) -> dict:
    import numpy as np
    from posteriflow_tpu.inference.importance import _tempered_is
    from posteriflow_tpu.prior import log_prior_bbh, sample_prior_bbh

    truth = _truth_logz()
    out = {"truth_logz": truth, "n_particles": n}

    # 1. well-matched-proposal IS (the flow-IS analog): the evidence
    # estimator itself, isolated from proposal quality
    rng = np.random.default_rng(seed)
    is_logz = []
    for _ in range(n_rep):
        th = sample_prior_bbh(rng, n)
        log_q_corr = np.zeros(n)
        for d, mu, sig, (lo, hi) in zip(_L_DIMS, _MU, _SIG, _BOX):
            s = 1.5 * sig
            x = np.clip(rng.normal(mu, s, n), lo + 1e-9, hi - 1e-9)
            th[:, d] = x
            # log[p_prior/q_prop] for this dim (uniform prior)
            log_q_corr += (-math.log(hi - lo)
                           - (-np.log(s * math.sqrt(2 * math.pi))
                              - (x - mu) ** 2 / (2 * s * s)))
        lw = synthetic_log_l(th) + log_q_corr
        m = lw.max()
        is_logz.append(float(np.log(np.mean(np.exp(lw - m))) + m))
    out["is_good_proposal"] = {
        "logz_mean": float(np.mean(is_logz)),
        "logz_std": float(np.std(is_logz)),
        "bias": float(np.mean(is_logz) - truth),
        "n_rep": n_rep,
    }

    # 2. tempered prior-SMC at increasing rejuvenation walk length
    import jax
    import jax.numpy as jnp
    log_prior_fn = jax.jit(jax.vmap(log_prior_bbh))

    def _ll_fn(t):
        return synthetic_log_l(np.asarray(t))

    smc = []
    for n_mcmc in (1, 3, 10, 30):
        runs = []
        t0 = time.time()
        for rep in range(n_rep):
            rng = np.random.default_rng(1000 * rep + n_mcmc)
            theta = sample_prior_bbh(rng, n)
            lp = np.asarray(log_prior_fn(jnp.asarray(theta, jnp.float32)),
                            np.float64)
            ll = synthetic_log_l(theta)
            r = _tempered_is(theta, lp.copy(), ll, lp, _ll_fn, log_prior_fn,
                             n_mcmc=n_mcmc, max_stages=60,
                             seed=rep + 17 * n_mcmc)
            runs.append(float(r.log_evidence_ratio))
        smc.append({"n_mcmc": n_mcmc,
                    "logz_mean": float(np.mean(runs)),
                    "logz_std": float(np.std(runs)),
                    "bias": float(np.mean(runs) - truth),
                    "wall_s": round(time.time() - t0, 1)})
    out["prior_smc_vs_walk_length"] = smc
    return out


# ── Part C: 15-D ground truth in the ACTUAL precessing parameter space ───
# (VERDICT r4 missing-#2: "nothing validates a 15-D logZ to within a few
# nats"). Gaussian likelihood over SEVEN dims whose priors are independent
# closed-form marginals of the 15-D precessing prior — psi, geocent_time,
# a1, a2 (uniform), tilt_1 (sine), phi_12, phi_jl (uniform) — so
#   Z = prod_uniform [sig*sqrt(2pi)*DPhi/w] * int N(t;mu,sig) sin(t)/2 dt
# with the tilt factor a 1-D quadrature (exact to ~1e-10). All three
# production estimators face this truth in the full 15-D space: plain IS
# from a matched proposal (the flow-IS identity), tempered prior-SMC at
# increasing rejuvenation walk length (the volume-bias mechanism), and the
# nested fallback sampler at an nlive ladder (the anchors' comparator).

_L15 = {  # idx: (mu, sigma, lo, hi, kind)
    6:  (1.10, 0.05, 0.0, math.pi, "uniform"),        # psi
    8:  (0.25, 0.02, -1.5, 1.5, "uniform"),           # geocent_time
    9:  (0.40, 0.03, 0.0, 0.99, "uniform"),           # a1
    10: (0.30, 0.03, 0.0, 0.99, "uniform"),           # a2
    11: (1.20, 0.10, 0.0, math.pi, "sin"),            # tilt_1
    13: (2.50, 0.15, 0.0, 2 * math.pi, "uniform"),    # phi_12
    14: (4.00, 0.15, 0.0, 2 * math.pi, "uniform"),    # phi_jl
}


def synthetic_log_l_15(theta):
    import numpy as np
    th = np.asarray(theta, dtype=np.float64)
    out = 0.0
    for d, (mu, sig, *_rest) in _L15.items():
        out = out - (th[..., d] - mu) ** 2 / (2.0 * sig * sig)
    return out


def _truth_logz_15() -> float:
    import numpy as np
    from scipy.integrate import quad
    from scipy.stats import norm
    lz = 0.0
    for d, (mu, sig, lo, hi, kind) in _L15.items():
        if kind == "uniform":
            frac = norm.cdf((hi - mu) / sig) - norm.cdf((lo - mu) / sig)
            lz += math.log(sig * math.sqrt(2 * math.pi) * frac / (hi - lo))
        else:                                    # sine prior (tilt_1)
            val, err = quad(
                lambda t: math.exp(-(t - mu) ** 2 / (2 * sig * sig))
                * math.sin(t) / 2.0, lo, hi,
                points=[mu - 5 * sig, mu, mu + 5 * sig], limit=200)
            assert err < 1e-8 * val, (val, err)
            lz += math.log(val)
    return lz


def part_c(n: int = 4096, seed: int = 0, n_rep: int = 3,
           nlive_grid=(400, 800)) -> dict:
    import numpy as np
    from posteriflow_tpu.inference.dynesty_bridge import run_dynesty
    from posteriflow_tpu.inference.importance import _tempered_is
    from posteriflow_tpu.prior import (PriorConfig, log_prior_bbh,
                                       sample_prior_bbh)

    pcfg = PriorConfig(precessing=True)
    truth = _truth_logz_15()
    out = {"truth_logz": truth, "n_particles": n, "ndim": 15}

    # 1. matched-proposal IS — the flow-IS identity, isolated from
    # proposal quality (q = prior except 1.5σ Gaussians on the L dims)
    rng = np.random.default_rng(seed)
    is_logz = []
    for _ in range(n_rep):
        th = sample_prior_bbh(rng, n, pcfg)
        log_corr = np.zeros(n)
        for d, (mu, sig, lo, hi, kind) in _L15.items():
            s = 1.5 * sig
            x = np.clip(rng.normal(mu, s, n), lo + 1e-9, hi - 1e-9)
            th[:, d] = x
            lp_marg = (-math.log(hi - lo) if kind == "uniform"
                       else np.log(np.sin(x) / 2.0))
            log_corr += lp_marg - (-math.log(s * math.sqrt(2 * math.pi))
                                   - (x - mu) ** 2 / (2 * s * s))
        lw = synthetic_log_l_15(th) + log_corr
        m = lw.max()
        is_logz.append(float(np.log(np.mean(np.exp(lw - m))) + m))
    out["is_good_proposal"] = {
        "logz_mean": float(np.mean(is_logz)),
        "logz_std": float(np.std(is_logz)),
        "bias": float(np.mean(is_logz) - truth), "n_rep": n_rep}

    # 2. tempered prior-SMC in the full 15-D space vs walk length
    import jax
    import jax.numpy as jnp
    log_prior_fn = jax.jit(jax.vmap(lambda t: log_prior_bbh(t, pcfg)))

    def _ll_fn(t):
        return synthetic_log_l_15(np.asarray(t))

    smc = []
    for n_mcmc in (1, 3, 10, 30):
        runs = []
        t0 = time.time()
        for rep in range(n_rep):
            rng = np.random.default_rng(1000 * rep + n_mcmc)
            theta = sample_prior_bbh(rng, n, pcfg)
            lp = np.asarray(log_prior_fn(jnp.asarray(theta, jnp.float32)),
                            np.float64)
            ll = synthetic_log_l_15(theta)
            r = _tempered_is(theta, lp.copy(), ll, lp, _ll_fn, log_prior_fn,
                             n_mcmc=n_mcmc, max_stages=60,
                             seed=rep + 17 * n_mcmc)
            runs.append(float(r.log_evidence_ratio))
        smc.append({"n_mcmc": n_mcmc,
                    "logz_mean": float(np.mean(runs)),
                    "logz_std": float(np.std(runs)),
                    "bias": float(np.mean(runs) - truth),
                    "wall_s": round(time.time() - t0, 1)})
        print(f"  15-D prior-SMC n_mcmc={n_mcmc:3d}: "
              f"bias {smc[-1]['bias']:+.3f} ± {smc[-1]['logz_std']:.3f}")
    out["prior_smc_vs_walk_length"] = smc

    # 3. nested fallback sampler at an nlive ladder (the anchors' logZ
    # comparator, on a target whose truth is known)
    nested = []
    for nlive in nlive_grid:
        t0 = time.time()
        r = run_dynesty(synthetic_log_l_15, nlive=nlive, seed=seed,
                        maxiter=200000, ndim=15)
        nested.append({"nlive": nlive, "logz": float(r["logz"]),
                       "bias": float(r["logz"] - truth),
                       "n_like_calls": int(r.get("n_like_calls", -1)),
                       "sampler": r.get("sampler", "fallback"),
                       "wall_s": round(time.time() - t0, 1)})
        print(f"  15-D nested nlive={nlive}: bias "
              f"{nested[-1]['bias']:+.3f} ({nested[-1]['wall_s']}s)")
    out["nested_vs_nlive"] = nested
    return out


def part_b(release: str, n_mcmc_grid=(2, 5, 15, 40), seed: int = 0) -> dict:
    """One injection: flow-IS logZ vs prior-SMC logZ at increasing walk
    length (TPU; the likelihood is the production marginalized Whittle)."""
    import jax.numpy as jnp
    import numpy as np
    from posteriflow_tpu.inference.importance import (
        importance_correct, make_marginalized_log_likelihood, run_smc_prior)
    from posteriflow_tpu.inference.pipeline import InferenceEngine, infer
    from posteriflow_tpu.inference.preprocessing import prepare_simulated
    from posteriflow_tpu.prior import PriorConfig

    engine = InferenceEngine.from_checkpoint(release)
    names = tuple(engine.cfg.npe.param_names)
    inj = {"mass_1": 36.0, "mass_2": 29.0, "luminosity_distance": 420.0,
           "ra": 1.4, "dec": 0.3, "theta_jn": 0.6, "psi": 0.7,
           "phase": 1.2, "geocent_time": 0.1, "a1": 0.3, "a2": 0.2}
    prepared = prepare_simulated([inj], seed=seed,
                                 psd_bands=engine.cfg.npe.psd_bands,
                                 param_names=names)
    npe = infer(engine, data=prepared, n_samples=4096, seed=seed)
    log_l = make_marginalized_log_likelihood(prepared.strain)
    ctx = engine.encode(jnp.asarray(prepared.strain)[None],
                        jnp.asarray(prepared.asd_bands)[None])
    t0 = time.time()
    is_res = importance_correct(engine, ctx[0], 0, npe.samples,
                                npe.log_prob, npe.railed, log_l,
                                marginalized=True, seed=seed)
    flow_logz = float(is_res.log_evidence_ratio)
    out = {"injection": inj,
           "flow_is": {"logz": flow_logz,
                       "efficiency": float(is_res.efficiency),
                       "n_stages": int(is_res.n_stages),
                       "converged": bool(is_res.converged),
                       "wall_s": round(time.time() - t0, 1)}}
    pcfg = PriorConfig(precessing=len(names) >= 15)
    grid = []
    for n_mcmc in n_mcmc_grid:
        t0 = time.time()
        r = run_smc_prior(log_l, seed=seed, marginalized=True,
                          prior_cfg=pcfg, n_mcmc=n_mcmc)
        grid.append({"n_mcmc": n_mcmc,
                     "logz": float(r.log_evidence_ratio),
                     "gap_vs_flow_is": float(r.log_evidence_ratio
                                             - flow_logz),
                     "converged": bool(r.converged),
                     "n_stages": int(r.n_stages),
                     "wall_s": round(time.time() - t0, 1)})
        print(f"prior-SMC n_mcmc={n_mcmc}: logZ={grid[-1]['logz']:.2f} "
              f"(gap {grid[-1]['gap_vs_flow_is']:+.2f})")
    out["prior_smc_vs_walk_length"] = grid
    out["release"] = release
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--real", action="store_true")
    ap.add_argument("--release", default="model_release/npe_r5_best")
    ap.add_argument("--out", default="analysis/evidence_validation.json")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if not args.real:
        # Part A is pure host math — never initialize the tunneled TPU
        import jax
        jax.config.update("jax_platforms", "cpu")

    report = {"_meta": {"script": "scripts/evidence_validation.py",
                        "seed": args.seed}}
    print("Part A: synthetic Gaussian likelihood, analytic logZ")
    report["synthetic"] = part_a(n=args.n, seed=args.seed)
    t = report["synthetic"]
    print(f"truth logZ = {t['truth_logz']:.4f}")
    print(f"good-proposal IS bias = {t['is_good_proposal']['bias']:+.4f} "
          f"± {t['is_good_proposal']['logz_std']:.4f}")
    for row in t["prior_smc_vs_walk_length"]:
        print(f"prior-SMC n_mcmc={row['n_mcmc']:3d}: "
              f"bias {row['bias']:+.3f} ± {row['logz_std']:.3f}")

    print("Part C: 15-D precessing-space synthetic, quadrature-exact logZ")
    report["synthetic_15d"] = part_c(n=args.n, seed=args.seed)
    c = report["synthetic_15d"]
    print(f"15-D truth logZ = {c['truth_logz']:.4f}; matched-proposal IS "
          f"bias = {c['is_good_proposal']['bias']:+.4f} "
          f"± {c['is_good_proposal']['logz_std']:.4f}")

    if args.real:
        report["real_case"] = part_b(args.release, seed=args.seed)
        report["_meta"]["ckpt"] = args.release
        import json as _json
        meta_p = Path(args.release) / "meta.json"
        if meta_p.exists():
            import hashlib
            cfg = _json.loads(meta_p.read_text()).get("config", {})
            report["_meta"]["config_hash"] = hashlib.sha256(
                _json.dumps(cfg, sort_keys=True).encode()).hexdigest()[:12]

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=1))
    print("wrote", out)


if __name__ == "__main__":
    main()
