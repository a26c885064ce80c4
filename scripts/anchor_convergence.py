#!/usr/bin/env python3
"""Nested-sampler convergence study on the asym_q anchor outlier.

analysis/anchors.json (npe_r7) shows flow-IS and the fallback nested
sampler agreeing to -1.7..+2.7 nats on 4/5 anchors but +7.0 nats on
asym_q (q~0.28, precessing). Two candidate explanations: (a) the IS
estimate is biased high, or (b) the random-walk nested sampler misses
likelihood volume on the curved q-degeneracy and biases logZ LOW — the
same mechanism analysis/evidence_validation.json demonstrated for
prior-SMC (bias shrinking as walk length grows).

This script decides between them on the actual outlier case: rerun the
fallback sampler at increasing effort (nlive x walks) on one fixed
asym_q injection and record logZ per setting next to the flow-IS value
on identical data. (b) predicts logZ climbing toward IS with effort;
(a) predicts a stable gap. Reference analog: the dynesty convergence
checks behind scripts/benchmark_real_events.py:2-12.

Every likelihood call is padded to the (400,) / (24,) batch shapes the
committed anchor run already compiled (fresh shapes cost minutes each
through the TPU tunnel).

Usage: python scripts/anchor_convergence.py \
          [--ckpt model/npe_r7/ckpt] [--out analysis/anchor_convergence.json]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

# (nlive, walks, maxiter): maxiter sized so dlogz termination, not the
# iteration cap, ends the run (the committed nlive=400 run needed ~345
# of its 500 allowed iterations).
GRID = [
    (400, 24, 12000),
    (400, 48, 12000),
    (800, 24, 24000),
    (1600, 24, 48000),
]
CHUNK = 400          # cached likelihood batch shape from the anchor run


def _chunked(log_l, chunk=CHUNK, small=24):
    """Evaluate log_l at the two already-compiled batch shapes only:
    (small,) for the sampler's walk steps, (chunk,)-blocks for anything
    larger (initial live-point evaluation at nlive > chunk)."""
    def wrapped(theta):
        theta = np.asarray(theta, dtype=np.float32)
        n = theta.shape[0]
        if n == small:
            return np.asarray(log_l(theta))
        out = np.empty(n, dtype=np.float64)
        for i in range(0, n, chunk):
            block = theta[i:i + chunk]
            m = block.shape[0]
            if m < chunk:
                block = np.concatenate(
                    [block, np.broadcast_to(block[:1],
                                            (chunk - m, theta.shape[1]))])
            out[i:i + m] = np.asarray(log_l(block))[:m]
        return out
    return wrapped


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", default="model/npe_r7/ckpt")
    ap.add_argument("--name", default="best")
    ap.add_argument("--seed", type=int, default=777)
    ap.add_argument("--anchors", default="analysis/anchors.json")
    ap.add_argument("--out", default="analysis/anchor_convergence.json")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-train")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    from posteriflow_tpu.inference import load_model, prepare_simulated
    from posteriflow_tpu.inference.dynesty_bridge import _nested_fallback
    from posteriflow_tpu.inference.importance import (
        importance_correct, make_marginalized_log_likelihood)
    from posteriflow_tpu.inference.pipeline import infer
    from posteriflow_tpu.utils.logging import setup_logging
    from posteriflow_tpu.utils.provenance import artifact_meta

    log = setup_logging()
    injected = json.loads(Path(args.anchors).read_text())[
        "anchors"]["asym_q"]["injected"]
    engine = load_model(args.ckpt, args.name)
    names = tuple(engine.cfg.npe.param_names)
    prepared = prepare_simulated([injected], seed=args.seed,
                                 psd_bands=engine.cfg.npe.psd_bands,
                                 param_names=names)
    log_l = make_marginalized_log_likelihood(prepared.strain)

    # flow-IS evidence on this exact data (the committed anchor's 298.8
    # used a different noise realization; only same-data values compare)
    import jax.numpy as jnp
    t0 = time.time()
    npe = infer(engine, data=prepared, n_samples=3000, seed=args.seed)
    ctx = engine.encode(jnp.asarray(prepared.strain)[None],
                        jnp.asarray(prepared.asd_bands)[None])
    is_res = importance_correct(engine, ctx[0], 0, npe.samples,
                                npe.log_prob, npe.railed, log_l,
                                marginalized=True)
    is_block = {"logz": float(is_res.log_evidence_ratio),
                "ess": float(is_res.ess),
                "efficiency": float(is_res.efficiency),
                "t_s": round(time.time() - t0, 1)}
    log.info("flow-IS logZ %.2f (eff %.1f%%, %.0fs)", is_block["logz"],
             100 * is_block["efficiency"], is_block["t_s"])

    out_path = Path(args.out)
    report = {"case": "asym_q", "injected": injected, "seed": args.seed,
              "is": is_block, "runs": [],
              "_meta": artifact_meta(args.ckpt)}
    if out_path.exists():            # resume across invocations
        prev = json.loads(out_path.read_text())
        if prev.get("seed") == args.seed and prev.get("is"):
            report["runs"] = prev.get("runs", [])

    done = {(r["nlive"], r["walks"]) for r in report["runs"]}
    wrapped = _chunked(log_l)
    for nlive, walks, maxiter in GRID:
        if (nlive, walks) in done:
            log.info("nlive=%d walks=%d: already done, skipping",
                     nlive, walks)
            continue
        t0 = time.time()
        ns = _nested_fallback(wrapped, nlive, dlogz=0.5, seed=args.seed,
                              maxiter=maxiter, walks=walks,
                              ndim=len(names))
        rec = {"nlive": nlive, "walks": walks,
               "logz": ns["logz"], "n_like_calls": ns["n_like_calls"],
               "gap_vs_is": is_block["logz"] - ns["logz"],
               "t_s": round(time.time() - t0, 1)}
        report["runs"].append(rec)
        log.info("nlive=%d walks=%d: logZ %.2f (gap %.2f, %.0fs)",
                 nlive, walks, rec["logz"], rec["gap_vs_is"], rec["t_s"])
        out_path.write_text(json.dumps(report, indent=2, default=float))

    print(json.dumps({"is_logz": is_block["logz"],
                      "runs": [(r["nlive"], r["walks"],
                                round(r["logz"], 2),
                                round(r["gap_vs_is"], 2))
                               for r in report["runs"]]}, indent=1))


if __name__ == "__main__":
    main()
