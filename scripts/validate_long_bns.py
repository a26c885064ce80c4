#!/usr/bin/env python3
"""Full gate battery for the long-BNS (configs[3]) model -> reports/val_long_bns.

VERDICT r3 weak-#5 / next-#6: long_bns_v1 shipped with a 256x256
mini-calibration, far below the 2000x400 battery every flagship faces.
This runs the flagship gate set ADAPTED to the long-BNS parameter space
(the 11 aligned params over the BNS prior slice) at full scale, with the
same metric semantics as scripts/validate_checkpoint.py:

  - context-shuffle dNLL > 5 nats          (posterior actually uses strain)
  - 50%/90% central-interval coverage within +-0.07/+-0.05 (<=2 of 11 excepted)
  - SBC KS p > 1e-3 for >= 9/11 parameters
  - spurious railing < 5% (scaler.railing_mask on raw normalized draws)
  - distance correlation (log median vs log truth) > 0.5

Reference analog: scripts/validate_checkpoint.py:173-199 gate table —
applied here to the long-duration multiband model the reference does not
have (SURVEY.md §5 long-context note).

Usage: python scripts/validate_long_bns.py --model model/long_bns_v2 \
           [--n-events 2000] [--n-post 400] [--out reports/val_long_bns]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

GATES = {
    "shuffle_delta_nll": (">", 5.0),
    "cov50_violations": ("<=", 2),
    "cov90_violations": ("<=", 2),
    "sbc_pass_frac": (">=", 9.0 / 11.0),
    "spurious_railing": ("<", 0.05),
    "dist_corr": (">", 0.5),
}

# v4 (trigger-conditioned heterodyne): theta-shuffle is meaningless under
# trigger-RELATIVE labels (it tests trigger-label consistency, which
# explodes trivially, not strain use). The conditioning gates become:
#   signal_delta_nll — NLL gap between noise-only and signal tokens at the
#     SAME (theta, trigger, noise); a strain-ignoring model scores 0
#   mc_sharpen — median ratio of the posterior's chirp-mass std to the
#     trigger residual prior's (σ_mc·M̂c); ≈1 for a trigger-only model
GATES_V4 = {
    "signal_delta_nll": (">", 2.0),
    "mc_sharpen": ("<", 0.8),
    "cov50_violations": ("<=", 2),
    "cov90_violations": ("<=", 2),
    "sbc_pass_frac": (">=", 9.0 / 11.0),
    "spurious_railing": ("<", 0.05),
    "dist_corr": (">", 0.5),
}


def _check(name, value, spec):
    op, thresh = spec
    ok = {"<": value < thresh, "<=": value <= thresh,
          ">": value > thresh, ">=": value >= thresh}[op]
    return {"gate": name, "value": float(value), "op": op,
            "threshold": thresh, "passed": bool(ok)}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="model/long_bns_v2")
    ap.add_argument("--n-events", type=int, default=2000)
    ap.add_argument("--n-post", type=int, default=400)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--seed", type=int, default=4321)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="reports/val_long_bns")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-train")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    import jax.numpy as jnp
    import numpy as np
    from flax.serialization import from_bytes
    from scipy.stats import kstest

    from posteriflow_tpu import PARAM_NAMES
    from posteriflow_tpu.models.long_bns import (LongBNSNPE, LongBNSNPEv4,
                                                 build_chirp_token_grid,
                                                 build_trigger_token_grid,
                                                 simulate_long_bns_batch,
                                                 simulate_long_bns_batch_v3,
                                                 simulate_long_bns_batch_v4)
    from posteriflow_tpu.scaler import ParamScaler
    from posteriflow_tpu.utils.logging import setup_logging
    from posteriflow_tpu.utils.provenance import config_hash

    log = setup_logging()
    mdir = Path(args.model)
    cal_cfg = json.loads((mdir / "calibration.json").read_text())["config"]
    # nested enc/tokens dicts rebuilt VERBATIM (ADVICE r4); flat-key
    # fallback for pre-v3 calibrations
    enc_cfg = cal_cfg.get("enc") or {
        k: cal_cfg[k] for k in ("d_model", "n_layers") if k in cal_cfg}
    tok_cfg = cal_cfg.get("tokens", {"kind": "v1"})
    is_v4 = tok_cfg.get("kind") == "trigger"
    if is_v4:
        grid = build_trigger_token_grid(
            **{k: v for k, v in tok_cfg.items() if k != "kind"})
        net = LongBNSNPEv4(enc=enc_cfg,
                           flow_bins=cal_cfg.get("flow", {}).get("bins", 12),
                           sigma_mc_rel=tok_cfg["sigma_mc_rel"],
                           sigma_t=tok_cfg["sigma_t"])

        def sim_fn(k, n, amp_scale=1.0):
            return simulate_long_bns_batch_v4(k, n, grid, amp_scale)
    else:
        net = LongBNSNPE(enc=enc_cfg)
    if tok_cfg.get("kind") == "chirp":
        grid = build_chirp_token_grid(
            **{k: v for k, v in tok_cfg.items() if k != "kind"})

        def sim_fn(k, n):
            return simulate_long_bns_batch_v3(k, n, grid)
    elif not is_v4:
        sim_kw = dict(duration=cal_cfg["duration"],
                      n_bands=cal_cfg["n_bands"],
                      per_band=cal_cfg["per_band"])

        def sim_fn(k, n):
            return simulate_long_bns_batch(k, n, **sim_kw)

    key0 = jax.random.PRNGKey(0)
    batch0 = jax.jit(lambda k: sim_fn(k, args.chunk))(key0)
    params = jax.jit(net.init)(key0, *batch0)
    params = from_bytes(params, (mdir / "params.msgpack").read_bytes())
    log.info("loaded %s (tokens %s)", mdir, batch0[0].shape)

    scaler = ParamScaler()

    @jax.jit
    def chunk_metrics(params, k):
        if is_v4:
            tokens, theta, trig = sim_fn(k, args.chunk)
            nll = net.apply(params, tokens, theta, trig)
            # conditioning counterfactual: same (theta, trigger, noise),
            # signal removed
            tok0, _, _ = sim_fn(k, args.chunk, 0.0)
            nll_alt = net.apply(params, tok0, theta, trig)
            draws, y_raw = net.apply(params, jax.random.fold_in(k, 1),
                                     tokens, trig, args.n_post,
                                     method=LongBNSNPEv4.sample_raw)
            # posterior chirp-mass std vs the trigger residual prior's
            mc_d = ((draws[..., 0] * draws[..., 1]) ** 0.6
                    * (draws[..., 0] + draws[..., 1]) ** -0.2)
            mc_sharpen = jnp.median(
                jnp.std(mc_d, axis=1)
                / (tok_cfg["sigma_mc_rel"] * trig[:, 0]))
        else:
            tokens, theta = sim_fn(k, args.chunk)
            nll = net.apply(params, tokens, theta)
            nll_alt = net.apply(params, tokens,
                                jnp.roll(theta, 1, axis=0))
            draws, y_raw = net.apply(params, jax.random.fold_in(k, 1),
                                     tokens, args.n_post,
                                     method=LongBNSNPE.sample_raw)
            mc_sharpen = jnp.float32(0.0)
        lo50 = jnp.quantile(draws, 0.25, axis=1)
        hi50 = jnp.quantile(draws, 0.75, axis=1)
        lo90 = jnp.quantile(draws, 0.05, axis=1)
        hi90 = jnp.quantile(draws, 0.95, axis=1)
        in50 = ((theta >= lo50) & (theta <= hi50)).astype(jnp.float32)
        in90 = ((theta >= lo90) & (theta <= hi90)).astype(jnp.float32)
        rank = jnp.sum((draws < theta[:, None, :]).astype(jnp.int32), axis=1)
        railed = scaler.railing_mask(y_raw)            # [B, n_post]
        med = jnp.quantile(draws, 0.5, axis=1)         # [B, 11]
        return (nll, nll_alt, in50, in90, rank,
                jnp.mean(railed.astype(jnp.float32)),
                jnp.log(med[:, 2]), jnp.log(theta[:, 2]), mc_sharpen)

    t0 = time.time()
    nlls, shufs, in50s, in90s, ranks, rails, lmeds, ltrues, sharps = \
        [], [], [], [], [], [], [], [], []
    n_chunks = max(1, -(-args.n_events // args.chunk))
    for i in range(n_chunks):
        k = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
        out = chunk_metrics(params, k)
        nlls.append(float(out[0])); shufs.append(float(out[1]))
        in50s.append(np.asarray(out[2])); in90s.append(np.asarray(out[3]))
        ranks.append(np.asarray(out[4])); rails.append(float(out[5]))
        lmeds.append(np.asarray(out[6])); ltrues.append(np.asarray(out[7]))
        sharps.append(float(out[8]))
        if i == 0:
            log.info("first chunk %.1fs (compile included)",
                     time.time() - t0)
    cov50 = np.concatenate(in50s).mean(0)
    cov90 = np.concatenate(in90s).mean(0)
    rk = np.concatenate(ranks)
    lmed, ltrue = np.concatenate(lmeds), np.concatenate(ltrues)

    sbc_p = [float(kstest((rk[:, j] + 0.5) / (args.n_post + 1),
                          "uniform").pvalue) for j in range(11)]
    # circular params rank-wrap like LeanNPE's battery: KS on the wrapped
    # rank is still uniform under calibration, so no special-casing needed
    delta_name = "signal_delta_nll" if is_v4 else "shuffle_delta_nll"
    metrics = {
        "val_nll": float(np.mean(nlls)),
        delta_name: float(np.mean(shufs) - np.mean(nlls)),
        "cov50_all": dict(zip(PARAM_NAMES, np.round(cov50, 4).tolist())),
        "cov90_all": dict(zip(PARAM_NAMES, np.round(cov90, 4).tolist())),
        "cov50_violations": int(np.sum(np.abs(cov50 - 0.5) > 0.07)),
        "cov90_violations": int(np.sum(np.abs(cov90 - 0.9) > 0.05)),
        "sbc_ks_p": dict(zip(PARAM_NAMES,
                             [round(p, 6) for p in sbc_p])),
        "sbc_pass_frac": float(np.mean(np.asarray(sbc_p) > 1e-3)),
        "spurious_railing": float(np.mean(rails)),
        "dist_corr": float(np.corrcoef(lmed, ltrue)[0, 1]),
        "n_events_nominal": args.n_events,
        "n_events": int(n_chunks * args.chunk),
        "n_post": args.n_post,
        "wall_s": round(time.time() - t0, 1),
    }
    if is_v4:
        metrics["mc_sharpen"] = float(np.median(sharps))
    gates = GATES_V4 if is_v4 else GATES
    checks = [_check(name, metrics[name], spec)
              for name, spec in gates.items()]
    passed = all(c["passed"] for c in checks)

    import datetime
    report = {
        "passed": passed,
        "checks": checks,
        "metrics": metrics,
        "checkpoint": str(mdir),
        "_meta": {
            "ckpt": str(mdir),
            "generated_utc": datetime.datetime.now(
                datetime.timezone.utc).isoformat(timespec="seconds"),
            "config_hash": config_hash(cal_cfg),
            "param_names": list(PARAM_NAMES),
        },
    }
    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)
    (outdir / "report.json").write_text(json.dumps(report, indent=2))
    for c in checks:
        log.info("%-22s %10.4f %2s %-8s %s", c["gate"], c["value"],
                 c["op"], c["threshold"],
                 "PASS" if c["passed"] else "FAIL")
    print(json.dumps({"passed": passed,
                      "val_nll": metrics["val_nll"],
                      "out": str(outdir / "report.json")}))
    return 0 if passed else 1


if __name__ == "__main__":
    raise SystemExit(main())
