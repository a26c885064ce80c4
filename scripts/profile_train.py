#!/usr/bin/env python3
"""Train-step component breakdown: where does the step time go?

VERDICT r2 weak-#1: MFU 6.8% with events/s FALLING as batch grows
(4589 @ 64 -> 3652 @ 256) and no profile explaining it. This script times
separately-jitted stages of the production train step at several batch
sizes on the live backend:

  sim        simulate_batch (priors -> PhenomD -> projection -> whiten ->
             irfft -> noise/bank mixing)
  encode     CoherentEncoder forward (geometry + conv stem + fusion)
  loss_fwd   full batch_nll forward (encode + 5-rank flow NLL)
  step       full train step (fwd + bwd + AdamW)

and optionally captures a jax.profiler trace of the full step
(--trace DIR), whose trace.json.gz is parsed for the top self-time ops.

Writes reports/train_profile.json. Usage:
  python scripts/profile_train.py [--batches 64,256] [--iters 30] [--cpu]
"""

import argparse
import glob
import gzip
import json
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def _timeit(fn, args, iters, key):
    import jax
    out = fn(*args(key))
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(iters):
        out = fn(*args(jax.random.fold_in(key, i)))
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def _parse_trace(trace_dir, top=25):
    """Sum self-time per op name from the profiler's trace.json.gz."""
    paths = glob.glob(str(Path(trace_dir) / "**" / "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return None
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    by_name = defaultdict(float)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")
            by_name[name] += ev["dur"]
    ranked = sorted(by_name.items(), key=lambda kv: -kv[1])[:top]
    return [{"op": k, "total_us": round(v, 1)} for k, v in ranked]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="configs/npe_production.yaml")
    ap.add_argument("--batches", default="64,256")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--prng", default="threefry2x32",
                    choices=["rbg", "threefry2x32"])
    ap.add_argument("--trace", default=None,
                    help="capture a profiler trace of the full step here")
    ap.add_argument("--out", default="reports/train_profile.json")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.prng == "rbg":
        # measured SLOWER than threefry on the axon backend (every program
        # in reports/sim_profile2.json ran ~2x the threefry time of
        # sim_profile3.json) — kept as an option for other TPU backends
        jax.config.update("jax_default_prng_impl", "rbg")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-train")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import dataclasses
    import jax.numpy as jnp
    from posteriflow_tpu.models.npe import LeanNPE
    from posteriflow_tpu.physics.simulator import simulate_batch
    from posteriflow_tpu.train.trainer import (TrainConfig, batch_nll,
                                               init_state, make_train_step)
    from posteriflow_tpu.utils.config import load_config
    from posteriflow_tpu.utils.logging import setup_logging

    log = setup_logging()
    base = load_config(args.config) if args.config else TrainConfig()

    bank = None
    if base.sim.real_noise_prob > 0.0:
        from posteriflow_tpu.data.noise_bank import make_synthetic_bank
        bank = make_synthetic_bank(jax.random.PRNGKey(7), n_segments=8,
                                   psd_bands=base.sim.psd_bands)

    report = {"backend": jax.default_backend(), "iters": args.iters,
              "batches": {}}
    key = jax.random.PRNGKey(0)
    state = jax.jit(lambda k: init_state(k, base))(key)

    for b in [int(x) for x in args.batches.split(",")]:
        cfg = dataclasses.replace(base, batch_size=b)
        model = LeanNPE(cfg.npe)
        log.info("batch %d: compiling stage programs", b)

        sim = jax.jit(lambda k: simulate_batch(k, b, cfg.sim, bank=bank))

        def enc(k):
            batch = simulate_batch(k, b, cfg.sim, bank=bank)
            asd = batch.asd_bands if cfg.npe.uses_asd_bands else None
            ctx = model.apply(state.params, batch.strain, asd,
                              method=LeanNPE.encode)
            return jnp.sum(ctx)

        def loss_fwd(k):
            batch = simulate_batch(k, b, cfg.sim, bank=bank)
            return batch_nll(model, state.params, batch)

        enc_j = jax.jit(enc)
        loss_j = jax.jit(loss_fwd)
        step = make_train_step(cfg, with_bank=bank is not None)

        stages = {}
        stages["sim"] = _timeit(lambda k: jnp.sum(sim(k).strain), lambda k:
                                (k,), args.iters, jax.random.fold_in(key, b))
        stages["sim_encode"] = _timeit(enc_j, lambda k: (k,), args.iters,
                                       jax.random.fold_in(key, b + 1))
        stages["loss_fwd"] = _timeit(loss_j, lambda k: (k,), args.iters,
                                     jax.random.fold_in(key, b + 2))

        # full step: time with state threading (donated)
        st = jax.jit(lambda k: init_state(k, cfg))(jax.random.PRNGKey(1))
        sargs = (st, jax.random.PRNGKey(2), bank) if bank is not None \
            else (st, jax.random.PRNGKey(2))
        st, m = step(*sargs)
        jax.block_until_ready(m["nll"])
        t0 = time.time()
        k = jax.random.PRNGKey(3)
        for i in range(args.iters):
            k, ks = jax.random.split(k)
            sargs = (st, ks, bank) if bank is not None else (st, ks)
            st, m = step(*sargs)
        jax.block_until_ready(m["nll"])
        stages["step"] = (time.time() - t0) / args.iters

        # per-stage FLOPs from XLA cost analysis
        flops = {}
        for name, fn, fa in (("sim", sim, (key,)), ("sim_encode", enc_j,
                                                    (key,)),
                             ("loss_fwd", loss_j, (key,))):
            try:
                c = fn.lower(*fa).compile().cost_analysis()
                if isinstance(c, list):
                    c = c[0]
                flops[name] = float(c.get("flops", 0.0)) if c else None
            except Exception:
                flops[name] = None

        derived = {
            "sim_ms": round(stages["sim"] * 1e3, 2),
            "encode_ms": round((stages["sim_encode"] - stages["sim"]) * 1e3,
                               2),
            "flow_nll_ms": round((stages["loss_fwd"] - stages["sim_encode"])
                                 * 1e3, 2),
            "bwd_opt_ms": round((stages["step"] - stages["loss_fwd"]) * 1e3,
                                2),
            "step_ms": round(stages["step"] * 1e3, 2),
            "events_per_s": round(b / stages["step"], 1),
        }
        report["batches"][str(b)] = {"stage_s": {k2: round(v, 5) for k2, v
                                                 in stages.items()},
                                     "derived": derived, "flops": flops}
        log.info("batch %d: %s", b, json.dumps(derived))

    if args.trace:
        b = int(args.batches.split(",")[0])
        cfg = dataclasses.replace(base, batch_size=b)
        step = make_train_step(cfg, with_bank=bank is not None)
        st = jax.jit(lambda k: init_state(k, cfg))(jax.random.PRNGKey(1))
        sargs = (st, key, bank) if bank is not None else (st, key)
        st, m = step(*sargs)
        jax.block_until_ready(m["nll"])
        try:
            with jax.profiler.trace(args.trace):
                k = jax.random.PRNGKey(9)
                for i in range(5):
                    k, ks = jax.random.split(k)
                    sargs = (st, ks, bank) if bank is not None else (st, ks)
                    st, m = step(*sargs)
                jax.block_until_ready(m["nll"])
            report["trace_top_ops"] = _parse_trace(args.trace)
        except Exception as e:                       # pragma: no cover
            log.warning("profiler trace failed: %s", e)
            report["trace_error"] = str(e)

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
