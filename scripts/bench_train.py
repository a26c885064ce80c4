#!/usr/bin/env python3
"""Training-throughput benchmark: steps/s, events/s, and measured MFU.

BASELINE.md names "NPE train steps/sec/chip" as a first-class metric
(VERDICT.md round-1 weak spot #5: nobody measured it). Protocol: jit the
FULL production train step (on-device simulation -> encoder -> per-rank
NLL -> grads -> AdamW), run a timed steady-state window, and report

  - steps/s and events/s (batch_size x steps/s)
  - model FLOPs/step from XLA's compiled cost analysis
  - MFU = achieved FLOPs/s / chip peak (v5e bf16 peak 197 TFLOP/s by
    default; override with --peak-tflops)

Writes reports/train_throughput.json and prints one JSON line.

Usage: python scripts/bench_train.py [--config configs/npe_production.yaml]
           [--batch 64] [--steps 60] [--cpu]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="configs/npe_production.yaml")
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip peak bf16 TFLOP/s (TPU v5e: 197)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--prng", default="threefry2x32",
                    choices=["rbg", "threefry2x32"])
    ap.add_argument("--no-bank", action="store_true")
    ap.add_argument("--out", default="reports/train_throughput.json")
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
    from posteriflow_tpu.train.trainer import (TrainConfig, init_state,
                                               make_train_step)
    from posteriflow_tpu.utils.config import load_config
    from posteriflow_tpu.utils.logging import setup_logging

    log = setup_logging()
    cfg = load_config(args.config) if args.config else TrainConfig()
    if args.batch:
        cfg = dataclasses.replace(cfg, batch_size=args.batch)

    bank = None
    if cfg.sim.real_noise_prob > 0.0 and not args.no_bank:
        from posteriflow_tpu.data.noise_bank import make_synthetic_bank
        bank = make_synthetic_bank(jax.random.PRNGKey(7), n_segments=8,
                                   psd_bands=cfg.sim.psd_bands)

    state = jax.jit(lambda k: init_state(k, cfg))(jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    step = make_train_step(cfg, with_bank=bank is not None)

    # compiled FLOPs per step from XLA cost analysis
    key0 = jax.random.PRNGKey(1)
    flops = None
    try:
        lowered = (step.lower(state, key0, bank) if bank is not None
                   else step.lower(state, key0))
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) if cost else None
    except Exception as e:                      # pragma: no cover
        log.warning("cost analysis unavailable: %s", e)

    log.info("compiling + warmup (%s params, batch %d, backend %s)",
             f"{n_params:,}", cfg.batch_size, jax.default_backend())
    t_c0 = time.time()
    if bank is not None:
        state, m = step(state, key0, bank)
    else:
        state, m = step(state, key0)
    jax.block_until_ready(m["nll"])
    compile_s = time.time() - t_c0

    # steady-state timing: enqueue all steps, block once (pipelined
    # dispatch — the per-step Python overhead overlaps device compute)
    key = jax.random.PRNGKey(2)
    t0 = time.time()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        if bank is not None:
            state, m = step(state, k, bank)
        else:
            state, m = step(state, k)
    jax.block_until_ready(m["nll"])
    dt = time.time() - t0

    steps_per_s = args.steps / dt
    events_per_s = steps_per_s * cfg.batch_size
    achieved = flops * steps_per_s if flops else None
    mfu = (achieved / (args.peak_tflops * 1e12)) if achieved else None

    report = {
        "backend": jax.default_backend(),
        "batch_size": cfg.batch_size,
        "encoder": cfg.npe.encoder_type,
        "psd_cond": cfg.npe.psd_cond,
        "real_noise_prob": cfg.sim.real_noise_prob if bank is not None
        else 0.0,
        "n_params": n_params,
        "compile_s": round(compile_s, 1),
        "steps_timed": args.steps,
        "steps_per_sec": round(steps_per_s, 3),
        "events_per_sec": round(events_per_s, 1),
        "flops_per_step": flops,
        "achieved_tflops": round(achieved / 1e12, 3) if achieved else None,
        "peak_tflops": args.peak_tflops,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "final_nll": float(m["nll"]),
    }
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
