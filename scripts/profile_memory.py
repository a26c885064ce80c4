#!/usr/bin/env python3
"""Memory-profile the compiled train step vs batch size — confirm or kill
the VMEM working-set hypothesis for the b>128 throughput cliff.

VERDICT r3 weak-#1: 74.8 steps/s @ b128 collapses to 32.4 @ b256 (worse
than linear: 2x the work at 0.43x the rate) with only a hypothesis on
record (reports/train_profile_r3.md §4). This script AOT-compiles the
FULL production train step at several batch sizes and records XLA's
memory analysis (argument/output/temp/generated-code bytes) — if temp
(scratch) bytes jump superlinearly past b128, the working set stopped
fitting and XLA fell back to HBM-staged scheduling; if they scale
linearly, the cliff is elsewhere (e.g. scheduling/fusion regression) and
the hypothesis dies.

Usage: python scripts/profile_memory.py [--config configs/npe_r6.yaml]
           [--batches 64,128,192,256] [--out reports/memory_profile.json]
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="configs/npe_r6.yaml")
    ap.add_argument("--batches", default="64,128,192,256")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="reports/memory_profile.json")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-train")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import dataclasses
    from posteriflow_tpu.train.trainer import (init_state, make_train_step)
    from posteriflow_tpu.utils.config import load_config
    from posteriflow_tpu.utils.logging import setup_logging

    log = setup_logging()
    base = load_config(args.config)
    state = jax.jit(lambda k: init_state(k, base))(jax.random.PRNGKey(0))

    rows = []
    for b in [int(x) for x in args.batches.split(",")]:
        cfg = dataclasses.replace(base, batch_size=b)
        # build the unjitted step and AOT lower+compile (no execution)
        import jax.numpy as jnp
        from posteriflow_tpu.models.npe import LeanNPE
        from posteriflow_tpu.physics.simulator import simulate_batch
        from posteriflow_tpu.train.trainer import batch_nll
        import optax
        model = LeanNPE(cfg.npe)
        tx = __import__(
            "posteriflow_tpu.train.trainer",
            fromlist=["make_optimizer"]).make_optimizer(cfg)
        opt0 = tx.init(state.params)

        def step(params, opt, key):
            batch = simulate_batch(key, cfg.batch_size, cfg.sim)
            loss, grads = jax.value_and_grad(
                lambda p: batch_nll(model, p, batch))(params)
            ups, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, ups), opt, loss

        t0 = time.time()
        lowered = jax.jit(step).lower(state.params, opt0,
                                      jax.random.PRNGKey(1))
        compiled = lowered.compile()
        t_compile = time.time() - t0
        mem = compiled.memory_analysis()
        row = {"batch": b, "compile_s": round(t_compile, 1)}
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes",
                  "alias_size_in_bytes"):
            v = getattr(mem, k, None)
            if v is not None:
                row[k] = int(v)
        # FLOP/bytes from the cost analysis when exposed
        try:
            cost = compiled.cost_analysis()
            ca = cost[0] if isinstance(cost, (list, tuple)) else cost
            row["flops"] = float(ca.get("flops", -1))
            row["bytes_accessed"] = float(ca.get("bytes accessed", -1))
        except Exception:
            pass
        rows.append(row)
        log.info("b=%d: temp=%.2f GB, compile=%.0fs", b,
                 row.get("temp_size_in_bytes", 0) / 2 ** 30, t_compile)

    # verdict on the hypothesis: superlinearity of temp bytes b128 -> b256
    by_b = {r["batch"]: r for r in rows}
    verdict = None
    if 128 in by_b and 256 in by_b and "temp_size_in_bytes" in by_b[128]:
        ratio = by_b[256]["temp_size_in_bytes"] \
            / max(by_b[128]["temp_size_in_bytes"], 1)
        verdict = {"temp_ratio_256_over_128": round(ratio, 3),
                   "superlinear": ratio > 2.3,
                   "note": "ratio ~2 = linear scaling (hypothesis dies); "
                           ">>2 = working-set blowup (hypothesis lives)"}
    out = {"config": args.config, "rows": rows,
           "cliff_hypothesis": verdict}
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out["cliff_hypothesis"] or rows[-1]))


if __name__ == "__main__":
    main()
