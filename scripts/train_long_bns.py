#!/usr/bin/env python3
"""Train the long-BNS NPE (BASELINE configs[3]) and commit its calibration.

VERDICT r2 missing-#4: models/long_bns.py was built and exactness-tested
but never TRAINED. This CLI trains a small LongBNSNPE on multibanded
64-s TaylorF2+tidal BNS injections (the long time series is never
materialized — the front-end's point), then runs a PP/coverage battery and
writes model/long_bns_v1/{params.msgpack,history.json,calibration.json}.

Usage: python scripts/train_long_bns.py [--steps 4000] [--batch 16] [--cpu]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--outdir", default="model/long_bns_v1")
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--duration", type=float, default=64.0)
    ap.add_argument("--tokens", default="v4", choices=["v1", "v3", "v4"],
                    help="front-end: v1 = legacy geomspaced mean-pool "
                         "(conditioning-dead: pooling destroys the chirp "
                         "phase, see build_chirp_token_grid docstring); "
                         "v3 = chirp-adapted heterodyned pooling (also "
                         "conditioning-dead: per-token SNR ~0.009); "
                         "v4 = trigger-conditioned heterodyne (per-token "
                         "SNR ~1, SNR^2 retention >99%)")
    ap.add_argument("--sigma-mc-rel", type=float, default=5e-4,
                    help="v4: trigger chirp-mass relative error")
    ap.add_argument("--sigma-t", type=float, default=5e-3,
                    help="v4: trigger per-detector timing error [s]")
    ap.add_argument("--flow-bins", type=int, default=12)
    ap.add_argument("--n-bands", type=int, default=64)
    ap.add_argument("--per-band", type=int, default=32)
    ap.add_argument("--alpha", type=float, default=2.0,
                    help="v3: max intra-pool phase spread [rad]")
    ap.add_argument("--f-hi", type=float, default=512.0)
    ap.add_argument("--patch", type=int, default=4,
                    help="v3: non-overlapping patch size for the embed")
    ap.add_argument("--n-heads", type=int, default=8)
    ap.add_argument("--d-model", type=int, default=128)
    ap.add_argument("--n-layers", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--cal-events", type=int, default=256)
    ap.add_argument("--cal-post", type=int, default=256)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mesh", type=int, default=0,
                    help="train through the SEQUENCE-PARALLEL path on an "
                         "N-device (data x model) mesh — exercises the "
                         "shard_map encoder in anger (implies --cpu on "
                         "this single-chip machine: virtual host devices)")
    ap.add_argument("--prng", default="threefry2x32",
                    choices=["rbg", "threefry2x32"])
    ap.add_argument("--scan", type=int, default=0,
                    help="steps per scanned epoch: run N train steps "
                         "inside ONE jitted lax.scan program (the flagship "
                         "loop's dispatch fix — per-step host dispatch "
                         "through the tunneled chip caps at ~7 steps/s)")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)

    import os
    if args.mesh:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.mesh}"
            ).strip()
        args.cpu = True

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.prng == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-train")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax.serialization import from_bytes, to_bytes

    from posteriflow_tpu import PARAM_NAMES
    from posteriflow_tpu.models.long_bns import (LongBNSNPE, LongBNSNPEv4,
                                                 build_chirp_token_grid,
                                                 build_trigger_token_grid,
                                                 simulate_long_bns_batch,
                                                 simulate_long_bns_batch_v3,
                                                 simulate_long_bns_batch_v4)
    from posteriflow_tpu.utils.logging import setup_logging

    log = setup_logging()
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    is_v4 = args.tokens == "v4"
    if is_v4:
        grid = build_trigger_token_grid(duration=args.duration,
                                        f_hi=args.f_hi, alpha=args.alpha,
                                        sigma_mc_rel=args.sigma_mc_rel,
                                        sigma_t=args.sigma_t)
        tok_cfg = grid["config"]
        enc_cfg = dict(d_model=args.d_model, n_layers=args.n_layers,
                       n_heads=args.n_heads, patch=args.patch)

        def batch_fn(k, amp_scale=1.0):
            return simulate_long_bns_batch_v4(k, args.batch, grid,
                                              amp_scale)
    elif args.tokens == "v3":
        grid = build_chirp_token_grid(duration=args.duration,
                                      f_hi=args.f_hi, alpha=args.alpha)
        tok_cfg = grid["config"]
        enc_cfg = dict(d_model=args.d_model, n_layers=args.n_layers,
                       n_heads=args.n_heads, patch=args.patch)

        def batch_fn(k):
            return simulate_long_bns_batch_v3(k, args.batch, grid)
    else:
        tok_cfg = {"kind": "v1", "n_bands": args.n_bands,
                   "per_band": args.per_band}
        enc_cfg = dict(d_model=args.d_model, n_layers=args.n_layers)

        def batch_fn(k):
            return simulate_long_bns_batch(k, args.batch,
                                           duration=args.duration,
                                           n_bands=args.n_bands,
                                           per_band=args.per_band)

    if is_v4:
        net = LongBNSNPEv4(enc=enc_cfg, flow_bins=args.flow_bins,
                           sigma_mc_rel=args.sigma_mc_rel,
                           sigma_t=args.sigma_t)
    else:
        net = LongBNSNPE(enc=enc_cfg)

    key = jax.random.PRNGKey(args.seed)
    batch0 = jax.jit(batch_fn)(key)
    tokens0, theta0 = batch0[0], batch0[1]
    log.info("tokens %s  theta %s", tokens0.shape, theta0.shape)
    params = jax.jit(net.init)(key, *batch0)
    n_par = sum(x.size for x in jax.tree.leaves(params))
    log.info("LongBNSNPE: %s params", f"{n_par:,}")

    # write the architecture record UP FRONT (pending: true): a run killed
    # by wall-clock (long CPU-mesh runs) must still leave a loadable
    # config next to its periodic params.msgpack snapshots, or the
    # validator/resume path cannot rebuild the net (the calibration
    # battery overwrites this with the full record at the end)
    cal_path = outdir / "calibration.json"
    if not (args.resume and cal_path.exists()):
        cal_path.write_text(json.dumps({
            "pending": True,
            "config": {"duration": args.duration, "steps": args.steps,
                       "batch": args.batch, "enc": enc_cfg,
                       "tokens": tok_cfg,
                       "flow": {"bins": args.flow_bins} if is_v4 else {},
                       "n_params": n_par, "mesh": args.mesh,
                       "n_bands": args.n_bands, "per_band": args.per_band,
                       **{k: enc_cfg[k] for k in ("d_model", "n_layers")}},
        }, indent=2))

    warmup = min(200, max(1, args.steps // 10))
    sched = optax.warmup_cosine_decay_schedule(0.0, args.lr, warmup,
                                               max(args.steps, warmup + 1),
                                               end_value=0.02 * args.lr)
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.adamw(sched, weight_decay=1e-5))
    opt_state = tx.init(params)

    ckpt = outdir / "params.msgpack"
    history = []
    if args.resume and ckpt.exists():
        params = from_bytes(params, ckpt.read_bytes())
        history = json.loads((outdir / "history.json").read_text())
        log.info("resumed from %s (%d records)", ckpt, len(history))

    sharded_loss = None
    if args.mesh:
        from jax.sharding import Mesh
        devs = np.array(jax.devices()[: args.mesh])
        mesh = Mesh(devs.reshape(1, args.mesh), ("data", "model"))
        from posteriflow_tpu.models.long_bns import (make_sharded_nll,
                                                     make_sharded_nll_v4)
        sharded_loss = (make_sharded_nll_v4(mesh, tokens0.shape[1], net)
                        if is_v4
                        else make_sharded_nll(mesh, tokens0.shape[1], net))
        log.info("sequence-parallel training on %s", mesh)

    def step_impl(carry, k):
        params, opt_state = carry
        batch = batch_fn(k)

        def loss_fn(p):
            if sharded_loss is not None:
                return sharded_loss(p, *batch)
            return net.apply(p, *batch)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    @jax.jit
    def step(params, opt_state, k):
        (params, opt_state), loss = step_impl((params, opt_state), k)
        return params, opt_state, loss

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def epoch_scan(params, opt_state, ekey):
        def body(c, i):
            return step_impl(c, jax.random.fold_in(ekey, i))

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state),
            jnp.arange(args.scan, dtype=jnp.int32))
        return params, opt_state, jnp.mean(losses), losses[-1]

    delta_key = "signal_delta" if is_v4 else "shuffle_delta"

    @jax.jit
    def val_metrics(params, kv):
        if is_v4:
            tv, thv, trv = batch_fn(kv)
            vloss = net.apply(params, tv, thv, trv)
            # signal-delta: SAME (theta, trigger, noise), signal removed
            # (amp_scale=0). A strain-ignoring model scores 0; this is the
            # v4 conditioning metric (theta-shuffle is meaningless under
            # trigger-relative labels: it tests trigger-label consistency,
            # not strain use).
            tv0, _, _ = batch_fn(kv, 0.0)
            vdelta = net.apply(params, tv0, thv, trv)
            return vloss, vdelta - vloss
        tv, thv = batch_fn(kv)
        vloss = net.apply(params, tv, thv)
        # context-shuffle delta: the conditioning signal the v2 failure
        # (shuffle_delta 0.037 after 50k steps) made a first-class metric
        vshuf = net.apply(params, tv, jnp.roll(thv, 1, axis=0))
        return vloss, vshuf - vloss

    def eval_and_record(step_no, train_nll, t0):
        kv = jax.random.fold_in(jax.random.PRNGKey(args.seed + 7), step_no)
        vloss, delta = (float(x) for x in val_metrics(params, kv))
        rec = {"step": step_no, "train_nll": float(train_nll),
               "val_nll": vloss, delta_key: round(delta, 4),
               "seconds": round(time.time() - t0, 1)}
        history.append(rec)
        log.info("step %5d | train %.3f | val %.3f | %s %.3f | %.0fs",
                 step_no, rec["train_nll"], vloss, delta_key, delta,
                 rec["seconds"])
        ckpt.write_bytes(to_bytes(params))
        (outdir / "history.json").write_text(json.dumps(history, indent=2))

    t0 = time.time()
    done = history[-1]["step"] if history else 0
    if args.scan:
        # scanned-epoch path: one dispatch per args.scan steps (the
        # flagship train/loop.py fix — 50k per-step dispatches through
        # the tunnel would otherwise dominate wall-clock)
        for e in range(done // args.scan, args.steps // args.scan):
            params, opt_state, mloss, lloss = epoch_scan(
                params, opt_state,
                jax.random.fold_in(jax.random.PRNGKey(args.seed), e))
            eval_and_record((e + 1) * args.scan, float(lloss), t0)
    else:
        for i in range(done, args.steps):
            key, k = jax.random.split(key)
            params, opt_state, loss = step(params, opt_state, k)
            if (i + 1) % args.eval_every == 0 or i == 0:
                eval_and_record(i + 1, float(loss), t0)

    # ── calibration battery: coverage + SBC ranks over fresh events ──────
    log.info("calibration battery: %d events x %d draws", args.cal_events,
             args.cal_post)

    @jax.jit
    def cal_chunk(params, k):
        if is_v4:
            tokens, theta, trig = batch_fn(k)
            draws = net.apply(params, jax.random.fold_in(k, 1), tokens,
                              trig, args.cal_post,
                              method=LongBNSNPEv4.sample)
        else:
            tokens, theta = batch_fn(k)
            draws = net.apply(params, jax.random.fold_in(k, 1), tokens,
                              args.cal_post, method=LongBNSNPE.sample)
        # central-interval coverage + SBC rank per parameter
        lo50 = jnp.quantile(draws, 0.25, axis=1)
        hi50 = jnp.quantile(draws, 0.75, axis=1)
        lo90 = jnp.quantile(draws, 0.05, axis=1)
        hi90 = jnp.quantile(draws, 0.95, axis=1)
        in50 = ((theta >= lo50) & (theta <= hi50)).astype(jnp.float32)
        in90 = ((theta >= lo90) & (theta <= hi90)).astype(jnp.float32)
        rank = jnp.sum((draws < theta[:, None, :]).astype(jnp.int32),
                       axis=1)
        return in50, in90, rank

    in50s, in90s, ranks = [], [], []
    n_chunks = max(1, args.cal_events // args.batch)
    for i in range(n_chunks):
        k = jax.random.fold_in(jax.random.PRNGKey(args.seed + 1234), i)
        a, b, r = cal_chunk(params, k)
        in50s.append(np.asarray(a))
        in90s.append(np.asarray(b))
        ranks.append(np.asarray(r))
    cov50 = np.concatenate(in50s).mean(0)
    cov90 = np.concatenate(in90s).mean(0)
    rk = np.concatenate(ranks)

    from scipy.stats import kstest
    sbc_p = [float(kstest((rk[:, j] + 0.5) / (args.cal_post + 1),
                          "uniform").pvalue) for j in range(11)]
    cal = {
        "n_events": int(n_chunks * args.batch),
        "n_post": args.cal_post,
        "cov50": dict(zip(PARAM_NAMES, np.round(cov50, 3).tolist())),
        "cov90": dict(zip(PARAM_NAMES, np.round(cov90, 3).tolist())),
        "cov50_violations": int(np.sum(np.abs(cov50 - 0.5) > 0.07)),
        "cov90_violations": int(np.sum(np.abs(cov90 - 0.9) > 0.05)),
        "sbc_ks_p": dict(zip(PARAM_NAMES, sbc_p)),
        "sbc_pass_frac": float(np.mean(np.asarray(sbc_p) > 1e-3)),
        "final_val_nll": history[-1]["val_nll"] if history else None,
        # nested enc/tokens dicts: the validator rebuilds BOTH verbatim
        # (ADVICE r4: cherry-picked flat keys silently rebuilt a different
        # architecture when enc_cfg grew)
        "config": {"duration": args.duration, "steps": args.steps,
                   "batch": args.batch, "enc": enc_cfg, "tokens": tok_cfg,
                   "flow": {"bins": args.flow_bins} if is_v4 else {},
                   "n_params": n_par, "mesh": args.mesh,
                   # legacy flat keys kept for older readers
                   "n_bands": args.n_bands, "per_band": args.per_band,
                   **{k: enc_cfg[k] for k in ("d_model", "n_layers")}},
    }
    (outdir / "calibration.json").write_text(json.dumps(cal, indent=2))
    log.info("cov50 violations: %d; cov90 violations: %d; SBC pass %.2f",
             cal["cov50_violations"], cal["cov90_violations"],
             cal["sbc_pass_frac"])
    print(json.dumps({k: cal[k] for k in ("cov50_violations",
                                          "cov90_violations",
                                          "sbc_pass_frac",
                                          "final_val_nll")}))


if __name__ == "__main__":
    main()
