#!/usr/bin/env python3
"""Train LeanNPE (the reference's experiments/train_lean_npe.py CLI,
TPU-native: no dataset on disk — batches are synthesized on-device).

Examples:
  python scripts/train_npe.py --outdir model/run1 --epochs 60
  python scripts/train_npe.py --config configs/npe_v5p.yaml --outdir model/v1
  python scripts/train_npe.py --outdir model/ft --init-from model/run1/ckpt/best
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", help="YAML TrainConfig overrides")
    ap.add_argument("--outdir", default="model/lean_npe")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--steps-per-epoch", type=int, default=200)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--encoder", choices=("conv", "coherent"), default=None)
    ap.add_argument("--premerger", action="store_true")
    ap.add_argument("--det-dropout", type=float, default=None)
    ap.add_argument("--psd-cond", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ckpt-every", type=int, default=0)
    ap.add_argument("--init-from", default=None,
                    help="load weights, FRESH optimizer (fine-tune)")
    ap.add_argument("--resume-from", default=None,
                    help="restore the FULL TrainState (params + optimizer "
                         "+ schedule) — true continuation, no LR restart")
    ap.add_argument("--noise-bank", default=None,
                    help="real-noise bank directory (see "
                         "scripts/download_gwosc_noise_bank.py); enables "
                         "real-noise mixing + the dual-domain validation")
    ap.add_argument("--real-noise-prob", type=float, default=None,
                    help="per-event probability of a real-noise crop "
                         "(reference: train_lean_npe.py --real_noise_prob)")
    ap.add_argument("--grad-clip-mode", choices=("global", "agc"),
                    default=None,
                    help="override TrainConfig.grad_clip_mode (the r3 "
                         "grad-norm-growth investigation)")
    ap.add_argument("--grad-clip", type=float, default=None,
                    help="override TrainConfig.grad_clip (threshold for "
                         "global mode / x0.01 factor for agc)")
    ap.add_argument("--mesh", action="store_true",
                    help="shard the step over all visible devices")
    ap.add_argument("--prng", default="threefry2x32",
                    choices=["rbg", "threefry2x32"],
                    help="rbg = XLA hardware bit generator (the step draws "
                         "~25M normals; threefry is a long VPU chain)")
    ap.add_argument("--profile-dir", default=None,
                    help="write a jax.profiler trace of the first epoch")
    args = ap.parse_args(argv)

    from posteriflow_tpu.utils.logging import setup_logging, jax_trace
    log = setup_logging()

    # persistent compilation cache: the coherent-encoder forward alone takes
    # ~6.5 min to (remote-)compile on the tunneled TPU; cache across runs
    import jax
    if args.prng == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax-train")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    import dataclasses
    from posteriflow_tpu.train.trainer import TrainConfig
    from posteriflow_tpu.utils.config import load_config

    cfg = load_config(args.config) if args.config else TrainConfig()
    npe, sim = cfg.npe, cfg.sim
    if args.encoder:
        npe = dataclasses.replace(npe, encoder_type=args.encoder)
    if args.premerger:
        npe = dataclasses.replace(npe, premerger=True)
    if args.psd_cond:
        npe = dataclasses.replace(npe, psd_cond=True)
    if args.det_dropout is not None:
        sim = dataclasses.replace(sim, det_dropout=args.det_dropout)
    if args.real_noise_prob is not None:
        sim = dataclasses.replace(sim, real_noise_prob=args.real_noise_prob)
    total = args.epochs * args.steps_per_epoch
    cfg = dataclasses.replace(
        cfg, npe=npe, sim=sim, total_steps=total,
        **({"batch_size": args.batch} if args.batch else {}),
        **({"lr": args.lr} if args.lr else {}),
        **({"grad_clip_mode": args.grad_clip_mode}
           if args.grad_clip_mode else {}),
        **({"grad_clip": args.grad_clip}
           if args.grad_clip is not None else {}))

    bank = None
    if args.noise_bank:
        from posteriflow_tpu.data.noise_bank import load_noise_bank
        bank = load_noise_bank(args.noise_bank, psd_bands=cfg.sim.psd_bands)
        if cfg.sim.real_noise_prob <= 0.0:
            cfg = dataclasses.replace(
                cfg, sim=dataclasses.replace(cfg.sim, real_noise_prob=0.5))
        log.info("noise bank: %s (%d segments/det, real_noise_prob=%.2f)",
                 args.noise_bank, bank.n_segments, cfg.sim.real_noise_prob)
    elif cfg.sim.real_noise_prob > 0.0:
        ap.error("--real-noise-prob needs --noise-bank")

    mesh = None
    if args.mesh:
        from posteriflow_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
        log.info("mesh: %s", mesh)

    from posteriflow_tpu.train.loop import fit
    with jax_trace(args.profile_dir):
        state, history = fit(cfg, args.outdir, epochs=args.epochs,
                             steps_per_epoch=args.steps_per_epoch,
                             seed=args.seed, mesh=mesh,
                             ckpt_every=args.ckpt_every,
                             init_from=args.init_from,
                             resume_from=args.resume_from, bank=bank)
    return history


if __name__ == "__main__":
    main()
