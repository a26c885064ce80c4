#!/usr/bin/env python3
"""posteriflow-tpu inference CLI.

Mirrors the reference CLI (reference: infer.py:92-195): one command from
strain to posterior.

Sources (one of):
  --event NAME            GWOSC fetch by event name (requires gwpy)
  --strain FILE [...]     local strain files (npy [3,T] or one per det)
                          + --gps for the event time
  --inject                fresh injection through the exact training
                          simulator (random params or --inject-params JSON)

Examples:
  python infer.py --ckpt model/ckpt --inject --n-samples 5000 --out results/inj
  python infer.py --ckpt model/ckpt --inject --n-signals 2 --out results/ovl
  python infer.py --ckpt model/ckpt --strain strain.npy --gps 1369224018 --out results/ev
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--ckpt", required=True,
                    help="checkpoint root dir (containing best/last)")
    ap.add_argument("--name", default="best", help="checkpoint name")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--event", help="GWOSC event name (requires gwpy)")
    src.add_argument("--strain", nargs="+",
                     help="strain file(s): one .npy [3,T] or H1/L1/V1 files")
    src.add_argument("--inject", action="store_true",
                     help="fresh simulated injection")
    ap.add_argument("--gps", type=float, help="GPS time for --strain")
    ap.add_argument("--asd", nargs="+",
                    help="measured ASD/PSD txt file(s), 'DET:path' or one "
                         "per detector in H1 L1 V1 order (reference: "
                         "infer.py --psd); overrides the median-ASD "
                         "estimate in the real-strain path")
    ap.add_argument("--inject-params",
                    help="JSON file/string: list of parameter dicts")
    ap.add_argument("--rank", type=int, default=0)
    ap.add_argument("--n-signals", type=int, default=1,
                    help=">1 runs rank-conditioned overlap inference")
    ap.add_argument("--n-samples", type=int, default=5000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--importance", action="store_true",
                    help="importance-correct against the exact likelihood")
    ap.add_argument("--plots", action="store_true")
    ap.add_argument("--out", default="results/run")
    args = ap.parse_args(argv)

    from posteriflow_tpu.utils.logging import setup_logging
    log = setup_logging()

    import numpy as np
    from posteriflow_tpu.inference import (infer, infer_overlapping,
                                           load_model, prepare_real,
                                           prepare_simulated,
                                           rank_overlapping)

    engine = load_model(args.ckpt, args.name)

    asd_by_det = None
    if args.asd:
        from posteriflow_tpu.physics.psd import load_asd_file
        dets = ("H1", "L1", "V1")
        asd_by_det = {}
        for i, spec in enumerate(args.asd):
            det, _, path = spec.rpartition(":") if ":" in spec \
                else (dets[i], ":", spec)
            asd_by_det[det] = load_asd_file(path)
        log.info("measured ASD override: %s", sorted(asd_by_det))

    # ── data source dispatch ──────────────────────────────────────────────────
    if args.inject:
        if args.inject_params:
            raw = args.inject_params
            txt = Path(raw).read_text() if Path(raw).exists() else raw
            params_list = json.loads(txt)
        else:
            import jax
            from posteriflow_tpu.prior import (PriorConfig,
                                               sample_signal_params)
            # draw from the checkpoint's own parameter space (15-D
            # flagships get precessing injections)
            names = tuple(engine.cfg.npe.param_names)
            pcfg = PriorConfig(precessing=len(names) >= 15)
            keys = jax.random.split(jax.random.PRNGKey(args.seed),
                                    args.n_signals)
            draws = [np.asarray(sample_signal_params(k, pcfg))
                     for k in keys]
            params_list = [dict(zip(names, map(float, d)))
                           for d in draws]
            log.info("injected params: %s",
                     json.dumps(params_list, indent=1))
        prepared = prepare_simulated(params_list, seed=args.seed,
                                     psd_bands=engine.cfg.npe.psd_bands,
                                     param_names=tuple(
                                         engine.cfg.npe.param_names))
    elif args.event:
        from posteriflow_tpu.inference import fetch_gwosc
        strain_by_det, gps = fetch_gwosc(event=args.event)
        prepared = prepare_real(strain_by_det, gps_time=gps,
                                psd_bands=engine.cfg.npe.psd_bands,
                                asd_by_det=asd_by_det)
    else:
        files = args.strain
        if len(files) == 1:
            arr = np.load(files[0])
            strain_by_det = {d: arr[i] for i, d in
                             enumerate(("H1", "L1", "V1"))}
        else:
            strain_by_det = {Path(f).stem.split("_")[0]: np.load(f)
                             for f in files}
        prepared = prepare_real(strain_by_det, gps_time=args.gps or 0.0,
                                psd_bands=engine.cfg.npe.psd_bands,
                                asd_by_det=asd_by_det)

    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)

    # ── inference ─────────────────────────────────────────────────────────────
    if args.n_signals > 1:
        results = infer_overlapping(engine, data=prepared,
                                    n_signals=args.n_signals,
                                    n_samples=args.n_samples,
                                    seed=args.seed)
        order, scores = rank_overlapping(results, prepared.strain)
        log.info("extraction order: %s (scores %s)", order,
                 [round(s, 2) for s in scores])
        for r, res in enumerate(results):
            print(res.summary())
            res.save(outdir / f"rank{r}")
            if args.plots:
                res.plot_corner(outdir / f"rank{r}" / "corner.png")
        (outdir / "ranking.json").write_text(
            json.dumps({"order": order, "scores": scores}))
        return results

    res = infer(engine, data=prepared, rank=args.rank,
                n_samples=args.n_samples, seed=args.seed)
    if args.importance:
        import jax.numpy as jnp
        from posteriflow_tpu.inference import (
            importance_correct, make_marginalized_log_likelihood)
        ctx = engine.encode(jnp.asarray(prepared.strain)[None],
                            jnp.asarray(prepared.asd_bands)[None])
        is_res = importance_correct(
            engine, ctx[0], args.rank, res.samples, res.log_prob,
            res.railed, make_marginalized_log_likelihood(prepared.strain),
            marginalized=True)
        log.info("IS: ESS %.1f / %d (efficiency %.3f, stages %d)",
                 is_res.ess, len(is_res.samples), is_res.efficiency,
                 is_res.n_stages)
        res.weights = is_res.weights
        res.samples = is_res.samples
        res.log_prob = None
        res.railed = None
        res.diagnostics["importance"] = {
            "ess": is_res.ess, "efficiency": is_res.efficiency,
            "n_stages": is_res.n_stages}
    print(res.summary())
    res.save(outdir)
    if args.plots:
        res.plot_corner(outdir / "corner.png")
        res.plot_marginals(outdir / "marginals.png")
    log.info("saved -> %s", outdir)
    return res


if __name__ == "__main__":
    main()
