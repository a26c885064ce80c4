#!/usr/bin/env python3
"""NPE vs nested sampling on catalog-like events: identical data, priors,
conventions; per-parameter KL/Wasserstein/offset/width + wall times.

Reference analog: scripts/benchmark_real_events.py (NPE vs bilby/dynesty on
6 GWTC events; reference numbers: NPE 12.1 s vs dynesty 405.8 s on
GW150914). Zero-egress environments run the same battery on catalog-
parameter INJECTIONS (same masses/distances as the real events, known
truth); with gwpy present, --fetch uses real strain.

Usage:
  python scripts/benchmark_real_events.py --ckpt model/run/ckpt \
      [--events GW150914 GW170814] [--out results/real_event_benchmark]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--name", default="best")
    ap.add_argument("--events", nargs="+",
                    default=["GW150914", "GW170104", "GW170814"])
    ap.add_argument("--n-samples", type=int, default=2000)
    ap.add_argument("--nlive", type=int, default=200)
    ap.add_argument("--maxiter", type=int, default=3000)
    ap.add_argument("--fetch", action="store_true",
                    help="fetch real strain via gwpy instead of injecting")
    ap.add_argument("--out", default="results/real_event_benchmark")
    args = ap.parse_args(argv)

    from posteriflow_tpu.utils.logging import setup_logging
    log = setup_logging()

    from posteriflow_tpu.data.gwtc import GWTCLoader
    from posteriflow_tpu.inference import (load_model, prepare_real,
                                           prepare_simulated)
    from posteriflow_tpu.inference.dynesty_bridge import run_comparison

    engine = load_model(args.ckpt, args.name)
    gl = GWTCLoader()
    outdir = Path(args.out)
    outdir.mkdir(parents=True, exist_ok=True)

    summary = {}
    for name in args.events:
        ev = gl.get_event(name)
        if args.fetch:                                  # pragma: no cover
            from posteriflow_tpu.inference import fetch_gwosc
            strain, gps = fetch_gwosc(event=name)
            prep = prepare_real(strain, gps_time=gps,
                                psd_bands=engine.cfg.npe.psd_bands)
        else:
            inj = dict(mass_1=ev["mass_1"], mass_2=ev["mass_2"],
                       luminosity_distance=min(ev["luminosity_distance"],
                                               2100.0),
                       ra=1.5, dec=-0.3, theta_jn=0.6, psi=0.4, phase=1.2,
                       geocent_time=0.0, a1=0.0, a2=0.0)
            prep = prepare_simulated([inj], seed=hash(name) % 2 ** 16,
                                     psd_bands=engine.cfg.npe.psd_bands)
        cmp_out = run_comparison(engine, prep, n_samples=args.n_samples,
                                 nlive=args.nlive, maxiter=args.maxiter)
        rec = {
            "event": name,
            "t_npe_s": cmp_out["t_npe_s"],
            "t_nested_s": cmp_out["t_nested_s"],
            "speedup": cmp_out["speedup"],
            "nested_sampler": cmp_out["nested"]["sampler"],
            "verdict": cmp_out["npe"].verdict,
            "comparison": {k: v for k, v in cmp_out["comparison"].items()
                           if k in ("mass_1", "mass_2",
                                    "luminosity_distance",
                                    "geocent_time")},
        }
        summary[name] = rec
        cmp_out["npe"].save(outdir / name)
        log.info("%s: NPE %.2fs vs %s %.1fs (%.0fx)", name,
                 rec["t_npe_s"], rec["nested_sampler"], rec["t_nested_s"],
                 rec["speedup"])

    (outdir / "summary.json").write_text(json.dumps(summary, indent=2,
                                                    default=float))
    return summary


if __name__ == "__main__":
    main()
