#!/usr/bin/env python3
"""Results-analysis walkthrough (reference analog: notebooks/03): load a
checkpoint, infer on a known injection, and produce the full result-object
tour — summaries, corner, marginals, reconstruction overlay, OOD verdict,
refinement gate, prior reweighting, importance correction.

Run: python examples/analyze_results.py --ckpt model/npe_r1/ckpt \
         [--out /tmp/results_tour]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--name", default="best")
    ap.add_argument("--n-samples", type=int, default=2000)
    ap.add_argument("--importance", action="store_true")
    ap.add_argument("--out", default="/tmp/results_tour")
    args = ap.parse_args(argv)

    import numpy as np
    from posteriflow_tpu import PARAM_NAMES
    from posteriflow_tpu.inference import (infer, load_model,
                                           prepare_simulated)
    from posteriflow_tpu.inference.plots import reconstruction_overlay

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    engine = load_model(args.ckpt, args.name)

    inj = dict(mass_1=36.0, mass_2=29.0, luminosity_distance=400.0,
               ra=1.0, dec=-0.5, theta_jn=0.5, psi=0.3, phase=1.0,
               geocent_time=0.2, a1=0.1, a2=0.05)
    prep = prepare_simulated([inj], seed=0,
                             psd_bands=engine.cfg.npe.psd_bands)
    res = infer(engine, data=prep, n_samples=args.n_samples, seed=0)

    print(res.summary())
    truth = np.array([inj[k] for k in PARAM_NAMES])
    med = res.median()
    print("\nper-parameter |median - truth|:")
    for j, n in enumerate(PARAM_NAMES):
        print(f"  {n:>20s}: {abs(med[j] - truth[j]):10.4f} "
              f"(truth {truth[j]:.3f})")

    res.plot_corner(out / "corner.png")
    res.plot_marginals(out / "marginals.png")
    reconstruction_overlay(prep.strain, res.samples, out / "recon.png")
    res.save(out / "result")

    rw, ess = res.reweight_to_uniform_masses()
    print(f"\nuniform-mass reweighting ESS: {ess:.1f} / {len(res.samples)}")

    if args.importance:
        import jax.numpy as jnp
        from posteriflow_tpu.inference import (importance_correct,
                                               make_log_likelihood)
        ctx = engine.encode(jnp.asarray(prep.strain)[None],
                            jnp.asarray(prep.asd_bands)[None])
        is_res = importance_correct(engine, ctx[0], 0, res.samples,
                                    res.log_prob, res.railed,
                                    make_log_likelihood(prep.strain))
        print(f"importance: ESS {is_res.ess:.1f}, efficiency "
              f"{is_res.efficiency:.3f}, stages {is_res.n_stages}")
    print(f"\nartifacts -> {out}")
    return res


if __name__ == "__main__":
    main()
