#!/usr/bin/env python3
"""Post-hoc affine calibration fit for PriorityNet scores.

Reference analog: scripts/calibrate_priority_net.py (fit OutputCalibrator
on held-out scenarios; reference core/output_calibrator.py modes).

Usage:
  python scripts/calibrate_priority_net.py --params model/priority/priority_params.msgpack
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--params", required=True,
                    help="priority_params.msgpack from fit_priority")
    ap.add_argument("--d-model", type=int, default=64)
    ap.add_argument("--n-batches", type=int, default=10)
    ap.add_argument("--mode", default="learned",
                    choices=("learned", "minmax", "percentile"))
    ap.add_argument("--seed", type=int, default=99)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from posteriflow_tpu.utils.logging import setup_logging
    log = setup_logging()

    import jax
    import numpy as np
    from posteriflow_tpu.core.calibrator import OutputCalibrator
    from posteriflow_tpu.train.train_priority import (PriorityTrainConfig,
                                                      load_priority_net,
                                                      make_priority_batch)

    net, params = load_priority_net(args.params, d_model=args.d_model)
    cfg = PriorityTrainConfig(d_model=args.d_model)

    scores_all, targets_all = [], []
    for i in range(args.n_batches):
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
        segs, cand, mask, targets, _snr, snr_est = make_priority_batch(
            key, cfg)
        scores, _ = net.apply(params, segs, cand, mask, snr_est=snr_est)
        m = np.asarray(mask) > 0
        scores_all.append(np.asarray(scores)[m])
        targets_all.append(np.asarray(targets)[m])
    s = np.concatenate(scores_all)
    t = np.concatenate(targets_all)

    cal = OutputCalibrator().fit(s, t, mode=args.mode)
    resid_before = float(np.abs(s - t).mean())
    resid_after = float(np.abs(cal(s) - t).mean())
    report = {"gain": cal.gain, "bias": cal.bias, "mode": cal.mode,
              "mae_before": resid_before, "mae_after": resid_after,
              "n_pairs": int(len(s))}
    log.info("affine fit: g=%.3f b=%.3f | MAE %.3f -> %.3f", cal.gain,
             cal.bias, resid_before, resid_after)
    out = Path(args.out or (Path(args.params).parent / "calibration.json"))
    out.write_text(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
