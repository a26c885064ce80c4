#!/usr/bin/env python3
"""Offline dataset generation: jitted simulator -> HDF5 component storage.

Reference analog: src/ahsd/data/scripts/generate_dataset.py +
GWDatasetGenerator (~2 h for 50k events on a laptop, README.md:205). On
TPU the same 50k events take O(minute): generation is the training
simulator batched under jit. Offline datasets exist for frozen evaluation
sets and cross-framework comparison — training itself synthesizes on the
fly.

Usage:
  python scripts/generate_dataset.py --out data/val.h5 --n 5000
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--overlap-fraction", type=float, default=0.45)
    ap.add_argument("--min-snr", type=float, default=8.0)
    ap.add_argument("--max-signals", type=int, default=5)
    ap.add_argument("--components", action="store_true",
                    help="also store per-signal whitened components "
                         "(reference v2 component storage)")
    args = ap.parse_args(argv)

    from posteriflow_tpu.utils.logging import setup_logging
    log = setup_logging()

    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from posteriflow_tpu.data.io import DatasetWriter, MetadataManager
    from posteriflow_tpu.physics.simulator import (SimConfig, simulate_batch,
                                                   signal_white_fd)
    from posteriflow_tpu.physics.psd import default_network_asd
    from posteriflow_tpu.physics.whiten import fd_white_to_td
    from posteriflow_tpu.prior import PriorConfig

    cfg = SimConfig(prior=PriorConfig(max_signals=args.max_signals,
                                      overlap_fraction=args.overlap_fraction),
                    min_snr=args.min_snr)
    sim = jax.jit(lambda k: simulate_batch(k, args.batch, cfg))
    asd = default_network_asd()

    @jax.jit
    def components(params, n_sig):   # [B, S, 11] -> [B, S, 3, T] f16
        s = params.shape[1]
        # dead slots are zero-filled -> masses of 0 make NaN waveforms;
        # compute with safe placeholders and mask the result
        safe = jnp.where(params[..., :1] > 0.5, params,
                         jnp.asarray([30., 25., 500., 0., 0., 0., 0., 0.,
                                      0., 0., 0.]))

        def one(p):
            return fd_white_to_td(signal_white_fd(p, asd))

        comp = jax.vmap(jax.vmap(one))(safe)
        live = (jnp.arange(s)[None, :] < n_sig[:, None])
        return (comp * live[..., None, None]).astype(jnp.float16)

    t0 = time.time()
    stats = {"n_signals_dist": {}, "snr_sum": 0.0, "generated": 0}
    with DatasetWriter(args.out, config=dataclasses.asdict(cfg)) as w:
        done = 0
        i = 0
        while done < args.n:
            key = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
            b = sim(key)
            take = min(args.batch, args.n - done)
            rec = {
                "strain": np.asarray(b.strain[:take], dtype=np.float16),
                "params": np.asarray(b.params[:take]),
                "n_sig": np.asarray(b.n_sig[:take], dtype=np.int32),
                "net_snr": np.asarray(b.net_snr[:take]),
                "sig_snr": np.asarray(b.sig_snr[:take]),
                "asd_bands": np.asarray(b.asd_bands[:take]),
            }
            if args.components:
                comp = components(b.params[:take], b.n_sig[:take])
                rec["signals"] = np.asarray(comp)
                rec["noise"] = rec["strain"] - np.asarray(
                    comp.sum(axis=1), dtype=np.float16)
            w.append_batch(rec)
            for n in np.asarray(b.n_sig[:take]).tolist():
                stats["n_signals_dist"][str(n)] = \
                    stats["n_signals_dist"].get(str(n), 0) + 1
            stats["snr_sum"] += float(np.sum(np.asarray(b.net_snr[:take])))
            done += take
            i += 1
            if i % 10 == 0:
                log.info("%d / %d events (%.0f ev/s)", done, args.n,
                         done / (time.time() - t0))

    dt = time.time() - t0
    stats.update(generated=done, seconds=round(dt, 1),
                 events_per_second=round(done / dt, 1),
                 mean_net_snr=stats.pop("snr_sum") / max(done, 1))
    MetadataManager(args.out).write(stats)
    log.info("wrote %d events -> %s in %.1fs (%.0f ev/s)", done, args.out,
             dt, done / dt)
    print(json.dumps(stats, indent=2))
    return stats


if __name__ == "__main__":
    main()
