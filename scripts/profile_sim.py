#!/usr/bin/env python3
"""Attribute simulate_batch time: waveform vs FFT vs assembly.

Follow-up to profile_train.py (sim = 52% of the train step): times
variants of the simulation program on the live backend:

  full        simulate_batch as in production
  wave_only   vmapped signal_white_fd over B*S prior draws (no assembly)
  amp_phase   PhenomD amp+phase only, no projection/whitening (B*S draws)
  ifft_only   fd_white_to_td on precomputed [B,3,F] spectra
  assembly    simulate_batch with signal_white_fd stubbed to a constant
              (noise + sort/gate/dropout machinery only)

Writes reports/sim_profile.json. Usage:
  python scripts/profile_sim.py [--batch 256] [--iters 30] [--cpu]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--prng", default="threefry2x32",
                    choices=["rbg", "threefry2x32"])
    ap.add_argument("--out", default="reports/sim_profile.json")
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

    import jax.numpy as jnp
    from posteriflow_tpu.physics.constants import FREQS, N_SAMPLES
    from posteriflow_tpu.physics.psd import default_network_asd
    from posteriflow_tpu.physics.simulator import (SimConfig, signal_white_fd,
                                                   simulate_batch)
    from posteriflow_tpu.physics.waveforms import phenomd_amp_phase
    from posteriflow_tpu.physics.whiten import fd_white_to_td
    from posteriflow_tpu.prior import PriorConfig, sample_batch
    from posteriflow_tpu.utils.logging import setup_logging

    log = setup_logging()
    b = args.batch
    cfg = SimConfig(det_dropout=0.1, real_noise_prob=0.0)
    s = cfg.max_signals
    asd = default_network_asd()
    freqs = jnp.asarray(FREQS, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)

    def flat_params(k):
        p, _ = sample_batch(k, b * s // s, PriorConfig())   # [b, s, P]
        return p.reshape(b * s, -1)

    progs = {}
    progs["full"] = jax.jit(
        lambda k: jnp.sum(simulate_batch(k, b, cfg).strain))

    # slot-count scaling: S=1 vs S=5 separates per-waveform cost from
    # fixed assembly overhead (noise RNG, FFT, masks)
    cfg_s1 = SimConfig(det_dropout=0.1, real_noise_prob=0.0,
                       prior=PriorConfig(max_signals=1,
                                         overlap_fraction=0.0))
    progs["full_s1"] = jax.jit(
        lambda k: jnp.sum(simulate_batch(k, b, cfg_s1).strain))

    def wave_only(k):
        p = flat_params(k)
        h = jax.vmap(lambda q: signal_white_fd(q, asd))(p)
        return jnp.sum(jnp.abs(h) ** 2)
    progs["wave_only"] = jax.jit(wave_only)

    def wave_sum(k):
        # consumer = per-event slot sum (the full-program pattern): does
        # materializing [B,S,3,F] explain the full-vs-wave_only gap?
        p = flat_params(k)
        h = jax.vmap(lambda q: signal_white_fd(q, asd))(p)
        w = jnp.arange(b * s, dtype=jnp.float32) % 2.0
        sig = jnp.einsum("e,edf->df", w, h.reshape(b, s, 3, -1)
                         .reshape(b * s, 3, -1))
        sig = jnp.einsum("es,esdf->edf",
                         w.reshape(b, s), h.reshape(b, s, 3, -1))
        return jnp.sum(jnp.abs(sig) ** 2)
    progs["wave_sum"] = jax.jit(wave_sum)

    def wave_twopass(k):
        # candidate fix: pass 1 = fused SNR reduction per flat signal;
        # pass 2 = slot-weighted sum einsum whose producer recomputes the
        # waveform inline (output only [B,3,F], never [B,S,3,F])
        p = flat_params(k)

        def one(q):
            return signal_white_fd(q, asd)
        snr2 = jax.vmap(lambda q: jnp.sum(jnp.abs(one(q)) ** 2))(p)
        w = (snr2 > 64.0).astype(jnp.float32).reshape(b, s)
        h = jax.vmap(one)(p).reshape(b, s, 3, -1)
        sig = jnp.einsum("es,esdf->edf", w, h)
        return jnp.sum(jnp.abs(sig) ** 2)
    progs["wave_twopass"] = jax.jit(wave_twopass)

    def amp_phase(k):
        p = flat_params(k)

        def one(q):
            a, psi = phenomd_amp_phase(freqs, q[0], q[1], q[9], q[10],
                                       q[2], q[7])
            return jnp.sum(a * jnp.cos(psi))
        return jnp.sum(jax.vmap(one)(p))
    progs["amp_phase"] = jax.jit(amp_phase)

    def ifft_only(k):
        x = jax.random.normal(k, (b, 3, FREQS.shape[0], 2))
        h = (x[..., 0] + 1j * x[..., 1]).astype(jnp.complex64)
        return jnp.sum(fd_white_to_td(h, N_SAMPLES) ** 2)
    progs["ifft_only"] = jax.jit(ifft_only)

    report = {"backend": jax.default_backend(), "batch": b,
              "iters": args.iters, "ms": {}}
    for name, fn in progs.items():
        out = fn(key)
        jax.block_until_ready(out)
        t0 = time.time()
        for i in range(args.iters):
            out = fn(jax.random.fold_in(key, i))
        jax.block_until_ready(out)
        ms = (time.time() - t0) / args.iters * 1e3
        report["ms"][name] = round(ms, 2)
        log.info("%s: %.2f ms", name, ms)

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
