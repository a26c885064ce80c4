#!/usr/bin/env python3
"""Bisect the S-dependent phantom in simulate_batch (sim_profile6: full=49ms
vs two-pass wave 18ms + ifft 4ms + S=1 assembly ~3.5ms).

Variants of the FULL program, each with one subsystem stubbed:
  full        production simulate_batch
  no_gate     _gate_from_snr bypassed (no sort/argsort/scatter)
  no_noise    add_noise=False, det_dropout=0 (no noise/fill RNG)
  no_snrpass  SNR pass replaced by loudness proxy (waveforms run ONCE)
  s3          max_signals=3 (linearity check)
  no_barrier  optimization_barrier removed (monkeypatch-free: measured via
              env in simulator if needed; here we re-time full only)

Writes reports/sim_bisect.json.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-train")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from posteriflow_tpu.physics import simulator as S
from posteriflow_tpu.physics.constants import N_DETECTORS
from posteriflow_tpu.physics.psd import default_network_asd
from posteriflow_tpu.prior import PriorConfig, sample_batch

B = 256
ITERS = 30
key = jax.random.PRNGKey(0)
asd = default_network_asd()


def timed(fn):
    out = fn(key)
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(ITERS):
        out = fn(jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    return round((time.time() - t0) / ITERS * 1e3, 2)


def run_variant(cfg, gate=True, snrpass=True, barrier=True):
    def prog(k):
        k_prior, k_sim = jax.random.split(k)
        params, n_sig = sample_batch(k_prior, B, cfg.prior)
        keys = jax.random.split(k_sim, B)
        b, s, p = params.shape
        flat = params.reshape(b * s, p)

        def _wave(q):
            return S.signal_white_fd(q, asd, cfg.f_lower)

        if snrpass:
            snr = jax.vmap(lambda q: jnp.sqrt(jnp.sum(jnp.abs(_wave(q))
                                                      ** 2)))(
                flat).reshape(b, s)
        else:
            from posteriflow_tpu.prior import loudness
            snr = jax.vmap(lambda pp: loudness(pp[:, 0], pp[:, 1],
                                               pp[:, 2]))(params)
        if gate:
            params_r, keep_orig, snr_r, n_valid = jax.vmap(
                lambda pp, sn, n: S._gate_from_snr(pp, sn, n,
                                                   cfg.min_snr))(
                params, snr, n_sig)
        else:
            params_r = params
            keep_orig = (jnp.arange(s)[None, :] < n_sig[:, None]
                         ).astype(jnp.float32)
            snr_r = snr
            n_valid = n_sig
        h_w = jax.vmap(_wave)(flat).reshape(b, s, N_DETECTORS, -1)
        sig_fd = jnp.sum(keep_orig[:, :, None, None] * h_w, axis=1)
        if barrier:
            sig_fd = jax.lax.optimization_barrier(sig_fd)
        pre = (params_r, sig_fd, snr_r, n_valid)
        out = jax.vmap(lambda kk, pr: S.simulate_event(
            kk, None, None, asd, cfg, None, None, pr))(keys, pre)
        return jnp.sum(out.strain)
    return jax.jit(prog)


cfg = S.SimConfig(det_dropout=0.1, real_noise_prob=0.0)
cfg_nonoise = S.SimConfig(det_dropout=0.0, real_noise_prob=0.0,
                          add_noise=False)
cfg_s3 = S.SimConfig(det_dropout=0.1, real_noise_prob=0.0,
                     prior=PriorConfig(max_signals=3))

report = {"backend": jax.default_backend(), "batch": B, "ms": {}}
for name, fn in [
    ("full", run_variant(cfg)),
    ("no_gate", run_variant(cfg, gate=False)),
    ("no_noise", run_variant(cfg_nonoise)),
    ("no_snrpass", run_variant(cfg, snrpass=False)),
    ("no_barrier", run_variant(cfg, barrier=False)),
    ("s3", run_variant(cfg_s3)),
]:
    report["ms"][name] = timed(fn)
    print(name, report["ms"][name], flush=True)

Path("reports/sim_bisect.json").write_text(json.dumps(report, indent=2))
print(json.dumps(report))
