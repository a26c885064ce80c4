#!/usr/bin/env python3
"""Physics validation suite as a standalone CLI gate -> JSON + exit code.

Reference analog: scripts/validate_pipeline_physics.py (7 checks: unit-
variance whitening, inter-detector noise decorrelation, 1/d_L amplitude,
geometric time delays, antenna patterns, prior distributions pre/post SNR
cut). The same contracts run as tests/test_physics.py in CI; this CLI
re-runs them against the LIVE backend (pass --tpu to validate the physics
kernel on hardware, not just XLA:CPU).
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default (TPU) backend")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    import jax
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from posteriflow_tpu.physics import constants as C
    from posteriflow_tpu.physics.detectors import (VERTICES,
                                                   antenna_pattern,
                                                   time_delay_from_geocenter)
    from posteriflow_tpu.physics.psd import aligo_psd, asd_from_psd
    from posteriflow_tpu.physics.simulator import SimConfig, simulate_batch
    from posteriflow_tpu.physics.waveforms.taylorf2 import \
        taylorf2_polarizations
    from posteriflow_tpu.physics.whiten import (colored_noise_td,
                                                matched_filter_snr_fd,
                                                whiten_td)
    from posteriflow_tpu.prior import sample_batch

    FREQS = jnp.asarray(C.FREQS, dtype=jnp.float32)
    ASD = asd_from_psd(aligo_psd(C.FREQS))
    checks = []

    def check(name, ok, detail):
        checks.append({"check": name, "passed": bool(ok),
                       "detail": detail})

    # 1. unit-variance whitening
    noise = jax.jit(jax.vmap(lambda k: colored_noise_td(k, ASD)))(
        jax.random.split(jax.random.PRNGKey(0), 8))
    std = float(jnp.std(whiten_td(noise, ASD)))
    check("unit_variance_whitening", 0.9 < std < 1.1, {"std": std})

    # 2. inter-detector noise decorrelation
    batch = jax.jit(lambda k: simulate_batch(
        k, 16, SimConfig(prior=__import__(
            "posteriflow_tpu.prior", fromlist=["PriorConfig"]
        ).PriorConfig(noise_fraction=1.0))))(jax.random.PRNGKey(1))
    s = np.asarray(batch.strain)
    cors = [abs(np.corrcoef(s[i, a], s[i, b])[0, 1])
            for i in range(16) for a, b in ((0, 1), (0, 2), (1, 2))]
    check("noise_decorrelation", max(cors) < 0.1, {"max_corr": max(cors)})

    # 3. 1/d_L amplitude scaling
    @jax.jit
    def snr_at(d):
        hp, _ = taylorf2_polarizations(FREQS, 1.4, 1.4, 0., 0., d, 0., 0.)
        return matched_filter_snr_fd(hp, ASD)
    ratio = float(snr_at(100.0) / snr_at(400.0))
    check("inverse_distance_amplitude", abs(ratio - 4.0) < 0.01,
          {"snr_ratio_100_400": ratio})

    # 4. geometric time delays
    ra = jnp.linspace(0, 2 * np.pi, 24)
    dec = jnp.linspace(-1.4, 1.4, 12)
    rr, dd = jnp.meshgrid(ra, dec)
    d_h = time_delay_from_geocenter(0, rr, dd, jnp.zeros_like(rr))
    d_l = time_delay_from_geocenter(1, rr, dd, jnp.zeros_like(rr))
    base_hl = float(np.linalg.norm(VERTICES[0] - VERTICES[1]) / C.C_SI)
    max_dt = float(jnp.max(jnp.abs(d_h - d_l)))
    check("geometric_time_delays",
          max_dt <= base_hl + 1e-5 and max_dt >= 0.8 * base_hl,
          {"max_H1L1_delay_ms": max_dt * 1e3,
           "baseline_ms": base_hl * 1e3})

    # 5. antenna patterns
    k = jax.random.PRNGKey(2)
    raa = jax.random.uniform(k, (5000,), maxval=2 * np.pi)
    dec2 = jnp.arcsin(jax.random.uniform(jax.random.PRNGKey(3), (5000,),
                                         minval=-1, maxval=1))
    psi = jax.random.uniform(jax.random.PRNGKey(4), (5000,), maxval=np.pi)
    fp, fc = antenna_pattern(0, raa, dec2, psi, jnp.zeros(5000))
    mfp = float(jnp.mean(fp ** 2))
    check("antenna_pattern_mean", abs(mfp - 0.2) < 0.02,
          {"mean_Fplus_sq": mfp})

    # 6+7. prior distributions pre/post SNR cut
    params, n_sig = jax.jit(lambda k: sample_batch(k, 4096))(
        jax.random.PRNGKey(5))
    p = np.asarray(params).reshape(-1, 11)
    check("prior_mass_ordering", bool((p[:, 0] >= p[:, 1] - 1e-5).all()),
          {})
    gated = jax.jit(lambda k: simulate_batch(k, 64, SimConfig()))(
        jax.random.PRNGKey(6))
    snrs = np.asarray(gated.sig_snr)
    live = snrs[np.asarray(
        (jnp.arange(snrs.shape[1])[None] < gated.n_sig[:, None]))]
    check("snr_gate", bool((live >= 8.0 - 1e-4).all()),
          {"min_live_snr": float(live.min()) if live.size else None})

    # 8. PhenomD inspiral-phase consistency with TaylorF2 (VERDICT item 3)
    from posteriflow_tpu.physics.waveforms import phenomd_amp_phase
    from posteriflow_tpu.physics.waveforms.taylorf2 import taylorf2_amp_phase
    band = jnp.arange(80, 200, dtype=jnp.float32) * 0.25      # 20–50 Hz
    wf_args = (36.0, 29.0, 0.3, -0.1, 400.0, 0.0)
    amp_d, psi_d = jax.jit(lambda: phenomd_amp_phase(band, *wf_args))()
    amp_t, psi_t = taylorf2_amp_phase(band, *wf_args)
    dpsi = float(jnp.max(jnp.abs(psi_d - psi_t)))
    ratio_lo = float(jnp.min(amp_d / amp_t))
    check("phenomd_inspiral_consistency",
          dpsi < 5.0 and 0.7 < ratio_lo,
          {"max_phase_diff_rad": dpsi, "min_amp_ratio": ratio_lo})

    # 9. PhenomD amplitude peak sits below (and near) the ringdown
    from posteriflow_tpu.physics.waveforms.phenomd import _ring_damp_geo
    full = jnp.arange(1, 8193, dtype=jnp.float32) * 0.25
    amp_f, _ = jax.jit(lambda: phenomd_amp_phase(full, *wf_args))()
    eff = np.asarray(amp_f) * np.asarray(full) ** (7.0 / 6.0)
    msec = (wf_args[0] + wf_args[1]) * C.MTSUN_SI
    eta = wf_args[0] * wf_args[1] / (wf_args[0] + wf_args[1]) ** 2
    f_rd_hz = float(_ring_damp_geo(eta, wf_args[2], wf_args[3])[0]) / msec
    f_pk = float(full[int(np.argmax(eff))])
    check("phenomd_amplitude_peak",
          0.5 * f_rd_hz < f_pk < 1.05 * f_rd_hz,
          {"f_peak_hz": f_pk, "f_ringdown_hz": f_rd_hz})

    all_pass = all(c["passed"] for c in checks)
    report = {"passed": all_pass, "backend": jax.default_backend(),
              "checks": checks}
    print(json.dumps(report, indent=2))
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=2))
    return 0 if all_pass else 1


if __name__ == "__main__":
    sys.exit(main())
