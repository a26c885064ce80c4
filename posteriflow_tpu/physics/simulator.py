"""On-device training-data synthesis: priors → waveforms → whitened strain.

This module IS the TPU-native replacement for the reference's entire
generation + remix machinery (src/ahsd/data/dataset_generator.py,
experiments/remix_data.py): because every stage — prior sampling, FD
waveform, detector projection, whitening, noise — is jittable JAX, a fresh,
never-repeated batch is synthesized INSIDE the training step. The remix
augmentations (noise swap, distance rescale with exact relabel, time shift)
are subsumed: every example already has fresh noise and freshly drawn
distance/time. The remaining reference semantics are kept explicitly:

  - per-signal SNR is MEASURED, never targeted; signals below min_snr are
    dropped and ranks re-compacted (dataset_generator.py:357-360);
  - signals are rank-ordered by the loudness proxy Mc^(5/6)/d_L
    (remix_data.py:97-105, 289);
  - detector dropout replaces a detector with unit white noise — the same
    fill inference uses for missing detectors (remix_data.py:261-278);
  - network SNR = L2 norm of the summed whitened signal over kept detectors
    (remix_data.py:280-286);
  - design-whitened events carry asd_bands = 0 (remix_data.py:301-311).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from posteriflow_tpu.physics.constants import (DELTA_F, DURATION, F_LOWER,
                                               FREQS, N_DETECTORS,
                                               N_SAMPLES)
from posteriflow_tpu.physics.projection import (GMST_REF, OMEGA_EARTH,
                                                network_response,
                                                project_to_network)
from posteriflow_tpu.physics.psd import default_network_asd
from posteriflow_tpu.physics.waveforms import imr_polarizations
from posteriflow_tpu.physics.whiten import fd_white_to_td, whiten_fd
from posteriflow_tpu.prior import PriorConfig, loudness, sample_batch

_FREQS = jnp.asarray(FREQS, dtype=jnp.float32)
# concrete copy for code that must slice the grid at TRACE time (the
# chirp-adapted twist grid is built from concrete frequencies; slicing the
# jax constant inside jit would yield a tracer)
_FREQS_NP = np.asarray(FREQS, dtype=np.float32)

# Non-empty proper subsets of (H1, L1, V1) kept under detector dropout
# (reference: remix_data.py:154)
_KEEP_CONFIGS = jnp.asarray([
    [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, 0, 1], [0, 1, 1],
], dtype=jnp.float32)


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static simulation configuration (hashable jit arg)."""
    prior: PriorConfig = PriorConfig()
    min_snr: float = 8.0
    det_dropout: float = 0.0
    psd_bands: int = 16
    f_lower: float = F_LOWER
    add_noise: bool = True
    # probability an event uses a real-noise crop (needs a NoiseBank passed
    # to simulate_batch; reference: remix_data.py real_noise_prob)
    real_noise_prob: float = 0.0
    # burst-glitch augmentation: per-event probability of injecting 1..3
    # sine-Gaussian bursts into one detector's noise (reference
    # add_glitches: bilby_pipeline.py:328-348)
    glitch_prob: float = 0.0

    @property
    def max_signals(self) -> int:
        return self.prior.max_signals


class EventBatch(NamedTuple):
    """One training batch, all leading dims = B."""
    strain: jax.Array       # [B, n_det, T] whitened strain (noise + signals)
    params: jax.Array       # [B, S, N_PARAMS] physical, rank-ordered
    n_sig: jax.Array        # [B] int32, signals surviving the SNR gate
    net_snr: jax.Array      # [B] network SNR of the summed injection
    sig_snr: jax.Array      # [B, S] per-signal network SNR (rank order)
    asd_bands: jax.Array    # [B, n_det, K] sensitivity summary (0 = design)
    det_mask: jax.Array     # [B, n_det] 1 = detector present


def signal_white_fd(params: jax.Array, asd: jax.Array,
                    f_lower: float = F_LOWER) -> jax.Array:
    """One signal's whitened per-detector FD strain [n_det, N_RFFT] complex.

    params: [N_PARAMS] physical (PARAM_NAMES order) for the aligned-spin
    set, or [N_PARAMS_PRECESSING] (PARAM_NAMES_PRECESSING) for the full
    15-D precessing set (dispatched on the STATIC trailing dim, so each
    config compiles exactly one kernel). In the whitened-FD normalization,
    per-detector optimal SNR is the plain L2 norm over bins.
    """
    if params.shape[-1] >= 15:
        return _signal_white_fd_prec(params, asd, f_lower)
    (m1, m2, d, ra, dec, theta_jn, psi_pol, phase, t_off, a1, a2) = params
    from posteriflow_tpu.physics.waveforms.tidal import \
        phenomd_matter_amp_phase
    amp, psi = phenomd_matter_amp_phase(_FREQS, m1, m2, a1, a2, d, phase,
                                        f_lower)
    # Fused polarization-mix + time-shift + whiten (exact identity):
    # with h₊ = A·½(1+c²)e^{-iΨ}, hₓ = A·c·ie^{-iΨ} and per-detector
    # response (F₊ᵈw₊ + iFₓᵈwₓ) = W_d e^{iφ_d},
    #   h_d(f) = A(f)·W_d·e^{-i(Ψ + 2πfτ_d − φ_d)} / ASD_d · √(4Δf)
    # — ONE sincos per (det, bin) instead of e^{-iΨ} + per-det shift
    # sincos + complex multiplies (the sim hot loop, train_profile_r3.md).
    ci = jnp.cos(theta_jn)
    gmst = GMST_REF + OMEGA_EARTH * t_off
    f_plus, f_cross, dt = network_response(ra, dec, psi_pol, gmst)
    wp = f_plus * (0.5 * (1.0 + ci * ci))
    wc = f_cross * ci
    w = jnp.sqrt(wp * wp + wc * wc)                      # [n_det]
    phi_d = jnp.arctan2(wc, wp)
    tau = (0.5 * DURATION + t_off + dt).astype(jnp.float32)
    # mod-1 cycles before the 2π multiply: float32 phase error ≪ a radian
    # at 2 kHz (projection.py convention note)
    cycles = jnp.mod(_FREQS[None, :] * tau[:, None], 1.0)
    theta = psi[None, :] + (2.0 * jnp.pi) * cycles - phi_d[:, None]
    mag = (amp[None, :] * w[:, None] / jnp.maximum(asd, 1e-38)) \
        * float(np.sqrt(4.0 * DELTA_F))
    h = mag * jax.lax.complex(jnp.cos(theta), -jnp.sin(theta))
    return h.astype(jnp.complex64)


def _signal_white_fd_prec(params: jax.Array, asd: jax.Array,
                          f_lower: float = F_LOWER) -> jax.Array:
    """Whitened per-detector FD strain [n_det, N_RFFT] for one PRECESSING
    signal, params [15] in PARAM_NAMES_PRECESSING order.

    The aligned kernel's fused polarization-mix identity (one sincos per
    (det, bin)) relies on h₊/hₓ sharing one phase series, which the twist
    breaks; here the general complex projection runs instead:

        h_d(f) = (F₊ᵈ h̃₊ + Fₓᵈ h̃ₓ) · e^{-2πifτ_d} / ASD_d · √(4Δf)

    with (h̃₊, h̃ₓ) the PhenomP_Matter twist-up of the co-precessing
    PhenomD(+matter) content (precession.py). Spin mapping: (a1, a2,
    tilt_1, tilt_2, phi_12) → (chi_1z, chi_2z, chi_p) via
    precession.spin_components; phi_jl enters as the twist's alpha0.
    """
    from posteriflow_tpu.physics.waveforms.precession import (
        spin_components, twist_factors_decimated)
    from posteriflow_tpu.physics.waveforms.tidal import \
        phenomd_matter_amp_phase
    (m1, m2, d, ra, dec, theta_jn, psi_pol, phase, t_off, a1, a2,
     t1, t2, p12, pjl) = params
    chi_1z, chi_2z, chi_p = spin_components(a1, a2, t1, t2, p12, m1, m2)
    amp, psi = phenomd_matter_amp_phase(_FREQS, m1, m2, chi_1z, chi_2z,
                                        d, phase, f_lower)
    # the twist is the SLOW envelope (precession rate ≪ carrier rate):
    # evaluate it decimated + linearly interpolated, and fold the carrier
    # e^{-iΨ} into the per-detector shift sincos — ONE sincos per
    # (det, bin) + one complex multiply, the aligned kernel's discipline
    # (VERDICT r4 weak-#1: the full-resolution twist + general complex
    # projection halved 15-D training MFU)
    sp, sm = twist_factors_decimated(_FREQS, m1, m2, chi_1z, chi_2z,
                                     chi_p, theta_jn, f_lower,
                                     alpha0=pjl, decimate=8)
    gmst = GMST_REF + OMEGA_EARTH * t_off
    f_plus, f_cross, dt = network_response(ra, dec, psi_pol, gmst)
    c_d = (f_plus[:, None] * (0.5 * (sp + sm))[None, :]
           + 1j * f_cross[:, None] * (0.5 * (sp - sm))[None, :])
    tau = (0.5 * DURATION + t_off + dt).astype(jnp.float32)
    cycles = jnp.mod(_FREQS[None, :] * tau[:, None], 1.0)
    theta = psi[None, :] + (2.0 * jnp.pi) * cycles
    mag = (0.5 * amp[None, :] / jnp.maximum(asd, 1e-38)) \
        * float(np.sqrt(4.0 * DELTA_F))
    h = mag * jax.lax.complex(jnp.cos(theta), -jnp.sin(theta)) * c_d
    return h.astype(jnp.complex64)


def _signal_snr_prec(params: jax.Array, asd: jax.Array,
                     f_lower: float = F_LOWER,
                     decimate: int = 1) -> jax.Array:
    """Network SNR of one PRECESSING signal without the phase chain.

    Same dead-code trick as the aligned path: the coalescence phase Ψ and
    all time shifts drop out of |h_d(f)|, but the twist does NOT — the
    modulus needs the (phase-free, cumsum-cheap) twist sums:

        |h_d(f)| = (A/2)·|F₊ᵈ·(SP+SM)/2 + i·Fₓᵈ·(SP−SM)/2|

    (the common e^{2iε} factor is unimodular and cancels in the modulus).
    XLA still dead-code-eliminates phenomd's whole per-bin phase series."""
    from posteriflow_tpu.physics.waveforms.precession import (
        spin_components, twist_factors_decimated)
    from posteriflow_tpu.physics.waveforms.tidal import \
        phenomd_matter_amp_phase
    (m1, m2, d, ra, dec, theta_jn, psi_pol, phase, t_off, a1, a2,
     t1, t2, p12, pjl) = params
    chi_1z, chi_2z, chi_p = spin_components(a1, a2, t1, t2, p12, m1, m2)
    freqs = _FREQS_NP[::decimate]
    asd_d = asd[:, ::decimate]
    amp, _psi_dead = phenomd_matter_amp_phase(freqs, m1, m2, chi_1z,
                                              chi_2z, d, phase, f_lower)
    # alpha0 = pjl is a constant rotation about J: it changes |h_d| per
    # detector (the cone's azimuth relative to each antenna), so keep it
    sp, sm = twist_factors_decimated(freqs, m1, m2, chi_1z, chi_2z,
                                     chi_p, theta_jn, f_lower,
                                     alpha0=pjl, decimate=8)
    gmst = GMST_REF + OMEGA_EARTH * t_off
    f_plus, f_cross, _dt = network_response(ra, dec, psi_pol, gmst)
    comb = (f_plus[:, None] * (0.5 * (sp + sm))[None, :]
            + 1j * f_cross[:, None] * (0.5 * (sp - sm))[None, :])
    w2 = jnp.abs(comb) ** 2                                  # [n_det, F/D]
    inv_asd2 = 1.0 / jnp.maximum(asd_d, 1e-38) ** 2
    band = jnp.sum(w2 * inv_asd2, axis=0)                    # [F/D]
    return jnp.sqrt(4.0 * DELTA_F * decimate
                    * jnp.sum((0.5 * amp) ** 2 * band))


def signal_snr_amp_only(params: jax.Array, asd: jax.Array,
                        f_lower: float = F_LOWER,
                        decimate: int = 1) -> jax.Array:
    """Network SNR of one signal WITHOUT synthesizing the waveform.

    Exact identity: with h̃₊ = A(f)·½(1+cos²ι)·e^{-iΨ} and
    h̃ₓ = A(f)·cosι·i·e^{-iΨ}, the per-detector projection is
    h_d = A e^{-iΨ}(F₊ᵈ·½(1+c²) + i Fₓᵈ·c)·e^{-2πifτ_d}, so the phase Ψ
    and every time shift drop out of |h_d(f)| = A(f)·w_d. Hence

        ρ² = 4Δf Σ_f A(f)² Σ_d w_d²/ASD_d(f)²

    needs only the amplitude chain — XLA dead-code-eliminates the whole
    per-bin phase series of phenomd_matter_amp_phase when ψ is unused,
    which is what makes the SNR gate pass of simulate_batch cheap
    (reports/sim_bisect.json no_gate vs no_barrier)."""
    if params.shape[-1] >= 15:
        return _signal_snr_prec(params, asd, f_lower, decimate)
    from posteriflow_tpu.physics.waveforms.tidal import \
        phenomd_matter_amp_phase
    (m1, m2, d, ra, dec, theta_jn, psi_pol, phase, t_off, a1, a2) = params
    # decimate>1: evaluate the (smooth, phase-free) SNR integrand on every
    # D-th bin and scale by D — a midpoint-rule quadrature of the same
    # integral (relative error <0.1% at D=4 on the PhenomD amplitude,
    # tests/test_physics.py::test_snr_decimation). Used by the
    # simulate_batch gate pass; callers needing exact SNR keep D=1.
    freqs = _FREQS[::decimate]
    asd_d = asd[:, ::decimate]
    amp, _psi_dead = phenomd_matter_amp_phase(freqs, m1, m2, a1, a2, d,
                                              phase, f_lower)
    ci = jnp.cos(theta_jn)
    gmst = GMST_REF + OMEGA_EARTH * t_off
    f_plus, f_cross, _dt = network_response(ra, dec, psi_pol, gmst)
    w2 = (f_plus * 0.5 * (1.0 + ci * ci)) ** 2 + (f_cross * ci) ** 2
    inv_asd2 = 1.0 / jnp.maximum(asd_d, 1e-38) ** 2        # [n_det, F/D]
    band = jnp.sum(w2[:, None] * inv_asd2, axis=0)         # [F/D]
    return jnp.sqrt(4.0 * DELTA_F * decimate
                    * jnp.sum(amp * amp * band))


def _gate_from_snr(params, snr_orig, n_sig, min_snr):
    """Loudness-sort, SNR-gate, and compact an event's signal slots from
    per-slot SNR alone — pure [S]-sized bookkeeping, no waveform data.

    params [S, P], snr_orig [S] (original slot order), n_sig scalar.
    Returns (params_ranked, keep_orig [S] float, snr_ranked, n_valid):
    surviving signals packed first in loudness order, dead slots
    zero-masked, and the keep mask in ORIGINAL slot order for the
    waveform-sum contraction.

    Branchless one-hot-matmul formulation: ranks come from pairwise
    comparison counts and the compaction from a keep-gated prefix count —
    no argsort/gather/scatter (the sort-based version cost ~7 ms/batch of
    pure fine-grained-op overhead on [256, 5] data; reports/
    sim_bisect.json no_gate vs no_barrier)."""
    s = params.shape[0]
    idx = jnp.arange(s)
    loud = loudness(params[:, 0], params[:, 1], params[:, 2])
    # descending-loudness rank of original slot i (index tie-break)
    gt = (loud[None, :] > loud[:, None]) | (
        (loud[None, :] == loud[:, None]) & (idx[None, :] < idx[:, None]))
    rank = jnp.sum(gt, axis=1)                       # [S] int
    # a slot is live if its rank is among the first n_sig; keep = live & SNR
    keep = (rank < n_sig) & (snr_orig >= min_snr)    # original order
    n_valid = jnp.sum(keep).astype(jnp.int32)
    # compacted position of kept slot i = kept slots with smaller rank
    pos = jnp.sum(keep[None, :] & (rank[None, :] < rank[:, None]), axis=1)
    onehot = (keep[:, None] & (pos[:, None] == idx[None, :])
              ).astype(params.dtype)                 # [S_in, S_out]
    params_r = jnp.einsum("io,ip->op", onehot, params)
    snr_r = jnp.einsum("io,i->o", onehot, snr_orig)
    return params_r, keep.astype(jnp.float32), snr_r, n_valid


def _rank_and_gate(params, h_w, n_sig, min_snr):
    """Single-event compatibility wrapper over _gate_from_snr (the batch
    path computes SNR and the masked sum in separately-FUSED passes — see
    simulate_batch's TPU note). Returns (params_ranked, sig_fd_sum,
    snr_ranked, n_valid)."""
    snr_orig = jnp.sqrt(jnp.sum(jnp.abs(h_w) ** 2, axis=(-2, -1)))  # [S]
    params, keep_orig, snr, n_valid = _gate_from_snr(params, snr_orig,
                                                     n_sig, min_snr)
    sig_fd = jnp.einsum("s,sdf->df", keep_orig, h_w)
    return params, sig_fd, snr, n_valid


def _glitch_burst(key: jax.Array, prob: float,
                  max_glitches: int = 3) -> jax.Array:
    """[n_det, T] additive sine-Gaussian bursts in ONE random detector with
    probability `prob` (whitened units; reference amplitudes 2–8σ,
    widths 20–200 samples: bilby_pipeline.py:328-348)."""
    k_u, k_det, k_n, k_c, k_w, k_a = jax.random.split(key, 6)
    fire = jax.random.uniform(k_u) < prob
    det = jax.random.randint(k_det, (), 0, N_DETECTORS)
    n_g = jax.random.randint(k_n, (), 1, max_glitches + 1)
    centers = jax.random.randint(k_c, (max_glitches,), 0, N_SAMPLES)
    widths = jax.random.uniform(k_w, (max_glitches,), minval=20.0,
                                maxval=200.0)
    amps = jax.random.uniform(k_a, (max_glitches,), minval=2.0, maxval=8.0)
    t = jnp.arange(N_SAMPLES, dtype=jnp.float32)

    def one(c, w, a, live):
        x = t - c
        env = jnp.exp(-x ** 2 / (2.0 * (w / 3.0) ** 2))
        return live * a * env * jnp.sin(2.0 * jnp.pi * x / w)

    live = (jnp.arange(max_glitches) < n_g).astype(jnp.float32) \
        * fire.astype(jnp.float32)
    burst = jnp.sum(jax.vmap(one)(centers.astype(jnp.float32), widths,
                                  amps, live), axis=0)
    return burst[None, :] * (jnp.arange(N_DETECTORS)[:, None] == det)


def simulate_event(key: jax.Array, params: jax.Array, n_sig: jax.Array,
                   asd: jax.Array, cfg: SimConfig, bank=None,
                   real_feed=None, pre=None):
    """Assemble one whitened 3-detector training event.

    params [S, N_PARAMS] prior draws (unordered), n_sig scalar. Optional
    `bank` (data.noise_bank.NoiseBank) enables real-noise mixing with
    probability cfg.real_noise_prob: the event's noise becomes a real
    crop, its signals are re-colored into that segment's whitening, and
    asd_bands reports the sensitivity summary (remix_data.py semantics).
    `real_feed` = (noise [3,T], recolor [3,F], bands [3,K]) supplies the
    crop externally (the host-side big-bank path, data/host_feed.py) —
    takes precedence over `bank`. `pre` = (params_ranked, sig_fd,
    snr_ranked, n_valid) supplies the gated waveform sum precomputed by
    simulate_batch's fused two-pass path (see its TPU note). Returns an
    EventBatch (no batch dim)."""
    (k_noise, k_drop, k_cfg, k_fill, k_real, k_use,
     k_glitch) = jax.random.split(key, 7)

    if pre is None:
        h_w = jax.vmap(lambda p: signal_white_fd(p, asd,
                                                 cfg.f_lower))(params)
        params, sig_fd, sig_snr, n_valid = _rank_and_gate(
            params, h_w, n_sig, cfg.min_snr)
    else:
        params, sig_fd, sig_snr, n_valid = pre

    # detector dropout: pick a keep-config with prob det_dropout
    drop = (jax.random.uniform(k_drop) < cfg.det_dropout)
    keep_cfg = _KEEP_CONFIGS[jax.random.randint(k_cfg, (), 0,
                                                _KEEP_CONFIGS.shape[0])]
    det_mask = jnp.where(drop, keep_cfg, jnp.ones(N_DETECTORS))

    # network SNR over KEPT detectors only (dropped signal is gone),
    # measured on the DESIGN-whitened signal (re-coloring changes the
    # per-segment SNR only through sensitivity, which asd_bands reports).
    # Computed in FD — ρ_det = ||h_w||₂ over bins in this normalization
    # (whiten.py), with the one-sided DC/Nyquist half-weights.
    e_det = (jnp.sum(jnp.abs(sig_fd) ** 2, axis=-1)
             - 0.5 * jnp.abs(sig_fd[..., 0]) ** 2
             - 0.5 * jnp.abs(sig_fd[..., -1]) ** 2)
    net_snr = jnp.sqrt(jnp.sum(det_mask * e_det))

    noise = jax.random.normal(k_noise, (N_DETECTORS, N_SAMPLES))
    fill = jax.random.normal(k_fill, (N_DETECTORS, N_SAMPLES))
    asd_bands = jnp.zeros((N_DETECTORS, cfg.psd_bands), dtype=jnp.float32)

    if (bank is not None or real_feed is not None) \
            and cfg.real_noise_prob > 0.0:
        from posteriflow_tpu.data.noise_bank import sample_real_noise
        use_real = jax.random.uniform(k_use) < cfg.real_noise_prob
        if real_feed is not None:
            r_noise, r_filt, r_bands = real_feed
            # dropout fill: the same crop time-flipped+negated (the bank
            # decorrelation trick) — the host feed ships one crop per event
            r_fill = -r_noise[:, ::-1]
        else:
            k_r1, _ = jax.random.split(k_real)
            r_noise, r_filt, r_bands = sample_real_noise(k_r1, bank)
            # dropout fill: the same crop time-flipped+negated — identical
            # to the host-feed semantics above. Safe because a detector
            # shows EITHER noise OR fill, never both (strain where below),
            # and crops are per-detector independent; halves the bank's
            # HBM crop traffic vs an independent second draw
            r_fill = -r_noise[:, ::-1]
        # re-coloring is diagonal in frequency, so it folds into the FD
        # spectrum BEFORE the (single) irfft — exactly recolor_signal
        # (irfft(rfft(s)·filt)) without the extra rfft/irfft pair the
        # measured sim profile flagged
        noise = jnp.where(use_real, r_noise, noise)
        fill = jnp.where(use_real, r_fill, fill)
        sig_fd = jnp.where(use_real, sig_fd * r_filt, sig_fd)
        asd_bands = jnp.where(use_real, r_bands, asd_bands)

    sig_td = fd_white_to_td(sig_fd, N_SAMPLES)                     # [n_det, T]

    if cfg.glitch_prob > 0.0:
        # dedicated key: re-splitting the consumed k_noise here would
        # correlate glitch placement with the noise realization
        noise = noise + _glitch_burst(k_glitch, cfg.glitch_prob)

    if cfg.add_noise:
        strain = jnp.where(det_mask[:, None] > 0,
                           noise + sig_td, fill)
    else:
        strain = sig_td * det_mask[:, None]

    asd_bands = asd_bands * det_mask[:, None]      # dropped dets report 0
    return EventBatch(strain.astype(jnp.float32), params, n_valid,
                      net_snr.astype(jnp.float32), sig_snr, asd_bands,
                      det_mask)


def simulate_batch(key: jax.Array, batch_size: int,
                   cfg: SimConfig = SimConfig(),
                   asd: jax.Array | None = None, bank=None,
                   real_feed=None) -> EventBatch:
    """Synthesize a fresh training batch on-device. Fully jittable; the
    training step calls this inside jit so data generation fuses with the
    forward/backward pass (SURVEY.md §7 design stance). real_feed:
    per-event (noise [B,3,T], recolor [B,3,F], bands [B,3,K]) from
    data/host_feed.py."""
    if asd is None:
        asd = default_network_asd()
    k_prior, k_sim = jax.random.split(key)
    params, n_sig = sample_batch(k_prior, batch_size, cfg.prior)
    keys = jax.random.split(k_sim, batch_size)

    # TPU note (reports/train_profile_r3.md §2): the naive structure —
    # one [B,S,n_det,F] waveform stack consumed by BOTH the SNR gate and
    # the slot sum — breaks XLA's producer fusion and materializes the
    # per-slot arrays (plus layout transposes) to HBM: the whole sim was
    # bandwidth-bound at ~6.4 GB/batch. Two separately-FUSED passes keep
    # every per-slot tensor in registers (each pass's only output is
    # [B,S] or [B,n_det,F]); the waveform math runs twice, and the
    # program is still ~2x faster end to end (sim_probe.json
    # wave_twopass vs full).
    b, s, p = params.shape
    flat = params.reshape(b * s, p)

    def _wave(q):
        return signal_white_fd(q, asd, cfg.f_lower)

    # SNR-gate pass: amplitude-only exact SNR (phase/time-shift drop out
    # of |h|; see signal_snr_amp_only) — the full waveform is synthesized
    # exactly ONCE per slot, in the slot-sum pass below. The precessing
    # integrand carries the (oscillatory-in-f) twist modulus, so its
    # quadrature coarsens faster: decimate 2 keeps the gate SNR within
    # 0.7% (measured; aligned decimate 4 is <0.1%).
    snr = jax.vmap(lambda q: signal_snr_amp_only(
        q, asd, cfg.f_lower, decimate=4 if p < 15 else 2))(
        flat).reshape(b, s)
    params_r, keep_orig, snr_r, n_valid = jax.vmap(
        lambda pp, sn, n: _gate_from_snr(pp, sn, n, cfg.min_snr))(
        params, snr, n_sig)
    h_w = jax.vmap(_wave)(flat).reshape(b, s, N_DETECTORS, -1)
    # slot sum as an elementwise-mask + reduce, NOT an einsum/dot: the dot
    # lowering wants the slot axis minor and TRANSPOSES the [B,S,F]
    # per-slot arrays (HLO census: 2x168 MB of pure layout traffic);
    # a reduce fuses the masked producer directly
    # NOTE: no optimization_barrier here — forcing the summed spectrum to
    # materialize measured 30 ms SLOWER than letting XLA schedule freely
    # (reports/sim_bisect.json full-with-barrier 49.5 ms vs no_barrier
    # 19.8 ms); the fusion-duplication hypothesis was wrong
    sig_fd = jnp.sum(keep_orig[:, :, None, None] * h_w, axis=1)
    pre = (params_r, sig_fd, snr_r, n_valid)

    if real_feed is not None:
        return jax.vmap(lambda k, pr, rn, rf, rb: simulate_event(
            k, None, None, asd, cfg, None, (rn, rf, rb), pr))(
            keys, pre, *real_feed)
    return jax.vmap(lambda k, pr: simulate_event(
        k, None, None, asd, cfg, bank, None, pr))(keys, pre)
