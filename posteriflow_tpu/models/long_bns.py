"""Long-duration BNS embedding: multibanded strain + sequence-parallel
attention over the device mesh.

BASELINE configs[3] — NEW capability with no reference pattern (SURVEY.md
§5 long-context note: the reference sidesteps long sequences entirely).

Physics: a BNS from 20 Hz lasts ~minutes; the information lives in the
slowly-sweeping phase. The front-end here MULTIBANDS the whitened FD
strain: geometrically-spaced frequency bands, each pooled to a fixed
number of complex coefficients per band — frequency resolution follows the
chirp's time-frequency occupancy, giving a sequence of L tokens (L in the
thousands for 128 s segments) instead of 2^19 time samples.

Parallelism: the token sequence is sharded over the mesh's "model" axis
(sequence parallelism). Attention uses the Ulysses-style decomposition
under shard_map: each shard holds its local queries and all-gathers K/V
over the sequence axis — exact attention, one collective per layer, ICI-
friendly for the moderate L this front-end produces. The feed-forward and
LayerNorms are purely local to the shard.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from posteriflow_tpu.models.encoder import sinusoidal_positions


def multiband_tokens(h_white_fd: jnp.ndarray, freqs: np.ndarray,
                     f_lo: float = 20.0, f_hi: float = 1024.0,
                     n_bands: int = 64, per_band: int = 32) -> jnp.ndarray:
    """Whitened FD strain [..., n_det, F] -> [..., L, n_det·2] real tokens,
    L = n_bands · per_band.

    Each geomspaced band is average-pooled to per_band complex
    coefficients; low bands (where a BNS dwells for minutes) keep fine
    frequency resolution relative to their width, high bands coarse — the
    multibanding standard for long-inspiral likelihoods, applied to the
    embedding."""
    edges = np.geomspace(f_lo, f_hi, n_bands + 1)
    tokens = []
    for b in range(n_bands):
        sel = np.where((freqs >= edges[b]) & (freqs < edges[b + 1]))[0]
        if len(sel) == 0:
            sel = np.array([int(np.argmin(np.abs(freqs - edges[b])))])
        # pad band bins to a multiple of per_band, then mean-pool
        n = int(math.ceil(len(sel) / per_band) * per_band)
        idx = np.pad(sel, (0, n - len(sel)), mode="edge")
        band = h_white_fd[..., idx]                       # [..., D, n]
        band = band.reshape(*band.shape[:-1], per_band, n // per_band)
        pooled = jnp.mean(band, axis=-1)                  # [..., D, per_band]
        tokens.append(pooled)
    tok = jnp.concatenate(tokens, axis=-1)                # [..., D, L]
    tok = jnp.moveaxis(tok, -1, -2)                       # [..., L, D]
    return jnp.concatenate([tok.real, tok.imag], axis=-1)


def _tau_0pn(freqs: np.ndarray, mc: float) -> np.ndarray:
    """Newtonian time-to-merger [s] at GW frequency f for chirp mass mc."""
    from posteriflow_tpu.physics.constants import MTSUN_SI
    return (5.0 / 256.0 * (np.pi * freqs) ** (-8.0 / 3.0)
            * (MTSUN_SI * mc) ** (-5.0 / 3.0))


def build_chirp_token_grid(duration: float = 64.0, f_lo: float = 20.0,
                           f_hi: float = 512.0, m_lo: float = 1.0,
                           m_hi: float = 2.5, t_off_max: float = 1.5,
                           alpha: float = 2.0, pad_multiple: int = 64):
    """Host-side construction of the CHIRP-ADAPTED HETERODYNED token grid
    (the v3 long-BNS front-end).

    Why: plain mean-pooling of whitened FD bins (multiband_tokens above)
    destroys the signal — the epoch factor e^{-2πif·duration/2} alone
    rotates 2π every 2 bins at Δf=1/64 Hz, and the chirp phase adds
    2π·t(f) rad/Hz on top (t(20 Hz) up to ~280 s over the BNS prior).
    Measured: only ~13% of SNR² survives v1 pooling, and the surviving
    projection oscillates unlearnably in (Mc, t_c) — the v2 model trained
    to shuffle-ΔNLL 0.037 (it ignored the strain).

    Fix, standard GW practice (relative binning / multibanding adapted to
    an EMBEDDING): multiply the data by a fiducial conjugate phase (the
    TaylorF2 phase at the prior's t(f)-midpoint chirp mass, plus the
    known duration/2 epoch shift), then pool with VARIABLE widths sized
    so the worst-case residual intra-pool phase spread over the whole
    (Mc, t_off) prior stays ≤ alpha rad (attenuation ≥ sinc(alpha/2),
    0.84 at the default). Where that demands sub-native widths the pool
    is a single raw bin (exact). Token count ≈ (2π/α)·∫(Δt_max(f))df —
    the time-frequency area of the prior support, ~4.8k for the 64 s /
    [1, 2.5] M☉ / ±1.5 s configuration.

    Returns a dict of static numpy arrays consumed by `chirp_tokens`;
    everything here is a pure function of the (hashable) scalar config,
    so validators can rebuild the identical grid from calibration.json.
    """
    import jax as _jax
    from posteriflow_tpu.physics.constants import SAMPLE_RATE
    from posteriflow_tpu.physics.waveforms.taylorf2 import taylorf2_amp_phase

    n = int(duration * SAMPLE_RATE)
    freqs = np.fft.rfftfreq(n, 1.0 / SAMPLE_RATE)
    cut = int(np.searchsorted(freqs, f_hi)) + 1
    freqs = freqs[:cut]
    i_lo = int(np.searchsorted(freqs, f_lo))
    fb = freqs[i_lo:]                              # banded bins [n_used]
    df = float(freqs[1] - freqs[0])

    # equal-mass chirp masses at the prior corners; fiducial at the
    # t(f)-midpoint (exact at every f: all tau scale as mc^{-5/3}·f^{-8/3})
    eqm = 2.0 * 0.25 ** 0.6
    mc_lo, mc_hi = eqm * m_lo, eqm * m_hi
    a_mid = 0.5 * (mc_lo ** (-5.0 / 3.0) + mc_hi ** (-5.0 / 3.0))
    mc_fid = float(a_mid ** (-0.6))
    m_fid = mc_fid / eqm

    dt_chirp = 0.5 * (_tau_0pn(fb, mc_lo) - _tau_0pn(fb, mc_hi))
    spread = 2.0 * np.pi * (dt_chirp + t_off_max) * df   # rad per bin

    # greedy contiguous segmentation: close a pool when adding the next
    # bin would push the accumulated spread past alpha (a 1-bin pool is
    # exact no matter the local spread)
    seg = np.zeros(len(fb), np.int32)
    s, acc = 0, 0.0
    for j in range(len(fb)):
        if acc > 0.0 and acc + spread[j] > alpha:
            s += 1
            acc = 0.0
        seg[j] = s
        acc += spread[j]
    n_tok = s + 1
    L = int(math.ceil(n_tok / pad_multiple) * pad_multiple)

    counts = np.bincount(seg, minlength=L).astype(np.float64)
    counts = np.maximum(counts, 1.0)               # pad tokens: benign
    ends = np.cumsum(np.bincount(seg, minlength=L)).astype(np.int32)
    starts = np.concatenate([[0], ends[:-1]]).astype(np.int32)

    # fiducial heterodyne: conj of the TaylorF2 phase convention
    # h ∝ e^{-iΨ} times the projection epoch e^{-2πif·duration/2}
    # (projection.py:44 — tau = duration/2 + t_off + dt; we remove the
    # known duration/2 part). Evaluated on the CPU backend: one small
    # jitted program, never touching the (tunneled) accelerator.
    cpu = _jax.local_devices(backend="cpu")[0]
    with _jax.default_device(cpu):
        psi = np.asarray(_jax.jit(
            lambda f: taylorf2_amp_phase(f, m_fid, m_fid, 0.0, 0.0,
                                         100.0, 0.0)[1])(
            jnp.asarray(fb, jnp.float32)), dtype=np.float64)
    epoch_cyc = np.mod(fb * (duration / 2.0), 1.0)  # float64 mod-1 cycles
    het = np.exp(1j * (psi + 2.0 * np.pi * epoch_cyc)).astype(np.complex64)

    # static per-token features: band-center frequency (log-scaled to
    # [0,1]) and log2 pool width — cheap conditioning for the embed layer
    f_cen = np.zeros(L)
    f_cen[:n_tok] = [fb[starts[t]:ends[t]].mean() if ends[t] > starts[t]
                     else f_lo for t in range(n_tok)]
    f_cen = np.maximum(f_cen, f_lo)
    feat = np.stack([np.log(f_cen / f_lo) / np.log(f_hi / f_lo),
                     np.log2(counts) / 10.0], axis=-1)

    return {
        "freqs": freqs, "i_lo": i_lo, "cut": cut, "L": L, "n_tok": n_tok,
        "starts": starts, "ends": ends,
        "counts": counts.astype(np.float32),
        "het": het, "feat": feat.astype(np.float32),
        "mc_fid": mc_fid, "m_fid": m_fid, "duration": duration,
        "config": {"kind": "chirp", "duration": duration, "f_lo": f_lo,
                   "f_hi": f_hi, "m_lo": m_lo, "m_hi": m_hi,
                   "t_off_max": t_off_max, "alpha": alpha,
                   "pad_multiple": pad_multiple},
    }


def _pool_heterodyned(x: jnp.ndarray, grid: dict) -> jnp.ndarray:
    """Heterodyned banded strain [n_det, n] -> tokens [L, 3D+2].

    Pools each variable-width contiguous segment via cumulative sums
    (cumsum + boundary gather — no TPU scatter). Channels per token:
    Re/Im of the pooled heterodyned strain normalized to unit noise
    variance (coherent, per detector) and the excess energy (incoherent,
    per detector), plus 2 static features."""
    cols = jnp.concatenate([x.real, x.imag,
                            x.real ** 2 + x.imag ** 2], axis=0)  # [3D, n]
    cs = jnp.cumsum(cols, axis=1)                        # [3D, n]
    cs = jnp.concatenate([jnp.zeros_like(cs[:, :1]), cs], axis=1)
    seg = (cs[:, jnp.asarray(grid["ends"])]
           - cs[:, jnp.asarray(grid["starts"])])         # [3D, L]
    seg = jnp.moveaxis(seg, 0, 1)                        # [L, 3D]
    d = x.shape[0]
    k = jnp.asarray(grid["counts"])[:, None]
    coh = seg[:, : 2 * d] / jnp.sqrt(2.0 * k)            # unit noise var
    energy = (seg[:, 2 * d:] - 2.0 * k) / (2.0 * jnp.sqrt(k))
    return jnp.concatenate([coh, energy, jnp.asarray(grid["feat"])],
                           axis=-1)


def chirp_tokens(h_w: jnp.ndarray, grid: dict) -> jnp.ndarray:
    """Whitened FD strain [n_det, F_cut] -> chirp-adapted tokens [L, 3D+2]
    (v3 front-end: one STATIC fiducial heterodyne for the whole prior)."""
    x = h_w[:, grid["i_lo"]:] * jnp.asarray(grid["het"])[None, :]
    return _pool_heterodyned(x, grid)


class SeqParallelAttention(nn.Module):
    """Exact multi-head attention with the sequence sharded over `axis`.

    Inside shard_map: q local [l_loc, d]; k/v all-gathered over the
    sequence axis [L, d]. Without a mesh it reduces to plain attention."""
    d_model: int
    n_heads: int
    axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dh = self.d_model // self.n_heads
        q = nn.DenseGeneral((self.n_heads, dh), name="q")(x)
        k = nn.DenseGeneral((self.n_heads, dh), name="k")(x)
        v = nn.DenseGeneral((self.n_heads, dh), name="v")(x)
        if self.axis is not None:
            k = jax.lax.all_gather(k, self.axis, axis=0, tiled=True)
            v = jax.lax.all_gather(v, self.axis, axis=0, tiled=True)
        a = jnp.einsum("qhd,khd->hqk", q, k) / math.sqrt(dh)
        w = jax.nn.softmax(a, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", w, v)
        return nn.DenseGeneral(self.d_model, axis=(-2, -1), name="o")(o)


class LongBNSEncoder(nn.Module):
    """Multibanded FD tokens -> context vector, sequence-parallel-ready.

    __call__ operates on ONE event's token sequence [L, n_feat] (shard_map
    and vmap supply batching); `encode_sharded` builds the mesh-parallel
    program."""
    d_model: int = 128
    n_layers: int = 4
    n_heads: int = 8
    context_dim: int = 256
    patch: int = 1
    seq_axis: Optional[str] = None

    @nn.compact
    def __call__(self, tokens: jnp.ndarray,
                 positions: jnp.ndarray) -> jnp.ndarray:
        if self.patch > 1:
            # non-overlapping patch embedding: exactly shardable (no halo)
            # — each shard reshapes its own l_loc (divisible by patch)
            lt, ft = tokens.shape
            tokens = tokens.reshape(lt // self.patch, self.patch * ft)
        h = nn.Dense(self.d_model, name="embed")(tokens)
        h = h + positions
        for i in range(self.n_layers):
            a = SeqParallelAttention(self.d_model, self.n_heads,
                                     axis=self.seq_axis,
                                     name=f"attn_{i}")(nn.LayerNorm()(h))
            h = h + a
            f = nn.Dense(self.d_model, name=f"ff2_{i}")(
                nn.gelu(nn.Dense(2 * self.d_model, name=f"ff1_{i}")(
                    nn.LayerNorm()(h))))
            h = h + f
        # local mean-pool; the sharded path psum-averages across shards
        pooled = jnp.mean(h, axis=0)
        if self.seq_axis is not None:
            pooled = jax.lax.pmean(pooled, self.seq_axis)
        return nn.Dense(self.context_dim, name="out")(pooled)


def simulate_long_bns_batch(key: jax.Array, batch: int,
                            duration: float = 64.0,
                            n_bands: int = 64, per_band: int = 32,
                            f_hi: float = 1024.0):
    """Long-duration BNS training batch, ENTIRELY in the frequency domain —
    the long time series is never materialized (the point of the
    multibanded design).

    Returns (tokens [B, L, 6], theta [B, 11] physical). Whitened FD noise
    per rfft bin is complex with E|n|² = 2 in the framework's whitened
    normalization (independent of duration)."""
    import numpy as np
    from posteriflow_tpu.physics.constants import SAMPLE_RATE
    from posteriflow_tpu.physics.psd import default_network_psd
    from posteriflow_tpu.physics.projection import project_to_network
    from posteriflow_tpu.physics.waveforms.taylorf2 import \
        taylorf2_polarizations
    from posteriflow_tpu.physics.whiten import whiten_fd
    from posteriflow_tpu.prior import PriorConfig, sample_signal_params

    n = int(duration * SAMPLE_RATE)
    freqs_np = np.fft.rfftfreq(n, 1.0 / SAMPLE_RATE)
    # band-limit the grid to f_hi (BNS embedding band) — keeps the FD
    # arrays ~16x smaller than the full Nyquist grid
    cut = int(np.searchsorted(freqs_np, f_hi)) + 1
    freqs_np = freqs_np[:cut]
    freqs = jnp.asarray(freqs_np, dtype=jnp.float32)
    psd = default_network_psd(freqs_np)
    asd = jnp.asarray(np.sqrt(psd) * 1e23, dtype=jnp.float32)  # scaled units
    delta_f = 1.0 / duration

    bns_prior = PriorConfig(type_probs=(0.0, 1.0, 0.0))

    def one(k):
        k_t, k_n = jax.random.split(k)
        theta = sample_signal_params(k_t, bns_prior)
        (m1, m2, d, ra, dec, tj, psi_a, ph, t_off, a1, a2) = theta
        hp, hc = taylorf2_polarizations(freqs, m1, m2, a1, a2, d, tj, ph)
        # matter effects: mass-keyed tidal dephasing + merger taper
        # (waveforms/tidal.py) — the long-BNS band is exactly where the
        # tidal phase accumulates
        from posteriflow_tpu.physics.waveforms.tidal import matter_effects
        psi_t, taper = matter_effects(freqs, m1, m2)
        fac = (taper * jnp.exp(-1j * psi_t.astype(jnp.float32))
               ).astype(jnp.complex64)
        hp, hc = hp * fac, hc * fac
        h_det = project_to_network(freqs, hp, hc, ra, dec, psi_a, t_off,
                                   duration=duration)
        h_w = whiten_fd(h_det, asd, delta_f)
        kr, ki = jax.random.split(k_n)
        noise = (jax.random.normal(kr, h_w.shape)
                 + 1j * jax.random.normal(ki, h_w.shape))
        tok = multiband_tokens(h_w + noise, freqs_np, n_bands=n_bands,
                               per_band=per_band, f_hi=f_hi)
        return tok, theta

    return jax.vmap(one)(jax.random.split(key, batch))


def simulate_long_bns_batch_v3(key: jax.Array, batch: int, grid: dict):
    """Long-BNS training batch with the v3 chirp-adapted heterodyned
    front-end (build_chirp_token_grid). Same waveform/noise model as
    simulate_long_bns_batch; only the tokenization differs.

    Returns (tokens [B, L, 3·n_det+2], theta [B, 11] physical)."""
    from posteriflow_tpu.physics.psd import default_network_psd
    from posteriflow_tpu.physics.projection import project_to_network
    from posteriflow_tpu.physics.waveforms.taylorf2 import \
        taylorf2_polarizations
    from posteriflow_tpu.physics.waveforms.tidal import matter_effects
    from posteriflow_tpu.physics.whiten import whiten_fd
    from posteriflow_tpu.prior import PriorConfig, sample_signal_params

    freqs_np = grid["freqs"]
    duration = grid["duration"]
    freqs = jnp.asarray(freqs_np, dtype=jnp.float32)
    psd = default_network_psd(freqs_np)
    asd = jnp.asarray(np.sqrt(psd) * 1e23, dtype=jnp.float32)
    delta_f = 1.0 / duration

    bns_prior = PriorConfig(type_probs=(0.0, 1.0, 0.0))

    def one(k):
        k_t, k_n = jax.random.split(k)
        theta = sample_signal_params(k_t, bns_prior)
        (m1, m2, d, ra, dec, tj, psi_a, ph, t_off, a1, a2) = theta
        hp, hc = taylorf2_polarizations(freqs, m1, m2, a1, a2, d, tj, ph)
        psi_t, taper = matter_effects(freqs, m1, m2)
        fac = (taper * jnp.exp(-1j * psi_t.astype(jnp.float32))
               ).astype(jnp.complex64)
        hp, hc = hp * fac, hc * fac
        h_det = project_to_network(freqs, hp, hc, ra, dec, psi_a, t_off,
                                   duration=duration)
        h_w = whiten_fd(h_det, asd, delta_f)
        kr, ki = jax.random.split(k_n)
        noise = (jax.random.normal(kr, h_w.shape)
                 + 1j * jax.random.normal(ki, h_w.shape))
        return chirp_tokens(h_w + noise, grid), theta

    return jax.vmap(one)(jax.random.split(key, batch))


# ── v4: trigger-conditioned heterodyne ───────────────────────────────────
#
# Why v3 failed (measured, model/long_bns_v3_smoke + the 50k v2 run):
# with one static fiducial for the WHOLE (Mc, t) prior, the residual
# time-frequency area is ~4.8k tokens and the per-token coherent SNR is
# ~0.009 at the median injected network SNR ~9 — learning to use the
# coherent channels is matched filtering over thousands of tokens, and
# both v2 (50k steps) and v3 (2k smoke) trained to shuffle-ΔNLL ≈ 0
# (the model ignored the strain).
#
# The field-standard fix (DINGO-BNS; BAYESTAR's trigger inputs; relative
# binning) is to condition on the DETECTION PIPELINE's trigger: a chirp
# mass estimate M̂c and per-detector arrival times t̂_d with realistic
# errors. Heterodyning each detector by the fiducial TaylorF2+tidal phase
# at (M̂c, t̂_d) collapses the residual phase to O(rad) over the residual
# prior — ~10² tokens, per-token SNR ~1, the same learning problem as the
# working 4-s flagship. Labels for (Mc, t) are re-expressed relative to
# the trigger so the sharp directions stay O(1) in flow space; the coarse
# sky information carried by the relative arrival times enters as context
# features. BASELINE configs[3] names exactly this class of front-end:
# "BNS inference (heterodyned/multibanded strain)".


def build_trigger_token_grid(duration: float = 64.0, f_lo: float = 20.0,
                             f_hi: float = 512.0, m_lo: float = 1.0,
                             m_hi: float = 2.5, q_min: float = 0.4,
                             chi_max: float = 0.05,
                             sigma_mc_rel: float = 5e-4,
                             sigma_t: float = 5e-3, trunc: float = 3.5,
                             alpha: float = 2.0, pad_multiple: int = 64):
    """Static numpy token grid for the v4 trigger-conditioned heterodyne.

    The pool widths are sized by the NUMERICAL group-delay spread of the
    residual phase Ψ(θ) − Ψ_fid(M̂c) over the residual prior — corners in
    (δMc = ±trunc·σ_mc, q ∈ {q_min, 1}, χ ∈ ±chi_max, mass-keyed tides)
    plus the ±trunc·σ_t per-detector timing slop — enveloped over fiducial
    M̂c across the BNS prior, so ONE static grid serves every event. Greedy
    contiguous segmentation bounds intra-pool phase wander to ≤ alpha rad
    (attenuation ≥ sinc(alpha/2) ≈ 0.84 at the default).

    Everything is a pure function of the scalar config (validators rebuild
    the identical grid from calibration.json)."""
    import itertools

    import jax as _jax
    from posteriflow_tpu.physics.constants import SAMPLE_RATE
    from posteriflow_tpu.physics.waveforms.taylorf2 import taylorf2_amp_phase
    from posteriflow_tpu.physics.waveforms.tidal import matter_effects

    n = int(duration * SAMPLE_RATE)
    freqs = np.fft.rfftfreq(n, 1.0 / SAMPLE_RATE)
    cut = int(np.searchsorted(freqs, f_hi)) + 1
    freqs = freqs[:cut]
    i_lo = int(np.searchsorted(freqs, f_lo))
    fb = freqs[i_lo:]
    df = float(freqs[1] - freqs[0])

    eqm = 2.0 * 0.25 ** 0.6
    mc_lo, mc_hi = eqm * m_lo, eqm * m_hi

    cpu = _jax.local_devices(backend="cpu")[0]

    def _psi(m1, m2, chi):
        with _jax.default_device(cpu):
            fbj = jnp.asarray(fb, jnp.float32)
            psi = _jax.jit(lambda f: taylorf2_amp_phase(
                f, m1, m2, chi, chi, 100.0, 0.0)[1]
                + matter_effects(f, m1, m2)[0])(fbj)
        return np.asarray(psi, dtype=np.float64)

    def _masses(mc, q):
        m1 = mc * (1.0 + q) ** 0.2 * q ** -0.6
        return m1, q * m1

    spread = np.zeros(len(fb))
    for mc_f in (mc_lo, 0.5 * (mc_lo + mc_hi), mc_hi):
        psi_f = _psi(mc_f / eqm, mc_f / eqm, 0.0)
        taus = []
        for dmc, q, chi in itertools.product(
                (-trunc * sigma_mc_rel, trunc * sigma_mc_rel),
                (q_min, 1.0), (-chi_max, 0.0, chi_max)):
            m1, m2 = _masses(mc_f * (1.0 + dmc), q)
            dpsi = _psi(m1, m2, chi) - psi_f
            taus.append(np.gradient(dpsi, fb) / (2.0 * np.pi))
        taus = np.stack(taus)
        spread = np.maximum(spread, taus.max(0) - taus.min(0))
    spread += 2.0 * trunc * sigma_t                 # per-detector t̂ error
    spread_rad = 2.0 * np.pi * spread * df          # rad per native bin

    seg = np.zeros(len(fb), np.int32)
    s, acc = 0, 0.0
    for j in range(len(fb)):
        if acc > 0.0 and acc + spread_rad[j] > alpha:
            s += 1
            acc = 0.0
        seg[j] = s
        acc += spread_rad[j]
    n_tok = s + 1
    L = int(math.ceil(n_tok / pad_multiple) * pad_multiple)

    counts = np.bincount(seg, minlength=L).astype(np.float64)
    counts = np.maximum(counts, 1.0)
    ends = np.cumsum(np.bincount(seg, minlength=L)).astype(np.int32)
    starts = np.concatenate([[0], ends[:-1]]).astype(np.int32)

    # static part of the heterodyne: the projection epoch duration/2
    # (projection.py:44), in float64 mod-1 cycles; the per-event
    # (M̂c, t̂_d) part is evaluated on device in trigger_tokens
    epoch_cyc = np.mod(fb * (duration / 2.0), 1.0).astype(np.float32)

    f_cen = np.zeros(L)
    f_cen[:n_tok] = [fb[starts[t]:ends[t]].mean() if ends[t] > starts[t]
                     else f_lo for t in range(n_tok)]
    f_cen = np.maximum(f_cen, f_lo)
    feat = np.stack([np.log(f_cen / f_lo) / np.log(f_hi / f_lo),
                     np.log2(counts) / 10.0], axis=-1)

    return {
        "freqs": freqs, "i_lo": i_lo, "cut": cut, "L": L, "n_tok": n_tok,
        "starts": starts, "ends": ends,
        "counts": counts.astype(np.float32),
        "epoch_cyc": epoch_cyc, "feat": feat.astype(np.float32),
        "duration": duration, "sigma_mc_rel": sigma_mc_rel,
        "sigma_t": sigma_t, "trunc": trunc,
        "mc_lo": mc_lo, "mc_hi": mc_hi, "q_min": q_min,
        "config": {"kind": "trigger", "duration": duration, "f_lo": f_lo,
                   "f_hi": f_hi, "m_lo": m_lo, "m_hi": m_hi,
                   "q_min": q_min, "chi_max": chi_max,
                   "sigma_mc_rel": sigma_mc_rel, "sigma_t": sigma_t,
                   "trunc": trunc, "alpha": alpha,
                   "pad_multiple": pad_multiple},
    }


def trigger_tokens(h_w: jnp.ndarray, grid: dict, mc_hat: jnp.ndarray,
                   t_hat: jnp.ndarray) -> jnp.ndarray:
    """Whitened FD strain [n_det, F_cut] + trigger (M̂c scalar, t̂ [n_det])
    -> trigger-heterodyned tokens [L, 3D+2].

    Each detector is heterodyned by the conjugate fiducial phase: the
    equal-mass TaylorF2+tidal phase at M̂c plus the full known epoch
    duration/2 + t̂_d — so the residual timing content is only the
    trigger error (≤ trunc·σ_t) and the residual chirp content only the
    trigger's M̂c error + (q, χ, Λ) spread the grid was sized for."""
    from posteriflow_tpu.physics.waveforms.taylorf2 import taylorf2_amp_phase
    from posteriflow_tpu.physics.waveforms.tidal import matter_effects

    fb = jnp.asarray(grid["freqs"][grid["i_lo"]:], jnp.float32)
    eqm = 2.0 * 0.25 ** 0.6
    m_hat = mc_hat / eqm
    _, psi = taylorf2_amp_phase(fb, m_hat, m_hat, 0.0, 0.0, 100.0, 0.0)
    psi = psi + matter_effects(fb, m_hat, m_hat)[0]
    cyc = jnp.mod(fb[None, :] * t_hat[:, None], 1.0)          # [D, n]
    phase = (psi[None, :]
             + 2.0 * jnp.pi * (jnp.asarray(grid["epoch_cyc"])[None, :]
                               + cyc))
    het = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))
    x = h_w[:, grid["i_lo"]:] * het
    return _pool_heterodyned(x, grid)


def simulate_long_bns_batch_v4(key: jax.Array, batch: int, grid: dict,
                               amp_scale: float = 1.0):
    """Long-BNS training batch for the v4 trigger-conditioned front-end.

    Same waveform/noise model as v3; additionally draws the detection
    trigger (M̂c, t̂_d) = truth + truncated-normal errors (σ_mc_rel,
    σ_t per detector, |ε| ≤ trunc) and heterodynes per event.

    amp_scale rescales the injected signal (0.0 = noise-only tokens with
    the SAME theta/trigger — the `signal_delta` conditioning metric's
    counterfactual: a strain-ignoring model scores identically on both).

    Returns (tokens [B, L, 3D+2], theta [B, 11] physical,
    trig [B, 1+n_det] = (M̂c, t̂_1..t̂_D))."""
    from posteriflow_tpu.physics.constants import N_DETECTORS
    from posteriflow_tpu.physics.projection import (GMST_REF, OMEGA_EARTH,
                                                    network_response,
                                                    project_to_network)
    from posteriflow_tpu.physics.psd import default_network_psd
    from posteriflow_tpu.physics.waveforms.taylorf2 import \
        taylorf2_polarizations
    from posteriflow_tpu.physics.waveforms.tidal import matter_effects
    from posteriflow_tpu.physics.whiten import whiten_fd
    from posteriflow_tpu.prior import PriorConfig, sample_signal_params

    freqs_np = grid["freqs"]
    duration = grid["duration"]
    freqs = jnp.asarray(freqs_np, dtype=jnp.float32)
    psd = default_network_psd(freqs_np)
    asd = jnp.asarray(np.sqrt(psd) * 1e23, dtype=jnp.float32)
    delta_f = 1.0 / duration

    bns_prior = PriorConfig(type_probs=(0.0, 1.0, 0.0))

    def one(k):
        k_t, k_n, k_g = jax.random.split(k, 3)
        theta = sample_signal_params(k_t, bns_prior)
        (m1, m2, d, ra, dec, tj, psi_a, ph, t_off, a1, a2) = theta
        hp, hc = taylorf2_polarizations(freqs, m1, m2, a1, a2, d, tj, ph)
        psi_t, taper = matter_effects(freqs, m1, m2)
        fac = (taper * jnp.exp(-1j * psi_t.astype(jnp.float32))
               ).astype(jnp.complex64)
        hp, hc = hp * fac, hc * fac
        h_det = project_to_network(freqs, hp, hc, ra, dec, psi_a, t_off,
                                   duration=duration)
        h_w = whiten_fd(h_det, asd, delta_f)
        kr, ki = jax.random.split(k_n)
        noise = (jax.random.normal(kr, h_w.shape)
                 + 1j * jax.random.normal(ki, h_w.shape))
        # detection trigger: per-detector arrival + chirp mass estimate
        mc = (m1 * m2) ** 0.6 * (m1 + m2) ** -0.2
        gmst = GMST_REF + OMEGA_EARTH * t_off
        _, _, dt = network_response(ra, dec, psi_a, gmst)
        eps = jax.random.truncated_normal(
            k_g, -grid["trunc"], grid["trunc"], (1 + N_DETECTORS,))
        mc_hat = mc * (1.0 + grid["sigma_mc_rel"] * eps[0])
        t_hat = t_off + dt + grid["sigma_t"] * eps[1:]
        tok = trigger_tokens(amp_scale * h_w + noise, grid, mc_hat, t_hat)
        return tok, theta, jnp.concatenate([mc_hat[None], t_hat])

    return jax.vmap(one)(jax.random.split(key, batch))


class TriggerScaler:
    """Trigger-relative label map: theta [.., 11] + trig [.., 1+D] <-> y.

    The sharp directions are re-expressed relative to the trigger so the
    flow sees O(1) coordinates: y_mc = (Mc − M̂c)/(k·σ_mc·M̂c),
    y_q = linear in q over [q_min, 1], y_t = (t_off − mean t̂)/t_scale;
    the remaining 8 parameters keep the deterministic ParamScaler map.
    All three custom coordinates are inside [-1, 1] by construction
    (trigger errors truncated at `trunc` σ; |mean detector delay| < 18 ms),
    so the base scaler's wrap/clamp semantics carry over unchanged."""

    def __init__(self, sigma_mc_rel: float = 5e-4, sigma_t: float = 5e-3,
                 trunc: float = 3.5, q_min: float = 0.4,
                 t_scale: float = 0.04, mc_scale_sigmas: float = 5.0):
        from posteriflow_tpu.scaler import ParamScaler
        self.base = ParamScaler()
        self.s_mc = mc_scale_sigmas * sigma_mc_rel
        self.q_min = q_min
        self.t_scale = t_scale

    def _split_trig(self, trig):
        mc_hat = trig[..., 0]
        t_ref = jnp.mean(trig[..., 1:], axis=-1)
        return mc_hat, t_ref

    def normalize(self, theta: jnp.ndarray, trig: jnp.ndarray):
        y = self.base.normalize(theta)
        m1, m2 = theta[..., 0], theta[..., 1]
        mc_hat, t_ref = self._split_trig(trig)
        mc = (m1 * m2) ** 0.6 * (m1 + m2) ** -0.2
        y_mc = (mc - mc_hat) / (self.s_mc * mc_hat)
        y_q = 2.0 * (m2 / m1 - self.q_min) / (1.0 - self.q_min) - 1.0
        y_t = (theta[..., 8] - t_ref) / self.t_scale
        return (y.at[..., 0].set(y_mc).at[..., 1].set(y_q)
                .at[..., 8].set(y_t))

    def denormalize(self, y: jnp.ndarray, trig: jnp.ndarray):
        y = self.base.wrap(y)
        th = self.base.denormalize(y)
        mc_hat, t_ref = self._split_trig(trig)
        mc = mc_hat * (1.0 + self.s_mc * y[..., 0])
        q = self.q_min + 0.5 * (y[..., 1] + 1.0) * (1.0 - self.q_min)
        m1 = mc * (1.0 + q) ** 0.2 * q ** -0.6
        t_off = t_ref + self.t_scale * y[..., 8]
        return (th.at[..., 0].set(m1).at[..., 1].set(q * m1)
                .at[..., 8].set(t_off))


def trigger_features(trig: jnp.ndarray, mc_lo: float,
                     mc_hi: float) -> jnp.ndarray:
    """Context features from the trigger [.., 1+D] -> [.., 2+D]:
    log-scaled M̂c, relative arrival pattern (the coarse sky info the
    heterodyne absorbed out of the strain), and the window position."""
    mc_hat = trig[..., 0]
    th = trig[..., 1:]
    tbar = jnp.mean(th, axis=-1, keepdims=True)
    f_mc = (2.0 * (jnp.log(mc_hat) - math.log(mc_lo))
            / (math.log(mc_hi) - math.log(mc_lo)) - 1.0)
    return jnp.concatenate([f_mc[..., None], (th - tbar) / 0.02,
                            tbar / 1.6], axis=-1)


class LongBNSNPEv4(nn.Module):
    """Trigger-conditioned heterodyne front-end + transformer encoder +
    coupling flow over trigger-relative labels (configs[3], v4)."""
    enc: dict = None
    flow_layers: int = 6
    flow_hidden: int = 128
    flow_bins: int = 12
    mc_lo: float = 2.0 * 0.25 ** 0.6
    mc_hi: float = 2.5 * 2.0 * 0.25 ** 0.6
    sigma_mc_rel: float = 5e-4
    sigma_t: float = 5e-3
    trunc: float = 3.5
    q_min: float = 0.4

    def setup(self):
        from posteriflow_tpu.models.flow import CouplingNSF
        cfg = self.enc or {}
        self.encoder = LongBNSEncoder(seq_axis=None, **cfg)
        ctx = cfg.get("context_dim", 256)
        from posteriflow_tpu.physics.constants import N_DETECTORS
        self.flow = CouplingNSF(features=11,
                                context_features=ctx + 2 + N_DETECTORS,
                                num_layers=self.flow_layers,
                                hidden=self.flow_hidden,
                                num_bins=self.flow_bins)
        self.scaler = TriggerScaler(self.sigma_mc_rel, self.sigma_t,
                                    self.trunc, self.q_min)

    def _context(self, tokens, trig):
        pos = sinusoidal_positions(tokens.shape[1] // self.encoder.patch,
                                   self.encoder.d_model)
        ctx = jax.vmap(lambda t: self.encoder(t, pos))(tokens)
        return jnp.concatenate(
            [ctx, trigger_features(trig, self.mc_lo, self.mc_hi)], axis=-1)

    def __call__(self, tokens: jnp.ndarray, theta: jnp.ndarray,
                 trig: jnp.ndarray):
        """tokens [B, L, F]; theta [B, 11] physical; trig [B, 1+D]."""
        ctx = self._context(tokens, trig)
        y = self.scaler.normalize(theta, trig)
        return -jnp.mean(self.flow.log_prob(y, ctx))

    def sample(self, key: jax.Array, tokens: jnp.ndarray,
               trig: jnp.ndarray, n_samples: int = 128):
        theta, _ = self.sample_raw(key, tokens, trig, n_samples)
        return theta

    def sample_raw(self, key: jax.Array, tokens: jnp.ndarray,
                   trig: jnp.ndarray, n_samples: int = 128):
        ctx = self._context(tokens, trig)
        z = jax.random.normal(key, (ctx.shape[0], n_samples, 11))
        y, _ = self.flow.sample_with_log_prob(z, ctx[:, None, :])
        return self.scaler.denormalize(y, trig[:, None, :]), y


class LongBNSNPE(nn.Module):
    """Multiband front-end + (optionally sequence-parallel) transformer +
    the framework's coupling flow — the configs[3] model assembly."""
    enc: dict = None
    flow_layers: int = 6
    flow_hidden: int = 128
    flow_bins: int = 8

    def setup(self):
        from posteriflow_tpu.models.flow import CouplingNSF
        cfg = self.enc or {}
        self.encoder = LongBNSEncoder(seq_axis=None, **cfg)
        ctx = cfg.get("context_dim", 256)
        self.flow = CouplingNSF(features=11, context_features=ctx,
                                num_layers=self.flow_layers,
                                hidden=self.flow_hidden,
                                num_bins=self.flow_bins)
        from posteriflow_tpu.scaler import ParamScaler
        self.scaler = ParamScaler()

    def __call__(self, tokens: jnp.ndarray, theta: jnp.ndarray):
        """tokens [B, L, F]; theta [B, 11] physical -> mean NLL."""
        pos = sinusoidal_positions(tokens.shape[1] // self.encoder.patch,
                                   self.encoder.d_model)
        ctx = jax.vmap(lambda t: self.encoder(t, pos))(tokens)
        y = self.scaler.normalize(theta)
        return -jnp.mean(self.flow.log_prob(y, ctx))

    def sample(self, key: jax.Array, tokens: jnp.ndarray,
               n_samples: int = 128):
        """tokens [B, L, F] -> physical posterior draws [B, n, 11]
        (wrap-then-denormalize, the LeanNPE sampling convention)."""
        theta, _ = self.sample_raw(key, tokens, n_samples)
        return theta

    def sample_raw(self, key: jax.Array, tokens: jnp.ndarray,
                   n_samples: int = 128):
        """Like `sample` but also returns the RAW normalized draws y
        (pre-wrap), for the spurious-railing gate — the LeanNPE
        sample_from_context convention (validate_checkpoint battery)."""
        pos = sinusoidal_positions(tokens.shape[1] // self.encoder.patch,
                                   self.encoder.d_model)
        ctx = jax.vmap(lambda t: self.encoder(t, pos))(tokens)
        z = jax.random.normal(key, (ctx.shape[0], n_samples, 11))
        y, _ = self.flow.sample_with_log_prob(z, ctx[:, None, :])
        return self.scaler.denormalize(self.scaler.wrap(y)), y


def make_sharded_nll(mesh: Mesh, seq_len: int, npe: "LongBNSNPE"):
    """Sequence-parallel TRAINING loss for LongBNSNPE: the encoder runs
    under shard_map with the token sequence split over the mesh's "model"
    axis and the batch over "data"; the (small) flow evaluates on the
    gathered contexts. Differentiable end to end — shard_map transposes
    to the matching collectives, so grads through the all-gathered K/V
    and the psum'd pool are exact (tested == unsharded grads on the CPU
    mesh). This is the path a >1-chip deployment trains configs[3]
    through; on one device it reduces to the plain loss.

    Returns loss_fn(params, tokens [B, L, F], theta [B, P]) -> scalar,
    with params = the pytree from LongBNSNPE.init (same structure as the
    unsharded trainer's, so checkpoints interchange)."""
    from posteriflow_tpu.models.flow import CouplingNSF
    from posteriflow_tpu.scaler import ParamScaler

    cfg = npe.enc or {}
    _, apply_sharded, _ = make_sharded_encoder(mesh, seq_len, None, cfg)
    flow = CouplingNSF(features=11,
                       context_features=cfg.get("context_dim", 256),
                       num_layers=npe.flow_layers, hidden=npe.flow_hidden,
                       num_bins=npe.flow_bins)
    scaler = ParamScaler()

    def loss_fn(params, tokens, theta):
        p = params["params"]
        ctx = apply_sharded({"params": p["encoder"]}, tokens)
        y = scaler.normalize(theta)
        return -jnp.mean(flow.apply({"params": p["flow"]}, y, ctx,
                                    method=CouplingNSF.log_prob))

    return loss_fn


def make_sharded_nll_v4(mesh: Mesh, seq_len: int, npe: "LongBNSNPEv4"):
    """Sequence-parallel training loss for LongBNSNPEv4 — the v4 analog of
    make_sharded_nll: sharded encoder, trigger features concatenated to
    the gathered contexts, flow + trigger-relative labels on the host
    layout. Param pytree matches LongBNSNPEv4.init."""
    from posteriflow_tpu.models.flow import CouplingNSF
    from posteriflow_tpu.physics.constants import N_DETECTORS

    cfg = npe.enc or {}
    _, apply_sharded, _ = make_sharded_encoder(mesh, seq_len, None, cfg)
    flow = CouplingNSF(features=11,
                       context_features=(cfg.get("context_dim", 256)
                                         + 2 + N_DETECTORS),
                       num_layers=npe.flow_layers, hidden=npe.flow_hidden,
                       num_bins=npe.flow_bins)
    scaler = TriggerScaler(npe.sigma_mc_rel, npe.sigma_t, npe.trunc,
                           npe.q_min)

    def loss_fn(params, tokens, theta, trig):
        p = params["params"]
        ctx = apply_sharded({"params": p["encoder"]}, tokens)
        ctx = jnp.concatenate(
            [ctx, trigger_features(trig, npe.mc_lo, npe.mc_hi)], axis=-1)
        y = scaler.normalize(theta, trig)
        return -jnp.mean(flow.apply({"params": p["flow"]}, y, ctx,
                                    method=CouplingNSF.log_prob))

    return loss_fn


def make_sharded_encoder(mesh: Mesh, seq_len: int, n_feat: int,
                         cfg: Optional[dict] = None):
    """Build (init_fn, apply_fn) for the sequence-parallel encoder.

    apply_fn(params, tokens [B, L, n_feat]) -> [B, context_dim], with L
    sharded over the mesh's "model" axis and B over "data". Exact: matches
    the unsharded module output (tested on the 8-device CPU mesh)."""
    cfg = cfg or {}
    module = LongBNSEncoder(seq_axis="model", **cfg)
    ref_module = LongBNSEncoder(seq_axis=None, **cfg)
    patch = module.patch
    pos = sinusoidal_positions(seq_len // patch, module.d_model)

    def init_fn(key, tokens_local):
        return ref_module.init(key, tokens_local,
                               pos[: tokens_local.shape[0] // patch])

    n_shards = mesh.shape["model"]
    l_loc = seq_len // n_shards
    if l_loc % patch:
        raise ValueError(f"seq_len/n_shards={l_loc} not divisible by "
                         f"patch={patch}")

    def one_event(params, tokens_loc):
        # positions for THIS shard's slice of the (patched) sequence
        idx = jax.lax.axis_index("model")
        pos_loc = jax.lax.dynamic_slice(pos, (idx * (l_loc // patch), 0),
                                        (l_loc // patch, pos.shape[1]))
        return module.apply(params, tokens_loc, pos_loc)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P("data", "model", None)),
             out_specs=P("data"))
    def apply_sharded(params, tokens):
        out = jax.vmap(lambda t: one_event(params, t))(tokens)
        return out

    def apply_fn(params, tokens):
        tokens = jax.device_put(tokens, NamedSharding(
            mesh, P("data", "model", None)))
        return apply_sharded(params, tokens)

    def apply_unsharded(params, tokens):
        return jax.vmap(lambda t: ref_module.apply(
            params, t, pos[: tokens.shape[1] // patch]))(tokens)

    return init_fn, apply_fn, apply_unsharded
