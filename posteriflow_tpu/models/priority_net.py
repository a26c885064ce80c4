"""PriorityNet: learned extraction-order scorer for overlapping candidates.

Reference component (src/ahsd/core/priority_net.py, 1207 LoC): temporal
CNN+BiLSTM strain branch, vectorized pairwise cross-signal features,
physics feature extractor, attention fusion, priority head + Softplus
uncertainty head + affine output calibration; AdaptiveRankingLoss (pairwise
margin) + weighted-MSE/uncertainty-calibration terms. Measured accuracy is
weak (top-1 0.412, Kendall τ −0.175 — BASELINE.md), so the rebuild keeps
the component compact and TPU-friendly:

  - strain branch: strided conv stack (convs, not LSTM — recurrence
    serializes on TPU; a small transformer over conv tokens gives the same
    temporal context MXU-natively);
  - physics branch: chirp mass, ratio, loudness, SNR proxy per candidate;
  - cross-signal branch: self-attention over candidate tokens (replaces
    the hand-built [n, n, 8] pairwise table with learned interactions);
  - heads: priority score + Softplus uncertainty + affine calibration
    (gain/bias) matching the reference's calibration hook.

Loss: pairwise margin ranking + MSE + uncertainty NLL (AdaptiveRankingLoss
semantics, priority_net.py:358-538).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

SEG_LEN = 2048          # 0.5 s strain segment around each candidate merger
                        # (reference: inference/ranking.py:60-74)


def physics_features(params: jnp.ndarray) -> jnp.ndarray:
    """[..., 11] physical params -> [..., 8] scale-stable features."""
    m1, m2, d = params[..., 0], params[..., 1], params[..., 2]
    m1 = jnp.maximum(m1, 1.0)
    m2 = jnp.maximum(m2, 1.0)
    d = jnp.maximum(d, 1.0)
    mc = (m1 * m2) ** 0.6 / (m1 + m2) ** 0.2
    q = m2 / m1
    loud = mc ** (5.0 / 6.0) / d
    # SNR proxy (reference: ranking.py:60-74): 25·(Mc^(5/6)/15.9)·(400/d)
    snr_proxy = 25.0 * (mc ** (5.0 / 6.0) / 15.9) * (400.0 / d)
    return jnp.stack([jnp.log(mc), q, jnp.log(d), jnp.log1p(loud * 1e3),
                      jnp.log1p(snr_proxy), params[..., 5],
                      params[..., 8], params[..., 9] + params[..., 10]],
                     axis=-1)


def energy_features(seg: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, L] whitened strain segments -> [..., 12] excess-power stats.

    Whitened detector noise is unit-variance white, so sum(x**2) over a
    window of w samples has mean w and std sqrt(2 w); the excess over that
    floor is (nearly) the matched-filter SNR**2 of whatever signal power
    lies inside the window. Computing it explicitly at three merger-centered
    window scales (full / quarter / sixteenth segment), per detector plus
    network-summed, hands the net the sufficient statistic the conv stem
    would otherwise have to learn x**2 pooling to recover — the [0, 0.1)
    target-separation bin is decided by exactly this quantity (VERDICT r2
    weak-#4; reference physics feature extractor role,
    src/ahsd/core/priority_net.py:186-247)."""
    length = seg.shape[-1]
    feats = []
    for w in (length, length // 4, length // 16):
        lo = (length - w) // 2
        e = jnp.sum(seg[..., lo:lo + w] ** 2, axis=-1)        # [..., 3]
        z = (e - w) / jnp.sqrt(2.0 * w)                       # noise z-score
        feats.append(jnp.asinh(z))
        feats.append(jnp.asinh(jnp.sum(z, axis=-1, keepdims=True)
                               / jnp.sqrt(3.0)))
    return jnp.concatenate(feats, axis=-1)


class SegmentEncoder(nn.Module):
    """[.., 3, SEG_LEN] whitened strain segment -> [.., width] embedding."""
    width: int = 64

    @nn.compact
    def __call__(self, seg):
        h = jnp.swapaxes(seg, -1, -2)               # [.., T, 3]
        for feat, k, s in ((16, 32, 4), (32, 16, 4), (64, 8, 4)):
            h = nn.gelu(nn.Conv(feat, kernel_size=(k,), strides=(s,),
                                padding="VALID")(h))
        h = jnp.concatenate([h.mean(axis=-2), h.max(axis=-2)], axis=-1)
        return nn.gelu(nn.Dense(self.width)(h))


def pair_time_features(params: jnp.ndarray, mask: jnp.ndarray,
                       snr_est: jnp.ndarray,
                       window_s: float = 0.25) -> jnp.ndarray:
    """[B,n,11] params + [B,n] mask + [B,n] snr_est -> [B,n,3] per-candidate
    time-crowding features (v7, VERDICT r4 weak-#3 "Δt-conditioned head").

    The excess-power channel integrates |d|² in merger-centered windows, so
    when two candidate mergers fall inside the same ±window the energy
    statistic double-counts both signals and its per-candidate SNR estimate
    is corrupted — exactly the close-pair regime. Features:
      0: asinh(min |Δt| / window) to the nearest other live candidate
      1: number of other live candidates within ±window
      2: asinh(expected contaminating SNR/8): Σ_j≠i snr_est_j ·
         max(0, 1 − |Δt_ij|/window)  (triangular overlap kernel)
    so the attention stack can condition channel trust on crowding instead
    of inferring it from raw t_c differences."""
    t = params[..., 8]
    dt = jnp.abs(t[:, :, None] - t[:, None, :])
    other = (mask[:, :, None] * mask[:, None, :]) \
        * (1.0 - jnp.eye(t.shape[1])[None])
    dt_live = jnp.where(other > 0, dt, jnp.inf)
    min_dt = jnp.clip(jnp.min(dt_live, axis=-1), 0.0, 10.0)
    n_close = jnp.sum((dt_live < window_s), axis=-1)
    contam = jnp.sum(other * jnp.maximum(0.0, 1.0 - dt / window_s)
                     * snr_est[:, None, :], axis=-1)
    return jnp.stack([jnp.asinh(min_dt / window_s),
                      n_close.astype(jnp.float32),
                      jnp.asinh(contam / 8.0)], axis=-1)


class PriorityNet(nn.Module):
    d_model: int = 64
    n_heads: int = 4
    n_layers: int = 2
    use_energy: bool = False    # v4+: excess-power features + aux SNR head
    use_snr_est: bool = False   # v5+: physics expected-SNR input feature
    use_dt: bool = False        # v7: time-crowding features (pair Δt)
    residual_snr: bool = False  # v7: score = head + w·snr_norm (oracle
                                # residual: start AT the params-channel
                                # oracle, learn data-driven corrections)

    @nn.compact
    def __call__(self, segments: jnp.ndarray, params: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 with_aux: bool = False,
                 snr_est: Optional[jnp.ndarray] = None):
        """segments [B, n, 3, SEG_LEN]; params [B, n, 11]; mask [B, n]
        (1 = real candidate); snr_est [B, n] physics-computed expected
        network SNR of each candidate (signal_snr_amp_only on the
        candidate params — the full amplitude/antenna/PSD chain, so unlike
        the Mc^(5/6)/d proxy it resolves sky- and inclination-driven
        loudness differences; v5, VERDICT r2 weak-#4). Returns
        (priority [B, n], sigma [B, n]), plus an auxiliary asinh(SNR/8)
        regression [B, n] when with_aux."""
        b, n = params.shape[:2]
        seg_feat = SegmentEncoder(self.d_model)(segments)     # [B, n, d]
        phys = nn.gelu(nn.Dense(self.d_model)(physics_features(params)))
        tok = seg_feat + phys
        if self.use_energy:
            tok = tok + nn.gelu(nn.Dense(self.d_model, name="energy_proj")(
                energy_features(segments)))
        snr_norm = None
        if self.use_snr_est and snr_est is not None:
            live = snr_est if mask is None else jnp.where(mask > 0,
                                                          snr_est, 0.0)
            nmax = jnp.max(live, axis=-1, keepdims=True)
            snr_norm = snr_est / jnp.maximum(nmax, 1e-6)
            sf = jnp.stack([jnp.asinh(snr_est / 8.0), snr_norm], axis=-1)
            tok = tok + nn.gelu(nn.Dense(self.d_model, name="snr_proj")(sf))
        if self.use_dt and snr_est is not None and mask is not None:
            tok = tok + nn.gelu(nn.Dense(self.d_model, name="dt_proj")(
                pair_time_features(params, mask, snr_est)))

        attn_mask = None
        if mask is not None:
            attn_mask = (mask[:, None, None, :] > 0) \
                & (mask[:, None, :, None] > 0)
        for _ in range(self.n_layers):
            h = nn.LayerNorm()(tok)
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.n_heads, qkv_features=self.d_model)(
                h, h, mask=attn_mask)
            tok = tok + h
            h = nn.LayerNorm()(tok)
            tok = tok + nn.Dense(self.d_model)(nn.gelu(
                nn.Dense(2 * self.d_model)(h)))

        head_init = nn.initializers.zeros if self.residual_snr \
            else nn.initializers.lecun_normal()
        score = nn.Dense(1, name="priority_head",
                         kernel_init=head_init)(tok)[..., 0]
        if self.residual_snr and snr_norm is not None:
            # oracle-residual parameterization: snr_norm is an unbiased
            # estimate of the target (snr/max snr) up to candidate-param
            # jitter, so the score STARTS at the params-channel oracle and
            # the head only has to learn the data-driven correction —
            # instead of rediscovering the identity map through the
            # feature stack (close-pair bin plateaued at 0.685 with
            # snr_est as a mere input feature, reports/priority_eval_v6*)
            res_w = self.param("res_w", nn.initializers.ones, ())
            score = score + res_w * snr_norm
        sigma = nn.softplus(nn.Dense(1, name="uncertainty_head")(tok)[..., 0]) \
            + 1e-3
        # affine output calibration (reference OutputCalibrator hook)
        gain = self.param("cal_gain", nn.initializers.ones, ())
        bias = self.param("cal_bias", nn.initializers.zeros, ())
        score = gain * score + bias
        if mask is not None:
            score = jnp.where(mask > 0, score, -1e9)
        if with_aux:
            aux = nn.Dense(1, name="snr_head")(tok)[..., 0] \
                if self.use_energy else jnp.zeros_like(score)
            return score, sigma, aux
        return score, sigma


def ranking_loss(scores: jnp.ndarray, targets: jnp.ndarray,
                 sigma: jnp.ndarray, mask: jnp.ndarray,
                 margin_scale: float = 1.0,
                 margin_floor: float = 0.02,
                 aux: Optional[jnp.ndarray] = None,
                 snr: Optional[jnp.ndarray] = None,
                 close_boost: float = 0.0) -> jnp.ndarray:
    """Pairwise ADAPTIVE-margin ranking + MSE + uncertainty calibration
    (reference AdaptiveRankingLoss + PriorityLoss semantics,
    priority_net.py:358-538), fully vectorized over candidate pairs.

    Adaptive margin: each pair's required score gap scales with its TARGET
    gap (margin_scale·|Δtarget| + floor). A fixed margin lets near-tie
    pairs — the [0, 0.1) loudness-separation bin where the r2 evaluation
    measured chance accuracy — hide inside one global slack; the
    proportional margin keeps gradient on exactly those pairs without
    over-penalizing genuinely ambiguous orderings (VERDICT r2 weak-#4).

    Uncertainty term: heteroscedastic NLL on a STOP-GRADIENT error, so σ
    must track |score − target| without the term shrinking the scores
    themselves (the reference trains an explicit uncertainty-calibration
    loss, priority_net.py:414-538; the r2 head trained against the live
    error and collapsed to a constant — corr −0.004)."""
    import jax

    pair_mask = (mask[:, :, None] * mask[:, None, :])
    dt = targets[:, :, None] - targets[:, None, :]         # target diffs
    ds = scores[:, :, None] - scores[:, None, :]
    want_higher = (dt > 0).astype(jnp.float32) * pair_mask
    margin = margin_scale * jnp.abs(dt) + margin_floor
    # close-pair boost (v6): the adaptive margin keeps near-tie pairs from
    # over-penalization but also starves them of gradient — the [0, 0.1)
    # separation bin plateaued at 0.665-0.685 pairwise (VERDICT r3
    # weak-#4). Upweighting pairs by 1 + boost·e^{-|Δtarget|/0.1}
    # concentrates the ranking gradient exactly there.
    pair_w = want_higher * (1.0 + close_boost
                            * jnp.exp(-jnp.abs(dt) / 0.1))
    rank_term = jnp.sum(pair_w * jnp.maximum(0.0, margin - ds)) \
        / jnp.maximum(jnp.sum(pair_w), 1.0)

    mse = jnp.sum(mask * (scores - targets) ** 2) \
        / jnp.maximum(jnp.sum(mask), 1.0)

    # heteroscedastic NLL against the DETACHED error: the optimum is
    # σ = |err| per candidate, i.e. a σ that discriminates easy from hard
    err2 = jax.lax.stop_gradient((scores - targets) ** 2)
    unc = jnp.sum(mask * (0.5 * err2 / sigma ** 2 + jnp.log(sigma))) \
        / jnp.maximum(jnp.sum(mask), 1.0)

    total = rank_term + 0.5 * mse + 0.3 * unc
    if aux is not None and snr is not None:
        # auxiliary RAW network-SNR regression (asinh-compressed): richer
        # supervision than the event-normalized target alone — near-tie
        # normalized pairs can still differ in absolute loudness
        aux_t = jnp.asinh(snr / 8.0)
        total = total + 0.2 * (jnp.sum(mask * (aux - aux_t) ** 2)
                               / jnp.maximum(jnp.sum(mask), 1.0))
    return total


def rank_uncertainty(scores: jnp.ndarray, sigma: jnp.ndarray,
                     mask: jnp.ndarray, key, n_mc: int = 256) -> jnp.ndarray:
    """Per-candidate expected RANK displacement [B, n] under the head's
    score uncertainty: scores_i ~ N(score_i, sigma_i^2), Monte-Carlo over
    n_mc perturbed score vectors, E|rank(perturbed) - rank(mean)|.

    This is the post-hoc map from the heteroscedastic head (trained to
    track |score error|, reference loss semantics priority_net.py:414-538)
    to the operational quantity — how far this candidate's extraction
    slot may move. A candidate with large sigma but large score gaps to
    its neighbors has a STABLE rank; a mid-pack candidate inside a tight
    cluster is rank-fragile even at modest sigma. Raw sigma cannot see
    the gaps, which is why corr(sigma, |rank error|) measured 0.075
    (VERDICT r3 weak-#4); the propagated displacement can."""
    import jax

    b, n = scores.shape
    eps = jax.random.normal(key, (n_mc, b, n))
    pert = scores[None] + sigma[None] * eps
    neg_inf = jnp.where(mask > 0, 0.0, -1e9)
    # rank of candidate i = number of live candidates scoring above it
    def ranks(s):
        s = s + neg_inf
        return jnp.sum((s[..., None, :] > s[..., :, None])
                       & (mask[..., None, :] > 0), axis=-1)
    base = ranks(scores)                       # [B, n]
    disp = jnp.abs(jax.vmap(ranks)(pert) - base[None]).astype(jnp.float32)
    return jnp.mean(disp, axis=0) * mask


def rank_by_score(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Descending-priority candidate order; masked slots last."""
    return jnp.argsort(-jnp.where(mask > 0, scores, -jnp.inf), axis=-1)


def loudness_fallback(params: jnp.ndarray) -> jnp.ndarray:
    """SNR-proxy ranking when no trained PriorityNet is available
    (reference fallback: priority_net.py:946; SURVEY.md §7 notes the
    learned ranker is statistically replaceable by this proxy)."""
    return physics_features(params)[..., 4]       # log1p(snr_proxy)
