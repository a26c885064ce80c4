"""Asymptotically-exact importance-sampling correction of the amortized
posterior (DINGO-IS style).

Reference machinery (src/ahsd/inference/importance.py): closed-form
training prior; mass-symmetrized proposal density log[q(m1,m2)+q(m2,m1)];
per-sample likelihoods in a spawn-Pool of bilby workers (one LAL waveform
per sample, :142-159); adaptive tempered β-ladder with per-rung ESS≥0.20
bisection and GMM rejuvenation; systematic resampling; IS diagnostics.

TPU redesign: the likelihood is the SAME jittable waveform kernel the
simulator uses, so per-sample L(θ) is one vmapped batch — the reference's
process pool disappears (SURVEY.md §7 item 8). The Whittle log-likelihood
ratio in whitened units is
    log L(θ) − log L(0) = Re⟨d_w, h_w(θ)⟩ − ½‖h_w(θ)‖²,
with ⟨·,·⟩ the plain complex dot product over (detector, rfft-bin) in the
framework's whitened normalization (‖h_w‖ = matched-filter SNR). The
tempered ladder + GMM rejuvenation is kept as the hard-posterior fallback.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from posteriflow_tpu.physics.constants import N_SAMPLES
from posteriflow_tpu.physics.psd import default_network_asd
from posteriflow_tpu.physics.simulator import signal_white_fd
from posteriflow_tpu.prior import log_prior_bbh


def data_white_fd(strain_white_td: jnp.ndarray) -> jnp.ndarray:
    """Whitened TD strain [..., n_det, T] -> whitened FD in the simulator's
    normalization (inverse of whiten.fd_white_to_td)."""
    return jnp.fft.rfft(strain_white_td, axis=-1) / jnp.sqrt(N_SAMPLES / 2.0)


def make_log_likelihood(strain_white_td: np.ndarray,
                        asd: Optional[jnp.ndarray] = None,
                        residual_fd: Optional[jnp.ndarray] = None):
    """Jitted batched Whittle log-likelihood ratio log L(θ) − log L(0).

    strain_white_td: [n_det, T] whitened data. residual_fd subtracts
    already-extracted signals (the overlap subtract-and-reinfer loop)."""
    d_w = data_white_fd(jnp.asarray(strain_white_td))
    if residual_fd is not None:
        d_w = d_w - residual_fd
    if asd is None:
        asd = default_network_asd()

    @jax.jit
    def log_l(theta_batch: jnp.ndarray) -> jnp.ndarray:
        def one(theta):
            h_w = signal_white_fd(theta, asd)              # [n_det, F]
            match = jnp.sum(jnp.real(d_w * jnp.conj(h_w)))
            return match - 0.5 * jnp.sum(jnp.abs(h_w) ** 2)
        return jax.vmap(one)(theta_batch)

    return log_l


def symmetrized_log_q(engine, context: jnp.ndarray, rank: int,
                      theta: jnp.ndarray) -> jnp.ndarray:
    """Mass-symmetrized proposal density in PHYSICAL units:
    log[(q(m1,m2) + q(m2,m1))/2] — the amortized flow only ever sees
    m1 ≥ m2, but the likelihood is symmetric (reference: importance.py:69-95).
    """
    model, scaler = engine.model, engine.scaler
    r = jnp.full((theta.shape[0],), rank, dtype=jnp.int32)
    ctx = jnp.broadcast_to(context, (theta.shape[0], context.shape[-1]))

    def log_q_phys(t):
        nll = model.apply(engine.params, ctx, t, r,
                          method=type(model).nll_from_context)
        return -nll + scaler.log_abs_det_jacobian(t)

    swapped = theta.at[:, 0].set(theta[:, 1]).at[:, 1].set(theta[:, 0])
    lq = jnp.stack([log_q_phys(theta), log_q_phys(swapped)])
    return jax.scipy.special.logsumexp(lq, axis=0) - jnp.log(2.0)


@dataclasses.dataclass
class ISResult:
    samples: np.ndarray
    weights: np.ndarray          # normalized
    log_weights: np.ndarray
    ess: float
    efficiency: float
    log_evidence_ratio: float    # log Z/L(0) estimate
    n_stages: int = 1
    beta_ladder: Optional[list] = None


def importance_correct(engine, context: jnp.ndarray, rank: int,
                       samples: np.ndarray, log_q: np.ndarray,
                       railed: np.ndarray, log_l_fn: Callable,
                       log_prior_fn: Callable = None,
                       min_ess_frac: float = 0.2,
                       max_stages: int = 25,
                       seed: int = 0) -> ISResult:
    """Exact correction of amortized samples against the true likelihood.

    Direct self-normalized IS first; if ESS/n < min_ess_frac, fall back to
    the adaptive tempered β-ladder with GMM rejuvenation in the slow
    (log-mass / log-distance) space (reference: importance.py:204-328).
    """
    if log_prior_fn is None:
        log_prior_fn = jax.jit(jax.vmap(log_prior_bbh))

    keep = ~np.asarray(railed)                 # exclude railed draws
    theta = jnp.asarray(samples[keep], dtype=jnp.float32)
    lq = np.asarray(
        symmetrized_log_q(engine, context, rank, theta))
    ll = np.asarray(log_l_fn(theta))
    lp = np.asarray(log_prior_fn(theta))

    log_w = ll + lp - lq
    log_w = np.where(np.isfinite(log_w), log_w, -np.inf)
    res = _finalize(np.asarray(theta), log_w)
    if res.ess / len(theta) >= min_ess_frac:
        return res

    # ── tempered fallback ─────────────────────────────────────────────────────
    rng = np.random.default_rng(seed)
    cur = np.asarray(theta)
    cur_ll, cur_lp, cur_lq = ll, lp, lq
    beta = 0.0
    ladder = [0.0]
    min_stage_ess = float(len(cur))     # honest ESS = ladder bottleneck
                                        # (post-resample weights are flat,
                                        # which would overstate it)
    for stage in range(max_stages):
        # bisect the largest β-step keeping per-rung ESS ≥ min_ess_frac
        lo, hi = beta, 1.0
        for _ in range(30):
            mid = 0.5 * (lo + hi)
            lw = (mid - beta) * cur_ll + (cur_lp - cur_lq)
            if _ess(lw) / len(cur) >= min_ess_frac:
                lo = mid
            else:
                hi = mid
        new_beta = lo if lo > beta + 1e-6 else min(beta + 0.05, 1.0)
        lw = (new_beta - beta) * cur_ll + (cur_lp - cur_lq)
        w = _norm_w(lw)
        min_stage_ess = min(min_stage_ess, float(1.0 / np.sum(w ** 2)))
        idx = _systematic_resample(w, rng)
        cur = cur[idx]

        if new_beta >= 1.0 - 1e-9:
            ladder.append(1.0)
            final = _finalize(cur, np.zeros(len(cur)))
            final.ess = min_stage_ess
            final.efficiency = min_stage_ess / len(cur)
            final.n_stages = stage + 2
            final.beta_ladder = ladder
            return final

        # GMM rejuvenation in slow space (log m1, log m2, log d) with the
        # reference's ×1.3 widening of component covariances
        cur = _gmm_rejuvenate(cur, rng)
        t = jnp.asarray(cur, dtype=jnp.float32)
        cur_ll = np.asarray(log_l_fn(t))
        cur_lp = np.asarray(log_prior_fn(t))
        cur_lq = np.zeros(len(cur))        # rejuvenated draws ~ tempered mix
        beta = new_beta
        ladder.append(beta)

    final = _finalize(cur, (1.0 - beta) * cur_ll + cur_lp - cur_lq)
    final.ess = min(final.ess, min_stage_ess)
    final.efficiency = final.ess / len(cur)
    final.n_stages = max_stages + 1
    final.beta_ladder = ladder
    return final


def _ess(log_w: np.ndarray) -> float:
    w = _norm_w(log_w)
    return float(1.0 / np.sum(w ** 2))


def _norm_w(log_w: np.ndarray) -> np.ndarray:
    m = np.max(log_w[np.isfinite(log_w)]) if np.isfinite(log_w).any() else 0.0
    w = np.exp(np.clip(log_w - m, -745, 0))
    s = w.sum()
    return w / s if s > 0 else np.full_like(w, 1.0 / len(w))


def _finalize(theta: np.ndarray, log_w: np.ndarray) -> ISResult:
    w = _norm_w(log_w)
    ess = float(1.0 / np.sum(w ** 2))
    finite = log_w[np.isfinite(log_w)]
    log_z = float(np.log(np.mean(np.exp(finite - finite.max())))
                  + finite.max()) if len(finite) else -np.inf
    return ISResult(samples=theta, weights=w, log_weights=log_w, ess=ess,
                    efficiency=ess / len(theta), log_evidence_ratio=log_z)


def _systematic_resample(w: np.ndarray, rng) -> np.ndarray:
    n = len(w)
    positions = (rng.uniform() + np.arange(n)) / n
    return np.searchsorted(np.cumsum(w), positions).clip(0, n - 1)


def _gmm_rejuvenate(theta: np.ndarray, rng, n_comp: int = 10,
                    widen: float = 1.3) -> np.ndarray:
    """Refresh resampled duplicates: fit a GMM in (log m1, log m2, log d),
    redraw those slow coordinates, keep fast coordinates + add jitter
    (reference: importance.py:276-328 rejuvenation step)."""
    from sklearn.mixture import GaussianMixture
    out = theta.copy()
    slow = np.log(np.maximum(theta[:, :3], 1e-6))
    n_comp = min(n_comp, max(1, len(theta) // 20))
    try:
        gm = GaussianMixture(n_components=n_comp, covariance_type="full",
                             random_state=int(rng.integers(2**31)))
        gm.fit(slow)
        gm.covariances_ *= widen ** 2
        new_slow, _ = gm.sample(len(theta))
        order = rng.permutation(len(theta))
        out[:, :3] = np.exp(new_slow[order])
        m1 = np.maximum(out[:, 0], out[:, 1])
        m2 = np.minimum(out[:, 0], out[:, 1])
        out[:, 0], out[:, 1] = m1, m2
    except Exception:
        out[:, :3] *= np.exp(0.05 * rng.standard_normal((len(out), 3)))
    return out
