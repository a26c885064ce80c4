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
hard-posterior fallback is a tempered SMC sampler whose rejuvenation
moves are batched likelihood calls (one device dispatch per MCMC step).
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
    # The strain and residual enter the jitted program as ARGUMENTS, not
    # closure captures: jit constant-folds captured device arrays, which
    # forces a device→host copy — unimplemented for complex arrays on the
    # experimental axon TPU backend (and a silent recompile hazard
    # elsewhere). The rfft also happens inside the jit (eager rfft runs
    # per-primitive on axon: UNIMPLEMENTED).
    strain = jnp.asarray(strain_white_td)
    if asd is None:
        asd = default_network_asd()
    # residual crosses the jit boundary as float real/imag planes: the
    # axon backend cannot even materialize a complex array eagerly
    n_det, n_td = np.shape(strain_white_td)
    if residual_fd is not None:
        res_ri = jax.jit(lambda r: jnp.stack([jnp.real(r),
                                              jnp.imag(r)]))(residual_fd)
    else:
        res_ri = np.zeros((2, n_det, n_td // 2 + 1), dtype=np.float32)

    def _core(theta_batch, strain_td, res):
        d_w = data_white_fd(strain_td) - (res[0] + 1j * res[1])

        def one(theta):
            h_w = signal_white_fd(theta, asd)              # [n_det, F]
            match = jnp.sum(jnp.real(d_w * jnp.conj(h_w)))
            return match - 0.5 * jnp.sum(jnp.abs(h_w) ** 2)
        return jax.vmap(one)(theta_batch)

    _log_l = jax.jit(_core)

    def log_l(theta_batch: jnp.ndarray) -> jnp.ndarray:
        return _log_l(theta_batch, strain, res_ri)

    # expose the unjitted core + its device arguments so importance_correct
    # can FUSE the whole SMC rejuvenation sweep (likelihood + prior + flow
    # density + Metropolis, all n_mcmc steps) into one device program
    log_l.core = _core
    log_l.device_args = (strain, res_ri)
    log_l.is_marginalized = False
    return log_l


def make_marginalized_log_likelihood(strain_white_td: np.ndarray,
                                     asd: Optional[jnp.ndarray] = None,
                                     residual_fd: Optional[jnp.ndarray]
                                     = None):
    """Whittle log-likelihood ratio with coalescence PHASE and TIME
    analytically marginalized (the reference's GravitationalWaveTransient
    setup, importance.py:103-139): the returned log L(θ) is independent of
    θ[phase] and θ[geocent_time].

    Why: the flow's ~10 ms t_c posterior width spans many interference
    fringes of the full likelihood, so unmarginalized IS weights have
    near-zero ESS no matter how good the flow is. Marginalization:
      phase — (2,2)-dominant waveform ⇒ ∫ dφ_c/2π e^{Re[z e^{-2iφ_c}]}
               = I₀(|z|);
      time  — the complex matched-filter series z(t) over all circular
               shifts via one inverse FFT, averaged uniformly over the
               shifts inside the t_c PRIOR window [_T_OFF_LO, _T_OFF_HI]
               (matching log_prior_bbh — marginalizing over the whole
               segment would let likelihood peaks outside the prior
               support leak a θ-dependent offset into the evidence).
    """
    strain = jnp.asarray(strain_white_td)
    if asd is None:
        asd = default_network_asd()
    n_det, n_td = np.shape(strain_white_td)
    if residual_fd is not None:
        res_ri = jax.jit(lambda r: jnp.stack([jnp.real(r),
                                              jnp.imag(r)]))(residual_fd)
    else:
        res_ri = np.zeros((2, n_det, n_td // 2 + 1), dtype=np.float32)

    # shift index j ↔ t_off = j/fs (wrapping: j ≥ n/2 ↔ (j−n)/fs); keep
    # only shifts inside the t_c prior window so the marginal matches the
    # prior actually used in the IS weights
    from posteriflow_tpu.physics.constants import SAMPLE_RATE
    from posteriflow_tpu.prior import _T_OFF_HI, _T_OFF_LO
    _j = np.arange(n_td)
    _t_of_j = np.where(_j < n_td // 2, _j, _j - n_td) / float(SAMPLE_RATE)
    _in_window = jnp.asarray((_t_of_j >= _T_OFF_LO) & (_t_of_j <= _T_OFF_HI))
    _n_window = float(np.sum((_t_of_j >= _T_OFF_LO) & (_t_of_j <= _T_OFF_HI)))

    def _core(theta_batch, strain_td, res):
        d_w = data_white_fd(strain_td) - (res[0] + 1j * res[1])

        def one(theta):
            th0 = theta.at[7].set(0.0).at[8].set(0.0)
            h_w = signal_white_fd(th0, asd)                # [n_det, F]
            x = jnp.sum(d_w * jnp.conj(h_w), axis=0)       # [F] complex
            pad = jnp.zeros((n_td - x.shape[0],), dtype=x.dtype)
            z = jnp.fft.ifft(jnp.concatenate([x, pad])) * n_td
            absz = jnp.abs(z)                              # [T] all shifts
            log_i0 = jnp.log(jax.scipy.special.i0e(absz)) + absz
            log_i0 = jnp.where(_in_window, log_i0, -jnp.inf)
            log_mean = (jax.scipy.special.logsumexp(log_i0)
                        - jnp.log(_n_window))
            return log_mean - 0.5 * jnp.sum(jnp.abs(h_w) ** 2)
        return jax.vmap(one)(theta_batch)

    _log_l = jax.jit(_core)

    def log_l(theta_batch: jnp.ndarray) -> jnp.ndarray:
        return _log_l(theta_batch, strain, res_ri)

    log_l.core = _core
    log_l.device_args = (strain, res_ri)
    log_l.is_marginalized = True
    return log_l


def symmetrized_log_q(engine, context: jnp.ndarray, rank: int,
                      theta: jnp.ndarray,
                      pad_block: int = 4096) -> jnp.ndarray:
    """Mass-symmetrized proposal density in PHYSICAL units:
    log[(q(m1,m2) + q(m2,m1))/2] — the amortized flow only ever sees
    m1 ≥ m2, but the likelihood is symmetric (reference: importance.py:69-95).
    """
    model, scaler = engine.model, engine.scaler

    # jitted (the eager per-primitive path on the experimental axon TPU
    # backend hits UNIMPLEMENTED inside the flow) and PADDED to a fixed
    # batch shape (one compiled program across varying sample counts)
    @jax.jit
    def _log_q_phys(t, ctx, r):
        nll = model.apply(engine.params, ctx, t, r,
                          method=type(model).nll_from_context)
        return -nll + scaler.log_abs_det_jacobian(t)

    def log_q_phys(t):
        ctx = jnp.broadcast_to(context, (t.shape[0], context.shape[-1]))
        r = jnp.full((t.shape[0],), rank, dtype=jnp.int32)
        return _log_q_phys(t, ctx, r)

    lqp = _padded(log_q_phys, pad_block)
    swapped = theta.at[:, 0].set(theta[:, 1]).at[:, 1].set(theta[:, 0])
    lq = jnp.stack([lqp(theta), lqp(swapped)])
    # SUM, not average: pipeline folds samples into m1 >= m2 by swapping,
    # and the density of the folded variable is q(m1,m2) + q(m2,m1)
    # (matches the reference's unaveraged convention, importance.py:69-95).
    return jax.scipy.special.logsumexp(lq, axis=0)


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
    converged: bool = True       # tempered ladder reached beta = 1
    mcmc_acceptance: Optional[list] = None   # per-stage SMC move acceptance


def importance_correct(engine, context: jnp.ndarray, rank: int,
                       samples: np.ndarray, log_q: np.ndarray,
                       railed: np.ndarray, log_l_fn: Callable,
                       log_prior_fn: Callable = None,
                       min_ess_frac: float = 0.2,
                       ladder_target_frac: float = 0.5,
                       max_stages: int = 25,
                       marginalized: bool = False,
                       pad_block: int = 4096,
                       seed: int = 0) -> ISResult:
    """Exact correction of amortized samples against the true likelihood.

    Direct self-normalized IS first; if ESS/n < min_ess_frac, fall back to
    a tempered SMC sampler (_tempered_is) on the geometric path between the
    flow proposal g0 and the target L·π,

        π_β(θ) ∝ g0(θ)^(1−β) · [L(θ)·π(θ)]^β,

    with adaptive β steps, systematic resampling, and batched random-walk
    Metropolis rejuvenation (Del Moral et al. 2006). The evidence telescopes
    over the incremental weights; a run that reaches β = 1 returns a
    posterior-distributed cloud whose final-rung ESS is held at the target
    fraction by construction. (This replaced the round-2 re-anchored
    GMM-rejuvenation ladder: its resampled clouds degenerated to ~20-90
    unique particles on sharp posteriors, each GMM refit barely moved γ,
    and the gw170608-like razor-Mc case burned 25 stages without
    converging — measured 2-3% efficiency at 15+ stages.)

    marginalized=True declares log_l_fn phase/time-marginalized (the
    production make_marginalized_log_likelihood). The proposal density is
    then collapsed to a consistent 11-D density whose slow block is the
    flow's marginal and whose fast dims carry the flat priors (see the
    inline note), and the SMC walk moves only the 9 slow dims — the
    fast-dim density ratio π(φ,t|·)/q(φ,t|·) otherwise rides every weight
    as pure variance (measured r2: 2.2% efficiency, 15-rung ladders).
    """
    if log_prior_fn is None:
        log_prior_fn = jax.jit(jax.vmap(log_prior_bbh))
    # capture the fused-dispatch hooks before the padding wrapper hides them
    ll_core = getattr(log_l_fn, "core", None)
    ll_device_args = getattr(log_l_fn, "device_args", None)
    # fixed-shape evaluation: every distinct batch size would otherwise
    # compile a fresh 4096-waveform likelihood program (minutes each on
    # the tunneled chip); pad to one canonical size and slice
    log_l_fn = _padded(log_l_fn, pad_block)
    log_prior_fn = _padded(log_prior_fn, pad_block)

    keep = ~np.asarray(railed)                 # exclude railed draws
    theta = jnp.asarray(samples[keep], dtype=jnp.float32)
    lq = np.asarray(
        symmetrized_log_q(engine, context, rank, theta,
                          pad_block=pad_block))
    ll = np.asarray(log_l_fn(theta))
    lp = np.asarray(log_prior_fn(theta))

    if marginalized:
        from scipy.stats import gaussian_kde

        from posteriflow_tpu.prior import _T_OFF_HI, _T_OFF_LO
        tc = np.asarray(theta[:, 8], np.float64)
        kde_tc = gaussian_kde(tc + 1e-9 * np.random.default_rng(seed)
                              .standard_normal(len(tc)))
        # consistent 11-D proposal density: slow dims keep the flow's
        # marginal q_joint·2π/KDE(t) (factor out the ~uniform φ_c
        # conditional and the KDE t_c marginal, reference
        # importance.py:192-202), fast dims are REASSIGNED the flat prior
        # (1/2π)(1/Δt) — the integrand L_marg·π is fast-independent, so
        # any fast-dim proposal is valid, but the density used must be a
        # proper 11-D density or logZ inherits a constant bias:
        #   q11 = [q_joint·2π/KDE]·(1/2π)(1/Δt) = q_joint/(KDE·Δt).
        # (The previous +log 2π form left every marginalized logZ low by
        # exactly log(2π·Δt) ≈ 2.94 nats.)
        lg0_corr = (-np.log(np.maximum(kde_tc(tc), 1e-300))
                    - np.log(_T_OFF_HI - _T_OFF_LO))
        lq = lq + lg0_corr
    else:
        lg0_corr = np.zeros(len(theta))

    log_w = ll + lp - lq
    log_w = np.where(np.isfinite(log_w), log_w, -np.inf)
    res = _finalize(np.asarray(theta), log_w)
    if res.ess / len(theta) >= min_ess_frac:
        return res

    def log_g0_fn(th):
        out = np.asarray(symmetrized_log_q(
            engine, context, rank, jnp.asarray(th, jnp.float32),
            pad_block=pad_block), np.float64)
        if marginalized:
            from posteriflow_tpu.prior import _T_OFF_HI, _T_OFF_LO
            out = out - np.log(np.maximum(kde_tc(np.asarray(th[:, 8],
                                                            np.float64)),
                                          1e-300)) \
                - np.log(_T_OFF_HI - _T_OFF_LO)
        return out

    theta_np = np.asarray(theta, np.float64)
    lq64, ll64, lp64 = (lq.astype(np.float64), ll.astype(np.float64),
                        lp.astype(np.float64))
    lg0_corr = np.asarray(lg0_corr, np.float64)

    move_fn = None
    if ll_core is not None and ll_device_args is not None:
        # fused device rejuvenation needs ONE static cloud size (every
        # distinct n compiles a fresh program through the tunnel):
        # bootstrap the equal-weight entry cloud to exactly pad_block
        n0 = len(theta_np)
        if n0 != pad_block:
            rng0 = np.random.default_rng(seed + 1)
            if n0 > pad_block:
                idx0 = rng0.choice(n0, pad_block, replace=False)
            else:
                idx0 = np.concatenate([
                    np.arange(n0),
                    rng0.integers(0, n0, pad_block - n0)])
            theta_np, lq64, ll64, lp64, lg0_corr = (
                theta_np[idx0], lq64[idx0], ll64[idx0], lp64[idx0],
                lg0_corr[idx0])
        move_fn = _make_fused_move(engine, context, rank, ll_core,
                                   ll_device_args, marg=marginalized)

    return _tempered_is(theta_np, lq64, ll64, lp64,
                        log_l_fn, log_prior_fn, log_g0_fn=log_g0_fn,
                        ladder_target_frac=ladder_target_frac,
                        max_stages=max_stages, marginalized=marginalized,
                        move_fn=move_fn, lg0_corr=lg0_corr,
                        seed=seed)


def _tempered_is(theta: np.ndarray, lq: np.ndarray, ll: np.ndarray,
                 lp: np.ndarray, log_l_fn: Callable, log_prior_fn: Callable,
                 log_g0_fn: Callable = None,
                 ladder_target_frac: float = 0.5, max_stages: int = 25,
                 n_mcmc: int = 3, marginalized: bool = False,
                 move_fn: Callable = None, lg0_corr: np.ndarray = None,
                 seed: int = 0) -> ISResult:
    """Tempered SMC sampler (the importance_correct fallback; separable for
    direct testing against a synthetic likelihood).

    Del Moral et al. 2006 SMC on the fixed-anchor geometric path

        π_β(θ) ∝ g0(θ)^(1−β) · [L(θ)·π(θ)]^β,  β: 0 → 1,

    where g0 is the initial proposal (the flow; the prior in the synthetic
    tests). Per stage: the largest Δβ whose INCREMENTAL weights
    w ∝ exp(Δβ·[log Lπ − log g0]) keep ESS ≥ target·n (bisection, no new
    evaluations); evidence accumulates as
    log Ẑ += logsumexp(log W + Δβ·δ); systematic resampling; then n_mcmc
    batched random-walk Metropolis steps targeting π_β — each step is ONE
    vmapped likelihood batch + one flow-density batch, so rejuvenation
    rides the TPU instead of a host-side density refit. The walk runs in
    (log Mc, log q, log d, …) coordinates (acceptance carries the
    +log m1·m2·d Jacobian), with the m1 ≥ m2 fold as a reflecting log q ≤ 0
    boundary, and the step scale 2.38/√d · chol(cov) from the live cloud.

    Why this replaced the re-anchored GMM ladder: after resampling a
    degenerate cloud (~20-90 unique particles on a razor-Mc posterior) a
    GMM refit is fit to noise — measured γ ≈ 0.01-0.03 for 25 stages
    without converging on the gw170608-like case. MCMC moves keep the
    cloud π_β-distributed regardless of its unique-particle count, the
    incremental-weight telescope keeps the evidence estimate consistent,
    and a converged run ends with ESS ≥ target·n by construction.

    log_g0_fn(θ [N,11]) -> [N]: anchor density at NEW points (the MCMC
    proposals). Defaults to log_prior_fn — correct for the synthetic tests,
    which pass lq = log prior.

    move_fn, when given (built by _make_fused_move), replaces the host-side
    rejuvenation loop with ONE device dispatch per stage; lg0_corr is the
    per-particle constant it needs to stay in the host density convention.
    """
    from scipy.special import logsumexp as _lse
    rng = np.random.default_rng(seed)
    n = theta.shape[0]
    cur = theta.copy()
    cur_ll, cur_lp, cur_lg0 = ll.copy(), lp.copy(), lq.copy()
    cur_corr = (np.zeros(n) if lg0_corr is None
                else np.asarray(lg0_corr, np.float64))
    if log_g0_fn is None:
        log_g0_fn = log_prior_fn
    target = max(min(ladder_target_frac, 0.9), 0.05)

    beta = 0.0
    log_W = np.full(n, -np.log(n))             # normalized log-weights
    log_z = 0.0
    ladder = []
    converged = False
    acc_hist = []
    # between-stage Robbins-Monro proposal-scale adaptation: the 2.38/√d
    # optimal-RW factor assumes a Gaussian target; on razor-Mc posteriors
    # the measured acceptance at that scale is ~0.03-0.08, so each stage
    # multiplies the NEXT stage's step by exp(acc − 0.234) (clipped) —
    # adaptation across stages keeps every within-stage kernel exactly
    # π_β-invariant (the scale is fixed before the sweep starts)
    rw_scale = 1.0

    def _ess_frac(lw):
        w = _norm_w(lw)
        return float(1.0 / np.sum(w ** 2)) / n

    for _stage in range(max_stages):
        delta = cur_ll + cur_lp - cur_lg0      # log(L·π / g0), cached
        delta = np.where(np.isfinite(delta), delta, -np.inf)
        # largest Δβ keeping incremental ESS above target (the final hop
        # to β = 1 is accepted at a relaxed bar — it is still a valid SMC
        # increment, just a noisier one than target)
        rem = 1.0 - beta
        if _ess_frac(log_W + rem * delta) >= min(target, 0.1):
            dbeta = rem
        else:
            a, b = 0.0, rem
            for _ in range(40):
                mid = 0.5 * (a + b)
                if _ess_frac(log_W + mid * delta) >= target:
                    a = mid
                else:
                    b = mid
            dbeta = max(a, rem * 1e-4)
        # evidence increment: log Σ_i W_i exp(Δβ·δ_i)
        log_z += float(_lse(log_W + dbeta * delta))
        log_W = log_W + dbeta * delta
        log_W = log_W - float(_lse(log_W))
        beta += dbeta
        ladder.append(round(beta, 4))
        if beta >= 1.0 - 1e-9:
            converged = True
            break
        if _stage == max_stages - 1:
            # out of stages: exit with the WEIGHTED cloud at this β — a
            # final rejuvenation would be discarded-weight work and would
            # return a flat-weight cloud that hides the non-convergence
            # (ADVICE r2: keep samples and weights mutually consistent)
            break

        # resample + move (rejuvenate the cloud at π_β)
        idx = _systematic_resample(_norm_w(log_W), rng)
        cur, cur_ll, cur_lp, cur_lg0 = (cur[idx], cur_ll[idx], cur_lp[idx],
                                        cur_lg0[idx])
        cur_corr = cur_corr[idx]
        log_W = np.full(n, -np.log(n))
        x = _to_slow(cur, marg=marginalized)
        d_x = x.shape[1]
        # step covariance from the live cloud; scaled optimal RW factor
        cov = np.cov(x.T) + 1e-12 * np.eye(d_x)
        try:
            chol = np.linalg.cholesky((2.38 ** 2 / d_x) * cov)
        except np.linalg.LinAlgError:
            chol = np.diag(np.maximum(x.std(0), 1e-6)) * (2.38 / d_x ** 0.5)
        chol = rw_scale * chol
        if move_fn is not None:
            cur, cur_ll, cur_lp, cur_lg0, acc_frac = move_fn(
                cur, cur_ll, cur_lp, cur_lg0, cur_corr, beta, chol,
                int(rng.integers(2 ** 31 - 1)))
            acc_hist.append(round(acc_frac, 3))
            rw_scale = float(np.clip(rw_scale * np.exp(acc_frac - 0.234),
                                     0.05, 3.0))
            continue
        # x-space Jacobian of the current cloud (target_x = target_θ·m1m2d)
        jac = np.sum(np.log(np.maximum(cur[:, :3], 1e-10)), axis=1)
        log_tgt = (beta * (cur_ll + cur_lp) + (1.0 - beta) * cur_lg0 + jac)
        acc_frac = 0.0
        for _k in range(n_mcmc):
            xp = x + rng.standard_normal((n, d_x)) @ chol.T
            thp = _reassemble(xp, cur, marg=marginalized)
            llp = np.asarray(log_l_fn(thp), np.float64)
            lpp = np.asarray(log_prior_fn(thp), np.float64)
            lg0p = np.asarray(log_g0_fn(thp), np.float64)
            jacp = np.sum(np.log(np.maximum(thp[:, :3], 1e-10)), axis=1)
            log_tgt_p = beta * (llp + lpp) + (1.0 - beta) * lg0p + jacp
            # reflecting fold boundary: a proposal at log q > 0 would
            # unfold m1 < m2 — reject it (target mass 0 outside the fold)
            log_tgt_p = np.where(xp[:, 1] <= 0.0, log_tgt_p, -np.inf)
            log_tgt_p = np.where(np.isfinite(log_tgt_p), log_tgt_p, -np.inf)
            accept = np.log(rng.uniform(size=n)) < (log_tgt_p - log_tgt)
            acc_frac += float(np.mean(accept)) / n_mcmc
            cur = np.where(accept[:, None], thp, cur)
            x = np.where(accept[:, None], xp, x)
            cur_ll = np.where(accept, llp, cur_ll)
            cur_lp = np.where(accept, lpp, cur_lp)
            cur_lg0 = np.where(accept, lg0p, cur_lg0)
            log_tgt = np.where(accept, log_tgt_p, log_tgt)
        acc_hist.append(round(acc_frac, 3))
        rw_scale = float(np.clip(rw_scale * np.exp(acc_frac - 0.234),
                                 0.05, 3.0))

    final = _finalize(cur.astype(np.float32), log_W)
    final.n_stages = len(ladder)
    final.beta_ladder = ladder
    final.converged = converged
    # the telescoped SMC evidence. On a non-converged run (β < 1) this is
    # the PARTIAL normalizer log(Z_β/Z_0) — finite and monotone in β, but
    # not the full evidence; converged=False flags it.
    final.log_evidence_ratio = float(log_z)
    final.mcmc_acceptance = acc_hist
    return final


def _padded(fn, block: int):
    """Wrap a batched fn(theta [N, P]) -> [N] so every call evaluates at a
    multiple of `block` rows (padding with the first row), then slices.
    Keeps the jitted program count constant across varying batch sizes."""
    def wrapped(theta):
        theta = jnp.asarray(theta, dtype=jnp.float32)
        n = theta.shape[0]
        m = max(block, ((n + block - 1) // block) * block)
        if m != n:
            pad = jnp.broadcast_to(theta[:1], (m - n, theta.shape[1]))
            theta = jnp.concatenate([theta, pad])
        return fn(theta)[:n]
    return wrapped


# Slow-space walk coordinates for the SMC moves: (log Mc, log q, log d_L)
# on the mass/distance block, identity on the remaining params. The chirp
# mass is the likelihood's razor-thin direction (σ_Mc/Mc ~ 1e-3 on a
# BNS-band event) and the constant-Mc surface is CURVED in
# (log m1, log m2) — a covariance-scaled random walk cannot stay on it.
# In (log Mc, log q) the thin direction is an axis.
# Jacobian: det ∂(log Mc, log q)/∂(m1, m2) = 1/(m1·m2) exactly (the 0.2/M
# cross terms cancel), so the θ-space density correction stays
# −[log m1 + log m2 + log d] — computed from θ, not from x.
# marg=True drops the marginalized fast dims (phase=7, t_c=8): the walk is
# then 9-D and each particle keeps its own φ/t_c (the marginalized
# likelihood and prior are flat in them).
_N_LOG_DIMS = 3
def _slow_cols(p: int) -> np.ndarray:
    """Indices of the SLOW (non-marginalized) parameters of a P-dim set:
    everything except phase (7) and geocent_time (8). P=11 gives the 9
    aligned slow dims; P=15 appends the precession block (tilts +
    azimuths walk with the slow coordinates)."""
    return np.asarray([i for i in range(p) if i not in (7, 8)])


def _masses_to_x(m1: np.ndarray, m2: np.ndarray):
    """(m1, m2) -> (log Mc, log q), q = m2/m1 ∈ (0, 1] after folding."""
    mc = (m1 * m2) ** 0.6 / (m1 + m2) ** 0.2
    return np.log(mc), np.log(m2 / m1)


def _x_to_masses(lmc: np.ndarray, lq: np.ndarray):
    """(log Mc, log q) -> (m1, m2): M = Mc·q^{-3/5}(1+q)^{6/5}."""
    q = np.exp(lq)
    mc = np.exp(lmc)
    mtot = mc * q ** (-0.6) * (1.0 + q) ** 1.2
    m1 = mtot / (1.0 + q)
    return m1, q * m1


def _to_slow(theta: np.ndarray, marg: bool = False) -> np.ndarray:
    t = (theta[:, _slow_cols(theta.shape[1])] if marg
         else theta).astype(np.float64)
    x = t.copy()
    m1 = np.maximum(t[:, 0], 1e-10)
    m2 = np.maximum(t[:, 1], 1e-10)
    x[:, 0], x[:, 1] = _masses_to_x(m1, m2)
    x[:, 2] = np.log(np.maximum(t[:, 2], 1e-10))
    return x


def _from_slow(x: np.ndarray) -> np.ndarray:
    """x-space [N, 11] -> θ-space (full-parameter walk). The m1 ≥ m2 fold
    is handled upstream as a reflecting log q ≤ 0 boundary, so no
    fold/symmetrization happens here."""
    xx = x.copy()
    m1, m2 = _x_to_masses(x[:, 0], x[:, 1])
    xx[:, 0], xx[:, 1] = m1, m2
    xx[:, 2] = np.exp(x[:, 2])
    return xx


def _reassemble(x: np.ndarray, cur: np.ndarray,
                marg: bool = False) -> np.ndarray:
    """Proposed walk coordinates -> full θ [N, 11]. marg=True: x is the
    9-D slow block and each particle KEEPS its own fast dims (φ_c, t_c)
    from `cur` — the marginalized target is flat in them."""
    if not marg:
        return _from_slow(x)
    th = cur.copy()
    m1, m2 = _x_to_masses(x[:, 0], x[:, 1])
    th[:, 0], th[:, 1] = m1, m2
    th[:, 2] = np.exp(x[:, 2])
    th[:, _slow_cols(cur.shape[1])[3:]] = x[:, 3:]
    return th


def _to_slow_jnp(theta: jnp.ndarray, marg: bool) -> jnp.ndarray:
    """jnp twin of _to_slow (device-side SMC moves)."""
    t = theta[:, _slow_cols(theta.shape[1])] if marg else theta
    m1 = jnp.maximum(t[:, 0], 1e-10)
    m2 = jnp.maximum(t[:, 1], 1e-10)
    lmc = 0.6 * jnp.log(m1 * m2) - 0.2 * jnp.log(m1 + m2)
    lq = jnp.log(m2 / m1)
    ld = jnp.log(jnp.maximum(t[:, 2], 1e-10))
    return jnp.concatenate([jnp.stack([lmc, lq, ld], axis=1), t[:, 3:]],
                           axis=1)


def _reassemble_jnp(x: jnp.ndarray, cur: jnp.ndarray,
                    marg: bool) -> jnp.ndarray:
    """jnp twin of _reassemble."""
    q = jnp.exp(x[:, 1])
    mtot = jnp.exp(x[:, 0]) * q ** (-0.6) * (1.0 + q) ** 1.2
    m1 = mtot / (1.0 + q)
    m2 = q * m1
    d = jnp.exp(x[:, 2])
    if not marg:
        return jnp.concatenate([jnp.stack([m1, m2, d], axis=1), x[:, 3:]],
                               axis=1)
    th = cur.at[:, 0].set(m1).at[:, 1].set(m2).at[:, 2].set(d)
    return th.at[:, _slow_cols(cur.shape[1])[3:]].set(x[:, 3:])


def _make_fused_move(engine, context: jnp.ndarray, rank: int, ll_core,
                     ll_device_args, marg: bool, n_mcmc: int = 5,
                     g0: str = "flow", prior_cfg=None):
    """ONE jitted program for a full SMC rejuvenation sweep: lax.scan over
    n_mcmc random-walk Metropolis steps, each evaluating likelihood + prior
    + the anchor density g0 on-device. Replaces ~3·n_mcmc separate
    device dispatches per stage (the round-3 battery spent most of its
    56–105 s/event wall in tunnel round-trips between them).

    g0="flow" (importance correction): the anchor is the symmetrized flow
    density at (context, rank). g0="prior" (run_smc_prior, the
    flow-independent sampler baseline): the anchor IS the training prior,
    so the geometric path is π_β ∝ π·L^β and no engine is needed.

    `corr` carries the per-particle marginalized-proposal correction
    (−log KDE(t_c) − log Δt): in marginalized mode the walk never moves
    t_c, so the correction is constant along the sweep and the device can
    keep every density in the host's 11-D-proper convention by adding it
    to the raw flow density. (Zero in prior mode.)
    """
    # the device-side densities must walk the SAME prior as the
    # host-side tempering weights (ADVICE r4: a caller-supplied prior_cfg
    # only reached the host path)
    if prior_cfg is None:
        from posteriflow_tpu.prior import PriorConfig
        prior_cfg = PriorConfig()
    _lp_vec = jax.vmap(lambda t: log_prior_bbh(t, prior_cfg))
    if g0 == "prior":
        context = jnp.zeros(1, jnp.float32)      # unused placeholder

        def _lg0_raw(thp, ctx):
            return _lp_vec(thp)
    else:
        model, scaler, params = engine.model, engine.scaler, engine.params

        def _lg0_raw(thp, ctx):
            ctx_b = jnp.broadcast_to(ctx, (thp.shape[0], ctx.shape[-1]))
            r_b = jnp.full((thp.shape[0],), rank, dtype=jnp.int32)

            def side(t):
                nll = model.apply(params, ctx_b, t, r_b,
                                  method=type(model).nll_from_context)
                return -nll + scaler.log_abs_det_jacobian(t)
            sw = thp.at[:, 0].set(thp[:, 1]).at[:, 1].set(thp[:, 0])
            return jax.scipy.special.logsumexp(
                jnp.stack([side(thp), side(sw)]), axis=0)

    @jax.jit
    def _move(cur, ll, lp, lg0, corr, beta, chol, key, ctx, *ll_dev):
        x = _to_slow_jnp(cur, marg)
        jac = jnp.sum(jnp.log(jnp.maximum(cur[:, :3], 1e-10)), axis=1)
        log_tgt = beta * (ll + lp) + (1.0 - beta) * lg0 + jac

        def step(carry, k):
            cur, x, ll, lp, lg0, log_tgt, acc_sum = carry
            k1, k2 = jax.random.split(k)
            xp = x + jax.random.normal(k1, x.shape) @ chol.T
            thp = _reassemble_jnp(xp, cur, marg)
            llp = ll_core(thp, *ll_dev)
            lpp = _lp_vec(thp)
            lg0p = _lg0_raw(thp, ctx) + corr
            jacp = jnp.sum(jnp.log(jnp.maximum(thp[:, :3], 1e-10)), axis=1)
            ltp = beta * (llp + lpp) + (1.0 - beta) * lg0p + jacp
            # reflecting m1 >= m2 fold: log q > 0 would unfold
            ltp = jnp.where(xp[:, 1] <= 0.0, ltp, -jnp.inf)
            ltp = jnp.where(jnp.isfinite(ltp), ltp, -jnp.inf)
            acc = (jnp.log(jax.random.uniform(k2, (cur.shape[0],)))
                   < ltp - log_tgt)
            return ((jnp.where(acc[:, None], thp, cur),
                     jnp.where(acc[:, None], xp, x),
                     jnp.where(acc, llp, ll), jnp.where(acc, lpp, lp),
                     jnp.where(acc, lg0p, lg0),
                     jnp.where(acc, ltp, log_tgt),
                     acc_sum + jnp.mean(acc)), None)

        keys = jax.random.split(key, n_mcmc)
        init = (cur, x, ll, lp, lg0, log_tgt, jnp.float32(0.0))
        (cur, x, ll, lp, lg0, log_tgt, acc_sum), _ = jax.lax.scan(
            step, init, keys)
        return cur, ll, lp, lg0, acc_sum / n_mcmc

    def move_fn(cur, ll, lp, lg0, corr, beta, chol, seed):
        out = _move(jnp.asarray(cur, jnp.float32),
                    jnp.asarray(ll, jnp.float32),
                    jnp.asarray(lp, jnp.float32),
                    jnp.asarray(lg0, jnp.float32),
                    jnp.asarray(corr, jnp.float32),
                    jnp.float32(beta), jnp.asarray(chol, jnp.float32),
                    jax.random.PRNGKey(seed), context, *ll_device_args)
        cur, ll, lp, lg0 = (np.asarray(o, np.float64) for o in out[:4])
        return cur, ll, lp, lg0, float(out[4])

    return move_fn


def run_smc_prior(log_l_fn: Callable, n: int = 4096, seed: int = 0,
                  marginalized: bool = True, max_stages: int = 40,
                  ladder_target_frac: float = 0.5,
                  prior_cfg=None, n_mcmc: int = 5) -> ISResult:
    """Flow-INDEPENDENT posterior sampler + evidence: tempered SMC from the
    training PRIOR, π_β ∝ π·L^β, β: 0 → 1.

    This is the framework's sampler baseline for anchor comparisons
    (reference role: dynesty in scripts/benchmark_real_events.py:2-12): it
    shares the exact Whittle likelihood with importance sampling but NOT
    the flow proposal, so agreement between its posterior/evidence and the
    flow-anchored IS result is a two-independent-estimator consistency
    check. log_evidence_ratio converges to log E_π[L] — the same
    noise-ratio convention as importance_correct — so the logZ gap between
    the two is directly meaningful. Fully on-device when log_l_fn carries
    the fused-dispatch hooks (make_[marginalized_]log_likelihood does).
    """
    rng = np.random.default_rng(seed)
    from posteriflow_tpu.prior import PriorConfig, sample_prior_bbh
    if prior_cfg is None:
        prior_cfg = PriorConfig()
    theta = sample_prior_bbh(rng, n, prior_cfg)
    log_prior_fn = jax.jit(jax.vmap(lambda t: log_prior_bbh(t, prior_cfg)))
    lp = np.asarray(log_prior_fn(jnp.asarray(theta, jnp.float32)),
                    np.float64)
    ll = np.asarray(log_l_fn(jnp.asarray(theta, jnp.float32)), np.float64)

    move_fn = None
    ll_core = getattr(log_l_fn, "core", None)
    ll_device_args = getattr(log_l_fn, "device_args", None)
    if ll_core is not None and ll_device_args is not None:
        move_fn = _make_fused_move(None, None, 0, ll_core, ll_device_args,
                                   marg=marginalized, g0="prior",
                                   n_mcmc=n_mcmc, prior_cfg=prior_cfg)
    return _tempered_is(theta, lp.copy(), ll, lp, log_l_fn, log_prior_fn,
                        ladder_target_frac=ladder_target_frac,
                        max_stages=max_stages, marginalized=marginalized,
                        move_fn=move_fn, n_mcmc=n_mcmc, seed=seed)


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
