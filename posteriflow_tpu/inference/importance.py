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

    @jax.jit
    def _log_l(theta_batch, strain_td, res):
        d_w = data_white_fd(strain_td) - (res[0] + 1j * res[1])

        def one(theta):
            h_w = signal_white_fd(theta, asd)              # [n_det, F]
            match = jnp.sum(jnp.real(d_w * jnp.conj(h_w)))
            return match - 0.5 * jnp.sum(jnp.abs(h_w) ** 2)
        return jax.vmap(one)(theta_batch)

    def log_l(theta_batch: jnp.ndarray) -> jnp.ndarray:
        return _log_l(theta_batch, strain, res_ri)

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

    @jax.jit
    def _log_l(theta_batch, strain_td, res):
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

    def log_l(theta_batch: jnp.ndarray) -> jnp.ndarray:
        return _log_l(theta_batch, strain, res_ri)

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


def importance_correct(engine, context: jnp.ndarray, rank: int,
                       samples: np.ndarray, log_q: np.ndarray,
                       railed: np.ndarray, log_l_fn: Callable,
                       log_prior_fn: Callable = None,
                       min_ess_frac: float = 0.2,
                       ladder_target_frac: float = 0.2,
                       max_stages: int = 25,
                       marginalized: bool = False,
                       pad_block: int = 4096,
                       seed: int = 0) -> ISResult:
    """Exact correction of amortized samples against the true likelihood.

    Direct self-normalized IS first; if ESS/n < min_ess_frac, fall back to
    an adaptive tempered ladder (reference: importance.py:204-328): a
    geometric path between a GMM surrogate of the proposal (the anchor g0)
    and the target L·π,

        target_β(θ) ∝ g0(θ)^(1−β) · [L(θ)·π(θ)]^β,

    where every stage's particle density g_s is known EXACTLY — the flow's
    symmetrized density at stage 0, the (symmetrized, Jacobian-corrected)
    stage GMM afterwards — so the final rung at β = 1 is plain
    self-normalized IS against a known mixture: asymptotically exact, with
    a real evidence estimate. (Round-1 bug fixed: the old ladder set the
    post-rejuvenation proposal density to 0 and returned flat final
    weights, double-counting the prior per rung and yielding degenerate
    efficiency = 1.0 / logZ = 0 diagnostics.)

    marginalized=True declares log_l_fn phase/time-marginalized (the
    production make_marginalized_log_likelihood). The proposal density is
    then collapsed to the 9-D slow space — the flow's φ_c conditional is
    ~uniform (drop the 1/2π) and its t_c dependence is divided out via the
    1-D marginal KDE (reference: importance.py:192-202):

        log q_slow = log q_joint − log KDE_tc(t_c) + log 2π

    Without this, the fast-dim density ratio π(φ,t|·)/q(φ,t|·) rides every
    weight as pure variance (measured r2: 2.2% efficiency, 15-rung
    ladders); with it, the φ/t factors are constants that cancel against
    the prior. The tempered ladder then also runs in slow space: stage
    GMMs fit the 9 slow dims and new particles draw φ/t FROM the prior,
    whose density contribution cancels in the tempered weights exactly.
    """
    if log_prior_fn is None:
        log_prior_fn = jax.jit(jax.vmap(log_prior_bbh))
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
        lq = lq - np.log(np.maximum(kde_tc(tc), 1e-300)) \
            - np.log(_T_OFF_HI - _T_OFF_LO)

    log_w = ll + lp - lq
    log_w = np.where(np.isfinite(log_w), log_w, -np.inf)
    res = _finalize(np.asarray(theta), log_w)
    if res.ess / len(theta) >= min_ess_frac:
        return res

    return _tempered_is(np.asarray(theta, np.float64), lq.astype(np.float64),
                        ll.astype(np.float64), lp.astype(np.float64),
                        log_l_fn, log_prior_fn,
                        ladder_target_frac=ladder_target_frac,
                        max_stages=max_stages, marginalized=marginalized,
                        n_floor=pad_block, seed=seed)


def _tempered_is(theta: np.ndarray, lq: np.ndarray, ll: np.ndarray,
                 lp: np.ndarray, log_l_fn: Callable, log_prior_fn: Callable,
                 ladder_target_frac: float = 0.2, max_stages: int = 25,
                 prior_sampler: Callable = None, prior_mix: float = 0.3,
                 marginalized: bool = False, n_floor: int = 4096,
                 seed: int = 0) -> ISResult:
    """Adaptive tempered ladder with per-stage re-anchoring (the
    importance_correct fallback; separable for direct testing against a
    synthetic likelihood).

    Each stage s anchors the geometric path at its OWN proposal g_s, whose
    density is exactly known (the flow's symmetrized density at stage 0, a
    defensive mixture afterwards), and takes the largest tempering step
        log w(γ) = γ·[log(L·π) − log g_s]
    whose ESS stays above target. γ = 1 means w = L·π/g_s — plain
    self-normalized IS against a known density: asymptotically exact, with
    a real evidence estimate. Re-anchoring beats the reference's fixed
    anchor when the posterior sits in the initial proposal's far tail (the
    fixed-anchor intermediate targets g0^(1−β)(Lπ)^β then never overlap
    the particle cloud and the ladder stalls); each rung here is still
    exact for its own target, so the scheme stays exact.

    Rejuvenation proposals are DEFENSIVE mixtures
        g_s = (1 − prior_mix)·GMM_trunc + prior_mix·π :
    the tempered target carries the full prior factor, and a plain GMM
    under-covers the parameters the posterior leaves flat (its Gaussian
    tails vs their uniform prior), collapsing ESS as γ → 1. The prior
    component bounds the weights, and the mixture density stays exactly
    known — exactness is preserved. (Round-1 bug fixed here: the old
    ladder set the post-rejuvenation proposal density to 0 and returned
    flat final weights — degenerate efficiency = 1.0 / logZ = 0.)
    """
    from sklearn.mixture import GaussianMixture
    from sklearn.mixture._gaussian_mixture import _compute_precision_cholesky

    if prior_sampler is None:
        from posteriflow_tpu.prior import sample_prior_bbh
        prior_sampler = sample_prior_bbh
    rng = np.random.default_rng(seed)
    # rejuvenation stages may carry MORE particles than the input cloud:
    # the GMM fit quality (hence the reachable per-rung ESS) is limited by
    # particle count, and the likelihood is one vmapped JAX batch — cheap
    n = max(len(theta), n_floor)
    cur = theta
    cur_ll, cur_lp = ll, lp
    cur_lg = lq                                # exact stage-proposal density
    ladder = []
    log_w = None
    converged = False

    for stage in range(max_stages):
        delta = cur_ll + cur_lp - cur_lg       # log(L·π / g_s)
        gamma = _pick_gamma(delta, ladder_target_frac)
        ladder.append(round(gamma, 4))
        log_w = gamma * delta
        log_w = np.where(np.isfinite(log_w), log_w, -np.inf)
        if gamma >= 1.0 - 1e-9:
            converged = True
            break
        if stage == max_stages - 1:
            # out of stages: do NOT rejuvenate — the returned cloud must be
            # the one log_w was computed for (a post-rejuvenation cur would
            # pair fresh particles with stale weights, making samples/ESS/
            # logZ mutually inconsistent on every non-converged run)
            break
        # rejuvenate: refit a mixture on the tempered target, redraw, and
        # TRACK its exact density as the next stage's proposal
        w = _norm_w(log_w)
        idx = _systematic_resample(w, rng)
        xs = _to_slow(cur[idx], marg=marginalized)
        xs = xs + rng.standard_normal(xs.shape) * (
            xs.std(0, keepdims=True) * 0.05 + 1e-6)
        gm = GaussianMixture(
            n_components=min(10, max(2, len(np.unique(idx)) // 30)),
            covariance_type="full", reg_covar=1e-5,
            random_state=seed).fit(xs)
        # defensive widening, ANNEALED BY STAGE: early stages need tail
        # coverage (×1.3/axis, the reference's choice), but in 11-D that
        # is an 18× volume re-inflation — kept every stage it exactly
        # cancels each rung's tempering and γ goes stationary (measured:
        # γ ≈ 0.1 for 25 stages on a sharp posterior). Later stages widen
        # only mildly so progress compounds.
        gm.covariances_ *= 1.69 if stage < 3 else 1.1
        gm.precisions_cholesky_ = _compute_precision_cholesky(
            gm.covariances_, "full")
        n_gm = int(round(n * (1.0 - prior_mix)))
        gm_draws, log_accept = _sample_in_support(gm, n_gm, log_prior_fn,
                                                  rng, marg=marginalized)
        cur = np.concatenate([gm_draws, prior_sampler(rng, n - n_gm)])
        t = jnp.asarray(cur, dtype=jnp.float32)
        cur_lp = np.asarray(log_prior_fn(t), dtype=np.float64)
        # truncating the mixture to the prior support divides its density
        # by the support mass; the MC acceptance rate estimates that mass,
        # keeping stage densities (hence the evidence) consistent
        lg_gm = _gmm_logpdf_sym(gm, cur, marg=marginalized) - log_accept
        cur_lg = np.logaddexp(np.log1p(-prior_mix) + lg_gm,
                              np.log(prior_mix) + cur_lp)
        cur_ll = np.asarray(log_l_fn(t), dtype=np.float64)

    final = _finalize(cur.astype(np.float32), log_w)
    final.n_stages = len(ladder)
    final.beta_ladder = ladder
    final.converged = converged
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


def _gmm_draw(gm, n: int, rng) -> np.ndarray:
    """Draw n x-space samples from a fitted GaussianMixture using OUR rng.
    sklearn's gm.sample() re-seeds from gm.random_state (an int) on every
    call, so its draws are frozen — identical across calls and stages —
    which silently breaks the IS averaging (measured: a stable multi-nat
    logZ bias from one frozen realization + the adaptive stopping rule)."""
    counts = rng.multinomial(n, gm.weights_)
    chunks = []
    for k, c in enumerate(counts):
        if c == 0:
            continue
        L = np.linalg.cholesky(gm.covariances_[k])
        z = rng.standard_normal((c, gm.means_.shape[1]))
        chunks.append(gm.means_[k] + z @ L.T)
    out = np.concatenate(chunks)
    return out[rng.permutation(len(out))]


def _sample_in_support(gm, n: int, log_prior_fn: Callable, rng,
                       max_rounds: int = 40, marg: bool = False):
    """Rejection-sample n draws from the (folded) GMM restricted to the
    prior support. Returns (draws, log acceptance-rate). A widened
    mixture otherwise puts most of its mass outside the bounded prior and
    −inf priors destroy every subsequent rung's ESS."""
    acc, n_drawn, n_acc = [], 0, 0
    for _ in range(max_rounds):
        x = _gmm_draw(gm, max(n, 256), rng)
        th = _from_slow(np.asarray(x), marg=marg, rng=rng)
        ok = np.isfinite(np.asarray(
            log_prior_fn(jnp.asarray(th, dtype=jnp.float32)), np.float64))
        n_drawn += len(th)
        n_acc += int(ok.sum())
        if ok.any():
            acc.append(th[ok])
        if sum(len(a) for a in acc) >= n:
            break
    if not acc:                      # mixture entirely out of support:
        x = _gmm_draw(gm, n, rng)    # keep raw draws, let −inf priors
        return _from_slow(np.asarray(x), marg=marg, rng=rng), 0.0
    out = np.concatenate(acc)[:n]
    if len(out) < n:                 # top up by resampling accepted draws
        out = np.concatenate([out, out[rng.integers(0, len(out),
                                                    n - len(out))]])
    return out, float(np.log(max(n_acc, 1) / n_drawn))


# Slow-space transform for the mixture proposals: log on (m1, m2, d_L),
# identity on the remaining params. Densities are always reported in
# PHYSICAL θ-space: gm.score_samples gives the x-space density, and
# |det dx/dθ| = 1/(m1·m2·d_L) adds −(x0+x1+x2) in log.
# marg=True drops the marginalized fast dims (phase=7, t_c=8) — the GMM is
# then 9-D and fresh particles draw φ/t_c from their flat priors, whose
# exactly-known densities make the GMM component a consistent 11-D density.
_N_LOG_DIMS = 3
_SLOW_COLS_M = np.asarray([0, 1, 2, 3, 4, 5, 6, 9, 10])


def _fast_flat_logdens() -> float:
    """log of the flat φ_c × t_c prior density (the fast-dim factor of a
    marginalized-mode GMM particle)."""
    from posteriflow_tpu.prior import _T_OFF_HI, _T_OFF_LO
    return -float(np.log(2.0 * np.pi) + np.log(_T_OFF_HI - _T_OFF_LO))


def _to_slow(theta: np.ndarray, marg: bool = False) -> np.ndarray:
    x = (theta[:, _SLOW_COLS_M] if marg else theta).astype(np.float64).copy()
    x[:, :_N_LOG_DIMS] = np.log(np.maximum(x[:, :_N_LOG_DIMS], 1e-10))
    return x


def _from_slow(x: np.ndarray, marg: bool = False, rng=None) -> np.ndarray:
    xx = x.copy()
    xx[:, :_N_LOG_DIMS] = np.exp(x[:, :_N_LOG_DIMS])
    m1 = np.maximum(xx[:, 0], xx[:, 1])        # fold to the m1 ≥ m2
    m2 = np.minimum(xx[:, 0], xx[:, 1])        # convention (density
    xx[:, 0], xx[:, 1] = m1, m2                # symmetrized below)
    if not marg:
        return xx
    from posteriflow_tpu.prior import _T_OFF_HI, _T_OFF_LO
    th = np.zeros((len(xx), 11))
    th[:, _SLOW_COLS_M] = xx
    th[:, 7] = rng.uniform(0.0, 2.0 * np.pi, len(xx))
    th[:, 8] = rng.uniform(_T_OFF_LO, _T_OFF_HI, len(xx))
    return th


def _gmm_logpdf_sym(gm, theta: np.ndarray, marg: bool = False) -> np.ndarray:
    """θ-space log-density of the folded (m1 ≥ m2) GMM draw: sum of the
    mixture density at x and at the mass-swapped x, plus the log-transform
    Jacobian (and the flat fast-dim factor in marginalized mode)."""
    x = _to_slow(theta, marg=marg)
    xs = x.copy()
    xs[:, [0, 1]] = x[:, [1, 0]]
    jac = -np.sum(x[:, :_N_LOG_DIMS], axis=1)
    out = np.logaddexp(gm.score_samples(x), gm.score_samples(xs)) + jac
    return out + (_fast_flat_logdens() if marg else 0.0)


def _pick_gamma(delta: np.ndarray, target_frac: float) -> float:
    """Largest γ ∈ (0, 1] keeping ESS/n of the rung weights γ·delta above
    target_frac, delta = log(L·π/g_s). When even tiny γ falls short, the
    target adapts downward — any γ sequence stays exact (per-rung
    densities are exact; the target only trades variance for ladder
    length), while a hard target would stall the ladder."""
    def ess_frac(g):
        lw = g * delta
        m = np.isfinite(lw)
        if m.sum() < 10:
            return 0.0
        v = np.exp(lw[m] - lw[m].max())
        return (v.sum() ** 2 / (v ** 2).sum()) / len(delta)
    # the γ = 1 hop is exact at ANY ESS (it is plain IS against a known
    # density) — accept it at a lower bar than intermediate rungs rather
    # than rejuvenating forever on a proposal the GMM cannot improve
    if ess_frac(1.0) >= min(target_frac, 0.02):
        return 1.0
    target = min(target_frac, max(ess_frac(1e-3) * 0.5, 0.02))
    a, b = 0.0, 1.0
    for _ in range(40):
        mid = 0.5 * (a + b)
        if ess_frac(mid) >= target:
            a = mid
        else:
            b = mid
    return max(a, 1e-4)


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
