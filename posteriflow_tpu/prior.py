"""Astrophysical parameter priors — jittable sampling + closed-form density.

Reproduces the reference sampler's population (src/ahsd/data/parameter_sampler.py):
  - event mix BBH 0.55 / BNS 0.20 / NSBH 0.20 / noise 0.05
  - BBH masses flat-in-log (m1 log-uniform, m2 log-uniform given m2 ≤ m1)
  - BNS masses uniform (m2 uniform given m2 ≤ m1); NSBH: log-uniform BH +
    uniform NS companion
  - distance P(d) ∝ d² on per-type bounds (or uniform via config)
  - isotropic sky / inclination, psi ~ U(0, π), phase ~ U(0, 2π)
  - geocent_time ~ U(-1.5, 1.5) s offset from GPS_REF
  - aligned spin magnitudes per type

Everything is branchless (compute all three event-type candidates, select by a
categorical draw) so a whole [B, MAX_SIGNALS] parameter block samples inside
one jitted training step. The closed-form log-density backs the
importance-sampling correction (reference: src/ahsd/inference/importance.py:45-66).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from posteriflow_tpu import PARAM_NAMES

# Event-type codes (fixed order everywhere)
BBH, BNS, NSBH = 0, 1, 2
EVENT_TYPES = ("BBH", "BNS", "NSBH")

# Per-type bounds, indexable by event-type code. [3]-vectors.
_MASS_LO = (5.0, 1.0, 3.0)       # BBH lo, BNS lo, NSBH BH lo
_MASS_HI = (100.0, 2.5, 100.0)
_M2_LO = (5.0, 1.0, 1.0)         # secondary lower bound (NSBH NS: 1.0)
_M2_HI = (100.0, 2.5, 2.5)       # secondary upper bound  (NSBH NS: 2.5)
_DIST_LO = (50.0, 10.0, 20.0)
_DIST_HI = (2000.0, 300.0, 800.0)
_SPIN1_HI = (0.99, 0.05, 0.99)   # primary spin (NSBH primary = BH)
_SPIN2_HI = (0.99, 0.05, 0.05)   # secondary spin (NSBH secondary = NS)

_T_OFF_LO, _T_OFF_HI = -1.5, 1.5

IDX = {name: i for i, name in enumerate(PARAM_NAMES)}


@dataclasses.dataclass(frozen=True)
class PriorConfig:
    """Static prior configuration (hashable: safe as a jit static arg)."""
    # event-type mixture over (BBH, BNS, NSBH) — renormalized; the reference's
    # 5% 'noise' fraction is handled by n_sig=0 events, not by a type here.
    type_probs: tuple = (0.55 / 0.95, 0.20 / 0.95, 0.20 / 0.95)
    distance_prior: str = "comoving_d2"        # or "uniform"
    # overlap structure (reference: dataset_generator.py:202-206 +
    # configs/data_config.yaml: overlap_fraction 0.45)
    max_signals: int = 5
    overlap_fraction: float = 0.45
    noise_fraction: float = 0.05
    # chirp-mass oversampling exponent alpha: events drawn ∝ Mc^alpha via an
    # importance-style proposal on log m1 (reference --mc_oversample,
    # train_lean_npe.py:206-210 — rebalances toward the heavy corner where
    # twin tests show prior-fallback bias). 0 = off.
    mc_oversample: float = 0.0
    # pre-merger (early-warning) events: with this probability a
    # SINGLE-signal event's merger is pushed past the window end by
    # time_to_merger ~ U(range), distance redrawn nearby (reference:
    # dataset_generator.py:211-232 + premerger_config). Requires the
    # premerger ParamScaler range at the model.
    premerger_fraction: float = 0.0
    premerger_ttm_range: tuple = (0.5, 3.0)
    premerger_distance_range: tuple = (50.0, 400.0)
    # full 15-D precessing set (PARAM_NAMES_PRECESSING): isotropic spin
    # tilts (cos tilt ~ U(-1,1)) + uniform azimuths phi_12/phi_jl. The
    # spin MAGNITUDE bounds stay the per-type tables above (NS spins
    # remain small, so their tilts are near-inert — deliberately: the
    # flow should learn that). BASELINE north star: 15-parameter BBH NPE.
    precessing: bool = False

    @property
    def n_params(self) -> int:
        return 15 if self.precessing else 11


def _uniform(key, lo, hi, shape=()):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


def sample_signal_params(key: jax.Array, cfg: PriorConfig = PriorConfig()) -> jax.Array:
    """Draw ONE signal's 11 physical parameters -> [N_PARAMS] float32.

    Branchless over event type: candidates for all three types are drawn from
    a shared set of uniforms, then selected by a categorical draw — cheap
    scalar math that vmaps over arbitrary batch shapes.
    """
    # NOTE: split(key, 11)[:10] == split(key, 10) bit-exactly (verified),
    # so the 11-D sampling stream — and every committed fixed-seed
    # validation battery — is unchanged by the precessing extension.
    keys = jax.random.split(key, 11)
    probs = jnp.asarray(cfg.type_probs)
    et = jax.random.categorical(keys[0], jnp.log(probs))       # scalar int

    def pick(table):
        return jnp.asarray(table)[et]

    m_lo, m_hi = pick(_MASS_LO), pick(_MASS_HI)
    m2_lo, m2_hi = pick(_M2_LO), pick(_M2_HI)

    # Primary mass: log-uniform for BBH/NSBH, uniform for BNS. With
    # mc_oversample=alpha the log-m1 proposal tilts ∝ m1^alpha via
    # inverse-CDF of exp(alpha·x) on [log lo, log hi] (heavier systems drawn
    # more often — the weighted-sampler semantics of the reference's
    # --mc_oversample, expressed as a proposal change).
    u1 = _uniform(keys[1], 0.0, 1.0)
    if cfg.mc_oversample > 0.0:
        a = cfg.mc_oversample
        lo_l, hi_l = jnp.log(m_lo), jnp.log(m_hi)
        u1 = (jnp.log1p(u1 * jnp.expm1(a * (hi_l - lo_l)))
              / (a * (hi_l - lo_l)))
    m1_log = jnp.exp(jnp.log(m_lo) + u1 * (jnp.log(m_hi) - jnp.log(m_lo)))
    m1_lin = m_lo + u1 * (m_hi - m_lo)
    m1 = jnp.where(et == BNS, m1_lin, m1_log)

    # Secondary: BBH log-uniform on [m_lo, m1]; BNS uniform on [lo, m1];
    # NSBH uniform NS on its own box (then enforce m1 >= m2).
    u2 = _uniform(keys[2], 0.0, 1.0)
    m2_bbh = jnp.exp(jnp.log(m_lo) + u2 * (jnp.log(m1) - jnp.log(m_lo)))
    m2_bns = m2_lo + u2 * (m1 - m2_lo)
    m2_nsbh = m2_lo + u2 * (m2_hi - m2_lo)
    m2 = jnp.where(et == BBH, m2_bbh, jnp.where(et == BNS, m2_bns, m2_nsbh))
    m1, m2 = jnp.maximum(m1, m2), jnp.minimum(m1, m2)

    # Distance: inverse-CDF of P(d) ∝ d² (or uniform).
    d_lo, d_hi = pick(_DIST_LO), pick(_DIST_HI)
    u = _uniform(keys[3], 0.0, 1.0)
    if cfg.distance_prior == "uniform":
        dist = d_lo + u * (d_hi - d_lo)
    else:
        dist = (d_lo ** 3 + u * (d_hi ** 3 - d_lo ** 3)) ** (1.0 / 3.0)

    ra = _uniform(keys[4], 0.0, 2 * math.pi)
    dec = jnp.arcsin(_uniform(keys[5], -1.0, 1.0))
    theta_jn = jnp.arccos(_uniform(keys[6], -1.0, 1.0))
    psi = _uniform(keys[7], 0.0, math.pi)
    phase_key, t_key = jax.random.split(keys[8])
    phase = _uniform(phase_key, 0.0, 2 * math.pi)
    t_off = _uniform(t_key, _T_OFF_LO, _T_OFF_HI)

    s1_key, s2_key = jax.random.split(keys[9])
    a1 = _uniform(s1_key, 0.0, pick(_SPIN1_HI))
    a2 = _uniform(s2_key, 0.0, pick(_SPIN2_HI))

    base = [m1, m2, dist, ra, dec, theta_jn, psi, phase, t_off, a1, a2]
    if cfg.precessing:
        kt1, kt2, kp12, kpjl = jax.random.split(keys[10], 4)
        # isotropic tilts, uniform azimuths
        tilt_1 = jnp.arccos(_uniform(kt1, -1.0, 1.0))
        tilt_2 = jnp.arccos(_uniform(kt2, -1.0, 1.0))
        phi_12 = _uniform(kp12, 0.0, 2 * math.pi)
        phi_jl = _uniform(kpjl, 0.0, 2 * math.pi)
        base += [tilt_1, tilt_2, phi_12, phi_jl]
    return jnp.stack(base).astype(jnp.float32)


def sample_n_signals(key: jax.Array, cfg: PriorConfig = PriorConfig()) -> jax.Array:
    """Per-event signal count: 0 w.p. noise_fraction, 2..max_signals w.p.
    overlap_fraction, else 1 (reference: dataset_generator.py:202-206 with
    the 'noise' event type folded in)."""
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1)
    n_overlap = jax.random.randint(k2, (), 2, cfg.max_signals + 1)
    n = jnp.where(u < cfg.noise_fraction, 0,
                  jnp.where(u < cfg.noise_fraction + cfg.overlap_fraction,
                            n_overlap, 1))
    return n.astype(jnp.int32)


def sample_event(key: jax.Array, cfg: PriorConfig = PriorConfig()):
    """One training event: ([MAX_SIGNALS, N_PARAMS] params, n_sig scalar).

    All MAX_SIGNALS slots hold valid draws; slots >= n_sig are masked
    downstream (static shapes for XLA). Pre-merger conversion (single-signal
    events only) pushes the merger time_to_merger seconds past the window
    end and redraws a nearby distance (reference:
    dataset_generator.py:211-232)."""
    kn, kp, kpm = jax.random.split(key, 3)
    n_sig = sample_n_signals(kn, cfg)
    params = jax.vmap(lambda k: sample_signal_params(k, cfg))(
        jax.random.split(kp, cfg.max_signals))

    if cfg.premerger_fraction > 0.0:
        # NOTE: with the merger past the window end, the fixed-window FD
        # generation wraps the merger circularly back into the window —
        # the same behavior as the reference's bilby fixed-window path
        # (its FD time shift is equally circular); the premerger scaler
        # range must be enabled at the model (NPEConfig.premerger).
        k_u, k_ttm, k_d = jax.random.split(kpm, 3)
        is_pm = ((jax.random.uniform(k_u) < cfg.premerger_fraction)
                 & (n_sig == 1))
        ttm = _uniform(k_ttm, *cfg.premerger_ttm_range)
        from posteriflow_tpu.physics.constants import DURATION
        t_pm = DURATION / 2.0 + ttm          # merger past the window end
        d_pm = _uniform(k_d, *cfg.premerger_distance_range)
        p0 = params[0]
        p0 = p0.at[IDX["geocent_time"]].set(
            jnp.where(is_pm, t_pm, p0[IDX["geocent_time"]]))
        p0 = p0.at[IDX["luminosity_distance"]].set(
            jnp.where(is_pm, d_pm, p0[IDX["luminosity_distance"]]))
        params = params.at[0].set(p0)
    return params, n_sig


def sample_batch(key: jax.Array, batch: int, cfg: PriorConfig = PriorConfig()):
    """[B, MAX_SIGNALS, N_PARAMS] params + [B] n_sig."""
    return jax.vmap(lambda k: sample_event(k, cfg))(jax.random.split(key, batch))


# ── Closed-form log-density (importance sampling) ────────────────────────────

def log_prior_bbh(theta: jax.Array, cfg: PriorConfig = PriorConfig()) -> jax.Array:
    """log p(theta) for the BBH training prior, theta [..., 11] or
    [..., 15] (precessing set appends isotropic tilts + uniform azimuths).

    Matches the reference's closed form (importance.py:45-66): flat-in-log
    masses with m2 ≤ m1 (joint density 1/(m1·m2·logrange·log(m1/lo))),
    d² distance, isotropic angles, uniform psi/phase/time, uniform spins.
    Returns -inf outside support.
    """
    m1, m2, d = theta[..., 0], theta[..., 1], theta[..., 2]
    ra, dec, theta_jn = theta[..., 3], theta[..., 4], theta[..., 5]
    psi, phase = theta[..., 6], theta[..., 7]
    t, a1, a2 = theta[..., 8], theta[..., 9], theta[..., 10]

    lo, hi = _MASS_LO[BBH], _MASS_HI[BBH]
    d_lo, d_hi = _DIST_LO[BBH], _DIST_HI[BBH]
    lr = math.log(hi) - math.log(lo)

    # m1 log-uniform: density 1/(m1·lr) → subtract log(lr), NOT lr.
    # (Subtracting lr itself mis-normalized the whole prior by a constant
    # e^{-1.899} — invisible to self-normalized posterior weights and to
    # marginal KS tests, but it biased log-evidence by +1.9 nats and
    # distorted the tempered ladder's defensive mixture, where the prior
    # competes against GMM densities and constants do NOT cancel.)
    lp = -jnp.log(m1) - math.log(lr)
    lp += -jnp.log(m2) - jnp.log(jnp.log(m1 / lo))   # m2 | m1 log-uniform
    if cfg.distance_prior == "uniform":
        lp += -math.log(d_hi - d_lo)
    else:
        lp += jnp.log(3.0 * d ** 2 / (d_hi ** 3 - d_lo ** 3))
    lp += -math.log(2 * math.pi)                # ra
    lp += jnp.log(jnp.cos(dec) / 2.0)           # dec: cos(dec)/2 on [-π/2, π/2]
    lp += jnp.log(jnp.sin(theta_jn) / 2.0)      # theta_jn: sin/2 on [0, π]
    lp += -math.log(math.pi)                    # psi
    lp += -math.log(2 * math.pi)                # phase
    lp += -math.log(_T_OFF_HI - _T_OFF_LO)      # geocent_time
    lp += -2.0 * math.log(_SPIN1_HI[BBH])       # a1, a2 uniform

    # The angular bounds make the density PROPER. Leaving the circular
    # params unbounded (flat on all of R) lets the tempered IS ladder
    # wander across periods: every extra period multiply-counts the
    # evidence and the stage mixtures' angular variance runs away
    # (measured: a stable e^4 logZ bias).
    inside = ((m1 >= lo) & (m1 <= hi) & (m2 >= lo) & (m2 <= m1)
              & (d >= d_lo) & (d <= d_hi)
              & (ra >= 0) & (ra <= 2 * math.pi)
              & (dec >= -math.pi / 2) & (dec <= math.pi / 2)
              & (theta_jn >= 0) & (theta_jn <= math.pi)
              & (psi >= 0) & (psi <= math.pi)
              & (phase >= 0) & (phase <= 2 * math.pi)
              & (t >= _T_OFF_LO) & (t <= _T_OFF_HI)
              & (a1 >= 0) & (a1 <= _SPIN1_HI[BBH])
              & (a2 >= 0) & (a2 <= _SPIN2_HI[BBH]))

    if theta.shape[-1] >= 15:
        t1, t2 = theta[..., 11], theta[..., 12]
        p12, pjl = theta[..., 13], theta[..., 14]
        # isotropic tilts: p(tilt) = sin(tilt)/2 on [0, π]
        lp += jnp.log(jnp.maximum(jnp.sin(t1), 1e-30) / 2.0)
        lp += jnp.log(jnp.maximum(jnp.sin(t2), 1e-30) / 2.0)
        lp += -2.0 * math.log(2 * math.pi)          # phi_12, phi_jl
        inside &= ((t1 >= 0) & (t1 <= math.pi) & (t2 >= 0) & (t2 <= math.pi)
                   & (p12 >= 0) & (p12 <= 2 * math.pi)
                   & (pjl >= 0) & (pjl <= 2 * math.pi))

    lp = jnp.where(jnp.isfinite(lp), lp, -jnp.inf)
    return jnp.where(inside, lp, -jnp.inf)


def sample_prior_bbh(rng, n: int, cfg: PriorConfig = PriorConfig()):
    """Host-side closed-form draw of n samples from the BBH training prior
    (the exact density of log_prior_bbh). numpy, for the importance
    sampler's defensive proposal mixture — not part of the jitted
    simulation path (that is sample_signal_params)."""
    import numpy as np
    lo, hi = _MASS_LO[BBH], _MASS_HI[BBH]
    d_lo, d_hi = _DIST_LO[BBH], _DIST_HI[BBH]
    lm1 = rng.uniform(np.log(lo), np.log(hi), n)
    m1 = np.exp(lm1)
    m2 = np.exp(rng.uniform(np.log(lo), lm1))
    if cfg.distance_prior == "uniform":
        d = rng.uniform(d_lo, d_hi, n)
    else:
        d = (d_lo ** 3 + rng.uniform(0, 1, n)
             * (d_hi ** 3 - d_lo ** 3)) ** (1.0 / 3.0)
    cols = [
        m1, m2, d,
        rng.uniform(0, 2 * np.pi, n),
        np.arcsin(rng.uniform(-1, 1, n)),
        np.arccos(rng.uniform(-1, 1, n)),
        rng.uniform(0, np.pi, n),
        rng.uniform(0, 2 * np.pi, n),
        rng.uniform(_T_OFF_LO, _T_OFF_HI, n),
        rng.uniform(0, _SPIN1_HI[BBH], n),
        rng.uniform(0, _SPIN2_HI[BBH], n)]
    if cfg.precessing:
        cols += [np.arccos(rng.uniform(-1, 1, n)),     # tilt_1
                 np.arccos(rng.uniform(-1, 1, n)),     # tilt_2
                 rng.uniform(0, 2 * np.pi, n),         # phi_12
                 rng.uniform(0, 2 * np.pi, n)]         # phi_jl
    return np.column_stack(cols).astype(np.float64)


def loudness(m1: jax.Array, m2: jax.Array, d: jax.Array) -> jax.Array:
    """Rank-ordering proxy: whitened amplitude ~ Mc^(5/6)/d_L
    (reference: experiments/remix_data.py:44-46)."""
    mc = (m1 * m2) ** 0.6 / (m1 + m2) ** 0.2
    return mc ** (5.0 / 6.0) / jnp.maximum(d, 1.0)
