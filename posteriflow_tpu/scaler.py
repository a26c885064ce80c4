"""Fixed, deterministic, invertible map physical parameters <-> [-1, 1].

Log-space for masses/distance, linear for angles/time/spins; exact modular
wrap for the circular parameters (ra, phase, psi) whose normalized range is
one full period. No fitted statistics — nothing to drift between train and
eval (reference semantics: src/ahsd/models/lean_npe.py:48-114).

Pure functions over a static `ParamScaler` pytree so everything jits and
vmaps. Arrays are float32; inputs may be any float dtype.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

from posteriflow_tpu import PARAM_NAMES

# (lo, hi, log-space?) covering the generation priors with margin
# (reference: lean_npe.py:54-66)
RANGES = {
    "mass_1":              (1.0, 105.0, True),
    "mass_2":              (1.0, 105.0, True),
    "luminosity_distance": (40.0, 2200.0, True),
    "ra":                  (0.0, 2 * math.pi, False),
    "dec":                 (-math.pi / 2, math.pi / 2, False),
    "theta_jn":            (0.0, math.pi, False),
    "psi":                 (0.0, math.pi, False),
    "phase":               (0.0, 2 * math.pi, False),
    "geocent_time":        (-1.6, 1.6, False),
    "a1":                  (0.0, 1.0, False),
    "a2":                  (0.0, 1.0, False),
    # precessing set (PARAM_NAMES_PRECESSING): tilts on [0, π] linear;
    # the two azimuths span one full period and wrap (CIRCULAR below)
    "tilt_1":              (0.0, math.pi, False),
    "tilt_2":              (0.0, math.pi, False),
    "phi_12":              (0.0, 2 * math.pi, False),
    "phi_jl":              (0.0, 2 * math.pi, False),
}

# Parameters whose normalized range spans exactly one period (ra, phase:
# 2π; psi: π). For these, an out-of-range flow sample is re-entered
# modulo the period — a clamp would pile density onto the boundary and
# break the circular topology, whereas the modular wrap is exact.
CIRCULAR = ("ra", "phase", "psi", "phi_12", "phi_jl")

# Pre-merger (early-warning) geocent_time range: merger up to ~3 s past the
# window end (reference: lean_npe.py:73-84).
PREMERGER_TIME_RANGE = (-1.6, 5.2)


@jax.tree_util.register_pytree_node_class
class ParamScaler:
    """Static container of per-parameter bounds; all methods are pure/jittable.

    Attributes (all [P] float32, P = len(param_names)):
        lo, hi    — bounds in scaler space (log-space for log params)
        log_mask  — True where the map is log-linear
        circ_mask — True where modular wrap applies
    """

    def __init__(self, param_names: Sequence[str] = PARAM_NAMES,
                 premerger: bool = False):
        self.param_names = tuple(param_names)
        self.premerger = bool(premerger)
        lo, hi, lg, ci = [], [], [], []
        for p in self.param_names:
            l, h, g = RANGES[p]
            if p == "geocent_time" and premerger:
                l, h = PREMERGER_TIME_RANGE
            lo.append(math.log(l) if g else l)
            hi.append(math.log(h) if g else h)
            lg.append(g)
            ci.append(p in CIRCULAR)
        self.lo = jnp.asarray(lo, dtype=jnp.float32)
        self.hi = jnp.asarray(hi, dtype=jnp.float32)
        self.log_mask = jnp.asarray(lg, dtype=bool)
        self.circ_mask = jnp.asarray(ci, dtype=bool)

    # ── pytree plumbing (static: bounds are compile-time constants) ──────────
    def tree_flatten(self):
        return (), (self.param_names, self.premerger)

    @classmethod
    def tree_unflatten(cls, aux, _children):
        return cls(*aux)

    def __eq__(self, other):
        return (isinstance(other, ParamScaler)
                and self.param_names == other.param_names
                and self.premerger == other.premerger)

    def __hash__(self):
        return hash((self.param_names, self.premerger))

    # ── the map ───────────────────────────────────────────────────────────────
    def normalize(self, x: jax.Array) -> jax.Array:
        """physical [..., P] -> [-1, 1]."""
        xs = jnp.where(self.log_mask, jnp.log(jnp.maximum(x, 1e-6)), x)
        y = 2.0 * (xs - self.lo) / (self.hi - self.lo) - 1.0
        return jnp.clip(y, -1.0, 1.0)

    def denormalize(self, y: jax.Array) -> jax.Array:
        """[-1, 1] -> physical [..., P]."""
        xs = (jnp.clip(y, -1.0, 1.0) + 1.0) / 2.0 * (self.hi - self.lo) + self.lo
        return jnp.where(self.log_mask, jnp.exp(xs), xs)

    def wrap(self, y: jax.Array) -> jax.Array:
        """Map raw flow output into [-1, 1]: modular wrap for circular
        parameters (exact), clamp for bounded ones."""
        wrapped = jnp.mod(y + 1.0, 2.0) - 1.0
        return jnp.where(self.circ_mask, wrapped, jnp.clip(y, -1.0, 1.0))

    def log_abs_det_jacobian(self, x_phys: jax.Array) -> jax.Array:
        """log |d normalize(x) / dx| summed over params, at physical x [..., P].

        Needed to express flow densities in physical units
        (reference: src/ahsd/inference/pipeline.py:57-76):
            log q_phys(x) = log q_norm(normalize(x)) + log|J|.
        Per dim: linear -> 2/(hi-lo); log -> 2/((hi-lo)·x).
        """
        base = jnp.log(2.0) - jnp.log(self.hi - self.lo)
        extra = jnp.where(self.log_mask,
                          -jnp.log(jnp.maximum(x_phys, 1e-6)), 0.0)
        return jnp.sum(base + extra, axis=-1)

    def railing_mask(self, y: jax.Array, thresh: float = 0.999) -> jax.Array:
        """True where a NON-circular dim sits at the normalized boundary —
        the spurious-railing indicator (reference: pipeline.py:161-181)."""
        railed = jnp.abs(y) > thresh
        return jnp.any(railed & ~self.circ_mask, axis=-1)
