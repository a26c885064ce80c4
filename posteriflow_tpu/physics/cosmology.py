"""Flat-ΛCDM cosmology helpers + effective-spin conversions.

Reference surface (src/ahsd/data/utils.py): redshift <-> luminosity
distance, comoving distance, chi_eff. Planck-2018-like parameters; the
comoving integral uses fixed-order Gauss-Legendre so everything jits.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from posteriflow_tpu.physics.constants import C_SI

H0_KM_S_MPC = 67.7
OMEGA_M = 0.31
_DH_MPC = C_SI / 1000.0 / H0_KM_S_MPC          # Hubble distance [Mpc]

# Gauss-Legendre nodes/weights on [0, 1] (host-precomputed)
_GL_X, _GL_W = np.polynomial.legendre.leggauss(32)
_GL_X = jnp.asarray(0.5 * (_GL_X + 1.0), dtype=jnp.float32)
_GL_W = jnp.asarray(0.5 * _GL_W, dtype=jnp.float32)


def _efunc(z):
    return jnp.sqrt(OMEGA_M * (1.0 + z) ** 3 + (1.0 - OMEGA_M))


def comoving_distance(z):
    """[Mpc], flat ΛCDM: D_C = D_H ∫₀^z dz'/E(z')."""
    z = jnp.asarray(z)
    zz = z[..., None] * _GL_X
    return _DH_MPC * z * jnp.sum(_GL_W / _efunc(zz), axis=-1)


def luminosity_distance(z):
    """[Mpc]: D_L = (1+z) D_C."""
    return (1.0 + jnp.asarray(z)) * comoving_distance(z)


def redshift_from_luminosity_distance(d_l, n_iter: int = 20):
    """Invert D_L(z) by bisection on [0, 10] (jittable, fixed iterations)."""
    d_l = jnp.asarray(d_l)
    lo = jnp.zeros_like(d_l)
    hi = jnp.full_like(d_l, 10.0)
    for _ in range(n_iter):
        mid = 0.5 * (lo + hi)
        too_far = luminosity_distance(mid) > d_l
        hi = jnp.where(too_far, mid, hi)
        lo = jnp.where(too_far, lo, mid)
    return 0.5 * (lo + hi)


def source_frame_masses(m1_det, m2_det, d_l):
    """Detector-frame -> source-frame: m_src = m_det / (1+z)."""
    z = redshift_from_luminosity_distance(d_l)
    return m1_det / (1.0 + z), m2_det / (1.0 + z), z


def chi_eff(m1, m2, a1, a2):
    """Effective aligned spin (m1 χ1 + m2 χ2)/M."""
    return (m1 * a1 + m2 * a2) / (m1 + m2)


def chirp_mass(m1, m2):
    return (m1 * m2) ** 0.6 / (m1 + m2) ** 0.2


def mass_ratio(m1, m2):
    return jnp.minimum(m1, m2) / jnp.maximum(m1, m2)
