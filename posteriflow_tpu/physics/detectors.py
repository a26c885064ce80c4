"""Ground-based detector geometry: antenna patterns + geocentric time delays.

Pure jittable JAX replacing the reference's bilby `ifo.get_detector_response`
path (reference: src/ahsd/data/bilby_pipeline.py:213-247). Conventions match
LAL so sky parameters mean the same thing:

  - detector response tensor D = (x̂ x̂ᵀ − ŷ ŷᵀ)/2 built from published site
    latitude/longitude and arm bearings (clockwise from North),
  - F₊/F× from the standard wave-frame construction
    (LAL XLALComputeDetAMResponse),
  - arrival-time delay Δt_d = −(r̂_src · x⃗_vertex)/c
    (LAL XLALTimeDelayFromEarthCenter),
  - Greenwich mean sidereal time from the IAU-1982 polynomial; the sidereal
    RA-rotation trap is documented in the reference
    (src/ahsd/inference/dynesty_bridge.py:20-24) — RA enters ONLY through
    gha = gmst − ra.

Static geometry is precomputed in numpy at import; the hot functions take
plain arrays and vmap/jit cleanly.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from posteriflow_tpu.physics.constants import C_SI, DETECTORS

# ── Published site geometry (LIGO-T980044 / LALDetectors.h values) ───────────
# latitude [rad], longitude [rad], x/y-arm bearings [rad, clockwise from North]
_SITES = {
    "H1": dict(lat=0.81079526383, lon=-2.08405676917,
               az_x=5.65487724844, az_y=4.08408092164,
               vertex=(-2.16141492636e6, -3.83469517889e6, 4.60035022664e6)),
    "L1": dict(lat=0.53342313506, lon=-1.58430937078,
               az_x=4.40317772346, az_y=2.83238139666,
               vertex=(-7.42760447238e4, -5.49628371971e6, 3.22425701744e6)),
    "V1": dict(lat=0.76151183984, lon=0.18333805213,
               az_x=0.33916285222, az_y=5.05155183261,
               vertex=(4.54637409900e6, 8.42989697626e5, 4.37857696241e6)),
}


def _arm_direction(lat: float, lon: float, bearing: float) -> np.ndarray:
    """Unit vector of a horizontal arm with the given bearing (clockwise from
    North) at a site, in Earth-fixed Cartesian coordinates."""
    east = np.array([-np.sin(lon), np.cos(lon), 0.0])
    north = np.array([-np.sin(lat) * np.cos(lon),
                      -np.sin(lat) * np.sin(lon),
                      np.cos(lat)])
    return np.sin(bearing) * east + np.cos(bearing) * north


def _response_tensor(site: dict) -> np.ndarray:
    x = _arm_direction(site["lat"], site["lon"], site["az_x"])
    y = _arm_direction(site["lat"], site["lon"], site["az_y"])
    return 0.5 * (np.outer(x, x) - np.outer(y, y))


# Stacked static geometry, ordered as DETECTORS = (H1, L1, V1)
RESPONSE_TENSORS = np.stack([_response_tensor(_SITES[d]) for d in DETECTORS])  # [3,3,3]
VERTICES = np.stack([np.asarray(_SITES[d]["vertex"]) for d in DETECTORS])       # [3,3]

# float32 on device (JAX x64 is disabled; the geometry itself is computed in
# numpy float64 above, so only the final tensors are rounded)
_RESP_J = jnp.asarray(RESPONSE_TENSORS, dtype=jnp.float32)
_VERT_J = jnp.asarray(VERTICES, dtype=jnp.float32)

# ── Sidereal time ─────────────────────────────────────────────────────────────
_GPS_EPOCH_JD = 2444244.5          # 1980-01-06 00:00:00 UTC
_LEAP_GPS_MINUS_UTC = 18.0         # valid 2017+ (O4 era; GPS_REF is 2023)

# Earth sidereal rotation rate [rad/s] — for propagating GMST over the small
# in-window time offsets on-device (absolute GPS seconds ~1.4e9 cannot pass
# through float32: eps(1.4e9) ≈ 160 s of time ≈ 0.7° of RA).
OMEGA_EARTH = 2.0 * np.pi * 1.00273790935 / 86400.0


def gmst_from_gps(gps: float) -> float:
    """Greenwich mean sidereal time [rad] from GPS seconds (IAU-1982).

    HOST-side float64 (numpy scalars). Accuracy ~ms-of-time over decades —
    ≪ the Earth-rotation scale that would shift RA noticeably. UT1≈UTC is
    assumed (sub-second). On-device code precomputes this at a reference
    epoch and adds OMEGA_EARTH · t_offset for in-window times."""
    utc = np.float64(gps) - _LEAP_GPS_MINUS_UTC
    jd = _GPS_EPOCH_JD + utc / 86400.0
    tu = (jd - 2451545.0) / 36525.0
    gmst_s = (67310.54841
              + (876600.0 * 3600.0 + 8640184.812866) * tu
              + 0.093104 * tu ** 2
              - 6.2e-6 * tu ** 3)
    return float(np.mod(gmst_s, 86400.0) * (2.0 * np.pi / 86400.0))


# ── Antenna patterns + delays (jittable; scalar args broadcast) ──────────────

def antenna_pattern(det_idx: int, ra, dec, psi, gmst):
    """(F₊, F×) for one detector. Standard LAL wave-frame construction."""
    gha = gmst - ra                      # Greenwich hour angle
    cg, sg = jnp.cos(gha), jnp.sin(gha)
    cd, sd = jnp.cos(dec), jnp.sin(dec)
    cp, sp = jnp.cos(psi), jnp.sin(psi)

    x = jnp.stack([-cp * sg - sp * cg * sd,
                   -cp * cg + sp * sg * sd,
                   sp * cd], axis=-1)
    y = jnp.stack([sp * sg - cp * cg * sd,
                   sp * cg + cp * sg * sd,
                   cp * cd], axis=-1)

    D = _RESP_J[det_idx].astype(x.dtype)
    f_plus = jnp.einsum("...i,ij,...j->...", x, D, x) - jnp.einsum(
        "...i,ij,...j->...", y, D, y)
    f_cross = jnp.einsum("...i,ij,...j->...", x, D, y) + jnp.einsum(
        "...i,ij,...j->...", y, D, x)
    return f_plus, f_cross


def time_delay_from_geocenter(det_idx: int, ra, dec, gmst):
    """Arrival-time delay detector − geocenter [s]: −(r̂_src · x⃗_det)/c."""
    gha = gmst - ra
    cd = jnp.cos(dec)
    src = jnp.stack([cd * jnp.cos(gha), -cd * jnp.sin(gha), jnp.sin(dec)],
                    axis=-1)
    v = _VERT_J[det_idx].astype(src.dtype)
    return -jnp.einsum("...i,i->...", src, v) / C_SI


def network_response(ra, dec, psi, gmst):
    """All detectors at once: (F₊ [..., D], F× [..., D], Δt [..., D])."""
    fp, fc, dt = [], [], []
    for i in range(len(DETECTORS)):
        p, c = antenna_pattern(i, ra, dec, psi, gmst)
        fp.append(p)
        fc.append(c)
        dt.append(time_delay_from_geocenter(i, ra, dec, gmst))
    return (jnp.stack(fp, axis=-1), jnp.stack(fc, axis=-1),
            jnp.stack(dt, axis=-1))
