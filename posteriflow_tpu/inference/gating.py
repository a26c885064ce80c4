"""Refinement gate: should this posterior be refined with exact methods?

Reference semantics (src/ahsd/inference/gating.py): five indicators —
confidence verdict, OOD percentile, amortization-bias map region (the twin
grid's q-attractor band), chirp-mass posterior width, railing — each
scored none/moderate/strong; any strong or ≥2 moderate ⇒ refine, with
auditable reasons and parameter-level distrust for masses inside the
q-attractor band.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

Q_ATTRACTOR = (0.30, 0.80)      # mass-ratio band with measured NPE bias
                                # (reference: analysis/twin_grid_v3.json
                                # consumed at gating.py:36-67)


def refinement_gate(verdict: str, ood_percentile: float,
                    railing_frac: float, samples: np.ndarray,
                    bias_map: Optional[dict] = None) -> dict:
    """samples [N, P] physical posterior draws (PARAM_NAMES order).

    Returns {refine: bool, reasons: [str], distrust: [param names]}."""
    reasons, moderate, strong = [], 0, 0

    if verdict == "LOW":
        strong += 1
        reasons.append("confidence verdict LOW")
    elif verdict == "MEDIUM":
        moderate += 1
        reasons.append("confidence verdict MEDIUM")

    if ood_percentile >= 100.0:
        strong += 1
        reasons.append(f"context OOD beyond validation support "
                       f"({ood_percentile:.1f}%)")
    elif ood_percentile >= 99.0:
        moderate += 1
        reasons.append(f"context OOD percentile {ood_percentile:.1f}%")

    if railing_frac >= 0.20:
        strong += 1
        reasons.append(f"railing fraction {railing_frac:.2f}")
    elif railing_frac >= 0.05:
        moderate += 1
        reasons.append(f"railing fraction {railing_frac:.2f}")

    m1, m2 = samples[:, 0], samples[:, 1]
    mc = (m1 * m2) ** 0.6 / (m1 + m2) ** 0.2
    q_med = float(np.median(m2 / np.maximum(m1, 1e-6)))
    distrust = []
    in_attractor = Q_ATTRACTOR[0] <= q_med <= Q_ATTRACTOR[1]
    if bias_map is not None and in_attractor:
        moderate += 1
        distrust = ["mass_1", "mass_2"]
        reasons.append(f"median q={q_med:.2f} in measured bias attractor "
                       f"band {Q_ATTRACTOR}")

    # chirp-mass posterior width fraction (reference thresholds 0.6/1.0)
    mc_med = float(np.median(mc))
    width = float(np.quantile(mc, 0.95) - np.quantile(mc, 0.05))
    frac = width / max(mc_med, 1e-6)
    if frac >= 1.0:
        strong += 1
        reasons.append(f"chirp-mass 90% width {frac:.2f}x median")
    elif frac >= 0.6:
        moderate += 1
        reasons.append(f"chirp-mass 90% width {frac:.2f}x median")

    refine = strong >= 1 or moderate >= 2
    return {"refine": bool(refine), "reasons": reasons,
            "distrust": distrust, "n_strong": strong, "n_moderate": moderate}
