"""Baseline comparison methods for overlap decomposition.

Reference surface (src/ahsd/evaluation/benchmarks.py):
StandardHierarchicalSubtraction (SNR-ordered matched subtraction),
JointParameterEstimation, SimpleIterativeSubtraction. The rebuild's
baselines run on the SAME jittable waveform kernel, so every method is a
few vmapped lines instead of a 500-line torch module.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from posteriflow_tpu.physics.psd import default_network_asd
from posteriflow_tpu.physics.simulator import signal_white_fd
from posteriflow_tpu.inference.importance import data_white_fd
from posteriflow_tpu.prior import loudness


def _template_fit_snr(d_w_fd: jnp.ndarray, theta: jnp.ndarray,
                      asd) -> jnp.ndarray:
    """Matched-filter statistic of template θ against whitened data."""
    h_w = signal_white_fd(theta, asd)
    num = jnp.sum(jnp.real(d_w_fd * jnp.conj(h_w)))
    return num / jnp.maximum(jnp.sqrt(jnp.sum(jnp.abs(h_w) ** 2)), 1e-9)


class StandardHierarchicalSubtraction:
    """Loudest-first template subtraction given candidate parameter guesses
    (reference: benchmarks.py:15). Uses the true waveform kernel."""

    def __init__(self, asd=None):
        self.asd = asd if asd is not None else default_network_asd()

    def decompose(self, strain_white: np.ndarray,
                  candidates: np.ndarray) -> Dict:
        """strain_white [3, T]; candidates [n, 11] parameter guesses.
        Iteratively subtracts the best-fitting candidate."""
        d_w = data_white_fd(jnp.asarray(strain_white))
        order = np.argsort(-np.asarray(
            loudness(candidates[:, 0], candidates[:, 1], candidates[:, 2])))
        residual = d_w
        extracted = []
        for idx in order:
            theta = jnp.asarray(candidates[idx], dtype=jnp.float32)
            fit = float(_template_fit_snr(residual, theta, self.asd))
            h_w = signal_white_fd(theta, self.asd)
            residual = residual - h_w
            extracted.append({"index": int(idx), "fit_snr": fit})
        res_power = float(jnp.sum(jnp.abs(residual) ** 2))
        return {"order": [e["index"] for e in extracted],
                "extracted": extracted, "residual_power": res_power}


class SimpleIterativeSubtraction(StandardHierarchicalSubtraction):
    """Refines each candidate's merger time on a local grid, then subtracts
    with the closed-form least-squares amplitude (reference: benchmarks.py:394
    iterative refinement). Distance is NOT gridded: the normalized matched
    filter is amplitude-invariant, so amplitude error is absorbed exactly by
    the LS coefficient α* = ⟨d|h⟩/⟨h|h⟩."""

    def decompose(self, strain_white: np.ndarray,
                  candidates: np.ndarray, n_grid: int = 9) -> Dict:
        d_w = data_white_fd(jnp.asarray(strain_white))
        order = np.argsort(-np.asarray(
            loudness(candidates[:, 0], candidates[:, 1], candidates[:, 2])))
        residual = d_w
        extracted = []
        dts = jnp.linspace(-0.02, 0.02, n_grid)
        for idx in order:
            base = jnp.asarray(candidates[idx], dtype=jnp.float32)

            def trial(dt, res):
                return _template_fit_snr(res, base.at[8].add(dt), self.asd)

            grid = jax.vmap(lambda dt: trial(dt, residual))(dts)
            k = int(jnp.argmax(grid))
            best = base.at[8].add(dts[k])
            h_w = signal_white_fd(best, self.asd)
            alpha = (jnp.sum(jnp.real(residual * jnp.conj(h_w)))
                     / jnp.maximum(jnp.sum(jnp.abs(h_w) ** 2), 1e-12))
            residual = residual - alpha * h_w
            extracted.append({"index": int(idx),
                              "fit_snr": float(grid[k]),
                              "alpha": float(alpha),
                              "refined_tc": float(best[8])})
        return {"order": [e["index"] for e in extracted],
                "extracted": extracted,
                "residual_power": float(jnp.sum(jnp.abs(residual) ** 2))}


class JointParameterEstimation:
    """Joint likelihood over all candidates at once — the expensive
    reference baseline (benchmarks.py:129); here a vmapped joint Whittle
    likelihood usable by any optimizer/sampler."""

    def __init__(self, asd=None):
        self.asd = asd if asd is not None else default_network_asd()

    def make_joint_log_likelihood(self, strain_white: np.ndarray) -> Callable:
        d_w = data_white_fd(jnp.asarray(strain_white))
        asd = self.asd

        @jax.jit
        def log_l(thetas: jnp.ndarray):       # [n_sig, 11]
            h = jnp.sum(jax.vmap(lambda t: signal_white_fd(t, asd))(thetas),
                        axis=0)
            return (jnp.sum(jnp.real(d_w * jnp.conj(h)))
                    - 0.5 * jnp.sum(jnp.abs(h) ** 2))

        return log_l
