"""Pod-scale overlap decomposition: the subtract-and-reinfer loop batched
over many events at once.

BASELINE configs[4] ("sequential subtraction-and-reinference at pod
scale"): core/pipeline.py handles one event with Python-level stage
orchestration; this module runs B events per device batch — every stage is
ONE jitted program over the whole batch (encode → sample → posterior-mean
template → LS subtraction), events that fail the quality gate freeze via
masking instead of exiting the loop. Sharded over the mesh "data" axis,
B events/stage scale linearly with chips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from posteriflow_tpu.models.npe import LeanNPE
from posteriflow_tpu.physics.constants import N_SAMPLES
from posteriflow_tpu.physics.psd import default_network_asd
from posteriflow_tpu.physics.simulator import signal_white_fd
from posteriflow_tpu.physics.whiten import fd_white_to_td
from posteriflow_tpu.scaler import ParamScaler


def make_batched_decompose(cfg, n_samples: int = 1024,
                           max_stages: int = 3,
                           quality_threshold: float = 0.3,
                           n_template_draws: int = 128, mesh=None):
    """Returns decompose(params, strain [B,3,T], asd_bands [B,3,K], key) ->
    dict of stacked per-stage results. One compiled program for the whole
    hierarchical loop (lax-free Python loop over the STATIC stage count —
    stages unroll into the jit)."""
    model = LeanNPE(cfg.npe)
    scaler = ParamScaler(cfg.npe.param_names, premerger=cfg.npe.premerger)
    asd = default_network_asd()

    def stage(params, strain, asd_bands, key, active):
        """One subtract-and-reinfer stage over the batch."""
        enc_in = asd_bands if cfg.npe.uses_asd_bands else None
        ctx = model.apply(params, strain, enc_in, method=LeanNPE.encode)
        rank0 = jnp.zeros((strain.shape[0],), dtype=jnp.int32)
        theta, y_raw, _ = model.apply(params, key, ctx, rank0, n_samples,
                                      method=LeanNPE.sample_from_context)

        # posterior-mean whitened template from the first draws
        draws = theta[:, :n_template_draws]

        def template(one_draws):
            h = jax.vmap(lambda t: signal_white_fd(t, asd))(one_draws)
            return jnp.mean(h, axis=0)

        h_mean = jax.vmap(template)(draws)            # [B, 3, F]
        d_w = jnp.fft.rfft(strain, axis=-1) / jnp.sqrt(N_SAMPLES / 2.0)
        hh = jnp.sum(jnp.abs(h_mean) ** 2, axis=(-2, -1))
        dh = jnp.sum(jnp.real(d_w * jnp.conj(h_mean)), axis=(-2, -1))
        alpha = dh / jnp.maximum(hh, 1e-12)
        fit_snr = dh / jnp.maximum(jnp.sqrt(hh), 1e-12)
        quality = jnp.clip(fit_snr / jnp.maximum(jnp.sqrt(hh), 1e-9),
                           -1.0, 2.0)
        accepted = (quality > quality_threshold) & active

        resid_fd = d_w - (alpha * accepted)[:, None, None] * h_mean
        residual = fd_white_to_td(resid_fd, N_SAMPLES)
        strain_next = jnp.where(accepted[:, None, None], residual, strain)

        med = jnp.median(theta, axis=1)               # [B, 11]
        return strain_next, {
            "median": med, "fit_snr": fit_snr, "alpha": alpha,
            "quality": quality, "accepted": accepted,
        }

    def decompose(params, strain, asd_bands, key):
        active = jnp.ones((strain.shape[0],), dtype=bool)
        stages = []
        for s in range(max_stages):
            k = jax.random.fold_in(key, s)
            strain, rec = stage(params, strain, asd_bands, k, active)
            active = rec["accepted"]
            stages.append(rec)
        out = {k: jnp.stack([r[k] for r in stages], axis=1)
               for k in stages[0]}                     # [B, n_stages, ...]
        out["n_extracted"] = jnp.sum(
            out["accepted"].astype(jnp.int32), axis=1)
        out["final_residual"] = strain
        return out

    fn = jax.jit(decompose)
    if mesh is None:
        return fn

    from posteriflow_tpu.parallel.mesh import shard_batch

    def sharded(params, strain, asd_bands, key):
        strain, asd_bands = shard_batch(mesh, (strain, asd_bands))
        return fn(params, strain, asd_bands, key)

    return sharded
