"""The NPE trainer: one jitted step = simulate → encode → per-rank NLL →
grads → AdamW, data-parallel over the mesh.

TPU-first redesign of the reference trainer (experiments/train_lean_npe.py):
the pickle/memmap/DataLoader machinery disappears because the batch is
synthesized on-device inside the step (physics/simulator.py); everything
else keeps the reference's training semantics:

  - per-rank masked NLL: encoder once per event, flow once per present
    rank, masked sum / count (train_lean_npe.py:108-127);
  - AdamW wd 1e-5, linear warmup 500 steps then cosine to a 1% floor,
    global-norm grad clip 5.0 (train_lean_npe.py:301-311, 366);
  - fixed deterministic validation batches for comparable per-epoch
    metrics (train_lean_npe.py:258-285).

Sharding: the step jits with the TrainState replicated and the RNG key
replicated; a sharding constraint on the simulated batch makes GSPMD
partition simulation+forward+backward over the "data" axis and all-reduce
gradients over ICI.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from posteriflow_tpu.models.npe import LeanNPE, NPEConfig
from posteriflow_tpu.parallel.mesh import shard_batch
from posteriflow_tpu.physics.simulator import (EventBatch, SimConfig,
                                               simulate_batch)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    npe: NPEConfig = NPEConfig()
    sim: SimConfig = SimConfig()
    batch_size: int = 128
    lr: float = 3e-4
    weight_decay: float = 1e-5
    warmup_steps: int = 500
    total_steps: int = 20_000
    grad_clip: float = 5.0
    # "global": clip_by_global_norm(grad_clip) — the reference's scheme
    # (train_lean_npe.py:366). "agc": adaptive gradient clipping (per-unit,
    # relative to parameter norm; grad_clip reinterpreted as the AGC
    # clipping factor ×0.01) — the r2 flagship's pre-clip norm grew 82→188
    # against the FIXED 5.0 (VERDICT weak-#3), so late training clipped
    # every update ~40x; AGC keeps clipping relative, only taming outliers.
    grad_clip_mode: str = "global"

    def __post_init__(self):
        # the simulator's label block and the flow's feature count must
        # agree — catch a precessing/param_names mismatch at config time,
        # not as a shape error deep inside the jitted step
        if self.npe.n_params != self.sim.prior.n_params:
            raise ValueError(
                f"npe.param_names has {self.npe.n_params} params but "
                f"sim.prior samples {self.sim.prior.n_params} "
                f"(prior.precessing={self.sim.prior.precessing}); set "
                "npe.param_names to PARAM_NAMES_PRECESSING for a "
                "precessing prior")


class TrainState(train_state.TrainState):
    pass


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=cfg.lr, warmup_steps=cfg.warmup_steps,
        decay_steps=cfg.total_steps, end_value=0.01 * cfg.lr)
    if cfg.grad_clip_mode == "agc":
        clip = optax.adaptive_grad_clip(0.01 * cfg.grad_clip)
    else:
        clip = optax.clip_by_global_norm(cfg.grad_clip)
    return optax.chain(
        clip,
        optax.adamw(sched, weight_decay=cfg.weight_decay),
    )


def init_state(key: jax.Array, cfg: TrainConfig) -> TrainState:
    model = LeanNPE(cfg.npe)
    s = cfg.sim
    dummy_strain = jnp.zeros((2, 3, 16384))
    dummy_theta = jnp.ones((2, cfg.npe.n_params)) * 0.5
    dummy_theta = dummy_theta.at[:, 0].set(30.0).at[:, 1].set(25.0) \
        .at[:, 2].set(500.0)
    dummy_rank = jnp.zeros((2,), dtype=jnp.int32)
    dummy_asd = (jnp.zeros((2, 3, s.psd_bands))
                 if cfg.npe.uses_asd_bands else None)
    params = model.init(key, dummy_strain, dummy_theta, dummy_rank,
                        dummy_asd)
    return TrainState.create(apply_fn=model.apply, params=params,
                             tx=make_optimizer(cfg))


def batch_nll(model: LeanNPE, params, batch: EventBatch) -> jnp.ndarray:
    """Mean per-signal NLL over a batch of events (reference masking
    semantics: train_lean_npe.py:108-127). Encoder once per event; the flow
    evaluates every (event, rank) slot with dead slots masked out."""
    cfg = model.cfg
    asd = batch.asd_bands if cfg.uses_asd_bands else None
    context = model.apply(params, batch.strain, asd, method=LeanNPE.encode)

    b, s, p = batch.params.shape                   # S = MAX_SIGNALS
    # ONE flow evaluation over the flattened [B*S] (event, rank) grid
    # instead of S stacked [B] calls: identical math (verified bit-exact),
    # one MXU-friendly batch for the flow fwd+bwd instead of S small ones
    ctx_rep = jnp.repeat(context, s, axis=0)                   # [B*S, C]
    theta = batch.params.reshape(b * s, p)
    ranks = jnp.tile(jnp.arange(s, dtype=jnp.int32), b)
    nll_all = model.apply(params, ctx_rep, theta, ranks,
                          method=LeanNPE.nll_from_context).reshape(b, s)
    mask = (jnp.arange(s)[None, :] < batch.n_sig[:, None]).astype(jnp.float32)
    total = jnp.sum(nll_all * mask)
    count = jnp.maximum(jnp.sum(mask), 1.0)
    return total / count


def component_grad_norms(grads) -> dict:
    """Per-submodule gradient norms (encoder / flow / rank embed) — the
    instrumentation for the pre-clip grad-norm growth observed across the
    r2 302k-step run (82 -> 188 vs clip 5.0, VERDICT r2 weak-#3):
    localizing WHICH component's gradients grow decides whether the fix is
    the clip threshold, the LR, or loss conditioning."""
    tree = grads.get("params", grads) if isinstance(grads, dict) else grads
    out = {}
    for name, key_ in (("gn_encoder", "encoder"), ("gn_flow", "flow"),
                       ("gn_rank", "rank_embed")):
        if isinstance(tree, dict) and key_ in tree:
            out[name] = optax.global_norm(tree[key_])
    return out


def make_train_step(cfg: TrainConfig, mesh=None, with_bank: bool = False):
    """Returns step(state, key[, bank]) -> (state, metrics). Jittable;
    donates the state. Pass a Mesh to constrain the simulated batch onto
    the "data" axis (GSPMD then shards simulation + fwd/bwd and inserts the
    gradient all-reduce). with_bank=True adds a NoiseBank argument for
    real-noise mixing (cfg.sim.real_noise_prob)."""
    model = LeanNPE(cfg.npe)

    def loss_fn(params, batch):
        return batch_nll(model, params, batch)

    def step_impl(state: TrainState, key: jax.Array, bank=None):
        k_sim, _ = jax.random.split(key)
        batch = simulate_batch(k_sim, cfg.batch_size, cfg.sim, bank=bank)
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        gnorm = optax.global_norm(grads)
        state = state.apply_gradients(grads=grads)
        metrics = {"nll": loss, "grad_norm": gnorm,
                   "mean_nsig": jnp.mean(batch.n_sig.astype(jnp.float32)),
                   "mean_snr": jnp.mean(batch.net_snr)}
        metrics.update(component_grad_norms(grads))
        return state, metrics

    if with_bank:
        return jax.jit(step_impl, donate_argnums=(0,))
    return jax.jit(lambda s, k: step_impl(s, k), donate_argnums=(0,))


def make_train_epoch(cfg: TrainConfig, n_steps: int, mesh=None,
                     with_bank: bool = False):
    """Returns epoch(state, key[, bank]) -> (state, mean-metrics): n_steps
    full train steps scanned INSIDE one jitted program.

    One dispatch per epoch instead of one per step: through the tunneled
    single-chip setup the per-step host dispatch is the bottleneck
    (measured: ~7.5 steps/s dispatch-bound vs 71.7 steps/s device-bound at
    batch 64), and on any deployment it removes host jitter from the step
    loop. Per-step randomness folds the epoch key by step index (the
    reference's seeded per-(epoch, item) rng discipline, remix_data.py:220
    — SURVEY.md §7 hard-part (e))."""
    model = LeanNPE(cfg.npe)

    def loss_fn(params, batch):
        return batch_nll(model, params, batch)

    def epoch_impl(state: TrainState, key: jax.Array, bank=None):
        def body(st, i):
            k_sim = jax.random.fold_in(key, i)
            batch = simulate_batch(k_sim, cfg.batch_size, cfg.sim,
                                   bank=bank)
            if mesh is not None:
                batch = shard_batch(mesh, batch)
            loss, grads = jax.value_and_grad(loss_fn)(st.params, batch)
            gnorm = optax.global_norm(grads)
            st = st.apply_gradients(grads=grads)
            return st, (loss, gnorm, component_grad_norms(grads))

        state, (losses, gnorms, comp) = jax.lax.scan(
            body, state, jnp.arange(n_steps, dtype=jnp.int32))
        metrics = {"nll": jnp.mean(losses), "grad_norm": jnp.mean(gnorms),
                   "last_nll": losses[-1]}
        metrics.update({k: jnp.mean(v) for k, v in comp.items()})
        return state, metrics

    if with_bank:
        return jax.jit(epoch_impl, donate_argnums=(0,))
    return jax.jit(lambda s, k: epoch_impl(s, k), donate_argnums=(0,))


def make_eval_nll(cfg: TrainConfig):
    """Jitted fixed-batch validation NLL (reference: per-epoch Gaussian val,
    train_lean_npe.py:377-385)."""
    model = LeanNPE(cfg.npe)

    @jax.jit
    def eval_nll(params, batch: EventBatch):
        return batch_nll(model, params, batch)

    return eval_nll
