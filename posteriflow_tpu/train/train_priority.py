"""PriorityNet trainer: on-device overlap-scenario synthesis + ranking loss.

The reference builds priority scenarios by reservoir-sampling a stored
dataset and synthesizing artificial overlaps in DataLoader workers
(experiments/train_priority_net.py:389-1031, 2116 LoC). Here scenarios are
one jitted simulate_batch with overlap_fraction=1 — every step sees fresh
overlaps — and the candidate features are (strain segments around each
TRUE merger, jittered parameters mimicking upstream posterior medians).
Targets are the per-signal network SNRs normalized within each event
(priority normalization, reference snr_utils semantics).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

from posteriflow_tpu.models.priority_net import (SEG_LEN, PriorityNet,
                                                 ranking_loss)
from posteriflow_tpu.physics.constants import DURATION, SAMPLE_RATE
from posteriflow_tpu.physics.simulator import SimConfig, simulate_batch
from posteriflow_tpu.prior import PriorConfig

log = logging.getLogger("posteriflow.priority")


@dataclasses.dataclass(frozen=True)
class PriorityTrainConfig:
    batch_size: int = 32
    lr: float = 1e-3
    param_jitter: float = 0.05      # relative jitter on candidate params
                                    # (mimics upstream posterior medians)
    min_snr: float = 6.0
    max_signals: int = 4
    d_model: int = 64
    use_energy: bool = True     # v4: excess-power features + aux SNR head
    use_snr_est: bool = True    # v5: physics expected-SNR input feature
    close_boost: float = 0.0    # v6: near-tie pair gradient boost
    use_dt: bool = False        # v7: time-crowding features
    residual_snr: bool = False  # v7: oracle-residual score head
    mine_pool: int = 1          # v7: hard-pair mining — simulate
                                # mine_pool×batch events per step and keep
                                # the batch with the SMALLEST min pairwise
                                # target separation (close pairs are where
                                # accuracy plateaus; reweighting the loss
                                # (close_boost) cannot add data, mining
                                # can). 1 = off; eval always uses the
                                # unmined natural distribution.

    @property
    def sim(self) -> SimConfig:
        return SimConfig(prior=PriorConfig(max_signals=self.max_signals,
                                           overlap_fraction=1.0,
                                           noise_fraction=0.0),
                         min_snr=self.min_snr)


def extract_segments_jax(strain: jnp.ndarray,
                         t_offs: jnp.ndarray) -> jnp.ndarray:
    """[n_det, T] + [S] merger offsets -> [S, n_det, SEG_LEN] (jittable
    twin of inference.ranking.extract_segments)."""
    t = strain.shape[-1]
    centers = ((t_offs + DURATION / 2) * SAMPLE_RATE).astype(jnp.int32)
    lo = jnp.clip(centers - SEG_LEN // 2, 0, t - SEG_LEN)

    def one(l):
        return jax.lax.dynamic_slice(strain, (0, l),
                                     (strain.shape[0], SEG_LEN))

    return jax.vmap(one)(lo)


def make_priority_batch(key: jax.Array, cfg: PriorityTrainConfig):
    """(segments [B,S,3,L], params [B,S,11], mask [B,S], targets [B,S],
    raw network SNR [B,S], physics expected SNR of the jittered candidate
    params [B,S])."""
    from posteriflow_tpu.physics.psd import default_network_asd
    from posteriflow_tpu.physics.simulator import signal_snr_amp_only

    k_sim, k_jit = jax.random.split(key)
    n_gen = cfg.batch_size * max(cfg.mine_pool, 1)
    ev = simulate_batch(k_sim, n_gen, cfg.sim)
    if cfg.mine_pool > 1:
        # hard-pair mining: keep the batch_size events whose closest live
        # pair of normalized targets is tightest (fixed-shape top-k gather,
        # jit-safe; events with <2 live signals sort last)
        s_all = ev.params.shape[1]
        m_all = (jnp.arange(s_all)[None, :]
                 < ev.n_sig[:, None]).astype(jnp.float32)
        tmax_all = jnp.max(ev.sig_snr, axis=1, keepdims=True)
        tg_all = ev.sig_snr / jnp.maximum(tmax_all, 1e-6)
        pair_live = (m_all[:, :, None] * m_all[:, None, :]) \
            * (1.0 - jnp.eye(s_all)[None])
        sep = jnp.abs(tg_all[:, :, None] - tg_all[:, None, :])
        hardness = jnp.min(jnp.where(pair_live > 0, sep, jnp.inf),
                           axis=(1, 2))
        idx = jnp.argsort(hardness)[:cfg.batch_size]
        ev = jax.tree.map(lambda x: x[idx], ev)
    s = ev.params.shape[1]
    mask = (jnp.arange(s)[None, :] < ev.n_sig[:, None]).astype(jnp.float32)

    # candidate params: truth + relative jitter (upstream estimates)
    jitter = 1.0 + cfg.param_jitter * jax.random.normal(k_jit,
                                                        ev.params.shape)
    cand = ev.params * jitter
    segs = jax.vmap(extract_segments_jax)(ev.strain, cand[..., 8])

    # physics expected SNR of each CANDIDATE (what inference can actually
    # compute from upstream medians): amplitude-only chain on default ASD.
    # Dead slots carry zero params — clamp masses/distance/spins into the
    # waveform's validity region before the amplitude chain (same
    # discipline as physics_features).
    asd = default_network_asd()
    safe = jnp.concatenate(
        [jnp.maximum(cand[..., :3], 1.0), cand[..., 3:9],
         jnp.clip(cand[..., 9:], -0.99, 0.99)], axis=-1)
    snr_est = jnp.nan_to_num(jax.vmap(
        lambda q: signal_snr_amp_only(q, asd))(
        safe.reshape(-1, safe.shape[-1]))).reshape(cand.shape[:2])

    # normalized priority target: per-signal SNR / event max
    tmax = jnp.max(ev.sig_snr, axis=1, keepdims=True)
    targets = ev.sig_snr / jnp.maximum(tmax, 1e-6)
    return segs, cand, mask, targets, ev.sig_snr, snr_est


def fit_priority(outdir: str | Path, cfg: PriorityTrainConfig =
                 PriorityTrainConfig(), steps: int = 500, seed: int = 0,
                 eval_every: int = 100):
    """Train PriorityNet; returns (params, history). Saves params (msgpack)
    + history.json under outdir."""
    from flax.serialization import to_bytes
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)

    net = PriorityNet(d_model=cfg.d_model, use_energy=cfg.use_energy,
                      use_snr_est=cfg.use_snr_est, use_dt=cfg.use_dt,
                      residual_snr=cfg.residual_snr)
    key = jax.random.PRNGKey(seed)
    k_init, key = jax.random.split(key)
    # jitted: eager batch synthesis runs the waveform kernel per-primitive
    # on the experimental axon TPU backend (UNIMPLEMENTED ops)
    segs, cand, mask, targets, _snr, snr_est = jax.jit(
        lambda k: make_priority_batch(k, cfg))(k_init)
    params = jax.jit(lambda k, s, c, m, se: net.init(
        k, s, c, m, with_aux=True, snr_est=se))(
        k_init, segs, cand, mask, snr_est)
    # cosine decay to 5% peak: the flat-LR run plateaus by ~3k steps with
    # near-tie pairs still at chance (the [0,0.1) separation bin) — the
    # decayed tail lets the margin loss settle those pairs
    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.lr, min(100, steps // 10), max(steps, 2), 0.05 * cfg.lr)
    tx = optax.adam(sched)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        segs, cand, mask, targets, snr, snr_est = make_priority_batch(
            key, cfg)

        def loss_fn(p):
            scores, sigma, aux = net.apply(p, segs, cand, mask,
                                           with_aux=True, snr_est=snr_est)
            return ranking_loss(scores, targets, sigma, mask,
                                aux=aux, snr=snr,
                                close_boost=cfg.close_boost)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def eval_metrics(params, key):
        segs, cand, mask, targets, _snr, snr_est = make_priority_batch(
            key, cfg)
        scores, _ = net.apply(params, segs, cand, mask, snr_est=snr_est)
        # top-1 accuracy on events with >= 2 live candidates
        multi = jnp.sum(mask, axis=1) >= 2
        top_pred = jnp.argmax(jnp.where(mask > 0, scores, -jnp.inf), axis=1)
        top_true = jnp.argmax(jnp.where(mask > 0, targets, -jnp.inf),
                              axis=1)
        acc = (jnp.sum((top_pred == top_true) * multi)
               / jnp.maximum(jnp.sum(multi), 1.0))
        return acc

    history = []
    t0 = time.time()
    for i in range(steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        if (i + 1) % eval_every == 0 or i == 0:
            acc = float(eval_metrics(params, jax.random.fold_in(
                jax.random.PRNGKey(seed + 999), i)))
            rec = {"step": i + 1, "loss": float(loss), "top1_acc": acc,
                   "seconds": round(time.time() - t0, 1)}
            history.append(rec)
            log.info("step %4d | loss %.4f | top-1 %.3f", i + 1,
                     rec["loss"], acc)

    (outdir / "priority_params.msgpack").write_bytes(to_bytes(params))
    (outdir / "net.json").write_text(json.dumps(
        {"d_model": cfg.d_model, "use_energy": cfg.use_energy,
         "use_snr_est": cfg.use_snr_est, "use_dt": cfg.use_dt,
         "residual_snr": cfg.residual_snr,
         "train": {"close_boost": cfg.close_boost,
                   "mine_pool": cfg.mine_pool}}))
    (outdir / "history.json").write_text(json.dumps(history, indent=2))
    return params, history


def load_priority_net(path: str | Path, d_model: int = 64,
                      use_energy: bool = False,
                      use_snr_est: bool = False):
    """-> (net, params) (reference load_priority_net:
    priority_net.py:1161). A net.json sidecar beside the msgpack (written
    by fit_priority since v4) overrides the architecture kwargs, so v2/v3
    (no energy branch) and v4+ checkpoints both load with defaults."""
    from flax.serialization import from_bytes
    use_dt = residual_snr = False
    meta = Path(path).parent / "net.json"
    if meta.exists():
        m = json.loads(meta.read_text())
        d_model = m.get("d_model", d_model)
        use_energy = m.get("use_energy", use_energy)
        use_snr_est = m.get("use_snr_est", use_snr_est)
        use_dt = m.get("use_dt", False)
        residual_snr = m.get("residual_snr", False)
    net = PriorityNet(d_model=d_model, use_energy=use_energy,
                      use_snr_est=use_snr_est, use_dt=use_dt,
                      residual_snr=residual_snr)
    dummy = net.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 2, 3, SEG_LEN)), jnp.ones((1, 2, 11)),
                     jnp.ones((1, 2)), with_aux=True,
                     snr_est=jnp.ones((1, 2)))
    params = from_bytes(dummy, Path(path).read_bytes())
    return net, params


if __name__ == "__main__":
    # CLI for reproducible PriorityNet runs:
    #   python -m posteriflow_tpu.train.train_priority --outdir model/priority_v6 \
    #       --steps 20000 --close-boost 3.0
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--outdir", default="model/priority_v6")
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--close-boost", type=float, default=0.0)
    ap.add_argument("--mine-pool", type=int, default=1)
    ap.add_argument("--v7", action="store_true",
                    help="use_dt + residual_snr (v7 architecture)")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    a = ap.parse_args()
    if a.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-train")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    logging.basicConfig(level=logging.INFO)
    fit_priority(a.outdir,
                 PriorityTrainConfig(close_boost=a.close_boost, lr=a.lr,
                                     mine_pool=a.mine_pool,
                                     use_dt=a.v7, residual_snr=a.v7),
                 steps=a.steps, seed=a.seed)
