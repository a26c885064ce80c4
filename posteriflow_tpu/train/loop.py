"""The training loop: epochs of jitted simulate+train steps, per-epoch
diagnostics, calibration-gated checkpoint selection, history.json.

TPU-native restatement of the reference trainer main loop
(experiments/train_lean_npe.py:343-431) plus the README-spec gated
checkpointing the snapshot lacks (SURVEY.md §2.4):

  - fixed deterministic validation batch (same key every epoch) so metrics
    compare across epochs (reference: fixed Gaussian val, :258-260);
  - per-epoch diagnostics: shuffle-ΔNLL, dist_corr, coverage (:130-178);
  - per-epoch calibration gate: railing, base_conc, cov90[_highsnr], SBC;
  - checkpoints: last + periodic epoch_XXXX + gated best (README spec);
  - history.json updated every epoch (:428-429).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Callable, Optional

import jax
import numpy as np

from posteriflow_tpu.physics.simulator import simulate_batch
from posteriflow_tpu.train.checkpoints import CheckpointManager
from posteriflow_tpu.train.diagnostics import make_diagnostics
from posteriflow_tpu.train.gates import (CalibrationGate, evaluate_gate,
                                         make_calibration_metrics,
                                         select_best)
from posteriflow_tpu.train.trainer import (TrainConfig, init_state,
                                           make_eval_nll, make_train_epoch)

log = logging.getLogger("posteriflow.train")


def _merge_params(fresh, loaded):
    """Shape-tolerant weight transfer: copy every loaded leaf whose path
    AND shape match the fresh init; keep the fresh init elsewhere.

    This is the surgery entry point for cross-dimensional warm starts —
    e.g. initializing the 15-D precessing flagship's ENCODER from an 11-D
    release while its flow (different feature count) trains from scratch.
    Returns (merged, n_transferred, n_total)."""
    f_flat = dict(jax.tree_util.tree_flatten_with_path(fresh)[0])
    l_flat = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    merged, kept = {}, 0
    for path, leaf in f_flat.items():
        cand = l_flat.get(path)
        if cand is not None and getattr(cand, "shape", None) == leaf.shape:
            merged[path] = cand
            kept += 1
        else:
            merged[path] = leaf
    treedef = jax.tree_util.tree_structure(fresh)
    out = jax.tree_util.tree_unflatten(
        treedef, [merged[p] for p, _ in
                  jax.tree_util.tree_flatten_with_path(fresh)[0]])
    return out, kept, len(f_flat)


def fit(cfg: TrainConfig, outdir: str | Path, epochs: int = 60,
        steps_per_epoch: int = 200, seed: int = 0, mesh=None,
        gate: CalibrationGate = CalibrationGate(), ckpt_every: int = 0,
        n_val_events: int = 256, init_from: Optional[str] = None,
        resume_from: Optional[str] = None,
        val_batch_fn: Optional[Callable] = None, bank=None,
        on_epoch_end: Optional[Callable[[dict], None]] = None):
    """Train LeanNPE; returns (best_state, history).

    val_batch_fn(key) -> EventBatch overrides the default Gaussian-domain
    validation synthesis. Passing a NoiseBank enables real-noise training
    mixing (cfg.sim.real_noise_prob) AND a fixed deterministic real-noise
    validation domain; the selection metric then averages the Gaussian and
    real-noise val NLL (reference: train_lean_npe.py:417-421 — deployment
    robustness without losing simulated-domain performance)."""
    from posteriflow_tpu.utils.logging import quiet_dependency_logs
    quiet_dependency_logs()
    outdir = Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    ckpts = CheckpointManager(outdir / "ckpt")

    key = jax.random.PRNGKey(seed)
    k_init, k_val, k_diag, key = jax.random.split(key, 4)

    state = init_state(k_init, cfg)
    epoch_offset = 0
    prior_history: list = []
    if resume_from:
        # TRUE resume: full TrainState (params + optimizer + schedule step)
        # — no LR-restart penalty. The config must match the checkpoint's.
        state, ck_cfg, meta = CheckpointManager(
            Path(resume_from).parent).restore(Path(resume_from).name)
        if ck_cfg != cfg:
            log.warning("resume config differs from checkpoint config; "
                        "optimizer state assumed layout-compatible")
        # continuity: seed history from the run being resumed and offset
        # epoch numbering, so history.json keeps prior epochs and the
        # gated best-selection still sees the pre-resume best (otherwise
        # 'best' could be silently replaced by a worse post-resume epoch)
        epoch_offset = int(meta.get("epoch") or 0)
        prev_hist = Path(resume_from).parent.parent / "history.json"
        if prev_hist.exists():
            prior_history = json.loads(prev_hist.read_text())
            prior_history = [r for r in prior_history
                             if r.get("epoch", 0) <= epoch_offset]
        elif meta:
            prior_history = [dict(meta)]
        log.info("resuming from %s (epoch %s, step %s, %d prior history "
                 "records)", resume_from, epoch_offset, int(state.step),
                 len(prior_history))
    elif init_from:
        if (Path(init_from) / "params.msgpack").exists():
            # release export (git-committed msgpack): weights only, fresh
            # optimizer under cfg — the durable fine-tune entry point
            params, _r_cfg, meta = CheckpointManager.load_release(init_from)
            params, n_kept, n_total = _merge_params(state.params, params)
            state = state.replace(params=params)
        else:
            state, meta = CheckpointManager(Path(init_from).parent) \
                .fine_tune_restore(Path(init_from).name, cfg)
            n_kept = n_total = sum(
                1 for _ in jax.tree_util.tree_leaves(state.params))
        log.info("fine-tuning from %s (epoch %s, %d/%d leaves transferred)",
                 init_from, meta.get("epoch"), n_kept, n_total)
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    log.info("LeanNPE parameters: %s", f"{n_params:,}")

    # all steps of an epoch scan inside ONE jitted program (one dispatch
    # per epoch — the per-step host dispatch otherwise bottlenecks the
    # tunneled chip at ~7.5 steps/s vs 71.7 device-bound)
    epoch_fn = make_train_epoch(cfg, steps_per_epoch, mesh=mesh,
                                with_bank=bank is not None)
    eval_nll = make_eval_nll(cfg)
    diagnostics = make_diagnostics(cfg, n_events=n_val_events)
    # build the gate-metrics jit ONCE: evaluate_gate would otherwise
    # construct a fresh closure (full retrace) every epoch
    cal_metrics_fn = make_calibration_metrics(cfg)

    # fixed deterministic validation batch (Gaussian domain)
    sim_fn = jax.jit(lambda k: simulate_batch(k, n_val_events, cfg.sim))
    if val_batch_fn is None:
        val_batch = sim_fn(k_val)
    else:
        val_batch = val_batch_fn(k_val)

    # fixed real-noise validation domain (reference: materialized once,
    # train_lean_npe.py:262-285)
    val_real = None
    if bank is not None:
        import dataclasses as _dc
        real_cfg = _dc.replace(cfg.sim, real_noise_prob=1.0)
        val_real = jax.jit(lambda k: simulate_batch(
            k, n_val_events, real_cfg, bank=bank))(
            jax.random.fold_in(k_val, 1))

    history = list(prior_history)
    best_epoch = -1
    for epoch in range(epoch_offset + 1, epoch_offset + epochs + 1):
        t0 = time.time()
        key, k_epoch = jax.random.split(key)
        if bank is not None:
            state, m = epoch_fn(state, k_epoch, bank)
        else:
            state, m = epoch_fn(state, k_epoch)
        train_nll = float(m["nll"])
        grad_norm = float(m["grad_norm"])

        val = float(eval_nll(state.params, val_batch))
        diag = diagnostics(state.params, val_batch, k_diag)
        diag_f = {k: float(v) for k, v in diag.items()
                  if not hasattr(v, "shape") or v.ndim == 0}
        cal = evaluate_gate(cfg, state.params, val_batch, k_diag, gate,
                            metrics_fn=cal_metrics_fn)

        real_metrics = {}
        select = val
        if val_real is not None:
            real_nll = float(eval_nll(state.params, val_real))
            dr = diagnostics(state.params, val_real, k_diag)
            real_metrics = {"real_val_nll": real_nll,
                            **{f"real_{k}": float(v) for k, v in dr.items()
                               if not hasattr(v, "shape") or v.ndim == 0}}
            select = 0.5 * (val + real_nll)

        rec = {
            # warm-restart/resume provenance: a fine-tuned release must be
            # distinguishable from a from-scratch run (ADVICE r3); these
            # land in every checkpoint meta.json and hence every export
            **({"init_from": str(init_from)} if init_from else {}),
            **({"resume_from": str(resume_from)} if resume_from else {}),
            "epoch": epoch, "train_nll": train_nll, "select_nll": select,
            "val_nll": val, **real_metrics, "grad_norm": grad_norm,
            **{k: float(v) for k, v in m.items() if k.startswith("gn_")},
            "lr_step": int(state.step),
            "epoch_seconds": round(time.time() - t0, 1),
            **diag_f,
            "spurious_railing": cal["spurious_railing"],
            "base_conc": cal["base_conc"],
            "cov90_mean": cal["cov90_mean"],
            "cov90_highsnr_mean": cal["cov90_highsnr_mean"],
            "sbc_pass_frac": cal["sbc_pass_frac"],
            "gate_passed": cal["gate_passed"],
            "cov50_all": np.asarray(diag["cov50_all"]).round(3).tolist(),
            "cov90_all": np.asarray(diag["cov90_all"]).round(3).tolist(),
        }
        history.append(rec)
        log.info(
            "epoch %3d | train %.3f | val %.3f | shufΔ %+.3f | dcorr %+.3f"
            " | dcov50/90 %.2f/%.2f | rail %.3f | conc %.2f | gate %s | %ds",
            epoch, train_nll, val, rec["shuffle_delta_nll"],
            rec["dist_corr"], rec["dist_cov50"], rec["dist_cov90"],
            rec["spurious_railing"], rec["base_conc"],
            "PASS" if rec["gate_passed"] else "fail",
            int(rec["epoch_seconds"]))

        ckpts.save("last", state, cfg, rec, epoch)
        if ckpt_every and epoch % ckpt_every == 0:
            ckpts.save(f"epoch_{epoch:04d}", state, cfg, rec, epoch)
        if select_best(history) == epoch:
            best_epoch = epoch
            ckpts.save("best", state, cfg, rec, epoch)

        (outdir / "history.json").write_text(json.dumps(history, indent=2))
        if on_epoch_end:
            on_epoch_end(rec)

    log.info("done. best epoch %d -> %s", best_epoch,
             outdir / "ckpt" / "best")
    return state, history
