"""Orbax checkpointing: weights + full config + diagnostics, resumable.

Checkpoint contract follows the reference (train_lean_npe.py:423-427 bundles
model_state_dict + epoch + val_nll + diagnostics + args; loading everywhere
reconstructs the model from saved args: pipeline.py:40-47) and closes its
documented gap — flow hyperparameters ARE stored (the reference warns its
flow size is a hardcoded default not saved, README.md:353-357).

Layout per save:  <dir>/<name>/   (orbax composite)
    state     — TrainState (params + optimizer, so resume is exact;
                the reference deliberately restarts the optimizer on
                fine-tune, which fine_tune_restore() reproduces)
    meta      — JSON: train config, epoch, metrics, gate decisions
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

import jax
import orbax.checkpoint as ocp

from posteriflow_tpu.models.npe import NPEConfig
from posteriflow_tpu.physics.simulator import SimConfig
from posteriflow_tpu.prior import PriorConfig
from posteriflow_tpu.train.trainer import TrainConfig, init_state


def _cfg_to_dict(cfg: TrainConfig) -> dict:
    def enc(x):
        if dataclasses.is_dataclass(x):
            return {k: enc(v) for k, v in dataclasses.asdict(x).items()}
        if isinstance(x, tuple):
            return list(x)
        return x
    return enc(cfg)


def _retuple(cls, kwargs: dict) -> dict:
    """JSON round-trips tuples as lists; coerce back every field whose
    dataclass default is a tuple (so equality survives save/restore)."""
    out = dict(kwargs)
    for f in dataclasses.fields(cls):
        if f.name in out and isinstance(out[f.name], list):
            default = (f.default if f.default is not dataclasses.MISSING
                       else None)
            if isinstance(default, tuple):
                out[f.name] = tuple(out[f.name])
    return out


def cfg_from_dict(d: dict) -> TrainConfig:
    npe = _retuple(NPEConfig, d["npe"])
    sim = dict(d["sim"])
    sim["prior"] = PriorConfig(**_retuple(PriorConfig, sim["prior"]))
    sim = _retuple(SimConfig, sim)
    rest = {k: v for k, v in d.items() if k not in ("npe", "sim")}
    return TrainConfig(npe=NPEConfig(**npe), sim=SimConfig(**sim), **rest)


class CheckpointManager:
    """Named checkpoints under one root: best / last / epoch_XXXX
    (the README-spec checkpoint family, SURVEY.md §2.4 discrepancy note)."""

    def __init__(self, root: str | Path):
        self.root = Path(root).resolve()
        self.root.mkdir(parents=True, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def save(self, name: str, state, cfg: TrainConfig,
             metrics: Optional[dict] = None, epoch: int = 0):
        path = self.root / name
        if path.exists():
            import shutil
            shutil.rmtree(path)
        self._ckpt.save(path / "state", state)
        meta = {"config": _cfg_to_dict(cfg), "epoch": epoch,
                "metrics": jax.tree.map(
                    lambda x: float(x) if hasattr(x, "item") else x,
                    metrics or {})}
        (path / "meta.json").write_text(json.dumps(meta, indent=2))
        self._ckpt.wait_until_finished()

    def load_meta(self, name: str) -> dict:
        return json.loads((self.root / name / "meta.json").read_text())

    def restore(self, name: str):
        """-> (state, cfg, meta). The model is reconstructed from the SAVED
        config (reference semantics: pipeline.py:40-47)."""
        meta = self.load_meta(name)
        cfg = cfg_from_dict(meta["config"])
        target = init_state(jax.random.PRNGKey(0), cfg)
        state = self._ckpt.restore(self.root / name / "state", target=target)
        return state, cfg, meta

    @staticmethod
    def load_release(release_dir: str | Path):
        """Load a git-committed release export (params.msgpack + meta.json
        written by the round logs) -> (params, cfg, meta). Rebuilds the
        param pytree structure from the stored config."""
        from flax.serialization import from_bytes
        release_dir = Path(release_dir)
        meta = json.loads((release_dir / "meta.json").read_text())
        cfg = cfg_from_dict(meta["config"])
        target = init_state(jax.random.PRNGKey(0), cfg)
        params = from_bytes(target.params,
                            (release_dir / "params.msgpack").read_bytes())
        return params, cfg, meta

    def fine_tune_restore(self, name: str, new_cfg: TrainConfig):
        """Weights from the checkpoint, FRESH optimizer/schedule under
        new_cfg (reference --init_from: train_lean_npe.py:290-297)."""
        state, _, meta = self.restore(name)
        fresh = init_state(jax.random.PRNGKey(0), new_cfg)
        return fresh.replace(params=state.params), meta
