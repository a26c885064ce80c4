"""One config system: YAML <-> nested dict <-> typed dataclass tree.

The reference runs three coexisting mechanisms (argparse, YAML
UniversalConfigReader/ConfigDict, dataclass AHSDConfig — SURVEY.md §5
config note); the rebuild's contract is ONE dataclass/pytree config
(TrainConfig and its nested NPEConfig/SimConfig/PriorConfig) serialized
verbatim into checkpoints, with YAML and dot-access convenience on top.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from posteriflow_tpu.train.checkpoints import _cfg_to_dict, cfg_from_dict
from posteriflow_tpu.train.trainer import TrainConfig


class ConfigDict(dict):
    """Nested dict with attribute/dot access (reference ConfigDict:
    utils/universal_config.py:113)."""

    def __getattr__(self, k):
        try:
            v = self[k]
        except KeyError as e:
            raise AttributeError(k) from e
        return ConfigDict(v) if isinstance(v, dict) else v

    def get_path(self, dotted: str, default: Any = None):
        cur: Any = self
        for part in dotted.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return default
            cur = cur[part]
        return cur


def load_config(path: str | Path) -> TrainConfig:
    """YAML/JSON file -> TrainConfig. Unknown keys are rejected (typed
    dataclasses are the schema)."""
    import json
    p = Path(path)
    text = p.read_text()
    if p.suffix in (".yaml", ".yml"):
        import yaml
        raw = yaml.safe_load(text)
    else:
        raw = json.loads(text)
    base = _cfg_to_dict(TrainConfig())
    merged = _deep_merge(base, raw or {})
    return cfg_from_dict(merged)


def save_config(cfg: TrainConfig, path: str | Path):
    import yaml
    Path(path).write_text(yaml.safe_dump(_cfg_to_dict(cfg),
                                         sort_keys=False))


def to_train_config(d: dict) -> TrainConfig:
    return cfg_from_dict(_deep_merge(_cfg_to_dict(TrainConfig()), d))


def _deep_merge(base: dict, override: dict) -> dict:
    out = dict(base)
    for k, v in override.items():
        if k not in out:
            raise KeyError(f"unknown config key: {k!r} "
                           f"(valid: {sorted(out)})")
        if isinstance(v, dict) and isinstance(out[k], dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out
