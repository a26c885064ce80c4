"""Release checklist: the model-specific evidence artifacts committed in
analysis/ must match the CURRENT flagship (model_release/FLAGSHIP).

VERDICT r3 weak-#3 / missing-#3: the refinement gate was armed with a
twin-grid bias map measured on an older flagship (r3 map gating r5), and
anchors lagged two flagships (r2) — freshness bugs nothing caught because
artifacts didn't record their generating checkpoint. These tests make the
drift a CI failure (reference analog: gating.py consumes a measured,
model-specific map — reference src/ahsd/inference/gating.py:36-67).

An artifact may be legitimately mid-regeneration: either set
POSTERIFLOW_ALLOW_STALE_ARTIFACTS=1, or commit an
analysis/REGENERATION_PENDING file naming the flagship the artifacts are
being regenerated FOR (removed when the refreshed artifacts land) — the
drift is then declared, not silent.
"""

import json
import os
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

_ARTIFACTS = ("analysis/twin_grid.json", "analysis/anchors.json",
              "analysis/importance_validation.json")


def _flagship() -> Path:
    ptr = (REPO / "model_release" / "FLAGSHIP").read_text().strip()
    return REPO / "model_release" / ptr


def _skip_or_fail(msg):
    if os.environ.get("POSTERIFLOW_ALLOW_STALE_ARTIFACTS"):
        pytest.skip(f"stale artifact allowed by env: {msg}")
    pending = REPO / "analysis" / "REGENERATION_PENDING"
    if pending.exists():
        target = pending.read_text().strip()
        if target == (REPO / "model_release" / "FLAGSHIP"
                      ).read_text().strip():
            pytest.skip(f"regeneration declared pending for {target}: {msg}")
        pytest.fail(f"REGENERATION_PENDING names {target!r} but the "
                    f"flagship moved on — {msg}")
    pytest.fail(msg)


def test_flagship_pointer_resolves():
    f = _flagship()
    assert (f / "params.msgpack").exists(), f
    assert (f / "meta.json").exists(), f
    assert (f / "ood_stats.npz").exists(), \
        f"{f} ships no armed OOD statistics"


@pytest.mark.parametrize("artifact", _ARTIFACTS)
def test_artifact_matches_flagship(artifact):
    from posteriflow_tpu.utils.provenance import (check_artifact_matches,
                                                  config_hash)
    p = REPO / artifact
    if not p.exists():
        _skip_or_fail(f"{artifact} missing")
    meta = json.loads(p.read_text()).get("_meta")
    flagship = _flagship()
    try:
        check_artifact_matches(meta, flagship, artifact_name=artifact)
    except ValueError as e:
        _skip_or_fail(str(e))


def test_flagship_meta_has_provenance():
    """A fine-tuned flagship must record its parent (ADVICE r3)."""
    meta = json.loads((_flagship() / "meta.json").read_text())
    cfg = meta.get("config")
    assert cfg, "release meta lacks the full training config"
    from posteriflow_tpu.utils.provenance import config_hash
    assert len(config_hash(cfg)) == 12
