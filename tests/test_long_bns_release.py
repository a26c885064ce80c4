"""Release packaging for the long-BNS v2 model (scripts/release_long_bns_v2).

The long-BNS trainer writes a plain run dir (params/history/calibration);
the release script copies it and records config + gate provenance in
meta.json, refusing to release over a failing gate battery (reference
analog: the self-contained best_model.pth bundle,
experiments/train_lean_npe.py:423-427).
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

import release_long_bns_v2


def _fake_run(tmp_path, steps=50000):
    run = tmp_path / "run"
    run.mkdir()
    (run / "params.msgpack").write_bytes(b"\x00fake")
    (run / "history.json").write_text(json.dumps(
        [{"step": steps, "train_nll": -4.0, "val_nll": -4.1,
          "seconds": 1000.0}]))
    (run / "calibration.json").write_text(json.dumps(
        {"config": {"d_model": 128, "n_layers": 4, "duration": 64.0,
                    "n_bands": 64, "per_band": 32}}))
    return run


def test_release_roundtrip(tmp_path):
    run = _fake_run(tmp_path)
    rep = tmp_path / "reports"
    rep.mkdir()
    (rep / "report.json").write_text(json.dumps(
        {"passed": True, "metrics": {"val_nll": -4.1}}))
    out = tmp_path / "rel"
    rc = release_long_bns_v2.main(["--run", str(run), "--out", str(out),
                                   "--report", str(rep)])
    assert rc == 0
    meta = json.loads((out / "meta.json").read_text())
    assert meta["trained_steps"] == 50000
    assert meta["gates_all_passed"] is True
    assert meta["config"]["n_bands"] == 64
    assert (out / "params.msgpack").read_bytes() == b"\x00fake"


def test_release_refuses_failing_gates(tmp_path):
    run = _fake_run(tmp_path)
    rep = tmp_path / "reports"
    rep.mkdir()
    (rep / "report.json").write_text(json.dumps({"passed": False}))
    rc = release_long_bns_v2.main(["--run", str(run),
                                   "--out", str(tmp_path / "rel"),
                                   "--report", str(rep)])
    assert rc == 1
    assert not (tmp_path / "rel").exists()


def test_release_pending_battery(tmp_path):
    run = _fake_run(tmp_path, steps=700)
    out = tmp_path / "rel"
    rc = release_long_bns_v2.main(["--run", str(run), "--out", str(out),
                                   "--report", str(tmp_path / "missing")])
    assert rc == 0
    meta = json.loads((out / "meta.json").read_text())
    assert meta["gate_battery"] == "PENDING"
    assert meta["gates_all_passed"] is None
