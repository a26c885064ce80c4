#!/usr/bin/env python3
"""Package model/long_bns_v2 as model_release/long_bns_v2 (+ meta).

The long-BNS trainer (scripts/train_long_bns.py) writes a plain
params.msgpack + history.json + calibration.json run dir — not the
orbax CheckpointManager layout scripts/export_release.py re-packs — so
this release is a verified copy plus a meta.json recording the full run
config, final metrics, gate-battery pointer, and provenance (ADVICE r3:
releases must record how they were produced). Reference analog: the
self-contained best_model.pth bundle (experiments/train_lean_npe.py:423-427).

Usage: python scripts/release_long_bns_v2.py \
          [--run model/long_bns_v2] [--out model_release/long_bns_v2] \
          [--report reports/val_long_bns]
"""
from __future__ import annotations

import argparse
import json
import shutil
import sys
from datetime import datetime, timezone
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run", default="model/long_bns_v2")
    ap.add_argument("--out", default="model_release/long_bns_v2")
    ap.add_argument("--report", default="reports/val_long_bns")
    ap.add_argument(
        "--init-from",
        default="model/long_bns_v2 step-700 smoke (same run dir, "
                "fresh opt state on resume)",
        help="provenance string: what checkpoint the run warm-started from")
    args = ap.parse_args(argv)

    run = Path(args.run)
    out = Path(args.out)
    report = Path(args.report) / "report.json"

    cal = json.loads((run / "calibration.json").read_text())
    history = json.loads((run / "history.json").read_text())
    gates = json.loads(report.read_text()) if report.exists() else None
    if gates is not None and not gates.get("passed"):
        print(f"refusing to release: {report} has failing gates",
              file=sys.stderr)
        return 1

    out.mkdir(parents=True, exist_ok=True)
    for f in ("params.msgpack", "history.json", "calibration.json"):
        shutil.copy2(run / f, out / f)

    is_v4 = (cal["config"].get("tokens", {}).get("kind") == "trigger")
    meta = {
        "model": "LongBNSNPEv4" if is_v4 else "LongBNSNPE",
        "config": cal["config"],
        "final": history[-1],
        "trained_steps": history[-1]["step"],
        "init_from": args.init_from,
        "gate_battery": str(report) if gates is not None else "PENDING",
        "gates_all_passed": None if gates is None else gates["passed"],
        "exported_utc": datetime.now(timezone.utc).isoformat(
            timespec="seconds"),
    }
    (out / "meta.json").write_text(json.dumps(meta, indent=1))
    print(f"released {out} (steps={meta['trained_steps']}, "
          f"gates={'PENDING' if gates is None else gates['passed']})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
