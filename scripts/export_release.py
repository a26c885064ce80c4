"""Export a trained checkpoint as a git-committable release directory.

A release dir is the durable deployment format the inference engine loads
directly (pipeline.py:59-66): params.msgpack (flax to_bytes) + meta.json
(full TrainConfig + best-epoch metrics) + history.json + ood_stats.npz.
The reference's analog is the self-contained best_model.pth bundling
weights+args+diagnostics (reference: experiments/train_lean_npe.py:423-427).

Usage:
  python scripts/export_release.py --ckpt model/npe_r4/ckpt \
      --run-dir model/npe_r4 --out model_release/npe_r4_best
"""
from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True, help="CheckpointManager root")
    ap.add_argument("--name", default="best")
    ap.add_argument("--run-dir", default=None,
                    help="training run dir holding history.json")
    ap.add_argument("--out", required=True, help="release dir to write")
    ap.add_argument("--init-from", default=None,
                    help="warm-restart parent checkpoint/release (provenance"
                         " override when the run's meta lacks it)")
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")   # pure host-side re-pack
    from flax.serialization import to_bytes

    from posteriflow_tpu.train.checkpoints import CheckpointManager

    cm = CheckpointManager(args.ckpt)
    state, _cfg, meta = cm.restore(args.name)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "params.msgpack").write_bytes(to_bytes(state.params))
    if args.init_from:
        meta.setdefault("metrics", {})["init_from"] = args.init_from
    (out / "meta.json").write_text(json.dumps(meta, indent=1))

    ood = Path(args.ckpt) / "ood_stats.npz"
    if ood.exists():
        shutil.copy(ood, out / "ood_stats.npz")
    else:
        print(f"WARNING: {ood} missing — run validate_checkpoint first "
              "so the release ships armed OOD statistics", file=sys.stderr)

    if args.run_dir:
        hist = Path(args.run_dir) / "history.json"
        if hist.exists():
            shutil.copy(hist, out / "history.json")

    # round-trip load check: the committed artifact must reconstruct
    params, cfg2, meta2 = CheckpointManager.load_release(out)
    n = sum(x.size for x in jax.tree.leaves(params))
    print(f"release {out}: {n:,} params, epoch {meta2.get('epoch')}, "
          f"d_model {cfg2.npe.d_model}")


if __name__ == "__main__":
    main()
