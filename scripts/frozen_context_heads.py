#!/usr/bin/env python3
"""Controlled experiment: frozen encoder, several posterior heads on
IDENTICAL contexts — attributes bias to the encoder vs the flow.

Reference analog: experiments/frozen_context_heads.py (NSF small/large +
MDN heads on frozen contexts). Heads here: coupling-NSF small, coupling-NSF
large, and a Gaussian mixture density head. If all heads show the same
bias, the encoder is the bottleneck; if they differ, the head is.

Usage:
  python scripts/frozen_context_heads.py --ckpt model/run/ckpt --steps 300
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--name", default="best")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="analysis/frozen_context_heads.json")
    args = ap.parse_args(argv)

    from posteriflow_tpu.utils.logging import setup_logging
    log = setup_logging()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from posteriflow_tpu.models.flow import CouplingNSF
    from posteriflow_tpu.models.npe import LeanNPE
    from posteriflow_tpu.physics.simulator import simulate_batch
    from posteriflow_tpu.scaler import ParamScaler
    from posteriflow_tpu.train.checkpoints import CheckpointManager

    state, cfg, _ = CheckpointManager(args.ckpt).restore(args.name)
    model = LeanNPE(cfg.npe)
    scaler = ParamScaler(cfg.npe.param_names, premerger=cfg.npe.premerger)
    ctx_dim = cfg.npe.context_dim
    n_params = cfg.npe.n_params

    @jax.jit
    def make_batch(key):
        """(frozen contexts, normalized rank-0 params, live mask)."""
        b = simulate_batch(key, args.batch, cfg.sim)
        asd = b.asd_bands if cfg.npe.uses_asd_bands else None
        ctx = model.apply(state.params, b.strain, asd,
                          method=LeanNPE.encode)
        y = scaler.normalize(b.params[:, 0, :])
        live = (b.n_sig > 0).astype(jnp.float32)
        return ctx, y, live

    class MDNHead(nn.Module):
        n_comp: int = 8

        @nn.compact
        def __call__(self, ctx, y):
            h = nn.gelu(nn.Dense(128)(ctx))
            h = nn.gelu(nn.Dense(128)(h))
            logits = nn.Dense(self.n_comp)(h)
            mu = nn.Dense(self.n_comp * n_params)(h).reshape(
                -1, self.n_comp, n_params)
            sig = nn.softplus(nn.Dense(self.n_comp * n_params)(h)).reshape(
                -1, self.n_comp, n_params) + 1e-3
            comp_lp = (-0.5 * jnp.sum(((y[:, None] - mu) / sig) ** 2, -1)
                       - jnp.sum(jnp.log(sig), -1)
                       - 0.5 * n_params * jnp.log(2 * jnp.pi))
            return -jax.scipy.special.logsumexp(
                jax.nn.log_softmax(logits) + comp_lp, axis=-1)

    class FlowHead(nn.Module):
        layers: int = 4
        hidden: int = 64

        def setup(self):
            self.flow = CouplingNSF(features=n_params,
                                    context_features=ctx_dim,
                                    num_layers=self.layers,
                                    hidden=self.hidden, num_bins=8)

        def __call__(self, ctx, y):
            return -self.flow.log_prob(y, ctx)

    heads = {
        "nsf_small": FlowHead(layers=4, hidden=64),
        "nsf_large": FlowHead(layers=8, hidden=128),
        "mdn": MDNHead(),
    }

    results = {}
    key = jax.random.PRNGKey(args.seed)
    ctx0, y0, _ = make_batch(key)
    for name, head in heads.items():
        params = head.init(jax.random.PRNGKey(1), ctx0, y0)
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, key, head=head):
            ctx, y, live = make_batch(key)

            def loss_fn(p):
                nll = head.apply(p, ctx, y)
                return jnp.sum(nll * live) / jnp.maximum(jnp.sum(live), 1.)

            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, up), opt, loss

        losses = []
        for i in range(args.steps):
            key, k = jax.random.split(key)
            params, opt, loss = step(params, opt, k)
            losses.append(float(loss))
        results[name] = {
            "initial_nll": float(np.mean(losses[:20])),
            "final_nll": float(np.mean(losses[-20:])),
        }
        log.info("%-10s NLL %.3f -> %.3f", name,
                 results[name]["initial_nll"], results[name]["final_nll"])

    spread = max(r["final_nll"] for r in results.values()) \
        - min(r["final_nll"] for r in results.values())
    report = {"heads": results, "final_nll_spread": spread,
              "interpretation": ("heads agree -> encoder-limited"
                                 if spread < 0.5 else
                                 "heads diverge -> head-limited"),
              "steps": args.steps}
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    log.info("spread %.3f: %s", spread, report["interpretation"])
    return report


if __name__ == "__main__":
    main()
