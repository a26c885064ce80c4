#!/usr/bin/env python3
"""Toy 2-D NPE: chirp-mass/mass-ratio RealNVP flow on IMR injections in
Gaussian noise — BASELINE configs[0], the minimum end-to-end slice
(SURVEY.md §7): simulate → encode → flow → NLL → sample → PP-plot, one
device, CPU-runnable, fixed seed.

Run:  python examples/toy_2d_npe.py [--steps 600] [--out /tmp/toy2d]
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from posteriflow_tpu.physics.constants import FREQS, N_SAMPLES
from posteriflow_tpu.physics.psd import aligo_psd, asd_from_psd
from posteriflow_tpu.physics.waveforms.imr import imr_polarizations
from posteriflow_tpu.physics.whiten import fd_white_to_td, whiten_fd

_FREQS = jnp.asarray(FREQS, dtype=jnp.float32)
ASD = asd_from_psd(aligo_psd(FREQS))
MC_RANGE = (10.0, 40.0)
Q_RANGE = (0.4, 1.0)


def mc_q_to_masses(mc, q):
    m1 = mc * (1 + q) ** 0.2 / q ** 0.6
    return m1, q * m1


def simulate(key, batch):
    """theta=(Mc, q) ~ uniform -> single-detector whitened strain [B, T]."""
    k_t, k_n = jax.random.split(key)
    u = jax.random.uniform(k_t, (batch, 2))
    mc = MC_RANGE[0] + u[:, 0] * (MC_RANGE[1] - MC_RANGE[0])
    q = Q_RANGE[0] + u[:, 1] * (Q_RANGE[1] - Q_RANGE[0])
    m1, m2 = mc_q_to_masses(mc, q)

    def one(m1, m2):
        hp, _ = imr_polarizations(_FREQS, m1, m2, 0.0, 0.0, 600.0, 0.0, 0.0)
        h_w = whiten_fd(hp * jnp.exp(-2j * jnp.pi
                                     * jnp.mod(_FREQS * 2.0, 1.0)), ASD)
        return fd_white_to_td(h_w, N_SAMPLES)

    sig = jax.vmap(one)(m1, m2)
    strain = sig + jax.random.normal(k_n, sig.shape)
    theta = jnp.stack([mc, q], axis=1)
    # normalize theta to [-1, 1]
    lo = jnp.asarray([MC_RANGE[0], Q_RANGE[0]])
    hi = jnp.asarray([MC_RANGE[1], Q_RANGE[1]])
    y = 2 * (theta - lo) / (hi - lo) - 1
    return strain, y


class ToyModel(nn.Module):
    """Tiny conv encoder + 6-layer RealNVP (affine coupling) on 2 params."""
    n_layers: int = 6
    hidden: int = 64
    ctx: int = 32

    def setup(self):
        self.convs = [nn.Conv(f, kernel_size=(k,), strides=(s,),
                              padding="VALID")
                      for f, k, s in ((8, 64, 8), (16, 16, 4), (32, 8, 4))]
        self.proj = nn.Dense(self.ctx)
        self.nets = [nn.Sequential([nn.Dense(self.hidden), nn.gelu,
                                    nn.Dense(2)]) for _ in
                     range(self.n_layers)]

    def encode(self, strain):
        h = jnp.arcsinh(strain)[..., None]
        for c in self.convs:
            h = nn.gelu(c(h))
        return self.proj(h.reshape(h.shape[0], -1))

    def _couple(self, i, a, ctx):
        """scale/shift for the transformed coordinate from (kept coord,
        ctx)."""
        out = self.nets[i](jnp.concatenate([a[:, None], ctx], axis=-1))
        s = jnp.tanh(out[:, 0])          # bounded log-scale
        t = out[:, 1]
        return s, t

    def forward(self, y, ctx):
        """y -> z with logdet; alternate which coordinate transforms."""
        ld = jnp.zeros(y.shape[0])
        a, b = y[:, 0], y[:, 1]
        for i in range(self.n_layers):
            s, t = self._couple(i, a, ctx)
            b = b * jnp.exp(s) + t
            ld = ld + s
            a, b = b, a
        z = jnp.stack([a, b], axis=1)
        return z, ld

    def inverse(self, z, ctx):
        a, b = z[:, 0], z[:, 1]
        for i in reversed(range(self.n_layers)):
            a, b = b, a
            s, t = self._couple(i, a, ctx)
            b = (b - t) * jnp.exp(-s)
        return jnp.stack([a, b], axis=1)

    def nll(self, strain, y):
        ctx = self.encode(strain)
        z, ld = self.forward(y, ctx)
        return jnp.mean(0.5 * jnp.sum(z ** 2, axis=1) - ld
                        + jnp.log(2 * jnp.pi))

    def sample(self, key, strain, n):
        ctx = self.encode(strain)
        b = ctx.shape[0]
        z = jax.random.normal(key, (b * n, 2))
        ctx_rep = jnp.repeat(ctx, n, axis=0)
        return self.inverse(z, ctx_rep).reshape(b, n, 2)

    def __call__(self, strain, y):
        return self.nll(strain, y)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--out", default="/tmp/toy2d")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    model = ToyModel()
    key = jax.random.PRNGKey(args.seed)
    strain0, y0 = simulate(key, args.batch)
    params = model.init(key, strain0, y0)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        strain, y = simulate(key, args.batch)
        loss, g = jax.value_and_grad(
            lambda p: model.apply(p, strain, y))(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    losses = []
    for i in range(args.steps):
        key, k = jax.random.split(key)
        params, opt, loss = step(params, opt, k)
        losses.append(float(loss))
        if (i + 1) % 100 == 0:
            print(f"step {i+1:4d}  nll {np.mean(losses[-100:]):.3f}")

    # PP-plot calibration check on fresh events
    k_val, k_s = jax.random.split(jax.random.PRNGKey(args.seed + 1))
    strain, y_true = simulate(k_val, 200)
    samples = jax.jit(lambda p, k, s: model.apply(p, k, s, 256,
                                                  method=ToyModel.sample)
                      )(params, k_s, strain)
    ranks = np.sum(np.asarray(samples) < np.asarray(y_true)[:, None, :],
                   axis=1)
    cov = {}
    for level in (0.5, 0.9):
        lo = np.quantile(np.asarray(samples), 0.5 - level / 2, axis=1)
        hi = np.quantile(np.asarray(samples), 0.5 + level / 2, axis=1)
        cov[level] = ((np.asarray(y_true) >= lo)
                      & (np.asarray(y_true) <= hi)).mean(axis=0)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    from posteriflow_tpu.inference.plots import pp_plot
    pp_plot(ranks, None, 256, out / "pp.png", param_names=("Mc", "q"))
    summary = {"final_nll": float(np.mean(losses[-50:])),
               "initial_nll": float(np.mean(losses[:20])),
               "cov50": cov[0.5].tolist(), "cov90": cov[0.9].tolist()}
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
