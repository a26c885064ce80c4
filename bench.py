"""Headline benchmark: posterior sampling throughput (draws/sec/chip).

Reference baseline (BASELINE.md): ~1,120 draws/s — GW150914, 5000 draws in
4.465 s on a laptop, dominated by the nflows autoregressive inverse (110
sequential MADE passes). This framework's coupling flow inverts in one
fused pass per layer; the BASELINE.json target is ≥1e6 draws/s/chip.

Protocol: init the production-size LeanNPE, encode a simulated 3-detector
batch ONCE (amortized NPE — encode is per event, sampling is the hot loop,
reference call stack SURVEY.md §3.1), then time steady-state flow sampling
in physical units (inverse + wrap + denormalize) on-device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp

BASELINE_DRAWS_PER_SEC = 5000.0 / 4.465     # reference GW150914 sampling


def main():
    from posteriflow_tpu.models.npe import LeanNPE
    from posteriflow_tpu.physics.simulator import simulate_batch
    from posteriflow_tpu.train.trainer import TrainConfig, init_state

    # the 15-D precessing flagship config (BASELINE.json names a
    # 15-parameter BBH flow; configs/npe_r6.yaml is that model)
    from posteriflow_tpu.utils.config import load_config
    cfg_path = Path(__file__).parent / "configs" / "npe_r6.yaml"
    cfg = load_config(cfg_path) if cfg_path.exists() else TrainConfig()
    # EVERYTHING under jit: eager op-by-op dispatch through the axon TPU
    # tunnel remote-compiles each primitive (minutes); one traced program
    # compiles once.
    state = jax.jit(lambda k: init_state(k, cfg))(jax.random.PRNGKey(0))
    model = LeanNPE(cfg.npe)

    n_events = 8
    n_draws = 16384                      # per event per call
    # shape swept on-chip: (8, 16384) sustains ~7.1M draws/s vs 6.4M at
    # (16, 8192) — fewer, longer sampling calls amortize dispatch better
    batch = jax.jit(lambda k: simulate_batch(k, n_events, cfg.sim))(
        jax.random.PRNGKey(1))

    @jax.jit
    def encode(params, strain, asd_bands):
        return model.apply(params, strain, asd_bands,
                           method=LeanNPE.encode)

    ctx = encode(state.params, batch.strain, batch.asd_bands)
    rank = jnp.zeros((n_events,), dtype=jnp.int32)

    @jax.jit
    def draw(params, key, ctx):
        theta, _, _ = model.apply(params, key, ctx, rank, n_draws,
                                  method=LeanNPE.sample_from_context)
        return theta

    # warmup / compile
    draw(state.params, jax.random.PRNGKey(2), ctx).block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        out = draw(state.params, jax.random.PRNGKey(3 + i), ctx)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    total_draws = iters * n_events * n_draws
    rate = total_draws / dt
    print(json.dumps({
        "metric": "posterior_draws_per_sec_per_chip",
        "value": round(rate, 1),
        "unit": "draws/s",
        "vs_baseline": round(rate / BASELINE_DRAWS_PER_SEC, 1),
        "model": f"{len(cfg.npe.param_names)}-D flagship "
                 "(r1-r3 benched the 11-D model; 15-D costs ~27% "
                 "in draw rate)",
    }))


if __name__ == "__main__":
    main()
