"""Multi-host path: jax.distributed wiring + DCN-aware mesh (SURVEY.md §5
"distributed communication backend"; VERDICT round-1 partial #83).

Two coordinated processes, each with 4 virtual CPU devices, build the
8-device global mesh and run ONE full jitted train step (on-device
simulation → grads → psum over the data axis). Validates that make_mesh
handles num_processes > 1 and the train step compiles and executes under a
simulated 2-process topology — the prescribed no-hardware validation
(XLA_FLAGS=--xla_force_host_platform_device_count per process).
"""

import json
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_CHILD = textwrap.dedent("""
    import os, sys, json
    port, pid = sys.argv[1], int(sys.argv[2])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    sys.path.insert(0, %r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-cpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from posteriflow_tpu.parallel.mesh import init_distributed, make_mesh
    n = init_distributed(coordinator_address=f"localhost:{port}",
                         num_processes=2, process_id=pid)
    assert n == 2, n
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    from posteriflow_tpu.models.npe import NPEConfig
    from posteriflow_tpu.physics.simulator import SimConfig
    from posteriflow_tpu.prior import PriorConfig
    from posteriflow_tpu.train.trainer import (TrainConfig, init_state,
                                               make_train_step)
    cfg = TrainConfig(
        npe=NPEConfig(context_dim=32, rank_dim=8, flow_layers=2,
                      flow_hidden=32, flow_bins=4, encoder_type="conv",
                      d_model=32, enc_layers=1, enc_heads=4),
        sim=SimConfig(prior=PriorConfig(max_signals=2)),
        batch_size=16, warmup_steps=2, total_steps=10)
    mesh = make_mesh()            # all 8 global devices, process-major
    assert mesh.devices.shape == (8, 1)
    state = jax.jit(lambda k: init_state(k, cfg))(jax.random.PRNGKey(0))
    step = make_train_step(cfg, mesh=mesh)
    # AOT-compile, then rendezvous at a generous coordination-service
    # barrier before executing: on a 1-core host the two children can
    # finish compiling >30 s apart (persistent-cache asymmetry), and the
    # Gloo collective-context key-value exchange has a hard 30 s deadline
    # — executing in lockstep keeps the context setup inside it.
    compiled = step.lower(state, jax.random.PRNGKey(1)).compile()
    from jax._src import distributed as _dist
    _dist.global_state.client.wait_at_barrier("compiled", 480_000)
    state, m = compiled(state, jax.random.PRNGKey(1))
    nll = float(m["nll"])
    print(json.dumps({"pid": pid, "nll": nll,
                      "grad_norm": float(m["grad_norm"])}))
""") % str(REPO)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_mesh_train_step(tmp_path):
    port = _free_port()
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    env = {"PATH": "/usr/bin:/bin:/usr/local/bin",
           "HOME": "/root",
           "PYTHONPATH": f"{REPO}:/root/.axon_site"}
    procs = [subprocess.Popen([sys.executable, str(script), str(port),
                               str(pid)], stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True, env=env)
             for pid in (0, 1)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"child failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    # the replicated loss must agree across processes
    assert abs(outs[0]["nll"] - outs[1]["nll"]) < 1e-4, outs
    assert all(abs(o["grad_norm"]) < 1e4 for o in outs)
