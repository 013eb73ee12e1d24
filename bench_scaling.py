#!/usr/bin/env python
"""Scaling-efficiency benchmark (BASELINE north star: ≥80% at 2 hosts).

Weak-scaling of the explicit-collective shard_map SMC step over the
``particles`` mesh axis: each shard holds a fixed-size sub-bank, the mesh
grows, and efficiency = T(1 shard)/T(K shards) at K× the particles.

On a real pod slice, run under `jax.distributed.initialize` and the same
script measures 1-chip / 1-host / N-host points over ICI/DCN. In this
single-chip environment it runs on virtual CPU devices
(--xla_force_host_platform_device_count), which validates the collective
mechanics and gives a conservative efficiency floor (CPU "collectives"
are memcpys with none of ICI's bandwidth).

Prints one JSON line per mesh size.
"""

import json
import os
import sys
import time

if __name__ == "__main__" and os.environ.get("JAX_PLATFORMS", "") != "tpu":
    # Default to the virtual CPU mesh unless real multi-chip is present.
    os.environ.setdefault("XLA_FLAGS", "")
    if "host_platform_device_count" not in os.environ["XLA_FLAGS"]:
        os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def measure(n_devices, per_shard=1 << 15, n_exp=30, repeats=3):
    import qinfer_tpu as qi
    from qinfer_tpu.parallel import make_particle_mesh, make_sharded_update_step, shard_state
    from qinfer_tpu.smc import SMCConfig, init_smc_state

    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    resampler = qi.LiuWestResampler()
    config = SMCConfig(zero_weight_policy="reset")
    mesh = make_particle_mesh(n_devices)
    n = per_shard * n_devices

    step = jax.jit(make_sharded_update_step(mesh, model, resampler, config))
    ts = np.minimum((9 / 8) ** np.arange(n_exp), 1e4).astype(np.float32)
    rng = np.random.default_rng(0)
    outcomes = (rng.random(n_exp) >= 0.5).astype(np.int32)

    def run(state):
        for t, o in zip(ts, outcomes):
            state, _ = step(state, jnp.int32(int(o)),
                            {"t": jnp.array([t], jnp.float32)})
        return float(jnp.sum(state.particle_log_weights))

    states = [
        shard_state(
            init_smc_state(jax.random.PRNGKey(i), model, n, prior), mesh
        )
        for i in range(repeats + 1)
    ]
    run(states[0])  # compile
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        run(states[i + 1])
        best = min(best, time.perf_counter() - t0)
    return n * n_exp / best


def main():
    devices = len(jax.devices())
    sizes = [k for k in (1, 2, 4, 8) if k <= devices]
    base = None
    for k in sizes:
        pps = measure(k)
        if base is None:
            base = pps
        eff = pps / (base * k)
        row = {
            "metric": f"sharded_particle_updates_per_s@{k}dev",
            "value": pps,
            "unit": "particle-updates/s",
            "weak_scaling_efficiency": eff,
            "platform": jax.default_backend(),
        }
        if jax.default_backend() == "cpu":
            # Virtual devices share the host's cores: aggregate throughput
            # staying flat across K is the expected (correct) behavior;
            # the efficiency column is only meaningful on real chips.
            row["note"] = "virtual devices share host cores"
        print(json.dumps(row))


if __name__ == "__main__":
    sys.exit(main())
