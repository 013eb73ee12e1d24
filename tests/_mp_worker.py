"""Worker for the two-process distributed test (run via subprocess).

Each of the two processes owns 4 virtual CPU devices; together they form
an 8-device ``particles`` mesh spanning processes — the multi-host launch
path of SURVEY §5.8 (reference capability being replaced:
``src/qinfer/parallel.py — DirectViewParallelizedModel``). The worker
builds a deterministic global SMC state, runs one shard_map update step
with a forced distributed resample, and prints one JSON line of results
for the launcher to cross-check.

Usage: _mp_worker.py <coordinator_port> <process_id>
"""

import json
import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=2,
    process_id=pid,
    initialization_timeout=60,
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

import qinfer_tpu as qi  # noqa: E402
from qinfer_tpu.parallel import make_particle_mesh  # noqa: E402
from qinfer_tpu.parallel.sharded_smc import make_sharded_update_step  # noqa: E402
from qinfer_tpu.smc import SMCConfig, SMCState, init_smc_state  # noqa: E402

assert jax.process_count() == 2
assert len(jax.devices()) == 8, jax.devices()

N = 512
model = qi.SimplePrecessionModel()
prior = qi.UniformDistribution([0.0, 1.0])
mesh = make_particle_mesh()  # spans both processes' devices

# Deterministic global state on every process (same key → same host
# arrays), skewed weights so the forced resample is non-trivial.
state_host = jax.tree_util.tree_map(
    np.asarray, init_smc_state(jax.random.PRNGKey(0), model, N, prior)
)
skew = np.linspace(0.0, 3.0, N, dtype=np.float32)
lw = skew - np.log(np.sum(np.exp(skew - skew.max()))) - skew.max()
state_host = state_host._replace(particle_log_weights=lw.astype(np.float32))


def global_array(host_arr, spec):
    """Build a process-spanning global array from replicated host data."""
    host_arr = np.asarray(host_arr)
    return jax.make_array_from_callback(
        host_arr.shape, NamedSharding(mesh, spec), lambda idx: host_arr[idx]
    )


state = SMCState(
    **{
        name: global_array(
            leaf,
            P("particles")
            if name in ("particle_locations", "particle_log_weights")
            else P(),
        )
        for name, leaf in state_host._asdict().items()
    }
)

resampler = qi.LiuWestResampler()
config = SMCConfig(resample_thresh=1.1, zero_weight_policy="reset")
step = make_sharded_update_step(mesh, model, resampler, config)
ep = {"t": jnp.array([0.5], jnp.float32)}

new_state, log_norm = jax.jit(step)(state, jnp.int32(0), ep)

# Replicated outputs are locally addressable; sharded banks need a
# cross-process gather to be read host-side.
locs = np.asarray(
    multihost_utils.process_allgather(new_state.particle_locations, tiled=True)
)
lw_out = np.asarray(
    multihost_utils.process_allgather(
        new_state.particle_log_weights, tiled=True
    )
)
w = np.exp(lw_out - lw_out.max())
w /= w.sum()
mean = w @ locs

print(
    "MPRESULT "
    + json.dumps(
        {
            "pid": pid,
            "log_norm": float(log_norm),
            "n_resamples": int(new_state.n_resamples),
            "mean": [float(x) for x in mean],
            "locs_sum": float(locs.sum()),
            "ess": float(
                1.0 / np.sum(np.exp(2 * (lw_out - lw_out.max()))
                             / np.sum(np.exp(lw_out - lw_out.max())) ** 2)
            ),
        }
    ),
    flush=True,
)
jax.distributed.shutdown()
