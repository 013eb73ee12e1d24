#!/usr/bin/env python
"""On-chip probes: (a) expand-prep op costs (logsumexp/cumsum/ceil), and
(b) smc_update_step overhead beyond the fused Bayes kernel (perf tool).

Differenced k-vs-4k scans cancel the relay fixed cost.
Usage: timeout 580 /opt/venv/bin/python bench_prep_probe.py [N_log2]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
ITERS = 20
REPEATS = 2


def timed(name, step_fn, init_fn, iters=ITERS):
    def make_run(k):
        @jax.jit
        def run(c0):
            c, _ = jax.lax.scan(lambda c, _: (step_fn(c), None), c0, None,
                                length=k)
            return c

        return run

    r1, r2 = make_run(iters), make_run(4 * iters)

    def measure(run):
        c = run(init_fn(0))
        float(jnp.sum(jax.tree_util.tree_leaves(c)[0]))
        best = float("inf")
        for rep in range(REPEATS):
            c0 = init_fn(rep + 1)
            jax.block_until_ready(jax.tree_util.tree_leaves(c0)[0])
            t0 = time.perf_counter()
            c = run(c0)
            float(jnp.sum(jax.tree_util.tree_leaves(c)[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    ms = max(measure(r2) - measure(r1), 0.0) / (3 * iters) * 1e3
    print(json.dumps({"op": name, "ms": round(ms, 4), "n": N}), flush=True)


def lw_init(seed):
    lw = jnp.log(jax.random.uniform(jax.random.PRNGKey(seed), (N,)) + 0.05)
    return (lw - jax.scipy.special.logsumexp(lw),)


def main():
    from qinfer_tpu.utils import normalize_log_weights

    # (a) prep op costs
    timed("normalize_exp", lambda c: (jnp.exp(
        normalize_log_weights(c[0])[0]) + 1e-20,), lambda s: lw_init(s))
    timed("cumsum_1M", lambda c: (jnp.cumsum(c[0]) * 1e-6,),
          lambda s: (jax.random.uniform(jax.random.PRNGKey(s), (N,)),))
    timed("cummax_1M", lambda c: (jax.lax.cummax(c[0]) * 0.999999,),
          lambda s: (jax.random.uniform(jax.random.PRNGKey(s), (N,)),))

    def ceil_concat(c):
        (t,) = c
        starts = jnp.maximum(
            jnp.concatenate([jnp.zeros((1,), jnp.float32), t[:-1]]), 0.0)
        return (jnp.ceil(starts) * 0.9999,)

    timed("ceil_concat_max", ceil_concat,
          lambda s: (jax.random.uniform(jax.random.PRNGKey(s), (N,)) * N,))

    # (b) step overhead: fused kernel alone vs full smc_update_step
    import qinfer_tpu as qi
    from qinfer_tpu.smc import SMCConfig, init_smc_state, smc_update_step

    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    rs = qi.LiuWestResampler()
    ep = {"t": jnp.asarray([1.7], jnp.float32)}

    def st_init(seed):
        return (init_smc_state(jax.random.PRNGKey(seed), model, N, prior),)

    def fused_only(c):
        (st,) = c
        lw, ln, ess = model.fused_update(
            (st.n_resamples + N) % 2, st.particle_log_weights,
            st.particle_locations, ep)
        return (st._replace(particle_log_weights=lw,
                            min_n_ess=jnp.minimum(st.min_n_ess, ess)),)

    timed("fused_update_only", fused_only, st_init)

    cfg = SMCConfig(zero_weight_policy="reset", resample_thresh=-1.0)

    def full_step(c):
        (st,) = c
        out = (st.n_resamples + N) % 2
        st, _ = smc_update_step(model, rs, cfg, st, out, ep)
        return (st,)

    timed("full_step_noresample", full_step, st_init)


if __name__ == "__main__":
    main()
