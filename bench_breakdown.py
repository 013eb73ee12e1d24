#!/usr/bin/env python
"""Resample/update cost breakdown on the real TPU (perf engineering tool).

Times each primitive on the SMC hot path at N=2^20 with the relay-safe
recipe (K iterations chained through a carry inside one jitted scan, a
forced host transfer before reading the clock, distinct inputs per repeat
— see CLAUDE.md / .claude/skills/verify/SKILL.md). Prints one JSON line
per primitive: {"op": ..., "ms": per-iteration milliseconds, "gbps":
effective HBM bandwidth if applicable}.

Usage: timeout 580 /opt/venv/bin/python bench_breakdown.py [N_log2]
"""

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
ITERS = 30  # base iteration count k1; differencing uses k2 = 4*k1
REPEATS = 3


def timed(name, step_fn, init_fn, bytes_moved=None, iters=ITERS):
    """step_fn: carry -> carry (data-chained); init_fn: seed -> carry.

    The relay adds a ~25 ms FIXED cost per executed program (independent of
    the program's length), so a single absolute timing at small `iters`
    measures the floor, not the op. We therefore time the same scan at k and
    4k iterations and report (t_4k − t_k)/(3k): the fixed cost cancels
    exactly and only the marginal per-iteration cost remains.
    """

    def make_run(k):
        @jax.jit
        def run(c0):
            def body(c, _):
                return step_fn(c), None

            c, _ = jax.lax.scan(body, c0, None, length=k)
            return c

        return run

    k1, k2 = iters, 4 * iters
    run1, run2 = make_run(k1), make_run(k2)

    def measure(run):
        # warm/compile
        c = run(init_fn(0))
        float(jnp.sum(jax.tree_util.tree_leaves(c)[0]))
        best = float("inf")
        for rep in range(REPEATS):
            c0 = init_fn(rep + 1)
            jax.block_until_ready(c0)
            t0 = time.perf_counter()
            c = run(c0)
            float(jnp.sum(jax.tree_util.tree_leaves(c)[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = measure(run1), measure(run2)
    ms = max(t2 - t1, 1e-9) / (k2 - k1) * 1e3
    rec = {"op": name, "ms": round(ms, 4), "n": N,
           "fixed_ms": round((t1 - ms * 1e-3 * k1) * 1e3, 1)}
    if bytes_moved is not None:
        rec["gbps"] = round(bytes_moved / (ms * 1e-3) / 1e9, 1)
    print(json.dumps(rec), flush=True)
    return ms


def farr(seed):
    return jax.random.uniform(jax.random.PRNGKey(seed), (N,), jnp.float32)


def main():
    # --- bandwidth reference: pure elementwise (read 4B + write 4B)/elt
    timed("elementwise_axpy", lambda x: x * 1.000001 + 1e-9, farr,
          bytes_moved=8 * N)

    # --- reductions: sum (read 4B/elt)
    timed("reduce_sum", lambda x: x + jnp.sum(x) * 1e-12, farr,
          bytes_moved=4 * N)

    # --- cumsum / cummax (read+write)
    timed("cumsum", lambda x: jnp.cumsum(x) * 1e-6 + 0.5, farr,
          bytes_moved=8 * N)
    timed("cummax", lambda x: jax.lax.cummax(x) * 0.999999, farr,
          bytes_moved=8 * N)

    # --- sort
    timed("sort", lambda x: jnp.sort(x) * 0.999999 + 1e-9, farr,
          bytes_moved=8 * N, iters=10)

    # --- element gather: y = x[idx], idx data-dependent on carry
    def gather_step(c):
        x, idx = c
        y = x[idx]
        return y, (idx + jnp.int32(1)) % N

    def gather_init(seed):
        return farr(seed), jax.random.randint(
            jax.random.PRNGKey(seed + 100), (N,), 0, N, jnp.int32
        )

    timed("gather_1M", gather_step, gather_init, bytes_moved=16 * N,
          iters=10)

    # --- scatter-max
    def scatter_step(c):
        x, idx = c
        z = jnp.zeros((N,), jnp.float32).at[idx].max(x)
        return z + 1e-9, (idx + jnp.int32(1)) % N

    timed("scatter_max", scatter_step, gather_init, bytes_moved=16 * N,
          iters=10)

    # --- RNG: normal(N)
    def rng_step(c):
        x, key = c
        key, k2 = jax.random.split(key)
        return x * 1e-9 + jax.random.normal(k2, (N,)), key

    timed("randn_1M", rng_step,
          lambda s: (farr(s), jax.random.PRNGKey(s)), bytes_moved=4 * N)

    # --- weighted moments (D=1)
    from qinfer_tpu.utils import weighted_moments

    def moments_step(c):
        locs, log_w = c
        mu, cov = weighted_moments(log_w, locs)
        return locs * 0.999999 + mu[None, :] * 1e-9, log_w + cov[0, 0] * 1e-12

    timed("weighted_moments_D1", moments_step,
          lambda s: (farr(s)[:, None], jnp.full((N,), -np.log(N), jnp.float32)),
          bytes_moved=8 * N)

    # --- systematic pick (blocked) D=1
    from qinfer_tpu.resamplers import (
        systematic_pick_blocked,
        systematic_resample_indices,
    )

    def pick_step(c):
        locs, log_w, key = c
        key, k2 = jax.random.split(key)
        picked = systematic_pick_blocked(k2, log_w, locs)
        return picked * 0.999999, log_w + picked[0] * 1e-12, key

    timed("systematic_pick_blocked_D1", pick_step,
          lambda s: (farr(s), jnp.full((N,), -np.log(N), jnp.float32),
                     jax.random.PRNGKey(s)),
          bytes_moved=12 * N, iters=10)

    # --- systematic indices (scatter+cummax) + element gather
    def idx_gather_step(c):
        locs, log_w, key = c
        key, k2 = jax.random.split(key)
        idx = systematic_resample_indices(k2, log_w)
        picked = locs[idx]
        return picked * 0.999999, log_w + picked[0] * 1e-12, key

    timed("systematic_idx_plus_gather_D1", idx_gather_step,
          lambda s: (farr(s), jnp.full((N,), -np.log(N), jnp.float32),
                     jax.random.PRNGKey(s)),
          bytes_moved=12 * N, iters=10)

    # --- full Liu-West resample (XLA path, D=1)
    from qinfer_tpu.resamplers import LiuWestResampler
    import qinfer_tpu as qi

    model = qi.SimplePrecessionModel()
    rs = LiuWestResampler()

    def resample_step(c):
        locs, log_w, key = c
        key, k2 = jax.random.split(key)
        new = rs(k2, model, locs, log_w)
        return new, log_w + new[0, 0] * 1e-12, key

    def resample_init(s):
        # Non-uniform weights so the pick is realistic.
        lw = jnp.log(farr(s) + 0.1)
        lw = lw - jax.scipy.special.logsumexp(lw)
        return farr(s)[:, None], lw, jax.random.PRNGKey(s)

    timed("liu_west_resample_D1", resample_step, resample_init,
          bytes_moved=12 * N, iters=10)

    # --- one Bayes update, no resample (smc step with thresh=-1)
    from qinfer_tpu.smc import SMCConfig, init_smc_state, smc_update_step

    prior = qi.UniformDistribution([0.0, 1.0])
    cfg = SMCConfig(resample_thresh=-1.0, zero_weight_policy="reset")

    def update_step(st):
        outcome = (st.n_resamples + st.particle_log_weights.shape[0]) % 2
        st, _ = smc_update_step(
            model, rs, cfg, st, outcome,
            {"t": jnp.asarray([1.7], jnp.float32)},
        )
        return st

    timed("bayes_update_step", update_step,
          lambda s: init_smc_state(jax.random.PRNGKey(s), model, N, prior),
          bytes_moved=12 * N)

    # --- full step with forced resample (thresh=2.0 → always)
    cfg2 = SMCConfig(resample_thresh=2.0, zero_weight_policy="reset")

    def full_step(st):
        outcome = (st.n_resamples + st.particle_log_weights.shape[0]) % 2
        st, _ = smc_update_step(
            model, rs, cfg2, st, outcome,
            {"t": jnp.asarray([1.7], jnp.float32)},
        )
        return st

    timed("update_plus_forced_resample", full_step,
          lambda s: init_smc_state(jax.random.PRNGKey(s), model, N, prior),
          bytes_moved=24 * N, iters=10)


if __name__ == "__main__":
    main()
