#!/usr/bin/env python
"""Phase-split of the Liu-West resample tail (everything but the pick).

Usage: timeout 580 /opt/venv/bin/python bench_resample_phases.py [N_log2]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import qinfer_tpu as qi
from qinfer_tpu.utils import sqrtm_psd, weighted_moments

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
ITERS = 10
REPEATS = 3


def timed(name, step_fn, init_fn, iters=ITERS):
    def make_run(k):
        @jax.jit
        def run(c0):
            c, _ = jax.lax.scan(lambda c, _: (step_fn(c), None), c0, None,
                                length=k)
            return c

        return run

    k1, k2 = iters, 4 * iters
    run1, run2 = make_run(k1), make_run(k2)

    def measure(run):
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
    print(json.dumps({"op": name, "ms": round(ms, 4), "n": N}), flush=True)
    return ms


def make_lw(seed):
    lw = jnp.log(jax.random.uniform(jax.random.PRNGKey(seed), (N,)) + 0.05)
    return lw - jax.scipy.special.logsumexp(lw)


def main():
    # sqrtm_psd at D=1 and D=4 (single small eigh inside the jitted step)
    def sq_step_d(d):
        def step(c):
            m, x = c
            S = sqrtm_psd(m)
            return S @ S + jnp.eye(d) * 1e-7, x + S[0, 0] * 1e-9

        return step

    for d in (1, 4):
        timed(f"sqrtm_psd_D{d}", sq_step_d(d),
              lambda s, d=d: (jnp.eye(d) * (1.0 + 0.01 * s),
                              jnp.float32(0.0)))

    # shrink + noise + smear (the post-pick affine)
    def smear_step(c):
        picked, key = c
        key, k2 = jax.random.split(key)
        mu = jnp.array([[0.5]], jnp.float32)
        S = jnp.array([[0.2]], jnp.float32)
        centers = 0.98 * picked + 0.02 * mu
        out = centers + jax.random.normal(k2, picked.shape) @ S.T
        return out * 0.999999, key

    timed("shrink_noise_smear_D1", smear_step,
          lambda s: (jax.random.uniform(jax.random.PRNGKey(s), (N, 1)),
                     jax.random.PRNGKey(s + 9)))

    # are_models_valid + postselect while_loop (all-valid case)
    model = qi.SimplePrecessionModel()

    def valid_step(c):
        locs, x = c
        ok = jnp.asarray(model.are_models_valid(locs))
        return locs * 0.999999 + 1e-9, x + jnp.all(ok).astype(jnp.float32)

    timed("are_models_valid_D1", valid_step,
          lambda s: (jax.random.uniform(jax.random.PRNGKey(s), (N, 1)),
                     jnp.float32(0.0)))

    # full resample: expand kernel ON, postselect on/off
    for postselect in (False, True):
        rs = qi.LiuWestResampler(use_expand_kernel=True,
                                 postselect=postselect)

        def rs_step(c, rs=rs):
            locs, lw, key = c
            key, k2 = jax.random.split(key)
            new = rs(k2, model, locs, lw)
            lw2 = jnp.log(jnp.abs(new[:, 0]) + 0.05)
            return new, lw2 - jax.scipy.special.logsumexp(lw2), key

        timed(f"liu_west_expand_postselect_{postselect}", rs_step,
              lambda s: (jax.random.uniform(jax.random.PRNGKey(s), (N, 1)),
                         make_lw(s), jax.random.PRNGKey(s + 3)))


if __name__ == "__main__":
    main()
