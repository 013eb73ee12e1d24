#!/usr/bin/env python
"""On-chip probe: cost of the custom_vmap wrapper around the fused Bayes
update (perf tool). Compares the wrapped public path vs the raw pallas
_impl with identical math.

Usage: timeout 580 /opt/venv/bin/python bench_wrap_probe.py [N_log2]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

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


def main():
    import qinfer_tpu as qi
    from qinfer_tpu.ops import fused_update as fu

    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    ep = {"t": jnp.asarray([1.7], jnp.float32)}

    def init(seed):
        k = jax.random.PRNGKey(seed)
        locs = jnp.asarray(prior.sample(k, N), jnp.float32)
        lw = jnp.full((N,), -jnp.log(float(N)), jnp.float32)
        return (lw, locs)

    def wrapped(c):
        lw, locs = c
        out = (jnp.sum(lw) > -1e30).astype(jnp.int32) % 2
        lw2, ln, ess = model.fused_update(out, lw, locs, ep)
        return (lw2, locs)

    timed("fused_public_wrapped", wrapped, init)

    # Raw _impl path: rebuild the same pallas_call without custom_vmap by
    # calling fused_bayes_update's internals via a monkeypatched
    # custom_vmap that is the identity.
    import contextlib

    class _IdentityCustomVmap:
        def __init__(self, fn):
            self._fn = fn

        def def_vmap(self, fn):
            return fn

        def __call__(self, *args):
            return self._fn(*args)

    @contextlib.contextmanager
    def no_custom_vmap():
        orig = jax.custom_batching.custom_vmap
        jax.custom_batching.custom_vmap = _IdentityCustomVmap
        try:
            yield
        finally:
            jax.custom_batching.custom_vmap = orig

    def raw(c):
        lw, locs = c
        out = (jnp.sum(lw) > -1e30).astype(jnp.int32) % 2
        with no_custom_vmap():
            lw2, ln, ess = model.fused_update(out, lw, locs, ep)
        return (lw2, locs)

    timed("fused_raw_impl", raw, init)


if __name__ == "__main__":
    main()
