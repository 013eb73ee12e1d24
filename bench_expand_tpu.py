#!/usr/bin/env python
"""Real-TPU validation + timing of the merge-expand kernel (perf tool).

Reports: compile time (standalone and inside a lax.scan), correctness vs
the XLA scatter path, and differenced per-call latency.
Usage: timeout 580 /opt/venv/bin/python bench_expand_tpu.py [N_log2] [D]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from qinfer_tpu.ops.resample_expand import systematic_expand
from qinfer_tpu.resamplers import systematic_resample_indices

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
D = int(sys.argv[2]) if len(sys.argv) > 2 else 1


def init(seed):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    lw = jnp.log(jax.random.uniform(k1, (N,)) + 0.05)
    lw = lw - jax.scipy.special.logsumexp(lw)
    vals = jax.random.normal(k2, (N, D))
    return vals, lw, jax.random.PRNGKey(seed + 77)


def main():
    # --- standalone compile + correctness
    vals, lw, key = init(0)
    t0 = time.perf_counter()
    out = systematic_expand(key, lw, vals)
    out.block_until_ready()
    t_compile = time.perf_counter() - t0
    print(json.dumps({"op": "expand_compile_standalone_s",
                      "value": round(t_compile, 1)}), flush=True)

    out_np = np.asarray(out)  # materialize first: surfaces kernel aborts here
    idx = np.asarray(systematic_resample_indices(key, lw))
    ref = np.asarray(vals)[idx]
    ok = np.array_equal(out_np, ref)
    if not ok:
        diff = np.sum(np.any(out_np != ref, axis=1))
        print(json.dumps({"op": "expand_correct", "ok": False,
                          "n_diff": int(diff)}), flush=True)
        # tolerate off-by-one boundary picks from f32 cdf noise only
        bad = np.flatnonzero(np.any(out_np != ref, axis=1))
        print("first bad strata:", bad[:10], file=sys.stderr)
    else:
        print(json.dumps({"op": "expand_correct", "ok": True}), flush=True)

    # --- scan-wrapped compile + differenced timing
    def step(c, _):
        v, lw, k = c
        k, k2 = jax.random.split(k)
        picked = systematic_expand(k2, lw, v)
        lw2 = jnp.log(jnp.abs(picked[:, 0]) + 0.05)
        lw2 = lw2 - jax.scipy.special.logsumexp(lw2)
        return (picked * 0.999999, lw2, k), None

    def make_run(n_iter):
        @jax.jit
        def run(c0):
            c, _ = jax.lax.scan(step, c0, None, length=n_iter)
            return c

        return run

    k1, k2 = 10, 40
    run1, run2 = make_run(k1), make_run(k2)
    t0 = time.perf_counter()
    c = run1(init(1))
    float(jnp.sum(c[0]))
    t_scan_compile = time.perf_counter() - t0
    print(json.dumps({"op": "expand_compile_in_scan_s",
                      "value": round(t_scan_compile, 1)}), flush=True)
    c = run2(init(1))
    float(jnp.sum(c[0]))

    def measure(run):
        best = float("inf")
        for rep in range(3):
            c0 = init(rep + 2)
            jax.block_until_ready(c0)
            t0 = time.perf_counter()
            c = run(c0)
            float(jnp.sum(c[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = measure(run1), measure(run2)
    ms = max(t2 - t1, 1e-9) / (k2 - k1) * 1e3
    print(json.dumps({"op": "expand_ms_per_call", "ms": round(ms, 3),
                      "n": N, "d": D,
                      "gbps": round((8 + 8 * D) * N / (ms * 1e-3) / 1e9, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
