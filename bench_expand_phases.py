#!/usr/bin/env python
"""Phase-split timing of the resample pick path on the real TPU.

Separates: (a) CDF/starts prep, (b) bf16 plane-split + chunk tiling,
(c) split+tile+kernel (expand_sorted_segments), (d) full systematic_expand.
Optionally patches the kernel's subtile geometry via env
BENCH_EXPAND_GEOM="T[,SUPER]" BEFORE the first trace (the chunk/window
is fixed at 128×128 by the MXU one-hot design).

Usage: timeout 580 /opt/venv/bin/python bench_expand_phases.py [N_log2] [D]
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import qinfer_tpu.ops.resample_expand as rex

geom = os.environ.get("BENCH_EXPAND_GEOM")
if geom:
    # "T[,SUPER]" — subtile strata count (chunk/window geometry is fixed
    # at 128×128 by the MXU one-hot design).
    parts = [int(x) for x in geom.split(",")]
    rex._T = parts[0]
    rex._SUPER = parts[1] if len(parts) > 1 else max(8192, parts[0])

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
D = int(sys.argv[2]) if len(sys.argv) > 2 else 1
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
    print(json.dumps({"op": name, "ms": round(ms, 4), "n": N, "d": D,
                      "geom": geom or "default"}), flush=True)
    return ms


def make_lw(seed):
    lw = jnp.log(jax.random.uniform(jax.random.PRNGKey(seed), (N,)) + 0.05)
    return lw - jax.scipy.special.logsumexp(lw)


def make_starts(lw, key):
    from qinfer_tpu.resamplers import systematic_segment_starts

    return systematic_segment_starts(key, lw, N)


def main():
    # (a) CDF/starts prep only
    def prep_step(c):
        lw, acc, key = c
        key, k2 = jax.random.split(key)
        starts = make_starts(lw, k2)
        return lw * 0.9999999 - 1e-9, acc + starts[-1] * 1e-9, key

    timed("prep_cdf_starts", prep_step,
          lambda s: (make_lw(s), jnp.float32(0.0), jax.random.PRNGKey(s)))

    # (b) host-side stream prep: pad + value shift + chunk tiling of
    # starts + D columns (the v4 kernel splits planes IN-kernel, so the
    # host prep is concatenate/reshape only)
    def split_step(c):
        arrs, acc = c
        total = acc
        pad = rex._round_up(N, rex._CHUNK) + 2 * rex._CHUNK - N
        for i, a in enumerate(arrs):
            if i == 0:  # starts stream: sentinel pad
                padded = jnp.concatenate(
                    [a, jnp.full((pad,), rex._SENTINEL, jnp.float32)])
            else:  # value stream: shift one right, zero pad
                padded = jnp.concatenate(
                    [a[:1], a, jnp.zeros((pad - 1,), jnp.float32)])
            tiles = rex._tile_chunks(padded)
            total = total + tiles[0, 0, 0].astype(jnp.float32)
        return tuple(a * 0.9999999 for a in arrs), total

    timed("prep_streams", split_step,
          lambda s: (tuple(
              jax.random.normal(jax.random.PRNGKey(s * 7 + d), (N,))
              for d in range(1 + D)), jnp.float32(0.0)))

    # (c) split+tile+kernel with precomputed starts (chained values)
    starts_fixed = make_starts(make_lw(123), jax.random.PRNGKey(370))

    def expand_step(c):
        vals, acc = c
        out = rex.expand_sorted_segments(starts_fixed, vals)
        v0 = out if out.ndim == 1 else out[:, 0]
        return (out * 0.999999 + 1e-9), acc + v0[0] * 1e-9

    def expand_init(s):
        v = jax.random.normal(jax.random.PRNGKey(s), (N, D))
        return (v[:, 0] if D == 1 else v), jnp.float32(0.0)

    timed("expand_sorted_segments", expand_step, expand_init)

    # (d) full systematic_expand (prep + split + kernel)
    def full_step(c):
        vals, lw, key = c
        key, k2 = jax.random.split(key)
        out = rex.systematic_expand(k2, lw, vals)
        v0 = out if out.ndim == 1 else out[:, 0]
        lw2 = jnp.log(jnp.abs(v0) + 0.05)
        return (out * 0.999999,
                lw2 - jax.scipy.special.logsumexp(lw2), key)

    def full_init(s):
        v = jax.random.normal(jax.random.PRNGKey(s), (N, D))
        return (v[:, 0] if D == 1 else v), make_lw(s), jax.random.PRNGKey(s)

    timed("systematic_expand_full", full_step, full_init)

    # correctness spot check under the active geometry
    lw = make_lw(5)
    key = jax.random.PRNGKey(9)
    vals = jax.random.normal(jax.random.PRNGKey(6), (N, D))
    from qinfer_tpu.resamplers import systematic_resample_indices

    out = np.asarray(rex.systematic_expand(key, lw, vals))
    idx = np.asarray(systematic_resample_indices(key, lw))
    ok = bool(np.array_equal(out, np.asarray(vals)[idx]))
    print(json.dumps({"op": "expand_correct", "ok": ok}), flush=True)


if __name__ == "__main__":
    main()
