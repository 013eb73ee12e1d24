#!/usr/bin/env python
"""One-off TPU probes for resample-pick redesign (perf engineering tool).

Differenced timing (k vs 4k scan iterations) cancels the ~24.5 ms fixed
relay cost per execution — see bench_breakdown.py. Each probe prints one
JSON line. Usage: timeout 580 /opt/venv/bin/python bench_probe.py [N_log2]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 20)
ITERS = 20
REPEATS = 3


def timed(name, step_fn, init_fn, iters=ITERS):
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


def farr(seed):
    return jax.random.uniform(jax.random.PRNGKey(seed), (N,), jnp.float32)


def sorted_idx_init(seed):
    # Monotone non-decreasing indices, data-dependent.
    k = jax.random.PRNGKey(seed + 50)
    steps = (jax.random.uniform(k, (N,)) < 0.6).astype(jnp.int32)
    idx = jnp.minimum(jnp.cumsum(steps), N - 1)
    return farr(seed), idx


def main():
    # 1) gather with sorted monotone indices, hint on
    def g_sorted(c):
        x, idx = c
        y = jax.lax.gather(
            x[:, None], idx[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,),
                start_index_map=(0,)),
            slice_sizes=(1, 1), indices_are_sorted=True,
            unique_indices=False, mode=jax.lax.GatherScatterMode.CLIP,
        )[:, 0]
        return y, (idx + 1) % N

    timed("gather_sorted_hint", g_sorted, sorted_idx_init, iters=5)

    # 2) scatter set, sorted+unique indices (compaction pattern)
    def s_sorted(c):
        x, idx = c
        # strictly increasing unique indices: iota (best case for scatter)
        z = jnp.zeros((N,), jnp.float32).at[idx].set(
            x, mode="drop", unique_indices=True, indices_are_sorted=True
        )
        return z + 1e-9, idx

    def iota_idx_init(seed):
        return farr(seed), jnp.arange(N, dtype=jnp.int32)

    timed("scatter_set_iota_sorted_unique", s_sorted, iota_idx_init, iters=5)

    # 3) associative_scan fill-forward (select-combine) over (value, valid)
    def ff(c):
        x, valid = c

        def combine(a, b):
            va, fa = a
            vb, fb = b
            return jnp.where(fb, vb, va), fa | fb

        v, f = jax.lax.associative_scan(combine, (x, valid))
        return v * 0.999999, valid

    timed("assoc_scan_fill_forward", ff,
          lambda s: (farr(s), farr(s + 9) < 0.5), iters=10)

    # 4) sort 2M with 2 payload columns (merge-pick building block)
    M2 = 2 * N

    def sort_payload(c):
        keys, p1, p2 = c
        k, a, b = jax.lax.sort((keys, p1, p2), dimension=0, num_keys=1)
        return k * 0.999999 + 1e-9, a, b

    timed("sort_2M_2payloads", sort_payload,
          lambda s: (jax.random.uniform(jax.random.PRNGKey(s), (M2,)),
                     jnp.arange(M2, dtype=jnp.int32),
                     jax.random.uniform(jax.random.PRNGKey(s + 1), (M2,))),
          iters=5)

    # 5) small eigh fixed cost (D=1 and D=4) — chained
    def eigh_step(c):
        A, x = c
        vals, vecs = jnp.linalg.eigh(A)
        A2 = A + 1e-9 * (vecs * vals[None, :]) @ vecs.T
        return A2, x + vals[0] * 1e-9

    def eigh_init_d(d):
        def init(seed):
            B = jax.random.normal(jax.random.PRNGKey(seed), (d, d))
            return B @ B.T + jnp.eye(d), jnp.zeros(())

        return init

    timed("eigh_1x1", eigh_step, eigh_init_d(1), iters=10)
    timed("eigh_4x4", eigh_step, eigh_init_d(4), iters=10)

    # 6) axpy on (N,1) vs (N,) — layout padding check
    def axpy2d(c):
        return c * 1.000001 + 1e-9

    timed("axpy_N1", axpy2d, lambda s: farr(s)[:, None])
    timed("axpy_1N", axpy2d, lambda s: farr(s)[None, :])

    # 7) blocked pick WITHOUT the compaction scatter (tests whether the
    #    banded one-hot select or the scatter dominates the 14.3 ms):
    #    same math but pretending idxc/col_c are free.
    tile = 1024

    def banded_only(c):
        vals, idxc_f, key = c
        idxc = jnp.minimum(idxc_f.astype(jnp.int32), N - 1)
        n_tiles = N // tile
        idxc_tiles = idxc.reshape(n_tiles, tile)
        s_k = idxc_tiles[:, 0]
        local = idxc_tiles - s_k[:, None]
        iota = jnp.arange(tile + 8)
        onehot = local[:, :, None] == iota[None, None, :]
        col_c = jnp.concatenate([vals, jnp.zeros((tile + 8,), vals.dtype)])
        blocks = jax.vmap(
            lambda s: jax.lax.dynamic_slice(col_c, (s,), (tile + 8,))
        )(s_k)
        out = jnp.sum(
            jnp.where(onehot, blocks[:, None, :], 0.0), axis=-1
        ).reshape(N)
        return out * 0.999999, idxc_f, key

    def banded_init(s):
        steps = (farr(s + 3) < 0.6).astype(jnp.float32)
        return farr(s), jnp.cumsum(steps), jax.random.PRNGKey(s)

    timed("banded_onehot_select_only", banded_only, banded_init, iters=5)

    # 8) banded select via MXU matmul instead of where/sum
    def banded_mm(c):
        vals, idxc_f, key = c
        idxc = jnp.minimum(idxc_f.astype(jnp.int32), N - 1)
        n_tiles = N // tile
        idxc_tiles = idxc.reshape(n_tiles, tile)
        s_k = idxc_tiles[:, 0]
        local = idxc_tiles - s_k[:, None]
        iota = jnp.arange(tile + 8)
        onehot = (local[:, :, None] == iota[None, None, :]).astype(
            jnp.bfloat16
        )
        col_c = jnp.concatenate([vals, jnp.zeros((tile + 8,), vals.dtype)])
        blocks = jax.vmap(
            lambda s: jax.lax.dynamic_slice(col_c, (s,), (tile + 8,))
        )(s_k).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            onehot, blocks,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(N)
        return out * 0.999999, idxc_f, key

    timed("banded_onehot_matmul", banded_mm, banded_init, iters=5)

    # 9) vmapped dynamic_slice block gather alone
    def block_gather(c):
        vals, s_k = c
        padded = jnp.concatenate([vals, jnp.zeros((tile + 8,), vals.dtype)])
        blocks = jax.vmap(
            lambda s: jax.lax.dynamic_slice(padded, (s,), (tile + 8,))
        )(s_k)
        return jnp.sum(blocks, axis=1) * 1e-9 + vals[: N // tile], s_k

    timed("vmapped_dynslice_1024x1032", block_gather,
          lambda s: (farr(s)[: N], jnp.minimum(
              jnp.cumsum((farr(s + 3)[: N // tile] < 0.9).astype(jnp.int32)
                         * (tile - 8)), N - 1)), iters=10)


if __name__ == "__main__":
    main()
