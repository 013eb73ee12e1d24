"""Systematic-resampling expand kernel (Pallas TPU).

The inverse-CDF step of systematic resampling maps sorted strata
u_i = (i + u0)/n onto sorted particle segments [t_{j−1}, t_j) — a merge of
two sorted sequences. XLA can only express it as searchsorted (20
serialized full-width gathers, ~130ms at n=1M) or scatter+cummax+gather
(~15ms, and per parameter column). This kernel exploits the sortedness:

- output strata are processed in super-tiles by a sequential TPU grid,
  each super-tile unrolled into subtiles (amortizes grid-step overhead);
- a sliding window of input segment starts/values is DMA'd into VMEM in
  1024-aligned chunks (Mosaic's 1-D HBM slice granularity); the window
  pointer lives in SMEM and advances monotonically — total input traffic
  is O(n·D) amortized across all tiles;
- within a subtile the expansion out[i] = x[j(i)], j(i) = max{j :
  start_j ≤ i}, is a *banded selection*: sel[i, l] = (start_l ≤ i <
  start_{l+1}); all D parameter columns reuse one sel matrix — pure VPU
  compare/select/reduce, no gathers or scatters at all.

All arrays are 1-D per parameter column: (n,) tiles as lanes with no
padding, where (n, D) with small D wastes HBM bandwidth.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["expand_sorted_segments", "systematic_expand"]

_SENTINEL = np.int32(2 ** 30)
_CHUNK = 1024  # Mosaic 1-D HBM slice alignment/granularity
_SUB = 4  # subtiles per grid step


def _expand_kernel(*refs, tile, n_cols):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    starts_hbm = refs[0]
    value_hbms = refs[1 : 1 + n_cols]
    out_refs = refs[1 + n_cols : 1 + 2 * n_cols]
    cur_j_ref = refs[1 + 2 * n_cols]
    win_starts = refs[2 + 2 * n_cols]
    win_vals = refs[3 + 2 * n_cols : 3 + 2 * n_cols + n_cols]  # (_CHUNK,) each
    sem = refs[3 + 3 * n_cols]

    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        cur_j_ref[0] = 0

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, _CHUNK), 1)
    base_row_iota = jax.lax.broadcasted_iota(jnp.int32, (tile, _CHUNK), 0)

    def load(j):
        copies = [
            pltpu.make_async_copy(
                starts_hbm.at[pl.ds(j, 2 * _CHUNK)], win_starts, sem.at[0]
            )
        ] + [
            pltpu.make_async_copy(
                value_hbms[d].at[pl.ds(j, _CHUNK)], win_vals[d],
                sem.at[1 + d],
            )
            for d in range(n_cols)
        ]
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

    for sub in range(_SUB):
        sub_start = (k * _SUB + sub) * tile
        sub_last = sub_start + tile - 1
        row_iota = sub_start + base_row_iota

        def cond(carry):
            return ~carry[2]

        def body(carry, sub_last=sub_last, row_iota=row_iota):
            j_raw, counted, _, acc = carry
            j = (j_raw // _CHUNK) * _CHUNK
            load(j)
            s = win_starts[pl.ds(0, _CHUNK)]
            e = win_starts[pl.ds(1, _CHUNK)]
            sel = (
                (s[None, :] <= row_iota)
                & (row_iota < e[None, :])
                & (j + col_iota >= counted)
            )
            acc = tuple(
                acc[d]
                + jnp.sum(
                    jnp.where(sel, win_vals[d][...][None, :], 0.0), axis=1
                )
                for d in range(n_cols)
            )
            covered = e[_CHUNK - 1] > sub_last
            n_le = jnp.sum((s <= sub_last).astype(jnp.int32))
            cur_j_ref[0] = jnp.where(covered, j + n_le - 1, cur_j_ref[0])
            return (
                jnp.where(covered, j, j + _CHUNK),
                j + _CHUNK,
                covered,
                acc,
            )

        init = (
            cur_j_ref[0],
            jnp.int32(0),
            False,
            tuple(jnp.zeros((tile,), jnp.float32) for _ in range(n_cols)),
        )
        _, _, _, acc = jax.lax.while_loop(cond, body, init)
        for d in range(n_cols):
            out_refs[d][pl.ds(sub * tile, tile)] = acc[d]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("n_out", "tile", "interpret"))
def _expand_cols(starts_padded, cols_padded, n_out, tile, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_cols = len(cols_padded)
    super_tile = _SUB * tile
    n_super = _round_up(n_out, super_tile) // super_tile
    out_struct = jax.ShapeDtypeStruct((n_super * super_tile,), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_expand_kernel, tile=tile, n_cols=n_cols),
        grid=(n_super,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * (1 + n_cols),
        out_specs=tuple(
            pl.BlockSpec((super_tile,), lambda k: (k,),
                         memory_space=pltpu.VMEM)
            for _ in range(n_cols)
        ),
        out_shape=tuple(out_struct for _ in range(n_cols)),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((2 * _CHUNK,), jnp.int32),
        ]
        + [pltpu.VMEM((_CHUNK,), jnp.float32) for _ in range(n_cols)]
        + [pltpu.SemaphoreType.DMA((1 + n_cols,))],
        interpret=interpret,
    )(starts_padded, *cols_padded)
    return tuple(o[:n_out] for o in outs)


def expand_sorted_segments(starts, values, n_out=None, tile=1024,
                           interpret=None):
    """out[i] = values[j(i)] with j(i) = max{j : starts[j] ≤ i}.

    ``starts``: (n_in,) int32, sorted non-decreasing, starts[0] == 0.
    ``values``: (n_in,) or (n_in, D) f32. Returns matching (n_out[, D]).
    """
    starts = jnp.asarray(starts, jnp.int32)
    values = jnp.asarray(values, jnp.float32)
    n_in = starts.shape[0]
    n_out = n_in if n_out is None else int(n_out)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    total = _round_up(n_in + 3 * _CHUNK, _CHUNK)
    pad = total - n_in
    starts_p = jnp.concatenate(
        [starts, jnp.full((pad,), _SENTINEL, jnp.int32)]
    )
    zeros = jnp.zeros((pad,), jnp.float32)
    if values.ndim == 1:
        cols = (jnp.concatenate([values, zeros]),)
    else:
        cols = tuple(
            jnp.concatenate([values[:, d], zeros])
            for d in range(values.shape[1])
        )
    outs = _expand_cols(starts_p, cols, n_out, tile, interpret)
    if values.ndim == 1:
        return outs[0]
    return jnp.stack(outs, axis=1)


def systematic_expand(key, log_w, values, interpret=None):
    """Systematic-resampled values: values[idx], idx ~ systematic(w),
    computed via the expand kernel (no gather/scatter/searchsorted).

    Equivalent to ``values[systematic_resample_indices(key, log_w)]``.
    """
    from ..utils import normalize_log_weights

    n = log_w.shape[0]
    w = jnp.exp(normalize_log_weights(log_w)[0])
    cdf = jnp.cumsum(w)
    u0 = jax.random.uniform(key, ())
    t = jnp.ceil(n * cdf - u0).astype(jnp.int32)
    starts = jnp.maximum(
        jnp.concatenate([jnp.zeros((1,), jnp.int32), t[:-1]]), 0
    )
    # Monotonize (f32 cumsum noise could produce tiny inversions).
    starts = jax.lax.cummax(starts)
    return expand_sorted_segments(starts, values, n_out=n,
                                  interpret=interpret)
