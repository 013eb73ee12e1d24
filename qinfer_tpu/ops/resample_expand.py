"""Systematic-resampling expand kernel (Pallas TPU).

The inverse-CDF step of systematic resampling maps sorted strata
u_i = (i + u0)/n onto sorted particle segments [t_{j−1}, t_j) — a merge of
two sorted sequences. XLA has no fast lowering for it on TPU (measured at
n=1M: searchsorted ≈ 130 ms, scatter+cummax+gather ≈ 17 ms, blocked
one-hot pick ≈ 14 ms — see bench_breakdown.py / doc/guide_performance.md).
This kernel exploits the sortedness and streams at near-HBM speed:

- the output strata are processed in T-sized subtiles by a sequential TPU
  grid (several subtiles per grid step);
- the particle segment starts and the particle values are streamed through
  a 3-slot VMEM ring of CHUNK-sized windows whose DMAs are *prefetched*
  one chunk ahead, so the common case pays no DMA latency; a skew loop
  advances the window one chunk at a time when a subtile's covering
  particles span beyond the resident window (heavily non-uniform weights);
- within a subtile the rank r(i) = #{starts ≤ i} over the W-wide resident
  window is found *hierarchically*: a (T, G) compare against the G group
  maxima picks each stratum's group, an MXU one-hot row-select fetches
  that group's GS starts, and a second (T, GS) compare finishes the rank —
  O(G + GS) work per stratum instead of O(W), with the row selects running
  as (T, G) · (GS, G)ᵀ contractions on the MXU;
- the covering particle's value is fetched the same way (one-hot group
  select + within-group one-hot reduce); all D parameter columns share the
  rank math and pay one extra matmul each.

Mosaic cannot shape-cast 1-D↔2-D vectors in-kernel, so the streams are
pre-tiled OUTSIDE the kernel (one cheap XLA transpose) into
``(n_chunks, GS, G/2)`` blocks: chunk c element (p, g) is flat index
``c·CHUNK + g·GS + p``; the resident window is a lane-axis concat of two
chunks giving the (GS, G) group matrix directly.

No gathers, no scatters, no sort. Total traffic is O(n·(D+1)) reads +
O(n·D) writes. Indices are carried in f32 (exact for n ≤ 2^24; the
wrapper asserts this).

Reference parity: replaces the index-draw + ``locs[idx]`` hot loop of
``src/qinfer/resamplers.py — LiuWestResampler.__call__``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["expand_sorted_segments", "systematic_expand"]

_SENTINEL = np.float32(2.0 ** 30)
_GS = 16  # group size (sublanes of a window tile; ≥ f32 min sublane 8)
_GH = 128  # groups per chunk (lanes of a ring slot; the TPU lane width)
_G = 2 * _GH  # groups per resident window
_CHUNK = _GS * _GH  # particles per DMA chunk (2048)
_W = 2 * _CHUNK  # resident window width
_T = 2048  # strata per subtile
_SUB = 4  # subtiles per grid step

# dot_general contraction: (T, G) · (GS, G) → (T, GS), contracting G.
_SELECT_DNUMS = (((1,), (1,)), ((), ()))


def _expand_kernel(*refs, n_cols):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    starts_hbm = refs[0]  # (n_chunks, GS, GH)
    value_hbms = refs[1 : 1 + n_cols]
    out_refs = refs[1 + n_cols : 1 + 2 * n_cols]
    (cur_j, loaded, inflight, ring_s) = refs[1 + 2 * n_cols : 5 + 2 * n_cols]
    ring_v = refs[5 + 2 * n_cols : 5 + 3 * n_cols]  # (3, GS, GH) each
    sems = refs[5 + 3 * n_cols]  # DMA sems, shape (3, 1 + n_cols)

    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        cur_j[0] = 0
        for s in range(3):
            loaded[s] = -1
            inflight[s] = 0

    def dma_chunk(c, slot):
        cps = [
            pltpu.make_async_copy(
                starts_hbm.at[c], ring_s.at[slot], sems.at[slot, 0]
            )
        ] + [
            pltpu.make_async_copy(
                value_hbms[d].at[c], ring_v[d].at[slot], sems.at[slot, 1 + d]
            )
            for d in range(n_cols)
        ]
        for cp in cps:
            cp.start()

    def wait_chunk(slot):
        # .wait() waits for the byte count of the copy it is built from;
        # the src/dst refs are placeholders with the started copies' shape.
        pltpu.make_async_copy(
            ring_s.at[0], ring_s.at[0], sems.at[slot, 0]
        ).wait()
        for d in range(n_cols):
            pltpu.make_async_copy(
                ring_v[d].at[0], ring_v[d].at[0], sems.at[slot, 1 + d]
            ).wait()

    def ensure(c):
        """Block until chunk c is resident in its ring slot."""
        slot = jax.lax.rem(c, 3)

        @pl.when(inflight[slot] == 1)
        def _():
            wait_chunk(slot)
            inflight[slot] = 0

        # (if the in-flight DMA was already chunk c, the when above waited
        # it and left loaded == c, so this one is skipped)
        @pl.when(loaded[slot] != c)
        def _():
            dma_chunk(c, slot)
            wait_chunk(slot)
            loaded[slot] = c

    def prefetch(c):
        slot = jax.lax.rem(c, 3)

        @pl.when((loaded[slot] != c) & (inflight[slot] == 0))
        def _():
            dma_chunk(c, slot)
            loaded[slot] = c
            inflight[slot] = 1

    # (Mosaic's tpu.iota is integer-only; build int32 and convert.)
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _G), 1).astype(
        jnp.float32)
    gs_iota = jax.lax.broadcasted_iota(jnp.int32, (1, _GS), 1).astype(
        jnp.float32)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (_T, 1), 0).astype(
        jnp.float32)

    for sub in range(_SUB):
        sub_start = (k * _SUB + sub) * _T
        row = sub_start.astype(jnp.float32) + t_iota  # (T, 1) stratum ids

        def cond(carry):
            return ~carry[1]

        def body(carry):
            c0, _, res, acc = carry
            ensure(c0)
            ensure(c0 + 1)
            prefetch(c0 + 2)

            slot_a = jax.lax.rem(c0, 3)
            slot_b = jax.lax.rem(c0 + 1, 3)
            # (GS, G): column g is window-group g, rows are within-group.
            s_win = jnp.concatenate([ring_s[slot_a], ring_s[slot_b]], axis=1)
            gmax = s_win[_GS - 1 : _GS, :]  # (1, G)

            # Level 1: how many groups lie fully at/below this stratum.
            fg = jnp.sum(
                (gmax <= row).astype(jnp.float32), axis=1, keepdims=True
            )  # (T, 1), in [0, G]
            oh_fg = (fg == g_iota).astype(jnp.float32)  # (T, G)
            # Level 2: rank within the (fg)-th group via MXU column-select.
            # precision=HIGHEST: Mosaic lowers f32 MXU matmuls to ONE bf16
            # pass by default, silently rounding the selected values (and
            # the start indices the rank compare needs exact). One-hot ×
            # f32 under the multi-pass split is exact.
            s2 = jax.lax.dot_general(
                oh_fg, s_win, _SELECT_DNUMS,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (T, GS) — group fg's starts per stratum
            r_lo = jnp.sum(
                (s2 <= row).astype(jnp.float32), axis=1, keepdims=True
            )
            r = jnp.minimum(_GS * fg + r_lo, float(_W))  # (T, 1)

            c = r - 1.0  # local covering index, −1 → resolved earlier
            chi = jnp.floor(c / _GS)
            clo = c - _GS * chi
            oh_chi = (chi == g_iota).astype(jnp.float32)  # (T, G)
            oh_clo = (clo == gs_iota).astype(jnp.float32)  # (T, GS)
            # r == W means the covering particle may lie beyond the
            # window — defer those rows to the next (advanced) visit. On
            # saturation the window advances by ONE chunk (overlapping the
            # old window so a covering-at-window-end particle stays
            # resident), so rows already resolved in the overlap must be
            # masked out via the carried `res` flag to avoid double counts.
            live = (r < float(_W)).astype(jnp.float32) * (1.0 - res)  # (T,1)
            sel = oh_clo * live

            new_acc = []
            for d in range(n_cols):
                v_win = jnp.concatenate(
                    [ring_v[d][slot_a], ring_v[d][slot_b]], axis=1
                )
                v2 = jax.lax.dot_general(
                    oh_chi, v_win, _SELECT_DNUMS,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )  # (T, GS)
                new_acc.append(acc[d] + jnp.sum(v2 * sel, axis=1))

            saturated = r[_T - 1, 0] == float(_W)
            cur_j[0] = jnp.where(
                saturated,
                (c0 + 1) * _CHUNK,
                c0 * _CHUNK + c[_T - 1, 0].astype(jnp.int32),
            )
            return (
                c0 + saturated.astype(jnp.int32),
                ~saturated,
                jnp.maximum(res, live),
                tuple(new_acc),
            )

        init = (
            cur_j[0] // _CHUNK,
            False,
            jnp.zeros((_T, 1), jnp.float32),
            tuple(jnp.zeros((_T,), jnp.float32) for _ in range(n_cols)),
        )
        _, _, _, acc = jax.lax.while_loop(cond, body, init)
        for d in range(n_cols):
            out_refs[d][pl.ds(sub * _T, _T)] = acc[d]

    # Drain any still-inflight prefetch DMA before the kernel exits — an
    # outstanding async copy with an un-waited semaphore aborts the TPU.
    @pl.when(k == pl.num_programs(0) - 1)
    def _drain():
        for s in range(3):
            @pl.when(inflight[s] == 1)
            def _():
                wait_chunk(s)
                inflight[s] = 0


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _tile_chunks(flat):
    """(n_chunks·CHUNK,) → (n_chunks, GS, GH) with element (c, p, g) =
    flat[c·CHUNK + g·GS + p] (groups as lanes, positions as sublanes)."""
    n_chunks = flat.shape[0] // _CHUNK
    return jnp.swapaxes(flat.reshape(n_chunks, _GH, _GS), 1, 2)


@functools.partial(jax.jit, static_argnames=("n_out", "interpret"))
def _expand_cols(starts_padded, cols_padded, n_out, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_cols = len(cols_padded)
    super_tile = _SUB * _T
    n_super = _round_up(n_out, super_tile) // super_tile
    out_struct = jax.ShapeDtypeStruct((n_super * super_tile,), jnp.float32)
    outs = pl.pallas_call(
        functools.partial(_expand_kernel, n_cols=n_cols),
        grid=(n_super,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (1 + n_cols),
        out_specs=tuple(
            pl.BlockSpec((super_tile,), lambda k: (k,),
                         memory_space=pltpu.VMEM)
            for _ in range(n_cols)
        ),
        out_shape=tuple(out_struct for _ in range(n_cols)),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),   # cur_j
            pltpu.SMEM((3,), jnp.int32),   # loaded chunk id per slot
            pltpu.SMEM((3,), jnp.int32),   # inflight flag per slot
            pltpu.VMEM((3, _GS, _GH), jnp.float32),  # starts ring
        ]
        + [pltpu.VMEM((3, _GS, _GH), jnp.float32) for _ in range(n_cols)]
        + [pltpu.SemaphoreType.DMA((3, 1 + n_cols))],
        interpret=interpret,
    )(_tile_chunks(starts_padded),
      *(_tile_chunks(c) for c in cols_padded))
    return tuple(o[:n_out] for o in outs)


def expand_sorted_segments(starts, values, n_out=None, interpret=None):
    """out[i] = values[j(i)] with j(i) = max{j : starts[j] ≤ i}.

    ``starts``: (n_in,) int32/f32, sorted non-decreasing, starts[0] == 0.
    ``values``: (n_in,) or (n_in, D) f32. Returns matching (n_out[, D]).
    Requires n_out < 2^24 (indices are carried exactly in f32).
    """
    values = jnp.asarray(values, jnp.float32)
    n_in = starts.shape[0]
    n_out = n_in if n_out is None else int(n_out)
    if n_out >= 1 << 24:
        raise ValueError("expand kernel requires n_out < 2^24 (f32 indices)")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    starts = jnp.asarray(starts, jnp.float32)

    total = _round_up(n_in, _CHUNK) + 4 * _CHUNK
    pad = total - n_in
    starts_p = jnp.concatenate(
        [starts, jnp.full((pad,), _SENTINEL, jnp.float32)]
    )
    zeros = jnp.zeros((pad,), jnp.float32)
    if values.ndim == 1:
        cols = (jnp.concatenate([values, zeros]),)
    else:
        cols = tuple(
            jnp.concatenate([values[:, d], zeros])
            for d in range(values.shape[1])
        )
    outs = _expand_cols(starts_p, cols, n_out, interpret)
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
    t = jnp.ceil(n * cdf - u0)
    starts = jnp.maximum(
        jnp.concatenate([jnp.zeros((1,), jnp.float32), t[:-1]]), 0.0
    )
    # Monotonize (f32 cumsum noise could produce tiny inversions).
    starts = jax.lax.cummax(starts)
    return expand_sorted_segments(starts, values, n_out=n,
                                  interpret=interpret)
