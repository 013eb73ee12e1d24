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
- within a subtile the rank r(i) = #{starts ≤ i} over the resident window
  is found *hierarchically*: a (T, G) compare against the G group maxima
  picks each stratum's group, an MXU one-hot row-select fetches that
  group's GS starts, and a second (T, GS) compare finishes the rank —
  O(G + GS) work per stratum instead of O(W), with the row selects running
  as (T, G) · (GS, G)ᵀ contractions on the MXU;
- the covering particle's value is fetched the same way (one-hot group
  select + within-group one-hot reduce); all D parameter columns share the
  rank math and pay one extra select each;
- Mosaic lowers f32 MXU matmuls to a SINGLE bf16 pass (silently rounding),
  so every f32 stream is pre-split into THREE bf16 planes
  (v = p1 + p2 + p3, the standard exact 3-way split: 3 × 9 significant
  bits ≥ the 24-bit f32 mantissa) and each select is three single-pass
  bf16 dots — exact, and half the MXU passes of precision=HIGHEST;
- the window is ONE chunk and advances by whole chunks; a stratum whose
  covering particle is the last element of the *previous* window resolves
  through a per-column SMEM boundary carry (rank 0 under the current
  window ⇒ covering = last particle of the prior chunk, by the advance
  rule: the window only advances past a chunk once all its starts are ≤
  the saturating stratum).

Mosaic cannot shape-cast 1-D↔2-D vectors in-kernel, so the streams are
pre-tiled OUTSIDE the kernel (one cheap XLA transpose) into
``(n_chunks, GS, GH)`` blocks: chunk c element (p, g) is flat index
``c·CHUNK + g·GS + p``; column g of a resident window is the g-th group
of GS consecutive (sorted) starts, so its group max is row GS−1.

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
_GS = 64  # group size (sublanes of a window tile; multiple of bf16's 16)
_GH = 128  # groups per chunk (lanes of a ring slot; the TPU lane width)
_G = _GH  # groups per resident window (window = one chunk)
_CHUNK = _GS * _GH  # particles per DMA chunk (8192) = window width
_W = _CHUNK
_SUPER = 8192  # strata per grid step (= _SUB · _T, fixed)
_T = 2048  # strata per subtile (default; shrunk for many-column calls)

# dot_general contraction: (T, G) · (GS, G) → (T, GS), contracting G.
_SELECT_DNUMS = (((1,), (1,)), ((), ()))
_N_PLANES = 3


def _expand_kernel(*refs, n_cols, t_size):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_streams = _N_PLANES * (1 + n_cols)
    stream_hbms = refs[:n_streams]  # s planes, then col-0 planes, …
    out_refs = refs[n_streams : n_streams + n_cols]
    (cur_j, loaded, inflight, carry, ring) = refs[
        n_streams + n_cols : n_streams + n_cols + 5
    ]
    # ring: (3 slots, n_streams, GS, GH) bf16
    sems = refs[n_streams + n_cols + 5]  # DMA sems, shape (3, n_streams)

    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        cur_j[0] = 0
        for s in range(3):
            loaded[s] = -1
            inflight[s] = 0
        for d in range(n_cols):
            carry[d] = 0.0

    def dma_chunk(c, slot):
        for t in range(n_streams):
            pltpu.make_async_copy(
                stream_hbms[t].at[c], ring.at[slot, t], sems.at[slot, t]
            ).start()

    def wait_chunk(slot):
        # .wait() waits for the byte count of the copy it is built from;
        # the src/dst refs are placeholders with the started copies' shape.
        for t in range(n_streams):
            pltpu.make_async_copy(
                ring.at[0, 0], ring.at[0, 0], sems.at[slot, t]
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
    n_sub = _SUPER // t_size
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (t_size, 1), 0).astype(
        jnp.float32)
    # Corner mask for the boundary carry: the window's LAST particle.
    corner = (
        (jax.lax.broadcasted_iota(jnp.int32, (_GS, _GH), 0) == _GS - 1)
        & (jax.lax.broadcasted_iota(jnp.int32, (_GS, _GH), 1) == _GH - 1)
    ).astype(jnp.float32)

    def select3(oh_bf16, slot, stream0):
        """Exact f32 one-hot row-select via three single-pass bf16 dots."""
        acc = None
        for p in range(_N_PLANES):
            part = jax.lax.dot_general(
                oh_bf16, ring[slot, stream0 + p], _SELECT_DNUMS,
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        return acc  # (T, GS)

    for sub in range(n_sub):
        sub_start = (k * n_sub + sub) * t_size
        row = sub_start.astype(jnp.float32) + t_iota  # (T, 1) stratum ids

        def cond(c):
            return ~c[1]

        def body(c):
            c0, _, res, acc = c
            ensure(c0)
            prefetch(c0 + 1)

            slot = jax.lax.rem(c0, 3)
            # Group maxima: the last (GS−1) row of each start plane, summed
            # back to exact f32. (1, G)
            gmax = (
                ring[slot, 0][_GS - 1 : _GS, :].astype(jnp.float32)
                + ring[slot, 1][_GS - 1 : _GS, :].astype(jnp.float32)
                + ring[slot, 2][_GS - 1 : _GS, :].astype(jnp.float32)
            )

            # Level 1: how many groups lie fully at/below this stratum.
            # (bf16 compare buffers: integer counts ≤ G are bf16-exact
            # and the halved VMEM footprint lets t_size stay large.)
            fg = jnp.sum(
                (gmax <= row).astype(jnp.bfloat16), axis=1, keepdims=True
            ).astype(jnp.float32)  # (T, 1), in [0, G]
            oh_fg = (fg == g_iota).astype(jnp.bfloat16)  # (T, G)
            # Level 2: rank within the (fg)-th group via MXU column-select.
            s2 = select3(oh_fg, slot, 0)  # (T, GS) — group fg's starts
            r_lo = jnp.sum(
                (s2 <= row).astype(jnp.bfloat16), axis=1, keepdims=True
            ).astype(jnp.float32)
            r = jnp.minimum(_GS * fg + r_lo, float(_W))  # (T, 1)

            cc = r - 1.0  # local covering index; −1 → boundary carry
            chi = jnp.floor(cc / _GS)
            clo = cc - _GS * chi
            oh_chi = (chi == g_iota).astype(jnp.bfloat16)  # (T, G)
            oh_clo = (clo == gs_iota).astype(jnp.float32)  # (T, GS)
            # r == W means the covering particle may lie at/beyond the
            # window end — defer those rows to the next (advanced) visit;
            # they resolve there with r ≥ 1, or r == 0 ⇒ covering is the
            # previous window's LAST particle (the SMEM carry). Rows
            # already resolved in an earlier visit are masked via `res`.
            live = (r < float(_W)).astype(jnp.float32) * (1.0 - res)  # (T,1)
            sel = oh_clo * live
            carried = (r == 0.0).astype(jnp.float32) * live  # (T, 1)

            new_acc = []
            for d in range(n_cols):
                v2 = select3(oh_chi, slot, _N_PLANES * (1 + d))  # (T, GS)
                picked = jnp.sum(v2 * sel, axis=1)
                picked = picked + carry[d] * carried[:, 0]
                new_acc.append(acc[d] + picked)

            saturated = r[t_size - 1, 0] == float(_W)

            @pl.when(saturated)
            def _advance_carry():
                # carry ← last particle of the chunk being advanced over.
                for d in range(n_cols):
                    s0 = _N_PLANES * (1 + d)
                    carry[d] = jnp.sum(
                        (
                            ring[slot, s0].astype(jnp.float32)
                            + ring[slot, s0 + 1].astype(jnp.float32)
                            + ring[slot, s0 + 2].astype(jnp.float32)
                        )
                        * corner
                    )

            # Next subtile's window: the chunk holding the last covering
            # particle (clamped ≥ c0 — a carry-resolved last row must not
            # step the window backward, which would invalidate the carry).
            cur_j[0] = jnp.where(
                saturated,
                (c0 + 1) * _CHUNK,
                c0 * _CHUNK
                + jnp.maximum(cc[t_size - 1, 0], 0.0).astype(jnp.int32),
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
            jnp.zeros((t_size, 1), jnp.float32),
            tuple(jnp.zeros((t_size,), jnp.float32) for _ in range(n_cols)),
        )
        _, _, _, acc = jax.lax.while_loop(cond, body, init)
        for d in range(n_cols):
            out_refs[d][pl.ds(sub * t_size, t_size)] = acc[d]

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


def _split_planes(x):
    """Exact 3-way bf16 split: x == p1 + p2 + p3 for every finite normal
    f32 (each rounding removes ≥ 8 mantissa bits; 3 × 8 significand bits ≥
    the 24-bit f32 mantissa). Uses ``lax.reduce_precision`` — NOT an
    astype(bf16) round-trip, which XLA's excess-precision simplifier folds
    to identity on TPU (measured: x − f32(bf16(x)) compiles to 0)."""
    h1 = jax.lax.reduce_precision(x, 8, 7)  # bf16-valued, f32 dtype
    r1 = x - h1
    h2 = jax.lax.reduce_precision(r1, 8, 7)
    r2 = r1 - h2
    h3 = jax.lax.reduce_precision(r2, 8, 7)
    return (h1.astype(jnp.bfloat16), h2.astype(jnp.bfloat16),
            h3.astype(jnp.bfloat16))


@functools.partial(jax.jit, static_argnames=("n_out", "interpret"))
def _expand_cols(starts_padded, cols_padded, n_out, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_cols = len(cols_padded)
    n_streams = _N_PLANES * (1 + n_cols)
    # The (t_size, ·) intermediates live on the 16 MB VMEM stack and scale
    # with the column count — shrink the subtile as columns grow (measured:
    # n_cols=4 at t_size=2048 overflows by ~0.9 MB). Fewer, larger subtiles
    # amortize per-visit fixed costs (gmax prep, loop/DMA bookkeeping).
    if n_cols <= 2:
        t_size = _T
    elif n_cols <= 9:
        t_size = _T // 2
    else:
        t_size = _T // 4
    super_tile = _SUPER
    n_super = _round_up(n_out, super_tile) // super_tile
    out_struct = jax.ShapeDtypeStruct((n_super * super_tile,), jnp.float32)
    streams = []
    for arr in (starts_padded, *cols_padded):
        streams.extend(_tile_chunks(p) for p in _split_planes(arr))
    outs = pl.pallas_call(
        functools.partial(_expand_kernel, n_cols=n_cols, t_size=t_size),
        grid=(n_super,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_streams,
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
            pltpu.SMEM((max(n_cols, 1),), jnp.float32),  # boundary carry
            pltpu.VMEM((3, n_streams, _GS, _GH), jnp.bfloat16),  # ring
            pltpu.SemaphoreType.DMA((3, n_streams)),
        ],
        interpret=interpret,
    )(*streams)
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

    # Pad with sentinels: the window never advances past the first chunk
    # containing a sentinel (2^30 > any stratum id), so +2 chunks bound the
    # prefetch target (window + 1).
    total = _round_up(n_in, _CHUNK) + 2 * _CHUNK
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
