"""Systematic-resampling expand kernel (Pallas TPU).

The inverse-CDF step of systematic resampling maps sorted strata
u_i = (i + u0)/n onto sorted particle segments [t_{j−1}, t_j) — a merge of
two sorted sequences. XLA has no fast lowering for it on TPU (measured at
n=1M: searchsorted ≈ 130 ms, scatter+cummax+gather ≈ 17 ms, blocked
one-hot pick ≈ 14 ms — see bench_breakdown.py / doc/guide_performance.md).
This kernel exploits the sortedness and streams the bank once:

- the output strata are processed in T-sized subtiles by a sequential TPU
  grid (several subtiles per grid step); per-stratum quantities live on
  the LANE axis end-to-end, so no sublane↔lane relayouts ever happen;
- the particle segment starts and the particle values are streamed through
  a 3-slot VMEM ring of (128, 128)-shaped chunks in NATURAL row-major
  order (chunk c element (r, l) = flat c·16384 + r·128 + l), so the host-
  side tiling is a free reshape — no transpose pass. DMAs are prefetched
  one chunk ahead; a skew loop advances the window one chunk at a time
  when a subtile's covering particles span beyond the resident window;
- within a subtile the rank r(t) = #{starts ≤ t} over the resident window
  is found hierarchically: each ROW of the chunk is one sorted group of
  128 starts whose maximum is its lane-127 element (a static slice — no
  side stream); a (rows × T) compare against the group maxima counts the
  fully-covered groups, an MXU one-hot row-select fetches the boundary
  group's starts, and a second compare finishes the rank;
- EVERY cross-lane/sublane reduction (rank counts, the final picked-value
  collapse) is a dot against a ones vector on the MXU — the VPU's
  cross-lane reduce of a (2048, 128) tile costs ~2 µs while the MXU matvec
  is ~0.2 µs, and this was the dominant cost of the round-2 kernel;
- Mosaic lowers f32 MXU matmuls to a SINGLE bf16 pass (silently rounding),
  so every f32 stream is pre-split into THREE bf16 planes
  (v = p1 + p2 + p3, the standard exact 3-way split: 3 × 8 significand
  bits ≥ the 24-bit f32 mantissa) and each select is three single-pass
  bf16 dots whose one-hot-masked sums have exactly one nonzero term —
  exact by construction;
- the window is ONE chunk (16384 particles) and advances by whole chunks;
  a stratum whose covering particle is the last element of the *previous*
  window resolves through a per-column SMEM boundary carry (rank 0 under
  the current window ⇒ covering = last particle of the prior chunk, by
  the advance rule: the window only advances past a chunk once all its
  starts are ≤ the saturating stratum).

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
_ROWS = 128  # groups per chunk (sublanes); one group = one chunk row
_LANES = 128  # group size (the TPU lane width)
_CHUNK = _ROWS * _LANES  # particles per DMA chunk (16384) = window width
_W = _CHUNK
_SUPER = 8192  # strata per grid step (= n_sub · t_size)
_T = 2048  # strata per subtile (shrunk for very wide models)

# dot_general contractions (all operands 2-D, strata on lanes):
#   count:  ones (1, R) · cmp (R, T) → (1, T), contracting R
#   select: ring (R, L) · onehot (R, T) → (L, T), contracting R
_COUNT_DNUMS = (((1,), (0,)), ((), ()))
_SELECT_DNUMS = (((0,), (0,)), ((), ()))
_N_PLANES = 3


def _expand_kernel(*refs, n_cols, t_size):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_streams = _N_PLANES * (1 + n_cols)
    stream_hbms = refs[:n_streams]  # starts planes, then col-0 planes, …
    affine_ref = refs[n_streams]  # (2, n_cols) SMEM: per-column scale/shift
    out_refs = refs[n_streams + 1 : n_streams + 1 + n_cols]
    (cur_j, loaded, inflight, carry, ring) = refs[
        n_streams + 1 + n_cols : n_streams + 1 + n_cols + 5
    ]
    # ring: (3 slots, n_streams, ROWS, LANES) bf16
    sems = refs[n_streams + n_cols + 6]  # DMA sems, shape (3, n_streams)

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
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 1), 0).astype(
        jnp.float32)  # group/row ids, on sublanes
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, 1), 0).astype(
        jnp.float32)  # within-group ids, on sublanes of (L, T) selects
    n_sub = _SUPER // t_size
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (1, t_size), 1).astype(
        jnp.float32)
    ones_r = jnp.ones((1, _ROWS), jnp.bfloat16)
    ones_l = jnp.ones((1, _LANES), jnp.bfloat16)
    # Corner mask for the boundary carry: the window's LAST particle
    # (row 127, lane 127).
    corner = (
        (jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 0) == _ROWS - 1)
        & (jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 1)
           == _LANES - 1)
    ).astype(jnp.float32)

    def count(cmp_bf16):
        """#true per stratum: MXU matvec (exact: 0/1 inputs, f32 accum)."""
        return jax.lax.dot_general(
            ones_r, cmp_bf16, _COUNT_DNUMS,
            preferred_element_type=jnp.float32,
        )  # (1, T)

    def select3(slot, stream0, oh_bf16):
        """Exact f32 one-hot row-select via three single-pass bf16 dots:
        (R, L) · (R, T) → (L, T), each output a one-term masked sum."""
        acc = None
        for p in range(_N_PLANES):
            part = jax.lax.dot_general(
                ring[slot, stream0 + p], oh_bf16, _SELECT_DNUMS,
                preferred_element_type=jnp.float32,
            )
            acc = part if acc is None else acc + part
        return acc  # (L, T)

    for sub in range(n_sub):
        sub_start = (k * n_sub + sub) * t_size
        row = sub_start.astype(jnp.float32) + t_iota  # (1, T) stratum ids

        def cond(c):
            return ~c[1]

        def body(c):
            c0, _, res, acc = c
            ensure(c0)
            prefetch(c0 + 1)

            slot = jax.lax.rem(c0, 3)
            # Group maxima: lane 127 of each start-plane row, summed back
            # to exact f32. (R, 1) — no transpose, no side stream.
            gmax = (
                ring[slot, 0][:, _LANES - 1 :].astype(jnp.float32)
                + ring[slot, 1][:, _LANES - 1 :].astype(jnp.float32)
                + ring[slot, 2][:, _LANES - 1 :].astype(jnp.float32)
            )

            # Level 1: how many groups lie fully at/below each stratum.
            fg = count((gmax <= row).astype(jnp.bfloat16))  # (1,T) ∈ [0,R]
            oh_fg = (g_iota == fg).astype(jnp.bfloat16)  # (R, T)
            # Level 2: rank within the (fg)-th group via MXU row-select.
            s2 = select3(slot, 0, oh_fg)  # (L, T) — group fg's starts
            r_lo = count((s2 <= row).astype(jnp.bfloat16))  # (1, T)
            r = jnp.minimum(_LANES * fg + r_lo, float(_W))  # (1, T)

            cc = r - 1.0  # covering index in-window; −1 → boundary carry
            chi = jnp.floor(cc / _LANES)
            clo = cc - _LANES * chi
            oh_chi = (g_iota == chi).astype(jnp.bfloat16)  # (R, T)
            # r == W means the covering particle may lie at/beyond the
            # window end — defer those strata to the next (advanced) visit;
            # they resolve there with r ≥ 1, or r == 0 ⇒ covering is the
            # previous window's LAST particle (the SMEM carry). Strata
            # already resolved in an earlier visit are masked via `res`.
            live = (r < float(_W)).astype(jnp.float32) * (1.0 - res)  # (1,T)
            oh_clo = (l_iota == clo).astype(jnp.float32) * live  # (L, T)
            carried = (r == 0.0).astype(jnp.float32) * live  # (1, T)

            new_acc = []
            for d in range(n_cols):
                s0 = _N_PLANES * (1 + d)
                picked = None
                for p in range(_N_PLANES):
                    v2 = jax.lax.dot_general(
                        ring[slot, s0 + p], oh_chi, _SELECT_DNUMS,
                        preferred_element_type=jnp.float32,
                    )  # (L, T) — group chi's plane-p values (exact bf16)
                    part = jax.lax.dot_general(
                        ones_l, (v2 * oh_clo).astype(jnp.bfloat16),
                        _COUNT_DNUMS, preferred_element_type=jnp.float32,
                    )  # (1, T) — one-term masked sum: exact
                    picked = part if picked is None else picked + part
                picked = picked + carry[d] * carried
                new_acc.append(acc[d] + picked)

            saturated = r[0, t_size - 1] == float(_W)

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
            # particle (clamped ≥ c0 — a carry-resolved last stratum must
            # not step the window backward, which would invalidate the
            # carry).
            cur_j[0] = jnp.where(
                saturated,
                (c0 + 1) * _CHUNK,
                c0 * _CHUNK
                + jnp.maximum(cc[0, t_size - 1], 0.0).astype(jnp.int32),
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
            jnp.zeros((1, t_size), jnp.float32),
            tuple(jnp.zeros((1, t_size), jnp.float32)
                  for _ in range(n_cols)),
        )
        _, _, _, acc = jax.lax.while_loop(cond, body, init)
        for d in range(n_cols):
            # Fused per-column affine (Liu–West shrinkage a·x + (1−a)μ):
            # applied at the output write, saving the engine one full
            # read+write pass over the picked bank. Identity by default.
            out_refs[d][0, :, pl.ds(sub * t_size, t_size)] = (
                acc[d] * affine_ref[0, d] + affine_ref[1, d]
            )

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
    """(n_chunks·CHUNK,) → (n_chunks, ROWS, LANES) row-major — a free
    reshape: element (c, r, l) = flat[c·CHUNK + r·LANES + l]."""
    n_chunks = flat.shape[0] // _CHUNK
    return flat.reshape(n_chunks, _ROWS, _LANES)


def _split_planes(x):
    """Exact 3-way bf16 split: x == p1 + p2 + p3 for every finite normal
    f32 (each rounding removes ≥ 8 mantissa bits; 3 × 8 significand bits ≥
    the 24-bit f32 mantissa). Uses ``lax.reduce_precision`` — NOT an
    astype(bf16) round-trip, which XLA's excess-precision simplifier folds
    to identity on TPU (measured: x − f32(bf16(x)) compiles to 0).

    Caveat (measured on-chip, tests/test_tpu_only.py): for |x| ≲ 1e-30 the
    third plane's residual (~|x|·2⁻¹⁶) falls below bf16's smallest normal
    (≈1.2e-38) and flushes — sub-ULP loss at ~7e-5 relative. Segment
    starts are integers and particle coordinates are physical parameters,
    so the expand kernel never sees that regime."""
    h1 = jax.lax.reduce_precision(x, 8, 7)  # bf16-valued, f32 dtype
    r1 = x - h1
    h2 = jax.lax.reduce_precision(r1, 8, 7)
    r2 = r1 - h2
    h3 = jax.lax.reduce_precision(r2, 8, 7)
    return (h1.astype(jnp.bfloat16), h2.astype(jnp.bfloat16),
            h3.astype(jnp.bfloat16))


@functools.partial(jax.jit, static_argnames=("n_out", "interpret"))
def _expand_cols(starts_padded, cols_padded, n_out, interpret, affine=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_cols = len(cols_padded)
    if affine is None:
        affine = jnp.stack([jnp.ones((n_cols,), jnp.float32),
                            jnp.zeros((n_cols,), jnp.float32)])
    n_streams = _N_PLANES * (1 + n_cols)
    # The (·, t_size) intermediates live on the 16 MB VMEM stack; the ring
    # grows with the column count — shrink the subtile for very wide
    # models so both fit. Narrow models get a DOUBLE subtile: the kernel
    # pays ~1 µs of fixed cost per while-loop visit (scalar bookkeeping +
    # dot dispatches), so halving the visit count at D ≤ 2 is a measured
    # ~0.2–0.3 ms win at 1M with VMEM to spare.
    if n_cols <= 2:
        t_size = 2 * _T
    elif n_cols <= 6:
        t_size = _T
    elif n_cols <= 12:
        t_size = _T // 2
    else:
        t_size = _T // 4
    super_tile = _SUPER
    n_super = _round_up(n_out, super_tile) // super_tile
    out_struct = jax.ShapeDtypeStruct((n_super, 1, super_tile), jnp.float32)
    streams = []
    for arr in (starts_padded, *cols_padded):
        streams.extend(_tile_chunks(p) for p in _split_planes(arr))

    # sequential_vmap: vmapped callers (big-bank ensemble resamples — the
    # auto gate only routes n ≥ 2^17 banks here, so batch sizes are small
    # and per-trial kernel time dominates) run the kernel once per batch
    # element via lax.map instead of failing to lower.
    @jax.custom_batching.sequential_vmap
    def _call(affine, *streams):
        return pl.pallas_call(
            functools.partial(_expand_kernel, n_cols=n_cols, t_size=t_size),
            grid=(n_super,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_streams
            + [pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=tuple(
                pl.BlockSpec((1, 1, super_tile), lambda k: (k, 0, 0),
                             memory_space=pltpu.VMEM)
                for _ in range(n_cols)
            ),
            out_shape=tuple(out_struct for _ in range(n_cols)),
            scratch_shapes=[
                pltpu.SMEM((1,), jnp.int32),   # cur_j
                pltpu.SMEM((3,), jnp.int32),   # loaded chunk id per slot
                pltpu.SMEM((3,), jnp.int32),   # inflight flag per slot
                pltpu.SMEM((max(n_cols, 1),), jnp.float32),  # boundary carry
                pltpu.VMEM((3, n_streams, _ROWS, _LANES), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((3, n_streams)),
            ],
            interpret=interpret,
        )(*streams, affine)

    outs = _call(jnp.asarray(affine, jnp.float32), *streams)
    return tuple(o.reshape(-1)[:n_out] for o in outs)


def expand_sorted_segments(starts, values, n_out=None, interpret=None,
                           scale=None, shift=None):
    """out[i] = values[j(i)] with j(i) = max{j : starts[j] ≤ i}.

    ``starts``: (n_in,) int32/f32, sorted non-decreasing, starts[0] == 0.
    ``values``: (n_in,) or (n_in, D) f32. Returns matching (n_out[, D]).
    Requires n_out < 2^24 (indices are carried exactly in f32).

    ``scale``/``shift``: optional per-column affine applied in the
    kernel's output stage (out = picked·scale + shift) — the Liu–West
    shrinkage fused for free.
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
    affine = None
    if scale is not None or shift is not None:
        n_cols = len(cols)
        affine = jnp.stack([
            jnp.broadcast_to(
                jnp.asarray(1.0 if scale is None else scale, jnp.float32),
                (n_cols,)),
            jnp.broadcast_to(
                jnp.asarray(0.0 if shift is None else shift, jnp.float32),
                (n_cols,)),
        ])
    outs = _expand_cols(starts_p, cols, n_out, interpret, affine)
    if values.ndim == 1:
        return outs[0]
    return jnp.stack(outs, axis=1)


def systematic_expand(key, log_w, values, interpret=None, scale=None,
                      shift=None):
    """Systematic-resampled values: values[idx], idx ~ systematic(w),
    computed via the expand kernel (no gather/scatter/searchsorted).

    Equivalent to ``values[systematic_resample_indices(key, log_w)]``
    (optionally affine-transformed in-kernel via ``scale``/``shift``).
    """
    from ..resamplers import systematic_segment_starts

    n = log_w.shape[0]
    # Shared int32-CDF prep: starts are sorted BY CONSTRUCTION (exact
    # integer cumsum — see systematic_segment_starts), which the window-
    # advance logic of the kernel requires, with no monotonizing cummax
    # pass (~0.19 ms at 1M saved per resample).
    starts = systematic_segment_starts(key, log_w, n)
    return expand_sorted_segments(starts, values, n_out=n,
                                  interpret=interpret, scale=scale,
                                  shift=shift)
