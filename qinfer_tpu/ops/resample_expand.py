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
- the segment starts and the particle values are streamed RAW (one f32
  stream each) through a 3-slot VMEM ring of (128, 128)-shaped chunks in
  NATURAL row-major order (chunk c element (r, l) = flat c·16384 +
  r·128 + l), so the host-side tiling is a free pad+reshape — no plane
  splits, no transpose pass. DMAs are prefetched one chunk ahead; a skew
  loop advances the window one chunk at a time when a subtile's covering
  particles span beyond the resident window;
- the VALUE streams are pre-shifted by one element (shifted[j] =
  values[j−1]): the covering particle of a stratum with in-window rank
  r = 128·fg + r_lo is then simply the shifted stream's element
  (fg, r_lo) — the rank one-hots select the value DIRECTLY, with no
  second (chi, clo) one-hot level, and a stratum whose covering particle
  is the last element of the *previous* chunk (in-window rank 0) resolves
  through shifted element (0, 0) with no boundary-carry state at all;
- within a subtile the rank r over the resident window is found
  hierarchically: each ROW of the chunk is one sorted group of 128 starts
  whose maximum is its lane-127 element (a static slice — no side
  stream); a (rows × T) compare against the group maxima counts the
  fully-covered groups (fg), an MXU one-hot row-select fetches the
  boundary group's starts, and a second compare finishes the rank (r_lo);
- EVERY cross-lane/sublane reduction (rank counts, the final picked-value
  collapse) is a dot against a ones vector on the MXU — the VPU's
  cross-lane reduce of a (2048, 128) tile costs ~2 µs while the MXU matvec
  is ~0.2 µs (this was the dominant cost of the round-2 kernel);
- Mosaic lowers f32 MXU matmuls to a SINGLE bf16 pass (silently
  rounding), so every select operand is an EXACT bf16 plane, built
  in-kernel from the raw chunk:
  · starts are clamped to the window-relative range [−1, T] (order-
    preserving for every comparison the subtile makes) and split into
    two planes hi = 256·⌊s/256⌋, lo = s − hi — both exact bf16 for the
    integer range involved;
  · values are split into three planes by two Veltkamp multiplications
    (C = 2¹⁶+1: p = C·x − (C·x − x) is x rounded to 8 significand bits,
    so v = p1 + p2 + p3 exactly, each plane bf16-representable — the
    same planes ``lax.reduce_precision(·, 8, 7)`` produces);
  each stream's planes are concatenated on the LANE axis and selected
  with ONE dot_general (operands stay f32 — bf16-VALUED, so Mosaic's
  operand rounding is the identity and the f32-accumulated one-term
  masked sums are exact by construction).

No gathers, no scatters, no sort. Total traffic is O(n·(D+1)) f32 reads +
O(n·D) writes. Indices are carried in f32 (exact for n ≤ 2^24; the
wrapper asserts this). Value magnitudes must stay below ~5.2e33 (the
Veltkamp multiply must not overflow — NaN planes beyond) and above
~1e-30 (the third plane's residual falls below bf16's smallest normal
and flushes — sub-ULP loss); particle coordinates are physical
parameters, far inside both bounds.

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
_T = 2048  # strata per subtile (resized per column count in _expand_cols)

# dot_general contractions (all operands 2-D, strata on lanes):
#   count:  ones (1, R) · cmp (R, T) → (1, T), contracting R
#   select: planes (R, K·L) · onehot (R, T) → (K·L, T), contracting R
_COUNT_DNUMS = (((1,), (0,)), ((), ()))
_SELECT_DNUMS = (((0,), (0,)), ((), ()))
_N_PLANES = 3  # exact bf16 planes per f32 value stream
_VELTKAMP = np.float32((1 << 16) + 1)


def _split_planes(v):
    """Exact 3-way split v == p1 + p2 + p3 into bf16-VALUED f32 planes
    via two Veltkamp multiplications: p = C·x − (C·x − x) with C = 2¹⁶+1
    is x rounded to 8 significand bits (Dekker 1971), i.e. the same plane
    ``lax.reduce_precision(x, 8, 7)`` yields, but from three VPU ops that
    lower inside a Mosaic kernel. Each plane strips ≥ 8 mantissa bits, so
    three planes cover f32's 24-bit significand exactly.

    Caveats (measured on-chip, tests/test_tpu_only.py): |v| must stay
    below ~5.2e33 = f32_max/(2¹⁶+1) — beyond it C·x overflows and every
    plane is NaN (verified: _split_planes(5.3e33) → nan) — and the third
    plane flushes for |v| ≲ 1e-30 (its residual ~|v|·2⁻¹⁶ falls under
    bf16's smallest normal), a sub-ULP loss at ~7e-5 relative. Segment
    starts are integers and particle coordinates are physical
    parameters, so the expand kernel never sees either regime."""
    c1 = v * _VELTKAMP
    p1 = c1 - (c1 - v)
    r1 = v - p1
    c2 = r1 * _VELTKAMP
    p2 = c2 - (c2 - r1)
    return p1, p2, r1 - p2


def _expand_kernel(*refs, n_cols, t_size):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_streams = 1 + n_cols  # raw f32: starts, then shifted value columns
    stream_hbms = refs[:n_streams]
    affine_ref = refs[n_streams]  # (2, n_cols) SMEM: per-column scale/shift
    out_refs = refs[n_streams + 1 : n_streams + 1 + n_cols]
    (cur_j, loaded, inflight, ring) = refs[
        n_streams + 1 + n_cols : n_streams + 1 + n_cols + 4
    ]
    # ring: (3 slots, n_streams, ROWS, LANES) f32
    sems = refs[n_streams + n_cols + 5]  # DMA sems, shape (3, n_streams)

    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        cur_j[0] = 0
        for s in range(3):
            loaded[s] = -1
            inflight[s] = 0

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
        jnp.float32)  # within-group ids, on sublanes of the (L, T) one-hot
    n_sub = _SUPER // t_size
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (1, t_size), 1).astype(
        jnp.float32)  # subtile-relative stratum ids [0, T)
    ones_r = jnp.ones((1, _ROWS), jnp.float32)
    ones_l = jnp.ones((1, _LANES), jnp.float32)
    t_f = jnp.float32(t_size)
    r_f = jnp.float32(_ROWS)

    def count(ones, cmp_f32):
        """#true per stratum: MXU matvec (exact: 0/1 inputs, f32 accum)."""
        return jax.lax.dot_general(
            ones, cmp_f32, _COUNT_DNUMS,
            preferred_element_type=jnp.float32,
        )  # (1, T)

    for sub in range(n_sub):
        sub_start = (k * n_sub + sub) * t_size
        sub_start_f = sub_start.astype(jnp.float32)
        row = sub_start_f + t_iota  # (1, T) absolute stratum ids

        def cond(c):
            return ~c[1]

        def body(c):
            c0, _, res, acc = c
            ensure(c0)
            prefetch(c0 + 1)

            slot = jax.lax.rem(c0, 3)
            s = ring[slot, 0]  # (R, L) raw f32 starts
            # Group maxima: lane 127 of each row (a static slice).
            gmax = s[:, _LANES - 1 :]  # (R, 1)

            # Level 1: how many groups lie fully at/below each stratum.
            # The count dot's output dim is 1 (padded to a sublane tile,
            # NOT to 128), so it costs ~1/16 of a select dot — a
            # two-compare prefix one-hot was tried and saved nothing
            # while Mosaic rejected its (R, 1) shifted concat.
            # (All dot operands stay f32 but are bf16-VALUED — Mosaic's
            # single-pass bf16 operand rounding is then the identity, so
            # each select/count is exact; the CPU interpret path computes
            # true f32 and agrees bit-for-bit.)
            fg = count(ones_r, (gmax <= row).astype(jnp.float32))  # (1,T)
            oh_fg = (g_iota == fg).astype(jnp.float32)  # (R, T)

            # Exact bf16-valued planes of the starts, selected with one
            # MXU dot: window-relative clamp (order-preserving for every
            # comparison this subtile makes) then an exact 256-split —
            # integers in [−256, 4096] need only two planes.
            sc = jnp.clip(s - sub_start_f, -1.0, t_f)
            hi = jnp.floor(sc * (1.0 / 256.0)) * 256.0
            sel_s = jax.lax.dot_general(
                jnp.concatenate([hi, sc - hi], axis=1), oh_fg,
                _SELECT_DNUMS, preferred_element_type=jnp.float32,
            )  # (2L, T): the boundary group's starts planes

            # Level 2: rank within the boundary group (one-term sums in
            # f32 accum — s2 is exact).
            s2 = sel_s[:_LANES] + sel_s[_LANES:]
            r_lo = count(ones_l, (s2 <= t_iota).astype(jnp.float32))

            # fg == R means every resident start ≤ the stratum — the
            # covering particle may lie at/beyond the window end. Defer
            # those strata to the next (advanced) visit; they resolve
            # there with rank ≥ 0, rank 0 picking the shifted stream's
            # window-first element = the previous chunk's LAST particle.
            # Strata already resolved in an earlier visit mask via `res`.
            live = (fg < r_f).astype(jnp.float32) * (1.0 - res)  # (1, T)
            oh_lane = ((l_iota == r_lo) & (live > 0.0)).astype(
                jnp.float32)  # (L, T)

            new_acc = []
            for d in range(n_cols):
                sel_v = jax.lax.dot_general(
                    jnp.concatenate(_split_planes(ring[slot, 1 + d]),
                                    axis=1),
                    oh_fg, _SELECT_DNUMS,
                    preferred_element_type=jnp.float32,
                )  # (3L, T): the boundary group's value planes
                picked = None
                for p in range(_N_PLANES):
                    m = sel_v[p * _LANES : (p + 1) * _LANES] * oh_lane
                    part = count(ones_l, m)  # one-term masked sum: exact
                    picked = part if picked is None else picked + part
                new_acc.append(acc[d] + picked)

            fg_last = fg[0, t_size - 1]
            saturated = fg_last == r_f
            # Next subtile's window: the chunk holding the last covering
            # particle (clamped ≥ c0 — a shift-resolved rank-0 last
            # stratum must not step the window backward).
            cc_last = r_f * fg_last + r_lo[0, t_size - 1] - 1.0
            cur_j[0] = jnp.where(
                saturated,
                (c0 + 1) * _CHUNK,
                c0 * _CHUNK + jnp.maximum(cc_last, 0.0).astype(jnp.int32),
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


def _subtile_size(n_cols):
    """Strata per while-loop visit, from an on-chip sweep at 2^20
    (bench_expand_phases.py, BENCH_EXPAND_GEOM): per-visit fixed cost is
    tiny (~0.2 µs — T=1024 vs T=2048 differ by only ~6% at D=1), so the
    choice balances VMEM pressure against visit count. Measured: D=1 —
    1.73/1.62/1.66 ms at T=1024/2048/4096; D=4 — 4.09/4.47 at 2048/4096;
    D=16 — 17.6/15.5/16.6 at 512/1024/2048. The per-column select
    buffers are sequential (one column in flight), so T=1024 fits any
    width."""
    if n_cols <= 5:
        return _T
    return _T // 2


@functools.partial(jax.jit, static_argnames=("n_out", "interpret"))
def _expand_cols(starts_padded, cols_padded, n_out, interpret, affine=None):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_cols = len(cols_padded)
    if affine is None:
        affine = jnp.stack([jnp.ones((n_cols,), jnp.float32),
                            jnp.zeros((n_cols,), jnp.float32)])
    n_streams = 1 + n_cols
    t_size = _subtile_size(n_cols)
    super_tile = _SUPER
    n_super = _round_up(n_out, super_tile) // super_tile
    out_struct = jax.ShapeDtypeStruct((n_super, 1, super_tile), jnp.float32)
    streams = [_tile_chunks(arr) for arr in (starts_padded, *cols_padded)]

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
                pltpu.VMEM((3, n_streams, _ROWS, _LANES), jnp.float32),
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
    # Value streams are SHIFTED one element right (shifted[j] =
    # values[j−1]): a stratum of global rank r picks shifted[r], so the
    # in-kernel rank one-hots index values directly and an in-window
    # rank of 0 lands on the previous chunk's last particle for free.
    # (Global rank 0 cannot occur — starts[0] == 0 ≤ every stratum — so
    # shifted[0] is never read; global rank n_in CAN occur and reads
    # shifted[n_in] = values[n_in−1], hence the prepend-by-one layout.)
    zeros = jnp.zeros((pad - 1,), jnp.float32)
    if values.ndim == 1:
        cols = (jnp.concatenate([values[:1], values, zeros]),)
    else:
        cols = tuple(
            jnp.concatenate([values[:1, d], values[:, d], zeros])
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
