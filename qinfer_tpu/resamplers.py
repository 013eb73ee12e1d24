"""On-device resamplers (TPU-native analogue of qinfer's resamplers.py).

Reference parity: ``src/qinfer/resamplers.py`` — ``Resampler`` (ABC),
``LiuWestResampler`` (a=0.98 default; h, maxiter, postselect,
zero_cov_comp, optional custom kernel).

Design (not a port): the resampler is a pure function
``(key, model, locs, log_w) -> new_locs`` that runs entirely on device
inside the jitted SMC step:

- index draw: *systematic resampling* instead of the reference's
  multinomial ``np.random.choice`` — same marginal distribution over
  counts with strictly lower variance (PAPERS.md: variance reduction of
  resampling, arXiv:2309.08620). The inverse-CDF pick is computed without
  ``searchsorted`` or full-width gathers (``systematic_pick_blocked``;
  measured table in doc/guide_performance.md).
- Liu–West shrinkage: new = a·x[idx] + (1−a)·μ + h·Σ^{1/2}·ε preserves the
  first two posterior moments exactly (h² = 1 − a²).
- postselection: the reference's unbounded per-particle rejection loop
  becomes ``maxiter`` *vectorized* redraw rounds (each round redraws every
  still-invalid particle), then a clamp-to-valid fallback via
  ``model.canonicalize`` — bounded, jittable, and preserves validity.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .utils import normalize_log_weights, sqrtm_psd, weighted_moments

__all__ = [
    "Resampler",
    "LiuWestResampler",
    "ClusteringResampler",
    "systematic_resample_indices",
    "systematic_pick_blocked",
    "multinomial_resample_indices",
    "fast_normal",
]


# Weight-quantization scale for the integer CDF: Σ round(w·K) ≤ K + n/2
# < 2^31 for any n < 2^31, so the int32 cumsum cannot overflow.
_CDF_QUANT = float(1 << 30)


def exact_int_cumsum(q):
    """Inclusive int32 cumsum via a three-level (m, 128, 128) hierarchy.

    Integer addition is exact, so ANY decomposition yields the identical
    result — this one replaces XLA's ~log₂(n) full-width scan passes with
    one lane-axis cumsum over 128-wide rows plus two tiny prefixes.
    Measured at 1M on TPU: 0.095 ms vs 0.203 ms for flat ``jnp.cumsum``.
    """
    n = q.shape[0]
    blk = 128 * 128
    if n < blk:
        return jnp.cumsum(q)
    n_pad = ((n + blk - 1) // blk) * blk
    if n_pad != n:
        q = jnp.concatenate([q, jnp.zeros((n_pad - n,), q.dtype)])
    q3 = q.reshape(n_pad // blk, 128, 128)
    lane = jnp.cumsum(q3, axis=2)
    row_tot = lane[:, :, -1]  # (m, 128)
    row_pref = jnp.cumsum(row_tot, axis=1)
    row_excl = row_pref - row_tot
    blk_tot = row_pref[:, -1]  # (m,)
    blk_excl = jnp.concatenate(
        [jnp.zeros((1,), q.dtype), jnp.cumsum(blk_tot)[:-1]]
    )
    out = lane + row_excl[:, :, None] + blk_excl[:, None, None]
    return out.reshape(n_pad)[:n]


def systematic_segment_starts(key, log_w, n_draws):
    """Shared inverse-CDF prep: sorted f32 segment starts, starts[0] == 0.

    t_j = ceil(n·cdf_j − u0) = number of strata below cdf_j, so particle
    j covers output slots [t_{j−1}, t_j). Every systematic pick path
    (scatter fill-forward, blocked pick, Pallas expand kernel) derives
    from these starts, so they agree element-for-element.

    Monotonicity of t is a *hard* requirement (the expand kernel's window
    advance and the scatter/rank agreement both rely on sorted starts),
    but XLA lowers f32 cumsum as a parallel scan whose per-prefix rounding
    trees differ — ulp-level inversions are possible and a monotonizing
    ``lax.cummax`` costs a full O(n) pass (~0.19 ms at 1M on TPU). Instead
    the weights are quantized to int32 (relative granularity 2⁻³⁰, far
    below f32's own 2⁻²⁴ weight precision) and the CDF is an *integer*
    cumsum — exact, hence monotone by construction under any scan tree —
    followed by monotone ops only (int→f32 cast, positive-constant
    multiply, subtract, ceil are all order-preserving).

    The starts are f32, exact only for ``n_draws < 2^24`` — EVERY consumer
    (scatter fill-forward, blocked pick, expand kernel, sharded pick)
    inherits this bound. The expand-kernel wrapper raises on it; the
    in-engine paths always use n_draws == n_particles, and a 16M-particle
    single-precision SMC bank is far past f32 weight resolution anyway.
    """
    if n_draws >= 1 << 24:
        raise ValueError(
            "systematic_segment_starts carries starts in f32 — exact only "
            f"for n_draws < 2^24 (got {n_draws})"
        )
    w = jnp.exp(normalize_log_weights(log_w)[0])
    q = jnp.round(w * _CDF_QUANT).astype(jnp.int32)
    icdf = exact_int_cumsum(q)  # exact integer prefix — monotone by construction
    total = jnp.maximum(icdf[-1], 1)
    u0 = jax.random.uniform(key, ())
    scale = jnp.float32(n_draws) / total.astype(jnp.float32)
    t = jnp.ceil(icdf.astype(jnp.float32) * scale - u0)
    return jnp.maximum(
        jnp.concatenate([jnp.zeros((1,), jnp.float32), t[:-1]]), 0.0
    )


def systematic_resample_indices(key, log_w, n_draws=None):
    """Systematic resampling: indices i such that x[i] ~ Categorical(w).

    Strata u_k = (k + u0)/n with a single u0 ~ U[0,1); the inverse-CDF
    lookup is computed *scatter-side* instead of search-side (the standard
    parallel formulation, PAPERS.md arXiv:1301.4019, re-expressed for TPU):
    idx = fill-forward of j scattered at t_{j−1}, i.e. one scatter-max +
    one cummax — O(n) HBM passes. This avoids ``jnp.searchsorted``, whose
    binary search serializes ~20 full-width gathers on TPU (measured 130ms
    at n=1M vs ~15ms for this formulation).
    """
    n = log_w.shape[0]
    n_draws = n if n_draws is None else n_draws
    # Particles whose segment starts at/after n_draws cover no stratum —
    # mode="drop" discards them (an upper clip would instead let them
    # steal the final slot's max).
    starts = systematic_segment_starts(key, log_w, n_draws).astype(jnp.int32)
    particle_ids = jnp.arange(n, dtype=jnp.int32)
    z = jnp.zeros((n_draws,), jnp.int32).at[starts].max(
        particle_ids, mode="drop"
    )
    return jax.lax.cummax(z)


def multinomial_resample_indices(key, log_w, n_draws=None):
    """Multinomial (iid categorical) index draw — the reference's scheme."""
    n = log_w.shape[0]
    n_draws = n if n_draws is None else n_draws
    return jax.random.categorical(key, log_w, shape=(n_draws,)).astype(jnp.int32)


def systematic_pick_blocked(key, log_w, values, tile=1024):
    """Systematic-resampled values[idx] with NO full-width element gather.

    TPU's element gather costs ~8.4ms at 1M (1 element/cycle); this
    computes the same pick in ~half via three cheap primitives:

    1. *Compact* the covered particles (those with ≥1 stratum): covered
       particles have strictly increasing, unique segment starts, so a
       unique-index scatter builds the compacted value array and a
       ones-scatter + cumsum gives each stratum its covering particle's
       *compacted* index ``idxc`` — which increments by ≤1 per stratum.
    2. Per output tile of ``tile`` strata, the needed compacted values
       therefore span at most tile+1 entries: fetch them with one
       vmapped ``dynamic_slice`` (a block gather — ~30× fewer descriptor
       operations than an element gather).
    3. Select within the tile by a banded one-hot compare/sum (VPU).

    values: (n,) or (n, D) — columns share all index math.
    """
    n = log_w.shape[0]
    starts = systematic_segment_starts(key, log_w, n).astype(jnp.int32)
    t = jnp.concatenate([starts[1:], jnp.full((1,), n, jnp.int32)])
    covered = t > starts  # c_j > 0

    # Compaction positions. unique_indices promises uniqueness over ALL
    # positions (even dropped ones), so uncovered particles get distinct
    # out-of-bounds slots n+i rather than a shared sentinel.
    arange_n = jnp.arange(n, dtype=jnp.int32)
    cum_cov = jnp.cumsum(covered.astype(jnp.int32))
    pos = jnp.where(covered, cum_cov - 1, n + arange_n)

    # Compacted covering index per stratum: ones at covered starts
    # (unique by strict monotonicity), then cumsum − 1.
    ones_at = (
        jnp.zeros((n,), jnp.int32)
        .at[jnp.where(covered, starts, n + arange_n)]
        .set(1, mode="drop", unique_indices=True)
    )
    idxc = jnp.cumsum(ones_at) - 1  # (n,), steps of ≤1 per stratum

    n_pad = ((n + tile - 1) // tile) * tile
    if n_pad != n:
        idxc = jnp.concatenate(
            [idxc, jnp.broadcast_to(idxc[n - 1], (n_pad - n,))]
        )
    n_tiles = n_pad // tile
    idxc_tiles = idxc.reshape(n_tiles, tile)
    s_k = idxc_tiles[:, 0]  # per-tile compacted window origin
    local = idxc_tiles - s_k[:, None]  # ∈ [0, tile]
    iota = jnp.arange(tile + 8)
    onehot = local[:, :, None] == iota[None, None, :]

    values = jnp.asarray(values)
    squeeze = values.ndim == 1
    vals2d = values[:, None] if squeeze else values

    def pick_col(col):
        col_c = (
            jnp.zeros((n,), col.dtype)
            .at[pos]
            .set(col, mode="drop", unique_indices=True)
        )
        col_c = jnp.concatenate([col_c, jnp.zeros((tile + 8,), col.dtype)])
        blocks = jax.vmap(
            lambda s: jax.lax.dynamic_slice(col_c, (s,), (tile + 8,))
        )(s_k)  # (n_tiles, tile+8)
        out = jnp.sum(
            jnp.where(onehot, blocks[:, None, :], 0.0), axis=-1
        ).reshape(n_pad)
        return out[:n]

    out = jnp.stack(
        [pick_col(vals2d[:, d]) for d in range(vals2d.shape[1])], axis=1
    )
    return out[:, 0] if squeeze else out


def fast_normal(key, shape):
    """Standard-normal draw through the backend's fast counter RNG.

    The Liu–West smear draws n·d normals per resample; jax's default
    threefry2x32 computes each block by a 20-round software hash —
    measured 83.6 µs at 2^20 on the TPU vs **8.1 µs** for the XLA
    RngBitGenerator path (``impl='rbg'``, the hardware PRNG on TPU).
    The mapping threefry-key → rbg-key is deterministic, so trajectories
    are reproducible per backend; the rbg bit-stream itself is NOT
    guaranteed stable across backends/jax versions (fine for smoothing
    noise — pass ``LiuWestResampler(kernel=...)`` where cross-backend
    bit-reproducibility of the smear matters)."""
    data = jax.random.key_data(key)
    rk = jax.random.wrap_key_data(
        jnp.concatenate([data, data]).astype(jnp.uint32), impl="rbg"
    )
    return jax.random.normal(rk, shape)


class Resampler:
    """ABC. Reference: ``resamplers.py — Resampler``."""

    def __call__(self, key, model, particle_locations, particle_log_weights):
        raise NotImplementedError


@jax.tree_util.register_static
@dataclass(frozen=True, eq=False)
class LiuWestResampler(Resampler):
    """Liu–West kernel-shrinkage resampler.

    Reference: ``src/qinfer/resamplers.py — LiuWestResampler.__call__``.
    Defaults match the reference: a=0.98, h=√(1−a²), postselect=True.

    ``maxiter`` here counts *vectorized* redraw rounds (each redraws all
    still-invalid particles at once); the reference's maxiter counts scalar
    rejection sweeps. 16 rounds at full width exceeds the reference's
    effective redraw budget for any realistic acceptance rate.

    ``kernel(key, shape)`` may replace the standard-normal perturbation
    (reference's ``kernel`` argument, default ``np.random.randn``).
    """

    a: float = 0.98
    h: Optional[float] = None
    maxiter: int = 16
    zero_cov_comp: float = 0.0
    postselect: bool = True
    kernel: Optional[Callable] = None
    use_systematic: bool = True
    # Pallas expand kernel for the index-draw+pick: ~9× the XLA blocked
    # pick at 1M particles (14.4 → 1.6 ms measured, kernel v4 r5; all
    # columns share one rank pass, so multi-parameter models amortize).
    # None = auto: on for single-device TPU at n ∈ [2^17, 2^24) (the
    # one-time ~30 s Mosaic compile only pays off for big-N runs; under
    # GSPMD sharding the shard_map path has its own distributed pick).
    # True/False force it on/off.
    use_expand_kernel: Optional[bool] = None

    @property
    def _h(self):
        import math

        if self.h is not None:
            return float(self.h)
        return math.sqrt(1.0 - self.a ** 2)

    def __call__(self, key, model, particle_locations, particle_log_weights):
        locs = particle_locations
        log_w = particle_log_weights
        n, d = locs.shape

        mu, cov = weighted_moments(log_w, locs)
        cov = cov + self.zero_cov_comp * jnp.eye(d, dtype=cov.dtype)
        h = self._h
        S = sqrtm_psd((h * h) * cov)

        k_idx, k_draw = jax.random.split(key)
        if self.use_expand_kernel is None:
            use_expand = (
                jax.default_backend() == "tpu"
                and jax.device_count() == 1
                and (1 << 17) <= n < (1 << 24)
            )
        else:
            use_expand = bool(self.use_expand_kernel)
        if use_expand:
            # Pallas merge kernel: picks locs[idx] directly with no
            # gather/scatter; all D columns share one pass, and the
            # Liu–West shrinkage affine rides the kernel's output stage
            # (one fewer full pass over the picked bank).
            from .ops.resample_expand import systematic_expand

            centers = systematic_expand(
                k_idx, log_w, locs, scale=self.a, shift=(1.0 - self.a) * mu
            )
        elif self.use_systematic:
            # Blocked pick: compaction + block-slice gather + banded
            # select — ~2× the element-gather path on TPU at 1M.
            picked = systematic_pick_blocked(k_idx, log_w, locs)
            centers = self.a * picked + (1.0 - self.a) * mu[None, :]
        else:
            picked = locs[multinomial_resample_indices(k_idx, log_w)]
            centers = self.a * picked + (1.0 - self.a) * mu[None, :]

        draw_noise = self.kernel if self.kernel is not None else fast_normal

        def draw(k):
            return centers + draw_noise(k, (n, d)) @ S.T

        k0, kloop = jax.random.split(k_draw)
        new_locs = draw(k0)

        if not self.postselect:
            return new_locs

        valid0 = jnp.asarray(model.are_models_valid(new_locs))

        # Bounded redraw with data-dependent early exit: the while_loop
        # stops as soon as every particle is valid, so the common case
        # (prior well inside the valid region) costs zero extra rounds.
        def cond(carry):
            _, ok, it, _ = carry
            return (~jnp.all(ok)) & (it < self.maxiter)

        def body(carry):
            cur, ok, it, k = carry
            k_draw, k_next = jax.random.split(k)
            fresh = draw(k_draw)
            fresh_ok = jnp.asarray(model.are_models_valid(fresh))
            take = (~ok) & fresh_ok
            cur = jnp.where(take[:, None], fresh, cur)
            return cur, ok | fresh_ok, it + 1, k_next

        new_locs, ok, _, _ = jax.lax.while_loop(
            cond, body, (new_locs, valid0, jnp.zeros((), jnp.int32), kloop)
        )

        # Fallback: clamp stragglers to the valid region (reference warns
        # via ResamplerWarning and keeps them; clamping is strictly safer).
        # Lazy: canonicalize can be expensive (tomography's PSD projection
        # is a batched eigh) and the common case has no stragglers.
        return jax.lax.cond(
            jnp.all(ok),
            lambda x: x,
            lambda x: jnp.where(ok[:, None], x, model.canonicalize(x)),
            new_locs,
        )


class ClusteringResampler(Resampler):
    """Resample within DBSCAN clusters so multimodal posteriors keep
    their modes' local moment structure.

    Reference: ``resamplers.py — ClusteringResampler`` [unverified /
    possibly removed upstream]. Host-side clustering (sklearn) wrapping a
    secondary per-cluster resampler — NOT jittable. ``host_side = True``
    makes ``SMCUpdater`` run the ESS check and resampling outside the
    jitted step (episode scans cannot use it).
    """

    host_side = True

    def __init__(self, eps=0.5, min_particles=5, secondary_resampler=None,
                 weighted=False, quiet=True):
        self.eps = eps
        self.min_particles = min_particles
        self.secondary_resampler = (
            secondary_resampler
            if secondary_resampler is not None
            else LiuWestResampler()
        )
        self.weighted = weighted
        self.quiet = quiet

    def __call__(self, key, model, particle_locations, particle_log_weights):
        import numpy as np

        from .clustering import NOISE, particle_clusters
        from .utils import normalize_log_weights

        locs = np.asarray(particle_locations)
        log_w = np.asarray(
            normalize_log_weights(particle_log_weights)[0]
        )
        w = np.exp(log_w)
        new_locs = np.array(locs, copy=True)
        for i, (label, mask) in enumerate(
            particle_clusters(
                locs, w, eps=self.eps, min_particles=self.min_particles,
                weighted=self.weighted, quiet=self.quiet,
            )
        ):
            if label == NOISE:
                continue  # reference: noise particles are left untouched
            sub_w = w[mask]
            sub_log_w = jnp.log(
                jnp.asarray(sub_w / sub_w.sum(), jnp.float32)
            )
            sub_key = jax.random.fold_in(key, i)
            resampled = self.secondary_resampler(
                sub_key, model, jnp.asarray(locs[mask]), sub_log_w
            )
            new_locs[mask] = np.asarray(resampled)
        return jnp.asarray(new_locs)
