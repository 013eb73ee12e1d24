"""Fused Bayes-update kernel (Pallas TPU).

One SMC update in XLA costs ~6 HBM passes (likelihood, weight add, max,
sumexp, normalize, ESS). This kernel fuses likelihood evaluation, the
multiplicative log-weight update, and *both* streaming log-sum-exp
reductions (for the evidence normalization and for ESS) into a single
pass over the particle bank: read log_w + parameter columns once, write
unnormalized log_w once, accumulate (m, Σe^{lw−m}, m₂, Σe^{2lw−m₂}) in
SMEM across the sequential grid. The cheap normalize-subtract runs as one
XLA elementwise op afterwards.

This is the general mechanism replacing the reference's single embedded
OpenCL kernel (``src/qinfer/gpu_models.py — AcceleratedPrecessionModel``):
any model whose likelihood is elementwise over particles supplies a
``tile_fn(scalars, *param_tiles) -> log-likelihood tile`` and gets the
fused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "fused_bayes_update", "precession_tile_fn", "two_outcome_tile",
    "binomial_tile", "precession_pr1", "make_multicos_pr1",
    "make_known_t2_pr1", "rb_pr1", "rb_interleaved_pr1", "make_born_pr1",
    "inversion_pr1", "coin_pr1", "noisy_coin_pr1",
]

_NEG_BIG = -3.0e38


def _update_kernel(scal_ref, lw_ref, *rest, tile_fn, n_cols, num_tiles):
    from jax.experimental import pallas as pl

    loc_refs = rest[:n_cols]
    out_lw_ref = rest[n_cols]
    stats_ref = rest[n_cols + 1]
    acc_ref = rest[n_cols + 2]

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[0] = _NEG_BIG  # m
        acc_ref[1] = 0.0  # s = Σ exp(lw − m)
        acc_ref[2] = _NEG_BIG  # m2
        acc_ref[3] = 0.0  # s2 = Σ exp(2lw − m2)

    # Lower clip ONLY — same rule as the engine's XLA path (smc.py):
    # continuous-density tiles may legitimately exceed log L = 0, and an
    # upper clip would silently corrupt their evidence. Finite-outcome
    # tiles satisfy log L ≤ 0 up to rounding either way.
    log_l = tile_fn(scal_ref, *[r[...] for r in loc_refs])
    lw = lw_ref[...] + jnp.maximum(log_l, -87.0)
    out_lw_ref[...] = lw

    # The kernel is TRANSCENDENTAL-bound (measured r5: ~68 µs at 2^20,
    # linear in N, tile-size-independent — cos/log/exp per element, not
    # HBM or per-tile overhead), so the second streaming-lse pass reuses
    # the first's exponentials: max(2·lw) = 2·max(lw) (one max reduce,
    # not two) and Σ exp(2lw − m₂) = Σ (e₁²) · exp(2m − m₂) with
    # e₁ = exp(lw − m) (one elementwise exp + one multiply, the
    # correction factor is a scalar). Squaring doubles e₁'s relative
    # rounding (~2⁻²³) — far inside the kernel-vs-XLA test tolerance.
    tile_m = jnp.max(lw)
    m_old = acc_ref[0]
    m_new = jnp.maximum(m_old, tile_m)
    e1 = jnp.exp(lw - m_new)
    acc_ref[1] = acc_ref[1] * jnp.exp(m_old - m_new) + jnp.sum(e1)
    acc_ref[0] = m_new

    m2_old = acc_ref[2]
    m2_new = jnp.maximum(m2_old, 2.0 * tile_m)
    acc_ref[3] = acc_ref[3] * jnp.exp(m2_old - m2_new) + jnp.sum(
        e1 * e1
    ) * jnp.exp(2.0 * m_new - m2_new)
    acc_ref[2] = m2_new

    @pl.when(i == num_tiles - 1)
    def _finish():
        stats_ref[0] = acc_ref[0] + jnp.log(acc_ref[1])  # lse(lw)
        stats_ref[1] = acc_ref[2] + jnp.log(acc_ref[3])  # lse(2·lw)


# Per-trial bank size above which a vmapped fused update runs the Pallas
# kernel sequentially over the batch (lax.map) instead of the vectorized
# XLA equivalent: the measured kernel-vs-XLA crossover (~0.22 ms XLA vs
# 0.024 ms kernel at 2^20; at ensemble-scale banks of ≤2^14 XLA is at
# parity and the batch axis vectorizes for free).
_VMAP_KERNEL_MIN_N = 1 << 17


def fused_bayes_update(tile_fn, scalars, log_w, param_cols, tile=None,
                       interpret=None, return_stats=False):
    """One fused SMC update.

    ``tile_fn(scalars_ref, *param_tiles) -> (tile,) log-likelihood``;
    ``scalars``: (k,) f32 (outcome + expparams packed by the model);
    ``log_w``: (N,) normalized log-weights; ``param_cols``: tuple of (N,)
    f32 parameter columns.

    Returns (log_w_normalized, log_norm, ess): the Bayes-updated
    normalized weights, the update evidence log Pr(outcome), and the
    effective sample size — everything ``smc_update_step`` needs, in
    ~2 HBM passes.

    ``return_stats=True`` instead returns (log_w_unnormalized, lse, lse2)
    with lse = logsumexp(lw) and lse2 = logsumexp(2·lw) — the raw
    streaming reductions, which are associative-merge-ready: the sharded
    step psum-merges them across shards for the global evidence/ESS
    (SURVEY §5.8; ``qinfer_tpu.parallel.sharded_smc``).

    Batching: vmapped callers (ensemble harnesses — the reference's
    ``perf_test_multiple(apply=...)`` trial fan-out) get a custom_vmap
    rule instead of a lowering error: big per-trial banks
    (N ≥ ``_VMAP_KERNEL_MIN_N``) run the kernel sequentially over the
    batch via ``lax.map`` (few big trials — kernel time dominates); small
    banks run the exact-math XLA equivalent vectorized over the batch
    (measured at parity with the kernel at those sizes).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = log_w.shape[0]
    n_cols = len(param_cols)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if tile is None:
        # Measured on-chip sweep (r5, 2^20 D=1, post exp-fold): 59.8 µs
        # at 64 K, 45.8 at 512 K, 57.0 at a single 1 M tile — mid-size
        # tiles pipeline DMA against the transcendental-bound compute
        # best. Scale down with column count so (streams + output) ×
        # double-buffering stays inside VMEM.
        tile = (3 * 524288) // (n_cols + 2)
        tile = max(65536, min(524288, (tile // 8192) * 8192))
    tile = min(tile, max(1024, ((n + 1023) // 1024) * 1024))
    # Pad to a tile multiple with −huge weights: exp(pad − m) = 0, so the
    # streaming reductions and the normalized output are unaffected.
    n_pad = ((n + tile - 1) // tile) * tile
    num_tiles = n_pad // tile

    def _impl(scalars, log_w, *param_cols):
        if n_pad != n:
            pad = n_pad - n
            log_w = jnp.concatenate(
                [log_w, jnp.full((pad,), _NEG_BIG / 2, jnp.float32)]
            )
            param_cols = tuple(
                jnp.concatenate([c, jnp.zeros((pad,), jnp.float32)])
                for c in param_cols
            )
        lw_unnorm, stats = pl.pallas_call(
            functools.partial(
                _update_kernel, tile_fn=tile_fn, n_cols=n_cols,
                num_tiles=num_tiles,
            ),
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [
                pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.VMEM)
                for _ in range(n_cols + 1)
            ],
            out_specs=(
                pl.BlockSpec((tile,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_pad,), jnp.float32),
                jax.ShapeDtypeStruct((2,), jnp.float32),
            ),
            scratch_shapes=[pltpu.SMEM((4,), jnp.float32)],
            interpret=interpret,
        )(scalars, log_w, *param_cols)
        return lw_unnorm[:n], stats[0], stats[1]

    def _xla_equiv(scalars, log_w, *param_cols):
        # Same elementwise math as the kernel tile; the streaming
        # reductions become plain max/logsumexp (reduction order differs
        # in the last f32 ulps only — same tolerance class as the
        # kernel-vs-XLA equality tests).
        log_l = tile_fn(scalars, *param_cols)
        lw = log_w + jnp.maximum(log_l, -87.0)
        m = jnp.max(lw)
        s1 = jnp.sum(jnp.exp(lw - m))
        lse = m + jnp.log(s1)
        lw2 = 2.0 * lw
        m2 = jnp.max(lw2)
        lse2 = m2 + jnp.log(jnp.sum(jnp.exp(lw2 - m2)))
        return lw, lse, lse2

    fused = jax.custom_batching.custom_vmap(_impl)

    @fused.def_vmap
    def _fused_vmap(axis_size, in_batched, *args):
        out_batched = (True, True, True)
        if n >= _VMAP_KERNEL_MIN_N:
            stacked = tuple(
                a if b else jnp.broadcast_to(a, (axis_size,) + a.shape)
                for a, b in zip(args, in_batched)
            )
            return jax.lax.map(lambda xs: _impl(*xs), stacked), out_batched
        in_axes = tuple(0 if b else None for b in in_batched)
        return jax.vmap(_xla_equiv, in_axes=in_axes)(*args), out_batched

    lw_unnorm, lse, lse2 = fused(
        jnp.asarray(scalars, jnp.float32), log_w, *param_cols
    )

    if return_stats:
        return lw_unnorm, lse, lse2
    log_norm = lse
    log_w_norm = lw_unnorm - log_norm
    # ESS = 1/Σ w² with w = exp(lw − lse): lse2 − 2·lse in log space.
    ess = jnp.exp(-(lse2 - 2.0 * log_norm))
    return log_w_norm, log_norm, ess


def precession_tile_fn(scal_ref, omega_tile):
    """SimplePrecessionModel fused-likelihood tile.

    scalars = [outcome, t]: log L = log(cos²(ωt/2)) or log(1−cos²).
    Parity: the reference's OpenCL kernel in ``gpu_models.py`` computes
    exactly this per-particle cos² likelihood.
    """
    outcome = scal_ref[0]
    t = scal_ref[1]
    c = jnp.cos(0.5 * omega_tile * t)
    pr0 = c * c
    pr = jnp.where(outcome == 0.0, pr0, 1.0 - pr0)
    return jnp.log(jnp.clip(pr, 1e-35))


# ---------------------------------------------------------------------------
# Generic tile builders: any two-outcome model supplies a pr1 function
# ``pr1_fn(scal_ref, scal_offset, *param_tiles) -> Pr(outcome 1) tile`` via
# ``FiniteOutcomeModel._fused_pr1_parts`` and gets the fused path — the
# TPU-general replacement for the reference's single hard-coded OpenCL
# kernel (``gpu_models.py``).
# ---------------------------------------------------------------------------

def two_outcome_tile(pr1_fn):
    """scalars = [outcome, *pr1_scalars]."""

    def tile_fn(scal_ref, *tiles):
        outcome = scal_ref[0]
        pr1 = pr1_fn(scal_ref, 1, *tiles)
        pr = jnp.where(outcome == 1.0, pr1, 1.0 - pr1)
        return jnp.log(jnp.clip(pr, 1e-35))

    return tile_fn


def binomial_tile(pr1_fn):
    """scalars = [k, n_meas, log C(n,k), *pr1_scalars]; the binomial
    coefficient is precomputed in XLA (gammaln does not lower in-kernel).
    k·log(clip(p)) reproduces xlogy's 0·log0 = 0 limit."""

    def tile_fn(scal_ref, *tiles):
        k = scal_ref[0]
        n = scal_ref[1]
        log_c = scal_ref[2]
        p1 = jnp.clip(pr1_fn(scal_ref, 3, *tiles), 0.0, 1.0)
        return (
            log_c
            + k * jnp.log(jnp.clip(p1, 1e-30))
            + (n - k) * jnp.log(jnp.clip(1.0 - p1, 1e-30))
        )

    return tile_fn


# -- pr1 tile functions for the built-in model zoo --------------------------

def precession_pr1(scal_ref, off, omega):
    """SimplePrecession: 1 − cos²(ωt/2); scalars tail = [t]."""
    c = jnp.cos(0.5 * omega * scal_ref[off])
    return 1.0 - c * c


def make_multicos_pr1(n_terms):
    """MultiCos: 1 − cos²(ω⃗·t⃗/2); scalars tail = ts (n_terms,)."""

    def pr1(scal_ref, off, *omegas):
        arg = omegas[0] * scal_ref[off]
        for i in range(1, n_terms):
            arg = arg + omegas[i] * scal_ref[off + i]
        c = jnp.cos(0.5 * arg)
        return 1.0 - c * c

    return pr1


def make_known_t2_pr1(t2):
    """KnownT2 precession: 1 − (e^{−t/T2}cos²(ωt/2) + (1−e^{−t/T2})/2)."""

    def pr1(scal_ref, off, omega):
        t = scal_ref[off]
        damp = jnp.exp(-t / t2)
        c = jnp.cos(0.5 * omega * t)
        return 1.0 - (damp * c * c + 0.5 * (1.0 - damp))

    return pr1


def rb_pr1(scal_ref, off, p, A, B):
    """Standard RB: 1 − (A·pᵐ + B); pᵐ via exp(m·log p) (Mosaic has no
    f32 pow); scalars tail = [m]."""
    m = scal_ref[off]
    decay = jnp.exp(m * jnp.log(jnp.clip(p, 1e-20, 1.0)))
    return 1.0 - jnp.clip(A * decay + B, 0.0, 1.0)


def rb_interleaved_pr1(scal_ref, off, pt, pr_, A, B):
    """Interleaved RB: decay = p_ref (reference seq) or p̃·p_ref; scalars
    tail = [m, reference]. Reference: ``rb.py —
    RandomizedBenchmarkingModel(interleaved=True)``."""
    m = scal_ref[off]
    ref = scal_ref[off + 1]
    p_eff = jnp.where(ref == 1.0, pr_, pt * pr_)
    decay = jnp.exp(m * jnp.log(jnp.clip(p_eff, 1e-20, 1.0)))
    return 1.0 - jnp.clip(A * decay + B, 0.0, 1.0)


def inversion_pr1(scal_ref, off, omega):
    """SimpleInversion (Ramsey): 1 − cos²((ω−ω_)t/2); tail = [w_, t]."""
    c = jnp.cos(0.5 * (omega - scal_ref[off]) * scal_ref[off + 1])
    return 1.0 - c * c


def coin_pr1(scal_ref, off, p):
    """CoinModel: Pr(1) = p; empty scalar tail."""
    del scal_ref, off
    return p


def noisy_coin_pr1(scal_ref, off, p):
    """NoisyCoin: Pr(1) = 1 − (α(1−p) + βp); tail = [α, β]."""
    return 1.0 - (scal_ref[off] * (1.0 - p) + scal_ref[off + 1] * p)


def make_born_pr1(n_cols):
    """Tomography Born rule: Pr(1) = ⟨x, e⟩; scalars tail = meas (d²,)."""

    def pr1(scal_ref, off, *xs):
        acc = xs[0] * scal_ref[off]
        for d in range(1, n_cols):
            acc = acc + xs[d] * scal_ref[off + d]
        return jnp.clip(acc, 0.0, 1.0)

    return pr1
