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

__all__ = ["fused_bayes_update", "precession_tile_fn"]

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

    log_l = tile_fn(scal_ref, *[r[...] for r in loc_refs])
    lw = lw_ref[...] + jnp.clip(log_l, -87.0, 0.0)
    out_lw_ref[...] = lw

    tile_m = jnp.max(lw)
    m_old = acc_ref[0]
    m_new = jnp.maximum(m_old, tile_m)
    acc_ref[1] = acc_ref[1] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(lw - m_new)
    )
    acc_ref[0] = m_new

    lw2 = 2.0 * lw
    tile_m2 = jnp.max(lw2)
    m2_old = acc_ref[2]
    m2_new = jnp.maximum(m2_old, tile_m2)
    acc_ref[3] = acc_ref[3] * jnp.exp(m2_old - m2_new) + jnp.sum(
        jnp.exp(lw2 - m2_new)
    )
    acc_ref[2] = m2_new

    @pl.when(i == num_tiles - 1)
    def _finish():
        stats_ref[0] = acc_ref[0] + jnp.log(acc_ref[1])  # lse(lw)
        stats_ref[1] = acc_ref[2] + jnp.log(acc_ref[3])  # lse(2·lw)


def fused_bayes_update(tile_fn, scalars, log_w, param_cols, tile=65536,
                       interpret=None):
    """One fused SMC update.

    ``tile_fn(scalars_ref, *param_tiles) -> (tile,) log-likelihood``;
    ``scalars``: (k,) f32 (outcome + expparams packed by the model);
    ``log_w``: (N,) normalized log-weights; ``param_cols``: tuple of (N,)
    f32 parameter columns.

    Returns (log_w_normalized, log_norm, ess): the Bayes-updated
    normalized weights, the update evidence log Pr(outcome), and the
    effective sample size — everything ``smc_update_step`` needs, in
    ~2 HBM passes.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = log_w.shape[0]
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    tile = min(tile, max(1024, ((n + 1023) // 1024) * 1024))
    # Pad to a tile multiple with −huge weights: exp(pad − m) = 0, so the
    # streaming reductions and the normalized output are unaffected.
    n_pad = ((n + tile - 1) // tile) * tile
    if n_pad != n:
        pad = n_pad - n
        log_w = jnp.concatenate([log_w, jnp.full((pad,), _NEG_BIG / 2,
                                                 jnp.float32)])
        param_cols = tuple(
            jnp.concatenate([c, jnp.zeros((pad,), jnp.float32)])
            for c in param_cols
        )
    num_tiles = n_pad // tile
    n_cols = len(param_cols)

    lw_unnorm, stats = pl.pallas_call(
        functools.partial(
            _update_kernel, tile_fn=tile_fn, n_cols=n_cols,
            num_tiles=num_tiles,
        ),
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)
            for _ in range(n_cols + 1)
        ],
        out_specs=(
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((2,), jnp.float32),
        ),
        scratch_shapes=[pltpu.SMEM((4,), jnp.float32)],
        interpret=interpret,
    )(jnp.asarray(scalars, jnp.float32), log_w, *param_cols)

    log_norm = stats[0]
    log_w_norm = lw_unnorm[:n] - log_norm
    # ESS = 1/Σ w² with w = exp(lw − lse): lse2 − 2·lse in log space.
    ess = jnp.exp(-(stats[1] - 2.0 * log_norm))
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
