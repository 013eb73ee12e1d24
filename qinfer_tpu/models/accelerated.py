"""Kernel-accelerated models (TPU-native analogue of qinfer's gpu_models.py).

Reference parity: ``src/qinfer/gpu_models.py — AcceleratedPrecessionModel``
(the reference's only native code: an embedded OpenCL C kernel computing
the per-particle cos² likelihood, with a PyOpenCL host wrapper marshaling
float32 buffers).

Here the same role is played by the *general* fused-update Pallas kernel
(``ops.fused_update``): any elementwise model supplies a tile function.
``AcceleratedPrecessionModel`` is the concrete counterpart — identical
semantics to ``SimplePrecessionModel`` plus a ``fused_update`` method the
SMC engine can call to run likelihood + weight update + both logsumexp
reductions in a single pass over the particle bank.

Note: on the current axon TPU stack the fused path measures slightly
slower than XLA's own fusion (see ops/fused_update.py), so the engine does
not route through it by default; the mechanism is exercised by tests and
kept as the §2.16 parity surface.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ops.fused_update import fused_bayes_update, precession_tile_fn
from .base import expparams_field
from .test_models import SimplePrecessionModel

__all__ = ["AcceleratedPrecessionModel"]


@jax.tree_util.register_static
@dataclass(frozen=True, eq=False)
class AcceleratedPrecessionModel(SimplePrecessionModel):
    """SimplePrecessionModel with a fused Pallas update path.

    Reference: ``gpu_models.py — AcceleratedPrecessionModel``.
    """

    def fused_update(self, outcome, log_w, modelparams, expparams,
                     interpret=None):
        """(log_w', log_norm, ess) in one fused pass. E must be 1."""
        t = jnp.asarray(
            expparams_field(expparams, "t"), jnp.float32
        ).reshape(-1)[0]
        scalars = jnp.stack(
            [jnp.asarray(outcome, jnp.float32).reshape(()), t]
        )
        omega = modelparams[:, 0]
        return fused_bayes_update(
            precession_tile_fn, scalars, log_w, (omega,),
            interpret=interpret,
        )
