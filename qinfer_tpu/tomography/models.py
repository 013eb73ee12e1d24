"""Tomography models (TPU-native analogue of qinfer's tomography/models.py).

Reference parity: ``src/qinfer/tomography/models.py`` — ``TomographyModel``
(Born rule Pr(+|ρ,E) = Tr(ρE) = ⟨x, e⟩ in an orthonormal basis),
``DiffusiveTomographyModel``.

The likelihood is a (N, d²) × (d², E) matvec — pure MXU work. Positivity
checks are batched ``eigvalsh`` over (N, d, d) with d ≤ ~8 (SURVEY §7
hard part (f)).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..models.base import FiniteOutcomeModel, expparams_field
from .bases import TomographyBasis

__all__ = ["TomographyModel", "DiffusiveTomographyModel"]


@jax.tree_util.register_static
@dataclass(frozen=True, eq=False)
class TomographyModel(FiniteOutcomeModel):
    """Two-outcome state tomography.

    Reference: ``tomography/models.py — TomographyModel``. Model
    parameters are the coordinates of ρ in ``basis`` (x₀ = 1/√d enforces
    unit trace); expparams field 'meas' holds the coordinates of the
    measurement effect E (shape (E, d²)); Pr(outcome 1) = Tr(ρE) = x·e.
    """

    basis: TomographyBasis = None
    allow_subnormalized: bool = False
    psd_tol: float = 1e-5

    @property
    def dim(self):
        return self.basis.dim

    @property
    def n_modelparams(self):
        return self.basis.n_elements

    @property
    def modelparam_names(self):
        return self.basis.labels

    @property
    def expparams_dtype(self):
        return [("meas", "float", self.n_modelparams)]

    def pr0(self, modelparams, expparams):
        meas = jnp.asarray(
            expparams_field(expparams, "meas"), jnp.float32
        ).reshape(-1, self.n_modelparams)  # (E, d²)
        pr1 = modelparams @ meas.T  # Born rule matvec (MXU)
        return jnp.clip(1.0 - pr1, 0.0, 1.0)

    def are_models_valid(self, modelparams):
        """ρ ⪰ 0 (eigvals ≥ −tol) and Tr ρ = 1 (x₀ = 1/√d).

        Reference: ``TomographyModel.are_models_valid``. Runs on the real
        embedding [[re, −im], [im, re]] — same spectrum as ρ with doubled
        multiplicity — because the TPU backend has no complex dtype.
        """
        M = self.basis.real_embedding(modelparams)
        evals = jnp.linalg.eigvalsh(M)
        psd = jnp.all(evals >= -self.psd_tol, axis=-1)
        trace_target = 1.0 / jnp.sqrt(jnp.float32(self.dim))
        if self.allow_subnormalized:
            tr_ok = modelparams[:, 0] <= trace_target + 1e-5
        else:
            tr_ok = jnp.abs(modelparams[:, 0] - trace_target) < 1e-4
        return psd & tr_ok

    def canonicalize(self, modelparams):
        """Project onto the PSD, unit-trace cone: clip negative eigenvalues
        and renormalize (spectral function on the real embedding — which
        commutes with the embedding, so this equals the complex
        projection).

        Reference: ``TomographyModel.canonicalize``.
        """
        M = self.basis.real_embedding(modelparams)
        evals, evecs = jnp.linalg.eigh(M)
        # Floor at psd_tol (not 0): the f32 reconstruct→re-diagonalize
        # roundtrip perturbs eigenvalues by ~1e-6, which would push
        # exactly-zero eigenvalues back below −psd_tol.
        evals = jnp.clip(evals, self.psd_tol)
        # Trace of the embedding is 2·Tr(ρ) → normalize eigensum to 2.
        evals = 2.0 * evals / jnp.clip(
            jnp.sum(evals, axis=-1, keepdims=True), 1e-12
        )
        M_fixed = jnp.einsum(
            "...ab,...b,...cb->...ac", evecs, evals, evecs
        )
        return self.basis.coords_from_embedding(M_fixed)

    # Convenience mirrors of the reference helpers.
    def trace(self, modelparams):
        return modelparams[:, 0] * jnp.sqrt(jnp.float32(self.dim))

    @property
    def Q(self):
        return jnp.ones((self.n_modelparams,), jnp.float32)


@jax.tree_util.register_static
@dataclass(frozen=True, eq=False)
class DiffusiveTomographyModel(TomographyModel):
    """Tomography of a state diffusing between experiments.

    Reference: ``tomography/models.py — DiffusiveTomographyModel``. Adds a
    diffusion-rate parameter ε as the last model parameter; after each
    experiment the non-identity coordinates random-walk with std ε and the
    state is re-projected onto the physical cone.
    """

    @property
    def n_modelparams(self):
        return self.basis.n_elements + 1

    @property
    def modelparam_names(self):
        return tuple(self.basis.labels) + ("eps",)

    @property
    def expparams_dtype(self):
        return [("meas", "float", self.basis.n_elements), ("t", "float")]

    def _split(self, modelparams):
        return modelparams[:, :-1], modelparams[:, -1]

    def pr0(self, modelparams, expparams):
        coords, _ = self._split(modelparams)
        meas = jnp.asarray(
            expparams_field(expparams, "meas"), jnp.float32
        ).reshape(-1, self.basis.n_elements)
        pr1 = coords @ meas.T
        return jnp.clip(1.0 - pr1, 0.0, 1.0)

    def are_models_valid(self, modelparams):
        coords, eps = self._split(modelparams)
        return TomographyModel.are_models_valid(self, coords) & (eps >= 0)

    def canonicalize(self, modelparams):
        coords, eps = self._split(modelparams)
        fixed = TomographyModel.canonicalize(self, coords)
        return jnp.concatenate([fixed, jnp.clip(eps, 0.0)[:, None]], axis=1)

    def update_timestep(self, modelparams, expparams, key=None):
        if key is None:
            key = jax.random.PRNGKey(0)
        coords, eps = self._split(modelparams)
        n, d2 = coords.shape
        t = jnp.asarray(
            expparams_field(expparams, "t"), jnp.float32
        ).reshape(-1)
        n_exp = t.shape[0]
        noise = jax.random.normal(key, (n, d2 - 1, n_exp))
        scale = eps[:, None, None] * jnp.sqrt(t)[None, None, :]
        walked = coords[:, 1:, None] + scale * noise
        first = jnp.broadcast_to(coords[:, :1, None], (n, 1, n_exp))
        new_coords = jnp.concatenate([first, walked], axis=1)  # (N, d², E)
        # Re-project each evolved state onto the physical cone.
        flat = jnp.moveaxis(new_coords, 2, 1).reshape(n * n_exp, d2)
        fixed = TomographyModel.canonicalize(self, flat)
        fixed = jnp.moveaxis(fixed.reshape(n, n_exp, d2), 1, 2)
        eps_keep = jnp.broadcast_to(eps[:, None, None], (n, 1, n_exp))
        return jnp.concatenate([fixed, eps_keep], axis=1)
