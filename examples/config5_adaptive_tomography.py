"""BASELINE config 5: qubit state tomography over Pauli bases with
adaptive EIG-driven measurement choice (+ PGH-style posterior sampling)."""

import jax
import jax.numpy as jnp
import numpy as np

import qinfer_tpu as qi
from qinfer_tpu.tomography import (
    GinibreDistribution,
    TomographyModel,
    pauli_basis,
)


def main(seed=0, n_exp=80):
    basis = pauli_basis(1)
    model = TomographyModel(basis)
    prior = GinibreDistribution(basis)
    u = qi.SMCUpdater(model, 4000, prior, seed=seed)

    # True state: slightly mixed |+⟩.
    true_rho = np.array([[0.5, 0.45], [0.45, 0.5]], dtype=np.complex64)
    true_x = np.asarray(basis.state_to_modelparams(true_rho[None]))[0]

    # Candidate effects: projectors onto X/Y/Z eigenstates.
    projs = [
        np.array([[0.5, 0.5], [0.5, 0.5]]),
        np.array([[0.5, -0.5j], [0.5j, 0.5]]),
        np.array([[1, 0], [0, 0]]),
    ]
    effects = [
        np.asarray(
            basis.state_to_modelparams(P.astype(np.complex64)[None])
        )[0]
        for P in projs
    ]
    cand = {"meas": jnp.asarray(np.stack(effects))}

    rng = np.random.default_rng(seed)
    for _ in range(n_exp):
        ig = np.asarray(u.expected_information_gain(cand))
        e = effects[int(np.argmax(ig))]
        pr1 = float(np.clip(true_x @ e, 0, 1))
        outcome = 1 if rng.random() < pr1 else 0
        u.update(jnp.int32(outcome), {"meas": jnp.asarray(e)[None, :]})

    est_x = np.asarray(u.est_mean())
    err = np.linalg.norm(est_x - true_x)
    print(f"coordinate error ‖x̂ − x‖ = {err:.4f}, "
          f"resamples = {u.resample_count}")
    est_rho = basis.modelparams_to_state(est_x)
    fid_proxy = float(np.real(np.trace(est_rho @ true_rho)))
    print(f"Tr(ρ̂ ρ) = {fid_proxy:.4f}")
    assert bool(np.asarray(model.are_models_valid(est_x[None]))[0])
    return u


if __name__ == "__main__":
    main()
