"""Reference-compat (NumPy record-array expparams) and 2-qubit tomography."""

import jax
import jax.numpy as jnp
import numpy as np

import qinfer_tpu as qi
from qinfer_tpu.tomography import (
    GinibreDistribution,
    TomographyModel,
    pauli_basis,
)


def test_record_array_expparams_compat():
    """qinfer-style NumPy record arrays work at every API entry point."""
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 500, prior, seed=0)

    ep1 = np.array([(2.5,)], dtype=[("t", float)])
    u.update(jnp.int32(0), ep1)

    eps = np.array([(1.0,), (2.0,), (3.0,)], dtype=[("t", float)])
    u.batch_update(jnp.array([0, 1, 0]), eps)
    assert len(u.normalization_record) == 4

    risk = u.bayes_risk(eps)
    ig = u.expected_information_gain(eps)
    assert risk.shape == (3,) and ig.shape == (3,)
    w = u.hypothetical_update(jnp.array([0, 1]), eps)
    assert w.shape == (2, 3, 500)

    # Matches the dict-pytree form exactly.
    u2 = qi.SMCUpdater(model, 500, prior, seed=0)
    u2.update(jnp.int32(0), {"t": jnp.array([2.5], jnp.float32)})
    u2.batch_update(jnp.array([0, 1, 0]),
                    {"t": jnp.array([1.0, 2.0, 3.0], jnp.float32)})
    np.testing.assert_allclose(
        np.asarray(u.est_mean()), np.asarray(u2.est_mean()), atol=1e-6
    )


def test_two_qubit_tomography(key):
    """d=4, 16-parameter tomography end-to-end (Bell-ish state)."""
    basis = pauli_basis(2)
    model = TomographyModel(basis)
    prior = GinibreDistribution(basis)

    # True state: 0.9·|Φ+⟩⟨Φ+| + 0.1·I/4.
    phi = np.zeros((4, 1), dtype=np.complex64)
    phi[0, 0] = phi[3, 0] = 1 / np.sqrt(2)
    rho = 0.9 * (phi @ phi.conj().T) + 0.1 * np.eye(4) / 4
    true_x = np.asarray(
        basis.state_to_modelparams(rho.astype(np.complex64)[None])
    )[0]
    assert bool(np.asarray(model.are_models_valid(true_x[None]))[0])

    # 50-shot settings via the Binomial combinator (composition with the
    # tomography model) — 16-dim single-shot SMC would need thousands of
    # experiments.
    binom = qi.BinomialModel(model)
    u = qi.SMCUpdater(binom, 10000, prior, seed=0)
    rng = np.random.default_rng(0)
    from qinfer_tpu.tomography import HaarUniform

    n_settings, n_shots = 120, 50
    record = []
    pure = HaarUniform(2)
    for rep in range(n_settings):
        # Random product projector |a⟩⟨a| ⊗ |b⟩⟨b|.
        sa = pure._sample_states(jax.random.fold_in(key, 2 * rep), 1)[0]
        sb = pure._sample_states(jax.random.fold_in(key, 2 * rep + 1), 1)[0]
        P = np.kron(sa, sb).astype(np.complex64)
        e = np.asarray(basis.state_to_modelparams(P[None]))[0]
        pr1 = float(np.clip(true_x @ e, 0, 1))
        k1 = rng.binomial(n_shots, pr1)
        record.append((e, int(k1)))
        u.update(jnp.int32(k1),
                 {"meas": jnp.asarray(e, jnp.float32)[None, :],
                  "n_meas": jnp.array([float(n_shots)], jnp.float32)})

    est_x = np.asarray(u.est_mean())
    err = np.linalg.norm(est_x - true_x)
    # Estimate is a physical 2-qubit state.
    assert bool(np.asarray(model.are_models_valid(est_x[None]))[0])
    # Fidelity proxy improves decisively over the maximally mixed baseline
    # (0.21); Liu-West is known to struggle in 16 dims — the parity gate
    # below (vs the f64 reference-semantics oracle) is the real contract.
    est_rho = basis.modelparams_to_state(est_x)
    overlap = float(np.real(np.trace(est_rho @ rho)))
    assert overlap > 0.45

    # Parity: float64 oracle (reference semantics) on the identical record.
    from oracle import OracleModel, OracleSMC
    from scipy.stats import binom as _binom

    class _OracleBinomTomo(OracleModel):
        def __init__(self):
            self.effect = None
            self.k1 = None

        def likelihood(self, outcome, params, exp):
            e, n_shots = exp
            pr1 = np.clip(params @ e, 0.0, 1.0)
            return _binom.pmf(outcome, n_shots, pr1)

        def are_valid(self, params):
            return np.ones(params.shape[0], bool)

    prior_draws = np.asarray(
        prior.sample(jax.random.PRNGKey(77), 10000)
    ).astype(np.float64)
    oracle = OracleSMC(_OracleBinomTomo(), 10000,
                       lambda n: prior_draws[:n],
                       np.random.default_rng(78))
    for e, k1 in record:
        oracle.update(k1, (e.astype(np.float64), n_shots))
    oracle_err = np.linalg.norm(oracle.est_mean() - true_x)
    # Engine error within 1.5x of the reference-semantics error (both
    # algorithms share the Liu-West high-dim limitation).
    assert err < 1.5 * oracle_err + 0.05, (err, oracle_err)
