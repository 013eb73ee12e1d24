"""Model-contract property tests.

Reference pattern: ``tests/test_concrete_models.py — ConcreteModelTest``
(one abstract harness instantiated per model class): shape contracts
(likelihood returns (O, N, E)), outcome normalization Σ_o L = 1, validity
of prior samples, simulator output domain membership.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qinfer_tpu as qi

N_PARTICLES = 64


def _cases():
    """(model, prior, expparams) triples for every concrete model."""
    return [
        (
            qi.SimplePrecessionModel(),
            qi.UniformDistribution([0.0, 1.0]),
            {"t": jnp.array([1.0, 2.5, 10.0], jnp.float32)},
        ),
        (
            qi.SimpleInversionModel(),
            qi.UniformDistribution([0.0, 1.0]),
            {
                "w_": jnp.array([0.1, 0.2], jnp.float32),
                "t": jnp.array([1.0, 7.0], jnp.float32),
            },
        ),
        (
            qi.CoinModel(),
            qi.UniformDistribution([0.0, 1.0]),
            {"dummy": jnp.array([0.0], jnp.float32)},
        ),
        (
            qi.NoisyCoinModel(),
            qi.UniformDistribution([0.0, 1.0]),
            {
                "alpha": jnp.array([0.9, 0.8], jnp.float32),
                "beta": jnp.array([0.05, 0.1], jnp.float32),
            },
        ),
        (
            qi.NDieModel(n=4),
            qi.MVUniformDistribution(dim=4),
            {"exp_num": jnp.array([0], jnp.int32)},
        ),
        (
            qi.MultiCosModel(n_terms=2),
            qi.UniformDistribution([[0.0, 1.0], [0.0, 1.0]]),
            {"ts": jnp.array([[1.0, 2.0], [3.0, 0.5]], jnp.float32)},
        ),
        (
            qi.KnownT2PrecessionModel(t2=50.0),
            qi.UniformDistribution([0.0, 1.0]),
            {"t": jnp.array([1.0, 30.0], jnp.float32)},
        ),
    ]


@pytest.mark.parametrize("model,prior,expparams", _cases(),
                         ids=lambda c: type(c).__name__)
def test_model_contract(model, prior, expparams, key):
    k1, k2 = jax.random.split(key)
    params = prior.sample(k1, N_PARTICLES)
    assert params.shape == (N_PARTICLES, model.n_modelparams)
    assert len(model.modelparam_names) == model.n_modelparams

    # Prior samples are valid.
    valid = np.asarray(model.are_models_valid(params))
    assert valid.shape == (N_PARTICLES,)
    assert valid.all(), f"{type(model).__name__}: prior samples invalid"

    n_out = model.n_outcomes(expparams)
    outcomes = model.all_outcomes(expparams)
    n_exp = jax.tree_util.tree_leaves(expparams)[0].shape[0]

    # Likelihood shape and outcome normalization.
    L = np.asarray(model.likelihood(outcomes, params, expparams))
    assert L.shape == (n_out, N_PARTICLES, n_exp)
    assert (L >= -1e-6).all() and (L <= 1 + 1e-6).all()
    np.testing.assert_allclose(L.sum(axis=0), 1.0, atol=1e-3)

    # log_likelihood consistency.
    logL = np.asarray(model.log_likelihood(outcomes, params, expparams))
    np.testing.assert_allclose(np.exp(logL), L, atol=1e-4)

    # Simulator outputs valid domain members with correct shape.
    sims = np.asarray(
        model.simulate_experiment(k2, params, expparams, repeat=3)
    )
    assert sims.shape == (3, N_PARTICLES, n_exp)
    assert sims.min() >= 0 and sims.max() < n_out

    # canonicalize fixes invalid params.
    rng = np.random.default_rng(3)
    noise = params + jnp.asarray(
        rng.standard_normal(params.shape).astype(np.float32) * 10
    )
    fixed = model.canonicalize(noise)
    assert np.asarray(model.are_models_valid(fixed)).all()


def test_simulator_statistics(key):
    """Simulated outcome frequencies match the likelihood (binomial CI)."""
    model = qi.SimplePrecessionModel()
    params = jnp.array([[0.5]])
    ep = {"t": jnp.array([2.0], jnp.float32)}
    p0 = float(model.pr0(params, ep)[0, 0])
    sims = np.asarray(
        model.simulate_experiment(key, params, ep, repeat=20_000)
    )
    freq0 = (sims == 0).mean()
    assert abs(freq0 - p0) < 4 * np.sqrt(p0 * (1 - p0) / 20_000) + 1e-3


def test_update_timestep_identity():
    model = qi.SimplePrecessionModel()
    params = jnp.array([[0.5], [0.7]])
    ep = {"t": jnp.array([1.0, 2.0], jnp.float32)}
    out = np.asarray(model.update_timestep(params, ep))
    assert out.shape == (2, 1, 2)
    np.testing.assert_array_equal(out[:, :, 0], np.asarray(params))


def test_differentiable_score(key):
    """DifferentiableModel.score matches finite differences."""

    @jax.tree_util.register_static
    class DiffPrecession(qi.DifferentiableModel, qi.SimplePrecessionModel):
        pass

    model = DiffPrecession()
    params = jnp.array([[0.5], [0.9]])
    ep = {"t": jnp.array([2.0], jnp.float32)}
    outcomes = jnp.array([0, 1])
    sc = np.asarray(model.score(outcomes, params, ep))
    assert sc.shape == (1, 2, 2, 1)
    eps = 1e-3
    lp = lambda p: np.log(
        np.asarray(model.likelihood(outcomes, jnp.asarray(p), ep))
    )
    fd = (lp(params + eps) - lp(params - eps)) / (2 * eps)
    np.testing.assert_allclose(sc[0], fd, atol=1e-2)

    fisher = np.asarray(model.fisher_information(params, ep))
    assert fisher.shape == (1, 1, 2, 1)
    assert (fisher >= 0).all()
