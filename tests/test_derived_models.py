"""Combinator and RB model tests.

Reference pattern: qinfer's concrete-model tests over derived_models.py
and rb.py, plus end-to-end inference recovery checks (generate data from
known params → infer → assert recovery, SURVEY §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

import qinfer_tpu as qi


def test_binomial_model_likelihood_matches_scipy(key):
    model = qi.BinomialModel(qi.SimplePrecessionModel())
    params = jnp.array([[0.5], [0.8]])
    ep = {"t": jnp.array([2.0], jnp.float32),
          "n_meas": jnp.array([20.0], jnp.float32)}
    outcomes = jnp.arange(21)
    L = np.asarray(model.likelihood(outcomes, params, ep))
    assert L.shape == (21, 2, 1)
    p1 = 1 - np.cos(0.5 * np.asarray(params)[:, 0] * 2.0) ** 2
    for i in range(2):
        ref = scipy.stats.binom.pmf(np.arange(21), 20, p1[i])
        np.testing.assert_allclose(L[:, i, 0], ref, atol=1e-5)
    np.testing.assert_allclose(L.sum(0), 1.0, atol=1e-4)


def test_binomial_model_inference_recovers(key):
    """BASELINE config 2: binomial-wrapped precession estimation."""
    model = qi.BinomialModel(qi.SimplePrecessionModel())
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 4000, prior, seed=0)
    true = jnp.array([[0.37]])
    rng = np.random.default_rng(0)
    for k in range(20):
        t = (9 / 8) ** k
        p1 = 1 - np.cos(0.5 * 0.37 * t) ** 2
        counts = rng.binomial(25, p1)
        u.update(
            jnp.int32(counts),
            {"t": jnp.array([t], jnp.float32),
             "n_meas": jnp.array([25.0], jnp.float32)},
        )
    est = float(u.est_mean()[0])
    std = float(jnp.sqrt(u.est_covariance_mtx()[0, 0]))
    assert abs(est - 0.37) < 6 * std + 1e-3
    assert std < 0.02


def test_binomial_simulate(key):
    model = qi.BinomialModel(qi.CoinModel())
    params = jnp.array([[0.25]])
    ep = {"dummy": jnp.array([0.0], jnp.float32),
          "n_meas": jnp.array([100.0], jnp.float32)}
    sims = np.asarray(
        model.simulate_experiment(key, params, ep, repeat=2000)
    )
    assert sims.shape == (2000, 1, 1)
    np.testing.assert_allclose(sims.mean(), 25.0, atol=1.5)


def test_multinomial_model(key):
    die = qi.NDieModel(n=3)
    model = qi.MultinomialModel(die)
    params = jnp.array([[0.5, 0.3, 0.2]])
    ep = {"exp_num": jnp.array([0], jnp.int32),
          "n_meas": jnp.array([10], jnp.int32)}
    outcomes = model.all_outcomes(ep)
    L = np.asarray(model.likelihood(outcomes, params, ep))
    np.testing.assert_allclose(L.sum(0), 1.0, atol=1e-3)
    ref = scipy.stats.multinomial.pmf(
        np.asarray(outcomes), 10, [0.5, 0.3, 0.2]
    )
    np.testing.assert_allclose(L[:, 0, 0], ref, atol=1e-4)
    sims = np.asarray(model.simulate_experiment(key, params, ep, repeat=500))
    assert sims.shape == (500, 1, 1, 3)
    assert (sims.sum(-1) == 10).all()
    np.testing.assert_allclose(
        sims.reshape(500, 3).mean(0) / 10, [0.5, 0.3, 0.2], atol=0.05
    )


def test_poisoned_model_ale_noise():
    model = qi.PoisonedModel(qi.CoinModel(), tol=0.05)
    params = jnp.array([[0.4], [0.6]])
    ep = {"dummy": jnp.array([0.0], jnp.float32)}
    clean = np.asarray(qi.CoinModel().likelihood(jnp.array([0, 1]), params, ep))
    pois = np.asarray(model.likelihood(jnp.array([0, 1]), params, ep))
    assert pois.shape == clean.shape
    assert not np.allclose(pois, clean)  # noise applied
    assert np.abs(pois - clean).max() < 0.5  # bounded
    # Deterministic per expparams (purity).
    pois2 = np.asarray(model.likelihood(jnp.array([0, 1]), params, ep))
    np.testing.assert_array_equal(pois, pois2)


def test_mle_model_sharpens_posterior():
    base = qi.CoinModel()
    mle = qi.MLEModel(base, likelihood_power=4.0)
    prior = qi.UniformDistribution([0.0, 1.0])
    ep = {"dummy": jnp.array([0.0], jnp.float32)}
    flips = [1, 1, 0, 1, 1]
    u1 = qi.SMCUpdater(base, 4000, prior, seed=1)
    u2 = qi.SMCUpdater(mle, 4000, prior, seed=1)
    for f in flips:
        u1.update(jnp.int32(f), ep)
        u2.update(jnp.int32(f), ep)
    assert float(u2.est_covariance_mtx()[0, 0]) < float(
        u1.est_covariance_mtx()[0, 0]
    )


def test_random_walk_model(key):
    walk = qi.RandomWalkModel(
        qi.SimplePrecessionModel(),
        step_distribution=qi.NormalDistribution(0.0, 0.01),
    )
    params = jnp.array([[0.5], [0.7]])
    ep = {"t": jnp.array([1.0, 2.0], jnp.float32)}
    stepped = np.asarray(walk.update_timestep(params, ep, key=key))
    assert stepped.shape == (2, 1, 2)
    assert not np.allclose(stepped[:, :, 0], np.asarray(params))
    np.testing.assert_allclose(
        stepped[:, 0, :].mean(), np.asarray(params).mean(), atol=0.2
    )


def test_gaussian_random_walk_model(key):
    g = qi.GaussianRandomWalkModel(qi.SimplePrecessionModel(), diagonal=True)
    assert g.n_modelparams == 2
    assert g.modelparam_names == ("omega", "sigma_omega")
    params = jnp.array([[0.5, 0.1], [0.7, 0.0]])
    assert np.asarray(g.are_models_valid(params)).all()
    ep = {"t": jnp.array([1.0], jnp.float32)}
    L = np.asarray(g.likelihood(jnp.array([0, 1]), params, ep))
    np.testing.assert_allclose(L.sum(0), 1.0, atol=1e-4)
    stepped = np.asarray(g.update_timestep(params, ep, key=key))
    assert stepped.shape == (2, 2, 1)
    # sigma=0 row does not move; sigma stays fixed for both.
    np.testing.assert_allclose(stepped[1, 0, 0], 0.7, atol=1e-6)
    np.testing.assert_allclose(stepped[:, 1, 0], [0.1, 0.0], atol=1e-7)


def test_referenced_poisson_model(key):
    m = qi.ReferencedPoissonModel(qi.CoinModel())
    assert m.n_modelparams == 3
    params = jnp.array([[0.5, 100.0, 10.0]])  # p, alpha (bright), beta (dark)
    ep_sig = {"dummy": jnp.array([0.0], jnp.float32),
              "mode": jnp.array([0], jnp.int32)}
    ep_bright = {"dummy": jnp.array([0.0], jnp.float32),
                 "mode": jnp.array([1], jnp.int32)}
    sims = np.asarray(
        m.simulate_experiment(key, params, ep_bright, repeat=2000)
    )
    np.testing.assert_allclose(sims.mean(), 100.0, atol=2.0)
    L = np.asarray(m.likelihood(jnp.array([55]), params, ep_sig))
    ref = scipy.stats.poisson.pmf(55, 0.5 * 100 + 0.5 * 10)
    np.testing.assert_allclose(L[0, 0, 0], ref, rtol=1e-3)


def test_rb_model_contract_and_recovery(key):
    model = qi.RandomizedBenchmarkingModel()
    true_p, true_A, true_B = 0.95, 0.45, 0.5
    params = jnp.array([[true_p, true_A, true_B]])
    ms = np.array([1, 2, 4, 8, 16, 32, 64, 128])
    ep = {"m": jnp.asarray(ms, jnp.float32)}
    pr0 = np.asarray(model.pr0(params, ep))[0]
    np.testing.assert_allclose(pr0, true_A * true_p ** ms + true_B, atol=1e-5)

    # End-to-end: BASELINE config 3 — infer (p, A, B) from survival counts.
    binom = qi.BinomialModel(model)
    prior = qi.PostselectedDistribution(
        qi.UniformDistribution([[0.8, 1.0], [0.3, 0.6], [0.3, 0.6]]), model
    )
    u = qi.SMCUpdater(binom, 8000, prior, seed=0)
    rng = np.random.default_rng(7)
    n_shots = 200
    for m_len in ms:
        surv = true_A * true_p ** m_len + true_B
        k1 = rng.binomial(n_shots, 1 - surv)  # outcome-1 counts
        u.update(
            jnp.int32(k1),
            {"m": jnp.array([float(m_len)], jnp.float32),
             "n_meas": jnp.array([float(n_shots)], jnp.float32)},
        )
    est = np.asarray(u.est_mean())
    std = np.sqrt(np.diag(np.asarray(u.est_covariance_mtx())))
    assert abs(est[0] - true_p) < 6 * std[0] + 5e-3, (est, std)


def test_rb_interleaved():
    model = qi.RandomizedBenchmarkingModel(interleaved=True)
    assert model.n_modelparams == 4
    params = jnp.array([[0.9, 0.95, 0.4, 0.5]])
    ep = {"m": jnp.array([10.0, 10.0], jnp.float32),
          "reference": jnp.array([1, 0], jnp.int32)}
    pr0 = np.asarray(model.pr0(params, ep))[0]
    np.testing.assert_allclose(pr0[0], 0.4 * 0.95 ** 10 + 0.5, atol=1e-5)
    np.testing.assert_allclose(pr0[1], 0.4 * (0.9 * 0.95) ** 10 + 0.5, atol=1e-5)


def test_rb_fidelity_conversions():
    assert abs(qi.rb.p(1.0, d=2) - 1.0) < 1e-12
    F = 0.99
    assert abs(qi.rb.F(qi.rb.p(F, 2), 2) - F) < 1e-12


def test_ale_approximate_model(key):
    sim = qi.CoinModel()
    ale = qi.ALEApproximateModel(
        simulator=sim, error_tol=0.02, max_samp=4096
    )
    params = jnp.array([[0.3], [0.7]])
    ep = {"dummy": jnp.array([0.0], jnp.float32)}
    L = np.asarray(ale.likelihood(jnp.array([0, 1]), params, ep))
    assert L.shape == (2, 2, 1)
    exact = np.asarray(sim.likelihood(jnp.array([0, 1]), params, ep))
    np.testing.assert_allclose(L, exact, atol=0.06)
    np.testing.assert_allclose(L.sum(0), 1.0, atol=0.05)


def test_model_chain():
    base = qi.SimplePrecessionModel()
    binom = qi.BinomialModel(base)
    assert binom.base_model is base
    assert binom.underlying_model is base
    assert base in binom.model_chain


def test_binomial_model_experiment_design():
    """bayes_risk/EIG work for data-dependent outcome counts (the outcome
    enumeration happens host-side, regression for jit tracer leak)."""
    model = qi.BinomialModel(qi.SimplePrecessionModel())
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 300, prior, seed=0)
    eps = {"t": jnp.array([1.0, 5.0], jnp.float32),
           "n_meas": jnp.array([10.0, 10.0], jnp.float32)}
    risk = np.asarray(u.bayes_risk(eps))
    ig = np.asarray(u.expected_information_gain(eps))
    assert risk.shape == (2,) and np.isfinite(risk).all() and (risk > 0).all()
    assert ig.shape == (2,) and np.isfinite(ig).all() and (ig >= 0).all()
    # Longer evolution at t=5 distinguishes frequencies better from a
    # uniform prior start: more informative, lower risk.
    assert ig[1] > ig[0]
