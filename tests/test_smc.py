"""SMC statistical-correctness tests.

Reference pattern: ``tests/test_smc.py`` — run SMC on conjugate problems
and assert posterior moments within Monte-Carlo tolerance of the analytic
posterior; this is the accuracy gate of the BASELINE metric. Plus an
oracle comparison against the float64 NumPy reference-semantics
implementation (tests/oracle.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qinfer_tpu as qi
from oracle import OraclePrecession, OracleSMC


def test_coin_beta_conjugate(key):
    """Coin flips with uniform prior → Beta(1+h, 1+t) posterior."""
    model = qi.CoinModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 8000, prior, seed=7)

    flips = [1, 1, 0, 1, 0, 1, 1, 1, 0, 1, 1, 0, 1, 1, 1]
    ep = {"dummy": jnp.array([0.0], jnp.float32)}
    for f in flips:
        u.update(jnp.int32(f), ep)

    heads = sum(flips)
    tails = len(flips) - heads
    a, b = 1 + heads, 1 + tails
    post_mean = a / (a + b)
    post_var = a * b / ((a + b) ** 2 * (a + b + 1))

    est = float(u.est_mean()[0])
    var = float(u.est_covariance_mtx()[0, 0])
    # Monte-Carlo tolerance: a few sigma of the SMC estimator's own error.
    assert abs(est - post_mean) < 5 * np.sqrt(post_var / u.n_ess)
    np.testing.assert_allclose(var, post_var, rtol=0.2)


def test_gaussian_conjugate(key):
    """Known-variance Gaussian likelihood with Gaussian prior."""
    sigma2 = 0.25

    @jax.tree_util.register_static
    class GaussianMeanModel(qi.Model):
        @property
        def n_modelparams(self):
            return 1

        def n_outcomes(self, expparams=None):
            return 1  # continuous outcome supplied externally

        def are_models_valid(self, modelparams):
            return jnp.ones(modelparams.shape[0], bool)

        def log_likelihood(self, outcomes, modelparams, expparams):
            x = jnp.asarray(outcomes, jnp.float32).reshape(-1)
            mu = modelparams[:, 0]
            n_exp = jnp.asarray(expparams["dummy"]).reshape(-1).shape[0]
            ll = -0.5 * (x[:, None] - mu[None, :]) ** 2 / sigma2
            return jnp.broadcast_to(ll[:, :, None], ll.shape + (n_exp,))

        def simulate_experiment(self, key, modelparams, expparams, repeat=1):
            raise NotImplementedError

    model = GaussianMeanModel()
    prior = qi.NormalDistribution(mean=0.0, var=1.0)
    u = qi.SMCUpdater(model, 8000, prior, seed=3)

    rng = np.random.default_rng(11)
    true_mu = 0.6
    data = true_mu + np.sqrt(sigma2) * rng.standard_normal(20)
    ep = {"dummy": jnp.array([0.0], jnp.float32)}
    for x in data:
        u.update(jnp.float32(x), ep)

    # Analytic posterior.
    prec = 1 / 1.0 + len(data) / sigma2
    post_var = 1 / prec
    post_mean = post_var * (data.sum() / sigma2)

    est = float(u.est_mean()[0])
    var = float(u.est_covariance_mtx()[0, 0])
    assert abs(est - post_mean) < 5 * np.sqrt(post_var / u.n_ess)
    np.testing.assert_allclose(var, post_var, rtol=0.25)


def test_precession_matches_oracle():
    """TPU engine vs float64 reference-semantics oracle on the quickstart
    workload (BASELINE config 1) — posterior moments within MC error."""
    true_omega = 0.73
    n_particles = 4000
    rng = np.random.default_rng(5)
    ts = [(9 / 8) ** k for k in range(50)]
    outcomes = []
    for t in ts:
        p0 = np.cos(0.5 * true_omega * t) ** 2
        outcomes.append(0 if rng.random() < p0 else 1)

    # Oracle run (float64, reference semantics).
    oracle = OracleSMC(
        OraclePrecession(), n_particles,
        lambda n: np.random.default_rng(8).random((n, 1)),
        np.random.default_rng(9),
    )
    for t, o in zip(ts, outcomes):
        oracle.update(o, t)

    # TPU engine run.
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, n_particles, prior, seed=21)
    eps = {"t": jnp.array(ts, jnp.float32)}
    u.batch_update(jnp.array(outcomes, jnp.int32), eps)

    om = oracle.est_mean()[0]
    ov = oracle.est_cov()[0, 0]
    em = float(u.est_mean()[0])
    ev = float(u.est_covariance_mtx()[0, 0])

    # Both should recover the true frequency …
    assert abs(om - true_omega) < 6 * np.sqrt(ov)
    assert abs(em - true_omega) < 6 * np.sqrt(ev)
    # … and agree with each other within joint MC error.
    assert abs(em - om) < 6 * np.sqrt(ov + ev)


def test_batch_update_equals_sequential():
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    outcomes = jnp.array([0, 1, 0, 0, 1], jnp.int32)
    ts = jnp.array([1.0, 2.0, 3.0, 5.0, 8.0], jnp.float32)

    u1 = qi.SMCUpdater(model, 1000, prior, seed=2)
    u1.batch_update(outcomes, {"t": ts})

    u2 = qi.SMCUpdater(model, 1000, prior, seed=2)
    for o, t in zip(outcomes, ts):
        u2.update(o, {"t": t[None]})

    np.testing.assert_allclose(
        np.asarray(u1.est_mean()), np.asarray(u2.est_mean()), atol=1e-5
    )
    assert u1.resample_count == u2.resample_count
    np.testing.assert_allclose(
        u1.normalization_record, u2.normalization_record, atol=1e-5
    )


def test_records_and_evidence():
    model = qi.CoinModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 2000, prior, seed=0)
    ep = {"dummy": jnp.array([0.0], jnp.float32)}
    for f in [1, 0, 1]:
        u.update(jnp.int32(f), ep)
    assert len(u.data_record) == 3
    assert len(u.normalization_record) == 3
    # Evidence: uniform prior coin — Pr(data) = B(1+h,1+t)·C ≈ product of
    # normalization record; log_total_likelihood must equal its log-sum.
    np.testing.assert_allclose(
        u.log_total_likelihood,
        np.sum(np.log(u.normalization_record)),
        atol=1e-4,
    )
    # First flip marginal likelihood = ∫ p dp = 0.5.
    np.testing.assert_allclose(u.normalization_record[0], 0.5, atol=0.02)


def test_resample_triggers_and_preserves_moments():
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 5000, prior, seed=1)
    # Long-time experiment collapses weights → resample fires.
    for k in range(40):
        ep = {"t": jnp.array([(9 / 8) ** k], jnp.float32)}
        key = jax.random.key(100 + k)
        out = model.simulate_experiment(key, jnp.array([[0.6]]), ep)[0, 0, 0]
        u.update(out, ep)
    assert u.resample_count > 0
    assert u.min_n_ess < 5000
    # After updates the posterior concentrates near truth.
    assert abs(float(u.est_mean()[0]) - 0.6) < 0.05


def test_forced_resample_moment_invariance():
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 20000, prior, seed=4)
    u.update(jnp.int32(0), {"t": jnp.array([1.0], jnp.float32)})
    mean_before = np.asarray(u.est_mean())
    cov_before = np.asarray(u.est_covariance_mtx())
    u.resample()
    mean_after = np.asarray(u.est_mean())
    cov_after = np.asarray(u.est_covariance_mtx())
    # Liu–West preserves the first two moments (up to MC error).
    np.testing.assert_allclose(mean_after, mean_before, atol=0.01)
    np.testing.assert_allclose(cov_after, cov_before, atol=0.01)
    assert u.just_resampled


def test_hypothetical_update_shapes():
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 500, prior)
    eps = {"t": jnp.array([1.0, 2.0, 3.0], jnp.float32)}
    w = u.hypothetical_update(jnp.array([0, 1]), eps)
    assert w.shape == (2, 3, 500)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-4)
    w, norm = u.hypothetical_update(
        jnp.array([0, 1]), eps, return_normalization=True
    )
    assert norm.shape == (2, 3, 1)
    # Outcome marginals sum to 1 per experiment.
    np.testing.assert_allclose(np.asarray(norm).sum(0)[:, 0], 1.0, atol=1e-4)


def test_zero_weight_policies():
    model = qi.CoinModel()
    prior = qi.ConstantDistribution([1.0])  # p = 1 always
    # Observing outcome 0 (prob 0) collapses all weights.
    ep = {"dummy": jnp.array([0.0], jnp.float32)}
    u = qi.SMCUpdater(model, 100, prior, zero_weight_policy="error")
    with pytest.raises(RuntimeError):
        u.update(jnp.int32(0), ep)
    u2 = qi.SMCUpdater(model, 100, prior, zero_weight_policy="reset")
    u2.update(jnp.int32(0), ep)  # no raise; weights reset to uniform
    np.testing.assert_allclose(float(u2.n_ess), 100.0, rtol=0.01)


def test_credible_regions():
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 3000, prior, seed=6)
    for k in range(25):
        ep = {"t": jnp.array([(9 / 8) ** k], jnp.float32)}
        out = model.simulate_experiment(
            jax.random.key(k), jnp.array([[0.42]]), ep
        )[0, 0, 0]
        u.update(out, ep)
    region = u.est_credible_region(0.95)
    assert region.shape[1] == 1
    inside = u.in_credible_region(np.array([[0.42]]), level=0.99)
    assert inside[0]
    xs, density = u.posterior_marginal(res=50)
    assert len(xs) == 50 and density.sum() > 0


def test_state_checkpoint_roundtrip(tmp_path):
    """SURVEY §5.4: state is fully captured by the SMCState pytree."""
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 500, prior, seed=0)
    u.update(jnp.int32(0), {"t": jnp.array([1.0], jnp.float32)})
    flat = jax.tree_util.tree_map(np.asarray, u.state)
    np.savez(tmp_path / "ckpt.npz", **flat._asdict())
    loaded = np.load(tmp_path / "ckpt.npz")
    u2 = qi.SMCUpdater(model, 500, prior, seed=99)
    u2.state = qi.SMCState(**{k: jnp.asarray(loaded[k]) for k in loaded})
    np.testing.assert_allclose(
        np.asarray(u.est_mean()), np.asarray(u2.est_mean()), atol=1e-6
    )
    # Resumed updater continues updating.
    u2.update(jnp.int32(1), {"t": jnp.array([2.0], jnp.float32)})


def test_long_record_scan():
    """500-experiment record replays as one scan without drift/NaN."""
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    rng = np.random.default_rng(1)
    ts = np.minimum((9 / 8) ** (np.arange(500) % 60), 1e3).astype(np.float32)
    p0 = np.cos(0.5 * 0.81 * ts) ** 2
    outcomes = (rng.random(500) >= p0).astype(np.int32)
    u = qi.SMCUpdater(model, 2000, prior, seed=0,
                      zero_weight_policy="reset")
    u.batch_update(jnp.asarray(outcomes), {"t": jnp.asarray(ts)})
    est = float(u.est_mean()[0])
    assert np.isfinite(est) and abs(est - 0.81) < 0.02
    assert len(u.normalization_record) == 500
    assert np.isfinite(u.log_total_likelihood)
    assert u.resample_count > 3


def test_posterior_mesh_and_contour():
    model = qi.MultiCosModel(n_terms=2)
    prior = qi.UniformDistribution([[0.0, 1.0], [0.0, 1.0]])
    u = qi.SMCUpdater(model, 1500, prior, seed=0)
    mx, my, z = u.posterior_mesh(res1=40, res2=30)
    assert mx.shape == (30, 40) and z.shape == (30, 40)
    assert np.isfinite(z).all() and z.max() > 0
    import matplotlib

    matplotlib.use("Agg")
    cs = u.plot_posterior_contour(res1=30, res2=30)
    assert cs is not None


def test_sharp_continuous_density_not_clipped():
    """Continuous-outcome models with log-density > 0 (density > 1) must
    not have their evidence clipped (regression: upper clip at 0)."""
    sigma2 = 0.001  # density peak ≈ 12.6 ≫ 1

    @jax.tree_util.register_static
    class SharpGaussian(qi.Model):
        @property
        def n_modelparams(self):
            return 1

        def n_outcomes(self, expparams=None):
            return 1

        def are_models_valid(self, modelparams):
            return jnp.ones(modelparams.shape[0], bool)

        def log_likelihood(self, outcomes, modelparams, expparams):
            x = jnp.asarray(outcomes, jnp.float32).reshape(-1)
            mu = modelparams[:, 0]
            ll = (
                -0.5 * (x[:, None] - mu[None, :]) ** 2 / sigma2
                - 0.5 * jnp.log(2 * jnp.pi * sigma2)
            )
            return ll[:, :, None]

        def simulate_experiment(self, key, modelparams, expparams, repeat=1):
            raise NotImplementedError

    model = SharpGaussian()
    prior = qi.NormalDistribution(mean=0.0, var=1.0)
    u = qi.SMCUpdater(model, 8000, prior, seed=0)
    rng = np.random.default_rng(3)
    data = 0.3 + np.sqrt(sigma2) * rng.standard_normal(5)
    for x in data:
        u.update(jnp.float32(x), {"d": jnp.array([0.0], jnp.float32)})
    # Evidence: with density ≫ 1 near truth the log-evidence is positive
    # for later updates — verify it isn't pinned at ≤ 0.
    assert max(np.log(u.normalization_record[1:])) > 0.5
    post_var = 1 / (1 / 1.0 + len(data) / sigma2)
    post_mean = post_var * data.sum() / sigma2
    assert abs(float(u.est_mean()[0]) - post_mean) < 6 * np.sqrt(
        post_var / u.n_ess
    ) + 1e-3
