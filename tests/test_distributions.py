"""Distribution moment tests. Reference pattern: ``tests/test_distributions.py``
(sample large N, compare empirical moments to spec within tolerance)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qinfer_tpu as qi

N = 40_000


def _moments(dist, key, n=N):
    s = np.asarray(dist.sample(key, n))
    assert s.shape == (n, dist.n_rvs)
    return s.mean(0), np.cov(s.T), s


def test_uniform(key):
    d = qi.UniformDistribution([[0.0, 1.0], [2.0, 4.0]])
    mean, cov, s = _moments(d, key)
    np.testing.assert_allclose(mean, [0.5, 3.0], atol=0.02)
    assert s[:, 0].min() >= 0 and s[:, 1].max() <= 4


def test_normal(key):
    d = qi.NormalDistribution(mean=2.0, var=4.0)
    mean, cov, _ = _moments(d, key)
    np.testing.assert_allclose(mean, [2.0], atol=0.05)
    np.testing.assert_allclose(cov, 4.0, atol=0.15)


def test_truncated_normal(key):
    d = qi.NormalDistribution(mean=0.0, var=1.0, trunc=(0.0, 1.0))
    _, _, s = _moments(d, key)
    assert s.min() >= 0 and s.max() <= 1


def test_mvn(key):
    cov = [[1.0, 0.4], [0.4, 2.0]]
    d = qi.MultivariateNormalDistribution([1.0, -1.0], cov)
    mean, emp_cov, _ = _moments(d, key)
    np.testing.assert_allclose(mean, [1.0, -1.0], atol=0.05)
    np.testing.assert_allclose(emp_cov, cov, atol=0.1)


def test_constant(key):
    d = qi.ConstantDistribution([3.0, 4.0])
    s = np.asarray(d.sample(key, 10))
    np.testing.assert_array_equal(s, np.tile([3.0, 4.0], (10, 1)))


def test_beta(key):
    d = qi.BetaDistribution(alpha=2.0, beta=5.0)
    mean, var, _ = _moments(d, key)
    np.testing.assert_allclose(mean, [2 / 7], atol=0.01)
    d2 = qi.BetaDistribution(mean=0.3, var=0.01)
    m2, v2, _ = _moments(d2, key)
    np.testing.assert_allclose(m2, [0.3], atol=0.01)
    np.testing.assert_allclose(v2, 0.01, atol=0.002)


def test_gamma(key):
    d = qi.GammaDistribution(alpha=3.0, beta=2.0)
    mean, var, _ = _moments(d, key)
    np.testing.assert_allclose(mean, [1.5], atol=0.03)
    np.testing.assert_allclose(var, 0.75, atol=0.05)


def test_lognormal(key):
    d = qi.LogNormalDistribution(mu=0.0, sigma=0.5)
    mean, _, _ = _moments(d, key)
    np.testing.assert_allclose(mean, [np.exp(0.125)], atol=0.03)


def test_betabinomial(key):
    d = qi.BetaBinomialDistribution(10, alpha=2.0, beta=2.0)
    mean, _, s = _moments(d, key)
    np.testing.assert_allclose(mean, [5.0], atol=0.1)
    assert s.min() >= 0 and s.max() <= 10


def test_product(key):
    d = qi.ProductDistribution(
        qi.NormalDistribution(0.0, 1.0), qi.UniformDistribution([0, 1])
    )
    assert d.n_rvs == 2
    mean, _, _ = _moments(d, key)
    np.testing.assert_allclose(mean, [0.0, 0.5], atol=0.03)


def test_mixture(key):
    d = qi.MixtureDistribution(
        [0.5, 0.5],
        [qi.NormalDistribution(-2.0, 0.01), qi.NormalDistribution(2.0, 0.01)],
    )
    mean, var, _ = _moments(d, key)
    np.testing.assert_allclose(mean, [0.0], atol=0.05)
    np.testing.assert_allclose(var, 4.01, atol=0.15)


def test_mixture_from_class(key):
    d = qi.MixtureDistribution(
        [0.3, 0.7], qi.NormalDistribution, dist_args=[(0.0, 1.0), (5.0, 1.0)]
    )
    mean, _, _ = _moments(d, key)
    np.testing.assert_allclose(mean, [3.5], atol=0.05)


def test_postselected(key):
    model = qi.SimplePrecessionModel(min_freq=0.5)
    d = qi.PostselectedDistribution(
        qi.UniformDistribution([0.0, 1.0]), model
    )
    _, _, s = _moments(d, key, n=5000)
    assert s.min() >= 0.5


def test_constrained_sum(key):
    d = qi.ConstrainedSumDistribution(
        qi.UniformDistribution([[0, 1]] * 3), desired_total=1.0
    )
    _, _, s = _moments(d, key, n=2000)
    np.testing.assert_allclose(s.sum(1), 1.0, atol=1e-5)


def test_interpolated_univariate(key):
    pdf = lambda x: np.exp(-0.5 * x ** 2)
    d = qi.InterpolatedUnivariateDistribution(pdf, 2.0, 2000)
    mean, var, _ = _moments(d, key)
    np.testing.assert_allclose(mean, [0.0], atol=0.03)
    np.testing.assert_allclose(var, 1.0, atol=0.1)


def test_discrete_uniform(key):
    d = qi.DiscreteUniformDistribution(num_bits=3)
    _, _, s = _moments(d, key, n=5000)
    assert set(np.unique(s)) <= set(range(8))


def test_mv_uniform_simplex(key):
    d = qi.MVUniformDistribution(dim=4)
    _, _, s = _moments(d, key, n=5000)
    np.testing.assert_allclose(s.sum(1), 1.0, atol=1e-5)
    assert s.min() >= 0


def test_particle_distribution(key):
    locs = jnp.array([[0.0], [1.0]])
    d = qi.ParticleDistribution(locs, particle_weights=jnp.array([0.25, 0.75]))
    np.testing.assert_allclose(float(d.est_mean()[0]), 0.75, atol=1e-5)
    s = np.asarray(d.sample(key, 10000))
    np.testing.assert_allclose(s.mean(), 0.75, atol=0.02)
    np.testing.assert_allclose(float(d.n_ess), 1.6, atol=1e-3)


def test_sampling_is_reproducible(key):
    d = qi.UniformDistribution([0, 1])
    s1 = np.asarray(d.sample(key, 5))
    s2 = np.asarray(d.sample(key, 5))
    np.testing.assert_array_equal(s1, s2)
