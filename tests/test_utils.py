"""Numerics-utility tests. Reference pattern: qinfer tests of utils.py."""

import jax.numpy as jnp
import numpy as np
import scipy.stats

from qinfer_tpu import utils


def test_binomial_pdf_matches_scipy():
    n, k = 20, jnp.arange(21)
    for p in [0.1, 0.5, 0.9]:
        ours = np.asarray(utils.binomial_pdf(n, k, p))
        ref = scipy.stats.binom.pmf(np.arange(21), 20, p)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-7)


def test_multinomial_pdf_matches_scipy():
    ks = np.array([3, 2, 5])
    ps = np.array([0.2, 0.3, 0.5])
    ours = float(utils.multinomial_pdf(ks, ps))
    ref = scipy.stats.multinomial.pmf(ks, 10, ps)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_sample_multinomial_moments(key):
    ps = jnp.array([0.2, 0.3, 0.5])
    counts = utils.sample_multinomial(key, 100, ps, shape=(5000,))
    assert counts.shape == (5000, 3)
    np.testing.assert_array_equal(np.asarray(counts.sum(-1)), 100)
    emp = np.asarray(counts).mean(0) / 100
    np.testing.assert_allclose(emp, np.asarray(ps), atol=0.01)


def test_sqrtm_psd():
    A = np.array([[2.0, 0.5], [0.5, 1.0]])
    root = np.asarray(utils.sqrtm_psd(jnp.asarray(A)))
    np.testing.assert_allclose(root @ root, A, atol=1e-5)
    # Clips negative eigenvalues.
    B = np.array([[1.0, 0.0], [0.0, -0.5]])
    root = np.asarray(utils.sqrtm_psd(jnp.asarray(B)))
    np.testing.assert_allclose(root @ root, [[1, 0], [0, 0]], atol=1e-5)


def test_particle_moments():
    rng = np.random.default_rng(0)
    locs = rng.standard_normal((1000, 3))
    w = rng.random(1000)
    w /= w.sum()
    mu = np.asarray(utils.particle_mean(jnp.asarray(w), jnp.asarray(locs)))
    np.testing.assert_allclose(mu, w @ locs, atol=1e-5)
    cov = np.asarray(
        utils.particle_covariance_mtx(jnp.asarray(w), jnp.asarray(locs))
    )
    centered = locs - w @ locs
    ref_cov = (w[:, None] * centered).T @ centered
    np.testing.assert_allclose(cov, ref_cov, atol=1e-4)


def test_ess():
    log_w = jnp.log(jnp.full((100,), 0.01))
    assert abs(float(utils.effective_sample_size(log_w)) - 100.0) < 1e-3
    # One particle holds all weight → ESS 1.
    w = np.full(100, 1e-12)
    w[0] = 1.0
    log_w = jnp.log(jnp.asarray(w / w.sum()))
    assert abs(float(utils.effective_sample_size(log_w)) - 1.0) < 1e-3


def test_mvee_and_in_ellipsoid():
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((50, 2))
    A, c = utils.mvee(pts, tol=1e-4)
    assert np.all(utils.in_ellipsoid(pts, A / (1 + 2e-4), c))
    vol = utils.ellipsoid_volume(A=A)
    assert vol > 0


def test_format_uncertainty():
    assert utils.format_uncertainty(1.234, 0.05) == "1.23 ± 0.05"


def test_compactspace():
    xs = utils.compactspace(1.0, 11)
    assert len(xs) == 11
    assert np.all(np.diff(xs) > 0)
