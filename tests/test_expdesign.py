"""Experiment design, BCRB, clustering, and misc-parity tests."""

import jax
import jax.numpy as jnp
import numpy as np

import qinfer_tpu as qi


def _trained_updater(n=2000, n_exp=15, seed=0):
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, n, prior, seed=seed)
    for k in range(n_exp):
        ep = {"t": jnp.array([(9 / 8) ** k], jnp.float32)}
        out = model.simulate_experiment(
            jax.random.PRNGKey(50 + k), jnp.array([[0.55]]), ep
        )[0, 0, 0]
        u.update(out, ep)
    return u


def test_designer_improves_guess():
    u = _trained_updater()
    designer = qi.ExperimentDesigner(u)
    guess = {"t": jnp.array([1.0], jnp.float32)}
    risk_guess = float(u.bayes_risk(guess))
    designed = designer.design_expparams_field(
        guess, "t", cost_scale_k=0.0, maxiter=20
    )
    risk_designed = float(u.bayes_risk(designed))
    assert risk_designed <= risk_guess + 1e-9


def test_designer_with_heuristic_guess_and_store():
    u = _trained_updater(seed=3)
    designer = qi.ExperimentDesigner(
        u, opt_algo=qi.OptimizationAlgorithms.NELDER_MEAD
    )
    designer.new_exp()
    ep = designer.design_expparams_field(
        qi.PGH(u), "t", store_guess=True, maxiter=10
    )
    assert float(ep["t"][0]) > 0


def test_bcrb_updater():
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdaterBCRB(model, 1000, prior, seed=0,
                          initial_bim=np.eye(1) * 12.0)
    for k in range(10):
        ep = {"t": jnp.array([float(k + 1)], jnp.float32)}
        out = model.simulate_experiment(
            jax.random.PRNGKey(k), jnp.array([[0.5]]), ep
        )[0, 0, 0]
        u.update(out, ep)
    bim = np.asarray(u.current_bim)
    assert bim.shape == (1, 1) and bim[0, 0] > 12.0  # information accumulates
    bcrb = np.asarray(u.current_bcrb)
    # The posterior variance cannot beat the accumulated bound by much.
    post_var = float(u.est_covariance_mtx()[0, 0])
    assert post_var > 0.1 * bcrb[0, 0]


def test_mixed_approximate_updater():
    good = qi.SimplePrecessionModel()
    approx = qi.PoisonedModel(good, tol=0.01)
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.MixedApproximateSMCUpdater(good, approx, 1000, prior,
                                      mixture_thresh=0.9, seed=0)
    for k in range(20):
        ep = {"t": jnp.array([(9 / 8) ** k], jnp.float32)}
        out = good.simulate_experiment(
            jax.random.PRNGKey(k), jnp.array([[0.5]]), ep
        )[0, 0, 0]
        u.update(out, ep)
    assert u._sharpened  # switched to the exact model
    assert abs(float(u.est_mean()[0]) - 0.5) < 0.1


def test_finite_difference_matches_grad():
    f = lambda x, y: x ** 2 + 3 * y
    fd = qi.FiniteDifference(f, 2, h=1e-4)
    grad = fd([2.0, 1.0])
    np.testing.assert_allclose(grad, [4.0, 3.0], atol=1e-2)


def test_score_mixin():
    @jax.tree_util.register_static
    class M(qi.ScoreMixin, qi.SimplePrecessionModel):
        pass

    m = M()
    params = jnp.array([[0.5]])
    ep = {"t": jnp.array([2.0], jnp.float32)}
    fi = np.asarray(m.fisher_information(params, ep))
    assert fi.shape == (1, 1, 1, 1) and fi[0, 0, 0, 0] >= 0


def test_particle_clusters():
    rng = np.random.default_rng(0)
    locs = np.concatenate(
        [rng.normal(0, 0.05, (100, 2)), rng.normal(3, 0.05, (80, 2))]
    )
    found = dict(qi.particle_clusters(locs, eps=0.3, min_particles=5))
    labels = [l for l in found if l != qi.NOISE]
    assert len(labels) == 2
    sizes = sorted(int(found[l].sum()) for l in labels)
    assert sizes == [80, 100]


def test_weighted_distance_matrices():
    rng = np.random.default_rng(1)
    locs = rng.normal(size=(30, 2)) * [1.0, 100.0]  # wildly different scales
    d = qi.rescaled_distance_mtx(locs)
    assert d.shape == (30, 30)
    np.testing.assert_allclose(d, d.T, atol=1e-8)
    # Whitening removes the scale disparity: distances comparable to √2 d.
    assert 0.1 < np.median(d[np.triu_indices(30, 1)]) < 10
    w = rng.random(30)
    w /= w.sum()
    dw = qi.weighted_pairwise_distances(locs, w)
    assert dw.shape == (30, 30)


def test_progressbar_fallback():
    bar = qi.IPythonProgressBar()
    bar.start(10)
    bar.update(5)
    bar.finished()
    assert bar._value == 10.0


def test_designer_with_binomial_model():
    """ExperimentDesigner over a data-dependent-outcome model (regression:
    outcome enumeration from traced expparams)."""
    model = qi.BinomialModel(qi.SimplePrecessionModel())
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 500, prior, seed=0)
    for k in range(8):
        ep = {"t": jnp.array([(9 / 8) ** k], jnp.float32),
              "n_meas": jnp.array([15.0], jnp.float32)}
        out = model.simulate_experiment(
            jax.random.PRNGKey(k), jnp.array([[0.5]]), ep
        )[0, 0, 0]
        u.update(out, ep)
    designer = qi.ExperimentDesigner(u)
    guess = {"t": jnp.array([2.0], jnp.float32),
             "n_meas": jnp.array([15.0], jnp.float32)}
    designed = designer.design_expparams_field(
        guess, "t", cost_scale_k=0.0, maxiter=10
    )
    assert float(u.bayes_risk(designed)) <= float(u.bayes_risk(guess)) + 1e-9


def test_bcrb_with_binomial_model():
    """BCRB tracking over a data-dependent-outcome model (regression)."""
    model = qi.BinomialModel(qi.SimplePrecessionModel())
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdaterBCRB(model, 400, prior, seed=0,
                          initial_bim=np.eye(1))
    for k in range(5):
        ep = {"t": jnp.array([float(k + 1)], jnp.float32),
              "n_meas": jnp.array([10.0], jnp.float32)}
        out = model.simulate_experiment(
            jax.random.PRNGKey(k), jnp.array([[0.5]]), ep
        )[0, 0, 0]
        u.update(out, ep)
    bim = np.asarray(u.current_bim)
    assert np.isfinite(bim).all() and bim[0, 0] > 1.0


def test_designer_vector_field_multicos():
    """Vector-valued expparams fields (MultiCos 'ts', shape (1, 2)) are
    designable — the exact jax.grad risk gradient makes this free."""
    model = qi.MultiCosModel(n_terms=2)
    prior = qi.UniformDistribution([[0.0, 1.0], [0.0, 1.0]])
    u = qi.SMCUpdater(model, 2000, prior, seed=5)
    rng = np.random.default_rng(5)
    for k in range(12):
        ep = {"ts": jnp.asarray(
            rng.random((1, 2)) * (9 / 8) ** k, jnp.float32)}
        out = model.simulate_experiment(
            jax.random.PRNGKey(80 + k), jnp.array([[0.3, 0.7]]), ep
        )[0, 0, 0]
        u.update(out, ep)

    designer = qi.ExperimentDesigner(u)
    guess = {"ts": jnp.array([[1.0, 2.0]], jnp.float32)}
    risk_guess = float(u.bayes_risk(guess))
    designed = designer.design_expparams_field(
        guess, "ts", cost_scale_k=0.0, maxiter=20
    )
    assert designed["ts"].shape == (1, 2)
    risk_designed = float(u.bayes_risk(designed))
    assert risk_designed <= risk_guess + 1e-9


def test_designer_tomography_meas_with_projection():
    """Design a tomography measurement effect under the Bloch-ball
    projection; the designed effect must stay a valid POVM element and not
    be worse than the guess."""
    from qinfer_tpu.tomography import (
        GinibreDistribution,
        TomographyModel,
        pauli_basis,
    )

    basis = pauli_basis(1)
    model = TomographyModel(basis)
    prior = GinibreDistribution(basis)
    u = qi.SMCUpdater(model, 2000, prior, seed=9)
    e_z = np.zeros(4, np.float32)
    e_z[0] = 1 / np.sqrt(2) / 2
    e_z[3] = 1 / np.sqrt(2) / 2  # projector onto |0>
    rng = np.random.default_rng(9)
    for k in range(10):
        out = jnp.int32(rng.integers(0, 2))
        u.update(out, {"meas": jnp.asarray(e_z)[None, :]})

    def project_effect(x):
        # Effect E = x·B: clamp to 0 <= E <= I by shrinking the traceless
        # part into the Bloch ball of the midpoint.
        x = np.array(x, np.float64)
        x[0] = 1 / np.sqrt(2) / 2  # Tr E = 1/2 family
        r = np.linalg.norm(x[1:]) * np.sqrt(2) * 2
        if r > 1.0:
            x[1:] *= 1.0 / r
        return x

    designer = qi.ExperimentDesigner(u)
    guess = {"meas": jnp.asarray(project_effect(
        np.array([0.35, 0.3, 0.1, 0.2])))[None, :].astype(jnp.float32)}
    risk_guess = float(u.bayes_risk(guess))
    designed = designer.design_expparams_field(
        guess, "meas", cost_scale_k=0.0, maxiter=15,
        project=project_effect,
    )
    assert designed["meas"].shape == (1, 4)
    risk_designed = float(u.bayes_risk(designed))
    assert risk_designed <= risk_guess + 1e-9
    # Designed effect is physical: 0 <= E <= I on the Bloch ball.
    e = np.asarray(designed["meas"], np.float64)[0]
    assert np.linalg.norm(e[1:]) * np.sqrt(2) * 2 <= 1.0 + 1e-6
