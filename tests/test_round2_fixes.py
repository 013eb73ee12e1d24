"""Round-2 fixes: vector outcomes through the updater, live sim_count,
resampling-divergence recording, checkpointed data_record, rate-aware
Poisson truncation, reset RNG semantics (VERDICT.md round 1 + ADVICE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qinfer_tpu as qi


def test_multinomial_vector_outcomes_through_updater(key):
    """ADVICE (medium): MultinomialModel count vectors must flow through
    SMCUpdater.update/batch_update (the round-1 step truncated outcomes to
    their first element)."""
    die = qi.NDieModel(n=3)
    model = qi.MultinomialModel(die)
    prior = qi.ConstrainedSumDistribution(
        qi.UniformDistribution([[0.0, 1.0]] * 3), desired_total=1.0
    )
    u = qi.SMCUpdater(model, 2000, prior, seed=0)

    true_p = np.array([0.6, 0.3, 0.1])
    rng = np.random.default_rng(0)
    ep = {"exp_num": jnp.array([0], jnp.int32),
          "n_meas": jnp.array([20], jnp.int32)}
    for _ in range(10):
        counts = rng.multinomial(20, true_p)
        u.update(jnp.asarray(counts, jnp.int32), ep)
    est = np.asarray(u.est_mean())
    np.testing.assert_allclose(est, true_p, atol=0.12)

    # batch_update path: outcomes with trailing outcome dimension (T, k).
    T = 6
    outcomes = jnp.asarray(
        rng.multinomial(20, true_p, size=T), jnp.int32
    )
    eps = {"exp_num": jnp.zeros(T, jnp.int32),
           "n_meas": jnp.full(T, 20, jnp.int32)}
    u2 = qi.SMCUpdater(model, 2000, prior, seed=1)
    u2.batch_update(outcomes, eps)
    assert len(u2.normalization_record) == T
    est2 = np.asarray(u2.est_mean())
    np.testing.assert_allclose(est2, true_p, atol=0.15)


def test_sim_count_live(key):
    """VERDICT item 4: Simulatable.sim_count must increment at
    simulate_experiment call sites (reference:
    ``abstract_model.py — Simulatable.sim_count``)."""
    model = qi.SimplePrecessionModel()
    assert model.sim_count == 0
    params = jnp.array([[0.5], [0.7]])
    ep = {"t": jnp.array([1.0, 2.0, 3.0], jnp.float32)}
    model.simulate_experiment(key, params, ep, repeat=4)
    assert model.sim_count == 4 * 2 * 3
    model.simulate_experiment(key, params, ep)
    assert model.sim_count == 4 * 2 * 3 + 2 * 3
    model.reset_sim_count()
    assert model.sim_count == 0

    # Combinators count too.
    binom = qi.BinomialModel(qi.SimplePrecessionModel())
    ep_b = {"t": jnp.array([1.0], jnp.float32),
            "n_meas": jnp.array([10], jnp.int32)}
    binom.simulate_experiment(key, params, ep_b)
    assert binom.sim_count == 2


def test_resampling_divergence_recorded():
    """VERDICT item 4: track_resampling_divergence=True must record one
    divergence per resample (round 1 accepted the flag and left the list
    empty forever)."""
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(
        model, 1000, prior, track_resampling_divergence=True,
        resample_thresh=1.1, seed=0,  # ESS < 1.1·N always → resample every update
    )
    rng = np.random.default_rng(3)
    for k in range(5):
        t = (9 / 8) ** k
        u.update(jnp.int32(rng.integers(2)), {"t": jnp.array([t], jnp.float32)})
    assert u.resample_count == 5
    assert len(u.resampling_divergences) == 5
    div = np.asarray(u.resampling_divergences)
    assert np.all(np.isfinite(div))
    # KL ≥ 0 up to Monte-Carlo noise; Liu–West preserves the first two
    # moments, so the moment-matched KL should be small.
    assert np.all(div > -1e-6)
    assert np.all(div < 0.5)

    # batch_update falls back to per-update host steps under tracking.
    u.batch_update(
        jnp.array([0, 1], jnp.int32),
        {"t": jnp.array([2.0, 3.0], jnp.float32)},
    )
    assert len(u.resampling_divergences) == 7
    u.reset()
    assert u.resampling_divergences == []

    # Updater without tracking keeps the None sentinel (reference parity).
    u2 = qi.SMCUpdater(model, 100, prior)
    assert u2.resampling_divergences is None


def test_checkpoint_preserves_data_record(tmp_path):
    """ADVICE (low): the checkpoint docstring promised data_record rides
    along; now it actually does."""
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 300, prior, seed=0)
    for k in range(4):
        u.update(jnp.int32(k % 2), {"t": jnp.array([1.0 + k], jnp.float32)})

    qi.checkpointing.save_npz(tmp_path / "ckpt.npz", u)
    u2 = qi.SMCUpdater(model, 300, prior, seed=9)
    qi.checkpointing.load_npz(tmp_path / "ckpt.npz", u2)
    assert len(u2.data_record) == 4
    for (o1, ep1), (o2, ep2) in zip(u.data_record, u2.data_record):
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
        np.testing.assert_allclose(ep1["t"], ep2["t"])
    assert len(u2.data_record) == len(u2.normalization_record)

    qi.checkpointing.save_orbax(tmp_path / "orbax_ckpt", u)
    u3 = qi.SMCUpdater(model, 300, prior, seed=11)
    qi.checkpointing.load_orbax(tmp_path / "orbax_ckpt", u3)
    assert len(u3.data_record) == 4
    np.testing.assert_array_equal(
        np.asarray(u3.data_record[2][0]), np.asarray(u.data_record[2][0])
    )


def test_referenced_poisson_rate_aware_truncation(key):
    """VERDICT item 7: enumeration truncation must be rate-aware — no
    probability-mass loss > 1e-6 for high-rate calibrations."""
    base = qi.CoinModel()
    lam = 2000.0
    model = qi.ReferencedPoissonModel(base, max_rate=lam)
    assert model.n_outcomes() > lam  # quantile bound scales with the rate
    # Bright-mode calibration at rate λ = 2000 — the hardcoded round-1
    # bound of 1000 outcomes would capture essentially zero mass here.
    params = jnp.array([[0.5, lam, 100.0]])
    ep = {"dummy": jnp.array([0.0], jnp.float32),
          "mode": jnp.array([qi.ReferencedPoissonModel.BRIGHT], jnp.int32)}
    outcomes = model.all_outcomes(ep)
    # Truncation-mass criterion in f64 (the device likelihood is f32 whose
    # gammaln rounding at k≈2000 costs ~1e-5 — that's arithmetic, not
    # truncation).
    import scipy.stats

    mass = scipy.stats.poisson.pmf(np.asarray(outcomes), lam).sum()
    assert mass > 1.0 - 1e-6
    L = np.asarray(model.likelihood(outcomes, params, ep), np.float64)
    assert L[:, 0, 0].sum() > 1.0 - 1e-4

    # Default (max_rate=None) keeps the documented 1000-outcome fallback.
    assert qi.ReferencedPoissonModel(base).n_outcomes() == 1000


def test_reset_rng_semantics():
    """VERDICT (weak 5): reset() now redraws by default (reference
    semantics); fresh_rng=False reproduces the construction-time cloud."""
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 500, prior, seed=0)
    locs0 = np.asarray(u.particle_locations).copy()
    u.update(jnp.int32(0), {"t": jnp.array([1.0], jnp.float32)})
    u.reset()
    assert not np.allclose(np.asarray(u.particle_locations), locs0)
    u.reset(fresh_rng=False)
    np.testing.assert_array_equal(np.asarray(u.particle_locations), locs0)


def test_update_no_retrace_on_check_for_resample():
    """ADVICE (low): update(check_for_resample=False) must reuse a cached
    SMCConfig — a fresh identity-hashed config per call would retrace."""
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 200, prior, seed=0)
    ep = {"t": jnp.array([1.0], jnp.float32)}
    u.update(jnp.int32(0), ep, check_for_resample=False)
    n_traces = u._jit_step._cache_size()
    for k in range(3):
        u.update(jnp.int32(k % 2), ep, check_for_resample=False)
    assert u._jit_step._cache_size() == n_traces
