"""Auxiliary-subsystem tests: time-dependent inference, checkpointing,
profiling, cluster estimators (SURVEY §5)."""

import jax
import jax.numpy as jnp
import numpy as np

import qinfer_tpu as qi
from qinfer_tpu.smc import _is_time_dependent


def test_time_dependence_detection():
    static = qi.SimplePrecessionModel()
    walk = qi.RandomWalkModel(static, qi.NormalDistribution(0.0, 1e-4))
    assert not _is_time_dependent(static)
    assert _is_time_dependent(walk)
    assert not _is_time_dependent(qi.BinomialModel(static))
    assert _is_time_dependent(qi.BinomialModel(walk))
    assert _is_time_dependent(
        qi.GaussianRandomWalkModel(static)
    )


def test_random_walk_inference_tracks_drift():
    """Time-dependent updater: the particle cloud diffuses with the model,
    so a drifting true parameter stays within the posterior."""
    rng = np.random.default_rng(0)
    base = qi.SimplePrecessionModel()
    walk = qi.RandomWalkModel(base, qi.NormalDistribution(0.0, 1e-4))
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(walk, 3000, prior, seed=0)

    true_omega = 0.5
    errs = []
    for k in range(60):
        t = min((9 / 8) ** (k % 25), 50.0)
        p0 = np.cos(0.5 * true_omega * t) ** 2
        outcome = 0 if rng.random() < p0 else 1
        u.update(jnp.int32(outcome), {"t": jnp.array([t], jnp.float32)})
        true_omega = abs(true_omega + rng.normal(0, 1e-2))
        errs.append(abs(float(u.est_mean()[0]) - true_omega))
    # Tracking: recent errors stay bounded by a few posterior widths.
    std = float(jnp.sqrt(u.est_covariance_mtx()[0, 0]))
    assert np.mean(errs[-10:]) < 10 * std + 0.05
    # Posterior variance does not collapse to zero (diffusion keeps it open).
    assert std > 1e-4


def test_checkpoint_npz_roundtrip(tmp_path):
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 500, prior, seed=0)
    for k in range(5):
        u.update(jnp.int32(k % 2), {"t": jnp.array([1.0 + k], jnp.float32)})

    qi.checkpointing.save_npz(tmp_path / "ckpt.npz", u)
    u2 = qi.SMCUpdater(model, 500, prior, seed=99)
    qi.checkpointing.load_npz(tmp_path / "ckpt.npz", u2)
    np.testing.assert_allclose(
        np.asarray(u.est_mean()), np.asarray(u2.est_mean()), atol=1e-7
    )
    assert u2.normalization_record == [
        float(x) for x in u.normalization_record
    ]
    # Resumed updater continues identically (same key in state).
    ep = {"t": jnp.array([9.0], jnp.float32)}
    u.update(jnp.int32(1), ep)
    u2.update(jnp.int32(1), ep)
    np.testing.assert_allclose(
        np.asarray(u.est_mean()), np.asarray(u2.est_mean()), atol=1e-7
    )


def test_checkpoint_orbax_roundtrip(tmp_path):
    model = qi.CoinModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 200, prior, seed=1)
    ep = {"dummy": jnp.array([0.0], jnp.float32)}
    for f in [1, 0, 1]:
        u.update(jnp.int32(f), ep)
    qi.checkpointing.save_orbax(tmp_path / "orbax_ckpt", u)
    u2 = qi.SMCUpdater(model, 200, prior, seed=7)
    qi.checkpointing.load_orbax(tmp_path / "orbax_ckpt", u2)
    np.testing.assert_allclose(
        np.asarray(u.particle_log_weights),
        np.asarray(u2.particle_log_weights),
        atol=1e-7,
    )


def test_throughput_meter():
    meter = qi.ThroughputMeter()
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 1000, prior)
    outcomes = jnp.array([0, 1, 0], jnp.int32)
    eps = {"t": jnp.array([1.0, 2.0, 3.0], jnp.float32)}
    with meter.measure(3 * 1000, sync=None):
        u.batch_update(outcomes, eps)
    rep = meter.report()
    assert rep["particle_updates"] == 3000
    assert rep["particle_updates_per_s"] > 0


def test_call_counters():
    """SURVEY §5.1: call_count bookkeeping (reference Model.call_count)."""
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 100, prior)
    u.update(jnp.int32(0), {"t": jnp.array([1.0], jnp.float32)})
    assert u._call_count == 100
    u.hypothetical_update(
        jnp.array([0, 1]), {"t": jnp.array([1.0, 2.0], jnp.float32)}
    )
    assert u._call_count == 100 + 2 * 100 * 2


def test_cluster_estimators():
    model = qi.SimplePrecessionModel()
    prior = qi.MixtureDistribution(
        [0.5, 0.5],
        [qi.NormalDistribution(0.2, 1e-4), qi.NormalDistribution(0.8, 1e-4)],
    )
    u = qi.SMCUpdater(model, 2000, prior, seed=0)
    moments = list(u.est_cluster_moments({"eps": 0.1}))
    labels = [m[0] for m in moments if m[0] != qi.NOISE]
    assert len(labels) == 2
    means = sorted(float(m[2][0]) for m in moments if m[0] != qi.NOISE)
    np.testing.assert_allclose(means, [0.2, 0.8], atol=0.05)
    metrics = u.est_cluster_metrics({"eps": 0.1})
    assert metrics["n_clusters"] == 2
    assert 0.3 < metrics["largest_cluster_weight"] < 0.7
