"""Perf-harness smoke tests. Reference pattern:
``tests/test_perf_testing.py`` — run tiny perf_test_multiple, assert
structured dtype fields & bookkeeping."""

import numpy as np

import qinfer_tpu as qi

FIELDS = {"elapsed_time", "loss", "resample_count", "outcome", "true", "est"}


def test_perf_test_single():
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    perf = qi.perf_test(
        model, 200, prior, 20, lambda u: qi.ExpSparseHeuristic(u)
    )
    assert perf.shape == (20,)
    assert set(perf.dtype.names) == FIELDS
    assert (perf["resample_count"] >= 0).all()
    assert np.all(np.diff(perf["resample_count"]) >= 0)  # monotone counter
    assert perf["elapsed_time"].sum() > 0


def test_perf_test_multiple_loss_decreases():
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    perf = qi.perf_test_multiple(
        40, model, 400, prior, 40, lambda u: qi.PGH(u), seed=12
    )
    assert perf.shape == (40, 40)
    med_first = np.median(perf["loss"][:, 0])
    med_last = np.median(perf["loss"][:, -1])
    assert med_last < med_first / 10, (med_first, med_last)


def test_pgh_heuristic_scaling():
    """PGH times grow as the posterior narrows."""
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    perf = qi.perf_test(
        model, 400, prior, 60, lambda u: qi.PGH(u), seed=5
    )
    # Posterior concentrates: final loss small.
    assert perf["loss"][-1] < 1e-2


def test_stateful_heuristic_wrappers():
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 300, prior, seed=0)
    h = qi.ExpSparseHeuristic(u, scale=2.0, base=2.0)
    ep0 = h()
    ep1 = h()
    assert float(ep1["t"][0]) == 2 * float(ep0["t"][0])
    pgh = qi.PGH(u)
    ep = pgh()
    assert float(ep["t"][0]) > 0


def test_perf_test_per_update_timing():
    """timing_mode='per_update' records true per-update wall times
    (reference perf_test semantics) and the same loss fields."""
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    perf = qi.perf_test(
        model, 512, prior, 10, qi.PGH, seed=4, timing_mode="per_update"
    )
    assert perf.shape == (10,)
    assert (perf["elapsed_time"] > 0).all()
    # Per-update times are individually measured, not a uniform average.
    assert len(np.unique(perf["elapsed_time"])) > 1
    assert perf["loss"][-1] < perf["loss"][0] * 5  # learning, loosely
    assert perf["est"].shape == (10, 1)
