"""Device-side greedy EIG/risk heuristics inside jitted episode scans."""

import jax
import jax.numpy as jnp
import numpy as np

import qinfer_tpu as qi
from qinfer_tpu.tomography import (
    GinibreDistribution,
    TomographyModel,
    pauli_basis,
)


def test_eig_heuristic_stateful():
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdater(model, 500, prior, seed=0)
    cands = {"t": jnp.linspace(1.0, 30.0, 8)}
    h = qi.EIGHeuristic(u, candidates=cands)
    ep = h()
    assert float(ep["t"][0]) in set(np.asarray(cands["t"]).tolist())
    # Risk variant.
    h2 = qi.RiskHeuristic(u, candidates=cands)
    ep2 = h2()
    assert ep2["t"].shape == (1,)


def test_eig_heuristic_in_episode_scan():
    """The whole adaptive loop (score candidates → argmax → simulate →
    update) runs inside one jitted scan via the perf harness."""
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    cands = {"t": jnp.asarray((9 / 8) ** np.arange(20), jnp.float32)}
    perf = qi.perf_test_multiple(
        16, model, 800, prior, 40,
        lambda u: qi.EIGHeuristic(u, model=model, candidates=cands),
        seed=3,
    )
    med_first = np.median(perf["loss"][:, 0])
    med_last = np.median(perf["loss"][:, -1])
    assert med_last < med_first / 20, (med_first, med_last)


def test_eig_heuristic_tomography_scan(key):
    """Adaptive tomography (BASELINE config 5) as a compiled episode."""
    basis = pauli_basis(1)
    model = TomographyModel(basis)
    prior = GinibreDistribution(basis)
    effects = []
    for P in [
        np.array([[0.5, 0.5], [0.5, 0.5]]),
        np.array([[0.5, -0.5j], [0.5j, 0.5]]),
        np.array([[1, 0], [0, 0]]),
    ]:
        effects.append(
            np.asarray(
                basis.state_to_modelparams(P.astype(np.complex64)[None])
            )[0]
        )
    cands = {"meas": jnp.asarray(np.stack(effects))}
    perf = qi.perf_test_multiple(
        8, model, 600, prior, 40,
        lambda u: qi.EIGHeuristic(u, model=model, candidates=cands),
        seed=1,
    )
    # Loss (coordinate-space quadratic) decreases substantially.
    med_first = np.median(perf["loss"][:, 0])
    med_last = np.median(perf["loss"][:, -1])
    assert med_last < med_first / 3, (med_first, med_last)
