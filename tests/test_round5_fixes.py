"""Round-5 verdict fixes: deterministic tie/key hygiene.

- ``_UtilityGreedyCore.propose`` consumes its PRNG key: EXACT utility ties
  are broken uniformly at random, never by candidate order (reference
  parity: ``expdesign.py — ExperimentDesigner.design_expparams_field``
  perturbs candidate guesses rather than biasing toward index 0).
- ``sharded_sample`` breaks cross-shard Gumbel-max ties by lowest shard
  id so the psum never double-counts a duplicated particle.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qinfer_tpu as qi
from qinfer_tpu.parallel import make_particle_mesh, sharded_sample

N_DEV = 8


def _updater(n=512, seed=0):
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    return model, qi.SMCUpdater(model, n, prior, seed=seed)


def test_greedy_core_breaks_exact_ties_with_key():
    """Duplicate candidates (t and −t have bitwise-equal likelihoods under
    cos²) must not always lose to the first candidate: over many keys the
    chosen sign is split roughly evenly."""
    model, u = _updater()
    t0 = 7.0
    cands = {"t": jnp.asarray([t0, -t0], jnp.float32)}
    core = qi.EIGHeuristic(u, model=model, candidates=cands).core

    # Precondition: the scores really are an exact tie.
    from qinfer_tpu.smc import expected_information_gain_fn

    score = expected_information_gain_fn(model, u.state, {"t": cands["t"]})
    assert float(score[0]) == float(score[1])

    picks = []
    for s in range(40):
        ep = core.propose(jax.random.PRNGKey(s), u.state, 0)
        picks.append(float(ep["t"][0]))
    picks = np.asarray(picks)
    assert set(np.unique(picks)) == {t0, -t0}
    frac = (picks == t0).mean()
    assert 0.2 < frac < 0.8, frac


def test_greedy_core_untied_argmax_is_key_independent():
    """Jitter ranks only within the tie set — distinct scores pick the
    true argmax for every key."""
    model, u = _updater(seed=4)
    cands = {"t": jnp.asarray([0.1, 11.0, 2.0], jnp.float32)}
    core = qi.EIGHeuristic(u, model=model, candidates=cands).core

    from qinfer_tpu.smc import expected_information_gain_fn

    score = np.asarray(
        expected_information_gain_fn(model, u.state, {"t": cands["t"]})
    )
    assert len(np.unique(score)) == 3  # genuinely untied
    want = float(np.asarray(cands["t"])[int(score.argmax())])
    for s in range(10):
        ep = core.propose(jax.random.PRNGKey(s), u.state, 0)
        assert float(ep["t"][0]) == want


def test_sharded_sample_tie_no_double_count(monkeypatch):
    """With Gumbel noise forced to zero and a bank duplicated across every
    shard, all shards tie on the max score; the psum must still return the
    particle VALUE, not shards× the value."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    assert len(jax.devices()) >= N_DEV
    mesh = make_particle_mesh(N_DEV)

    monkeypatch.setattr(
        jax.random, "gumbel", lambda k, shape, dtype=jnp.float32: jnp.zeros(
            shape, dtype
        )
    )

    per = 16
    n = per * N_DEV
    # Identical weights everywhere; particle 3 of each shard dominates.
    w_shard = np.full(per, 1e-6)
    w_shard[3] = 1.0
    w = np.tile(w_shard, N_DEV)
    log_w = jnp.log(jnp.asarray(w / w.sum(), jnp.float32))
    locs = jnp.asarray(np.tile(np.arange(per, dtype=np.float32), N_DEV))[
        :, None
    ]

    samp = jax.jit(
        shard_map(
            partial(sharded_sample, n=32, axis_name="particles"),
            mesh=mesh,
            in_specs=(P(), P("particles"), P("particles")),
            out_specs=P(),
            check_vma=False,
        )
    )(jax.random.PRNGKey(7), log_w, locs)
    vals = np.asarray(samp)[:, 0]
    # Every shard's argmax is local particle 3 (value 3.0); a double-count
    # would yield 3.0 × k for k winning shards (up to 24.0).
    np.testing.assert_array_equal(vals, np.full(32, 3.0))
