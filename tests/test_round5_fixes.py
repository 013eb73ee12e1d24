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


# ---------------------------------------------------------------------------
# Round-5 verdict item 4: BASELINE config 5's adaptive loop closed entirely
# on the mesh — design → simulate → update as one scanned episode.
# ---------------------------------------------------------------------------


def _episode_pieces(n=64 * N_DEV, seed=0):
    from qinfer_tpu.smc import SMCConfig, init_smc_state

    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    state = init_smc_state(jax.random.PRNGKey(seed), model, n, prior)
    cand = {"t": jnp.asarray([1.0, 5.0, 11.0, 23.0], jnp.float32)}
    return model, prior, state, cand


def test_sharded_adaptive_episode_matches_single_device():
    """Six adaptive steps (EIG-greedy design → on-device simulation →
    update) run entirely sharded must reproduce the single-device
    trajectory: same chosen experiments, same outcomes, matching
    posterior means (no-resample config isolates determinism)."""
    from qinfer_tpu.parallel import (
        make_particle_mesh,
        make_sharded_adaptive_episode,
        make_sharded_greedy_propose,
        shard_state,
    )
    from qinfer_tpu.smc import (
        SMCConfig,
        expected_information_gain_fn,
        smc_update_step,
    )

    model, prior, state0, cand = _episode_pieces()
    resampler = qi.LiuWestResampler()
    config = SMCConfig(resample_thresh=-1.0)  # update-only: deterministic
    true_mp = jnp.asarray([[0.65]], jnp.float32)
    n_exp = 6

    mesh = make_particle_mesh(N_DEV)
    propose = make_sharded_greedy_propose(mesh, model, cand)
    episode = make_sharded_adaptive_episode(
        mesh, model, resampler, config, propose, true_mp, n_exp
    )
    st_sh, rec = episode(shard_state(state0, mesh), jax.random.PRNGKey(5))

    # Single-device mirror with the IDENTICAL key-split structure.
    state, key = state0, jax.random.PRNGKey(5)
    chosen, means = [], []
    step = jax.jit(smc_update_step, static_argnums=(0, 1, 2))
    for _ in range(n_exp):
        k_prop, k_sim, _k_ts, key = jax.random.split(key, 4)
        score = expected_information_gain_fn(model, state, cand)
        tied = score >= jnp.max(score)
        jitter = jax.random.uniform(k_prop, score.shape)
        best = jnp.argmax(jnp.where(tied, jitter, -1.0))
        ep = {"t": cand["t"][best][None]}
        out = model.simulate_experiment(k_sim, true_mp, ep)[0, 0, 0]
        state, _ = step(model, resampler, config, state, out, ep)
        chosen.append(float(ep["t"][0]))
        w = jnp.exp(state.particle_log_weights
                    - jax.scipy.special.logsumexp(state.particle_log_weights))
        means.append(float(w @ state.particle_locations[:, 0]))

    np.testing.assert_array_equal(
        np.asarray(rec["expparams"]["t"])[:, 0], np.asarray(chosen)
    )
    np.testing.assert_allclose(
        np.asarray(rec["est_mean"])[:, 0], np.asarray(means), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(st_sh.particle_log_weights),
        np.asarray(state.particle_log_weights),
        atol=1e-4,
    )


def test_sharded_adaptive_episode_resampling_converges():
    """The full sharded loop WITH distributed resampling concentrates the
    posterior on the truth (trajectory need not be bit-equal to
    single-device — resample noise is sharding-dependent — but the
    inference must work end-to-end on the mesh)."""
    from qinfer_tpu.parallel import (
        make_particle_mesh,
        make_sharded_adaptive_episode,
        make_sharded_greedy_propose,
        shard_state,
    )
    from qinfer_tpu.smc import SMCConfig

    model, prior, state0, _ = _episode_pieces(n=128 * N_DEV, seed=2)
    cand = {"t": jnp.asarray((9 / 8) ** np.arange(24), jnp.float32)}
    resampler = qi.LiuWestResampler()
    config = SMCConfig(zero_weight_policy="reset")
    true_mp = jnp.asarray([[0.437]], jnp.float32)

    mesh = make_particle_mesh(N_DEV)
    propose = make_sharded_greedy_propose(mesh, model, cand)
    episode = make_sharded_adaptive_episode(
        mesh, model, resampler, config, propose, true_mp, 60
    )
    st, rec = episode(shard_state(state0, mesh), jax.random.PRNGKey(9))
    errs = np.abs(np.asarray(rec["est_mean"])[:, 0] - 0.437)
    assert int(st.n_resamples) > 0
    assert errs[-1] < 0.01, errs[-5:]
    assert errs[-1] < errs[0] / 5


def test_sharded_pgh_episode_converges():
    """PGH's posterior draws route through sharded_sample — the whole
    PGH-driven episode runs on the mesh and converges."""
    from qinfer_tpu.parallel import (
        make_particle_mesh,
        make_sharded_adaptive_episode,
        make_sharded_pgh_propose,
        shard_state,
    )
    from qinfer_tpu.smc import SMCConfig

    model, prior, state0, _ = _episode_pieces(n=128 * N_DEV, seed=3)
    resampler = qi.LiuWestResampler()
    config = SMCConfig(zero_weight_policy="reset")
    true_mp = jnp.asarray([[0.81]], jnp.float32)

    mesh = make_particle_mesh(N_DEV)
    propose = make_sharded_pgh_propose(mesh)
    episode = make_sharded_adaptive_episode(
        mesh, model, resampler, config, propose, true_mp, 60
    )
    st, rec = episode(shard_state(state0, mesh), jax.random.PRNGKey(4))
    errs = np.abs(np.asarray(rec["est_mean"])[:, 0] - 0.81)
    assert errs[-1] < 0.02, errs[-5:]
    assert errs[-1] < errs[0] / 5


def test_fast_normal_moments_and_determinism():
    """The rbg-backed smear noise is standard normal (moments), and the
    threefry-key → rbg-key mapping is deterministic per key and usable
    under vmap (the ensemble harness resamples inside vmapped trials)."""
    from qinfer_tpu.resamplers import fast_normal

    k = jax.random.PRNGKey(3)
    x = np.asarray(fast_normal(k, (1 << 16,)))
    assert abs(x.mean()) < 0.02
    assert abs(x.std() - 1.0) < 0.02
    np.testing.assert_array_equal(
        x, np.asarray(fast_normal(jax.random.PRNGKey(3), (1 << 16,)))
    )
    assert not np.array_equal(
        x, np.asarray(fast_normal(jax.random.PRNGKey(4), (1 << 16,)))
    )
    xb = np.asarray(
        jax.vmap(lambda kk: fast_normal(kk, (256,)))(
            jax.random.split(k, 8)
        )
    )
    assert xb.shape == (8, 256)
    assert len({tuple(r) for r in xb.round(6)}) == 8  # distinct per key


def test_sharded_adaptive_episode_binomial_model():
    """The scanned sharded episode also drives a BinomialModel (vector
    expparams carrying n_meas; data-dependent outcome counts — the
    regression-prone design corner) end-to-end on the mesh."""
    from qinfer_tpu.parallel import (
        make_particle_mesh,
        make_sharded_adaptive_episode,
        make_sharded_greedy_propose,
        shard_state,
    )
    from qinfer_tpu.smc import SMCConfig, init_smc_state

    inner = qi.SimplePrecessionModel()
    model = qi.BinomialModel(inner)
    prior = qi.UniformDistribution([0.0, 1.0])
    n = 128 * N_DEV
    state0 = init_smc_state(jax.random.PRNGKey(11), model, n, prior)
    cand = {
        "t": jnp.asarray((9 / 8) ** np.arange(16), jnp.float32),
        "n_meas": jnp.full((16,), 20.0, jnp.float32),
    }
    resampler = qi.LiuWestResampler()
    config = SMCConfig(zero_weight_policy="reset")
    true_mp = jnp.asarray([[0.55]], jnp.float32)

    mesh = make_particle_mesh(N_DEV)
    propose = make_sharded_greedy_propose(mesh, model, cand)
    episode = make_sharded_adaptive_episode(
        mesh, model, resampler, config, propose, true_mp, 40
    )
    st, rec = episode(shard_state(state0, mesh), jax.random.PRNGKey(12))
    errs = np.abs(np.asarray(rec["est_mean"])[:, 0] - 0.55)
    assert np.isfinite(np.asarray(rec["log_norm"])).all()
    # The candidate pool caps t at (9/8)^15 ≈ 5.9, limiting resolution —
    # assert improvement over the early window, not a tight floor (the
    # first-step error is itself a lucky draw and a bad anchor).
    assert errs[-1] < 0.02, errs[-5:]
    assert np.mean(errs[-5:]) < np.max(errs[:5]) / 2


def test_fisher_finite_at_likelihood_boundaries():
    """The BCRB Fisher accumulation must stay finite when a particle sits
    exactly on a likelihood zero (cos² = 0) or a probability boundary
    (p ∈ {0, 1} in the binomial pmf): the score's 0/0 there is masked
    and xlogy/xlog1py get autodiff-safe operands."""
    from qinfer_tpu.utils import log_binomial_pdf

    # Direct: jacfwd of the binomial log-pmf at p ∈ {0, 1} is finite.
    g = jax.jacfwd(lambda p: log_binomial_pdf(10.0, 0.0, p))(jnp.float32(0.0))
    assert np.isfinite(float(g)), g  # d/dp [10·log1p(−p)] = −10
    np.testing.assert_allclose(float(g), -10.0, rtol=1e-5)
    g1 = jax.jacfwd(lambda p: log_binomial_pdf(10.0, 10.0, p))(
        jnp.float32(1.0))
    assert np.isfinite(float(g1)), g1  # d/dp [10·log p] = 10
    np.testing.assert_allclose(float(g1), 10.0, rtol=1e-5)
    # Values at the boundaries are log(1) up to the f32 gammaln
    # coefficient rounding.
    assert abs(float(log_binomial_pdf(10.0, 0.0, 0.0))) < 1e-5
    assert abs(float(log_binomial_pdf(10.0, 10.0, 1.0))) < 1e-5

    # End-to-end: a particle bank CONTAINING likelihood zeros still
    # accumulates a finite Bayesian information matrix.
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    u = qi.SMCUpdaterBCRB(model, 256, prior, seed=0)
    # Force a particle exactly on cos(ω t/2) = 0 for t = π/ω with ω = 0.5.
    locs = u.state.particle_locations.at[0, 0].set(0.5)
    u.state = u.state._replace(particle_locations=locs)
    ep = {"t": jnp.array([2.0 * np.pi / 1.0], jnp.float32)}
    # ω=0.5, t=2π ⇒ cos(π/2·…)… use t with ω·t = π exactly: t = 2π.
    u.update(jnp.int32(1), ep)
    assert np.isfinite(np.asarray(u.current_bim)).all()

    bu = qi.BinomialModel(model)
    ub = qi.SMCUpdaterBCRB(bu, 256, prior, seed=2)
    locs = ub.state.particle_locations.at[0, 0].set(0.5)
    ub.state = ub.state._replace(particle_locations=locs)
    epb = {"t": jnp.array([2.0 * np.pi], jnp.float32),
           "n_meas": jnp.array([10.0], jnp.float32)}
    ub.update(jnp.int32(3), epb)
    assert np.isfinite(np.asarray(ub.current_bim)).all()
