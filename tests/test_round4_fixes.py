"""Round-4 verdict items: sharded update_timestep, sharded Bayes risk /
EIG, PGH bounded collision redraw, vmap batching rules for the Pallas
kernels.

VERDICT.md (round 3) items 2, 3, 4, 7.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qinfer_tpu as qi
from qinfer_tpu.parallel import (
    make_particle_mesh,
    make_sharded_expdesign,
    make_sharded_update_step,
    shard_state,
)
from qinfer_tpu.smc import (
    SMCConfig,
    bayes_risk_fn,
    expected_information_gain_fn,
    init_smc_state,
    smc_update_step,
)

N_DEV = 8
N = 64 * N_DEV


@pytest.fixture
def mesh():
    assert len(jax.devices()) >= N_DEV
    return make_particle_mesh(N_DEV)


# ---------------------------------------------------------------------------
# Item 2: update_timestep in the sharded step
# ---------------------------------------------------------------------------

def test_sharded_update_timestep_gaussian_random_walk(mesh):
    """GaussianRandomWalkModel under the shard_map step must follow the
    single-device trajectory bit-for-bit (locations; the weight
    normalization merges shard reductions, so weights match to f32
    reduction-order tolerance). Reference: ``abstract_model.py —
    Simulatable.update_timestep`` applied every update."""
    model = qi.GaussianRandomWalkModel(
        qi.SimplePrecessionModel(), diagonal=True
    )
    prior = qi.UniformDistribution([[0.0, 1.0], [0.001, 0.05]])
    state = init_smc_state(jax.random.PRNGKey(7), model, N, prior)
    resampler = qi.LiuWestResampler()
    config = SMCConfig(resample_thresh=-1.0, zero_weight_policy="reset")
    step = jax.jit(make_sharded_update_step(mesh, model, resampler, config))
    single = jax.jit(smc_update_step)

    st_s, st_m = state, shard_state(state, mesh)
    for i in range(4):
        ep = {"t": jnp.array([0.5 + i], jnp.float32)}
        out = jnp.int32(i % 2)
        st_s, _ = single(model, resampler, config, st_s, out, ep)
        st_m, _ = step(st_m, out, ep)

    locs_s = np.asarray(st_s.particle_locations)
    locs_m = np.asarray(st_m.particle_locations)
    # The diffusion must have moved the cloud (regression guard: round 3's
    # sharded step silently dropped update_timestep).
    assert not np.array_equal(locs_s, np.asarray(state.particle_locations))
    np.testing.assert_array_equal(locs_m, locs_s)
    np.testing.assert_allclose(
        np.asarray(st_m.particle_log_weights),
        np.asarray(st_s.particle_log_weights), atol=1e-5,
    )
    # Keys advanced identically (the split order matches smc_update_step).
    np.testing.assert_array_equal(
        np.asarray(st_m.key), np.asarray(st_s.key)
    )


def test_sharded_update_timestep_diffusive_tomography(mesh):
    """DiffusiveTomographyModel (diffusion + physicality projection) on
    the 8-device mesh matches the single-device trajectory bit-for-bit."""
    from qinfer_tpu.tomography import (
        DiffusiveTomographyModel,
        GinibreDistribution,
        pauli_basis,
    )

    basis = pauli_basis(1)
    model = DiffusiveTomographyModel(basis)
    gin = GinibreDistribution(basis)
    x = gin.sample(jax.random.PRNGKey(2), N)
    locs = jnp.concatenate(
        [jnp.asarray(x, jnp.float32), 0.05 * jnp.ones((N, 1), jnp.float32)],
        axis=1,
    )
    placeholder = qi.UniformDistribution([[0.0, 1.0]] * model.n_modelparams)
    state = init_smc_state(
        jax.random.PRNGKey(3), model, N, placeholder
    )._replace(particle_locations=locs)

    meas = jnp.asarray(
        np.asarray(
            basis.state_to_modelparams(
                np.array([[1, 0], [0, 0]], dtype=np.complex64)[None]
            )
        ),
        jnp.float32,
    )
    ep = {"meas": meas, "t": jnp.array([1.0], jnp.float32)}
    resampler = qi.LiuWestResampler()
    config = SMCConfig(resample_thresh=-1.0, zero_weight_policy="reset")
    step = jax.jit(make_sharded_update_step(mesh, model, resampler, config))
    single = jax.jit(smc_update_step)

    st_s, st_m = state, shard_state(state, mesh)
    for i in range(3):
        st_s, _ = single(model, resampler, config, st_s, jnp.int32(i % 2), ep)
        st_m, _ = step(st_m, jnp.int32(i % 2), ep)

    np.testing.assert_array_equal(
        np.asarray(st_m.particle_locations),
        np.asarray(st_s.particle_locations),
    )
    # Evolved clouds stay physical.
    assert np.asarray(
        model.are_models_valid(st_m.particle_locations)
    ).all()


def test_sharded_update_timestep_with_resample(mesh):
    """Time-dependence composes with the distributed resample: the
    resample fires, and the post-step cloud is both diffused and valid."""
    model = qi.GaussianRandomWalkModel(
        qi.SimplePrecessionModel(), diagonal=True
    )
    prior = qi.UniformDistribution([[0.0, 1.0], [0.001, 0.05]])
    state = init_smc_state(jax.random.PRNGKey(11), model, N, prior)
    skew = jnp.linspace(0.0, 3.0, N)
    state = state._replace(
        particle_log_weights=skew - jax.scipy.special.logsumexp(skew)
    )
    resampler = qi.LiuWestResampler()
    config = SMCConfig(resample_thresh=1.1, zero_weight_policy="reset")
    step = jax.jit(make_sharded_update_step(mesh, model, resampler, config))
    ep = {"t": jnp.array([0.5], jnp.float32)}
    st, _ = step(shard_state(state, mesh), jnp.int32(0), ep)
    assert int(st.n_resamples) == 1
    locs = np.asarray(st.particle_locations)
    assert np.isfinite(locs).all()
    # Sigma columns survive the walk (only base params diffuse).
    assert (locs[:, 1] >= 0).all()


# ---------------------------------------------------------------------------
# Item 3: sharded Bayes risk / EIG
# ---------------------------------------------------------------------------

def _nontrivial_state(model, prior, seed):
    state = init_smc_state(jax.random.PRNGKey(seed), model, N, prior)
    skew = jnp.sin(jnp.arange(N) * 0.37) * 1.5
    return state._replace(
        particle_log_weights=skew - jax.scipy.special.logsumexp(skew)
    )


def test_sharded_expdesign_streaming_precession(mesh):
    """Streaming-pr1 path (SimplePrecessionModel): sharded risk/EIG ==
    single-device to f32 reduction tolerance."""
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    state = _nontrivial_state(model, prior, 31)
    eps = {"t": jnp.linspace(1.0, 12.0, 5).astype(jnp.float32)}

    risk_fn, eig_fn = make_sharded_expdesign(mesh, model)
    ref_risk = np.asarray(bayes_risk_fn(model, state, eps))
    ref_eig = np.asarray(expected_information_gain_fn(model, state, eps))

    sh = shard_state(state, mesh)
    got_risk = np.asarray(risk_fn(sh, eps))
    got_eig = np.asarray(eig_fn(sh, eps))
    assert got_risk.shape == (5,) and got_eig.shape == (5,)
    np.testing.assert_allclose(got_risk, ref_risk, rtol=1e-4, atol=1e-8)
    np.testing.assert_allclose(got_eig, ref_eig, rtol=1e-4, atol=1e-6)
    # And it must be jittable (episode-scan usable).
    got_jit = np.asarray(jax.jit(lambda st: eig_fn(st, eps))(sh))
    np.testing.assert_allclose(got_jit, ref_eig, rtol=1e-4, atol=1e-6)


def test_sharded_expdesign_general_binomial(mesh):
    """General (hypothetical-update) path via BinomialModel's
    data-dependent outcome set: psum-merged einsums == single-device."""
    model = qi.BinomialModel(qi.SimplePrecessionModel())
    prior = qi.UniformDistribution([0.0, 1.0])
    state = _nontrivial_state(model, prior, 32)
    eps = {
        "t": jnp.array([2.0, 5.0, 9.0], jnp.float32),
        "n_meas": jnp.array([10, 10, 10], jnp.int32),
    }
    outcomes = model.all_outcomes(eps)

    risk_fn, eig_fn = make_sharded_expdesign(mesh, model)
    ref_risk = np.asarray(
        bayes_risk_fn(model, state, eps, None, outcomes)
    )
    ref_eig = np.asarray(
        expected_information_gain_fn(model, state, eps, outcomes)
    )
    sh = shard_state(state, mesh)
    np.testing.assert_allclose(
        np.asarray(risk_fn(sh, eps)), ref_risk, rtol=2e-4, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(eig_fn(sh, eps)), ref_eig, rtol=2e-4, atol=1e-6
    )


def test_sharded_expdesign_tomography(mesh):
    """BASELINE config 5's adaptive design scores on a sharded bank:
    TomographyModel risk/EIG match single-device (streaming Born path)."""
    from qinfer_tpu.tomography import (
        GinibreDistribution,
        TomographyModel,
        pauli_basis,
    )

    basis = pauli_basis(1)
    model = TomographyModel(basis)
    gin = GinibreDistribution(basis)
    state = init_smc_state(
        jax.random.PRNGKey(5), model, N,
        qi.UniformDistribution([[0.0, 1.0]] * model.n_modelparams),
    )._replace(
        particle_locations=jnp.asarray(
            gin.sample(jax.random.PRNGKey(6), N), jnp.float32
        )
    )

    cands = []
    for proj in [
        np.array([[0.5, 0.5], [0.5, 0.5]]),
        np.array([[0.5, -0.5j], [0.5j, 0.5]]),
        np.array([[1, 0], [0, 0]]),
    ]:
        cands.append(
            np.asarray(
                basis.state_to_modelparams(proj.astype(np.complex64)[None])
            )[0]
        )
    eps = {"meas": jnp.asarray(np.stack(cands), jnp.float32)}

    risk_fn, eig_fn = make_sharded_expdesign(mesh, model)
    ref_risk = np.asarray(bayes_risk_fn(model, state, eps))
    ref_eig = np.asarray(expected_information_gain_fn(model, state, eps))
    sh = shard_state(state, mesh)
    np.testing.assert_allclose(
        np.asarray(risk_fn(sh, eps)), ref_risk, rtol=2e-4, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(eig_fn(sh, eps)), ref_eig, rtol=2e-4, atol=1e-6
    )
    assert (np.asarray(eig_fn(sh, eps)) > 0).all()


# ---------------------------------------------------------------------------
# Item 7: PGH bounded collision redraw
# ---------------------------------------------------------------------------

def _two_cluster_state(n=256):
    """Half the cloud at ω=0.3, half at ω=0.7 — exact-duplicate-heavy
    (collision probability 1/2 per pair draw)."""
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    state = init_smc_state(jax.random.PRNGKey(0), model, n, prior)
    locs = jnp.where(
        (jnp.arange(n) < n // 2)[:, None], 0.3, 0.7
    ).astype(jnp.float32)
    return state._replace(particle_locations=locs)


def test_pgh_collision_redraw_engages():
    """With a duplicate-heavy cloud, the bounded redraw makes the
    epsilon-floor fallback (t = 1e12) vanish: every proposal lands on the
    distinct pair. Reference: ``heuristics.py — PGH.__call__``'s
    redraw-until-distinct loop (maxiters)."""
    state = _two_cluster_state()
    core = qi.PGH(None).core
    n_keys = 200
    ts = []
    for i in range(n_keys):
        ep = jax.jit(core.propose)(
            jax.random.PRNGKey(100 + i), state, jnp.int32(0)
        )
        ts.append(float(ep["t"][0]))
    ts = np.asarray(ts)
    # Distinct pair distance is |0.7 − 0.3| = 0.4 → t = 2.5 always.
    # (without redraw, ~50% of draws would collide and hit t = 1e12).
    np.testing.assert_allclose(ts, 2.5, rtol=1e-5)


def test_pgh_all_duplicates_falls_back_to_floor():
    """A fully-collapsed cloud exhausts maxiters and lands on the epsilon
    floor (bounded — never an infinite loop, never NaN/inf)."""
    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    state = init_smc_state(jax.random.PRNGKey(0), model, 64, prior)
    state = state._replace(
        particle_locations=jnp.full((64, 1), 0.5, jnp.float32)
    )
    core = qi.PGH(None).core
    ep = jax.jit(core.propose)(jax.random.PRNGKey(1), state, jnp.int32(0))
    t = float(ep["t"][0])
    assert np.isfinite(t)
    np.testing.assert_allclose(t, 1.0 / core.eps_dist, rtol=1e-5)


# ---------------------------------------------------------------------------
# Item 4: vmap batching rules for the Pallas kernels
# ---------------------------------------------------------------------------

def test_fused_update_vmap_small_bank_matches_xla():
    """Small banks under vmap take the vectorized XLA-equivalent rule —
    results must match the engine's plain XLA update path exactly (same
    elementwise math, same reductions)."""
    from qinfer_tpu.ops.fused_update import (
        fused_bayes_update,
        precession_tile_fn,
    )

    n, b = 2048, 5
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    log_w = jax.random.normal(k1, (b, n)) * 0.3
    log_w = log_w - jax.scipy.special.logsumexp(log_w, axis=1, keepdims=True)
    omega = jax.random.uniform(k2, (b, n))
    scalars = jnp.stack(
        [jnp.arange(b) % 2, jnp.linspace(1.0, 9.0, b)], axis=1
    ).astype(jnp.float32)

    def one(scal, lw, om):
        return fused_bayes_update(
            precession_tile_fn, scal, lw, (om,), interpret=True
        )

    lw_v, ln_v, ess_v = jax.vmap(one)(scalars, log_w, omega)

    for i in range(b):
        c = jnp.cos(0.5 * omega[i] * scalars[i, 1])
        pr0 = c * c
        pr = jnp.where(scalars[i, 0] == 0.0, pr0, 1.0 - pr0)
        lw_ref = log_w[i] + jnp.maximum(jnp.log(jnp.clip(pr, 1e-35)), -87.0)
        ln_ref = jax.scipy.special.logsumexp(lw_ref)
        np.testing.assert_allclose(
            np.asarray(lw_v[i]), np.asarray(lw_ref - ln_ref), atol=1e-5
        )
        np.testing.assert_allclose(float(ln_v[i]), float(ln_ref), atol=1e-5)
        w = jnp.exp(lw_ref - ln_ref)
        np.testing.assert_allclose(
            float(ess_v[i]), float(1.0 / jnp.sum(w * w)), rtol=1e-4
        )


def test_fused_update_vmap_big_bank_maps_kernel():
    """Banks ≥ the crossover run the kernel per batch element (lax.map) —
    results must equal per-trial unbatched kernel calls exactly."""
    from qinfer_tpu.ops.fused_update import (
        _VMAP_KERNEL_MIN_N,
        fused_bayes_update,
        precession_tile_fn,
    )

    n, b = _VMAP_KERNEL_MIN_N, 2
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    log_w = jnp.zeros((b, n)) - jnp.log(float(n))
    omega = jax.random.uniform(k2, (b, n))
    scalars = jnp.asarray([[1.0, 3.0], [0.0, 7.0]], jnp.float32)

    def one(scal, lw, om):
        return fused_bayes_update(
            precession_tile_fn, scal, lw, (om,), interpret=True
        )

    lw_v, ln_v, ess_v = jax.vmap(one)(scalars, log_w, omega)
    for i in range(b):
        lw_i, ln_i, ess_i = one(scalars[i], log_w[i], omega[i])
        np.testing.assert_array_equal(np.asarray(lw_v[i]), np.asarray(lw_i))
        assert float(ln_v[i]) == float(ln_i)
        assert float(ess_v[i]) == float(ess_i)


def test_expand_kernel_vmap_matches_per_trial():
    """sequential_vmap rule for the expand pick: vmapped call == stacked
    per-trial calls, bit-exactly."""
    from qinfer_tpu.ops.resample_expand import systematic_expand

    n, b, d = 4096, 3, 2
    keys = jax.random.split(jax.random.PRNGKey(5), b)
    lw = jax.random.normal(jax.random.PRNGKey(6), (b, n))
    lw = lw - jax.scipy.special.logsumexp(lw, axis=1, keepdims=True)
    vals = jax.random.normal(jax.random.PRNGKey(7), (b, n, d))

    batched = jax.vmap(
        lambda k, w, v: systematic_expand(k, w, v, interpret=True)
    )(keys, lw, vals)
    for i in range(b):
        single = systematic_expand(keys[i], lw[i], vals[i], interpret=True)
        np.testing.assert_array_equal(
            np.asarray(batched[i]), np.asarray(single)
        )


def test_perf_multiple_keeps_engine_defaults():
    """perf_test_multiple no longer forces the kernels off: the config it
    builds carries use_fused_update=None (auto) and the default resampler
    auto-gates — and the ensemble still runs end-to-end on CPU."""
    from qinfer_tpu.perf_testing import perf_test_multiple

    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    perf = perf_test_multiple(3, model, 256, prior, 8, qi.PGH, seed=9)
    assert perf.shape == (3, 8)
    assert np.isfinite(perf["loss"]).all()


def test_pgh_redraw_scannable():
    """The redrawing PGH core still traces inside a jitted episode scan
    (the perf harness path) — while_loop under scan under jit."""
    from qinfer_tpu.perf_testing import perf_test_multiple

    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    perf = perf_test_multiple(
        4, model, 200, prior, 12, qi.PGH, seed=5
    )
    assert perf.shape == (4, 12)
    assert np.isfinite(perf["loss"]).all()
    # Losses shrink: the heuristic still steers.
    assert np.median(perf["loss"][:, -1]) < np.median(perf["loss"][:, 0])
