"""Real-TPU kernel equality tests (round-2 verdict item 4).

The CI suite exercises the Pallas kernels in interpret mode on CPU, which
would not catch Mosaic lowering bugs (e.g. the round-1 silent f32→bf16
MXU rounding class). This module asserts fused-update and expand-kernel
equality against the XLA path ON THE CHIP, plus the bf16-plane exactness
invariant. It is skipped unless the backend is really a TPU:

    QINFER_TPU_TESTS=tpu timeout 590 /opt/venv/bin/python -m pytest \
        tests/test_tpu_only.py -q -k "not ensemble and not conjugate"
    QINFER_TPU_TESTS=tpu timeout 590 /opt/venv/bin/python -m pytest \
        tests/test_tpu_only.py -q -k "conjugate"
    QINFER_TPU_TESTS=tpu timeout 590 /opt/venv/bin/python -m pytest \
        tests/test_tpu_only.py -q -k "ensemble"

(conftest.py forces the CPU backend unless QINFER_TPU_TESTS=tpu; see
.claude/skills/verify/SKILL.md. Run in the three slices above — the
ensemble episode-scan AOT compile and the 300-step conjugate gate each
take ~5-8 min on the relay, so the whole module exceeds one 10-minute
timeout.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="real-TPU only (set QINFER_TPU_TESTS=tpu to enable)",
)


@pytest.mark.parametrize("n", [1 << 17, 1 << 20])
def test_fused_update_on_chip_matches_xla(n):
    import qinfer_tpu as qi
    from qinfer_tpu.smc import SMCConfig, init_smc_state, smc_update_step

    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    rs = qi.LiuWestResampler()
    st0 = init_smc_state(jax.random.PRNGKey(0), model, n, prior)
    ep = {"t": jnp.array([5.0], jnp.float32)}
    cfg_x = SMCConfig(zero_weight_policy="reset", resample_thresh=-1.0,
                      use_fused_update=False)
    cfg_f = SMCConfig(zero_weight_policy="reset", resample_thresh=-1.0,
                      use_fused_update=True)
    st_x, ln_x = jax.jit(smc_update_step)(model, rs, cfg_x, st0,
                                          jnp.int32(1), ep)
    st_f, ln_f = jax.jit(smc_update_step)(model, rs, cfg_f, st0,
                                          jnp.int32(1), ep)
    np.testing.assert_allclose(float(ln_x), float(ln_f), atol=2e-4)
    lw_x = np.asarray(st_x.particle_log_weights)
    lw_f = np.asarray(st_f.particle_log_weights)
    # Log-weights agree wherever the weight is non-negligible; at the
    # pr ≈ 1e-8 probability floor BOTH paths are f32 cancellation noise
    # (log1p(−pr0) vs log(1−pr0) — measured on-chip: ~0.01% of particles,
    # each carrying < e⁻²⁰ of the posterior mass), so the tail is
    # compared on the weight scale instead.
    mass = lw_x > lw_x.max() - 20.0
    np.testing.assert_allclose(lw_f[mass], lw_x[mass], atol=2e-3)
    np.testing.assert_allclose(np.exp(lw_f), np.exp(lw_x), atol=1e-8)
    np.testing.assert_allclose(
        float(st_x.min_n_ess), float(st_f.min_n_ess), rtol=1e-3
    )


@pytest.mark.parametrize("n,d", [(1 << 17, 1), (1 << 20, 1), (1 << 18, 4),
                                 (1 << 18, 16)])  # d=16: 2-qubit tomography
def test_expand_kernel_on_chip_exact(n, d):
    """The Mosaic-lowered expand pick must be EXACTLY values[idx]."""
    from qinfer_tpu.ops.resample_expand import systematic_expand
    from qinfer_tpu.resamplers import systematic_resample_indices

    k1, k2, key = jax.random.split(jax.random.PRNGKey(7), 3)
    lw = jnp.log(jax.random.uniform(k1, (n,)) + 0.02)
    lw = lw - jax.scipy.special.logsumexp(lw)
    vals = jax.random.normal(k2, (n, d))
    out = np.asarray(systematic_expand(key, lw, vals))
    idx = np.asarray(systematic_resample_indices(key, lw))
    np.testing.assert_array_equal(out, np.asarray(vals)[idx])


def test_bf16_plane_split_exact_on_chip():
    """x == p1 + p2 + p3 bit-exactly — the invariant every MXU select in
    the expand kernel relies on. The Veltkamp split is three dependent
    f32 mul/subs; the compiler must NOT algebraically fold
    C·x − (C·x − x) back to x (this asserts the compiled result, not the
    tracer)."""
    from qinfer_tpu.ops.resample_expand import _split_planes

    k = jax.random.PRNGKey(3)
    # Scales the kernel actually sees: O(1) coordinates, huge and small
    # magnitudes, and exact integers (segment starts). |x| ≲ 1e-30 is
    # excluded by design — the third plane's residual underflows bf16
    # there (documented caveat on _split_planes; measured on-chip).
    x = jnp.concatenate([
        jax.random.normal(k, (1 << 16,)),
        jax.random.normal(jax.random.fold_in(k, 1), (1 << 16,)) * 1e30,
        jax.random.normal(jax.random.fold_in(k, 2), (1 << 16,)) * 1e-15,
        jnp.arange(1 << 16, dtype=jnp.float32),  # exact integers (starts)
    ])

    @jax.jit
    def recon(x):
        p1, p2, p3 = _split_planes(x)
        return (p1.astype(jnp.float32) + p2.astype(jnp.float32)
                + p3.astype(jnp.float32))

    np.testing.assert_array_equal(np.asarray(recon(x)), np.asarray(x))


def test_conjugate_beta_posterior_on_chip():
    """End-to-end numerical gate at full width on the chip: CoinModel +
    uniform prior after 300 Bernoulli outcomes must match the analytic
    Beta posterior within Monte-Carlo error — through the deployed
    configuration (fused update + expand-kernel resamples at 2^20)."""
    import qinfer_tpu as qi
    from qinfer_tpu.smc import SMCConfig, init_smc_state, smc_batch_update

    n = 1 << 20
    n_exp = 300
    p_true = 0.37
    rng = np.random.default_rng(0)
    outcomes = (rng.random(n_exp) < p_true).astype(np.int32)
    k = int(outcomes.sum())

    model = qi.CoinModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    state = init_smc_state(jax.random.PRNGKey(1), model, n, prior)
    config = SMCConfig(zero_weight_policy="reset")
    eps = {"dummy": jnp.zeros((n_exp,), jnp.float32)}
    state, _ = jax.jit(smc_batch_update)(
        model, qi.LiuWestResampler(), config, state,
        jnp.asarray(outcomes), eps,
    )
    assert int(state.n_resamples) > 0  # expand kernel actually exercised

    w = np.asarray(jnp.exp(state.particle_log_weights), np.float64)
    locs = np.asarray(state.particle_locations[:, 0], np.float64)
    mean = w @ locs
    var = w @ (locs - mean) ** 2
    a, b = 1 + k, 1 + n_exp - k
    mean_ref = a / (a + b)
    var_ref = a * b / ((a + b) ** 2 * (a + b + 1))
    # Liu–West resampling adds O(1/sqrt(ESS)) Monte-Carlo noise on top of
    # the analytic posterior; 4 posterior-sd tolerance on the mean and
    # 15% on the variance hold with huge margin at 2^20 particles.
    assert abs(mean - mean_ref) < 4 * np.sqrt(var_ref)
    assert abs(var - var_ref) < 0.15 * var_ref


def test_vmapped_ensemble_smoke_on_chip():
    """perf_test_multiple must lower and run on the chip. Since round 4
    the Pallas kernels carry custom_vmap rules, so the vmapped episode
    scan keeps the engine defaults: at this (small) bank size the rules
    route to the vectorized XLA equivalent — this asserts the default
    ensemble path still lowers and converges."""
    import qinfer_tpu as qi

    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    perf = qi.perf_test_multiple(8, model, 1024, prior, 20, qi.PGH, seed=2)
    med = np.median(perf["loss"], axis=0)
    assert med[-1] < med[0]


def test_vmapped_big_bank_kernels_on_chip():
    """Big-bank ensemble with BOTH Pallas kernels forced on under vmap
    (round-3 verdict item 4): the custom_vmap rules must lower on the
    chip (fused update lax.maps the kernel over trials at n ≥ 2^17; the
    expand pick sequential-vmaps) and the chains must converge."""
    import qinfer_tpu as qi

    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    perf = qi.perf_test_multiple(
        2, model, 1 << 17, prior, 12, qi.PGH, seed=3,
        resampler=qi.LiuWestResampler(use_expand_kernel=True),
        extra_updater_args={"use_fused_update": True},
    )
    assert np.isfinite(perf["loss"]).all()
    med = np.median(perf["loss"], axis=0)
    assert med[-1] < med[0]


def test_fused_zoo_spot_on_chip():
    """One non-trivial zoo member (binomial-wrapped RB) through the fused
    route on the chip."""
    import qinfer_tpu as qi
    from qinfer_tpu.smc import SMCConfig, init_smc_state, smc_update_step

    model = qi.BinomialModel(qi.rb.RandomizedBenchmarkingModel())
    prior = qi.UniformDistribution([[0.8, 1.0], [0.2, 0.5], [0.3, 0.5]])
    rs = qi.LiuWestResampler()
    st0 = init_smc_state(jax.random.PRNGKey(3), model, 1 << 17, prior)
    ep = {"m": jnp.array([16], jnp.int32),
          "n_meas": jnp.array([300], jnp.int32)}
    cfg_x = SMCConfig(zero_weight_policy="reset", resample_thresh=-1.0,
                      use_fused_update=False)
    cfg_f = SMCConfig(zero_weight_policy="reset", resample_thresh=-1.0,
                      use_fused_update=True)
    st_x, ln_x = jax.jit(smc_update_step)(model, rs, cfg_x, st0,
                                          jnp.int32(210), ep)
    st_f, ln_f = jax.jit(smc_update_step)(model, rs, cfg_f, st0,
                                          jnp.int32(210), ep)
    np.testing.assert_allclose(float(ln_x), float(ln_f), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(st_x.particle_log_weights),
        np.asarray(st_f.particle_log_weights), atol=5e-3,
    )
