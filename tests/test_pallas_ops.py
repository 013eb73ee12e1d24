"""Pallas kernel tests (interpret mode on CPU).

The expand kernel is the resampler's TPU hot path; the fused-update
kernel is the §2.16 gpu_models parity mechanism. Both are validated
against their XLA/numpy definitions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.special import logsumexp

import qinfer_tpu as qi
from qinfer_tpu.models.accelerated import AcceleratedPrecessionModel
from qinfer_tpu.ops.fused_update import fused_bayes_update, precession_tile_fn
from qinfer_tpu.ops.resample_expand import (
    expand_sorted_segments,
    systematic_expand,
)
from qinfer_tpu.resamplers import systematic_resample_indices


@pytest.mark.parametrize("n", [257, 1000, 5000, 16384, 16385, 40000])
def test_expand_matches_searchsorted(n, key):
    rng = np.random.default_rng(n)
    w = rng.random(n) ** 3
    w /= w.sum()
    t = np.ceil(n * np.cumsum(w) - 0.37).astype(np.int32)
    starts = np.maximum.accumulate(
        np.maximum(np.concatenate([[0], t[:-1]]), 0)
    )
    vals = rng.standard_normal(n).astype(np.float32)
    out = np.asarray(
        expand_sorted_segments(jnp.asarray(starts), jnp.asarray(vals),
                               interpret=True)
    )
    idx = np.searchsorted(starts, np.arange(n), side="right") - 1
    np.testing.assert_array_equal(out, vals[idx])


def test_expand_degenerate_weights(key):
    n = 512
    starts = np.zeros(n, np.int32)  # all mass on particle n-1… wait:
    # starts all zero means particle j covers [0, t_j) with t_0 = … choose
    # the true degenerate case: all strata covered by particle 17.
    starts = np.full(n, n, np.int32)
    starts[: 18] = 0  # particles 0..17 start at 0; 17 covers everything
    vals = np.arange(n, dtype=np.float32)
    out = np.asarray(
        expand_sorted_segments(jnp.asarray(starts), jnp.asarray(vals),
                               interpret=True)
    )
    np.testing.assert_array_equal(out, np.full(n, 17.0))


def test_systematic_expand_multicolumn(key):
    n = 2048
    rng = np.random.default_rng(1)
    w = rng.random(n)
    w /= w.sum()
    log_w = jnp.log(jnp.asarray(w, jnp.float32))
    vals = jnp.asarray(rng.standard_normal((n, 3)), jnp.float32)
    out = np.asarray(systematic_expand(key, log_w, vals, interpret=True))
    idx = np.asarray(systematic_resample_indices(key, log_w))
    np.testing.assert_array_equal(out, np.asarray(vals)[idx])


@pytest.mark.parametrize(
    "heavy_at", [0, 8191, 8192, 9000, 16383, 16384, 24000, 24570]
)
def test_expand_extreme_skew(heavy_at, key):
    """One particle holds ~all mass → the kernel's window-advance loop must
    skip zero-coverage chunks in a single subtile (and resume correctly
    afterwards). heavy_at = 8191/16383 put the covering particle exactly at
    a chunk's last slot, exercising the boundary-carry path."""
    n = 24571  # several grid steps, ragged tail, 3 chunks
    w = np.full(n, 1e-9)
    w[heavy_at] = 1.0
    w /= w.sum()
    t = np.ceil(n * np.cumsum(w) - 0.5).astype(np.int64)
    starts = np.maximum.accumulate(
        np.maximum(np.concatenate([[0], t[:-1]]), 0)
    ).astype(np.int32)
    rng = np.random.default_rng(heavy_at)
    vals = rng.standard_normal(n).astype(np.float32)
    out = np.asarray(
        expand_sorted_segments(jnp.asarray(starts), jnp.asarray(vals),
                               interpret=True)
    )
    idx = np.searchsorted(starts, np.arange(n), side="right") - 1
    np.testing.assert_array_equal(out, vals[idx])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_expand_shifted_window_fuzz(seed, key):
    """The sharded pick's usage pattern: n_out < n_in with starts shifted
    by the shard's window origin and clamped at 0 — fuzzed against the
    searchsorted oracle across weight sharpness regimes."""
    rng = np.random.default_rng(seed)
    n_in = int(rng.integers(3000, 40000))
    sharp = [1, 3, 8][seed % 3]
    w = rng.random(n_in) ** sharp
    w /= w.sum()
    t = np.ceil(n_in * np.cumsum(w) - rng.random()).astype(np.int64)
    starts = np.maximum.accumulate(
        np.maximum(np.concatenate([[0], t[:-1]]), 0)
    )
    n_out = int(rng.integers(256, n_in // 2))
    s0 = int(rng.integers(0, n_in - n_out))
    shifted = np.maximum(starts - s0, 0).astype(np.float32)
    vals = rng.standard_normal(n_in).astype(np.float32)
    out = np.asarray(expand_sorted_segments(
        jnp.asarray(shifted), jnp.asarray(vals), n_out=n_out,
        interpret=True,
    ))
    idx = np.searchsorted(shifted, np.arange(n_out), side="right") - 1
    np.testing.assert_array_equal(out, vals[idx])


def test_expand_fused_affine(key):
    """scale/shift ride the kernel's output stage: must equal the plain
    pick followed by the XLA affine (the Liu–West shrinkage fusion)."""
    n = 4096
    rng = np.random.default_rng(7)
    w = rng.random(n)
    log_w = jnp.log(jnp.asarray(w / w.sum(), jnp.float32))
    vals = jnp.asarray(rng.standard_normal((n, 2)), jnp.float32)
    a = 0.98
    mu = jnp.asarray([0.3, -1.2], jnp.float32)
    plain = systematic_expand(key, log_w, vals, interpret=True)
    fused = systematic_expand(key, log_w, vals, interpret=True,
                              scale=a, shift=(1.0 - a) * mu)
    np.testing.assert_allclose(
        np.asarray(fused), a * np.asarray(plain) + (1 - a) * np.asarray(mu),
        rtol=1e-6, atol=1e-7,
    )


def test_fused_update_matches_xla(key):
    n = 10_000  # deliberately not a tile multiple (exercises padding)
    rng = np.random.default_rng(2)
    omega = jnp.asarray(rng.random(n), jnp.float32)
    lw = jnp.log(jnp.asarray(rng.random(n), jnp.float32))
    lw = lw - logsumexp(lw)
    for outcome, t in [(0, 2.0), (1, 17.3)]:
        scal = jnp.array([float(outcome), t], jnp.float32)
        lw2, ln, ess = fused_bayes_update(
            precession_tile_fn, scal, lw, (omega,), tile=2048,
            interpret=True,
        )
        pr0 = np.cos(0.5 * np.asarray(omega) * t) ** 2
        pr = pr0 if outcome == 0 else 1 - pr0
        lw_ref = np.asarray(lw) + np.log(np.clip(pr, 1e-35, None))
        ln_ref = float(logsumexp(jnp.asarray(lw_ref)))
        np.testing.assert_allclose(
            np.asarray(lw2), lw_ref - ln_ref, atol=1e-4
        )
        np.testing.assert_allclose(float(ln), ln_ref, atol=1e-4)
        ess_ref = 1.0 / np.sum(np.exp(lw_ref - ln_ref) ** 2)
        np.testing.assert_allclose(float(ess), ess_ref, rtol=1e-3)


def test_accelerated_precession_model(key):
    model = AcceleratedPrecessionModel()
    # Same likelihood semantics as SimplePrecessionModel…
    base = qi.SimplePrecessionModel()
    params = jnp.asarray(np.random.default_rng(0).random((64, 1)), jnp.float32)
    ep = {"t": jnp.array([3.0], jnp.float32)}
    np.testing.assert_allclose(
        np.asarray(model.likelihood(jnp.array([0, 1]), params, ep)),
        np.asarray(base.likelihood(jnp.array([0, 1]), params, ep)),
    )
    # …and the fused path agrees with the engine's update step.
    lw = jnp.full((64,), -np.log(64.0), jnp.float32)
    lw2, ln, ess = model.fused_update(
        jnp.int32(1), lw, params, ep, interpret=True
    )
    from qinfer_tpu.smc import hypothetical_log_update, SMCState

    state = qi.init_smc_state(jax.random.PRNGKey(0), base, 64,
                              qi.UniformDistribution([0.0, 1.0]))
    state = state._replace(particle_locations=params,
                           particle_log_weights=lw)
    _, log_norm = hypothetical_log_update(
        base, state, jnp.array([1]), ep
    )
    np.testing.assert_allclose(float(ln), float(log_norm[0, 0]), atol=1e-5)


def test_resampler_expand_flag_forced(key):
    """Force the expand path at small n (interpret mode) — must match the
    moment-preservation contract like the XLA path."""
    n = 4096
    rng = np.random.default_rng(3)
    locs = jnp.asarray(rng.random((n, 2)), jnp.float32)
    w = rng.random(n)
    log_w = jnp.log(jnp.asarray(w / w.sum(), jnp.float32))
    model = qi.MultiCosModel(n_terms=2)
    rs = qi.LiuWestResampler(use_expand_kernel=True, postselect=False)
    new = np.asarray(rs(key, model, locs, log_w))
    w_np = np.asarray(jnp.exp(log_w - logsumexp(log_w)))
    mean_before = w_np @ np.asarray(locs)
    np.testing.assert_allclose(new.mean(0), mean_before, atol=0.02)


def test_engine_fused_update_route_matches_xla(key):
    """smc_update_step with SMCConfig(use_fused_update=True) must produce
    the same posterior state as the XLA path (the TPU default route)."""
    from qinfer_tpu.smc import SMCConfig, init_smc_state, smc_update_step

    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    rs = qi.LiuWestResampler()
    st0 = qi.init_smc_state(jax.random.PRNGKey(0), model, 4096, prior)

    cfg_x = SMCConfig(zero_weight_policy="reset", use_fused_update=False)
    cfg_f = SMCConfig(zero_weight_policy="reset", use_fused_update=True)
    ep = {"t": jnp.array([5.0], jnp.float32)}
    st_x, ln_x = smc_update_step(model, rs, cfg_x, st0, jnp.int32(1), ep)
    st_f, ln_f = smc_update_step(model, rs, cfg_f, st0, jnp.int32(1), ep)
    np.testing.assert_allclose(float(ln_x), float(ln_f), atol=1e-5)
    # (atol 1e-4: the streaming and the two-pass logsumexp sum in
    # different orders — pure f32 rounding noise.)
    np.testing.assert_allclose(
        np.asarray(st_x.particle_log_weights),
        np.asarray(st_f.particle_log_weights), atol=1e-4,
    )
    np.testing.assert_allclose(
        float(st_x.min_n_ess), float(st_f.min_n_ess), rtol=1e-4
    )


class _DiffusivePrior:
    """Ginibre state coordinates + a small uniform diffusion rate."""

    def __init__(self, basis):
        from qinfer_tpu.tomography import GinibreDistribution

        self._states = GinibreDistribution(basis)

    def sample(self, key, n=1):
        k1, k2 = jax.random.split(key)
        x = self._states.sample(k1, n)
        eps = jax.random.uniform(k2, (n, 1), minval=0.0, maxval=0.05)
        return jnp.concatenate([x, eps], axis=1)


def _zoo_cases():
    from qinfer_tpu.tomography import (
        DiffusiveTomographyModel,
        GinibreDistribution,
        TomographyModel,
        pauli_basis,
    )

    rng = np.random.default_rng(0)
    basis = pauli_basis(1)
    e = np.zeros(4, np.float32)
    e[0] = 1 / np.sqrt(2) / 2
    e[1] = 1 / np.sqrt(2) / 2
    return [
        ("multicos", qi.MultiCosModel(n_terms=2),
         qi.UniformDistribution([[0.0, 1.0], [0.0, 1.0]]),
         jnp.int32(1), {"ts": jnp.array([[1.3, 0.4]], jnp.float32)}),
        ("known_t2", qi.KnownT2PrecessionModel(t2=30.0),
         qi.UniformDistribution([0.0, 1.0]),
         jnp.int32(0), {"t": jnp.array([7.0], jnp.float32)}),
        ("rb", qi.rb.RandomizedBenchmarkingModel(),
         qi.UniformDistribution([[0.8, 1.0], [0.2, 0.5], [0.3, 0.5]]),
         jnp.int32(1), {"m": jnp.array([32], jnp.int32)}),
        ("binomial_precession", qi.BinomialModel(qi.SimplePrecessionModel()),
         qi.UniformDistribution([0.0, 1.0]),
         jnp.int32(11), {"t": jnp.array([2.0], jnp.float32),
                         "n_meas": jnp.array([40], jnp.int32)}),
        ("binomial_rb",
         qi.BinomialModel(qi.rb.RandomizedBenchmarkingModel()),
         qi.UniformDistribution([[0.8, 1.0], [0.2, 0.5], [0.3, 0.5]]),
         jnp.int32(210), {"m": jnp.array([16], jnp.int32),
                          "n_meas": jnp.array([300], jnp.int32)}),
        ("tomography", TomographyModel(basis), GinibreDistribution(basis),
         jnp.int32(1), {"meas": jnp.asarray(e)[None, :]}),
        ("diffusive_tomography", DiffusiveTomographyModel(basis),
         _DiffusivePrior(basis),
         jnp.int32(1), {"meas": jnp.asarray(e)[None, :],
                        "t": jnp.array([1.0], jnp.float32)}),
        ("rb_interleaved",
         qi.rb.RandomizedBenchmarkingModel(interleaved=True),
         qi.UniformDistribution(
             [[0.8, 1.0], [0.8, 1.0], [0.2, 0.5], [0.3, 0.5]]),
         jnp.int32(1), {"m": jnp.array([24], jnp.int32),
                        "reference": jnp.array([0], jnp.int32)}),
        ("rb_interleaved_ref",
         qi.rb.RandomizedBenchmarkingModel(interleaved=True),
         qi.UniformDistribution(
             [[0.8, 1.0], [0.8, 1.0], [0.2, 0.5], [0.3, 0.5]]),
         jnp.int32(0), {"m": jnp.array([24], jnp.int32),
                        "reference": jnp.array([1], jnp.int32)}),
        ("inversion", qi.SimpleInversionModel(),
         qi.UniformDistribution([0.0, 1.0]),
         jnp.int32(0), {"w_": jnp.array([0.3], jnp.float32),
                        "t": jnp.array([4.0], jnp.float32)}),
        ("coin", qi.CoinModel(), qi.UniformDistribution([0.0, 1.0]),
         jnp.int32(1), {"dummy": jnp.array([0.0], jnp.float32)}),
        ("noisy_coin", qi.NoisyCoinModel(),
         qi.UniformDistribution([0.0, 1.0]),
         jnp.int32(0), {"alpha": jnp.array([0.9], jnp.float32),
                        "beta": jnp.array([0.1], jnp.float32)}),
    ]


@pytest.mark.parametrize("case", _zoo_cases(), ids=lambda c: c[0])
def test_fused_update_zoo_matches_xla(case):
    """Every model exposing the fused pr1 protocol must produce the same
    update as the XLA path (weights, evidence, ESS)."""
    from qinfer_tpu.smc import SMCConfig, smc_update_step

    name, model, prior, outcome, ep = case
    assert model.fused_update_supported, name
    rs = qi.LiuWestResampler()
    st0 = qi.init_smc_state(jax.random.PRNGKey(3), model, 2048, prior)
    cfg_x = SMCConfig(zero_weight_policy="reset", use_fused_update=False,
                      resample_thresh=-1.0)
    cfg_f = SMCConfig(zero_weight_policy="reset", use_fused_update=True,
                      resample_thresh=-1.0)
    st_x, ln_x = smc_update_step(model, rs, cfg_x, st0, outcome, ep)
    st_f, ln_f = smc_update_step(model, rs, cfg_f, st0, outcome, ep)
    np.testing.assert_allclose(float(ln_x), float(ln_f), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(st_x.particle_log_weights),
        np.asarray(st_f.particle_log_weights), atol=2e-3,
    )
    np.testing.assert_allclose(
        float(st_x.min_n_ess), float(st_f.min_n_ess), rtol=1e-3
    )


def test_interleaved_rb_is_fused():
    """Round-3: the interleaved variant carries its own fused tile (one
    extra scalar + a select) instead of falling back to XLA."""
    model = qi.rb.RandomizedBenchmarkingModel(interleaved=True)
    assert model.fused_update_supported


def test_fused_update_rejects_multi_experiment(key):
    """fused_update documents E == 1 — a direct caller with E > 1 must get
    an error, not silently the first experiment's answer."""
    model = qi.SimplePrecessionModel()
    lw = jnp.full((256,), -np.log(256.0), jnp.float32)
    locs = jnp.linspace(0.0, 1.0, 256)[:, None]
    ep2 = {"t": jnp.array([1.0, 2.0], jnp.float32)}
    with pytest.raises(ValueError, match="E == 1"):
        model.fused_update(jnp.int32(1), lw, locs, ep2, interpret=True)
    bm = qi.BinomialModel(model)
    ep2b = {"t": jnp.array([1.0, 2.0], jnp.float32),
            "n_meas": jnp.array([10, 10], jnp.int32)}
    with pytest.raises(ValueError, match="E == 1"):
        bm.fused_update(jnp.int32(3), lw, locs, ep2b, interpret=True)


def test_fused_support_gate_blocks_likelihood_override():
    """A subclass that changes the likelihood without updating the fused
    spec must NOT be auto-routed to the ancestor's fused tile."""
    import dataclasses

    @jax.tree_util.register_static
    @dataclasses.dataclass(frozen=True, eq=False)
    class TweakedPrecession(qi.SimplePrecessionModel):
        def pr0(self, modelparams, expparams):
            return 0.5 * super().pr0(modelparams, expparams)

    assert qi.SimplePrecessionModel().fused_update_supported
    assert not TweakedPrecession().fused_update_supported

    @jax.tree_util.register_static
    @dataclasses.dataclass(frozen=True, eq=False)
    class RenamedPrecession(qi.SimplePrecessionModel):
        pass  # no likelihood override — inherited fused spec stays valid

    assert RenamedPrecession().fused_update_supported
