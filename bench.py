#!/usr/bin/env python
"""Headline benchmark (BASELINE.md): particle-updates/s at 1M particles on
SimplePrecessionModel with the Liu–West resampler, vs the reference-CPU
implementation (float64 NumPy, reference semantics — the reference repo
publishes no numbers, so the CPU baseline is measured; the *denominator*
is PINNED: a canonical median-of-5 quiet-host measurement recorded in
BASELINE.json's "published" block, so vs_baseline stops swinging with
host load; the live remeasurement is reported alongside).

Prints ONE JSON line ALWAYS — on terminal failure the line carries an
"error" field instead of silently dying (round-3 verdict item 1: the
driver must never record `parsed: null` again):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Methodology (round-4): the relay's per-program fixed cost (~25–36 ms) is
amortized by chaining K=24 INDEPENDENT 100-experiment windows (distinct
seeds and outcome records) inside ONE jitted program — an outer lax.scan
whose carry chains a checksum through every window so nothing can be
elided or cached. Relay share of the reported window drops to ≤5%
(`relay_share_pct` field). All retry-able device phases get 3 attempts
with backoff (the relay throws transient FailedPreconditions).

Phase-field ordering (round-5): the relay fixed-cost probe (3 trivial
jitted calls, ~0.1 s) and the live CPU baseline run BEFORE the headline
windows, so `relay_fixed_ms`/`relay_share_pct`/`compute_pps`/
`cpu_pps_live` can never be lost to the headline's compile budget
(round-4's breakdown vanished exactly that way). The per-op scans
(`update_ms`/`resample_ms`) get their own deadline and persist to
BENCH_PHASES.json on success; when a run cannot re-measure them it
attaches the last measured values with `phase_source: "cached"`.

Extra fields (all MEASURED, none modeled):
  n_windows/n_exp       K independent windows × experiments per window
  n_resamples           total resamples fired across all windows
  window_ms             measured per-window wall time (total/K)
  relay_fixed_ms        per-execution fixed cost of the TPU relay,
                        measured as the wall time of a trivial jitted
                        execution
  relay_share_pct       relay_fixed_ms / total program wall time
  compute_pps           particle-updates/s excluding the relay fixed cost
  update_ms/resample_ms measured per-op costs (differenced chained scans)
  est_hbm_gbps          traffic MODEL over the measured compute time
                        (prefix 'est_' — it is derived, not measured)
  cpu_pps_pinned/_live  the pinned and the live-remeasured baseline
  vs_baseline_live      value / cpu_pps_live (the old noisy ratio)
"""

import json
import os
import sys
import time

import numpy as np


N_PARTICLES = 1 << 20  # "1M particles" aligned to TPU tiling
N_EXP = 100
N_WINDOWS = 24
TRUE_OMEGA = 0.70710678
METRIC = "particle_updates_per_s@1M_SimplePrecession_LiuWest"
UNIT = "particle-updates/s"


def _with_retries(fn, attempts=3, backoff=10.0, label="phase"):
    """Retry a device-touching phase: the TPU relay throws transient
    errors (FailedPrecondition on first transfer killed the round-3
    driver capture)."""
    last = None
    for a in range(attempts):
        try:
            return fn()
        except Exception as exc:  # pragma: no cover - relay-dependent
            last = exc
            print(f"{label}: attempt {a + 1}/{attempts} failed: {exc!r}",
                  file=sys.stderr)
            if a + 1 < attempts:
                time.sleep(backoff * (a + 1))
    raise last


def _experiment_record(n_exp, seed):
    """Deterministic exp-sparse schedule + simulated outcomes (host side)."""
    rng = np.random.default_rng(seed)
    ts = np.minimum((9 / 8) ** np.arange(n_exp), 1e4).astype(np.float32)
    p0 = np.cos(0.5 * TRUE_OMEGA * ts) ** 2
    outcomes = (rng.random(n_exp) >= p0).astype(np.int32)
    return ts, outcomes


def _run_windows(n_particles, n_exp, k_windows, repeats=3):
    """Best-of-repeats wall time of ONE jitted program running k_windows
    independent n_exp windows back-to-back (outer lax.scan, carry-chained
    checksum — the relay caches repeated identical executions and can ack
    block_until_ready early, so each repeat uses distinct initial states
    and the clock is read only after a forced host transfer).

    Returns (best_seconds, total_resamples).
    """
    import jax
    import jax.numpy as jnp

    import qinfer_tpu as qi
    from qinfer_tpu.smc import SMCConfig, init_smc_state, smc_batch_update

    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    resampler = qi.LiuWestResampler()
    config = SMCConfig(zero_weight_policy="reset")

    ts, _ = _experiment_record(n_exp, 0)
    eps = {"t": jnp.asarray(ts)}
    outcomes = jnp.asarray(
        np.stack([_experiment_record(n_exp, w)[1] for w in range(k_windows)])
    )  # (K, n_exp) — distinct seeds per window

    def stacked_states(seed0):
        states = [
            init_smc_state(jax.random.PRNGKey(seed0 + i), model,
                           n_particles, prior)
            for i in range(k_windows)
        ]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)

    @jax.jit
    def run_all(states, outcomes):
        def one(carry, xs):
            st0, outs = xs
            st, _ = smc_batch_update(model, resampler, config, st0, outs, eps)
            w = jnp.exp(st.particle_log_weights)
            est = w @ st.particle_locations[:, 0]
            # Chain the carry through every window so no window can be
            # elided, reordered, or served from the relay cache.
            return carry + jnp.sum(st.particle_log_weights), (
                est, st.n_resamples)
        chk, (ests, n_res) = jax.lax.scan(
            one, jnp.float32(0.0), (states, outcomes)
        )
        return chk, ests, n_res

    # Warmup/compile on its own state set.
    chk, ests, n_res = run_all(stacked_states(10_000), outcomes)
    float(chk)

    best = float("inf")
    for r in range(repeats):
        states = stacked_states(1000 * (r + 1))
        jax.block_until_ready(states.particle_locations)
        t0 = time.perf_counter()
        chk, ests, n_res = run_all(states, outcomes)
        float(chk)  # forced host transfer before reading the clock
        best = min(best, time.perf_counter() - t0)

    # Sanity: every window's posterior must land on the true frequency.
    ests = np.asarray(ests)
    worst = float(np.max(np.abs(ests - TRUE_OMEGA)))
    assert worst < 0.05, f"bench accuracy failure: worst |est-true|={worst}"
    return best, int(np.sum(np.asarray(n_res)))


def _run_window_single(n_particles, n_exp, repeats=3):
    """Degraded fallback: ONE window per program (the round-3 shape)."""
    import jax
    import jax.numpy as jnp

    import qinfer_tpu as qi
    from qinfer_tpu.smc import SMCConfig, init_smc_state, smc_batch_update

    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    resampler = qi.LiuWestResampler()
    config = SMCConfig(zero_weight_policy="reset")
    states = [
        init_smc_state(jax.random.PRNGKey(i), model, n_particles, prior)
        for i in range(repeats + 1)
    ]
    ts, outcomes = _experiment_record(n_exp, 0)
    eps = {"t": jnp.asarray(ts)}
    outcomes = jnp.asarray(outcomes)

    run = jax.jit(smc_batch_update)
    st, _ = run(model, resampler, config, states[0], outcomes, eps)
    float(jnp.sum(st.particle_log_weights))  # warmup/compile

    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        st, _ = run(model, resampler, config, states[i + 1], outcomes, eps)
        float(jnp.sum(st.particle_log_weights))
        best = min(best, time.perf_counter() - t0)

    w = np.asarray(jnp.exp(st.particle_log_weights))
    est = float(w @ np.asarray(st.particle_locations[:, 0]))
    assert abs(est - TRUE_OMEGA) < 0.05, f"bench accuracy failure: {est}"
    return best, int(st.n_resamples)


def _phase_costs(n_particles):
    """Measured per-op costs: one Bayes update (no resample) and one full
    update+forced-resample step, via differenced chained scans (k vs 4k)
    so the relay fixed cost cancels."""
    import jax
    import jax.numpy as jnp

    import qinfer_tpu as qi
    from qinfer_tpu.smc import SMCConfig, init_smc_state, smc_update_step

    model = qi.SimplePrecessionModel()
    prior = qi.UniformDistribution([0.0, 1.0])
    rs = qi.LiuWestResampler()
    ep = {"t": jnp.asarray([1.7], jnp.float32)}

    def timed(cfg, iters):
        def step(st):
            out = (st.n_resamples + st.particle_log_weights.shape[0]) % 2
            st, _ = smc_update_step(model, rs, cfg, st, out, ep)
            return st

        def make_run(k):
            @jax.jit
            def run(st0):
                st, _ = jax.lax.scan(
                    lambda s, _: (step(s), None), st0, None, length=k
                )
                return st

            return run

        k1, k2 = iters, 4 * iters
        r1, r2 = make_run(k1), make_run(k2)

        def measure(run):
            st = run(init_smc_state(jax.random.PRNGKey(0), model,
                                    n_particles, prior))
            float(jnp.sum(st.particle_log_weights))
            best = float("inf")
            for rep in range(3):
                st0 = init_smc_state(jax.random.PRNGKey(rep + 1), model,
                                     n_particles, prior)
                jax.block_until_ready(st0.particle_locations)
                t0 = time.perf_counter()
                st = run(st0)
                float(jnp.sum(st.particle_log_weights))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = measure(r1), measure(r2)
        return max(t2 - t1, 1e-9) / (k2 - k1) * 1e3

    update_ms = timed(
        SMCConfig(zero_weight_policy="reset", resample_thresh=-1.0), 30
    )
    step_resample_ms = timed(
        SMCConfig(zero_weight_policy="reset", resample_thresh=2.0), 10
    )
    return update_ms, max(step_resample_ms - update_ms, 0.0)


def measure_cpu_reference(n_particles=N_PARTICLES, n_exp=None):
    """Reference-semantics float64 NumPy SMC (multiplicative update, ESS
    threshold 0.5·N, Liu–West multinomial resampler) — the measured-at-
    build-time CPU baseline (BASELINE.md row 2)."""
    if n_exp is None:
        n_exp = min(N_EXP, 12)  # CPU is slow; extrapolate per-update cost
    rng = np.random.default_rng(1)
    ts, outcomes = _experiment_record(n_exp, 0)

    locs = rng.random((n_particles, 1))
    w = np.full(n_particles, 1.0 / n_particles)
    a = 0.98
    h = np.sqrt(1 - a * a)

    def resample():
        nonlocal locs, w
        mu = w @ locs
        centered = locs - mu
        cov = (w[:, None] * centered).T @ centered
        vals, vecs = np.linalg.eigh(h * h * cov)
        S = (vecs * np.sqrt(np.clip(vals, 0, None))) @ vecs.T
        idx = rng.choice(n_particles, size=n_particles, p=w)
        locs = a * locs[idx] + (1 - a) * mu + rng.standard_normal(locs.shape) @ S.T
        np.clip(locs, 0.0, None, out=locs)
        w = np.full(n_particles, 1.0 / n_particles)

    t0 = time.perf_counter()
    for t, o in zip(ts, outcomes):
        p0 = np.cos(0.5 * locs[:, 0] * t) ** 2
        L = p0 if o == 0 else 1.0 - p0
        w = w * L
        norm = w.sum()
        w = w / norm if norm > 0 else np.full(n_particles, 1.0 / n_particles)
        if 1.0 / np.sum(w * w) < 0.5 * n_particles:
            resample()
    dt = time.perf_counter() - t0
    return n_particles * n_exp / dt


def _pinned_cpu_pps():
    """The canonical CPU baseline recorded in BASELINE.json (round-3
    verdict item 6: pin the denominator; report the live remeasurement
    alongside)."""
    try:
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BASELINE.json")
        with open(path) as f:
            return float(json.load(f)["published"]["cpu_f64_pps_pinned"])
    except Exception:  # pragma: no cover
        return None


_PHASE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_PHASES.json"
)


def _measure_relay_fixed_ms():
    """Per-execution fixed cost of the TPU relay: the wall time of a
    trivial jitted execution (all fixed cost; paid once per program —
    i.e. once per K windows). ~0.1 s total; runs BEFORE the headline so
    the relay fields can never be lost to its compile budget."""
    import jax
    import jax.numpy as jnp

    triv = jax.jit(lambda x: x + 1.0)
    triv(jnp.float32(0.0)).block_until_ready()
    fixed = []
    for i in range(3):
        t0 = time.perf_counter()
        float(triv(jnp.float32(i)))
        fixed.append(time.perf_counter() - t0)
    return sorted(fixed)[1] * 1e3  # median


def main():
    t_start = time.perf_counter()
    result = {"metric": METRIC, "value": 0.0, "unit": UNIT,
              "vs_baseline": 0.0}
    try:
        n, k = N_PARTICLES, N_WINDOWS

        # --- cheap diagnostics FIRST (order is the round-5 fix) ---
        relay_fixed_ms = None
        try:
            relay_fixed_ms = _with_retries(
                _measure_relay_fixed_ms, label="relay probe")
            result["relay_fixed_ms"] = round(relay_fixed_ms, 1)
        except Exception as exc:  # pragma: no cover
            print(f"relay probe failed ({exc!r})", file=sys.stderr)

        cpu_live = None
        try:
            # Best-of-2: the shared host is noisy and an unlucky slow
            # run would flatter the live ratio.
            cpu_live = max(measure_cpu_reference(n_particles=n)
                           for _ in range(2))
            result["cpu_pps_live"] = round(cpu_live)
        except Exception as exc:  # pragma: no cover
            print(f"live CPU baseline failed ({exc!r})", file=sys.stderr)

        # --- headline ---
        try:
            t_total, n_res = _with_retries(
                lambda: _run_windows(n, N_EXP, k),
                label="headline windows",
            )
        except Exception as exc:  # pragma: no cover — degraded ladder
            print(f"K-window bench failed terminally ({exc!r}); "
                  "falling back to single-window", file=sys.stderr)
            k = 1
            try:
                t_total, n_res = _with_retries(
                    lambda: _run_window_single(n, N_EXP),
                    label="single window",
                )
            except Exception as exc2:
                print(f"1M single-window failed ({exc2!r}); retrying at "
                      "2^18", file=sys.stderr)
                n = 1 << 18
                t_total, n_res = _with_retries(
                    lambda: _run_window_single(n, N_EXP),
                    label="single window 2^18",
                )
                try:  # the live ratio must match the degraded width
                    cpu_live = measure_cpu_reference(n_particles=n)
                    result["cpu_pps_live"] = round(cpu_live)
                except Exception:  # pragma: no cover
                    pass
        tpu_pps = k * n * N_EXP / t_total
        result.update(value=tpu_pps, n_windows=k, n_exp=N_EXP,
                      n_resamples=n_res,
                      window_ms=round(t_total * 1e3 / k, 2))

        if relay_fixed_ms is not None:
            compute_s = max(t_total - relay_fixed_ms * 1e-3, 1e-9)
            # Traffic model over the measured compute time (est_: derived).
            bytes_moved = (k * N_EXP * 5 * 4 + n_res * (10 + 16 + 8)) * n
            est_gbps = bytes_moved / compute_s / 1e9
            result.update(
                relay_share_pct=round(100 * relay_fixed_ms
                                      / (t_total * 1e3), 2),
                compute_pps=round(k * n * N_EXP / compute_s),
                est_hbm_gbps=round(est_gbps, 1),
                est_hbm_util_pct_of_819=round(100 * est_gbps / 819.0, 2),
            )

        # --- per-op scans: own deadline; persist on success, fall back
        # to the last measured values (provenance-tagged) otherwise ---
        try:
            if time.perf_counter() - t_start > 420.0:
                raise TimeoutError("headline windows consumed the budget")
            update_ms, resample_ms = _phase_costs(n)
            result.update(update_ms=round(update_ms, 4),
                          resample_ms=round(resample_ms, 3),
                          phase_source="measured")
            try:
                with open(_PHASE_CACHE, "w") as f:
                    json.dump({"n_particles": n,
                               "update_ms": result["update_ms"],
                               "resample_ms": result["resample_ms"],
                               "measured_unix": time.time()}, f)
            except Exception:  # pragma: no cover
                pass
        except Exception as exc:  # pragma: no cover
            print(f"phase scans skipped ({exc!r}); using cache",
                  file=sys.stderr)
            try:
                with open(_PHASE_CACHE) as f:
                    cache = json.load(f)
                if cache.get("n_particles") == n:
                    result.update(update_ms=cache["update_ms"],
                                  resample_ms=cache["resample_ms"],
                                  phase_source="cached")
            except Exception:  # pragma: no cover
                pass

        pinned = _pinned_cpu_pps()
        if pinned is not None:
            result["vs_baseline"] = tpu_pps / pinned
            result["cpu_pps_pinned"] = round(pinned)
            result["baseline"] = "pinned (BASELINE.json published block)"
        if cpu_live is not None:
            result["vs_baseline_live"] = tpu_pps / cpu_live
            if pinned is None:
                result["vs_baseline"] = tpu_pps / cpu_live
                result["baseline"] = "live remeasurement (no pinned record)"
    except Exception as exc:  # pragma: no cover — ALWAYS emit the line
        result["error"] = repr(exc)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
