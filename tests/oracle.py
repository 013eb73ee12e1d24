"""NumPy oracle: a hand-written float64 implementation of the reference
SMC semantics (SURVEY §3.1) used to validate the TPU engine's posterior
moments within Monte-Carlo error, and to measure the CPU baseline.

This mirrors qinfer's algorithm (multiplicative Bayes update, ESS
threshold, Liu–West resampler with multinomial index draw and
postselection) — written from the SURVEY description, not copied code.
"""

from __future__ import annotations

import numpy as np


class OracleModel:
    """Minimal model protocol for the oracle: pr0(params[N,D], exp) → (N,)."""

    def pr0(self, params, exp):
        raise NotImplementedError

    def are_valid(self, params):
        return np.ones(params.shape[0], dtype=bool)

    def n_outcomes(self):
        return 2

    def likelihood(self, outcome, params, exp):
        p0 = self.pr0(params, exp)
        return p0 if outcome == 0 else 1.0 - p0


class OraclePrecession(OracleModel):
    """pr0 = cos²(ω t / 2) — reference ``SimplePrecessionModel``."""

    def pr0(self, params, exp):
        return np.cos(0.5 * params[:, 0] * exp) ** 2

    def are_valid(self, params):
        return params[:, 0] >= 0


class OracleCoin(OracleModel):
    """Pr(1)=p — matches qinfer_tpu.CoinModel labeling."""

    def pr0(self, params, exp):
        return 1.0 - params[:, 0]

    def are_valid(self, params):
        return (params[:, 0] >= 0) & (params[:, 0] <= 1)


class OracleBinomialPrecession(OracleModel):
    """Binomial(n_meas) wrap of precession: outcome = count of '1's."""

    def __init__(self, n_meas):
        self.n_meas = int(n_meas)

    def n_outcomes(self):
        return self.n_meas + 1

    def likelihood(self, outcome, params, exp):
        from scipy.stats import binom

        p1 = 1.0 - np.cos(0.5 * params[:, 0] * exp) ** 2
        return binom.pmf(outcome, self.n_meas, p1)

    def are_valid(self, params):
        return params[:, 0] >= 0


class OracleSMC:
    """float64 linear-weight SMC with Liu–West resampling (reference
    semantics: multinomial draw, a=0.98, h=√(1−a²), ESS<0.5N threshold)."""

    def __init__(self, model, n_particles, prior_sample_fn, rng,
                 a=0.98, resample_thresh=0.5):
        self.model = model
        self.n = int(n_particles)
        self.rng = rng
        self.a = a
        self.h = np.sqrt(1 - a ** 2)
        self.thresh = resample_thresh
        self.locs = np.asarray(prior_sample_fn(self.n), dtype=np.float64)
        self.w = np.full(self.n, 1.0 / self.n)
        self.resample_count = 0

    def n_ess(self):
        return 1.0 / np.sum(self.w ** 2)

    def update(self, outcome, exp):
        L = self.model.likelihood(outcome, self.locs, exp)
        self.w = self.w * L
        norm = self.w.sum()
        if norm <= 0:
            self.w = np.full(self.n, 1.0 / self.n)
        else:
            self.w /= norm
        if self.n_ess() < self.thresh * self.n:
            self.resample()

    def est_mean(self):
        return self.w @ self.locs

    def est_cov(self):
        mu = self.est_mean()
        centered = self.locs - mu
        return (self.w[:, None] * centered).T @ centered

    def resample(self):
        mu = self.est_mean()
        cov = self.est_cov()
        vals, vecs = np.linalg.eigh(self.h ** 2 * cov)
        S = (vecs * np.sqrt(np.clip(vals, 0, None))) @ vecs.T
        idx = self.rng.choice(self.n, size=self.n, p=self.w)
        new = (
            self.a * self.locs[idx]
            + (1 - self.a) * mu
            + self.rng.standard_normal(self.locs.shape) @ S.T
        )
        for _ in range(100):
            bad = ~self.model.are_valid(new)
            if not bad.any():
                break
            k = int(bad.sum())
            redraw_idx = self.rng.choice(self.n, size=k, p=self.w)
            new[bad] = (
                self.a * self.locs[redraw_idx]
                + (1 - self.a) * mu
                + self.rng.standard_normal((k, new.shape[1])) @ S.T
            )
        self.locs = new
        self.w = np.full(self.n, 1.0 / self.n)
        self.resample_count += 1
