"""simple_est_* one-call API tests. Reference pattern: qinfer's
test coverage of simple_est.py (CSV + array inputs, recovery)."""

import numpy as np

import qinfer_tpu as qi


def _prec_data(true_omega=0.5, n_shots=40, n_exp=25, seed=0):
    rng = np.random.default_rng(seed)
    ts = (9 / 8) ** np.arange(n_exp)
    p1 = 1 - np.cos(0.5 * true_omega * ts) ** 2
    counts = rng.binomial(n_shots, p1)
    return np.stack([counts, ts, np.full(n_exp, n_shots)], axis=1)


def test_simple_est_prec_array():
    data = _prec_data()
    mean, cov = qi.simple_est_prec(data, freq_min=0.0, freq_max=1.0)
    assert mean.shape == (1,) and cov.shape == (1, 1)
    assert abs(mean[0] - 0.5) < 6 * np.sqrt(cov[0, 0]) + 1e-3


def test_simple_est_prec_csv_and_extra():
    data = _prec_data(true_omega=0.73, seed=3)
    csv = "\n".join(",".join(f"{v:.6f}" for v in row) for row in data)
    mean, cov, extra = qi.simple_est_prec(csv, return_all=True)
    assert abs(mean[0] - 0.73) < 6 * np.sqrt(cov[0, 0]) + 1e-3
    assert isinstance(extra["updater"], qi.SMCUpdater)
    assert len(extra["updater"].normalization_record) == data.shape[0]


def test_simple_est_rb():
    rng = np.random.default_rng(5)
    true_p, A, B = 0.96, 0.45, 0.5
    ms = np.array([1, 2, 4, 8, 16, 32, 64, 128, 192, 256])
    n_shots = 400
    surv = A * true_p ** ms + B
    counts = rng.binomial(n_shots, surv)  # survival counts
    data = np.stack([counts, ms, np.full(len(ms), n_shots)], axis=1)
    mean, cov = qi.simple_est_rb(data, p_min=0.8)
    assert mean.shape == (3,)
    assert abs(mean[0] - true_p) < 6 * np.sqrt(cov[0, 0]) + 1e-2


def test_load_data_or_txt_validates():
    import pytest

    with pytest.raises(ValueError):
        qi.load_data_or_txt(np.zeros((3, 2)), 3)
    with pytest.raises(TypeError):
        qi.load_data_or_txt(42, 3)
