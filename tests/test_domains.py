"""Domain tests. Reference pattern: ``tests/test_domains.py`` (membership,
dtype, finite enumeration)."""

import numpy as np

from qinfer_tpu import IntegerDomain, MultinomialDomain, RealDomain


def test_real_domain():
    d = RealDomain(min=0.0, max=1.0)
    assert d.is_continuous and not d.is_finite
    mask = np.asarray(d.in_domain(np.array([-0.1, 0.5, 1.1])))
    np.testing.assert_array_equal(mask, [False, True, False])


def test_integer_domain():
    d = IntegerDomain(min=0, max=3)
    assert d.is_finite and d.n_members == 4
    np.testing.assert_array_equal(np.asarray(d.values), [0, 1, 2, 3])
    mask = np.asarray(d.in_domain(np.array([0, 2, 4, -1])))
    np.testing.assert_array_equal(mask, [True, True, False, False])


def test_multinomial_domain():
    d = MultinomialDomain(n_meas=3, n_elements=2)
    assert d.n_members == 4
    vals = np.asarray(d.values)
    assert vals.shape == (4, 2)
    assert np.all(vals.sum(-1) == 3)
    mask = np.asarray(d.in_domain(vals))
    assert mask.all()
    assert not bool(d.in_domain(np.array([[2, 2]]))[0])
