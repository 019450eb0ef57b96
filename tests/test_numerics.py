"""Special-function accuracy vs exact references (math module, exact
summations, and known table values)."""

import math

import numpy as np
import pytest

from mdataframe_spark.functions import numerics as nm


def test_gammaln_vs_math():
    xs = [0.1, 0.5, 1.0, 1.5, 2.0, 3.7, 10.0, 100.5, 1e4]
    got = nm.gammaln(np.array(xs))
    expected = [math.lgamma(x) for x in xs]
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-14)


def test_gammainc_vs_exact_poisson():
    # Q(a, x) with integer a equals Poisson CDF: Q(n, x) = P(Pois(x) <= n-1)
    for n in [1, 3, 10]:
        for x in [0.5, 2.0, 7.5]:
            pois_cdf = sum(math.exp(-x) * x**k / math.factorial(k) for k in range(n))
            np.testing.assert_allclose(
                nm.gammainc_q(float(n), x), pois_cdf, rtol=1e-12
            )


def test_qgamma_roundtrip():
    shapes = np.array([0.5, 1.0, 3.3, 20.0, 400.0])
    ps = np.array([0.001, 0.1, 0.5, 0.9, 0.999])
    for s in shapes:
        x = nm.qgamma(ps, s, scale=2.5)
        back = nm.pgamma(x, s, scale=2.5)
        np.testing.assert_allclose(back, ps, rtol=1e-8)


def test_pnorm_qnorm():
    # known standard normal quantiles
    np.testing.assert_allclose(nm.qnorm(np.array([0.975]))[0], 1.959963984540054, rtol=1e-10)
    np.testing.assert_allclose(nm.qnorm(np.array([0.5]))[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(nm.pnorm(1.959963984540054), 0.975, rtol=1e-7)
    # roundtrip
    ps = np.array([1e-8, 0.01, 0.3, 0.5, 0.77, 0.9999])
    np.testing.assert_allclose(nm.pnorm(nm.qnorm(ps)), ps, rtol=1e-6)


def test_betainc_symmetry_and_known():
    # I_x(1, b) = 1-(1-x)^b exactly
    for b in [1.0, 2.5, 7.0]:
        for x in [0.1, 0.5, 0.9]:
            np.testing.assert_allclose(
                nm.betainc(1.0, b, x), 1 - (1 - x) ** b, rtol=1e-12
            )
    # symmetry I_x(a,b) = 1 - I_{1-x}(b,a)
    np.testing.assert_allclose(
        nm.betainc(3.2, 4.7, 0.37), 1 - nm.betainc(4.7, 3.2, 0.63), rtol=1e-10
    )


def test_pnbinom_vs_exact_sum():
    # compare CDF against explicit pmf summation
    for size, mu in [(2.5, 10.0), (10.0, 3.0), (0.8, 0.5)]:
        for q in [0, 3, 12]:
            direct = sum(
                math.exp(nm.dnbinom_log(np.array([k]), size, mu)[0])
                for k in range(q + 1)
            )
            np.testing.assert_allclose(
                nm.pnbinom(q, size, mu), direct, rtol=1e-10
            )


def test_dnbinom_log_normalizes():
    size, mu = 3.0, 8.0
    total = sum(math.exp(nm.dnbinom_log(np.array([k]), size, mu)[0]) for k in range(500))
    np.testing.assert_allclose(total, 1.0, rtol=1e-10)


def test_pbeta_qbeta_analytic():
    """Beta CDF/quantile against closed forms: I_x(a,1) = x^a,
    I_x(1,b) = 1-(1-x)^b, symmetry I_0.5(a,a) = 0.5, and qbeta as the
    inverse of pbeta."""
    import numpy as np

    from mdataframe_spark.functions.numerics import pbeta, qbeta

    x = np.linspace(0.05, 0.95, 10)
    for a in (0.5, 1.0, 2.5, 7.0):
        np.testing.assert_allclose(pbeta(x, a, 1.0), x ** a, rtol=1e-10)
        np.testing.assert_allclose(pbeta(x, 1.0, a), 1 - (1 - x) ** a, rtol=1e-10)
        np.testing.assert_allclose(pbeta(np.array([0.5]), a, a), [0.5], atol=1e-12)
        np.testing.assert_allclose(qbeta(np.array([0.5]), a, a), [0.5], atol=1e-9)
    p = np.linspace(0.01, 0.99, 15)
    for a, b in ((2.0, 5.0), (30.0, 12.0), (0.7, 3.3)):
        np.testing.assert_allclose(pbeta(qbeta(p, a, b), a, b), p, atol=1e-9)


def test_pkolmogorov_nan_propagates():
    """pkolmogorov(NaN) must return NaN, not the `ones` initializer
    (round-7 advice: NaN matches neither theta branch, so without the
    explicit mask the public function misreports certainty)."""
    import numpy as np

    from mdataframe_spark.functions.numerics import pkolmogorov

    out = pkolmogorov([float("nan"), 0.0, 1.5])
    assert np.isnan(out[0])
    assert out[1] == 1.0
    assert 0.0 < out[2] < 1.0
