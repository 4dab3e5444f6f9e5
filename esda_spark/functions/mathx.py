"""Scalar/ vectorized math kernels (no scipy in the runtime image).

- ``norm_sf`` / ``norm_cdf``: exact via ``math.erfc`` (double precision,
  matches ``scipy.stats.norm.sf`` to full precision).
- ``chi2_sf``: regularized upper incomplete gamma Q(k/2, x/2) via the
  standard series / continued-fraction evaluation (Abramowitz & Stegun
  6.5; double precision to ~1e-14).

These run driver-side for global statistics (a handful of scalars) and
inside Arrow-batched pandas kernels for per-row p-values.
"""

from __future__ import annotations

import math

import numpy as np

_erfc = np.vectorize(math.erfc, otypes=[np.float64])
_SQRT2 = math.sqrt(2.0)


def norm_sf(z):
    """P(Z > z) for standard normal; scalar or ndarray."""
    return 0.5 * _erfc(np.asarray(z, dtype=np.float64) / _SQRT2)


def norm_cdf(z):
    return 0.5 * _erfc(-np.asarray(z, dtype=np.float64) / _SQRT2)


def _lower_gamma_series(a, x, eps=1e-15, itmax=500):
    """Regularized lower incomplete gamma P(a,x) by series (x < a+1)."""
    ap = a
    term = 1.0 / a
    total = term
    for _ in range(itmax):
        ap += 1.0
        term *= x / ap
        total += term
        if abs(term) < abs(total) * eps:
            break
    return total * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _upper_gamma_cf(a, x, eps=1e-15, itmax=500):
    """Regularized upper incomplete gamma Q(a,x) by continued fraction
    (Lentz's algorithm; x >= a+1)."""
    tiny = 1e-300
    b = x + 1.0 - a
    c = 1.0 / tiny
    d = 1.0 / b
    h = d
    for i in range(1, itmax + 1):
        an = -i * (i - a)
        b += 2.0
        d = an * d + b
        if abs(d) < tiny:
            d = tiny
        c = b + an / c
        if abs(c) < tiny:
            c = tiny
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < eps:
            break
    return h * math.exp(-x + a * math.log(x) - math.lgamma(a))


def _gammainc_q_scalar(a: float, x: float) -> float:
    if x < 0 or a <= 0 or math.isnan(x) or math.isnan(a):
        return float("nan")
    if x == 0.0:
        return 1.0
    if x < a + 1.0:
        return 1.0 - _lower_gamma_series(a, x)
    return _upper_gamma_cf(a, x)


_gammainc_q = np.vectorize(_gammainc_q_scalar, otypes=[np.float64])


def chi2_sf(x, dof):
    """P(X > x) for chi-square with ``dof`` degrees of freedom
    (dof may be fractional, e.g. LOSH at ``losh.py:115-117``)."""
    x = np.asarray(x, dtype=np.float64)
    dof = np.asarray(dof, dtype=np.float64)
    return _gammainc_q(dof / 2.0, x / 2.0)


def gammainc_p(a, x):
    """Regularized lower incomplete gamma P(a, x)."""
    return 1.0 - _gammainc_q(np.asarray(a, np.float64),
                             np.asarray(x, np.float64))


def _gamma_ppf_scalar(q: float, a: float, scale: float = 1.0) -> float:
    """Inverse of P(a, x/scale) = q by bracketed bisection (~1e-14)."""
    if not (0.0 <= q <= 1.0) or a <= 0 or math.isnan(q) or math.isnan(a):
        return float("nan")
    if q == 0.0:
        return 0.0
    if q == 1.0:
        return float("inf")
    hi = max(a, 1.0)
    while (1.0 - _gammainc_q_scalar(a, hi)) < q:
        hi *= 2.0
        if hi > 1e12:
            break
    lo = 0.0
    for _ in range(2000):
        mid = 0.5 * (lo + hi)
        if (1.0 - _gammainc_q_scalar(a, mid)) < q:
            lo = mid
        else:
            hi = mid
        # tolerance relative to the CURRENT bracket: for tiny shape
        # parameters the quantile itself is tiny and the CDF is steep,
        # so an absolute cut loses many digits of q
        if hi - lo <= 1e-16 * hi or hi <= 1e-300:
            break
    return 0.5 * (lo + hi) * scale


gamma_ppf = np.vectorize(_gamma_ppf_scalar, otypes=[np.float64])


def chi2_ppf(q, dof):
    """Inverse chi-square CDF: chi2.ppf(q, dof) = gamma_ppf(q, dof/2)*2."""
    return gamma_ppf(q, np.asarray(dof, np.float64) / 2.0, 2.0)


def _poisson_cdf_scalar(k: float, mu: float) -> float:
    """P(X <= k) for Poisson(mu): Q(floor(k)+1, mu) (regularized upper
    incomplete gamma identity)."""
    if math.isnan(k) or math.isnan(mu):
        return float("nan")
    if k < 0:
        return 0.0
    if mu == 0:
        return 1.0
    return _gammainc_q_scalar(math.floor(k) + 1.0, mu)


poisson_cdf = np.vectorize(_poisson_cdf_scalar, otypes=[np.float64])


def _norm_ppf_scalar(q: float) -> float:
    """Inverse standard-normal CDF by bisection on erfc (~1e-13)."""
    if not (0.0 <= q <= 1.0) or math.isnan(q):
        return float("nan")
    if q == 0.0:
        return float("-inf")
    if q == 1.0:
        return float("inf")
    lo, hi = -40.0, 40.0
    for _ in range(120):
        mid = 0.5 * (lo + hi)
        if 0.5 * math.erfc(-mid / _SQRT2) < q:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


norm_ppf = np.vectorize(_norm_ppf_scalar, otypes=[np.float64])
