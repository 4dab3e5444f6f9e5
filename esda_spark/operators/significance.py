"""Pseudo-p-value computation from simulated reference distributions.

Vectorized numpy re-expression of the reference's
``_permutation_significance`` (``significance.py:66-113``): all five
alternatives, evaluated per-row over an (m, k) block of simulations
inside the Arrow kernel — simulations never leave the executor.
"""

from __future__ import annotations

import numpy as np


def permutation_significance(
    observed: np.ndarray, sims: np.ndarray, alternative: str = "directed"
) -> np.ndarray:
    """observed: (m,), sims: (m, k) -> (m,) pseudo p-values."""
    observed = np.asarray(observed, dtype=np.float64).reshape(-1)
    sims = np.asarray(sims, dtype=np.float64)
    m, k = sims.shape
    obs = observed[:, None]
    if alternative == "directed":
        larger = (sims >= obs).sum(axis=1)
        low = (k - larger) < larger
        larger[low] = k - larger[low]
        return (larger + 1.0) / (k + 1.0)
    if alternative == "lesser":
        return ((sims <= obs).sum(axis=1) + 1.0) / (k + 1.0)
    if alternative == "greater":
        return ((sims >= obs).sum(axis=1) + 1.0) / (k + 1.0)
    if alternative == "two-sided":
        pct = (sims <= obs).mean(axis=1) * 100.0
        p_low = np.minimum(pct, 100.0 - pct)
        lows = np.empty(m)
        highs = np.empty(m)
        for i in range(m):
            lows[i] = np.percentile(sims[i], p_low[i])
            highs[i] = np.percentile(sims[i], 100.0 - p_low[i])
        n_outside = (sims <= lows[:, None]).sum(axis=1)
        n_outside += (sims >= highs[:, None]).sum(axis=1)
        return (n_outside + 1.0) / (k + 1.0)
    if alternative == "folded":
        means = sims.mean(axis=1, keepdims=True)
        folded_obs = np.abs(obs - means)
        folded = np.abs(sims - means)
        return ((folded >= folded_obs).sum(axis=1) + 1.0) / (k + 1.0)
    raise ValueError(
        f"alternative={alternative!r} not one of "
        "'two-sided','greater','lesser','directed','folded'"
    )


def fdr(pvalues: np.ndarray, alpha: float = 0.05) -> float:
    """Benjamini-Hochberg-style FDR cutoff (reference ``util.py:4-68``):
    largest p_(i) <= i*alpha/n walking up the sorted p-values; falls
    back to the Bonferroni bound alpha/n when none qualifies."""
    p = np.sort(np.asarray(pvalues, dtype=np.float64))
    n = len(p)
    bound = np.arange(1, n + 1) * alpha / n
    ok = p <= bound
    if ok.any():
        return float(p[np.nonzero(ok)[0].max()])
    return alpha / n
