"""S-maup: sensitivity to the Modifiable Areal Unit Problem.

Driver-side scalar statistic (no data movement — reference
``smaup.py:19-218``).  The closed-form statistic and the critical-value
tables are from Duque, Laniado & Polo (2018), "S-maup: Statistical test
to measure the sensitivity to the modifiable areal unit problem",
PLoS ONE 13(11) — published experimental constants, interpolated
linearly over n exactly as the reference does.
"""

from __future__ import annotations

import numpy as np

# rows: rho bucket; columns: n in {25, 100, 225, 400, 625, 900}
_NS = np.array([25, 100, 225, 400, 625, 900], dtype=float)
_RHOS = [-0.9, -0.7, -0.5, -0.3, 0, 0.3, 0.5, 0.7, 0.9]

_CV = {
    0.01: {
        -0.9: [0.83702, 0.09218, 0.23808, 0.05488, 0.07218, 0.02621],
        -0.7: [0.83676, 0.16134, 0.13402, 0.06737, 0.05486, 0.02858],
        -0.5: [0.83597, 0.16524, 0.13446, 0.06616, 0.06247, 0.02851],
        -0.3: [0.83316, 0.19276, 0.13396, 0.0633, 0.0609, 0.03696],
        0: [0.8237, 0.17925, 0.15514, 0.07732, 0.07988, 0.09301],
        0.3: [0.76472, 0.23404, 0.2464, 0.11588, 0.10715, 0.0707],
        0.5: [0.67337, 0.28921, 0.25535, 0.13992, 0.12975, 0.09856],
        0.7: [0.52155, 0.47399, 0.29351, 0.23923, 0.20321, 0.1625],
        0.9: [0.28599, 0.28938, 0.4352, 0.4406, 0.34437, 0.55967],
    },
    0.05: {
        -0.9: [0.83699, 0.08023, 0.10962, 0.04894, 0.04641, 0.02423],
        -0.7: [0.83662, 0.12492, 0.08643, 0.059, 0.0428, 0.02459],
        -0.5: [0.83578, 0.13796, 0.08679, 0.05927, 0.0426, 0.02658],
        -0.3: [0.78849, 0.16932, 0.08775, 0.05464, 0.04787, 0.03042],
        0: [0.81952, 0.15746, 0.11126, 0.06961, 0.06066, 0.05234],
        0.3: [0.70466, 0.21088, 0.1536, 0.09766, 0.07938, 0.06461],
        0.5: [0.59461, 0.23497, 0.18244, 0.11682, 0.10129, 0.0886],
        0.7: [0.48958, 0.37226, 0.2228, 0.2054, 0.16144, 0.14123],
        0.9: [0.2158, 0.22532, 0.27122, 0.29043, 0.23648, 0.31424],
    },
    0.10: {
        -0.9: [0.69331, 0.06545, 0.07858, 0.04015, 0.03374, 0.02187],
        -0.7: [0.79421, 0.09566, 0.06777, 0.05058, 0.03392, 0.02272],
        -0.5: [0.689, 0.10707, 0.07039, 0.05151, 0.03609, 0.02411],
        -0.3: [0.73592, 0.14282, 0.07076, 0.04649, 0.04001, 0.02614],
        0: [0.71632, 0.13621, 0.08801, 0.06112, 0.04937, 0.03759],
        0.3: [0.63718, 0.18239, 0.12101, 0.08324, 0.06347, 0.05549],
        0.5: [0.46548, 0.17541, 0.14248, 0.10008, 0.08137, 0.07701],
        0.7: [0.3472, 0.28774, 0.1817, 0.16442, 0.13395, 0.12354],
        0.9: [0.1764, 0.18835, 0.21695, 0.23031, 0.19435, 0.22411],
    },
}

_RHO_EDGES = [
    (0.8, 0.9), (0.6, 0.7), (0.4, 0.5), (0.15, 0.3), (-0.15, 0),
    (-0.4, -0.3), (-0.6, -0.5), (-0.8, -0.7),
]


def _rho_bucket(rho: float) -> float:
    for lo, r in _RHO_EDGES:
        if rho > lo:
            return r
    return -0.9


def smaup(n: int, k: int, rho: float) -> dict:
    """S-maup statistic + interpolated critical values + verdict."""
    warning = ""
    n_eff = n
    if n < 25 or n > 900:
        n_eff = min(max(n, 25), 900)
        warning = (
            "Warning: experiment covers n in [25, 900]; result clamped. "
        )
    theta = float(k) / n
    L = 1.0 / (1.0 + np.exp(-2.2 + theta * 7.03))
    eta = np.exp(-0.6618) * theta**1.3
    tau = theta * -5.53 + 5.32
    stat = float(L / (1.0 + eta * np.exp(rho * tau)))

    r = _rho_bucket(rho)
    crits = {}
    for alpha, table in _CV.items():
        crits[alpha] = float(np.interp(n_eff, _NS, np.array(table[r])))
    if stat > crits[0.01]:
        verdict = "Pseudo p-value < 0.01 *** (H0 is rejected)"
    elif stat > crits[0.05]:
        verdict = "Pseudo p-value < 0.05 ** (H0 is rejected)"
    elif stat > crits[0.10]:
        verdict = "Pseudo p-value < 0.10 * (H0 is rejected)"
    else:
        verdict = "Pseudo p-value > 0.10 (H0 is not rejected)"
    return {
        "smaup": stat,
        "critical_01": crits[0.01],
        "critical_05": crits[0.05],
        "critical_1": crits[0.10],
        "summary": warning + verdict,
    }
