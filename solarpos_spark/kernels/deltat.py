"""Delta-T (TT - UT1) estimation, Espenak & Meeus (2006) polynomials.

The reference's `--deltat` bare flag estimates deltaT from the date
(/root/reference/src/main/java/net/e175/klaus/solarpos/Main.java:214-216,
delegating to solarpositioning's DeltaT.estimate, documented as the
Espenak/Meeus "Five Millennium Canon of Solar Eclipses" expressions).
No reference golden pins an estimated-deltaT *value* (the polar goldens use
deltaT=0 and the year/month cardinality tests only count rows), so this is a
faithful implementation of the published piecewise polynomials.

Vectorized: input is decimal year (year + (month - 0.5) / 12), output seconds.
"""

from __future__ import annotations

import numpy as np


def decimal_year(year: np.ndarray, month: np.ndarray) -> np.ndarray:
    """Espenak/Meeus convention: y = year + (month - 0.5)/12."""
    return np.asarray(year, dtype=np.float64) + (np.asarray(month, dtype=np.float64) - 0.5) / 12.0


def estimate(y: np.ndarray) -> np.ndarray:
    """DeltaT in seconds for decimal year(s) y (piecewise, -500..3000+)."""
    y = np.atleast_1d(np.asarray(y, dtype=np.float64))
    out = np.empty_like(y)

    def poly(t, coeffs):
        r = np.zeros_like(t)
        for c in reversed(coeffs):
            r = r * t + c
        return r

    conds = [
        y < -500,
        (y >= -500) & (y < 500),
        (y >= 500) & (y < 1600),
        (y >= 1600) & (y < 1700),
        (y >= 1700) & (y < 1800),
        (y >= 1800) & (y < 1860),
        (y >= 1860) & (y < 1900),
        (y >= 1900) & (y < 1920),
        (y >= 1920) & (y < 1941),
        (y >= 1941) & (y < 1961),
        (y >= 1961) & (y < 1986),
        (y >= 1986) & (y < 2005),
        (y >= 2005) & (y < 2050),
        (y >= 2050) & (y < 2150),
        y >= 2150,
    ]
    u_before = (y - 1820.0) / 100.0
    funcs = [
        -20.0 + 32.0 * u_before**2,  # y < -500
        poly((y - 0.0) / 100.0, [10583.6, -1014.41, 33.78311, -5.952053,
                                 -0.1798452, 0.022174192, 0.0090316521]),
        poly((y - 1000.0) / 100.0, [1574.2, -556.01, 71.23472, 0.319781,
                                    -0.8503463, -0.005050998, 0.0083572073]),
        poly(y - 1600.0, [120.0, -0.9808, -0.01532, 1.0 / 7129.0]),
        poly(y - 1700.0, [8.83, 0.1603, -0.0059285, 0.00013336, -1.0 / 1174000.0]),
        poly(y - 1800.0, [13.72, -0.332447, 0.0068612, 0.0041116, -0.00037436,
                          0.0000121272, -0.0000001699, 0.000000000875]),
        poly(y - 1860.0, [7.62, 0.5737, -0.251754, 0.01680668, -0.0004473624,
                          1.0 / 233174.0]),
        poly(y - 1900.0, [-2.79, 1.494119, -0.0598939, 0.0061966, -0.000197]),
        poly(y - 1920.0, [21.20, 0.84493, -0.076100, 0.0020936]),
        poly(y - 1950.0, [29.07, 0.407, -1.0 / 233.0, 1.0 / 2547.0]),
        poly(y - 1975.0, [45.45, 1.067, -1.0 / 260.0, -1.0 / 718.0]),
        poly(y - 2000.0, [63.86, 0.3345, -0.060374, 0.0017275, 0.000651814,
                          0.00002373599]),
        poly(y - 2000.0, [62.92, 0.32217, 0.005589]),
        -20.0 + 32.0 * ((y - 1820.0) / 100.0) ** 2 - 0.5628 * (2150.0 - y),
        -20.0 + 32.0 * u_before**2,
    ]
    out = np.select(conds, funcs)
    return out
