"""Grena (2012) algorithm #3 — fast solar position, vectorized in numpy.

Implements R. Grena, "Five new algorithms for the computation of sun position
from 2010 to 2110", Solar Energy 86 (2012) 1323-1337, algorithm #3 (~0.01 deg
accuracy over 2010-2110) — the reference's `--algorithm=grena3` path
(/root/reference/src/main/java/net/e175/klaus/solarpos/PositionCommand.java:284-297).

Inputs/outputs follow the same conventions as :mod:`.spa`:
Unix epoch seconds (UTC), degrees, hPa, Celsius.
"""

from __future__ import annotations

import numpy as np

DEG = np.pi / 180.0
PI = np.pi
PI2 = 2.0 * np.pi

#: Unix seconds of 2060-01-01T00:00:00Z minus nothing — Grena's t=0 epoch.
#: (int(365.25*59) + int(30.6001*14) - int(0.01*2059) + 1 - 21958 == 0)
_UNIX_2060 = 2840140800.0  # datetime(2060,1,1,tzinfo=UTC).timestamp()


def _calc_t(unix_sec: np.ndarray) -> np.ndarray:
    """Days from 2060-01-01T00:00:00 UT.

    Grena's integer-JD formula reduces to a plain Gregorian day count for
    2010-2110; the fractional day is ``0.0416667 * hours`` exactly as in the
    paper's published C code (the truncated constant — not h/24 — matters at
    the reference's 1e-6 deg output rounding).
    """
    u = np.asarray(unix_sec, dtype=np.float64)
    days = np.floor(u / 86400.0) - _UNIX_2060 / 86400.0
    hours = np.mod(u, 86400.0) / 3600.0
    return days + 0.0416667 * hours


def solar_position(
    unix_sec: np.ndarray,
    lat: np.ndarray,
    lon: np.ndarray,
    delta_t: np.ndarray | float = 0.0,
    pressure: np.ndarray | float | None = None,
    temperature: np.ndarray | float | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (azimuth, zenith) in degrees, azimuth from north in [0, 360)."""
    unix_sec = np.asarray(unix_sec, dtype=np.float64)
    n = unix_sec.shape[0]
    lat = np.broadcast_to(np.asarray(lat, dtype=np.float64), (n,))
    lon = np.broadcast_to(np.asarray(lon, dtype=np.float64), (n,))
    delta_t = np.broadcast_to(np.asarray(delta_t, dtype=np.float64), (n,))

    t = _calc_t(unix_sec)
    te = t + 1.1574e-5 * delta_t
    wa_te = 0.0172019715 * te

    # lam and the sidereal product are reduced mod 2*pi with EXACT remainders
    # before any transcendental: sin/asin/atan2 results are then insensitive
    # to cross-library argument-reduction ULP differences, keeping the numpy
    # kernel and the generated SQL oracle bit-aligned (values change by
    # <1e-15 rad, far inside the reference's 5e-7 deg output tolerance).
    lam = np.mod(
        -1.388803
        + 1.720279216e-2 * te
        + 3.3366e-2 * np.sin(wa_te - 0.06172)
        + 3.53e-4 * np.sin(2.0 * wa_te - 0.1163),
        PI2,
    )

    epsilon = 4.089567e-1 - 6.19e-9 * te

    s_lambda = np.sin(lam)
    c_lambda = np.cos(lam)
    s_epsilon = np.sin(epsilon)
    c_epsilon = np.sqrt(1.0 - s_epsilon * s_epsilon)

    alpha = np.arctan2(s_lambda * c_epsilon, c_lambda)
    alpha = np.where(alpha < 0.0, alpha + PI2, alpha)

    delta = np.arcsin(s_lambda * s_epsilon)

    h = 1.7528311 + np.mod(6.300388099 * t, PI2) + lon * DEG - alpha
    h = np.mod(h + PI, PI2) - PI

    s_phi = np.sin(lat * DEG)
    c_phi = np.sqrt(1.0 - s_phi * s_phi)
    s_delta = np.sin(delta)
    c_delta = np.sqrt(1.0 - s_delta * s_delta)
    s_h = np.sin(h)
    c_h = np.cos(h)

    s_epsilon0 = s_phi * s_delta + c_phi * c_delta * c_h
    # Parallax coefficient: the published 4.26e-5 rad (Grena 2012, alg. 3).
    # Matches the reference's Grena3 golden (PositionTest.java:78-79,
    # az 211.17436 / zen 66.0685) at the reference's %.5f output precision;
    # round 1 had over-calibrated 4.265e-5 against a 6-decimal reading of
    # that 5-decimal golden.
    e_p = np.arcsin(s_epsilon0) - 4.26e-5 * np.sqrt(1.0 - s_epsilon0 * s_epsilon0)
    gamma = np.arctan2(s_h, c_h * s_phi - s_delta * c_phi / c_delta)

    if pressure is not None and temperature is not None:
        pressure = np.broadcast_to(np.asarray(pressure, dtype=np.float64), (n,))
        temperature = np.broadcast_to(np.asarray(temperature, dtype=np.float64), (n,))
        de = np.where(
            e_p > 0.0,
            (0.08422 * (pressure / 1000.0))
            / ((273.0 + temperature) * np.tan(e_p + 0.003138 / (e_p + 0.08919))),
            0.0,
        )
    else:
        de = 0.0

    zenith = (PI / 2.0 - e_p - de) / DEG
    azimuth = np.mod((gamma + PI) / DEG, 360.0)
    return azimuth, zenith
