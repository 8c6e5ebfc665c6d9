"""Property-based sunrise-solver invariants (hypothesis over lat/date).

The golden tests pin exact values; these pin the *structural* contract of
the A.2 solver across the whole input domain (SunriseCommand.java:176-196
sum-type semantics):

* transit is always finite and inside the UT day,
* NORMAL days have finite sunrise < transit < sunset (with the dateline
  wrap tolerance the solver documents),
* ALL_DAY / ALL_NIGHT days have NaN sunrise and sunset,
* horizons are nested: if the sun never reaches -0.8333 deg it cannot reach
  -6/-12/-18 either (an ALL_NIGHT srss day forces ALL_NIGHT-or-NORMAL
  twilights consistently; a deeper horizon's day is never "more dark"),
* tropical latitudes in mid-range years are always NORMAL at srss.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from solarpos_spark.kernels import sunrise as k

HORIZONS = np.array([k.HORIZON_SUNRISE_SUNSET, k.HORIZON_CIVIL,
                     k.HORIZON_NAUTICAL, k.HORIZON_ASTRONOMICAL])

lat_strategy = st.floats(min_value=-89.0, max_value=89.0,
                         allow_nan=False, allow_infinity=False)
lon_strategy = st.floats(min_value=-180.0, max_value=180.0,
                         allow_nan=False, allow_infinity=False)
# 2000-01-01 .. 2050-12-31 in whole UT days
day_strategy = st.integers(min_value=10957, max_value=29585)


def _solve(lat, lon, epoch_day):
    day0 = np.array([epoch_day * 86400.0])
    return k.sunrise_transit_set(day0, np.array([lat]), np.array([lon]),
                                 np.array([69.0]), HORIZONS)


@settings(max_examples=150, deadline=None)
@given(lat=lat_strategy, lon=lon_strategy, day=day_strategy)
def test_solver_structural_invariants(lat, lon, day):
    r = _solve(lat, lon, day)
    # transit always finite, within a generous bracket of the UT day
    assert np.isfinite(r.transit[0])
    assert -86400.0 < r.transit[0] < 2 * 86400.0
    for j in range(len(HORIZONS)):
        kind = r.kind[0, j]
        sr, ss = r.sunrise[0, j], r.sunset[0, j]
        if kind == k.TYPE_NORMAL:
            assert np.isfinite(sr) and np.isfinite(ss)
            # events are seconds-of-day; near the dateline a morning event
            # can wrap to the other edge of the UT day, so only the
            # unwrapped ordering is asserted
            sr_u = sr if sr <= ss else sr - 86400.0
            assert sr_u < ss
        else:
            assert np.isnan(sr) and np.isnan(ss)


@settings(max_examples=150, deadline=None)
@given(lat=lat_strategy, lon=lon_strategy, day=day_strategy)
def test_horizon_nesting(lat, lon, day):
    """Deeper horizons are reached strictly earlier/later: if a shallow
    horizon is ALL_NIGHT (sun never gets that high), every deeper horizon
    the sun also fails to reach must not be ALL_DAY, and vice versa."""
    r = _solve(lat, lon, day)
    kinds = r.kind[0]  # ordered shallow -> deep: -0.83, -6, -12, -18
    for shallow, deep in zip(kinds[:-1], kinds[1:]):
        # never above the deep horizon -> cannot be all-day above a
        # shallower (higher) one; and always above the shallow horizon ->
        # cannot be all-night below a deeper (lower) one
        if deep == k.TYPE_ALL_NIGHT:
            assert shallow != k.TYPE_ALL_DAY
        if shallow == k.TYPE_ALL_DAY:
            assert deep != k.TYPE_ALL_NIGHT


@settings(max_examples=60, deadline=None)
@given(lat=st.floats(min_value=-20.0, max_value=20.0, allow_nan=False),
       lon=lon_strategy, day=day_strategy)
def test_tropics_always_normal_srss(lat, lon, day):
    r = _solve(lat, lon, day)
    assert r.kind[0, 0] == k.TYPE_NORMAL


@settings(max_examples=60, deadline=None)
@given(lon=lon_strategy, day=day_strategy)
def test_daylight_duration_monotone_with_horizon_depth(lon, day):
    """Where all horizons are NORMAL, the above-horizon interval must grow
    with horizon depth (astronomical dawn <= ... <= sunrise)."""
    r = _solve(45.0, lon, day)
    if not (r.kind[0] == k.TYPE_NORMAL).all():
        return
    dur = []
    for j in range(len(HORIZONS)):
        sr, ss = r.sunrise[0, j], r.sunset[0, j]
        d = ss - sr
        if d < 0:
            d += 86400.0
        dur.append(d)
    for shallow, deep in zip(dur[:-1], dur[1:]):
        assert deep >= shallow - 1e-6
