"""Locks the generated SQL oracles against the numpy kernels on random
inputs (pure DuckDB + numpy — no Spark, runs in seconds).

This is the regression guard for solarpos_spark/oracle_sql.py: any drift
between the kernel implementations and the generated SQL (coefficient
tables, mod semantics, interpolation, refraction guards) fails here before
it can fail in the driver's gate.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from solarpos_spark import oracle_sql
from solarpos_spark.kernels import grena3, spa, sunrise

N = 400
BASE = ("SELECT rid, usec, lat, lon, 0.0 AS elevation, 1013.0 AS pressure, "
        "15.0 AS temperature, 69.0 AS delta_t FROM inp")


@pytest.fixture(scope="module")
def rand_inputs():
    rng = np.random.default_rng(123)
    return {
        "rid": np.arange(N),
        "usec": rng.integers(1577836800, 1924991999, N),
        "lat": np.round(rng.uniform(-88, 88, N), 5),
        "lon": np.round(rng.uniform(-180, 180, N), 5),
    }


@pytest.fixture(scope="module")
def con(rand_inputs):
    c = duckdb.connect()
    c.register("inp", pd.DataFrame(rand_inputs))
    return c


def test_spa_sql_matches_kernel(con, rand_inputs):
    r = con.sql(oracle_sql.spa_sql(BASE) + " ORDER BY rid").df()
    az, zen = spa.solar_position(
        rand_inputs["usec"].astype(float), rand_inputs["lat"],
        rand_inputs["lon"], 0.0, 69.0, 1013.0, 15.0)
    assert np.array_equal(np.round(az, 5), r["azimuth"].to_numpy())
    assert np.array_equal(np.round(zen, 5), r["zenith"].to_numpy())


def test_spa_sql_no_refraction(con, rand_inputs):
    r = con.sql(oracle_sql.spa_sql(BASE, refraction=False)
                + " ORDER BY rid").df()
    az, zen = spa.solar_position(
        rand_inputs["usec"].astype(float), rand_inputs["lat"],
        rand_inputs["lon"], 0.0, 69.0)
    assert np.array_equal(np.round(zen, 5), r["zenith"].to_numpy())


def test_grena3_sql_matches_kernel(con, rand_inputs):
    r = con.sql(oracle_sql.grena3_sql(BASE) + " ORDER BY rid").df()
    az, zen = grena3.solar_position(
        rand_inputs["usec"].astype(float), rand_inputs["lat"],
        rand_inputs["lon"], 69.0, 1013.0, 15.0)
    assert np.array_equal(np.round(az, 5), r["azimuth"].to_numpy())
    assert np.array_equal(np.round(zen, 5), r["zenith"].to_numpy())


def test_sunrise_sql_matches_kernel(con, rand_inputs):
    day0 = (rand_inputs["usec"] // 86400) * 86400
    con.register("inp2", pd.DataFrame({
        "rid": rand_inputs["rid"], "day0": day0,
        "lat": rand_inputs["lat"], "lon": rand_inputs["lon"]}))
    q = oracle_sql.sunrise_sql(
        "SELECT rid, day0, lat, lon, 69.0 AS delta_t FROM inp2")
    r = con.sql(q + " ORDER BY rid").df()
    res = sunrise.sunrise_transit_set(day0.astype(float), rand_inputs["lat"],
                                      rand_inputs["lon"], 69.0)
    kinds = np.array(["NORMAL", "ALL_DAY", "ALL_NIGHT"])[res.kind[:, 0]]
    assert np.array_equal(kinds, r["type"].to_numpy())
    assert np.array_equal(day0 + np.floor(res.transit).astype(np.int64),
                          r["transit_usec"].to_numpy())
    normal = kinds == "NORMAL"
    got_rise = r["sunrise_usec"].to_numpy(dtype="float64", na_value=np.nan)
    want_rise = np.where(normal, day0 + np.floor(res.sunrise[:, 0]), np.nan)
    assert np.array_equal(np.nan_to_num(want_rise, nan=-1),
                          np.nan_to_num(got_rise, nan=-1))
