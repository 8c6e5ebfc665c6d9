"""ANSI-SQL oracles for the astronomy kernels, generated from the same
coefficient tables as the numpy implementation (single source of truth).

The driver's correctness gate runs each Spark query against a DuckDB oracle;
solar position is not built into any SQL engine, so we *generate* the full
NREL SPA (and Grena3) as scalar SQL from :mod:`solarpos_spark.kernels.spa`'s
tables. The SQL mirrors the reference's per-timestamp hoisting
(PositionCommand.java:228-257) relationally: time-dependent terms are
computed once per DISTINCT (unix_sec, delta_t) in a CTE and joined back —
the same plan shape the Spark engine gets for free inside the Arrow batch.

All outputs are rounded to the reference's output precision (5 decimals,
SerializerRegistry.forCsv) so libm ULP differences between numpy and DuckDB
cannot break value-hash equality.
"""

from __future__ import annotations

import numpy as np

from .kernels import spa as _spa

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _series_sql(terms: np.ndarray) -> str:
    """sum(A * cos(B + C*jme)) as one SQL expression."""
    parts = []
    for a, b, c in terms:
        if c == 0.0 and b == 0.0:
            parts.append(f"{a!r}")
        elif c == 0.0:
            parts.append(f"{a!r}*cos({b!r})")
        else:
            parts.append(f"{a!r}*cos({b!r} + {c!r}*jme)")
    return "(" + " + ".join(parts) + ")"


def _nutation_sql() -> tuple[str, str]:
    """(dpsi, deps) expressions over columns x0..x4 and jce."""
    dpsi_terms, deps_terms = [], []
    for row in _spa._NUTATION:
        y = row[0:5]
        a, b, c, d = row[5], row[6], row[7], row[8]
        arg_terms = [
            f"{int(yi)}*x{j}" for j, yi in enumerate(y) if yi != 0
        ]
        arg = "radians(" + (" + ".join(arg_terms) if arg_terms else "0") + ")"
        coef_a = f"({a!r} + {b!r}*jce)" if b != 0 else f"{a!r}"
        dpsi_terms.append(f"{coef_a}*sin({arg})")
        if c != 0 or d != 0:
            coef_c = f"({c!r} + {d!r}*jce)" if d != 0 else f"{c!r}"
            deps_terms.append(f"{coef_c}*cos({arg})")
    dpsi = "(" + " + ".join(dpsi_terms) + ")/36000000.0"
    deps = "(" + " + ".join(deps_terms) + ")/36000000.0"
    return dpsi, deps


def _lim360(x: str) -> str:
    """Normalize degrees to [0, 360) with EXACT remainder semantics.

    ``fmod`` computes the remainder exactly (IEEE) — matching numpy's
    ``np.mod``; the naive ``x - floor(x/360)*360`` loses ~ulp(x) which for
    sidereal-time magnitudes (~1e5 deg) is 1e-11 and visibly flips rounded
    output digits."""
    return f"(CASE WHEN fmod({x}, 360.0) < 0 THEN fmod({x}, 360.0) + 360.0 ELSE fmod({x}, 360.0) END)"


# ---------------------------------------------------------------------------
# SPA
# ---------------------------------------------------------------------------


def _lim180pm(x: str) -> str:
    """Normalize degrees to (-180, 180] matching julian.limit_degrees180pm."""
    d = _lim360(x)
    return f"(CASE WHEN {d} > 180.0 THEN {d} - 360.0 ELSE {d} END)"


def _lim01(x: str) -> str:
    """Normalize a day fraction to [0,1) with exact fmod (np.mod parity)."""
    return (f"(CASE WHEN fmod({x}, 1.0) < 0 THEN fmod({x}, 1.0) + 1.0 "
            f"ELSE fmod({x}, 1.0) END)")


def time_dependent_chain(src: str, prefix: str = "spa") -> str:
    """CTE chain text mapping rows of ``src`` (columns: usec, delta_t, ...)
    to geocentric alpha/delta + apparent sidereal time nu + radius r_au.

    The relational mirror of kernels/spa.time_dependent_parts — compute once
    per DISTINCT instant, join back (the reference's hoisting,
    PositionCommand.java:228-257)."""
    l0 = _series_sql(_spa._L0)
    l1 = _series_sql(_spa._L1)
    l2 = _series_sql(_spa._L2)
    l3 = _series_sql(_spa._L3)
    l4 = _series_sql(_spa._L4)
    l5 = _series_sql(_spa._L5)
    b0 = _series_sql(_spa._B0)
    b1 = _series_sql(_spa._B1)
    r0 = _series_sql(_spa._R0)
    r1 = _series_sql(_spa._R1)
    r2 = _series_sql(_spa._R2)
    r3 = _series_sql(_spa._R3)
    r4 = _series_sql(_spa._R4)
    dpsi, deps = _nutation_sql()
    p = prefix
    return f"""
{p}_jd AS (
  SELECT *,
         usec/86400.0 + 2440587.5 AS jd,
         (usec/86400.0 + 2440587.5 - 2451545.0)/36525.0 AS jc,
         (usec/86400.0 + 2440587.5 + delta_t/86400.0 - 2451545.0)/36525.0 AS jce,
         ((usec/86400.0 + 2440587.5 + delta_t/86400.0 - 2451545.0)/36525.0)/10.0 AS jme
  FROM {src}
),
{p}_lbr AS (
  SELECT *,
    ({l0} + jme*({l1} + jme*({l2} + jme*({l3} + jme*({l4} + jme*{l5})))))/1e8 AS l_rad,
    ({b0} + jme*{b1})/1e8 AS b_rad,
    ({r0} + jme*({r1} + jme*({r2} + jme*({r3} + jme*{r4}))))/1e8 AS r_au,
    297.85036 + jce*(445267.111480 + jce*(-0.0019142 + jce/189474.0)) AS x0,
    357.52772 + jce*(35999.050340 + jce*(-0.0001603 - jce/300000.0)) AS x1,
    134.96298 + jce*(477198.867398 + jce*(0.0086972 + jce/56250.0)) AS x2,
    93.27191 + jce*(483202.017538 + jce*(-0.0036825 + jce/327270.0)) AS x3,
    125.04452 + jce*(-1934.136261 + jce*(0.0020708 + jce/450000.0)) AS x4
  FROM {p}_jd
),
{p}_nut AS (
  SELECT *, {dpsi} AS dpsi, {deps} AS deps FROM {p}_lbr
),
{p}_geo AS (
  SELECT *,
    {_lim360("degrees(l_rad) + 180.0")} AS theta,
    -degrees(b_rad) AS beta,
    (84381.448 + (jme/10.0)*(-4680.93 + (jme/10.0)*(-1.55 + (jme/10.0)*(1999.25
      + (jme/10.0)*(-51.38 + (jme/10.0)*(-249.67 + (jme/10.0)*(-39.05
      + (jme/10.0)*(7.12 + (jme/10.0)*(27.87 + (jme/10.0)*(5.79
      + (jme/10.0)*2.45))))))))))/3600.0 + deps AS epsilon,
    -20.4898/(3600.0*r_au) AS dtau,
    {_lim360("280.46061837 + 360.98564736629*(jd - 2451545.0) + jc*jc*(0.000387933 - jc/38710000.0)")} AS nu0
  FROM {p}_nut
),
{p}_td AS (
  SELECT * EXCLUDE (jd, jc, jce, jme, l_rad, b_rad, x0, x1, x2, x3, x4,
                    dpsi, deps, theta, beta, epsilon, dtau, nu0),
    nu0 + dpsi*cos(radians(epsilon)) AS nu,
    {_lim360("degrees(atan2(sin(radians(theta + dpsi + dtau))*cos(radians(epsilon))"
             " - tan(radians(beta))*sin(radians(epsilon)),"
             " cos(radians(theta + dpsi + dtau))))")} AS alpha,
    degrees(asin(sin(radians(beta))*cos(radians(epsilon))
      + cos(radians(beta))*sin(radians(epsilon))*sin(radians(theta + dpsi + dtau)))) AS delta
  FROM {p}_geo
)"""


def spa_sql(base_cte: str, *, refraction: bool = True,
            round_digits: int = 5) -> str:
    """Full SPA as SQL.

    ``base_cte`` must be a SELECT producing columns:
    ``usec BIGINT, lat DOUBLE, lon DOUBLE, elevation DOUBLE,
    pressure DOUBLE, temperature DOUBLE, delta_t DOUBLE`` plus any
    passthrough columns (kept via ``b.*``).
    Emits columns ``azimuth, zenith`` rounded to ``round_digits``.
    """
    refr_sql = (
        """
        CASE WHEN e0 >= -0.83337 THEN
            (pressure/1010.0)*(283.0/(273.0+temperature))
            *1.02/(60.0*tan(radians(e0 + 10.3/(e0 + 5.11))))
        ELSE 0.0 END
        """
        if refraction
        else "0.0"
    )
    chain = time_dependent_chain("spa_tdist", "spa")

    return f"""
WITH spa_base AS ({base_cte}),
spa_tdist AS (SELECT DISTINCT usec, delta_t FROM spa_base),
{chain},
spa_loc AS (
  SELECT b.*, t.nu, t.alpha, t.delta, t.r_au,
    {_lim360("t.nu + b.lon - t.alpha")} AS h_deg,
    8.794/(3600.0*t.r_au) AS xi,
    atan(0.99664719*tan(radians(b.lat))) AS u_rad
  FROM spa_base b JOIN spa_td t USING (usec, delta_t)
),
spa_topo1 AS (
  SELECT *,
    cos(u_rad) + elevation/6378140.0*cos(radians(lat)) AS x_term,
    0.99664719*sin(u_rad) + elevation/6378140.0*sin(radians(lat)) AS y_term
  FROM spa_loc
),
spa_topo2 AS (
  SELECT *,
    atan2(-x_term*sin(radians(xi))*sin(radians(h_deg)),
          cos(radians(delta)) - x_term*sin(radians(xi))*cos(radians(h_deg))) AS dalpha_rad
  FROM spa_topo1
),
spa_topo3 AS (
  SELECT *,
    atan2((sin(radians(delta)) - y_term*sin(radians(xi)))*cos(dalpha_rad),
          cos(radians(delta)) - x_term*sin(radians(xi))*cos(radians(h_deg))) AS delta_p_rad,
    radians(h_deg) - dalpha_rad AS h_p_rad
  FROM spa_topo2
),
spa_elev AS (
  SELECT *,
    degrees(asin(sin(radians(lat))*sin(delta_p_rad)
      + cos(radians(lat))*cos(delta_p_rad)*cos(h_p_rad))) AS e0
  FROM spa_topo3
),
spa_out AS (
  SELECT *,
    90.0 - (e0 + {refr_sql}) AS zenith_raw,
    {_lim360(_lim360("degrees(atan2(sin(h_p_rad),"
                     " cos(h_p_rad)*sin(radians(lat)) - tan(delta_p_rad)*cos(radians(lat))))")
             + " + 180.0")} AS azimuth_raw
  FROM spa_elev
)
SELECT * EXCLUDE (nu, alpha, delta, r_au, h_deg, xi, u_rad, x_term, y_term,
                  dalpha_rad, delta_p_rad, h_p_rad, e0, zenith_raw, azimuth_raw),
       round(azimuth_raw, {round_digits}) AS azimuth,
       round(zenith_raw, {round_digits}) AS zenith
FROM spa_out
"""


# ---------------------------------------------------------------------------
# Grena3
# ---------------------------------------------------------------------------


def grena3_sql(base_cte: str, *, round_digits: int = 5) -> str:
    """Grena algorithm 3 as SQL; same base contract as :func:`spa_sql`
    (elevation ignored — Grena3 takes none, PositionCommand.java:284-297)."""
    return f"""
WITH g_base AS ({base_cte}),
g_t AS (
  SELECT *,
    floor(usec/86400.0) - 32872.0 AS gdays,  -- 2060-01-01 epoch = 32872 days
    (usec - floor(usec/86400.0)*86400.0)/3600.0 AS ghours
  FROM g_base
),
g_t2 AS (
  SELECT *, gdays + 0.0416667*ghours AS t
  FROM g_t
),
g_te AS (SELECT *, t + 1.1574e-5*delta_t AS te FROM g_t2),
g_lam0 AS (
  SELECT *,
    -1.388803 + 1.720279216e-2*te
      + 3.3366e-2*sin(0.0172019715*te - 0.06172)
      + 3.53e-4*sin(2.0*0.0172019715*te - 0.1163) AS lam_raw,
    4.089567e-1 - 6.19e-9*te AS eps
  FROM g_te
),
g_lam AS (
  -- exact mod-2pi reduction before transcendentals (see kernels/grena3.py)
  SELECT *,
    CASE WHEN fmod(lam_raw, 2*pi()) < 0 THEN fmod(lam_raw, 2*pi()) + 2*pi()
         ELSE fmod(lam_raw, 2*pi()) END AS lam
  FROM g_lam0
),
g_ad AS (
  SELECT *,
    CASE WHEN atan2(sin(lam)*sqrt(1.0 - sin(eps)*sin(eps)), cos(lam)) < 0
         THEN atan2(sin(lam)*sqrt(1.0 - sin(eps)*sin(eps)), cos(lam)) + 2*pi()
         ELSE atan2(sin(lam)*sqrt(1.0 - sin(eps)*sin(eps)), cos(lam)) END AS alpha,
    asin(sin(lam)*sin(eps)) AS delta
  FROM g_lam
),
g_h0 AS (
  SELECT *,
    1.7528311
    + (CASE WHEN fmod(6.300388099*t, 2*pi()) < 0
            THEN fmod(6.300388099*t, 2*pi()) + 2*pi()
            ELSE fmod(6.300388099*t, 2*pi()) END)
    + radians(lon) - alpha + pi() AS h_raw
  FROM g_ad
),
g_h AS (
  SELECT *,
    CASE WHEN fmod(h_raw, 2*pi()) < 0
         THEN fmod(h_raw, 2*pi()) + 2*pi() - pi()
         ELSE fmod(h_raw, 2*pi()) - pi()
    END AS h
  FROM g_h0
),
g_topo AS (
  SELECT *,
    sin(radians(lat))*sin(delta) + cos(radians(lat))*cos(delta)*cos(h) AS se0
  FROM g_h
),
g_ep AS (
  SELECT *,
    asin(se0) - 4.26e-5*sqrt(1.0 - se0*se0) AS ep,
    atan2(sin(h), cos(h)*sin(radians(lat)) - sin(delta)*cos(radians(lat))/cos(delta)) AS gamma
  FROM g_topo
),
g_out AS (
  SELECT *,
    CASE WHEN ep > 0.0 THEN
      (0.08422*(pressure/1000.0))/((273.0+temperature)*tan(ep + 0.003138/(ep + 0.08919)))
    ELSE 0.0 END AS de
  FROM g_ep
)
SELECT * EXCLUDE (gdays, ghours, t, te, lam_raw, lam, eps, alpha, delta,
                  h_raw, h, se0, ep, gamma, de),
  round((degrees(gamma + pi()) - floor(degrees(gamma + pi())/360.0)*360.0), {round_digits}) AS azimuth,
  round(degrees(pi()/2.0 - ep - de), {round_digits}) AS zenith
FROM g_out
"""


# ---------------------------------------------------------------------------
# Sunrise / transit / set (NREL A.2), mirroring kernels/sunrise.py
# ---------------------------------------------------------------------------


def _interp_sql(vm: str, v0: str, vp: str, n: str) -> str:
    """A.2 three-point interpolation with the NREL wrap guard
    (kernels/sunrise._interpolate parity: |a|,|b| >= 2 -> frac part)."""
    a = (f"(CASE WHEN abs({v0}-{vm}) >= 2.0 "
         f"THEN ({v0}-{vm}) - floor({v0}-{vm}) ELSE ({v0}-{vm}) END)")
    b = (f"(CASE WHEN abs({vp}-{v0}) >= 2.0 "
         f"THEN ({vp}-{v0}) - floor({vp}-{v0}) ELSE ({vp}-{v0}) END)")
    return f"({v0} + {n}*({a} + {b} + ({b} - {a})*{n})/2.0)"


def sunrise_sql(base_cte: str, *, horizon: float = -0.8333) -> str:
    """NREL SPA A.2 rise/transit/set as SQL.

    ``base_cte`` must produce ``day0 BIGINT`` (unix sec of 0h UT of the
    target calendar date), ``lat, lon, delta_t`` plus passthrough columns.
    Emits: passthrough..., ``type`` (NORMAL|ALL_DAY|ALL_NIGHT) and
    ``sunrise_usec/transit_usec/sunset_usec`` BIGINT unix seconds
    (truncated, NULL where not applicable) — matching
    operators/sunrise.py output exactly.
    """
    chain = time_dependent_chain("sr_inst", "srtd")
    h0p = repr(horizon)

    def event(mi: str, tag: str) -> str:
        nui = f"(nu + 360.985647*{mi})"
        ni = f"({mi} + delta_t/86400.0)"
        a_i = _interp_sql("am", "a0", "ap", ni)
        d_i = _interp_sql("dm", "d0v", "dp", ni)
        return f"""
sr_{tag}1 AS (
  SELECT *, {a_i} AS a_{tag}, {d_i} AS d_{tag},
         {_lim180pm(f"{nui} + lon - {a_i}")} AS hp_{tag}
  FROM sr_{'m12' if tag == 'r' else 'r9'}
),
sr_{tag}9 AS (
  SELECT *,
    ({mi} + (degrees(asin(sin(radians(lat))*sin(radians(d_{tag}))
       + cos(radians(lat))*cos(radians(d_{tag}))*cos(radians(hp_{tag})))) - {h0p})
      /(360.0*cos(radians(d_{tag}))*cos(radians(lat))*sin(radians(hp_{tag})))
    )*86400.0 AS {tag}_sec
  FROM sr_{tag}1
)"""

    return f"""
WITH sr_base AS ({base_cte}),
sr_days AS (SELECT DISTINCT day0, delta_t AS key_dt FROM sr_base),
sr_inst AS (
  SELECT day0, key_dt, CAST(day0 AS BIGINT) AS usec, key_dt AS delta_t, 'n' AS role FROM sr_days
  UNION ALL SELECT day0, key_dt, day0 - 86400, 0.0, 'm' FROM sr_days
  UNION ALL SELECT day0, key_dt, day0, 0.0, 'z' FROM sr_days
  UNION ALL SELECT day0, key_dt, day0 + 86400, 0.0, 'p' FROM sr_days
),
{chain},
sr_piv AS (
  SELECT day0, key_dt,
    max(CASE WHEN role='n' THEN nu END) AS nu,
    max(CASE WHEN role='m' THEN alpha END) AS am,
    max(CASE WHEN role='z' THEN alpha END) AS a0,
    max(CASE WHEN role='p' THEN alpha END) AS ap,
    max(CASE WHEN role='m' THEN delta END) AS dm,
    max(CASE WHEN role='z' THEN delta END) AS d0v,
    max(CASE WHEN role='p' THEN delta END) AS dp
  FROM srtd_td GROUP BY day0, key_dt
),
sr_j AS (
  SELECT b.*, p.nu, p.am, p.a0, p.ap, p.dm, p.d0v, p.dp
  FROM sr_base b JOIN sr_piv p ON b.day0 = p.day0 AND b.delta_t = p.key_dt
),
sr_m0 AS (SELECT *, {_lim01("(a0 - lon - nu)/360.0")} AS m0 FROM sr_j),
sr_tr AS (
  SELECT *,
    (m0 - {_lim180pm(f"(nu + 360.985647*m0) + lon - {_interp_sql('am', 'a0', 'ap', '(m0 + delta_t/86400.0)')}")}
     /360.0)*86400.0 AS transit_sec,
    (sin(radians({h0p})) - sin(radians(lat))*sin(radians(d0v)))
      /(cos(radians(lat))*cos(radians(d0v))) AS harg
  FROM sr_m0
),
sr_h0 AS (
  SELECT *, degrees(acos(CASE WHEN harg > 1.0 THEN 1.0
                              WHEN harg < -1.0 THEN -1.0 ELSE harg END)) AS h0
  FROM sr_tr
),
sr_m12 AS (
  SELECT *, {_lim01("m0 - h0/360.0")} AS m1, {_lim01("m0 + h0/360.0")} AS m2
  FROM sr_h0
),
{event('m1', 'r')},
{event('m2', 's')},
sr_final AS (
  SELECT *,
    CASE WHEN harg < -1.0 THEN 'ALL_DAY'
         WHEN harg > 1.0 THEN 'ALL_NIGHT'
         ELSE 'NORMAL' END AS type
  FROM sr_s9
)
SELECT * EXCLUDE (nu, am, a0, ap, dm, d0v, dp, m0, transit_sec, harg, h0,
                  m1, m2, a_r, d_r, hp_r, r_sec, a_s, d_s, hp_s, s_sec, type),
  type,
  CAST(day0 + floor(transit_sec) AS BIGINT) AS transit_usec,
  CASE WHEN type = 'NORMAL' THEN CAST(day0 + floor(r_sec) AS BIGINT) END AS sunrise_usec,
  CASE WHEN type = 'NORMAL' THEN CAST(day0 + floor(s_sec) AS BIGINT) END AS sunset_usec
FROM sr_final
"""
