"""URL / domain operators — the provenance axis of web-corpus curation.

Every released web corpus (C4, CCNet, RefinedWeb, Dolma) filters and
rebalances by URL: parse → normalize (strip fragments + tracking params)
→ registered-domain rollups → domain blocklists. The reference engine has
no web axis at all (solarpos is a solar-position CLI); these operators
exist for the 100 TB training-data pipeline the SURVEY §2 extension
targets.

Design notes (scale):

- Parsing is a pure JVM projection: chained ``regexp_extract`` over a
  conservative engine-portable regex subset (no lookaround/backrefs —
  the same pattern must behave identically under Java regex and RE2,
  like text.PII_PATTERNS). Zero shuffle, scan-level, linear in bytes.
- Registered-domain extraction uses ``substring_index`` over the last
  2-3 labels with a small second-level public-suffix table — literal
  ``isin`` (a dozen entries), no join.
- Blocklist filtering is subdomain-aware WITHOUT a per-pattern regex
  scan: each host explodes into its O(#labels) dot-suffixes, which
  equi-join a broadcast blocklist relation — cost O(rows · labels)
  independent of blocklist size, vs the O(rows · patterns) LIKE-chain a
  naive filter would run. The blocklist side stays broadcast (domain
  blocklists are ~1e5 entries, KBs).
- Higher-order lambdas only ever reference their own lambda argument
  (never an outer non-trivial expression) — the CollapseProject/CSE trap
  documented in CLAUDE.md does not arise.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "PUBLIC_SUFFIX_2",
    "TRACKING_PARAM_PREFIXES",
    "url_parse",
    "domain_stats",
    "blocklist_filter",
]

#: Second-level public suffixes: a registrable domain under these is
#: three labels, not two ("bbc.co.uk", not "co.uk"). A deliberately
#: small, stable subset of the public-suffix list — swap in the full
#: Mozilla PSL as a broadcast relation for production coverage.
PUBLIC_SUFFIX_2: tuple[str, ...] = (
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "co.nz", "com.br", "com.mx", "co.in", "com.cn",
)

#: Query parameters dropped by normalization (click/campaign trackers —
#: the C4/CCNet canonicalization set). Matched by prefix against the
#: full ``key=value`` token.
TRACKING_PARAM_PREFIXES: tuple[str, ...] = (
    "utm_", "fbclid", "gclid", "msclkid", "mc_eid",
)

# engine-portable component patterns (Java regex == RE2 on these)
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)"
_QUERY_RE = r"\?([^#]*)"
_PORT_RE = r":([0-9]+)$"
_HOST_RE = r"^([^:]+)"


def _registered_domain(host: Column) -> Column:
    """Registrable domain of a lowercase host: last two labels, or last
    three when the two-label tail is a second-level public suffix."""
    n = F.size(F.split(host, r"[.]"))
    last2 = F.substring_index(host, ".", -2)
    last3 = F.substring_index(host, ".", -3)
    return (
        F.when((n >= 3) & last2.isin(*PUBLIC_SUFFIX_2), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )


def _normalized_query(query: Column) -> Column:
    """Tracking params dropped, remainder sorted — order-canonical, so
    equal resources compare equal whatever the emitter's param order.
    The lambda touches only its own argument (no outer-expression CSE
    trap); the sort makes the result deterministic."""
    parts = F.split(query, "&")
    keep = F.filter(
        parts,
        lambda x: (x != "")
        & ~F.startswith(x, F.lit(TRACKING_PARAM_PREFIXES[0]))
        & ~F.startswith(x, F.lit(TRACKING_PARAM_PREFIXES[1]))
        & ~F.startswith(x, F.lit(TRACKING_PARAM_PREFIXES[2]))
        & ~F.startswith(x, F.lit(TRACKING_PARAM_PREFIXES[3]))
        & ~F.startswith(x, F.lit(TRACKING_PARAM_PREFIXES[4])),
    )
    return F.array_join(F.array_sort(keep), "&")


def url_parse(
    df: DataFrame,
    *,
    url_col: str = "url",
    keep_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Parse + canonicalize a URL column in one zero-shuffle projection.

    Output per row: ``keep_cols…, url, scheme, host, port (nullable
    long), registered_domain, path, query_norm, url_norm`` where
    ``url_norm`` is the canonical form: lowercase scheme/host, default
    ports (80/443) stripped, empty path → "/", fragment dropped,
    tracking params removed and the rest sorted. Malformed rows (no
    ``scheme://``) parse to empty components rather than erroring — a
    100 TB crawl always contains junk rows, and a filter on
    ``scheme != ''`` downstream is cheaper than a task retry storm.

    Deliberate non-goals (keeps the regexes in the Java==RE2 portable
    subset): no userinfo (``user:pass@host`` folds into the host
    field), no bracketed IPv6 hosts, no percent-decoding. Crawl-scale
    corpora are overwhelmingly plain http(s) authorities; rows outside
    that profile parse conservatively rather than erroring.
    """
    url = F.col(url_col)
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    auth = F.regexp_extract(url, _AUTH_RE, 1)
    host = F.lower(F.regexp_extract(auth, _HOST_RE, 1))
    port_s = F.regexp_extract(auth, _PORT_RE, 1)
    path = F.regexp_extract(url, _PATH_RE, 1)
    query = F.regexp_extract(url, _QUERY_RE, 1)

    port = F.when(port_s != "", port_s.cast("long"))
    path_norm = F.when(path == "", F.lit("/")).otherwise(path)
    qn = _normalized_query(query)
    default_port = ((scheme == "http") & (port_s == "80")) | (
        (scheme == "https") & (port_s == "443"))
    url_norm = F.concat(
        scheme, F.lit("://"), host,
        F.when((port_s != "") & ~default_port,
               F.concat(F.lit(":"), port_s)).otherwise(""),
        path_norm,
        F.when(qn != "", F.concat(F.lit("?"), qn)).otherwise(""),
    )
    return df.select(
        *[F.col(c) for c in keep_cols],
        url.alias("url"),
        scheme.alias("scheme"),
        host.alias("host"),
        port.alias("port"),
        _registered_domain(host).alias("registered_domain"),
        path_norm.alias("path"),
        qn.alias("query_norm"),
        url_norm.alias("url_norm"),
    )


def domain_stats(
    parsed: DataFrame,
    *,
    domain_col: str = "registered_domain",
    host_col: str = "host",
    lang_col: str | None = "lang",
    chars_col: str | None = "n_chars",
) -> DataFrame:
    """Per-registered-domain corpus profile: the rollup a curation run
    consults before setting domain caps / mixture weights. One hash
    aggregation on the domain key (partial map-side combine; the key
    cardinality is #domains, far below #docs, so the shuffle carries the
    combined partials only). All metrics are integer-exact — the output
    hashes stably under any shuffle order."""
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.col(host_col)).alias("n_hosts"),
    ]
    if lang_col is not None:
        aggs.append(F.countDistinct(F.col(lang_col)).alias("n_langs"))
    if chars_col is not None:
        aggs.append(F.sum(F.col(chars_col)).cast("long")
                    .alias("total_chars"))
    return parsed.groupBy(F.col(domain_col).alias("domain")).agg(*aggs)


def blocklist_filter(
    parsed: DataFrame,
    blocked: Sequence[str],
    *,
    host_col: str = "host",
    key_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Drop rows whose host matches a blocklist entry exactly OR is any
    subdomain of one ("ads.example.com" is blocked by "example.com";
    "example.com" is NOT blocked by "ads.example.com"). Blocking a
    public suffix ("co.uk") blocks the whole zone.

    Scale shape: each host emits its O(#labels) dot-suffixes
    (posexplode + substring_index — relational, no lambda), the suffixes
    equi-join the broadcast blocklist, and matched keys anti-join back.
    Cost is O(rows · labels) regardless of blocklist size; a LIKE-chain
    alternative is O(rows · patterns) and unshippable at 1e5 patterns.
    """
    spark = parsed.sparkSession
    blocked_df = spark.createDataFrame(
        [(b.lower(),) for b in blocked], "suffix string")

    labels = F.split(F.col(host_col), r"[.]")
    with_n = parsed.select(
        *[F.col(c) for c in key_cols], F.col(host_col),
        F.size(labels).alias("_n"))
    sufs = with_n.select(
        *[F.col(c) for c in key_cols],
        F.posexplode(F.split(F.col(host_col), r"[.]"))
        .alias("_pos", "_lab"),
        F.col(host_col), F.col("_n"),
    ).select(
        *[F.col(c) for c in key_cols],
        F.expr(f"substring_index({host_col}, '.', -(_n - _pos))")
        .alias("suffix"),
    )
    hit_keys = (
        sufs.join(F.broadcast(blocked_df), "suffix", "left_semi")
        .select(*[F.col(c) for c in key_cols]).distinct()
    )
    return parsed.join(hit_keys, list(key_cols), "left_anti")
