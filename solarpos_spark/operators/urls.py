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

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

__all__ = [
    "PUBLIC_SUFFIX_2",
    "PSL_ICANN_RULES",
    "PSL_PRIVATE_RULES",
    "TRACKING_PARAM_PREFIXES",
    "psl_rule_rows",
    "psl_relation",
    "url_parse",
    "domain_stats",
    "blocklist_filter",
    "LINK_HREF_RE",
    "extract_links",
]

#: Second-level public suffixes: a registrable domain under these is
#: three labels, not two ("bbc.co.uk", not "co.uk"). Kept as the plain
#: two-label tier of the embedded PSL snapshot below (and for
#: backwards-compatible imports).
PUBLIC_SUFFIX_2: tuple[str, ...] = (
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "co.nz", "com.br", "com.mx", "co.in", "com.cn",
)

#: Embedded Public Suffix List snapshot — ICANN section, in the PSL
#: file format (https://publicsuffix.org/list/): plain rules,
#: ``*.``-wildcard rules (match exactly one extra label), and
#: ``!``-exception rules (cancel a wildcard one label up). This is a
#: representative SNAPSHOT, not the full ~9k-rule list (no network in
#: this environment); the machinery below takes any iterable of rule
#: lines, so production swaps in the full Mozilla file verbatim via
#: ``psl_relation(spark, icann=open('public_suffix_list.dat'))``-style
#: preprocessing.
PSL_ICANN_RULES: tuple[str, ...] = PUBLIC_SUFFIX_2 + (
    "com", "org", "net", "edu", "gov", "mil", "int",
    "io", "de", "fr", "it", "nl", "uk", "jp", "au", "nz",
    "br", "mx", "in", "cn",
    # wildcard zones + their exceptions (the PSL's hardest semantics;
    # faithful to the real list: no plain "ck"/"kawasaki.jp" rule exists)
    "*.ck", "!www.ck",
    "*.kawasaki.jp", "!city.kawasaki.jp",
)

#: Embedded PSL snapshot — PRIVATE section: operator-submitted suffixes
#: under which unrelated parties register subdomains. Treating these as
#: public suffixes keeps per-domain rollups from merging every
#: ``*.github.io`` site into one "domain".
PSL_PRIVATE_RULES: tuple[str, ...] = (
    "github.io",
    "blogspot.com",
    "s3.amazonaws.com",
    "*.compute.amazonaws.com",
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


def psl_rule_rows(
    icann: Iterable[str] | None = None,
    private: Iterable[str] | None = None,
) -> list[tuple[str, int, bool, bool, bool, bool]]:
    """Parse PSL-format rule lines into merged relation rows
    ``(suffix_key, key_labels, plain, wildcard, exception, private)``.

    ``suffix_key`` is the literal label tail a host suffix equi-joins
    on: the rule itself for plain/exception rules, the rule minus the
    leading ``*.`` for wildcards (the ``*`` contributes one extra label
    at match time). Rows sharing a key merge flags (the real PSL has
    e.g. both a plain and a wildcard rule over one zone). Comment/blank
    lines (``//``, empty) are skipped so a raw public_suffix_list.dat
    body can be passed through unmodified.
    """
    merged: dict[str, list] = {}
    for tier_private, rules in ((False, icann if icann is not None
                                 else PSL_ICANN_RULES),
                                (True, private if private is not None
                                 else PSL_PRIVATE_RULES)):
        for raw in rules:
            rule = raw.strip().lower()
            if not rule or rule.startswith("//"):
                continue
            exc = rule.startswith("!")
            wild = rule.startswith("*.")
            key = rule[1:] if exc else (rule[2:] if wild else rule)
            row = merged.setdefault(
                key, [key, key.count(".") + 1, False, False, False,
                      tier_private])
            if exc:
                row[4] = True
            elif wild:
                row[3] = True
            else:
                row[2] = True
            row[5] = row[5] or tier_private
    return [tuple(r) for r in merged.values()]


def psl_relation(
    spark: SparkSession,
    icann: Iterable[str] | None = None,
    private: Iterable[str] | None = None,
) -> DataFrame:
    """The PSL as a broadcast-able relation (suffix, k, plain,
    wildcard, exc, priv) — KBs even at the full ~9k-rule list."""
    return spark.createDataFrame(
        psl_rule_rows(icann, private),
        "suffix string, k int, plain boolean, wildcard boolean, "
        "exc boolean, priv boolean")


def _psl_precedence(max_k: int) -> list[tuple[str, int, int]]:
    """The publicsuffix.org resolution order as (matched-flag column
    template, key depth k, resulting public-suffix label count):
    exception rules first (deepest first; public suffix = key minus its
    leftmost label), then wildcard/plain by total rule labels
    descending (a depth-k wildcard is a (k+1)-label rule). Shared by
    the Spark join chain and the generated DuckDB oracle CASE so both
    engines break ties identically."""
    order: list[tuple[str, int, int]] = []
    for k in range(max_k, 0, -1):
        order.append(("e", k, k - 1))
    for rl in range(max_k + 1, 0, -1):
        if 1 <= rl - 1 <= max_k:
            order.append(("w", rl - 1, rl))
        if rl <= max_k:
            order.append(("p", rl, rl))
    return order


def psl_resolution_sql(
    icann: Iterable[str] | None = None,
    private: Iterable[str] | None = None,
    *,
    labels_col: str = "labels",
    n_col: str = "n",
    max_rule_labels: int = 5,
) -> tuple[str, str]:
    """DuckDB CASE expressions ``(ps_labels, is_private)`` generated
    from the SAME rule rows and the SAME precedence order as the Spark
    join chain (the fmix32_sql discipline: one source of truth, two
    engines). Operates on a relation exposing ``labels_col`` (the
    host's dot-split label list) and ``n_col`` (its length); the last-k
    label tail is ``labels[n-k+1:n]`` joined with '.'. Within one
    (flag, depth) bucket a host suffix matches at most one key (keys
    are unique), so the private CASE may split a bucket into
    private/public key lists without affecting resolution order."""
    buckets: dict[tuple[str, int], list[tuple[str, bool]]] = {}
    for key, k, plain, wild, exc, priv in psl_rule_rows(icann, private):
        if plain:
            buckets.setdefault(("p", k), []).append((key, priv))
        if wild:
            buckets.setdefault(("w", k), []).append((key, priv))
        if exc:
            buckets.setdefault(("e", k), []).append((key, priv))
    ps_cases: list[str] = []
    priv_cases: list[str] = []
    for flag, k, out_labels in _psl_precedence(max_rule_labels):
        entries = sorted(buckets.get((flag, k), []))
        if not entries:
            continue
        lastk = (f"array_to_string({labels_col}"
                 f"[{n_col}-{k - 1}:{n_col}], '.')")
        need = k + 1 if flag == "w" else k
        all_in = ", ".join(f"'{s}'" for s, _ in entries)
        ps_cases.append(
            f"WHEN {n_col} >= {need} AND {lastk} IN ({all_in}) "
            f"THEN {out_labels}")
        for is_priv in (True, False):
            sub = [s for s, p in entries if p is is_priv]
            if sub:
                inlist = ", ".join(f"'{s}'" for s in sub)
                priv_cases.append(
                    f"WHEN {n_col} >= {need} AND {lastk} IN ({inlist}) "
                    f"THEN {str(is_priv).lower()}")
    ps_sql = "CASE " + " ".join(ps_cases) + " ELSE 1 END"
    priv_sql = "CASE " + " ".join(priv_cases) + " ELSE false END"
    return ps_sql, priv_sql


def _resolve_public_suffix(
    parsed: DataFrame,
    rules: DataFrame,
    *,
    host_col: str = "host",
    max_rule_labels: int = 5,
) -> DataFrame:
    """Attach ``_ps`` (public-suffix label count) and ``_priv`` (winning
    rule is private-tier) to a relation with a lowercase host column.

    Scale shape: one broadcast LEFT join per candidate depth k=1..K
    (K = deepest rule, 5 covers the real PSL) keyed on the host's
    last-k-labels suffix — zero exchanges on the probe side, so
    url_parse stays a scan-level projection however many rules the
    table carries. Precedence (exception > longest rule, wildcard
    needing one extra host label) folds into a single when-chain over
    the joined flags."""
    K = max_rule_labels
    hn = F.size(F.split(F.col(host_col), r"[.]"))
    cur = parsed.withColumn("_hn", hn)
    for k in range(1, K + 1):
        cur = cur.withColumn(
            f"_s{k}",
            F.when(F.col("_hn") >= k,
                   F.expr(f"substring_index({host_col}, '.', -{k})")))
        rk = rules.select(
            F.col("suffix").alias(f"_s{k}"),
            F.col("plain").alias(f"_p{k}"),
            F.col("wildcard").alias(f"_w{k}"),
            F.col("exc").alias(f"_e{k}"),
            F.col("priv").alias(f"_v{k}"),
        )
        cur = cur.join(F.broadcast(rk), [f"_s{k}"], "left")

    ps: Column | None = None
    priv: Column | None = None
    for flag, k, out_labels in _psl_precedence(K):
        cond = F.col(f"_{flag}{k}")
        if flag == "w":  # the * must consume one real host label
            cond = cond & (F.col("_hn") >= k + 1)
        ps = F.when(cond, F.lit(out_labels)) if ps is None \
            else ps.when(cond, F.lit(out_labels))
        pv = F.col(f"_v{k}")
        priv = F.when(cond, pv) if priv is None else priv.when(cond, pv)
    ps = ps.otherwise(F.lit(1))
    priv = priv.otherwise(F.lit(False))
    drop = [c for k in range(1, K + 1)
            for c in (f"_s{k}", f"_p{k}", f"_w{k}", f"_e{k}", f"_v{k}")]
    return (cur.withColumn("_ps", ps)
               .withColumn("_priv", priv)
               .drop(*drop))


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
    psl: DataFrame | None = None,
    max_rule_labels: int = 5,
) -> DataFrame:
    """Parse + canonicalize a URL column, scan-level (no exchange).

    Output per row: ``keep_cols…, url, scheme, host, port (nullable
    long), registered_domain, public_suffix, is_private_suffix, path,
    query_norm, url_norm`` where ``url_norm`` is the canonical form:
    lowercase scheme/host, default ports (80/443) stripped, empty path
    → "/", fragment dropped, tracking params removed and the rest
    sorted. Malformed rows (no ``scheme://``) parse to empty components
    rather than erroring — a 100 TB crawl always contains junk rows,
    and a filter on ``scheme != ''`` downstream is cheaper than a task
    retry storm.

    The registered domain is table-driven: ``psl`` (default: the
    embedded :data:`PSL_ICANN_RULES` + :data:`PSL_PRIVATE_RULES`
    snapshot via :func:`psl_relation`) resolves per the
    publicsuffix.org algorithm — exception rules beat wildcards beat
    shorter rules; a wildcard consumes one extra host label; the
    implicit ``*`` rule applies when nothing matches. The rules join as
    K broadcast LEFT joins (K = ``max_rule_labels``, 5 covers the real
    list), so the plan stays exchange-free at any rule count.
    ``is_private_suffix`` marks the winning rule as PRIVATE-section
    (e.g. ``github.io``) so rollups can choose either tier.

    The query component is extracted from the pre-fragment prefix, so
    a ``?`` inside a fragment (``/p#sec?x=1``) is not mistaken for a
    query string.

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
    # fragment stripped BEFORE the query regex: '?' inside a fragment
    # must not parse as a query (ADVICE r4)
    query = F.regexp_extract(
        F.regexp_extract(url, r"^[^#]*", 0), _QUERY_RE, 1)

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
    base = df.select(
        *[F.col(c) for c in keep_cols],
        url.alias("url"),
        scheme.alias("scheme"),
        host.alias("host"),
        port.alias("port"),
        path_norm.alias("path"),
        qn.alias("query_norm"),
        url_norm.alias("url_norm"),
    )
    rules = psl if psl is not None else psl_relation(df.sparkSession)
    resolved = _resolve_public_suffix(
        base, rules, max_rule_labels=max_rule_labels)
    reg = (F.when(F.col("_hn") > F.col("_ps"),
                  F.expr("substring_index(host, '.', -(_ps + 1))"))
           .otherwise(F.col("host")))
    pub = F.expr("substring_index(host, '.', -_ps)")
    return resolved.select(
        *[F.col(c) for c in keep_cols],
        "url", "scheme", "host", "port",
        reg.alias("registered_domain"),
        pub.alias("public_suffix"),
        F.col("_priv").alias("is_private_suffix"),
        "path", "query_norm", "url_norm",
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


#: Absolute http(s) hyperlink target inside a double-quoted href
#: attribute — the engine-portable (Java regex == RE2 == DuckDB)
#: subset: no lookaround, no backrefs, case-insensitive via inline
#: flag. Single-quoted/unquoted attributes and relative targets are
#: deliberate non-goals (crawl-scale link graphs are built from
#: absolute targets; relative-link resolution needs a base-URL join
#: that belongs to a later pass).
LINK_HREF_RE = r'(?i)href="(https?://[^"]+)"'


def extract_links(
    df: DataFrame,
    *,
    html_col: str = "html",
    keep_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Extract absolute hyperlink targets from raw HTML — the web-graph
    construction step: ``documents → (page, link_url, link_host)``
    edges feed :func:`solarpos_spark.operators.graph.pagerank` and the
    per-domain rollups above.

    Scale shape: one ``regexp_extract_all`` projection + one Generate
    (explode) — pipelined inside the scan stage, zero exchanges; linear
    in HTML bytes like text.extract_html_text. The link host reuses
    url_parse's authority/host regexes so a link graph and a provenance
    rollup agree on host identity.

    Output: ``keep_cols…, link_url, link_host`` — one row per extracted
    link (pages without absolute links emit nothing; count them from
    the source relation, not this one).
    """
    links = F.regexp_extract_all(F.col(html_col), F.lit(LINK_HREF_RE), 1)
    exploded = df.select(
        *[F.col(c) for c in keep_cols],
        F.explode(links).alias("link_url"),
    )
    auth = F.regexp_extract(F.col("link_url"), _AUTH_RE, 1)
    return exploded.select(
        *[F.col(c) for c in keep_cols],
        F.col("link_url"),
        F.lower(F.regexp_extract(auth, _HOST_RE, 1)).alias("link_host"),
    )
