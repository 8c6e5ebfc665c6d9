"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — broadcast the (small) query set, score
JVM-side with zip_with/aggregate (no Python). Scale path: LSH-bucketed ANN —
random-hyperplane signs bucket vectors so candidate scoring touches only
same-bucket pairs (the shuffle is keyed by bucket, never all-pairs).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _spread(df: DataFrame, key: str) -> DataFrame:
    """Fan an under-parallel scan out to defaultParallelism (the
    dedup.spread_input discipline, keyed by the vector id). The corpus
    parquet at bench scale is 1-2 splits, and a broadcast join binds its
    whole pair-enumeration stage to those splits — 2 of 32 cores busy
    (r6 measurement: the bucketed near-dup pair stage ran (1+1)/2 tasks).
    No-op when the input already has enough splits, so at 100 TB this
    costs nothing."""
    from .dedup import spread_input

    return spread_input(df, key=key)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot_u(a: Column, b: Column, dim: int) -> Column:
    """Dot for arrays of KNOWN length ``dim`` — delegates to the fold.

    An unrolled 64-term expression chain was tried here (r6): bit-identical
    doubles (same 0.0 anchor, left-to-right IEEE adds, per-element casts),
    but MEASURED SLOWER than the interpreted fold at every scale probed —
    fresh-process A/B, 3 reps each, sf0.1 AND a 10x-tiled corpus:
    similarity_topk warm 0.85 s (fold) vs 2.67 s (unrolled), mmr_rerank
    2.71 vs 4.67 at 10x. The per-query pair volume at these call sites is
    modest (corpus x ~30 broadcast queries), so the dominant cost of the
    64-term tree is Catalyst planning + janino compilation per invocation
    (three gate queries overflowed codegen into interpreted fallback
    outright: ann_topk, ann_topk_multiprobe, rp_project). The truly
    quadratic pair stages don't score per-pair in SQL at all any more —
    they use the grouped numpy scorer (guide SS8). Signature kept so call
    sites stay dim-annotated for any future revisit.
    """
    del dim
    return _dot(a, b)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ))


def _norm_u(a: Column, dim: int) -> Column:
    """Norm for arrays of KNOWN length ``dim`` — delegates to the fold
    (same left-fold order and casts; unrolled form measured slower, see
    ``_dot_u``)."""
    del dim
    return _norm(a)


def _dot_lit_u(a: Column, vec: list[float]) -> Column:
    """Dot of a column array against a PYTHON literal vector — the fold
    over an array literal; bit-identical to the unrolled chain (literals
    are already double, so only the column side is cast; identical IEEE
    order), which measured slower (see ``_dot_u``)."""
    return _dot(a, F.array(*[F.lit(float(v)) for v in vec]))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


# Per-pair cosine folds three interpreted O(dim) lambda reductions (dot +
# two norms). The join operators precompute each side's norm ONCE PER
# VECTOR below the join (the projection stays on the build/probe side —
# Catalyst never hoists computed columns above a join), so each candidate
# pair pays a single fold. Same double arithmetic -> bit-identical scores.


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query (broadcast the query side).

    Output: (query_id, rank, neighbor_id, score). Deterministic: ordered by
    rounded score desc, neighbor id asc — FP-tie stable across engines.
    ``dim``: when the embedding length is known, the per-pair cosine uses
    the unrolled codegen fold (_dot_u/_norm_u — bit-identical doubles).
    """
    nrm = ((lambda c: _norm(c)) if dim is None
           else (lambda c: _norm_u(c, dim)))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        nrm(F.col(vec_col)).alias("_qn"),
    )
    c = _spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"),
        nrm(F.col(vec_col)).alias("_cn"),
    )
    dot = (_dot(F.col("qvec"), F.col("cvec")) if dim is None
           else _dot_u(F.col("qvec"), F.col("cvec"), dim))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id", "neighbor_id",
            F.round(dot / (F.col("_qn") * F.col("_cn")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def quantize_embeddings(
    df: DataFrame,
    dim: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """int8 scalar quantization: per-vector symmetric scale
    ``scale = max|x| / 127``, codes ``clamp(floor(x/scale + 0.5), ±127)``
    — the standard 4x memory/bandwidth reduction for a corpus-scale
    vector scan (at rest the codes column stores as byte; kept as long
    here for engine-portable arithmetic). A zero vector quantizes to all
    zeros (scale 0 guarded element-wise).

    CSE note: ``scale`` is fed through ``array_repeat`` in ARGUMENT
    position so the max-abs fold evaluates once per row; referencing it
    inside the lambda would inline the fold per element (interpreted
    higher-order exprs get no CSE — the dedup.shingle_rows trap),
    turning an O(dim) pass into O(dim^2).

    Output: (id_col, qvec array<long>, scale double).
    """
    codes, scale = _quant_exprs(F.col(vec_col), dim)
    return df.select(
        F.col(id_col), codes.alias("qvec"), scale.alias("scale"))


def _quant_exprs(vec: Column, dim: int) -> tuple[Column, Column]:
    """(codes, scale) expressions for int8 symmetric quantization."""
    v = F.transform(vec, lambda x: x.cast("double"))
    scale = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
    codes = F.zip_with(
        v, F.array_repeat(scale, dim),
        lambda x, s: F.when(s == 0.0, F.lit(0).cast("long")).otherwise(
            F.greatest(F.lit(-127).cast("long"),
                       F.least(F.lit(127).cast("long"),
                               F.floor(x / s + F.lit(0.5))))))
    return codes, scale


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    dim: int,
    k: int = 3,
    shortlist: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage top-k: int8 quantized scan -> exact float rerank.

    Stage 1 scores every (query, corpus) pair in CODE space:
    ``approx = int_dot(q_codes, c_codes) * q_scale * c_scale``. The int
    dot is exact integer arithmetic (|sum| < dim * 127^2 << 2^53, so the
    double accumulation cannot round regardless of fold order) and the
    scan streams 4x less data than float32 — the piece that matters when
    the corpus is the 100 TB side; only (query_id, neighbor_id, approx)
    reaches the shortlist window, whose rank<=N filter plans as
    WindowGroupLimit (per-partition heaps BEFORE the exchange). Stage 2
    re-scores only the shortlist — joined back to the float vectors with
    the tiny shortlist BROADCAST, so full vectors are never shuffled —
    with the exact cosine (brute_force_topk arithmetic) and emits the
    usual (query_id, rank, neighbor_id, score): identical schema and
    rounding, so recall vs the exact operator is directly measurable.
    Both cuts are total orders (rounded score desc, neighbor id asc).
    """
    codes, scale = _quant_exprs(F.col(vec_col), dim)
    corpus = _spread(corpus, id_col)
    c1 = corpus.select(F.col(id_col).alias("neighbor_id"),
                       codes.alias("c_codes"), scale.alias("_cs"))
    q1 = queries.select(F.col(id_col).alias("query_id"),
                        codes.alias("q_codes"), scale.alias("_qs"))
    # unrolled integer dot — exact int64 arithmetic, any order identical;
    # kept in the fold's left-to-right order anyway (codegen vs the
    # interpreted HOF evaluator, see _dot_u)
    idot = F.lit(0).cast("long")
    for _i in range(1, dim + 1):
        idot = idot + (F.element_at(F.col("q_codes"), _i)
                       * F.element_at(F.col("c_codes"), _i))
    approx = F.round(idot.cast("double") * F.col("_qs") * F.col("_cs"), 6)
    scored = (
        c1.join(F.broadcast(q1), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", approx.alias("approx"))
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id").asc())
    short = (scored.withColumn("_srank", F.row_number().over(ws))
             .filter(F.col("_srank") <= shortlist)
             .select("query_id", "neighbor_id"))
    cvecs = corpus.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("cvec"),
                          _norm_u(F.col(vec_col), dim).alias("_cn"))
    qvecs = queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("qvec2"),
                           _norm_u(F.col(vec_col), dim).alias("_qn"))
    exact = (
        cvecs.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .select("query_id", "neighbor_id",
                F.round(_dot_u(F.col("qvec2"), F.col("cvec"), dim)
                        / (F.col("_qn") * F.col("_cn")), 6).alias("score"))
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (exact.withColumn("rank", F.row_number().over(wk))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "score"))


def hyperplane_buckets(
    df: DataFrame,
    *,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH bucket id (sign pattern of n_planes projections).

    Planes are a deterministic seeded matrix embedded as literals — tiny
    (n_planes x dim doubles) so the projection is pure JVM expression code;
    cosine-similar vectors land in the same bucket with high probability.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        # unrolled literal dot (_dot_lit_u): same 0.0 anchor and add order
        # as the previous zip_with/aggregate fold — bit-identical signs,
        # but codegen instead of the interpreted HOF evaluator
        proj = _dot_lit_u(F.col(vec_col), [float(v) for v in planes[p]])
        bucket = bucket.bitwiseOR(
            F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)).cast("long")
        )
    return df.withColumn("bucket", bucket)


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    dim: int,
    k: int = 3,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only same-bucket pairs (bucket-keyed join).

    At 100 TB this is the difference between an all-pairs shuffle and a
    bucket-partitioned one; recall is tuned by n_planes and ``multiprobe``.

    ``multiprobe=m`` additionally probes the m buckets at Hamming distance 1
    from the query's bucket (flipping plane bits 0..m-1) — the standard
    multi-probe LSH recall/latency dial: candidate volume grows by at most
    (m+1)x on the (tiny, broadcast) query side while the corpus still
    shuffles once, keyed by bucket. A (query, candidate) pair can match at
    most one probe value, so no dedup is needed.
    """
    if not (0 <= multiprobe <= n_planes):
        raise ValueError(f"multiprobe must be in [0, {n_planes}]")
    cb = hyperplane_buckets(_spread(corpus, id_col), dim=dim,
                            n_planes=n_planes, seed=seed,
                            vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"),
        _norm_u(F.col(vec_col), dim).alias("_cn"), "bucket")
    qb = hyperplane_buckets(queries, dim=dim, n_planes=n_planes, seed=seed,
                            vec_col=vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        _norm_u(F.col(vec_col), dim).alias("_qn"), "bucket")
    if multiprobe:
        probes = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << i)).cast("long")
              for i in range(multiprobe)])
        qb = qb.select("query_id", "qvec", "_qn",
                       F.explode(probes).alias("bucket"))
    scored = (
        cb.join(F.broadcast(qb), (cb.bucket == qb.bucket)
                & (F.col("neighbor_id") != F.col("query_id")))
        .select("query_id", "neighbor_id",
                F.round(_dot_u(F.col("qvec"), F.col("cvec"), dim)
                        / (F.col("_qn") * F.col("_cn")), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "score"))


def _round6_boundary(threshold: float) -> tuple[float, bool]:
    """The raw-value predicate equivalent to
    ``F.round(x, 6) >= F.lit(threshold)``: returns ``(d0, inclusive)``
    such that the filter is ``x >= d0`` (inclusive) or ``x > d0``.

    Spark evaluates round() as BigDecimal HALF_UP over the double's
    shortest decimal repr, then compares the resulting double to
    ``double(threshold)``. That predicate holds iff the 6-decimal
    rounding of x is >= the smallest 6-decimal multiple m*1e-6 whose
    double is >= double(threshold), iff the REAL value of x is >= the
    decimal boundary b = (2m-1)/(2*10^6) (half-up sends the exact
    midpoint up). In double space the cut lands at d0 = float(b);
    whether d0 ITSELF is included follows shortest-repr semantics —
    Spark rounds BigDecimal(repr(x)), so a d0 whose shortest repr IS the
    midpoint string rounds up even when its binary value sits just below
    b — hence ``inclusive = Decimal(repr(d0)) >= b``. Shortest reprs are
    strictly monotone in the double, so every other double compares
    exactly. This lets a vectorized scorer threshold on the RAW fold
    value and defer the displayed round() to a JVM projection over
    survivors only — bit-identical selection, no numpy-vs-BigDecimal
    rounding hazard (pytest locks the equivalence on boundary-adjacent
    doubles).
    """
    from decimal import Decimal

    t = float(threshold)
    if not t > 0:
        raise ValueError("positive thresholds only")
    c = int(round(t * 1e6))
    m = None
    for cand in range(c - 3, c + 4):
        if float(Decimal(cand) / Decimal(10 ** 6)) >= t:
            m = cand
            break
    assert m is not None
    b = Decimal(2 * m - 1) / Decimal(2 * 10 ** 6)
    d0 = float(b)
    return d0, Decimal(repr(d0)) >= b


def _fold_norms(X):
    """Per-row ||x|| with _norm's exact fold order (d ascending)."""
    import numpy as np

    nn = np.zeros(X.shape[0])
    for d in range(X.shape[1]):
        nn += X[:, d] * X[:, d]
    return np.sqrt(nn)


def _fold_cos_block(X, nrm, i0, i1):
    """cos(rows i0:i1, all rows) with _dot's exact fold order: acc
    starts at 0.0 and accumulates x_d*y_d for d ascending — each numpy
    step is one IEEE mul then one IEEE add per element, exactly the
    zip_with/aggregate evaluation, so every double is bit-identical."""
    import numpy as np

    acc = np.zeros((i1 - i0, X.shape[0]))
    for d in range(X.shape[1]):
        acc += X[i0:i1, d][:, None] * X[:, d][None, :]
    return acc / (nrm[i0:i1][:, None] * nrm[None, :])


_PAIRS_SCHEMA = "id_a long, id_b long, _raw double"


def _make_bucket_pairs_fn(threshold: float, block: int = 512):
    """Per-bucket pairwise scorer for embedding_near_duplicates: rows
    (_id, _v, _ca, _cb) -> (id_a, id_b, raw cos) for pairs with
    round(cos,6) >= threshold, id_a < id_b, a-side _ca, b-side _cb.
    Blocked fold-ordered numpy (guide §4.2/§8: each vector crosses into
    its bucket group ONCE; the quadratic work is vectorized native code
    instead of a join materializing 2*dim doubles per candidate pair)."""
    d0, inclusive = _round6_boundary(threshold)

    def f(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                              "id_b": pd.Series(dtype="int64"),
                              "_raw": pd.Series(dtype="float64")})
        m = len(pdf)
        if m < 2:
            return empty
        order = np.argsort(pdf["_id"].to_numpy(), kind="stable")
        ids = pdf["_id"].to_numpy()[order]
        X = np.stack(pdf["_v"].to_numpy()[order]).astype(np.float64)
        ca = pdf["_ca"].to_numpy()[order]
        cb = pdf["_cb"].to_numpy()[order]
        nrm = _fold_norms(X)
        out_a, out_b, out_r = [], [], []
        for i0 in range(0, m, block):
            i1 = min(i0 + block, m)
            cos = _fold_cos_block(X, nrm, i0, i1)
            ok = (cos >= d0) if inclusive else (cos > d0)
            # id_a < id_b == row index strictly less (ids sorted)
            ok &= (np.arange(i0, i1)[:, None] < np.arange(m)[None, :])
            ok &= ca[i0:i1][:, None] & cb[None, :]
            ii, jj = np.nonzero(ok)
            out_a.append(ids[ii + i0])
            out_b.append(ids[jj])
            out_r.append(cos[ii, jj])
        return pd.DataFrame({"id_a": np.concatenate(out_a),
                             "id_b": np.concatenate(out_b),
                             "_raw": np.concatenate(out_r)})

    return f


def _make_semdedup_removed_fn(eps: float, block: int = 512):
    """Per-list removal decision for semdedup: a row is removed iff a
    LOWER-id row in the same list has round(cos,6) >= eps — same blocked
    fold-ordered numpy as _make_bucket_pairs_fn, emitting only the
    distinct removed ids (distinct within the list IS globally distinct:
    a vector has exactly one list)."""
    d0, inclusive = _round6_boundary(eps)

    def f(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({"vec_id": pd.Series(dtype="int64")})
        m = len(pdf)
        if m < 2:
            return empty
        order = np.argsort(pdf["_id"].to_numpy(), kind="stable")
        ids = pdf["_id"].to_numpy()[order]
        X = np.stack(pdf["_v"].to_numpy()[order]).astype(np.float64)
        nrm = _fold_norms(X)
        removed = np.zeros(m, dtype=bool)
        for i0 in range(0, m, block):
            i1 = min(i0 + block, m)
            cos = _fold_cos_block(X, nrm, i0, i1)
            ok = (cos >= d0) if inclusive else (cos > d0)
            ok &= (np.arange(i0, i1)[:, None] < np.arange(m)[None, :])
            removed |= ok.any(axis=0)
        return pd.DataFrame({"vec_id": ids[removed]})

    return f


def embedding_near_duplicates(
    df: DataFrame,
    *,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
    dim: int | None = None,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: int = 0,
) -> DataFrame:
    """Pairs with cosine >= threshold (id_a < id_b).

    Default: hyperplane-LSH-bucketed — vectors are scored only against their
    own bucket, so the join shuffles on the bucket key instead of exploding
    into an all-pairs cartesian (at 10^9 vectors the difference between a
    keyed shuffle and ~5*10^17 candidate pairs). Recall is tuned by
    n_planes; cosine-similar vectors collide with probability
    (1 - theta/pi)^n_planes.

    ``exact=True``: the O(n^2) all-pairs variant — the small-scale oracle
    for recall studies and tests, never the 100 TB path.
    """
    if exact:
        nrm = ((lambda c: _norm(c)) if dim is None
               else (lambda c: _norm_u(c, dim)))
        a = _spread(df, id_col).select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
            nrm(F.col(vec_col)).alias("_na"))
        b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                      nrm(F.col(vec_col)).alias("_nb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
        dot = _dot(F.col("va"), F.col("vb"))
        return (
            pairs
            .select("id_a", "id_b",
                    F.round(dot / (F.col("_na") * F.col("_nb")), 6)
                    .alias("cos"))
            .filter(F.col("cos") >= threshold)
        )
    if dim is None:
        raise ValueError("bucketed near-dup needs dim (embedding length)")
    bk = hyperplane_buckets(df, dim=dim, n_planes=n_planes, seed=seed,
                            vec_col=vec_col)
    if not (0 <= multiprobe <= n_planes):
        raise ValueError(f"multiprobe must be in [0, {n_planes}]")
    # GROUPED pairwise scoring (r6, guide §8's lesson): the previous
    # bucket-keyed self-join materialized 2*dim doubles per candidate
    # pair through the join — ~1 KB per candidate, quadratic in the hot
    # bucket, and (because the planner broadcast one small side) bound to
    # the corpus scan's 1-2 splits. Here each vector moves into its
    # bucket group ONCE (the groupBy exchange), and the within-bucket
    # quadratic runs as blocked fold-ordered numpy (_fold_cos_block —
    # bit-identical doubles); the raw-value threshold (_round6_boundary)
    # is provably the same cut as filter(round(cos,6) >= threshold), and
    # the displayed round() runs JVM-side over survivors only.
    own = bk.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
                    F.col("bucket").alias("_g"),
                    F.lit(True).alias("_ca"), F.lit(True).alias("_cb"))
    if multiprobe:
        # probe the m Hamming-1 neighbor buckets from ONE side (a-side
        # only: _cb=False): a pair can match at most one probe value, so
        # no dedup is needed — candidate volume grows <= (m+1)x
        flips = bk.select(
            F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"),
            F.explode(F.array(
                *[F.col("bucket").bitwiseXOR(F.lit(1 << i)).cast("long")
                  for i in range(multiprobe)])).alias("_g"),
            F.lit(True).alias("_ca"), F.lit(False).alias("_cb"))
        ent = own.unionByName(flips)
    else:
        ent = own
    pairs = ent.groupBy("_g").applyInPandas(
        _make_bucket_pairs_fn(threshold), _PAIRS_SCHEMA)
    return pairs.select("id_a", "id_b",
                        F.round(F.col("_raw"), 6).alias("cos"))


def _fold_norm(vec: list[float]) -> float:
    """||vec|| with the same left-fold double accumulation as _norm (and
    SQL list_dot_product) — bit-identical across the three engines."""
    acc = 0.0
    for x in vec:
        acc += x * x
    return math.sqrt(acc)


def ivf_train_centroids(
    corpus: DataFrame,
    *,
    n_centroids: int = 16,
    n_iter: int = 3,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant_bits: int = 20,
    assign: str = "expr",
) -> list[tuple[int, list[float], float]]:
    """Deterministic distributed k-means codebook (Lloyd's algorithm) —
    the trained replacement for ivf_centroids' lowest-id seed sample.

    faiss-style split: per round, assignment (literal-codebook argmax —
    the same zero-shuffle projection the search path uses; ``assign=
    'arrow'`` switches to the vectorized bit-identical ivf_assign_arrow)
    and the per-list update sums run as distributed relational stages;
    only the K x (dim+1) sum table crosses to the driver each round, so
    training scans the corpus without ever collecting it.

    Every step is engine-portable and order-independent, which makes the
    trained codebook bit-reproducible in SQL (the gate oracle re-derives
    the full training, not just the search):
    * init — the K vectors with the lowest overflow-safe Knuth hash of
      (vec_id + seed) (curate.hash_bucket, denom 2^32 — the repo's
      engine-portable seeded RNG), ties by vec_id: a seeded pseudo-random
      sample, collected driver-side like faiss's train sample;
    * assignment — argmax_j dot(v, c_j)/||c_j||, first index on FP ties
      (array_position == SQL list_indexof), the exact search-path rule;
    * update — per-(list, dim) means accumulated as FIXED-POINT int64
      sums of sign*floor(|x * 2^quant_bits| + 0.5): integer addition is
      exact and commutative, so the sum is identical under any shuffle
      fetch order and any engine — the float-accumulation order-
      dependence that makes naive distributed k-means nondeterministic
      never arises. The mean s / (2^quant_bits * count) is then a single
      IEEE double division on both sides. Empty lists keep their
      previous centroid.

    Returns the (cid, vec, norm) list ivf_topk takes via ``centroids=``.
    """
    from .curate import hash_bucket

    # iterative reuse: n_iter+1 full passes hit the same relation — persist
    # once, release on exit (the standard Lloyd's shape; at corpus scale
    # the caller passes a training SAMPLE, faiss-style, so this is bounded)
    corpus = _spread(corpus.select(id_col, vec_col), id_col).persist()
    seeds = (corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
             .withColumn("_r", hash_bucket(F.col("_id"), seed=seed,
                                           denom=2**32))
             .orderBy("_r", "_id")
             .limit(n_centroids)
             .collect())
    cents = [(cid, [float(x) for x in r["_v"]], _fold_norm([float(x) for x in r["_v"]]))
             for cid, r in enumerate(seeds)]
    dim = len(cents[0][1])
    scale = float(1 << quant_bits)

    def _q(d: int) -> Column:
        x = F.element_at(F.col("_v"), d + 1).cast("double") * F.lit(scale)
        return F.when(x < 0, -F.floor(-x + F.lit(0.5))) \
                .otherwise(F.floor(x + F.lit(0.5))).cast("long")

    for _ in range(n_iter):
        if assign == "arrow":
            # fused assignment + partial fixed-point sums in one Arrow
            # stage; the tiny (list, dim) shuffle replaces a full-vector
            # Arrow roundtrip and a 64-aggregate codegen plan per round
            part = ivf_update_sums_arrow(corpus, cents,
                                         quant_bits=quant_bits,
                                         id_col=id_col, vec_col=vec_col)
            rows = (part.groupBy("list_id", "d")
                    .agg(F.sum("s").alias("s"), F.sum("c").alias("c"))
                    .collect())
            by_list = {}
            for r in rows:
                ent = by_list.setdefault(int(r["list_id"]),
                                         {"cnt": int(r["c"])})
                ent[f"s{int(r['d'])}"] = int(r["s"])
        else:
            pinned = _pinned_scores(corpus, cents, vec_col,
                                    [F.col(vec_col).alias("_v")])
            assigned = pinned.select(
                "_v", _argmax_sc().alias("list_id"))
            sums = assigned.groupBy("list_id").agg(
                F.count(F.lit(1)).alias("cnt"),
                *[F.sum(_q(d)).alias(f"s{d}") for d in range(dim)],
            ).collect()
            by_list = {int(r["list_id"]): r for r in sums}
        nxt = []
        for cid, vec, nrm in cents:
            r = by_list.get(cid + 1)
            if r is None:            # empty list: keep the previous centroid
                nxt.append((cid, vec, nrm))
                continue
            denom = scale * float(r["cnt"])
            nv = [r[f"s{d}"] / denom for d in range(dim)]
            nxt.append((cid, nv, _fold_norm(nv)))
        cents = nxt
    corpus.unpersist()
    return cents


def ivf_centroids(
    corpus: DataFrame,
    *,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float], float]]:
    """Untrained IVF codebook: the embeddings of the ``n_centroids``
    lowest ids, collected driver-side with their norms — the cheap
    fallback when no training pass is wanted (ivf_train_centroids is the
    production k-means trainer; pytest shows it beats this codebook on
    recall@k for out-of-codebook queries). The norm uses the same
    left-fold double accumulation as _norm so SQL mirrors bit-match.
    """
    rows = (corpus.filter(F.col(id_col) < n_centroids)
            .select(id_col, vec_col).collect())
    out = []
    for r in sorted(rows, key=lambda r: r[0]):
        vec = [float(x) for x in r[1]]
        acc = 0.0
        for x in vec:
            acc += x * x
        out.append((int(r[0]), vec, math.sqrt(acc)))
    return out


def _pinned_scores(df: DataFrame, cents, vec_col: str, keep) -> DataFrame:
    """``df.select(*keep, explode(array(scores)) AS _sc)`` — the K unrolled
    codebook-score chains PINNED below a Generate. The argmax consumer
    (``array_position(sc, array_max(sc))``) references the scores array
    twice; without the Generate, CollapseProject inlines the K*dim-term
    chain into both references and the fused WholeStageCodegen method
    blows janino's 64 KB limit (observed: 21k-line processNext -> ERROR +
    interpreted fallback). Generate blocks CollapseProject (the
    shingle_rows discipline), so the chains evaluate once per row in
    their own compiled projection and the argmax reads a bound column."""
    scores = _centroid_scores(F.col(vec_col), cents)
    return df.select(*keep, F.explode(F.array(scores)).alias("_sc"))


def _argmax_sc() -> Column:
    """1-based argmax over the pinned score column (first index on FP
    ties — the list_indexof rule)."""
    return F.array_position(F.col("_sc"), F.array_max(F.col("_sc")))


def _centroid_scores(vec: Column, cents) -> Column:
    """Array of dot(vec, c_j)/||c_j|| against the literal codebook.

    Deliberately the HOF fold form, NOT an unrolled chain: K*dim unrolled
    terms inside the _pinned_scores Generate exceed janino's 64 KB
    per-method limit (Generate codegen cannot split its generator
    expression) and the whole stage falls back to interpreted — measured
    SLOWER than the interpreted fold it replaced. The fold runs once per
    corpus row; the pair stages are where the time is."""
    return F.array(*[
        _dot(vec, F.array(*[F.lit(v) for v in c])) / F.lit(cn)
        for _, c, cn in cents
    ])


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 3,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
    assign: str = "expr",
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into centroid
    lists, search only the ``nprobe`` lists nearest each query.

    The complement of the hyperplane-LSH path (ann_topk): data-dependent
    partitioning instead of data-oblivious, the recall dial is nprobe
    instead of n_planes. Corpus-side assignment is a ZERO-SHUFFLE literal
    projection (argmax over the literal codebook scores — first index wins
    FP ties, same rule as SQL list_indexof); only the (tiny) query side
    derives its probe set relationally. The candidate join shuffles the
    corpus once, keyed by list_id — at 10^9 vectors the fraction scanned is
    nprobe/n_centroids, the IVF contract.

    Output: (query_id, rank, neighbor_id, score), deterministic ties.
    """
    corpus = _spread(corpus, id_col)
    if centroids is None:
        centroids = ivf_centroids(corpus, n_centroids=n_centroids,
                                  id_col=id_col, vec_col=vec_col)
    if assign == "arrow":
        # vectorized fold-ordered assignment — bit-identical values (see
        # ivf_assign_arrow); the scale path for the per-vector O(K*dim) work
        assigned = ivf_assign_arrow(corpus, centroids,
                                    id_col=id_col, vec_col=vec_col)
    else:
        dim = len(centroids[0][1])
        pinned = _pinned_scores(
            corpus, centroids, vec_col,
            [F.col(id_col).alias("neighbor_id"),
             F.col(vec_col).alias("cvec")])
        # 1-based argmax, first occurrence on ties (matches list_indexof)
        assigned = pinned.select(
            "neighbor_id", "cvec",
            _norm_u(F.col("cvec"), dim).alias("_cn"),
            _argmax_sc().alias("list_id"),
        )
    dim = len(centroids[0][1])
    # query probe sets: rank the codebook relationally (tiny side)
    import pandas as pd

    spark = corpus.sparkSession
    cdf = spark.createDataFrame(pd.DataFrame(
        {"cid": [c[0] for c in centroids],
         "cvec_c": [c[1] for c in centroids],
         "cn_c": [c[2] for c in centroids]}))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        _norm_u(F.col(vec_col), dim).alias("_qn"),
    )
    qscored = q.crossJoin(F.broadcast(cdf)).select(
        "query_id", "qvec", "_qn", "cid",
        (_dot_u(F.col("qvec"), F.col("cvec_c"), dim)
         / F.col("cn_c")).alias("_cs"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_cs").desc(), F.col("cid").asc())
    probes = (qscored.withColumn("_pr", F.row_number().over(wq))
              .filter(F.col("_pr") <= nprobe)
              .select("query_id", "qvec", "_qn",
                      (F.col("cid") + 1).alias("list_id")))
    scored = (
        assigned.join(F.broadcast(probes),
                      (assigned.list_id == probes.list_id)
                      & (F.col("neighbor_id") != F.col("query_id")))
        .select("query_id", "neighbor_id",
                F.round(_dot_u(F.col("qvec"), F.col("cvec"), dim)
                        / (F.col("_qn") * F.col("_cn")), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "score"))


def pq_train(
    corpus: DataFrame,
    *,
    dim: int,
    m: int = 4,
    n_centroids: int = 8,
    n_iter: int = 2,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float], float]]]:
    """Product-quantization codebooks (Jégou et al. 2011): the vector
    splits into ``m`` subspaces of dim/m and each subspace gets its own
    ``n_centroids``-entry codebook from the SAME deterministic
    fixed-point Lloyd arithmetic as ivf_train_centroids (Knuth-hash init
    with a seed offset per subspace, literal-codebook argmax assignment,
    int64 quantized update sums) — so the full training replays
    bit-exactly in SQL, codebooks and all.

    All m codebooks train TOGETHER: the sub-vector relation unions the m
    slices (m x rows, dim/m wide — same total bytes as one corpus pass),
    assignment is one projection whose argmax expression CASEs on the
    sub column, and a single (sub, list)-keyed fixed-point sum table
    crosses to the driver per round. One distributed pass per Lloyd
    round for every codebook — not m sequential trainings (24 -> 3 jobs
    at m=8, n_iter=2; the shape a 100 TB training sample wants). At
    corpus scale the caller trains on a sample, faiss-style."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    d_sub = dim // m
    from .curate import hash_bucket

    parts = [corpus.select(
        F.lit(s).alias("sub"), F.col(id_col).alias("_id"),
        F.expr(f"slice({vec_col}, {s * d_sub + 1}, {d_sub})").alias("_v"),
        hash_bucket(F.col(id_col), seed=seed + s,
                    denom=2**32).alias("_r")) for s in range(m)]
    subs = parts[0]
    for p in parts[1:]:
        subs = subs.unionAll(p)
    subs = subs.persist()
    wk = Window.partitionBy("sub").orderBy("_r", "_id")
    seed_rows = (subs.withColumn("_rk", F.row_number().over(wk))
                 .filter(F.col("_rk") <= n_centroids)
                 .select("sub", "_rk", "_v").collect())
    books: list[list[tuple[int, list[float], float]]] = \
        [[None] * n_centroids for _ in range(m)]  # type: ignore[list-item]
    for r in seed_rows:
        v = [float(x) for x in r["_v"]]
        books[int(r["sub"])][int(r["_rk"]) - 1] = (
            int(r["_rk"]) - 1, v, _fold_norm(v))
    scale = float(1 << 20)

    def _q(d: int) -> Column:
        x = F.element_at(F.col("_v"), d + 1).cast("double") * F.lit(scale)
        return F.when(x < 0, -F.floor(-x + F.lit(0.5))) \
                .otherwise(F.floor(x + F.lit(0.5))).cast("long")

    for _ in range(n_iter):
        # relational argmax against the broadcast codebook RELATION: a
        # literal-expression codebook (the ivf path) stacks m*K
        # interpreted dot-folds into one tree and Catalyst
        # analysis/codegen time dwarfs the data at small K*dim — the
        # join+rank form keeps the plan O(1) in m*K. row_number over
        # (score desc, cid asc) == array_position-of-max (first index on
        # FP ties): same doubles, same tie rule, bit-identical codebooks
        # (the gate oracle re-derives training and still hash-matches).
        assigned = _pq_assign(subs, books)
        sums = assigned.groupBy("sub", "list_id").agg(
            F.count(F.lit(1)).alias("cnt"),
            *[F.sum(_q(d)).alias(f"s{d}") for d in range(d_sub)]).collect()
        by_key = {(int(r["sub"]), int(r["list_id"])): r for r in sums}
        for s in range(m):
            nxt = []
            for cid, vec, nrm in books[s]:
                r = by_key.get((s, cid + 1))
                if r is None:        # empty list: keep previous centroid
                    nxt.append((cid, vec, nrm))
                    continue
                denom = scale * float(r["cnt"])
                nxt.append((cid, [r[f"s{d}"] / denom
                                  for d in range(d_sub)], 0.0))
            books[s] = [(cid, nv, _fold_norm(nv)) for cid, nv, _ in nxt]
        # recompute norms only for updated entries is equivalent: _fold_norm
        # of an unchanged vec reproduces the stored norm bit-for-bit
    subs.unpersist()
    return books


def _pq_assign(subs: DataFrame,
               books: list[list[tuple[int, list[float], float]]]) -> DataFrame:
    """(sub, _v, list_id) — argmax dot(v, c)/||c|| per (sub, row) via a
    broadcast codebook join + struct-max aggregate (1-based list_id,
    lowest cid on FP ties: the array_position rule).

    r6: ``max(struct(_sc, -cid))`` replaces the rank-1 window — struct
    comparison is lexicographic, so the max picks the highest score and,
    on exact FP ties, the highest -cid == LOWEST cid: the identical tie
    rule, but as a hash aggregate with map-side partial combine (the K
    scored rows per (sub, row) collapse before the exchange) instead of
    a full exchange + sort of the K-times-larger scored relation per
    Lloyd round (guide §2.3). ``_v`` is constant within the group
    (first() is deterministic here)."""
    spark = subs.sparkSession
    d_sub = len(books[0][0][1])
    cb = spark.createDataFrame(
        [(s, cid, [float(x) for x in c], float(cn))
         for s, book in enumerate(books) for (cid, c, cn) in book],
        "sub int, cid int, c array<double>, cn double")
    scored = subs.join(F.broadcast(cb), "sub").select(
        "sub", "_id", "_v", "cid",
        (_dot_u(F.col("_v"), F.col("c"), d_sub) / F.col("cn")).alias("_sc"))
    best = scored.groupBy("sub", "_id").agg(
        F.first("_v").alias("_v"),
        F.max(F.struct(F.col("_sc").alias("_s"),
                       (-F.col("cid")).alias("_nc"))).alias("_m"))
    return best.select(
        "sub", "_id", "_v",
        (-F.col("_m._nc") + 1).alias("list_id"))


def pq_encode(
    corpus: DataFrame,
    books: list[list[tuple[int, list[float], float]]],
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ codes as a relation: (id_col, sub, code) — m rows per vector,
    log2(n_centroids)*m bits of storage at rest. Assignment per subspace
    is the trainer's own rule (argmax dot/||c||, lowest cid on ties) via
    the same broadcast-codebook join (_pq_assign), so encode == the
    final training assignment and the plan stays O(1) in m*K."""
    m = len(books)
    d_sub = dim // m
    parts = [corpus.select(
        F.lit(s).alias("sub"), F.col(id_col).alias("_id"),
        F.expr(f"slice({vec_col}, {s * d_sub + 1}, {d_sub})").alias("_v"))
        for s in range(m)]
    subs = parts[0]
    for p in parts[1:]:
        subs = subs.unionAll(p)
    return _pq_assign(subs, books).select(
        F.col("_id").alias(id_col), "sub",
        (F.col("list_id") - 1).cast("int").alias("code"))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    dim: int,
    m: int = 4,
    n_centroids: int = 8,
    n_iter: int = 2,
    seed: int = 11,
    k: int = 3,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list[tuple[int, list[float], float]]] | None = None,
) -> DataFrame:
    """Asymmetric-distance PQ search (faiss IndexPQ's ADC): corpus
    vectors exist only as m small codes; each query precomputes a
    (sub, code) -> partial-dot table against the codebooks (m *
    n_centroids rows per query — the broadcast side), and a candidate's
    score is one m-row lookup-sum, never a dim-length dot:

        score(q, x) = sum_s dot(q_s, c[s][code_s(x)])
                      / (||q|| * sqrt(sum_s ||c[s][code_s(x)]||^2))

    i.e. exact cosine against the RECONSTRUCTED vector. The scan side
    touches only the code relation (m ints/vector, ~dim*4/m bytes less
    than float32); both per-candidate sums fold over the sub-sorted
    struct list (deterministic accumulation order, the tfidf/ADVICE-r3
    rule), so results hash identically under any shuffle.

    ``shortlist=N`` adds the faiss "refine" stage: the per-query ADC
    top-N joins back to the retained float vectors via the tiny
    broadcast shortlist and the final k is cut on EXACT cosine — pure
    ADC ranks strong neighbors (near-identical vectors share codes) but
    blurs weak ones at a few dozen bits/vector; the refine pass fixes
    weak-neighbor ordering while the wide scan stays in code space.
    Output: (query_id, rank, neighbor_id, score) — the family schema.
    """
    if books is None:
        books = pq_train(corpus, dim=dim, m=m, n_centroids=n_centroids,
                         n_iter=n_iter, seed=seed, id_col=id_col,
                         vec_col=vec_col)
    d_sub = dim // m
    codes = pq_encode(corpus, books, dim=dim, id_col=id_col,
                      vec_col=vec_col)
    spark = corpus.sparkSession
    cb = spark.createDataFrame(
        [(s, cid, [float(x) for x in c], float(cn))
         for s, book in enumerate(books) for (cid, c, cn) in book],
        "sub int, code int, c array<double>, cn double")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        _norm_u(F.col(vec_col), dim).alias("_qn"))
    parts = q.crossJoin(F.broadcast(cb)).select(
        "query_id", "_qn", "sub", "code",
        _dot_u(F.expr(f"slice(qvec, sub * {d_sub} + 1, {d_sub})"),
               F.col("c"), d_sub).alias("partial"),
        (F.col("cn") * F.col("cn")).alias("cn_sq"))
    joined = codes.join(F.broadcast(parts), ["sub", "code"]) \
        .filter(F.col(id_col) != F.col("query_id"))
    agg = joined.groupBy("query_id", "_qn", F.col(id_col)).agg(
        F.array_sort(F.collect_list(
            F.struct("sub", "partial", "cn_sq"))).alias("_ps"))
    dsum = F.aggregate(F.col("_ps"), F.lit(0.0),
                       lambda acc, x: acc + x["partial"])
    nsq = F.aggregate(F.col("_ps"), F.lit(0.0),
                      lambda acc, x: acc + x["cn_sq"])
    scored = agg.select(
        "query_id", F.col(id_col).alias("neighbor_id"),
        F.round(dsum / (F.col("_qn") * F.sqrt(nsq)), 6).alias("score"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if shortlist is None:
        return (ranked.filter(F.col("rank") <= k)
                .select("query_id", "rank", "neighbor_id", "score"))
    short = (ranked.filter(F.col("rank") <= shortlist)
             .select("query_id", "neighbor_id"))
    cvecs = corpus.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("cvec"),
                          _norm_u(F.col(vec_col), dim).alias("_cn"))
    qvecs = q.select("query_id", F.col("qvec").alias("qvec2"), "_qn")
    exact = (
        cvecs.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .select("query_id", "neighbor_id",
                F.round(_dot_u(F.col("qvec2"), F.col("cvec"), dim)
                        / (F.col("_qn") * F.col("_cn")), 6).alias("score"))
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (exact.withColumn("rank", F.row_number().over(wk))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "score"))


def semdedup(
    corpus: DataFrame,
    *,
    eps: float = 0.95,
    n_centroids: int = 16,
    n_iter: int = 3,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
    assign: str = "expr",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): k-means-cluster the
    embedding space, then deduplicate WITHIN clusters only — a vector is
    dropped iff a lower-id vector in the SAME cluster has cosine >= eps
    (keep-lowest-id is this engine's deterministic stand-in for the
    paper's keep-one-per-epsilon-group rule; the paper's alternative
    representative choices are one ORDER BY away).

    The clustering is the point at scale: pairwise cosine runs per list,
    so the quadratic term is Σ|list|² not |corpus|² — n_centroids is the
    knob that bounds it (the paper uses 50k clusters for 100M+ vectors;
    at 10^9 embeddings size lists to ~corpus/n_centroids ≈ 10^4-10^5).
    Reuses the deterministic trained codebook (ivf_train_centroids — same
    seed/rounds as the IVF gate entries, so the SQL oracle re-derives the
    identical clustering), the zero-shuffle literal-codebook assignment
    (``assign='arrow'`` for the vectorized bit-identical path), and the
    norms are computed below the join so each pair pays one fold.
    The self-join's explicit repartition on list_id materializes the
    assignment exchange once for both sides.

    Output: (vec_id, list_id, kept) — kept=false marks removed near-dups.
    """
    corpus = _spread(corpus, id_col)
    if centroids is None:
        centroids = ivf_train_centroids(
            corpus, n_centroids=n_centroids, n_iter=n_iter, seed=seed,
            id_col=id_col, vec_col=vec_col, assign=assign)
    if assign == "arrow":
        assigned = ivf_assign_arrow(corpus, centroids,
                                    id_col=id_col, vec_col=vec_col)
    else:
        dim = len(centroids[0][1])
        pinned = _pinned_scores(
            corpus, centroids, vec_col,
            [F.col(id_col).alias("neighbor_id"),
             F.col(vec_col).alias("cvec")])
        assigned = pinned.select(
            "neighbor_id", "cvec",
            _norm_u(F.col("cvec"), dim).alias("_cn"),
            _argmax_sc().alias("list_id"),
        )
    # GROUPED within-list pairwise (r6 — the embedding_near_duplicates
    # rationale): each assigned vector moves into its list group ONCE
    # (the explicit repartition below), and the Σ|list|² scoring runs as
    # blocked fold-ordered numpy instead of a self-join that carried
    # 2*dim doubles per enumerated pair (measured 143 s at sf1.0 even at
    # full task parallelism; the grouped form is seconds). The raw-value
    # eps cut (_round6_boundary) is provably identical to
    # filter(round(cos,6) >= eps); removed ids are distinct within the
    # list by construction, which IS globally distinct.
    P = corpus.sparkSession.sparkContext.defaultParallelism
    rel = assigned.select(
        F.col("neighbor_id").alias("_id"), F.col("cvec").alias("_v"),
        F.col("list_id").alias("_g")).repartition(P, "_g")
    removed = (rel.groupBy("_g")
               .applyInPandas(_make_semdedup_removed_fn(eps),
                              "vec_id long")
               .withColumn("_rm", F.lit(1)))
    # project the output from the repartitioned relation, not `assigned`:
    # the second consumer then reads the SAME materialized exchange as
    # the grouped scorer instead of re-running the O(K*dim) assignment
    return (
        rel.select(F.col("_id").alias("vec_id"),
                   F.col("_g").cast("long").alias("list_id"))
        .join(removed, "vec_id", "left")
        .select("vec_id", "list_id", F.col("_rm").isNull().alias("kept"))
    )


def ivf_assign_arrow(
    corpus: DataFrame,
    centroids,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Vectorized centroid assignment (mapInArrow), bit-identical to the
    expression path.

    The interpreted higher-order fold costs ~80 us per 64-dim vector —
    fine at bench scale, the dominant term at 10^9 vectors. This stage
    computes the same scores with numpy, preserving EXACT float semantics
    by accumulating in the same left-fold order (for ascending j:
    acc += v[:, j] * c[j], then divide by ||c||; norm likewise
    acc += v[:, j]^2 then sqrt). Each numpy += performs the identical
    sequence of double roundings as the interpreted lambda and SQL
    list_dot_product, so argmax (np.argmax = first max index =
    array_position/list_indexof tie rule) and every downstream hash agree
    bit-for-bit — proven by the shared DuckDB oracle on the gate entry.

    Output: (neighbor_id, cvec, _cn, list_id) — the same relation the
    expression path feeds the candidate join.
    """
    from collections.abc import Iterator

    import pyarrow as pa

    cmat = np.array([c for _, c, _ in centroids], dtype=np.float64)
    cnorm = np.array([cn for _, _, cn in centroids], dtype=np.float64)
    n_cent, dim = cmat.shape

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            names = batch.schema.names
            ids = batch.column(names.index(id_col))
            vec = batch.column(names.index(vec_col))
            if isinstance(vec, pa.ChunkedArray):
                vec = vec.combine_chunks()
            flat = vec.values.to_numpy(zero_copy_only=False).astype(np.float64)
            offs = vec.offsets.to_numpy(zero_copy_only=False)
            if not ((offs[1:] - offs[:-1]) == dim).all():
                raise ValueError("ragged embedding lengths")
            v = flat[offs[0]:offs[-1]].reshape(-1, dim)
            scores = np.zeros((v.shape[0], n_cent))
            nrm = np.zeros(v.shape[0])
            for j in range(dim):       # fold order: ascending j, += per step
                scores += v[:, j:j + 1] * cmat[:, j]
                nrm += v[:, j] * v[:, j]
            scores /= cnorm
            list_id = np.argmax(scores, axis=1) + 1   # first-max, 1-based
            yield pa.RecordBatch.from_arrays(
                [ids, vec, pa.array(np.sqrt(nrm)),
                 pa.array(list_id.astype(np.int64))],
                names=["neighbor_id", "cvec", "_cn", "list_id"],
            )

    vt = dict(corpus.dtypes)[vec_col]
    return corpus.select(id_col, vec_col).mapInArrow(
        run,
        schema=f"neighbor_id long, cvec {vt}, _cn double, list_id long")


def ivf_update_sums_arrow(
    corpus: DataFrame,
    centroids,
    *,
    quant_bits: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fused Lloyd-round update: assignment + per-list FIXED-POINT sums in
    ONE Arrow stage.

    The separate-stage form (ivf_assign_arrow -> 64 JVM `sum(_q(d))`
    aggregates) ships every vector back through Arrow and compiles a
    64-aggregate codegen plan per round — ~1.3 s/round of pure overhead at
    toy scale. Here each batch emits only its partial (list_id, d, s, c)
    table (<= lists x dim rows per batch): scores use the SAME ascending-j
    += fold as ivf_assign_arrow (bit-identical argmax), quantization is
    the same sign*floor(|x*2^q| + 0.5) as the expression path's `_q`
    (identical float64 op sequence), and int64 partial sums are EXACT, so
    the final groupBy sum equals the expression path's result under any
    batching or shuffle order — locked by the expr/arrow training-parity
    pytest.

    Output: (list_id, d, s, c) — c repeats the batch's per-list count on
    every dim row, so the summed count can be read at any d.
    """
    from collections.abc import Iterator

    import pyarrow as pa

    cmat = np.array([c for _, c, _ in centroids], dtype=np.float64)
    cnorm = np.array([cn for _, _, cn in centroids], dtype=np.float64)
    n_cent, dim = cmat.shape
    scale = float(1 << quant_bits)

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            names = batch.schema.names
            vec = batch.column(names.index(vec_col))
            if isinstance(vec, pa.ChunkedArray):
                vec = vec.combine_chunks()
            flat = vec.values.to_numpy(zero_copy_only=False).astype(np.float64)
            offs = vec.offsets.to_numpy(zero_copy_only=False)
            if not ((offs[1:] - offs[:-1]) == dim).all():
                raise ValueError("ragged embedding lengths")
            v = flat[offs[0]:offs[-1]].reshape(-1, dim)
            scores = np.zeros((v.shape[0], n_cent))
            for j in range(dim):       # fold order: ascending j, += per step
                scores += v[:, j:j + 1] * cmat[:, j]
            scores /= cnorm
            list_id = np.argmax(scores, axis=1) + 1   # first-max, 1-based
            xs = v * scale
            q = np.where(xs < 0, -np.floor(-xs + 0.5),
                         np.floor(xs + 0.5)).astype(np.int64)
            lids, ds, ss, cs = [], [], [], []
            for lid in np.unique(list_id):
                mask = list_id == lid
                s = q[mask].sum(axis=0, dtype=np.int64)
                c = int(mask.sum())
                lids.extend([int(lid)] * dim)
                ds.extend(range(dim))
                ss.extend(int(x) for x in s)
                cs.extend([c] * dim)
            yield pa.RecordBatch.from_arrays(
                [pa.array(lids, pa.int64()), pa.array(ds, pa.int32()),
                 pa.array(ss, pa.int64()), pa.array(cs, pa.int64())],
                names=["list_id", "d", "s", "c"],
            )

    return corpus.select(id_col, vec_col).mapInArrow(
        run, schema="list_id long, d int, s long, c long")


def ivfpq_index(
    corpus: DataFrame,
    centroids,
    books,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Build the IVF-PQ index relation: (id, sub, code, list_id) — m rows
    per vector, the table a production deployment writes ONCE (partitioned
    by list_id) and every search reads. Coarse assignment is the
    zero-shuffle literal-codebook argmax (ivf_topk's rule); PQ codes come
    from pq_encode; one id-keyed join glues them — the only shuffle here,
    paid at index-build time, never per query."""
    assigned = _pinned_scores(
        _spread(corpus, id_col), centroids, vec_col,
        [F.col(id_col).alias("_aid")]).select(
        "_aid", _argmax_sc().alias("list_id"))
    return (pq_encode(corpus, books, dim=dim, id_col=id_col,
                      vec_col=vec_col)
            .join(assigned, F.col(id_col) == F.col("_aid"))
            .select(id_col, "sub", "code", "list_id"))


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    dim: int,
    k: int = 3,
    n_coarse: int = 16,
    nprobe: int = 4,
    m: int = 4,
    n_codes: int = 8,
    n_iter_coarse: int = 3,
    n_iter_pq: int = 2,
    seed: int = 11,
    shortlist: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids=None,
    books=None,
    index: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ composed ANN — the faiss IndexIVFPQ shape (Jégou et al.
    2011, §IV; ``by_residual=false`` variant), the index a 10^9-vector
    corpus actually ships: the coarse quantizer restricts the SCAN to
    nprobe/n_coarse of the corpus AND the scanned side is the m-int PQ
    code relation, never float vectors — the two scale levers the
    standalone ivf_topk (full vectors in probed lists) and pq_topk
    (codes, but the whole corpus) each pull alone.

    Index build (one-time, amortized at scale — see ivfpq_index; pass a
    prebuilt/stored relation via ``index=`` and the search plan contains
    NO sort-merge join at all, a pytest-locked shape). Search: query probe
    sets and per-query
    (sub, code) -> partial-dot ADC tables are both tiny broadcast
    relations; candidates = code rows whose list_id is probed (broadcast
    hash join — the corpus never shuffles), scored by the sub-sorted
    deterministic ADC fold (pq_topk's rule, bit-stable under any shuffle
    order). ``shortlist=N`` adds the exact-cosine refine over retained
    float vectors, exactly pq_topk's stage.

    Both codebooks are the deterministic fixed-point Lloyd trainers
    (ivf_train_centroids / pq_train), so the full pipeline — two
    trainings, encode, probes, ADC, refine — replays bit-exactly in the
    gate oracle. Output: (query_id, rank, neighbor_id, score).
    """
    if centroids is None:
        centroids = ivf_train_centroids(
            corpus, n_centroids=n_coarse, n_iter=n_iter_coarse, seed=seed,
            id_col=id_col, vec_col=vec_col, assign="arrow")
    if books is None:
        books = pq_train(corpus, dim=dim, m=m, n_centroids=n_codes,
                         n_iter=n_iter_pq, seed=seed, id_col=id_col,
                         vec_col=vec_col)
    d_sub = dim // m
    codes = index if index is not None else ivfpq_index(
        corpus, centroids, books, dim=dim, id_col=id_col, vec_col=vec_col)

    spark = corpus.sparkSession
    import pandas as pd

    cdf = spark.createDataFrame(pd.DataFrame(
        {"cid": [c[0] for c in centroids],
         "cvec_c": [c[1] for c in centroids],
         "cn_c": [c[2] for c in centroids]}))
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        _norm_u(F.col(vec_col), dim).alias("_qn"))
    qscored = q.crossJoin(F.broadcast(cdf)).select(
        "query_id", "cid",
        (_dot_u(F.col("qvec"), F.col("cvec_c"), dim)
         / F.col("cn_c")).alias("_cs"))
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_cs").desc(), F.col("cid").asc())
    probes = (qscored.withColumn("_pr", F.row_number().over(wq))
              .filter(F.col("_pr") <= nprobe)
              .select("query_id", (F.col("cid") + 1).alias("list_id")))

    cb = spark.createDataFrame(
        [(s, cid, [float(x) for x in c], float(cn))
         for s, book in enumerate(books) for (cid, c, cn) in book],
        "sub int, code int, c array<double>, cn double")
    parts = q.crossJoin(F.broadcast(cb)).select(
        "query_id", "_qn", "sub", "code",
        _dot_u(F.expr(f"slice(qvec, sub * {d_sub} + 1, {d_sub})"),
               F.col("c"), d_sub).alias("partial"),
        (F.col("cn") * F.col("cn")).alias("cn_sq"))

    cand = (codes.join(F.broadcast(probes), "list_id")
            .filter(F.col(id_col) != F.col("query_id"))
            .join(F.broadcast(parts), ["query_id", "sub", "code"]))
    agg = cand.groupBy("query_id", "_qn", F.col(id_col)).agg(
        F.array_sort(F.collect_list(
            F.struct("sub", "partial", "cn_sq"))).alias("_ps"))
    dsum = F.aggregate(F.col("_ps"), F.lit(0.0),
                       lambda acc, x: acc + x["partial"])
    nsq = F.aggregate(F.col("_ps"), F.lit(0.0),
                      lambda acc, x: acc + x["cn_sq"])
    scored = agg.select(
        "query_id", F.col(id_col).alias("neighbor_id"),
        F.round(dsum / (F.col("_qn") * F.sqrt(nsq)), 6).alias("score"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if shortlist is None:
        return (ranked.filter(F.col("rank") <= k)
                .select("query_id", "rank", "neighbor_id", "score"))
    short = (ranked.filter(F.col("rank") <= shortlist)
             .select("query_id", "neighbor_id"))
    cvecs = corpus.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("cvec"),
                          _norm_u(F.col(vec_col), dim).alias("_cn"))
    qvecs = q.select("query_id", F.col("qvec").alias("qvec2"), "_qn")
    exact = (
        cvecs.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .select("query_id", "neighbor_id",
                F.round(_dot_u(F.col("qvec2"), F.col("cvec"), dim)
                        / (F.col("_qn") * F.col("_cn")), 6).alias("score"))
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (exact.withColumn("rank", F.row_number().over(wk))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "score"))


# --------------------------------------------------------------------------
# sparse random projection (Achlioptas 2001 "database-friendly" variant)

def rp_signs(in_dim: int, out_dim: int, *, seed: int = 1) -> list[list[int]]:
    """The deterministic sparse sign matrix s[i][j] in {+1, 0, -1} with
    density 1/3: fmix32(i*out_dim + j + seed) mod 6 -> 0:+1, 1:-1,
    else 0 (Achlioptas 2003, JCSS — E[s]=0, Var preserved under the
    sqrt(3/out_dim) scale). Generated driver-side from the same fmix32
    constants as the engine hashes (sketches.py_fmix32), so the Spark
    expression chain and the SQL oracle derive from ONE table."""
    from .sketches import py_fmix32

    out: list[list[int]] = []
    for i in range(in_dim):
        row = []
        for j in range(out_dim):
            r = py_fmix32((i * out_dim + j + seed) & 0xFFFFFFFF) % 6
            row.append(1 if r == 0 else (-1 if r == 1 else 0))
        out.append(row)
    return out


def _rp_scale(out_dim: int) -> float:
    import math

    return math.sqrt(3.0 / out_dim)


def random_project(
    embeddings: DataFrame,
    *,
    in_dim: int = 64,
    out_dim: int = 16,
    seed: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Sparse random projection to ``out_dim`` dimensions — the cheap
    Johnson-Lindenstrauss dimensionality cut run before ANN/clustering
    when 100 TB of embeddings won't fit the index budget. With the
    Achlioptas {+1,0,-1} matrix the projection is ~2/3 zeros, so each
    output coordinate is a FIXED, generation-ordered chain of +/-
    element adds — pure whole-stage-codegen projection, zero shuffle,
    zero Python, and bit-identical in any IEEE engine (the SQL oracle
    emits the same chain from the same sign table; no dot-product
    fold-order hazard because the order is pinned by the table, not by
    data layout).

    Output: (``id_col``, proj array<double> length ``out_dim``), each
    coordinate rounded to ``round_digits``.

    Codegen note: as a plain projection (scan → project, or feeding a
    join/Generate) the ~340-term chain whole-stage-compiles fine. If an
    AGGREGATE fuses directly on top of all 16 chains in one codegen
    region, the single generated method can exceed the JVM's 64 KB
    limit and Spark logs one "Failed to compile" ERROR then falls back
    to interpreted execution for that stage — graceful, correct, and
    avoided in practice by the explode/join that always sits between
    this projection and any aggregate in the pipelines here.
    """
    signs = rp_signs(in_dim, out_dim, seed=seed)
    sc = _rp_scale(out_dim)
    v = F.col(vec_col)
    cols = []
    for j in range(out_dim):
        # start the chain at 0.0 on BOTH engines: identical term order,
        # and 0.0 + x == x exactly in IEEE so the anchor costs nothing
        term = F.lit(0.0)
        for i in range(in_dim):
            s = signs[i][j]
            if s == 0:
                continue
            e = F.element_at(v, i + 1).cast("double")
            term = (term + e) if s > 0 else (term - e)
        # + 0.0 normalizes IEEE -0.0 to +0.0 (a chain that sums to
        # negative zero would otherwise hash differently than the
        # oracle's round, which keeps the sign)
        cols.append(F.round(term * F.lit(sc), round_digits) + F.lit(0.0))
    return embeddings.select(F.col(id_col), F.array(*cols).alias("proj"))


def rp_sql_proj(
    *,
    in_dim: int = 64,
    out_dim: int = 16,
    seed: int = 1,
    vec_expr: str = "embedding::DOUBLE[]",
    round_digits: int = 6,
) -> str:
    """DuckDB list expression replaying :func:`random_project`'s exact
    add chain (same sign table, same term order, same scale literal)."""
    signs = rp_signs(in_dim, out_dim, seed=seed)
    sc = repr(_rp_scale(out_dim))
    items = []
    for j in range(out_dim):
        chain = "0.0"
        for i in range(in_dim):
            s = signs[i][j]
            if s == 0:
                continue
            chain += (" + " if s > 0 else " - ") + f"({vec_expr})[{i + 1}]"
        items.append(f"(round(({chain}) * CAST({sc} AS DOUBLE), "
                     f"{round_digits}) + 0.0)")
    return "[" + ", ".join(items) + "]"


def rp_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    in_dim: int = 64,
    out_dim: int = 16,
    seed: int = 1,
    k: int = 3,
    shortlist: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage top-k: sparse-random-projection scan → exact rerank —
    the quantized_topk shape with the 4x bandwidth cut replaced by a
    4x DIMENSION cut (out_dim=16 of 64): stage 1 scores every pair on
    the 16-dim projected vectors (JL lemma keeps relative distances),
    stage 2 re-scores only the shortlist with the exact 64-dim cosine.
    Both stages deterministic: projected coordinates are rounded
    (pinned add chains, random_project), cuts are total orders. Output
    (query_id, rank, neighbor_id, score) — same schema/rounding as
    brute_force_topk so recall is directly measurable."""
    # MATERIALIZE the projection below a Generate (explode of a 1-element
    # array): CollapseProject would otherwise inline the 16 ~340-term add
    # chains into the join's per-PAIR projection — re-evaluating the whole
    # projection once per candidate instead of once per vector, and (when
    # the fused region also contains the cosine fold) overflowing janino's
    # 64 KB method limit into interpreted fallback (the NOTES_r5 ERROR).
    # Generate blocks CollapseProject (the cms_table discipline), so the
    # chains run exactly once per row and the join stage codegen stays
    # small. Norms are hoisted below the join (one per vector, not per
    # pair) with the multiplication order preserved — bit-identical.
    pc = random_project(_spread(corpus, id_col), in_dim=in_dim,
                        out_dim=out_dim,
                        seed=seed, id_col=id_col, vec_col=vec_col) \
        .select(F.col(id_col).alias("neighbor_id"),
                F.explode(F.array("proj")).alias("_cp")) \
        .select("neighbor_id", "_cp",
                _norm_u(F.col("_cp"), out_dim).alias("_cpn"))
    pq = random_project(queries, in_dim=in_dim, out_dim=out_dim,
                        seed=seed, id_col=id_col, vec_col=vec_col) \
        .select(F.col(id_col).alias("query_id"),
                F.explode(F.array("proj")).alias("_qp")) \
        .select("query_id", "_qp",
                _norm_u(F.col("_qp"), out_dim).alias("_qpn"))
    approx = F.round(
        _dot_u(F.col("_qp"), F.col("_cp"), out_dim)
        / (F.col("_qpn") * F.col("_cpn")), 6)
    scored = (
        pc.join(F.broadcast(pq), F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", approx.alias("approx"))
    )
    ws = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("neighbor_id").asc())
    short = (scored.withColumn("_srank", F.row_number().over(ws))
             .filter(F.col("_srank") <= shortlist)
             .select("query_id", "neighbor_id"))
    cvecs = corpus.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("cvec"),
                          _norm_u(F.col(vec_col), in_dim).alias("_cn"))
    qvecs = queries.select(F.col(id_col).alias("query_id"),
                           F.col(vec_col).alias("qvec2"),
                           _norm_u(F.col(vec_col), in_dim).alias("_qn"))
    exact = (
        cvecs.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .select("query_id", "neighbor_id",
                F.round(_dot_u(F.col("qvec2"), F.col("cvec"), in_dim)
                        / (F.col("_qn") * F.col("_cn")), 6).alias("score"))
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (exact.withColumn("rank", F.row_number().over(wk))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "score"))


# --------------------------------------------------------------------------
# nearest-class-mean evaluation (Rocchio / NCM classifier) over labeled
# embeddings — integer fixed-point so the whole evaluation is oracle-exact.

def nearest_centroid_confusion(
    embeddings: DataFrame,
    *,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 1 << 20,
) -> DataFrame:
    """Nearest-class-mean assignment + confusion matrix — the quick
    embedding-space quality probe (is the space linearly separated by
    label?) run before spending on a trained head; also the evaluation
    a clustering/IVF codebook is compared against.

    Determinism: coordinates quantize to ``scale``-scaled int64
    (exact), class centroids are integer floor-div means of exact int
    sums (ORDER-INDEPENDENT — no float accumulation anywhere), and
    assignment minimizes the exact integer squared L2 distance
    (|diff| <= 2^21, dim * diff^2 < 2^48 — no overflow, no rounding).
    Ties break on the smaller label. The SQL oracle replays every
    integer bit-for-bit.

    Scale shape: centroids = one posexplode + one (label, dim)
    aggregate (map-side combined, output |labels|*dim rows,
    broadcast); assignment = one broadcast join + per-(vector, label)
    exact-int aggregate over rows*|labels|*dim pipelined under the
    same scan, then a WindowGroupLimit rank-1 cut; the confusion
    output is |labels|^2 rows.

    Output: (label, pred_label, n) integer confusion counts.
    """
    xq = F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("d")
    base = _spread(embeddings, id_col).select(
        F.col(id_col).alias("vid"), F.col(label_col).alias("label"),
        F.col(vec_col).alias("_v")
    ).select(
        "vid", "label", xq, "_v"
    ).select(
        "vid", "label", "d",
        F.floor(F.element_at(F.col("_v"), F.col("d") + 1)
                .cast("double") * F.lit(float(scale))).cast("long")
        .alias("xq"))
    cent = (base.groupBy("label", "d")
            .agg(F.sum("xq").alias("_s"), F.count("*").alias("_n"))
            .select(F.col("label").alias("clabel"), "d",
                    F.expr("_s div _n").alias("c")))
    dists = (base.join(F.broadcast(cent), "d")
             .groupBy("vid", "label", "clabel")
             .agg(F.sum((F.col("xq") - F.col("c"))
                        * (F.col("xq") - F.col("c"))).alias("d2")))
    w = Window.partitionBy("vid").orderBy(
        F.col("d2").asc(), F.col("clabel").asc())
    assigned = (dists.withColumn("_r", F.row_number().over(w))
                .filter(F.col("_r") == 1))
    return (assigned.groupBy(
                F.col("label"), F.col("clabel").alias("pred_label"))
            .agg(F.count("*").cast("long").alias("n")))
