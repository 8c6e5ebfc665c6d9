"""Link-graph operators — the authority axis of web-corpus curation.

Released web corpora rank and cap domains by link-graph centrality
(Common Crawl publishes harmonic/PageRank host rankings; CCNet/RefinedWeb
style pipelines consult them for source weighting). The reference engine
(a solar-position CLI, /root/reference/src/main — no graph surface at
all) has no counterpart; this module exists for the 100 TB training-data
pipeline of SURVEY §2's extension axis, alongside operators/urls.py
which produces the host relation these graphs are built from.

Design notes (scale):

- ``pagerank`` is the Pregel shape expressed relationally: per round ONE
  shuffle of the (small) rank relation to the edge partitioning plus ONE
  aggregate shuffle of contributions onto the destination key. The edge
  relation — the O(100 TB) side — is hash-partitioned by source ONCE and
  reused every round (persisted with its out-degrees attached); ranks
  are O(#nodes), orders of magnitude smaller than edges on any web
  graph. ``localCheckpoint`` per round keeps lineage O(1) in rounds,
  the connected-components loop discipline (dedup.py:374).
- All arithmetic is int64 fixed-point (rank mass scaled by ``scale``)
  with floor division on nonnegative values only — Spark's ``div`` and
  DuckDB's ``//`` agree there, so a SQL oracle can replay the FULL
  iteration bit-for-bit (no float accumulation-order hazard at any
  cluster size; the same discipline as similarity.ivf_train_centroids).
- A fixed round count (default 8; |r_t - r_∞| decays as damping^t) keeps
  the job count deterministic and the unrolled oracle finite. Dangling
  nodes (no out-edges) leak their damped mass each round — the standard
  "leaked mass" PageRank variant; totals are therefore < ``scale``,
  which only rescales ranks uniformly and preserves ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank", "degree_stats"]


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 8,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
) -> DataFrame:
    """Fixed-point integer PageRank over a directed edge relation.

    Edges are deduplicated (simple-graph semantics: out-degree = count of
    distinct successors). Every node appearing as source or destination
    participates. Per round::

        contrib(v) = Σ_{u→v} rank(u) div outdeg(u)
        rank'(v)   = base + (damping_num * contrib(v)) div damping_den
        base       = ((damping_den - damping_num) * scale)
                     div (damping_den * N)

    with all terms int64 and all divisions floor-on-nonnegative, so the
    result is schedule- and partitioning-independent — the property that
    lets a DuckDB oracle unroll the identical recurrence.

    Returns ``(node, rank)`` with ``rank`` int64 in units of
    ``scale / N`` ≈ the stationary probability times ``scale``.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
    )
    # Loop-invariant relations are persist()ed, NOT localCheckpoint()ed:
    # a checkpointed RDD scan loses its outputPartitioning and Catalyst
    # would re-shuffle the (100 TB) edge side on EVERY round, while an
    # InMemoryRelation keeps hashpartitioning(u) / hashpartitioning(node)
    # visible, so each round only exchanges the small rank relation
    # (verified in tests/test_graph.py::test_edges_not_reshuffled).
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .persist()
    )
    # Edge relation with out-degrees attached, partitioned by source once;
    # every round's rank join reuses this layout (the 100 TB side never
    # moves again).
    outdeg = e.groupBy("u").agg(F.count("*").alias("outdeg"))
    # sortWithinPartitions before persist: InMemoryRelation keeps the
    # outputOrdering, so every round's sort-merge join reads the edge
    # side with NO per-round Sort (re-sorting the 100 TB side every
    # round was the dominant per-round cost before this)
    ewd = (
        e.join(outdeg, "u")
        .repartition("u")
        .sortWithinPartitions("u")
        .persist()
    )
    ewd.count()
    n_nodes = nodes.count()
    if n_nodes == 0:
        # empty graph (ADVICE r5): extract_links legitimately emits no
        # edges when no document carries an absolute href — return the
        # empty (node, rank) relation instead of dividing by zero and
        # killing the job after upstream output was already written
        nodes.unpersist()
        ewd.unpersist()
        return nodes.select(
            "node", F.lit(0).cast("long").alias("rank"))
    base = ((damping_den - damping_num) * scale) // (damping_den * n_nodes)
    ranks = nodes.select(
        "node", F.lit(scale // n_nodes).cast("long").alias("rank")
    ).localCheckpoint(eager=True)
    for _ in range(rounds):
        contrib = (
            ewd.join(ranks.withColumnRenamed("node", "u"), "u")
            .select(
                F.col("v").alias("node"),
                F.expr("rank div outdeg").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("csum"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({damping_num} * coalesce(csum, 0)) "
                        f"div {damping_den}"
                    )
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    nodes.unpersist()
    ewd.unpersist()
    return ranks


def degree_stats(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Per-node in/out degree over the deduplicated edge relation —
    the cheap companion profile (hub/authority raw counts) a curation
    run consults next to ``pagerank``. One distinct + two aggregates,
    full-outer-merged on the node key."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .distinct()
    )
    out_d = e.groupBy(F.col("u").alias("node")).agg(
        F.count("*").alias("out_degree"))
    in_d = e.groupBy(F.col("v").alias("node")).agg(
        F.count("*").alias("in_degree"))
    return (
        out_d.join(in_d, "node", "full")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).cast("long")
            .alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).cast("long")
            .alias("in_degree"),
        )
    )


def pagerank_sql_oracle(
    edges_cte: str,
    *,
    rounds: int = 8,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 10**12,
) -> str:
    """DuckDB oracle replaying the FULL ``pagerank`` recurrence —
    generated from the same constants so query and oracle cannot drift
    (the fmix32_sql discipline). ``edges_cte`` must be the body of a CTE
    producing columns ``(u, v)`` (pre-dedup; the oracle applies
    DISTINCT). Every round is a MATERIALIZED CTE: r_t is referenced by
    both c_{t+1} and r_{t+1}, and DuckDB would otherwise inline and
    double the plan per round (the unrolled-training CLAUDE.md rule).
    """
    ctes = [
        ("eraw", edges_cte, False),
        ("e", "SELECT DISTINCT u, v FROM eraw", True),
        ("nodes", "SELECT u AS node FROM e UNION SELECT v FROM e", True),
        ("deg", "SELECT u, count(*) AS outdeg FROM e GROUP BY u", True),
        ("nn", "SELECT count(*) AS n FROM nodes", False),
        ("r0", f"SELECT node, {scale} // n AS rank FROM nodes, nn", True),
    ]
    base = (f"(({damping_den - damping_num} * CAST({scale} AS BIGINT)) "
            f"// ({damping_den} * n))")
    for t in range(1, rounds + 1):
        ctes.append((
            f"c{t}",
            f"SELECT e.v AS node, sum(r.rank // d.outdeg) AS csum "
            f"FROM e JOIN deg d USING (u) "
            f"JOIN r{t - 1} r ON r.node = e.u GROUP BY e.v",
            False,
        ))
        ctes.append((
            f"r{t}",
            f"SELECT nodes.node, {base} + "
            f"({damping_num} * coalesce(c.csum, 0)) // {damping_den} "
            f"AS rank "
            f"FROM nodes CROSS JOIN nn LEFT JOIN c{t} c "
            f"ON c.node = nodes.node",
            True,
        ))
    body = ",\n".join(
        f"{name} AS MATERIALIZED ({sql})" if mat else f"{name} AS ({sql})"
        for name, sql, mat in ctes
    )
    return (f"WITH {body}\n"
            f"SELECT node, CAST(rank AS BIGINT) AS rank FROM r{rounds}")
