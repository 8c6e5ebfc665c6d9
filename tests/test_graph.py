"""Link-graph operators: pagerank fixed point, degree stats, link
extraction, and the plan shapes that make them scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solarpos_spark.operators import graph, urls


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


class TestPagerank:
    def test_star_graph_authority(self, spark):
        # all leaves point at the hub: hub rank must dominate
        rows = [(f"l{i}", "hub") for i in range(5)]
        pr = {r.node: r.rank for r in
              graph.pagerank(_edges(spark, rows), rounds=8).collect()}
        assert pr["hub"] > max(v for k, v in pr.items() if k != "hub")
        # all leaves are symmetric -> identical ranks
        leaf_ranks = {v for k, v in pr.items() if k != "hub"}
        assert len(leaf_ranks) == 1

    def test_empty_graph_returns_empty(self, spark):
        """ADVICE r5: an edge relation with zero rows must yield an
        empty (node, rank) relation, not ZeroDivisionError."""
        from pyspark.sql import functions as F

        e = spark.createDataFrame([], "src long, dst long")
        out = graph.pagerank(e, rounds=2)
        assert out.columns == ["node", "rank"]
        assert out.count() == 0

    def test_duplicate_edges_collapse(self, spark):
        # simple-graph semantics: edge multiplicity must not change ranks
        once = graph.pagerank(
            _edges(spark, [("a", "b"), ("b", "a")]), rounds=4)
        thrice = graph.pagerank(
            _edges(spark, [("a", "b")] * 3 + [("b", "a")]), rounds=4)
        assert sorted(map(tuple, once.collect())) == \
            sorted(map(tuple, thrice.collect()))

    def test_cycle_is_uniform(self, spark):
        # a directed 3-cycle is doubly stochastic: ranks stay equal
        rows = [("a", "b"), ("b", "c"), ("c", "a")]
        ranks = {r.rank for r in
                 graph.pagerank(_edges(spark, rows), rounds=6).collect()}
        assert len(ranks) == 1

    def test_mass_conserved_without_dangling(self, spark):
        # no dangling nodes -> total mass stays within rounding slack
        # (each round loses < N * (1 + damping) from floor divisions)
        rows = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"),
                ("c", "b")]
        scale = 10**12
        pr = graph.pagerank(_edges(spark, rows), rounds=8, scale=scale)
        total = pr.agg(F.sum("rank")).collect()[0][0]
        assert scale * 0.999 <= total <= scale

    def test_dangling_leaks_documented_variant(self, spark):
        # b has no out-edges: its damped mass leaks, total drops below
        # scale but ordering (a feeds b, b hoards) is preserved
        pr = {r.node: r.rank for r in
              graph.pagerank(_edges(spark, [("a", "b")]),
                             rounds=8).collect()}
        assert pr["b"] > pr["a"]

    def test_matches_reference_float_pagerank(self, spark):
        # fixed-point ranks track a float reference within fixed-point
        # resolution on an irregular graph
        rows = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
                ("d", "c"), ("d", "a"), ("e", "d")]
        scale = 10**12
        got = {r.node: r.rank for r in
               graph.pagerank(_edges(spark, rows), rounds=8,
                              scale=scale).collect()}
        # float reference, same leaked-mass variant, same 8 rounds
        out = {}
        for u, v in rows:
            out.setdefault(u, set()).add(v)
        nodes = sorted({n for uv in rows for n in uv})
        n = len(nodes)
        r = {x: 1.0 / n for x in nodes}
        for _ in range(8):
            contrib = {x: 0.0 for x in nodes}
            for u, succ in out.items():
                for v in succ:
                    contrib[v] += r[u] / len(succ)
            r = {x: 0.15 / n + 0.85 * contrib[x] for x in nodes}
        for x in nodes:
            assert got[x] / scale == pytest.approx(r[x], abs=1e-9)

    def test_oracle_generator_matches_spark(self, spark):
        import duckdb

        rows = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
                ("d", "c")]
        got = sorted(map(tuple,
                         graph.pagerank(_edges(spark, rows),
                                        rounds=5).collect()))
        vals = ", ".join(f"('{u}', '{v}')" for u, v in rows)
        sql = graph.pagerank_sql_oracle(
            f"SELECT * FROM (VALUES {vals}) t(u, v)", rounds=5)
        want = sorted((n, int(k)) for n, k in duckdb.sql(sql).fetchall())
        assert got == want

    def test_edges_not_reshuffled(self, spark):
        # THE scale invariant: with broadcast off (forcing the join
        # strategy a 100 TB edge relation would get), a round's plan must
        # not put an Exchange above the persisted edge relation — only
        # the small rank/contribution sides shuffle. persist() (not
        # localCheckpoint) is what keeps hashpartitioning(u) visible.
        rows = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(60)]
        e = _edges(spark, rows).selectExpr("src as u", "dst as v") \
            .distinct()
        outdeg = e.groupBy("u").agg(F.count("*").alias("outdeg"))
        ewd = e.join(outdeg, "u").repartition("u").persist()
        ewd.count()
        ranks = e.select(F.col("u").alias("node")).distinct() \
            .select("node", F.lit(1000000).alias("rank")) \
            .localCheckpoint(eager=True)
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            contrib = (
                ewd.join(ranks.withColumnRenamed("node", "u"), "u")
                .select(F.col("v").alias("node"),
                        F.expr("rank div outdeg").alias("c"))
                .groupBy("node").agg(F.sum("c").alias("csum")))
            contrib.collect()
            plan = contrib._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        ewd.unpersist()
        # positive assertion on the final plan's join subtree: the edge
        # side of the SMJ reads straight from the in-memory relation with
        # no Exchange in between (Sort is partition-local) — the per-round
        # shuffles land on the rank/aggregate sides only
        import re

        cleaned = re.sub(r"#\d+L?", "", plan)
        assert re.search(
            r"SortMergeJoin \[u\], \[u\], Inner"
            r"(?:(?!Exchange).)*?InMemoryTableScan \[u, v, outdeg\]",
            cleaned, re.S), cleaned

    def test_plan_shape(self, spark):
        # the per-round join against the checkpointed edge relation must
        # broadcast the rank side or reuse the edge exchange — and the
        # loop must NOT accumulate plan depth (localCheckpoint per round)
        rows = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(60)]
        pr = graph.pagerank(_edges(spark, rows), rounds=6)
        plan = pr._jdf.queryExecution().executedPlan().toString()
        # lineage O(1): the final plan is one round deep, not six
        assert plan.count("HashAggregate") <= 6


class TestDegreeStats:
    def test_degrees(self, spark):
        rows = [("a", "b"), ("a", "c"), ("b", "c"), ("a", "b")]
        got = {r.node: (r.out_degree, r.in_degree) for r in
               graph.degree_stats(_edges(spark, rows)).collect()}
        assert got == {"a": (2, 0), "b": (1, 1), "c": (0, 2)}


class TestExtractLinks:
    def test_extraction_subset(self, spark):
        html = ('<a href="http://x.example/p">t</a>'
                '<A HREF="HTTPS://Y.example:8080/q?z=1">u</A>'
                '<a href="/relative">r</a>'
                "<a href='http://singlequoted.example/'>s</a>"
                '<script>u="http://notanhref.example/"</script>')
        df = spark.createDataFrame([(1, html)], "doc_id long, html string")
        got = sorted(map(tuple, urls.extract_links(df).collect()))
        assert got == [
            (1, "HTTPS://Y.example:8080/q?z=1", "y.example"),
            (1, "http://x.example/p", "x.example"),
        ]

    def test_no_links_emits_nothing(self, spark):
        df = spark.createDataFrame([(1, "<p>plain</p>")],
                                   "doc_id long, html string")
        assert urls.extract_links(df).count() == 0

    def test_zero_exchanges(self, spark):
        df = spark.createDataFrame([(1, '<a href="http://a.b/">x</a>')],
                                   "doc_id long, html string")
        plan = urls.extract_links(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan

    def test_feeds_pagerank(self, spark):
        # composition: extracted link hosts form a rankable edge relation
        df = spark.createDataFrame(
            [(i, f'<a href="http://h{(i * 3 + 1) % 5}.x/">l</a>')
             for i in range(10)], "doc_id long, html string")
        links = urls.extract_links(df)
        edges = links.select(
            F.concat(F.lit("h"), F.col("doc_id") % 5,
                     F.lit(".x")).alias("src"),
            F.col("link_host").alias("dst"))
        pr = graph.pagerank(edges, rounds=3)
        assert pr.count() == 5
        assert pr.filter(F.col("rank") <= 0).count() == 0
