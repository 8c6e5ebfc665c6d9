"""Priority (weighted bottom-k) sampling and MMR diversified re-ranking."""

from __future__ import annotations

from pyspark.sql import functions as F

from solarpos_spark.operators.curate import priority_sample
from solarpos_spark.operators.search import mmr_rerank


def _docs(spark, n=1000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), F.col("id") % 4).alias("source"),
        # ids < n/2 carry weight 20, the rest weight 1
        F.when(F.col("id") < n // 2, F.lit(20)).otherwise(F.lit(1))
        .alias("w"))


class TestPrioritySample:
    def test_weight_proportional_inclusion(self, spark):
        # heavier rows must dominate the sample (20:1 odds per row)
        got = priority_sample(_docs(spark), weight_col="w", k=200)
        heavy = got.filter(F.col("doc_id") < 500).count()
        assert heavy >= 160  # E[heavy] ≈ 190; far from uniform's 100

    def test_deterministic_rerun(self, spark):
        a = sorted(map(tuple, priority_sample(
            _docs(spark), weight_col="w", k=100).collect()))
        b = sorted(map(tuple, priority_sample(
            _docs(spark), weight_col="w", k=100).collect()))
        assert a == b

    def test_seed_changes_sample(self, spark):
        a = {r.doc_id for r in priority_sample(
            _docs(spark), weight_col="w", k=100, seed=1).collect()}
        b = {r.doc_id for r in priority_sample(
            _docs(spark), weight_col="w", k=100, seed=2).collect()}
        assert a != b

    def test_nonpositive_weights_excluded(self, spark):
        df = spark.range(10).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 3 - 1).alias("w"))  # weights -1, 0, 1
        got = priority_sample(df, weight_col="w", k=10)
        assert {r.doc_id for r in got.collect()} == \
            {i for i in range(10) if i % 3 == 2}

    def test_strata_quota(self, spark):
        got = priority_sample(_docs(spark), weight_col="w", k=5,
                              strata_col="source")
        per = {r.source: r.n for r in
               got.groupBy("source").agg(F.count("*").alias("n"))
               .collect()}
        assert per == {f"s{i}": 5 for i in range(4)}

    def test_plan_shapes(self, spark):
        g = priority_sample(_docs(spark), weight_col="w", k=10)
        assert "TakeOrderedAndProject" in \
            g._jdf.queryExecution().executedPlan().toString()
        s = priority_sample(_docs(spark), weight_col="w", k=3,
                            strata_col="source")
        assert "WindowGroupLimit" in \
            s._jdf.queryExecution().executedPlan().toString()


def _emb(spark):
    # two tight clusters + a mid-relevance outlier; query = e1 axis.
    # cluster A ~ (1, eps, 0), cluster B ~ (0.8 relevance but diverse)
    rows = []
    for i in range(5):  # cluster A: almost identical, most relevant
        rows.append((i, [1.0, 0.01 * i, 0.0, 0.0]))
    for i in range(5):  # cluster B: less relevant, orthogonal-ish to A
        rows.append((10 + i, [0.6, 0.0, 0.8, 0.01 * i]))
    rows.append((99, [1.0, 0.0, 0.0, 0.0]))  # the query itself
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestMMR:
    def test_first_pick_is_top_relevance(self, spark):
        emb = _emb(spark)
        q = emb.filter(F.col("vec_id") == 99).select("embedding")
        got = {r.rank: r.vec_id for r in
               mmr_rerank(emb, q, k=4, depth=11, lam=0.75).collect()}
        # vec 0 and vec 99 both equal the query (rel = 1.0); the id
        # tiebreak must pick the smaller
        assert got[1] == 0

    def test_diversity_beats_pure_topk(self, spark):
        emb = _emb(spark).filter(F.col("vec_id") != 99)
        q = spark.createDataFrame([([1.0, 0.0, 0.0, 0.0],)],
                                  "embedding array<float>")
        # pure relevance top-3 would be three cluster-A members;
        # with a diversity-leaning lam, MMR must reach into cluster B
        got = [r.vec_id for r in
               mmr_rerank(emb, q, k=3, depth=10, lam=0.5)
               .orderBy("rank").collect()]
        assert got[0] < 10  # most relevant is from A
        assert any(v >= 10 for v in got), got

    def test_high_lam_recovers_relevance_order(self, spark):
        emb = _emb(spark).filter(F.col("vec_id") != 99)
        q = spark.createDataFrame([([1.0, 0.0, 0.0, 0.0],)],
                                  "embedding array<float>")
        got = [r.vec_id for r in
               mmr_rerank(emb, q, k=3, depth=10, lam=0.999999)
               .orderBy("rank").collect()]
        assert all(v < 10 for v in got), got  # pure top-rel = all A

    def test_ranks_contiguous_and_deterministic(self, spark):
        emb = _emb(spark)
        q = emb.filter(F.col("vec_id") == 99).select("embedding")
        a = sorted(map(tuple,
                       mmr_rerank(emb, q, k=5, depth=11).collect()))
        b = sorted(map(tuple,
                       mmr_rerank(emb, q, k=5, depth=11).collect()))
        assert a == b
        assert [t[0] for t in a] == [1, 2, 3, 4, 5]
