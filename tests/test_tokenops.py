"""Token-domain operators (tokenops): n-gram contamination screen and
novelty over tokens:array<int> — semantics + plan shape."""

import pytest
from pyspark.sql import functions as F

from solarpos_spark.operators import tokenops


@pytest.fixture()
def corpus(spark):
    rows = [
        # doc 1 and 2 share the run 100..104 (three 3-grams)
        (1, [100, 101, 102, 103, 104, 7, 8, 9]),
        (2, [50, 100, 101, 102, 103, 104]),
        (3, [1, 2, 3, 4]),          # all windows unique
        (4, [1, 2]),                # shorter than n=3: no windows
    ]
    return spark.createDataFrame(rows, "doc_id long, tokens array<int>")


class TestTokenDecontaminate:
    def test_planted_overlap_and_counts(self, spark, corpus):
        eval_df = spark.createDataFrame(
            [(0, [100, 101, 102, 103])], "doc_id long, tokens array<int>")
        out = {r.doc_id: r for r in tokenops.token_ngram_decontaminate(
            corpus, eval_df, n=3).collect()}
        # eval grams: (100,101,102), (101,102,103)
        assert out[1].n_hits == 2 and out[1].contaminated
        assert out[2].n_hits == 2 and out[2].contaminated
        assert out[3].n_hits == 0 and not out[3].contaminated
        assert out[4].n_hits == 0 and not out[4].contaminated
        assert len(out) == 4        # clean docs are NOT dropped

    def test_short_sequences_fabricate_no_grams(self, spark):
        """F.sequence(0, negative) DESCENDS — the size guard must return
        an empty window list for sequences shorter than n, on both the
        train and eval side."""
        train = spark.createDataFrame(
            [(1, [5, 6])], "doc_id long, tokens array<int>")
        eval_df = spark.createDataFrame(
            [(0, [5, 6])], "doc_id long, tokens array<int>")
        out = tokenops.token_ngram_decontaminate(
            train, eval_df, n=3).collect()
        assert out[0].n_hits == 0 and not out[0].contaminated

    def test_eval_side_broadcast_only(self, spark, corpus):
        eval_df = spark.createDataFrame(
            [(0, [100, 101, 102])], "doc_id long, tokens array<int>")
        plan = tokenops.token_ngram_decontaminate(
            corpus, eval_df, n=3)._jdf.queryExecution() \
            .executedPlan().toString()
        # the gram join must be broadcast; only the per-doc count and the
        # left join back may exchange (doc-keyed, one row per doc)
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


class TestTokenScreenArrow:
    def test_batch_parity_with_relational(self, spark):
        """token_screen_arrow (flat-buffer sliding windows + np.isin on
        void views) must equal token_ngram_decontaminate bit-for-bit,
        including planted leakage — eval docs stolen from the corpus."""
        import random

        from solarpos_spark.operators import tokenops

        random.seed(7)
        rows = [(i, [random.randint(0, 50)
                     for _ in range(random.randint(1, 30))])
                for i in range(200)]
        df = spark.createDataFrame(rows, "doc_id long, tokens array<int>")
        ev_rows = [(0, rows[3][1][:10]), (1, rows[40][1][2:20])]
        ev = spark.createDataFrame(ev_rows, "doc_id long, tokens array<int>")
        n = 4
        rel = sorted(map(tuple, tokenops.token_ngram_decontaminate(
            df, ev, n=n).collect()))
        grams = {tuple(t[i:i + n]) for _, t in ev_rows
                 for i in range(len(t) - n + 1)}
        arrow = sorted(map(tuple, tokenops.token_screen_arrow(
            df, grams, n=n).collect()))
        assert rel == arrow
        cont = {r[0] for r in arrow if r[2]}
        assert {3, 40} <= cont

    def test_document_boundary_windows_masked(self, spark):
        """A window spanning two adjacent docs in the same Arrow batch
        must NOT count: doc1+doc2 concatenated contain the eval gram,
        neither doc alone does."""
        from solarpos_spark.operators import tokenops

        df = spark.createDataFrame(
            [(1, [1, 2]), (2, [3, 4])], "doc_id long, tokens array<int>") \
            .coalesce(1)
        out = tokenops.token_screen_arrow(
            df, {(1, 2, 3, 4)}, n=4).collect()
        assert all(r.n_hits == 0 for r in out)

    def test_passthrough_keeps_all_columns(self, spark):
        """passthrough=True appends the verdict to EVERY input column in
        one stage (the streaming filter-then-continue form — joining
        verdicts back would be a stateful stream-stream self-join) and
        must agree with the projecting form row-for-row."""
        from solarpos_spark.operators import tokenops

        df = spark.createDataFrame(
            [(1, [1, 2, 3, 4], "keep"), (2, [9, 9, 9], "me")],
            "doc_id long, tokens array<int>, extra string")
        out = {r.doc_id: r for r in tokenops.token_screen_arrow(
            df, {(1, 2, 3)}, n=3, passthrough=True).collect()}
        assert out[1].extra == "keep" and out[1].tokens == [1, 2, 3, 4]
        assert out[1].n_hits == 1 and out[1].contaminated
        assert out[2].n_hits == 0 and not out[2].contaminated
        proj = {r.doc_id: r.n_hits for r in tokenops.token_screen_arrow(
            df, {(1, 2, 3)}, n=3).collect()}
        assert proj == {d: r.n_hits for d, r in out.items()}

    def test_empty_eval_set(self, spark):
        from solarpos_spark.operators import tokenops

        df = spark.createDataFrame(
            [(1, [1, 2, 3, 4, 5])], "doc_id long, tokens array<int>")
        out = tokenops.token_screen_arrow(df, set(), n=3).collect()
        assert out[0].n_hits == 0 and not out[0].contaminated


class TestTokenNovelty:
    def test_shared_vs_unique_windows(self, spark, corpus):
        out = {r.doc_id: r for r in tokenops.token_ngram_novelty(
            corpus, n=3).collect()}
        # doc 1: 6 windows, 3 shared with doc 2 ((100..102),(101..103),
        # (102..104)) -> 3 novel
        assert out[1].n_windows == 6 and out[1].n_novel == 3
        assert out[1].novelty == 0.5
        # doc 2: 4 windows, the 3 run windows shared -> 1 novel
        assert out[2].n_windows == 4 and out[2].n_novel == 1
        assert out[2].novelty == 0.25
        assert out[3].n_windows == 2 and out[3].novelty == 1.0
        # shorter than n: zero windows, null novelty (not 0.0)
        assert out[4].n_windows == 0 and out[4].novelty is None

    def test_duplicate_window_within_one_doc_stays_novel(self, spark):
        """df counts DISTINCT docs: a window repeated inside ONE doc is
        still novel (df == 1) — novelty measures cross-doc sharing."""
        df = spark.createDataFrame(
            [(1, [7, 8, 9, 7, 8, 9])], "doc_id long, tokens array<int>")
        out = tokenops.token_ngram_novelty(df, n=3).collect()[0]
        assert out.n_windows == 4 and out.n_novel == 4
