"""WordPiece tokenizer: greedy longest-match semantics, fit determinism,
per-doc counts. The distributed pointer-doubling segmentation is checked
against a plain Python greedy reference over every distinct corpus word."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solarpos_spark.operators import tokenizer

SF = "/root/testdata/sf0.001"


def greedy_ref(word: str, vocab: set[str], max_piece: int,
               max_word: int) -> tuple[int, bool]:
    """The published WordPiece inference rule, restated imperatively."""
    if len(word) > max_word:
        return 1, True
    i, n = 0, 0
    while i < len(word):
        for l in range(min(max_piece, len(word) - i), 0, -1):
            piece = word[i:i + l] if i == 0 else "##" + word[i:i + l]
            if piece in vocab:
                i += l
                n += 1
                break
        else:
            return 1, True  # unmatched position -> [UNK]
    return n, False


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


class TestWordTokens:
    def test_longest_match_first(self, spark):
        # 'unaffable' with {un, ##aff, ##able, una, ...}: greedy takes
        # 'una' (longest initial), NOT the better 2-piece split.
        vocab = spark.createDataFrame(
            [("un",), ("una",), ("##aff",), ("##able",), ("##ffable",),
             ("##f",), ("##a",), ("##b",), ("##l",), ("##e",)],
            "piece string")
        words = spark.createDataFrame([("unaffable",)], "word string")
        got = tokenizer.wordpiece_word_tokens(
            words, vocab, max_piece_chars=8).collect()[0]
        # una | ##ffable  -> 2 pieces
        assert (got["n_pieces"], got["is_unk"]) == (2, False)

    def test_unk_without_fallback_and_overlong(self, spark):
        vocab = spark.createDataFrame([("ab",)], "piece string")
        words = spark.createDataFrame(
            [("abxy",), ("ab",), ("x" * 20,)], "word string")
        got = {r["word"]: (r["n_pieces"], r["is_unk"])
               for r in tokenizer.wordpiece_word_tokens(
                   words, vocab, max_word_chars=16).collect()}
        assert got["ab"] == (1, False)
        assert got["abxy"] == (1, True)     # no ##x piece -> [UNK]
        assert got["x" * 20] == (1, True)   # overlong -> [UNK]

    def test_matches_python_greedy_on_corpus_words(self, spark, docs):
        vocab_df = tokenizer.wordpiece_fit(
            docs, vocab_size=32, max_piece_chars=4)
        vocab = {r["piece"] for r in vocab_df.collect()}
        words = tokenizer._norm_words(
            docs.select("text"), "text", None).distinct()
        got = {r["word"]: (r["n_pieces"], r["is_unk"])
               for r in tokenizer.wordpiece_word_tokens(
                   words, vocab_df, max_piece_chars=4).collect()}
        assert len(got) > 10
        multi = 0
        for w in got:
            want = greedy_ref(w, vocab, 4, 16)
            assert got[w] == want, w
            multi += got[w][0] > 1
        assert multi > 0  # the fit actually yields multi-piece words

    def test_fit_deterministic_and_char_complete(self, spark, docs):
        a = sorted(r["piece"] for r in tokenizer.wordpiece_fit(
            docs, vocab_size=32, max_piece_chars=4).collect())
        b = sorted(r["piece"] for r in tokenizer.wordpiece_fit(
            docs.repartition(7), vocab_size=32, max_piece_chars=4).collect())
        assert a == b
        assert {"a", "##a", "z", "##z", "0", "##9"} <= set(a)


class TestDocCounts:
    def test_empty_doc_keeps_zero_row(self, spark):
        df = spark.createDataFrame(
            [(1, "agg agg table"), (2, "...")], "doc_id long, text string")
        vocab = tokenizer.char_fallback_vocab(spark)
        got = {r["doc_id"]: (r["n_words"], r["n_wp_tokens"], r["n_unk_words"])
               for r in tokenizer.wordpiece_counts(df, vocab).collect()}
        # char-only vocab: every word splits into len(word) pieces
        assert got[1] == (3, 3 + 3 + 5, 0)
        assert got[2] == (0, 0, 0)

    def test_corpus_totals_match_reference(self, spark, docs):
        sub = docs.filter(F.col("doc_id") < 50)
        vocab_df = tokenizer.wordpiece_fit(sub, vocab_size=32,
                                           max_piece_chars=4)
        vocab = {r["piece"] for r in vocab_df.collect()}
        got = {r["doc_id"]: r for r in tokenizer.wordpiece_counts(
            sub, vocab_df, max_piece_chars=4).collect()}
        rows = sub.select("doc_id", "text").collect()
        assert len(got) == len(rows)
        for r in rows:
            import re
            ws = [w for w in re.sub(
                "[^a-z0-9]+", " ", r["text"].lower()).split() if w]
            n_tok = sum(greedy_ref(w, vocab, 4, 16)[0] for w in ws)
            n_unk = sum(greedy_ref(w, vocab, 4, 16)[1] for w in ws)
            g = got[r["doc_id"]]
            assert (g["n_words"], g["n_wp_tokens"], g["n_unk_words"]) == \
                (len(ws), n_tok, n_unk)


class TestBpeFit:
    def _ref(self, text, merges):
        """Imperative Sennrich BPE with the same deterministic argmax
        (count desc, pair lexicographic)."""
        import collections

        vocab = collections.Counter(text.split())
        words = {w: list(w) + ["</w>"] for w in vocab}
        ref = []
        for t in range(1, merges + 1):
            stats = collections.Counter()
            for w, syms in words.items():
                for i in range(len(syms) - 1):
                    stats[(syms[i], syms[i + 1])] += vocab[w]
            if not stats:
                break
            (x, y), cnt = sorted(
                stats.items(),
                key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
            ref.append((t, x, y, cnt))
            for w, syms in words.items():
                out, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == x
                            and syms[i + 1] == y):
                        out.append(x + y)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                words[w] = out
        return ref

    def test_matches_imperative_reference(self, spark):
        from solarpos_spark.operators.tokenizer import bpe_fit

        text = ("low low low lower lowest newer newest new aaa aaaa "
                "banana low lower newer new banana bandana anna")
        docs = spark.createDataFrame([(0, text)],
                                     "doc_id long, text string")
        got = [(r.round, r.left_sym, r.right_sym, r.pair_count)
               for r in bpe_fit(docs, merges=12).orderBy("round")
               .collect()]
        assert got == self._ref(text, 12)

    def test_same_symbol_runs_merge_leftmost_first(self, spark):
        from solarpos_spark.operators.tokenizer import bpe_fit

        # "aaaaa" x3: (a,a) dominates; leftmost-first gives (aa)(aa)a
        # round 2 then merges (aa,aa)
        text = "aaaaa aaaaa aaaaa b"
        docs = spark.createDataFrame([(0, text)],
                                     "doc_id long, text string")
        got = [(r.round, r.left_sym, r.right_sym, r.pair_count)
               for r in bpe_fit(docs, merges=3).orderBy("round")
               .collect()]
        assert got == self._ref(text, 3)
        assert got[0][1:3] == ("a", "a")

    def test_dry_rounds_are_noops(self, spark):
        from solarpos_spark.operators.tokenizer import bpe_fit

        # a single 1-char word exhausts after ("a", "</w>"): later
        # rounds must emit nothing rather than corrupting state
        docs = spark.createDataFrame([(0, "a a a")],
                                     "doc_id long, text string")
        got = [(r.round, r.left_sym, r.right_sym)
               for r in bpe_fit(docs, merges=4).orderBy("round")
               .collect()]
        assert got == [(1, "a", "</w>")]

    def test_token_counts_match_reference_segmentation(self, spark):
        from solarpos_spark.operators.tokenizer import bpe_token_counts
        import collections, re

        texts = {0: "low lower new newer", 1: "banana anna new low"}
        docs = spark.createDataFrame(list(texts.items()),
                                     "doc_id long, text string")
        got = {r.doc_id: (r.n_words, r.n_bpe_tokens) for r in
               bpe_token_counts(docs, merges=6).collect()}
        # reference: train on the histogram, then count symbols per word
        text = " ".join(texts.values())
        vocab = collections.Counter(text.split())
        words = {w: list(w) + ["</w>"] for w in vocab}
        for t in range(6):
            stats = collections.Counter()
            for w, syms in words.items():
                for i in range(len(syms) - 1):
                    stats[(syms[i], syms[i + 1])] += vocab[w]
            if not stats:
                break
            (x, y), _ = sorted(
                stats.items(),
                key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
            for w, syms in words.items():
                out, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == x
                            and syms[i + 1] == y):
                        out.append(x + y)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                words[w] = out
        for d, txt in texts.items():
            ws = txt.split()
            want = (len(ws), sum(len(words[w]) for w in ws))
            assert got[d] == want, (d, got[d], want)
