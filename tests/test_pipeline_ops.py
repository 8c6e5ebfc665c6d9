"""Training-data pipeline operator tests: dedup, similarity, text, multimodal.

Quality checks use planted ground truth: the synthetic `documents` table
contains near-duplicates (max 3-gram Jaccard ~0.99 at sf0.001), and we plant
exact duplicates / perturbed copies explicitly where needed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solarpos_spark.operators import dedup, similarity, text
from solarpos_spark.operators.multimodal import extract_binary_metadata

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


class TestDedup:
    def test_exact_duplicates_planted(self, spark):
        rows = [(1, "the same text body"), (2, "the  same   text body"),
                (3, "a different document")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["keep_doc_id"]: r["n_docs"]
               for r in dedup.exact_duplicates(df).collect()}
        assert out[1] == 2  # whitespace-normalized dup group
        assert out[3] == 1

    def test_jaccard_self_similarity(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon"),
             (2, "alpha beta gamma delta epsilon"),
             (3, "zeta eta theta iota kappa")],
            "doc_id long, text string")
        pairs = dedup.ngram_jaccard_pairs(df, n=3, threshold=0.5).collect()
        assert len(pairs) == 1
        assert pairs[0]["doc_a"] == 1 and pairs[0]["doc_b"] == 2
        assert pairs[0]["jaccard"] == 1.0

    def test_lsh_recall_against_exact(self, docs):
        """Every high-Jaccard pair must be an LSH candidate (banded MinHash
        with 8 bands x 4 rows has >99% recall at j >= 0.8)."""
        exact = {(r["doc_a"], r["doc_b"])
                 for r in dedup.ngram_jaccard_pairs(
                     docs, n=3, threshold=0.8).collect()}
        sigs = dedup.minhash_signatures(docs, num_hashes=32, n=3)
        cands = {(r["doc_a"], r["doc_b"])
                 for r in dedup.lsh_candidate_pairs(
                     sigs, bands=8, rows_per_band=4).collect()}
        assert exact, "fixture should contain planted near-duplicates"
        missed = exact - cands
        assert not missed, f"LSH missed high-similarity pairs: {missed}"

    def test_shingle_df_cap_drops_hot_shingle(self, spark):
        """A stopword-ish shingle shared by every doc creates O(n^2)
        candidate pairs through one join key; the df cap removes it so only
        genuinely-similar docs pair."""
        n = 20
        rows = [(i, f"alpha beta gamma u{i} v{i} w{i}") for i in range(n)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        # every pair shares exactly the hot 'alpha beta gamma' shingle:
        # jaccard = 1/7 -> all C(20,2)=190 pairs pass threshold 0.1
        uncapped = dedup.ngram_jaccard_pairs(docs, threshold=0.1)
        assert uncapped.count() == n * (n - 1) // 2
        # cap df at 2: the hot shingle (df=20) is dropped from the sets,
        # nothing is shared anymore -> zero pairs
        capped = dedup.ngram_jaccard_pairs(docs, threshold=0.1,
                                           max_shingle_df=2)
        assert capped.count() == 0

    def test_shingle_df_cap_identity_when_above_max(self, spark, docs):
        base = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
        capped = dedup.ngram_jaccard_pairs(docs, threshold=0.5,
                                           max_shingle_df=10**6)
        assert base.exceptAll(capped).count() == 0
        assert capped.exceptAll(base).count() == 0

    def test_simhash_similar_docs_close(self, spark):
        df = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog again and again"),
             (2, "the quick brown fox jumps over the lazy cat again and again"),
             (3, "completely unrelated words about spark shuffles and parquet")],
            "doc_id long, text string")
        out = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df).collect()}

        def hamming(a, b):
            return bin((a ^ b) & ((1 << 64) - 1)).count("1")

        assert hamming(out[1], out[2]) < hamming(out[1], out[3])
        assert hamming(out[1], out[2]) < 16


class TestSimilarity:
    def test_brute_force_topk_self_best(self, spark, emb):
        # a vector's nearest neighbor set must contain its duplicate
        dup = emb.filter(F.col("vec_id") == 0).select(
            F.lit(999999).cast("long").alias("vec_id"),
            "embedding", "label")
        corpus = emb.unionByName(dup)
        q = corpus.filter(F.col("vec_id") == 999999)
        top = similarity.brute_force_topk(corpus, q, k=1).collect()
        assert top[0]["neighbor_id"] == 0
        assert top[0]["score"] == 1.0

    def test_ann_finds_planted_duplicates(self, spark, emb):
        """Sign-LSH guarantee: identical vectors always share a bucket, so
        ANN top-1 must recover every planted duplicate. (Top-1 recall on
        *uniform random* corpora is theory-bounded at (1-theta/pi)^planes
        and deliberately not asserted.)"""
        dups = emb.filter(F.col("vec_id") < 10).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label")
        corpus = emb.unionByName(dups)
        approx = {r["query_id"]: (r["neighbor_id"], r["score"])
                  for r in similarity.ann_topk(
                      corpus, dups, dim=64, k=1, n_planes=6).collect()}
        assert len(approx) == 10
        for qid, (nid, score) in approx.items():
            assert nid == qid - 100000
            assert score == 1.0

    def test_multiprobe_improves_or_matches_recall(self, spark, emb):
        """Multi-probe probes the query bucket + Hamming-1 neighbors, so its
        candidate set is a superset: top-1 recall vs exact can only go up."""
        q = emb.filter(F.col("vec_id") < 25)
        exact = {r["query_id"]: r["neighbor_id"] for r in
                 similarity.brute_force_topk(emb, q, k=1).collect()}

        def recall(multiprobe):
            got = {r["query_id"]: r["neighbor_id"] for r in
                   similarity.ann_topk(emb, q, dim=64, k=1, n_planes=6,
                                       multiprobe=multiprobe).collect()}
            return sum(got.get(qid) == nid for qid, nid in exact.items())

        r0, r3 = recall(0), recall(3)
        assert r3 >= r0
        assert r3 >= 1  # probing 4x buckets must recover something

    def test_near_duplicates_planted(self, spark, emb):
        """Both variants must recover a planted duplicate: identical vectors
        always share an LSH bucket, so the bucketed default cannot miss it."""
        dup = emb.filter(F.col("vec_id") == 3).select(
            F.lit(888888).cast("long").alias("vec_id"), "embedding", "label")
        corpus = emb.unionByName(dup)
        for kw in ({"exact": True}, {"dim": 64, "n_planes": 6}):
            out = similarity.embedding_near_duplicates(
                corpus, threshold=0.999, **kw).collect()
            assert any(r["id_a"] == 3 and r["id_b"] == 888888 for r in out), kw

    def test_bucketed_near_dup_subset_of_exact(self, spark, emb):
        """The bucketed default prunes candidates but never invents pairs:
        its output must be a subset of the exact all-pairs result."""
        exact = similarity.embedding_near_duplicates(
            emb, threshold=0.3, exact=True)
        bucketed = similarity.embedding_near_duplicates(
            emb, threshold=0.3, dim=64, n_planes=6)
        assert bucketed.exceptAll(exact).count() == 0
        assert bucketed.count() > 0

    def test_bucketed_near_dup_requires_dim(self, spark, emb):
        import pytest as _pytest
        with _pytest.raises(ValueError):
            similarity.embedding_near_duplicates(emb, threshold=0.5)


class TestText:
    def test_quality_features(self, spark):
        df = spark.createDataFrame(
            [(1, "The cat, and the dog!")], "doc_id long, text string")
        r = text.text_quality(df).collect()[0]
        assert r["n_words"] == 5
        assert r["n_chars"] == 21
        assert r["punct_ratio"] == round(2 / 21, 6)
        assert r["stopword_ratio"] == round(3 / 5, 6)  # The, and, the

    def test_language_id(self, spark):
        df = spark.createDataFrame(
            [(1, "the cat and the dog of the house"),
             (2, "der Hund und die Katze ist ein Tier"),
             (3, "le chat et la maison est un animal"),
             (4, "xyzzy plugh")],
            "doc_id long, text string")
        out = {r["doc_id"]: r["pred_lang"]
               for r in text.language_id(df).collect()}
        assert out == {1: "en", 2: "de", 3: "fr", 4: "unknown"}

    def test_language_id_trigram_beats_stopword_voter(self, spark):
        # fixtures containing NONE of the 7 memorized stopwords per
        # language: the voter returns 'unknown'/'en', the trigram profile
        # scorer classifies correctly
        df = spark.createDataFrame(
            [(1, "Geschwindigkeitsbegrenzung beachten Fahrzeuge fahren "
                 "langsam durch verschneite Ortschaften"),
             (2, "Nous avons mange des croissants avec du fromage pendant "
                 "notre voyage pour chercher quelque chose"),
             (3, "Working overnight requires strong coffee because the "
                 "morning meetings demand attention"),
             (4, "Estamos buscando informacion sobre restaurantes con "
                 "buena comida para celebrar esta noche"),
             (5, "zzz qqq 123")],
            "doc_id long, text string")
        voter = {r["doc_id"]: r["pred_lang"]
                 for r in text.language_id(df).collect()}
        # the stopword voter fails on the de/fr/es fixtures
        assert voter[1] == "unknown" and voter[4] == "unknown"
        tri = {r["doc_id"]: r["pred_lang"]
               for r in text.language_id_trigram(df).collect()}
        assert tri == {1: "de", 2: "fr", 3: "en", 4: "es", 5: "unknown"}

    def test_language_id_trigram_deterministic_tiebreak(self, spark):
        # a doc with zero profile hits scores 0 -> unknown; ties broken by
        # (score desc, lang asc) so re-runs are stable
        df = spark.createDataFrame([(1, ""), (2, "kkk")],
                                   "doc_id long, text string")
        out = {r["doc_id"]: (r["pred_lang"], r["score"])
               for r in text.language_id_trigram(df).collect()}
        assert out[1] == ("unknown", 0) and out[2] == ("unknown", 0)

    def test_language_id_trigram_it_pt_nl(self, spark):
        """VERDICT r3 #8: profiles beyond en/de/fr/es."""
        df = spark.createDataFrame(
            [(1, "il governo della regione ha annunciato che le nuove "
                 "stazioni della metropolitana saranno aperte per tutti"),
             (2, "o governo anunciou que as novas estações do metro serão "
                 "abertas para toda a população da cidade depois"),
             (3, "de regering heeft aangekondigd dat het nieuwe station "
                 "van de metro voor een groot aantal mensen open gaat"),
             (4, "the government announced that the new underground "
                 "stations will be opened for the whole population")],
            "doc_id long, text string")
        out = {r["doc_id"]: r["pred_lang"]
               for r in text.language_id_trigram(df).collect()}
        assert out == {1: "it", 2: "pt", 3: "nl", 4: "en"}

    def test_language_id_margin_abstains(self, spark):
        """min_margin: ambiguous short text -> unknown; clear text keeps
        its label; the reported score stays the best language's."""
        df = spark.createDataFrame(
            [(1, "de la"),          # fr/es/pt share these trigrams
             (2, "the quick brown fox jumps over the lazy dog and then "
                 "the other animals in the morning light of the day")],
            "doc_id long, text string")
        plain = {r["doc_id"]: r for r in
                 text.language_id_trigram(df).collect()}
        margin = {r["doc_id"]: r for r in
                  text.language_id_trigram(df, min_margin=25).collect()}
        assert plain[1]["pred_lang"] != "unknown"   # coin-flip label
        assert margin[1]["pred_lang"] == "unknown"  # abstains
        assert margin[2]["pred_lang"] == "en"
        assert margin[2]["score"] == plain[2]["score"]

    def test_profile_entries_are_trigrams(self):
        for lang, tris in text.LANG_TRIGRAM_PROFILES.items():
            assert len(tris) == len(set(tris)), lang   # no dup entries
            assert all(len(t) == 3 for t in tris), lang

    def test_subword_token_count_per_word(self, spark):
        # "The cat, and the dog!" -> words pieces 1+1+1+1+1 = 5, punct 2
        df = spark.createDataFrame(
            [(1, "The cat, and the dog!"),
             (2, "internationalization")],  # 20 chars -> ceil(20/4) = 5
            "doc_id long, text string")
        out = {r["doc_id"]: r["est_bpe_tokens"]
               for r in text.text_quality(df).collect()}
        assert out[1] == 7
        assert out[2] == 5

    def test_fingerprint_whitespace_invariant(self, spark):
        df = spark.createDataFrame(
            [(1, "Hello   world"), (2, "hello world ")],
            "doc_id long, text string")
        fps = [r["fingerprint"] for r in text.fingerprint(df).collect()]
        assert fps[0] == fps[1]


class TestMultimodal:
    def test_binary_metadata(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(b"abc")), (2, bytearray(b"")), (3, bytearray(b"\x00\xff"))],
            "doc_id long, payload binary")
        out = {r["doc_id"]: r for r in extract_binary_metadata(df).collect()}
        assert out[1]["n_bytes"] == 3
        assert out[1]["first_byte"] == ord("a")
        assert out[1]["checksum"] == ord("a") + ord("b") + ord("c")
        assert out[2]["n_bytes"] == 0 and out[2]["checksum"] == 0
        assert out[3]["n_bytes"] == 2 and out[3]["checksum"] == 255
        assert out[1]["fake_width"] == 3 % 64 + 16

    def test_batch_shapes_on_real_docs(self, docs):
        payload = docs.select(
            "doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
        out = extract_binary_metadata(payload)
        joined = out.join(docs, "doc_id")
        mism = joined.filter(F.col("n_bytes") != F.col("n_chars")).count()
        assert mism == 0  # ascii corpus: bytes == chars

    def test_null_payload_propagates(self, spark):
        """ADVICE r3: a null payload is NOT an empty one — metadata and
        resize rows carry nulls, the frame sampler emits zero frames."""
        from solarpos_spark.operators.multimodal import (resize_payload,
                                                         sample_frames)

        rows = [(1, b"abcd" * 40), (2, None), (3, b"")]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        meta = {r["doc_id"]: r for r in extract_binary_metadata(df).collect()}
        assert meta[2]["n_bytes"] is None
        assert meta[2]["checksum"] is None and meta[2]["fake_width"] is None
        assert meta[3]["n_bytes"] == 0 and meta[3]["checksum"] == 0
        assert meta[1]["n_bytes"] == 160

        rz = {r["doc_id"]: r for r in resize_payload(df, factor=8).collect()}
        assert rz[2]["thumb"] is None and rz[2]["thumb_checksum"] is None
        assert rz[2]["n_bytes_in"] is None and rz[2]["n_bytes_out"] is None
        assert bytes(rz[3]["thumb"]) == b"" and rz[3]["thumb_checksum"] == 0
        assert bytes(rz[1]["thumb"]) == bytes(
            (b"abcd" * 40)[i] for i in range(0, 160, 8))

        fr = sample_frames(df, frame_bytes=32, stride=2).collect()
        assert {r["doc_id"] for r in fr} == {1}  # null AND empty: no frames


class TestNonAsciiOracleParity:
    """ADVICE r3: the multimodal oracles used char-based substr/ascii and
    were bit-equal only because the testdata happens to be pure ASCII.
    Locks the hex-nibble (byte-exact) and length() (char-exact) rewrites
    against a deliberately non-ASCII corpus."""

    ROWS = [(1, "héllo wörld ü " * 20), (2, "中文文本流水线 " * 30),
            (3, "plain ascii text only " * 25), (4, ""),
            (5, "mixed ascii + ünïcode çontent " * 15)]

    def _con(self):
        import duckdb
        import pandas as pd
        con = duckdb.connect()
        con.register("documents",
                     pd.DataFrame(self.ROWS, columns=["doc_id", "text"]))
        return con

    def _docs(self, spark):
        return spark.createDataFrame(self.ROWS, "doc_id long, text string")

    def test_multimodal_byte_oracles(self, spark):
        import __spark_entry__ as entry
        from solarpos_spark.operators.multimodal import (
            extract_binary_metadata, resize_payload, sample_frames)

        con = self._con()
        payload = self._docs(spark).select(
            "doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))

        got = sorted(tuple(r) for r in extract_binary_metadata(
            payload).collect())
        want = sorted(tuple(r) for r in con.execute(
            entry._MULTIMODAL_ORACLE).fetchall())
        assert got == want

        got = sorted(tuple(r) for r in sample_frames(
            payload, frame_bytes=32, stride=4).collect())
        want = sorted(tuple(r) for r in con.execute(
            entry._FRAME_SAMPLE_ORACLE).fetchall())
        assert got and got == want

        got = sorted(tuple(r) for r in resize_payload(payload, factor=8)
                     .select("doc_id", "n_bytes_in", "n_bytes_out",
                             "thumb_checksum").collect())
        want = sorted(tuple(r) for r in con.execute(
            entry._RESIZE_ORACLE).fetchall())
        assert got == want

    def test_poly31_char_oracles(self, spark):
        import __spark_entry__ as entry
        from solarpos_spark.operators import dedup

        con = self._con()
        got = sorted(tuple(r) for r in dedup.simhash(
            self._docs(spark), hash_fn="poly31").collect())
        want = sorted(tuple(r) for r in con.execute(
            entry._simhash_oracle()).fetchall())
        assert got == want

        sigs = dedup.minhash_signatures(self._docs(spark), num_hashes=32,
                                        n=3, hash_fn="poly31")
        got = sorted(tuple(r) for r in dedup.lsh_candidate_pairs(
            sigs, bands=8, rows_per_band=4, hash_fn="poly31").collect())
        want = sorted(tuple(r) for r in con.execute(
            entry._minhash_oracle()).fetchall())
        assert got == want


class TestSplitAssign:
    def test_fractions_and_repartition_stability(self, spark):
        from pyspark.sql import functions as F

        from solarpos_spark.operators.curate import split_assign

        base = spark.range(100_000).withColumnRenamed("id", "doc_id")
        d = split_assign(base)
        counts = {r["split"]: r["n"] for r in
                  d.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        total = sum(counts.values())
        assert total == 100_000
        assert 0.975 <= counts["train"] / total <= 0.985
        assert 0.005 <= counts["val"] / total <= 0.015
        assert 0.005 <= counts["test"] / total <= 0.015
        # content-independent + stable under repartitioning
        d2 = split_assign(base.repartition(7))
        assert d.select("doc_id", "split").exceptAll(
            d2.select("doc_id", "split")).count() == 0

    def test_int64_scale_ids_no_overflow_and_unskewed(self, spark):
        from pyspark.sql import functions as F

        from solarpos_spark.operators.curate import split_assign

        # ids past 2^33: the naive (id+seed)*K hash wraps int64 (throws
        # under ANSI, silently skews toward 'train' otherwise); the
        # halves-mod-2^32 construction must stay exact and balanced
        base = spark.range(50_000).select(
            (F.col("id") + F.lit(2**62)).alias("doc_id"))
        d = split_assign(base)
        counts = {r["split"]: r["n"] for r in
                  d.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
                  .collect()}
        total = sum(counts.values())
        assert total == 50_000
        assert 0.97 <= counts["train"] / total <= 0.99
        # small ids: bit-identical to the naive reference form
        small = split_assign(
            spark.range(1000).withColumnRenamed("id", "doc_id"))
        naive = spark.range(1000).select(
            F.col("id").alias("doc_id"),
            (((F.col("id") + 1) * F.lit(2654435761)) % F.lit(2**32)
             % F.lit(10000)).alias("b"))
        j = small.join(naive, "doc_id")
        mism = j.filter(
            ((F.col("b") < 9800) & (F.col("split") != "train"))
            | ((F.col("b") >= 9800) & (F.col("b") < 9900)
               & (F.col("split") != "val"))
            | ((F.col("b") >= 9900) & (F.col("split") != "test"))).count()
        assert mism == 0


class TestSimhashNearDup:
    def test_planted_near_dups_found(self, spark):
        # doc 2 = doc 1 with one word changed; doc 3 unrelated
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
        rows = [(1, base), (2, base.replace("delta", "omega")),
                (3, "completely different words about other topics entirely "
                    "with no shared vocabulary at all whatsoever here")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        fps = dedup.simhash(df, hash_fn="poly31")
        pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
                 for r in dedup.simhash_near_dup_pairs(
                     fps, max_hamming=10, n_bits=62).collect()}
        assert (1, 2) in pairs
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def test_hamming_exact_vs_bruteforce(self, docs, spark):
        fps = dedup.simhash(docs.filter(F.col("doc_id") < 40),
                            hash_fn="poly31")
        got = {(r["doc_a"], r["doc_b"]): r["hamming"]
               for r in dedup.simhash_near_dup_pairs(
                   fps, max_hamming=6, n_bits=62).collect()}
        rows = {r["doc_id"]: r["simhash"] for r in fps.collect()}
        ids = sorted(rows)
        want = {}
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                h = bin(rows[a] ^ rows[b]).count("1")
                if h <= 6:
                    want[(a, b)] = h
        assert got == want  # banding loses nothing within the radius

    def test_max_piece_df_skips_hot_bucket_only(self, spark):
        """VERDICT r3 #7: short docs share the all-zero piece — one hot
        bucket. The cap must drop candidates that agree ONLY on capped
        pieces while keeping pairs that still share an uncapped piece."""
        # 30 one-word docs: near-zero fingerprints -> every piece bucket
        # they share is hot. Two long near-dup docs pair via many pieces.
        base = ("lorem ipsum dolor sit amet consectetur adipiscing elit "
                "sed do eiusmod tempor incididunt ut labore et dolore ") * 3
        rows = [(i, "tiny") for i in range(30)]
        rows += [(100, base), (101, base.replace("dolor", "tenor"))]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        fps = dedup.simhash(df, hash_fn="poly31")
        uncapped = {(r["doc_a"], r["doc_b"]) for r in
                    dedup.simhash_near_dup_pairs(
                        fps, max_hamming=8, n_bits=62).collect()}
        capped = {(r["doc_a"], r["doc_b"]) for r in
                  dedup.simhash_near_dup_pairs(
                      fps, max_hamming=8, n_bits=62,
                      max_piece_df=10).collect()}
        tiny_pairs = {p for p in uncapped if p[0] < 30 and p[1] < 30}
        assert len(tiny_pairs) == 30 * 29 // 2   # identical docs all pair
        assert not any(p[0] < 30 for p in capped)  # hot bucket excluded
        assert (100, 101) in capped              # uncapped pieces survive


class TestConnectedComponents:
    def test_chain_and_islands(self, spark):
        # chain 1-2-3-4-5 (diameter 4: needs pointer jumping or >1 round),
        # island pair 10-11, singleton 20 absent from pairs
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)],
            "doc_a long, doc_b long")
        cc = {r["node"]: r["component"]
              for r in dedup.connected_components(pairs).collect()}
        assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}

    def test_long_chain_converges_logarithmically(self, spark):
        # 64-node chain: min-label alone needs 63 rounds; pointer jumping
        # must land well under the max_iter=12 budget we give it
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(64)], "doc_a long, doc_b long")
        cc = dedup.connected_components(pairs, max_iter=12)
        comps = {r["component"] for r in cc.collect()}
        assert comps == {0}

    def test_clusters_include_singletons(self, spark):
        docs_df = spark.createDataFrame(
            [(i, f"text {i}") for i in range(6)], "doc_id long, text string")
        pairs = spark.createDataFrame([(1, 4)], "doc_a long, doc_b long")
        cl = {r["doc_id"]: r["cluster_id"]
              for r in dedup.dedup_clusters(docs_df, pairs).collect()}
        assert cl == {0: 0, 1: 1, 2: 2, 3: 3, 4: 1, 5: 5}

    def test_canonical_longest_then_id(self, spark):
        docs_df = spark.createDataFrame(
            [(1, "short"), (2, "the longest text here"), (3, "mid text"),
             (4, "equal-len"), (5, "equal-len")],
            "doc_id long, text string")
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long")
        clusters = dedup.dedup_clusters(docs_df, pairs)
        out = {r["cluster_id"]: (r["keep_doc_id"], r["n_docs"])
               for r in dedup.canonical_docs(docs_df, clusters).collect()}
        assert out[1] == (2, 3)   # longest text wins
        assert out[4] == (4, 2)   # equal length -> lowest doc_id


class TestStratifiedSample:
    def test_rates_and_determinism(self, spark):
        from solarpos_spark.operators.curate import stratified_sample

        df = spark.range(20_000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"))
        kept = stratified_sample(df, {"en": 2500, "de": 10000})
        counts = {r["lang"]: r["n"] for r in
                  kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
                  .collect()}
        assert counts["de"] == 10_000          # rate 10000/10000 keeps all
        assert 0.22 <= counts["en"] / 10_000 <= 0.28
        # stable under repartitioning (content/partitioning independence)
        again = stratified_sample(df.repartition(13), {"en": 2500, "de": 10000})
        assert again.select("doc_id").exceptAll(kept.select("doc_id")).count() == 0
        # stratum absent from rates -> default_rate=0 drops it
        extra = df.withColumn("lang", F.lit("xx"))
        assert stratified_sample(extra, {"en": 2500}).count() == 0

    def test_curate_cluster_mode_keeps_canonical(self, spark):
        from solarpos_spark.operators.curate import curate

        filler = ("the quick brown fox jumps over the lazy dog and then "
                  "runs far away into the green hills of the north " * 3)
        # 1 and 2 near-dup chain; 2 is longest -> cluster mode keeps 2,
        # greedy mode keeps 1 (drops the greater id of the pair)
        rows = [(1, filler), (2, filler + "with a small extra tail of words"),
                (3, "an unrelated document " + filler.replace("fox", "owl")
                    .replace("dog", "cat").replace("green", "blue"))]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        greedy = {r["doc_id"] for r in curate(df).collect()}
        cluster = {r["doc_id"] for r in
                   curate(df, near_dup="cluster").collect()}
        assert 1 in greedy and 2 not in greedy
        assert 2 in cluster and 1 not in cluster


class TestBM25:
    def test_ranking_and_candidates(self, spark):
        from solarpos_spark.operators.search import bm25_topk

        rows = [
            (1, "shuffle shuffle shuffle join broadcast pad pad pad"),
            (2, "shuffle join pad pad pad pad pad pad pad pad pad pad"),
            (3, "completely unrelated text with no query words at all"),
            (4, "join pad pad pad pad pad pad pad"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = bm25_topk(df, ["shuffle", "broadcast", "join"], k=10).collect()
        ids = [r["doc_id"] for r in out]
        assert 3 not in ids                 # no query term -> not a candidate
        assert ids[0] == 1                  # most matches, shortest-ish
        assert out[0]["rank"] == 1
        scores = [r["score"] for r in out]
        assert scores == sorted(scores, reverse=True)

    def test_idf_downweights_common_terms(self, spark):
        from solarpos_spark.operators.search import bm25_topk

        # 'pad' occurs in every doc -> ~zero idf; a doc matching only 'pad'
        # must rank below a doc matching the rare term
        rows = [(i, "pad filler words here") for i in range(1, 9)]
        rows += [(9, "rare pad filler words"), (10, "pad pad pad pad")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = bm25_topk(df, ["rare", "pad"], k=3).collect()
        assert out[0]["doc_id"] == 9


class TestHybridRRF:
    def test_fusion_prefers_docs_in_both_runs(self, spark):
        """RRF = 1/(60+lex_rank) + 1/(60+dense_rank): a doc ranked #2 in
        BOTH runs (2/62 ~ .0323) must outrank a doc that is #1 in one
        run only (1/61 ~ .0164); single-run docs carry a null rank for
        the other run. Hand-computed fixture: doc 1 = dense #1 only,
        doc 2 = lex #1 + dense #2, doc 3 = lex #2 only."""
        import numpy as np

        from solarpos_spark.operators.search import hybrid_topk_rrf

        docs = spark.createDataFrame(
            [(1, "nothing relevant here at all"),
             (2, "shuffle shuffle shuffle join pad"),
             (3, "shuffle pad pad pad pad pad pad")],
            "doc_id long, text string")
        rng = np.random.RandomState(3)
        base = rng.randn(4, 8).astype("float64")
        base[1] = base[0]                 # doc 1 == the query: dense #1
        base[2] = base[0] * 0.9 + 0.01    # doc 2: dense #2
        base[3] = -base[0]                # doc 3: dense last
        emb = spark.createDataFrame(
            [(i, [float(x) for x in base[i]]) for i in (1, 2, 3)],
            "vec_id long, embedding array<float>")
        qvec = spark.createDataFrame(
            [([float(x) for x in base[0]],)], "embedding array<float>")
        out = {r.doc_id: r for r in hybrid_topk_rrf(
            docs, emb, ["shuffle", "join"], qvec, k=10, depth=2).collect()}
        assert out[2].rank == 1           # in both runs
        assert out[2].lex_rank == 1 and out[2].dense_rank == 2
        assert out[1].dense_rank == 1 and out[1].lex_rank is None
        assert out[3].lex_rank == 2 and out[3].dense_rank is None
        assert abs(out[2].rrf - (1 / 61 + 1 / 62)) < 1e-8
        assert abs(out[1].rrf - 1 / 61) < 1e-8
        # rank-based: fusion order is 2 (both) > 1/3 (one run each)
        assert out[1].rank < out[3].rank  # same rrf tie -> lower doc_id


class TestIVF:
    def test_ivf_finds_planted_neighbor(self, spark):
        import numpy as np

        rng = np.random.default_rng(11)
        base = rng.standard_normal((40, 16)).astype("float32")
        base[25] = base[30] * 0.97 + 0.01  # plant: 30's near-identical twin
        rows = [(i, [float(x) for x in base[i]]) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        q = df.filter(F.col("vec_id") == 30)
        out = similarity.ivf_topk(df, q, k=1, n_centroids=8, nprobe=8)
        r = out.collect()
        assert len(r) == 1 and r[0]["neighbor_id"] == 25
        # nprobe = n_centroids probes every list -> must equal brute force
        bf = similarity.brute_force_topk(df, q, k=1).collect()
        assert r[0]["neighbor_id"] == bf[0]["neighbor_id"]
        assert r[0]["score"] == bf[0]["score"]

    def test_ivf_prunes_lists(self, emb, spark):
        # with nprobe=1 every candidate's list must be the query's top list
        out = similarity.ivf_topk(emb, emb.filter(F.col("vec_id") < 4),
                                  k=50, n_centroids=8, nprobe=1)
        cents = similarity.ivf_centroids(emb, n_centroids=8)
        scores = similarity._centroid_scores(F.col("embedding"), cents)
        assigned = emb.select(
            F.col("vec_id"),
            F.array_position(scores, F.array_max(scores)).alias("list_id"))
        joined = (out.join(assigned.withColumnRenamed("vec_id", "neighbor_id"),
                           "neighbor_id")
                  .join(assigned.withColumnRenamed("vec_id", "query_id")
                        .withColumnRenamed("list_id", "qlist"), "query_id"))
        # neighbor lists may differ from the query's own list only if the
        # query's nearest centroid differs from its assignment tie-break --
        # but with nprobe=1 all candidates share ONE list per query
        per_q = joined.groupBy("query_id").agg(
            F.countDistinct("list_id").alias("nl"))
        assert all(r["nl"] == 1 for r in per_q.collect())


class TestRepetitionStats:
    def test_planted_repetition(self, spark):
        rows = [
            (1, "spam spam spam spam spam spam spam spam"),
            (2, "all words here are fully distinct tokens friend"),
            (3, "one"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in text.repetition_stats(df).collect()}
        assert out[1]["dup_word_frac"] == round(1 - 1 / 8, 6)
        assert out[1]["top_word_frac"] == 1.0
        assert out[1]["top_bigram_frac"] == 1.0
        assert out[2]["dup_word_frac"] == 0.0
        assert out[2]["top_word_frac"] == 0.125
        assert out[3]["top_bigram_frac"] == 0.0   # no bigrams in 1-word doc


class TestSequencePack:
    def test_layout_invariants(self, spark):
        from solarpos_spark.operators.curate import sequence_pack

        rows = [(i, "s0" if i < 6 else "s1",
                 "word " * (30 + i)) for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = sequence_pack(df, capacity=64).orderBy("shard", "doc_id").collect()
        by_shard = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r)
        for shard, docs in by_shard.items():
            # offsets are the exclusive running sum, starting at 0
            run = 0
            for r in docs:
                assert r["offset"] == run
                assert r["pack_id"] == run // 64
                assert r["pack_pos"] == run % 64
                assert r["spans_boundary"] == (
                    run // 64 != (run + r["n_tokens"] - 1) // 64)
                run += r["n_tokens"]

    def test_multi_shard_split_self_contained(self, spark):
        """Packing per (split, source) after split_assign: every split's
        layout must reconstruct from that split's docs alone (ADVICE r3 —
        a pre-split layout leaves holes in every pack)."""
        from solarpos_spark.operators.curate import (sequence_pack,
                                                     split_assign)

        rows = [(i, "s0" if i % 2 == 0 else "s1",
                 "word " * (20 + i)) for i in range(400)]
        df = split_assign(spark.createDataFrame(
            rows, "doc_id long, source string, text string"))
        out = sequence_pack(df, capacity=64,
                            shard_col=("split", "source")).collect()
        assert {r["split"] for r in out} >= {"train"}
        by_unit = {}
        for r in sorted(out, key=lambda r: r["doc_id"]):
            by_unit.setdefault((r["split"], r["source"]), []).append(r)
        assert len(by_unit) > 2
        for docs in by_unit.values():
            run = 0
            for r in docs:  # offsets contiguous WITHIN the (split, source)
                assert r["offset"] == run
                assert r["pack_id"] == run // 64
                run += r["n_tokens"]


class TestContaminationScreen:
    def test_probe_hits(self, spark):
        rows = [(1, "uses a Hash Join and a bloom filter"),
                (2, "clean text with nothing of interest"),
                (3, "BROADCAST JOIN everywhere")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in text.contamination_screen(
            df, ("hash join", "broadcast join", "bloom filter")).collect()}
        assert set(out) == {1, 3}
        assert out[1]["n_hits"] == 2
        assert out[1]["matched"] == "bloom filter,hash join"
        assert out[3]["matched"] == "broadcast join"


class TestIVFArrow:
    def test_arrow_assignment_bit_parity(self, emb, spark):
        q = emb.filter(F.col("vec_id") < 6)
        a = similarity.ivf_topk(emb, q, k=4, n_centroids=8, nprobe=3) \
            .orderBy("query_id", "rank").collect()
        b = similarity.ivf_topk(emb, q, k=4, n_centroids=8, nprobe=3,
                                assign="arrow") \
            .orderBy("query_id", "rank").collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]


class TestIVFTraining:
    def test_trained_codebook_deterministic_and_assign_parity(self, emb):
        """Same codebook bit-for-bit on repeat runs AND between the
        expression and Arrow assignment paths (the fixed-point Lloyd sums
        are order-independent integers; the mean is one IEEE division)."""
        a = similarity.ivf_train_centroids(emb, n_centroids=8, n_iter=2,
                                           seed=11)
        b = similarity.ivf_train_centroids(emb, n_centroids=8, n_iter=2,
                                           seed=11)
        c = similarity.ivf_train_centroids(emb, n_centroids=8, n_iter=2,
                                           seed=11, assign="arrow")
        assert a == b == c

    def test_recall_improves_over_lowest_id_codebook(self, emb):
        """k-means training must beat the lowest-id seed codebook on
        recall@5 for queries OUTSIDE both codebooks (in-codebook queries
        probe their own list and inflate the baseline — the round-3
        honesty caveat this trainer replaces). Deterministic data +
        deterministic training -> exact comparison, not a flaky bound."""
        q = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 140))

        def pairs(df):
            return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

        exact = pairs(similarity.brute_force_topk(emb, q, k=5))
        base = pairs(similarity.ivf_topk(emb, q, k=5, n_centroids=16,
                                         nprobe=4))
        cents = similarity.ivf_train_centroids(emb, n_centroids=16,
                                               n_iter=3, seed=11)
        trained = pairs(similarity.ivf_topk(emb, q, k=5, n_centroids=16,
                                            nprobe=4, centroids=cents))
        r_base = len(base & exact) / len(exact)
        r_trained = len(trained & exact) / len(exact)
        assert r_trained > r_base
        # measured 0.57 vs 0.47 on the template corpus — pin loosely so a
        # genuine regression trips but data regeneration doesn't
        assert r_trained >= 0.5


class TestMinhashVerified:
    def test_verified_subset_of_exact(self, docs, spark):
        """Verified pairs = exact-jaccard pairs restricted to LSH
        candidates: every verified pair must appear in the exhaustive
        jaccard output with the SAME similarity, and high-sim pairs that
        band together must survive."""
        sub = docs.filter(F.col("doc_id") < 120)
        exact = {(r["doc_a"], r["doc_b"]): r["jaccard"]
                 for r in dedup.ngram_jaccard_pairs(
                     sub, threshold=0.5).collect()}
        ver = {(r["doc_a"], r["doc_b"]): r["jaccard"]
               for r in dedup.minhash_verified_pairs(sub).collect()}
        assert set(ver) <= set(exact)
        for k, v in ver.items():
            assert exact[k] == v
        # near-identical pairs (jaccard >= 0.9) band together w.h.p.
        high = {k for k, v in exact.items() if v >= 0.9}
        assert high <= set(ver)

    def test_candidate_restriction_below_aggregate(self, docs, spark):
        """The verify stage must contain NO unrestricted co-shingle
        self-join (shingle equality + doc_id inequality on one Join): the
        round-3 plan applied the LSH candidate filter ABOVE the
        intersection aggregate — Catalyst never pushes a join below an
        aggregate, so the full co-shingle shuffle ran anyway. Lock the
        fixed shape: every shingle-keyed join is an equi-join against the
        candidate-restricted relation."""
        import re

        plan = (dedup.minhash_verified_pairs(docs.filter(F.col("doc_id") < 80))
                ._jdf.queryExecution().optimizedPlan().toString())
        for line in plan.splitlines():
            if re.search(r"shingle#\d+ = shingle#\d+", line):
                assert not re.search(r"doc_id#\d+ < doc_id#\d+", line), line


class TestFrameSample:
    def test_frame_spans_and_short_payloads(self, spark):
        from solarpos_spark.operators.multimodal import sample_frames

        rows = [(1, b"A" * 100), (2, b"b" * 31), (3, b"xy" * 80)]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {(r["doc_id"], r["frame_idx"]): r
               for r in sample_frames(df, frame_bytes=32, stride=2).collect()}
        # doc 1: 3 frames -> sampled 0, 2
        assert (1, 0) in out and (1, 2) in out and (1, 1) not in out
        assert out[(1, 0)]["frame_checksum"] == 65 * 32
        assert out[(1, 2)]["frame_off"] == 64
        # doc 2: shorter than one frame -> absent entirely
        assert not any(d == 2 for d, _ in out)
        # doc 3: alternating bytes, frame 0 = 16*'x' + 16*'y' interleaved
        assert out[(3, 0)]["frame_checksum"] == 16 * (120 + 121)

    def test_sliced_batch_offsets(self, spark):
        # a filter upstream produces sliced Arrow arrays with nonzero
        # offset — spans must still come from the right rows
        from solarpos_spark.operators.multimodal import sample_frames

        rows = [(i, bytes([i % 251]) * 64) for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, payload binary") \
            .filter(F.col("doc_id") >= 25)
        out = sample_frames(df, frame_bytes=32, stride=1).collect()
        assert len(out) == 25 * 2
        for r in out:
            assert r["frame_checksum"] == (r["doc_id"] % 251) * 32


class TestResizePayload:
    def test_thumb_bytes_exact(self, spark):
        from solarpos_spark.operators.multimodal import resize_payload

        rows = [(1, bytes(range(100))), (2, b"abc"), (3, b"")]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["doc_id"]: r for r in resize_payload(df, factor=8).collect()}
        assert bytes(out[1]["thumb"]) == bytes(range(0, 100, 8))
        assert out[1]["n_bytes_out"] == 13
        assert out[1]["thumb_checksum"] == sum(range(0, 100, 8))
        assert bytes(out[2]["thumb"]) == b"a"
        assert out[3]["n_bytes_out"] == 0 and bytes(out[3]["thumb"]) == b""

    def test_sliced_input(self, spark):
        from solarpos_spark.operators.multimodal import resize_payload

        rows = [(i, bytes([i % 256]) * (i % 40 + 1)) for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id long, payload binary") \
            .filter(F.col("doc_id") >= 30)
        for r in resize_payload(df, factor=4).collect():
            n = r["doc_id"] % 40 + 1
            want = bytes([r["doc_id"] % 256]) * ((n + 3) // 4)
            assert bytes(r["thumb"]) == want


class TestTfidfPairs:
    def test_identical_docs_cosine_one(self, spark):
        rows = [(1, "alpha beta gamma delta shared words"),
                (2, "alpha beta gamma delta shared words"),
                (3, "totally different content here now")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {(r["doc_a"], r["doc_b"]): r["cosine"]
               for r in text.tfidf_cosine_pairs(df, threshold=0.0).collect()}
        assert out[(1, 2)] == 1.0
        assert (1, 3) not in out and (2, 3) not in out  # no shared terms

    def test_idf_downweights_shared_stopword(self, spark):
        # every doc shares 'the'; docs sharing only 'the' should score far
        # below docs sharing a rare content word
        rows = [(1, "the zebra"), (2, "the zebra"), (3, "the ocean"),
                (4, "the ocean"), (5, "the plain")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {(r["doc_a"], r["doc_b"]): r["cosine"]
               for r in text.tfidf_cosine_pairs(df, threshold=0.0).collect()}
        assert out[(1, 2)] > 0.99
        assert out[(1, 5)] < 0.2  # only 'the' in common


class TestAnsiMode:
    def test_hash_ops_survive_ansi(self, spark):
        """spark.sql.ansi.enabled turns silent overflow into errors: the
        overflow-safe constructions (hash_bucket splitter/sampler, poly31
        hashes) must run clean on full-range int64 ids under ANSI."""
        from solarpos_spark.operators.curate import (split_assign,
                                                     stratified_sample)

        prev = spark.conf.get("spark.sql.ansi.enabled", "false")
        spark.conf.set("spark.sql.ansi.enabled", "true")
        try:
            big = spark.range(1000).select(
                (F.col("id") * 7 + 2**62).alias("doc_id"),
                F.when(F.col("id") % 2 == 0, "en").otherwise("de")
                 .alias("lang"),
                F.lit("w x y z").alias("text"))
            assert split_assign(big).groupBy("split").count().count() >= 1
            assert stratified_sample(big, {"en": 5000, "de": 10000}).count() > 0
            fps = dedup.simhash(big, hash_fn="poly31")
            assert fps.count() == 1000
        finally:
            spark.conf.set("spark.sql.ansi.enabled", prev)


class TestLineDedup:
    def test_boilerplate_removed_order_preserved(self, spark):
        from solarpos_spark.operators.dedup import line_dedup

        banner = "subscribe to our newsletter today"
        rows = [(i, f"unique opening line {i}\n{banner}\n"
                    f"real content body number {i}\nshort\n{banner}")
                for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               line_dedup(df, max_line_count=2, min_line_chars=8).collect()}
        for i in range(5):
            # banner occurs 10x corpus-wide -> removed everywhere, twice
            assert out[i]["text"] == (f"unique opening line {i}\n"
                                      f"real content body number {i}\nshort")
            assert out[i]["n_lines_in"] == 5
            assert out[i]["n_lines_removed"] == 2

    def test_short_lines_never_removed(self, spark):
        from solarpos_spark.operators.dedup import line_dedup

        rows = [(i, "ok\n\nok") for i in range(10)]  # all < 8 chars
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = line_dedup(df, max_line_count=2, min_line_chars=8).collect()
        assert all(r["text"] == "ok\n\nok" and r["n_lines_removed"] == 0
                   for r in out)

    def test_rebuild_is_exact_roundtrip(self, spark):
        """With no hot lines, split -> rebuild must be the identity for
        ANY text: empty docs, leading/trailing/repeated separators,
        whitespace-only lines, unicode — the adversarial shapes that
        break naive string_agg reconstructions."""
        from solarpos_spark.operators.dedup import line_dedup

        texts = ["", "\n", "a\nb", "\n\nx\n", "word  spaces \n\ttab\t",
                 "   ", "a\n\n\nb", "ünï\n中文\n", "x" * 500,
                 "trailing\n", "\nleading", "mid\n \nblank"]
        rows = [(i, t) for i, t in enumerate(texts)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               line_dedup(df, max_line_count=10**9).collect()}
        for i, t in enumerate(texts):
            assert out[i]["text"] == t, (i, repr(t), repr(out[i]["text"]))
            assert out[i]["n_lines_removed"] == 0

    def test_all_lines_removed_yields_empty(self, spark):
        from solarpos_spark.operators.dedup import line_dedup

        rows = [(i, "the same boilerplate line") for i in range(4)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = line_dedup(df, max_line_count=2, min_line_chars=8).collect()
        assert all(r["text"] == "" and r["n_lines_removed"] == 1
                   for r in out)


class TestPiiScrub:
    def test_patterns_redacted_and_counted(self, spark):
        from solarpos_spark.operators.text import pii_scrub

        rows = [(1, "mail a.b-c%d@sub.example.org or x@y.io thanks"),
                (2, "server 192.168.0.1 and 10.0.300.7 up"),
                (3, "call +4915112345678 not 12345"),
                (4, "clean text, no pii at all")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
        assert out[1]["n_email"] == 2
        assert out[1]["text"] == "mail <email> or <email> thanks"
        assert out[2]["n_ipv4"] == 2  # conservative: 10.0.300.7 matches too
        assert out[2]["text"] == "server <ipv4> and <ipv4> up"
        assert out[3]["n_phone"] == 1
        assert out[3]["text"] == "call <phone> not 12345"
        assert out[4]["text"] == rows[3][1]
        assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) \
            == (0, 0, 0)

    def test_email_scrubbed_before_ip(self, spark):
        from solarpos_spark.operators.text import pii_scrub

        # the host part contains an ipv4; the email rule consumes it first,
        # so the ip counter (which runs on the scrubbed text) sees nothing
        df = spark.createDataFrame([(1, "x ab@1.2.3.4.io z")],
                                   "doc_id long, text string")
        r = pii_scrub(df).collect()[0]
        assert r["n_email"] == 1 and r["n_ipv4"] == 0
        assert r["text"] == "x <email> z"


class TestDupSpans:
    def _spans(self, df, **kw):
        from solarpos_spark.operators.dedup import dup_span_windows

        return {(r["doc_id"], r["span_start"]): r
                for r in dup_span_windows(df, **kw).collect()}

    def test_cross_doc_shared_chunk(self, spark):
        shared = " ".join(f"d{i}" for i in range(8))
        rows = [(0, f"u1 u2 u3 {shared} u4"),
                (1, f"v1 v2 {shared} v3 v4"),
                (2, "all unique words here nothing repeats at all ever")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = self._spans(df, k=8, min_count=2)
        assert set(out) == {(0, 3), (1, 2)}
        a = out[(0, 3)]
        assert (a["span_end"], a["n_words_dup"], a["n_windows"]) == (10, 8, 1)
        b = out[(1, 2)]
        assert (b["span_end"], b["n_words_dup"], b["n_windows"]) == (9, 8, 1)

    def test_within_doc_repeat_merges_to_one_span(self, spark):
        # the 8-word phrase repeats back-to-back: dup windows at pos 0 and
        # pos 8 touch (gap == k) and merge into one 16-word span
        phrase = " ".join(f"x{i}" for i in range(8))
        df = spark.createDataFrame([(7, f"{phrase} {phrase}")],
                                   "doc_id long, text string")
        out = self._spans(df, k=8, min_count=2)
        assert set(out) == {(7, 0)}
        r = out[(7, 0)]
        assert (r["span_end"], r["n_words_dup"], r["n_windows"]) == (15, 16, 2)

    def test_distant_repeats_stay_separate_spans(self, spark):
        phrase = " ".join(f"w{i}" for i in range(8))
        gap = " ".join(f"g{i}" for i in range(9))
        df = spark.createDataFrame([(3, f"{phrase} {gap} {phrase}")],
                                   "doc_id long, text string")
        out = self._spans(df, k=8, min_count=2)
        # dup windows at pos 0 and 17; 17 - 0 > 8 -> two islands
        assert set(out) == {(3, 0), (3, 17)}
        assert out[(3, 0)]["span_end"] == 7
        assert out[(3, 17)]["span_end"] == 24

    def test_short_docs_have_no_windows(self, spark):
        df = spark.createDataFrame(
            [(i, "only seven words live in this doc") for i in range(5)],
            "doc_id long, text string")
        assert self._spans(df, k=8, min_count=2) == {}

    def test_xxhash_key_matches_text_key(self, spark, docs):
        from solarpos_spark.operators.dedup import dup_span_windows

        a = sorted(map(tuple, dup_span_windows(
            docs, k=8, key_fn="text").collect()))
        b = sorted(map(tuple, dup_span_windows(
            docs, k=8, key_fn="xxhash64").collect()))
        assert a == b and len(a) > 0


class TestQualityClassifier:
    def test_bag_semantics_and_label_sign(self, spark):
        from solarpos_spark.operators.text import quality_classifier

        df = spark.createDataFrame(
            [(1, "alpha"), (2, "alpha alpha"), (3, "alpha alpha alpha")],
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in quality_classifier(df).collect()}
        w = out[1]["score"]
        assert out[2]["score"] == 2 * w and out[3]["score"] == 3 * w
        for r in out.values():
            assert 0.0 <= r["prob"] <= 1.0
            assert r["label"] == ("keep" if r["score"] >= 0 else "drop")

    def test_custom_weight_table_swaps_in(self, spark):
        from solarpos_spark.operators.dedup import POLY_P
        from solarpos_spark.operators.text import quality_classifier

        # the default table reproduced explicitly must give identical output
        explicit = spark.range(4096).select(
            F.col("id").alias("bucket"),
            (((F.col("id") * F.lit(2654435761) + F.lit(97)) % F.lit(POLY_P))
             % F.lit(2001) - F.lit(1000)).alias("wt"))
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        a = sorted(map(tuple, quality_classifier(docs).collect()))
        b = sorted(map(tuple,
                       quality_classifier(docs, weights=explicit).collect()))
        assert a == b and len(a) > 0

    def test_sparse_weight_table_scores_missing_as_zero(self, spark):
        """ADVICE r4: a trained table rarely covers every bucket —
        uncovered words must contribute 0 (and still count in n_words);
        a doc whose words ALL miss must survive with score 0/keep."""
        from solarpos_spark.operators.text import quality_classifier

        df = spark.createDataFrame(
            [(1, "alpha beta"), (2, "beta beta")],
            "doc_id long, text string")
        # a table holding ONLY alpha's bucket: beta scores 0 everywhere
        from solarpos_spark.operators.dedup import poly31_hash
        wt = df.sparkSession.createDataFrame(
            [("alpha",)], "word string").select(
            (poly31_hash(F.col("word")) % 4096).alias("bucket"),
            F.lit(7).alias("wt"))
        out = {r["doc_id"]: r
               for r in quality_classifier(df, weights=wt).collect()}
        assert out[1]["n_words"] == 2 and out[1]["score"] == 7
        assert out[2]["n_words"] == 2 and out[2]["score"] == 0
        assert out[2]["label"] == "keep"

    @staticmethod
    def _auc(pairs):
        """Mann-Whitney AUC with average ranks for ties."""
        pairs = sorted(pairs)  # (score, y)
        ranks, i = {}, 0
        while i < len(pairs):
            j = i
            while j < len(pairs) and pairs[j][0] == pairs[i][0]:
                j += 1
            r = (i + j + 1) / 2  # average 1-based rank of the tie block
            for k in range(i, j):
                ranks[k] = r
            i = j
        pos = [k for k, (_, y) in enumerate(pairs) if y > 0]
        n_pos, n_neg = len(pos), len(pairs) - len(pos)
        rank_sum = sum(ranks[k] for k in pos)
        return (rank_sum - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)

    def test_trained_beats_fixed_weights(self, spark):
        """The perceptron fit must separate the deterministic label far
        better than the fixed hash-derived weights — AUC on the template
        corpus (the VERDICT r4 'done' condition)."""
        from solarpos_spark.operators.text import (quality_classifier,
                                                   quality_classifier_trained)

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        label = F.array_contains(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"), "spark")
        trained = quality_classifier_trained(docs, label, rounds=60)
        t_rows = trained.collect()
        auc_t = self._auc([(r["score"], r["y"]) for r in t_rows])
        y_by_doc = {r["doc_id"]: r["y"] for r in t_rows}
        f_rows = quality_classifier(docs).collect()
        auc_f = self._auc([(r["score"], y_by_doc[r["doc_id"]])
                           for r in f_rows])
        assert auc_t > 0.97
        assert auc_t > auc_f + 0.2
        # and the thresholded predictions are decent outright
        acc = sum(r["pred"] == r["y"] for r in t_rows) / len(t_rows)
        assert acc > 0.9

    def test_training_deterministic_under_repartition(self, spark):
        from solarpos_spark.operators.text import quality_classifier_trained

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        label = F.array_contains(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"), "spark")
        a = sorted(map(tuple, quality_classifier_trained(
            docs, label, rounds=4).collect()))
        b = sorted(map(tuple, quality_classifier_trained(
            docs.repartition(17), label, rounds=4).collect()))
        assert a == b and len(a) > 0

    def test_prob_is_softsign_of_mean_weight(self, spark):
        from solarpos_spark.operators.text import quality_classifier

        df = spark.createDataFrame([(9, "some words for the squash check")],
                                   "doc_id long, text string")
        r = quality_classifier(df).collect()[0]
        t = r["score"] / (r["n_words"] * 1000.0)
        assert r["prob"] == round(0.5 + t / (2.0 * (1.0 + abs(t))), 6)


class TestSemDeDup:
    CENTS = [(0, [1.0, 0.0, 0.0, 0.0], 1.0), (1, [0.0, 1.0, 0.0, 0.0], 1.0)]

    def _run(self, spark, rows, eps):
        from solarpos_spark.operators.similarity import semdedup

        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<double>")
        return {r["vec_id"]: r
                for r in semdedup(df, eps=eps, centroids=self.CENTS).collect()}

    def test_keep_lowest_id_within_cluster(self, spark):
        rows = [(1, [1.0, 0.01, 0.0, 0.0]),
                (2, [0.99, 0.012, 0.0, 0.0]),
                (5, [0.98, 0.0, 0.01, 0.0]),
                (7, [0.0, 1.0, 0.0, 0.0]),
                (9, [0.01, 0.99, 0.0, 0.0])]
        out = self._run(spark, rows, 0.95)
        assert out[1]["kept"] and out[7]["kept"]
        assert not out[2]["kept"] and not out[5]["kept"] and not out[9]["kept"]
        assert out[1]["list_id"] == out[2]["list_id"] == out[5]["list_id"]
        assert out[7]["list_id"] == out[9]["list_id"] != out[1]["list_id"]

    def test_cross_cluster_near_dups_survive(self, spark):
        # cosine ~1.0 but straddling the cluster boundary: SemDeDup only
        # compares within a cluster, so both are kept (the documented
        # recall trade the paper accepts)
        rows = [(3, [0.708, 0.707, 0.0, 0.0]),
                (4, [0.707, 0.708, 0.0, 0.0])]
        out = self._run(spark, rows, 0.95)
        assert out[3]["kept"] and out[4]["kept"]
        assert out[3]["list_id"] != out[4]["list_id"]

    def test_arrow_matches_expr(self, spark, emb):
        from solarpos_spark.operators.similarity import (ivf_train_centroids,
                                                         semdedup)

        cents = ivf_train_centroids(emb, n_centroids=8, n_iter=2, seed=11)
        a = sorted(map(tuple,
                       semdedup(emb, eps=0.3, centroids=cents).collect()))
        b = sorted(map(tuple, semdedup(emb, eps=0.3, centroids=cents,
                                       assign="arrow").collect()))
        assert a == b and len(a) > 0
        assert any(not r[2] for r in a)  # the planted near-dups are removed


class TestDsirScores:
    def test_target_docs_score_higher(self, spark):
        from solarpos_spark.operators.text import dsir_scores

        # target vocabulary is disjoint from raw filler: target-like docs
        # must get logw > 0, filler-like docs logw < 0
        rows = ([(i, "klingon warp core dilithium matrix", "tgt")
                 for i in range(5)]
                + [(10 + i, "plain boring generic filler words", "raw")
                   for i in range(20)])
        df = spark.createDataFrame(rows, "doc_id long, text string, src string")
        out = {r["doc_id"]: r
               for r in dsir_scores(df, F.col("src") == "tgt").collect()}
        assert all(out[i]["logw"] > 0 and out[i]["selected"]
                   for i in range(5))
        assert all(out[10 + i]["logw"] < 0 and not out[10 + i]["selected"]
                   for i in range(20))

    def test_uniform_corpus_scores_zero(self, spark):
        from solarpos_spark.operators.text import dsir_scores

        # if the target IS the whole corpus, t_b == r_b and T == R for
        # every bucket -> logw identically 0 (and selected)
        rows = [(i, f"some words number {i} here") for i in range(8)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = dsir_scores(df, F.lit(True)).collect()
        assert all(r["logw"] == 0.0 and r["selected"] for r in out)

    def test_n_words_matches_token_count(self, spark):
        from solarpos_spark.operators.text import dsir_scores

        df = spark.createDataFrame([(1, "a b c d e"), (2, "x y")],
                                   "doc_id long, text string")
        out = {r["doc_id"]: r
               for r in dsir_scores(df, F.col("doc_id") == 1).collect()}
        assert out[1]["n_words"] == 5 and out[2]["n_words"] == 2

    def test_sample_fitted_model_scores_unseen_words(self, spark):
        from solarpos_spark.operators.text import dsir_fit, dsir_scores

        fit_rows = [(0, "alpha beta gamma", "tgt"), (1, "delta epsilon", "raw")]
        fit_df = spark.createDataFrame(fit_rows,
                                       "doc_id long, text string, src string")
        model = dsir_fit(fit_df, F.col("src") == "tgt")
        # the scored corpus contains words the model never saw: their
        # buckets carry lambda = 0 and the tokens still count
        score_df = spark.createDataFrame(
            [(7, "zzz_never_seen qqq_also_new alpha")],
            "doc_id long, text string")
        r = dsir_scores(score_df, model=model).collect()[0]
        assert r["n_words"] == 3
        assert r["logw"] is not None


class TestPerplexityBuckets:
    def test_fluent_docs_land_in_head(self, spark):
        from solarpos_spark.operators.text import perplexity_buckets

        # 6 docs drawn from a tiny common vocabulary + 3 docs of rare
        # one-off words (9 total -> exact thirds): the rare docs must
        # score lowest and fill the tail bucket exactly
        common = [(i, "the cat sat on the mat again today") for i in range(6)]
        rare = [(100 + i, f"zxqv{i} wkjy{i} bbnm{i} qqrr{i}")
                for i in range(3)]
        df = spark.createDataFrame(common + rare,
                                   "doc_id long, text string")
        out = {r["doc_id"]: r for r in perplexity_buckets(df).collect()}
        for i in range(3):
            assert out[100 + i]["ppl_bucket"] == "tail", out[100 + i]
        assert all(out[i]["ppl_bucket"] in ("middle", "head")
                   for i in range(6))

    def test_equal_count_thirds(self, spark):
        from collections import Counter

        from solarpos_spark.operators.text import perplexity_buckets

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        out = perplexity_buckets(docs).collect()
        c = Counter(r["ppl_bucket"] for r in out)
        n = len(out)
        assert set(c) == {"head", "middle", "tail"}
        assert max(c.values()) - min(c.values()) <= 1 and sum(c.values()) == n

    def test_prefit_model_reused(self, spark):
        from solarpos_spark.operators.text import (perplexity_buckets,
                                                   unigram_fit)

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        model = unigram_fit(docs)
        a = sorted(map(tuple, perplexity_buckets(docs).collect()))
        b = sorted(map(tuple,
                       perplexity_buckets(docs, model=model).collect()))
        assert a == b and len(a) > 0


class TestTopNgrams:
    def test_planted_heavy_hitter_ranks_first(self, spark):
        from solarpos_spark.operators.text import top_ngrams

        rows = ([(i, "hot phrase filler words vary " + f"u{i} v{i}")
                 for i in range(10)]
                + [(100, "one off doc entirely")])
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = top_ngrams(df, n=2, k=3).collect()
        # four bigrams tie at cnt=10; the deterministic lexical tie-break
        # fixes the cut and the order
        assert [(r["rank"], r["ngram"], r["cnt"], r["n_docs"])
                for r in out] == [(1, "filler words", 10, 10),
                                  (2, "hot phrase", 10, 10),
                                  (3, "phrase filler", 10, 10)]

    def test_trigram_mode_and_short_docs(self, spark):
        from solarpos_spark.operators.text import top_ngrams

        df = spark.createDataFrame(
            [(1, "a b c a b c"), (2, "a b"), (3, "x")],
            "doc_id long, text string")
        out = {r["ngram"]: r for r in top_ngrams(df, n=3, k=10).collect()}
        # doc 1 contributes 4 trigram occurrences over 3 distinct grams
        # ('a b c' twice); docs 2,3 are too short and contribute none
        assert out["a b c"]["cnt"] == 2 and out["a b c"]["n_docs"] == 1
        assert len(out) == 3


class TestSourceCap:
    def test_cap_keeps_best_per_source(self, spark):
        from solarpos_spark.operators.curate import source_cap

        rows = [(i, f"s{i % 2}", 100 - i) for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        out = {(r.source, r.src_rank): r.doc_id
               for r in source_cap(df, 3).collect()}
        # per source, largest n_chars first = lowest ids (n_chars = 100 - i)
        assert out == {("s0", 1): 0, ("s0", 2): 2, ("s0", 3): 4,
                       ("s1", 1): 1, ("s1", 2): 3, ("s1", 3): 5}

    def test_tiebreak_and_stability(self, spark):
        from solarpos_spark.operators.curate import source_cap

        rows = [(i, "s", 7) for i in range(20)]  # all equal n_chars
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        kept = sorted(r.doc_id for r in source_cap(df, 5).collect())
        assert kept == [0, 1, 2, 3, 4]  # id tiebreak, partition-independent
        again = sorted(r.doc_id
                       for r in source_cap(df.repartition(7), 5).collect())
        assert again == kept

    def test_plans_as_window_group_limit(self, spark):
        from solarpos_spark.operators.curate import source_cap

        rows = [(i, f"s{i % 2}", i) for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
        plan = (source_cap(df, 3)._jdf.queryExecution()
                .optimizedPlan().toString())
        assert "WindowGroupLimit" in plan, plan


class TestMixtureSample:
    @pytest.fixture()
    def corpus(self, spark):
        # 3 sources x 40 docs x ~8 tokens/doc ("aaaa bbbb cccc dddd" = 4+4)
        rows = [(s * 100 + i, f"src{s}", "aaaa bbbb cccc dddd eeee")
                for s in range(3) for i in range(40)]
        return spark.createDataFrame(rows, "doc_id long, source string, text string")

    def test_budget_rates_and_overweight_keeps_all(self, spark, corpus):
        from solarpos_spark.operators.curate import mixture_sample

        # per-source tokens = 40 * 5 = 200. Budgets: src0 10000/10000 of
        # 1000 = 1000 > 200 -> rate 10000 (keep all); src1 500/10000 of
        # 1000 = 50 tokens -> rate 10000*50//200 = 2500; src2 default 0
        # -> dropped entirely.
        out = mixture_sample(corpus, {"src0": 10000, "src1": 500}, 1000)
        rows = out.collect()
        by_src = {}
        for r in rows:
            by_src.setdefault(r.source, []).append(r)
        assert len(by_src["src0"]) == 40
        assert all(r.rate == 10000 for r in by_src["src0"])
        assert all(r.rate == 2500 for r in by_src["src1"])
        assert 0 < len(by_src["src1"]) < 40
        assert "src2" not in by_src
        assert all(r.n_tokens == 5 for r in rows)

    def test_deterministic_under_repartition(self, spark, corpus):
        from solarpos_spark.operators.curate import mixture_sample

        w = {"src0": 3000, "src1": 2000, "src2": 1000}
        a = sorted(r.doc_id for r in
                   mixture_sample(corpus, w, 300).collect())
        b = sorted(r.doc_id for r in
                   mixture_sample(corpus.repartition(11), w, 300).collect())
        assert a == b and a

    def test_seed_decorrelates(self, spark, corpus):
        from solarpos_spark.operators.curate import mixture_sample

        w = {"src0": 5000, "src1": 5000, "src2": 5000}
        a = {r.doc_id for r in
             mixture_sample(corpus, w, 300, seed=11).collect()}
        b = {r.doc_id for r in
             mixture_sample(corpus, w, 300, seed=99).collect()}
        assert a != b


class TestQuantizedTopk:
    @pytest.fixture()
    def emb(self, spark):
        import numpy as np
        rng = np.random.RandomState(5)
        base = rng.randn(60, 64).astype("float32")
        base[25] = base[30] * 0.98 + 0.005  # plant 30's near-twin
        rows = [(i, [float(x) for x in base[i]]) for i in range(60)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")

    def test_quantize_roundtrip_bounded_error(self, spark, emb):
        from solarpos_spark.operators.similarity import quantize_embeddings

        out = quantize_embeddings(emb, 64).collect()
        src = {r.vec_id: r.embedding for r in emb.collect()}
        for r in out:
            assert all(-127 <= c <= 127 for c in r.qvec)
            # dequantization error is at most half a step per element
            for c, x in zip(r.qvec, src[r.vec_id]):
                assert abs(c * r.scale - x) <= r.scale / 2 + 1e-12

    def test_zero_vector_quantizes_to_zero(self, spark):
        from solarpos_spark.operators.similarity import quantize_embeddings

        df = spark.createDataFrame([(1, [0.0] * 8)],
                                   "vec_id long, embedding array<float>")
        r = quantize_embeddings(df, 8).collect()[0]
        assert r.qvec == [0] * 8 and r.scale == 0.0

    def test_finds_planted_twin_and_recall(self, spark, emb):
        from solarpos_spark.operators import similarity

        q = emb.filter(F.col("vec_id").isin(25, 3, 7))
        got = similarity.quantized_topk(emb, q, dim=64, k=3, shortlist=8)
        by_q = {}
        for r in got.collect():
            by_q.setdefault(r.query_id, []).append((r.rank, r.neighbor_id))
        assert sorted(by_q[25])[0] == (1, 30)  # planted twin at rank 1
        exact = similarity.brute_force_topk(emb, q, k=3)
        eby_q = {}
        for r in exact.collect():
            eby_q.setdefault(r.query_id, set()).add(r.neighbor_id)
        # int8 top-3 recall vs exact over all three queries
        hits = sum(len({n for _, n in by_q[qid]} & eby_q[qid])
                   for qid in eby_q)
        assert hits >= 7  # >= 7/9 overlap

    def test_stage1_shuffles_codes_not_vectors(self, spark, emb):
        """The shortlist window consumes only (query_id, neighbor_id,
        approx) and plans as WindowGroupLimit; full float vectors enter
        via broadcast joins only."""
        from solarpos_spark.operators import similarity

        q = emb.filter(F.col("vec_id") < 3)
        plan = (similarity.quantized_topk(emb, q, dim=64, k=3)
                ._jdf.queryExecution().optimizedPlan().toString())
        lines = plan.splitlines()
        # the shortlist cut (limit 10) must be a WindowGroupLimit whose
        # input projection carries approx only — no float vectors
        win = next(i for i, l in enumerate(lines)
                   if "WindowGroupLimit" in l and "row_number(), 10" in l)
        gap = "\n".join(lines[win:win + 2])
        assert "approx" in gap and "cvec" not in gap and "qvec2" not in gap


class TestProductQuantization:
    @pytest.fixture()
    def emb(self, spark):
        import numpy as np
        rng = np.random.RandomState(9)
        base = rng.randn(80, 64).astype("float32")
        base[40] = base[12] * 0.99 + 0.002  # plant 12's near-twin
        rows = [(i, [float(x) for x in base[i]]) for i in range(80)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")

    def test_codes_shape_and_determinism(self, spark, emb):
        from solarpos_spark.operators import similarity

        books = similarity.pq_train(emb, dim=64, m=8, n_centroids=8,
                                    n_iter=2)
        assert len(books) == 8 and all(len(b) == 8 for b in books)
        codes = similarity.pq_encode(emb, books, dim=64)
        rows = codes.collect()
        assert len(rows) == 80 * 8
        assert all(0 <= r.code < 8 for r in rows)
        again = similarity.pq_encode(emb.repartition(7), books, dim=64)
        assert sorted(map(tuple, again.collect())) == \
            sorted(map(tuple, rows))

    def test_planted_twin_shares_codes_and_ranks_first(self, spark, emb):
        """Near-identical vectors land in the same cell of every
        subspace, so pure ADC (no rerank) puts the twin at rank 1 —
        the strong-neighbor guarantee PQ actually makes."""
        from solarpos_spark.operators import similarity

        books = similarity.pq_train(emb, dim=64, m=8, n_centroids=8,
                                    n_iter=2)
        codes = {(r.vec_id, r.sub): r.code
                 for r in similarity.pq_encode(emb, books, dim=64).collect()}
        assert all(codes[(12, s)] == codes[(40, s)] for s in range(8))
        q = emb.filter(F.col("vec_id") == 12)
        top = similarity.pq_topk(emb, q, dim=64, m=8, n_centroids=8,
                                 n_iter=2, k=1, books=books).collect()[0]
        assert top.neighbor_id == 40

    def test_rerank_matches_exact_on_shortlist_hits(self, spark, emb):
        """With shortlist covering the whole corpus, PQ+refine IS
        brute_force_topk (same arithmetic, same rounding)."""
        from solarpos_spark.operators import similarity

        q = emb.filter(F.col("vec_id") < 4)
        pq = similarity.pq_topk(emb, q, dim=64, m=8, n_centroids=8,
                                n_iter=2, k=3, shortlist=100)
        exact = similarity.brute_force_topk(emb, q, k=3)
        assert sorted(map(tuple, pq.collect())) == \
            sorted(map(tuple, exact.collect()))


class TestIvfPq:
    @pytest.fixture()
    def emb(self, spark):
        import numpy as np
        rng = np.random.RandomState(9)
        base = rng.randn(80, 64).astype("float32")
        base[40] = base[12] * 0.99 + 0.002  # plant 12's near-twin
        rows = [(i, [float(x) for x in base[i]]) for i in range(80)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")

    def test_all_probes_equals_pq(self, spark, emb):
        """With nprobe == n_coarse the coarse restriction is a no-op, so
        IVF-PQ reduces EXACTLY to pq_topk (same books, same ADC fold,
        same refine) — the composition adds pruning, not new arithmetic."""
        from solarpos_spark.operators import similarity

        q = emb.filter(F.col("vec_id") < 4)
        books = similarity.pq_train(emb, dim=64, m=8, n_centroids=8,
                                    n_iter=2)
        full = similarity.ivfpq_topk(emb, q, dim=64, k=3, n_coarse=4,
                                     nprobe=4, m=8, n_codes=8,
                                     shortlist=100, books=books)
        pq = similarity.pq_topk(emb, q, dim=64, m=8, n_centroids=8,
                                n_iter=2, k=3, shortlist=100, books=books)
        assert sorted(map(tuple, full.collect())) == \
            sorted(map(tuple, pq.collect()))

    def test_planted_twin_survives_pruning(self, spark, emb):
        """A near-identical pair lands in the same coarse list (argmax of
        a 0.99-scaled copy agrees) AND shares every PQ code, so the twin
        is rank 1 even at nprobe=1 — the strong-neighbor guarantee the
        composed index keeps."""
        from solarpos_spark.operators import similarity

        q = emb.filter(F.col("vec_id") == 12)
        top = similarity.ivfpq_topk(emb, q, dim=64, k=1, n_coarse=8,
                                    nprobe=1, m=8, n_codes=8).collect()[0]
        assert top.neighbor_id == 40

    def test_search_over_stored_index_never_shuffles_corpus(self, spark,
                                                            emb, tmp_path):
        """Plan shape: with the index prebuilt (the production deployment
        stores it once — ivfpq_index's id-keyed glue join is index-BUILD
        cost), the SEARCH plan joins the code relation only against
        broadcast sides (probes, per-query ADC table): no SortMergeJoin,
        no exchange of the scanned index anywhere."""
        from solarpos_spark.operators import similarity

        cents = similarity.ivf_train_centroids(emb, n_centroids=8,
                                               n_iter=2, seed=11)
        books = similarity.pq_train(emb, dim=64, m=8, n_centroids=8,
                                    n_iter=2, seed=11)
        path = str(tmp_path / "ivfpq_index")
        similarity.ivfpq_index(emb, cents, books, dim=64) \
            .write.parquet(path)
        idx = spark.read.parquet(path)
        q = emb.filter(F.col("vec_id") < 2)
        plan = similarity.ivfpq_topk(
            emb, q, dim=64, k=3, n_coarse=8, nprobe=2, m=8, n_codes=8,
            centroids=cents, books=books, index=idx,
        )._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" not in plan


class TestHtmlExtract:
    def test_extraction_and_signals(self, spark):
        from solarpos_spark.operators.text import extract_html_text

        rows = [
            (1, '<html><head><style>p{x}</style><script>if(a<b){}\n'
                'more</script></head><body><h1>Title</h1>'
                '<p>Tom &amp; Jerry say &lt;hi&gt; &quot;loud&quot;</p>'
                '<a href="x">nav</a> <a href="y">bar</a></body></html>'),
            (2, 'plain text, no markup'),
            (3, '<p>&nbsp;&#39;quoted&#39;&nbsp;</p>'),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in extract_html_text(df).collect()}
        assert out[1].text == 'Title Tom & Jerry say <hi> "loud" nav bar'
        assert out[1].n_links == 2
        assert out[1].link_density == round(
            2 / len(out[1].text), 6)
        assert out[2].text == "plain text, no markup"
        assert out[2].n_links == 0
        assert out[3].text == "'quoted'"

    def test_link_count_edges(self, spark):
        """ADVICE r4: '<a>' and '<a\\nhref' anchors count; anchors
        inside script/style subtrees (removed from the text) don't;
        '<abbr>' must not count as an anchor."""
        from solarpos_spark.operators.text import extract_html_text

        rows = [
            (1, '<a>bare</a> <A\nhref="x">nl</A> <abbr>ab</abbr>'),
            (2, '<script>var s = "<a href=x>y</a>";</script>'
                '<style>a{}</style><a href="z">real</a>'),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r for r in extract_html_text(df).collect()}
        assert out[1].n_links == 2
        assert out[2].n_links == 1

    def test_script_with_angle_brackets_fully_removed(self, spark):
        """The (?s) non-greedy subtree patterns must swallow script
        bodies containing < and newlines — a bare tag-stripper would
        leak 'if(a' fragments into the text."""
        from solarpos_spark.operators.text import extract_html_text

        df = spark.createDataFrame(
            [(1, '<script>\nvar s = "<p>not text</p>";\n</script>ok')],
            "doc_id long, text string")
        assert extract_html_text(df).collect()[0].text == "ok"

    def test_entity_decode_order(self, spark):
        """&amp;lt; decodes to the literal '&lt;' (amp last), never '<'."""
        from solarpos_spark.operators.text import extract_html_text

        df = spark.createDataFrame([(1, "x &amp;lt; y")],
                                   "doc_id long, text string")
        assert extract_html_text(df).collect()[0].text == "x &lt; y"


class TestUrlOps:
    """URL/domain curation family (operators/urls.py)."""

    URLS = [
        (1, "https://m.Site7.co.uk:8080/p/3?utm_source=f&ref=x&id=9#frag"),
        (2, "http://site13.com:80/a"),
        (3, "https://www.site5.org"),
        (4, "not a url"),
        (5, "https://localhost/x?a=1"),
        (6, "https://ads.site13.com/z?gclid=abc&b=2"),
        (7, "HTTPS://UPPER.example.COM/Mixed/Case?z=1&a=2"),
        # PSL tiers: private suffix, wildcard zone (below / at depth),
        # exception rules, '?' inside a fragment
        (8, "https://proj.github.io/x"),
        (9, "https://a.b.kawasaki.jp/x"),
        (10, "https://b.kawasaki.jp/x"),
        (11, "https://sub.city.kawasaki.jp/x"),
        (12, "https://foo.www.ck/x"),
        (13, "https://foo.bar.ck/x"),
        (14, "https://h.example.com/p#sec?x=1"),
    ]

    @pytest.fixture(scope="class")
    def parsed(self, spark):
        from solarpos_spark.operators import urls

        df = spark.createDataFrame(self.URLS, "doc_id long, url string")
        return urls.url_parse(df).cache()

    def test_components(self, parsed):
        by = {r.doc_id: r for r in parsed.collect()}
        assert by[1].scheme == "https" and by[1].host == "m.site7.co.uk"
        assert by[1].port == 8080
        assert by[1].registered_domain == "site7.co.uk"  # PSL 2-level
        assert by[1].path == "/p/3"
        assert by[1].query_norm == "id=9&ref=x"  # utm dropped, sorted
        assert by[1].url_norm == \
            "https://m.site7.co.uk:8080/p/3?id=9&ref=x"
        # default port stripped from the canonical form, kept as value
        assert by[2].port == 80
        assert by[2].url_norm == "http://site13.com/a"
        # empty path -> '/'
        assert by[3].path == "/" and by[3].url_norm.endswith(".org/")
        # malformed rows parse to empty components, no error
        assert by[4].scheme == "" and by[4].host == ""
        # single-label host is its own registrable domain
        assert by[5].registered_domain == "localhost"
        # subdomain resolves to the registered domain
        assert by[6].registered_domain == "site13.com"
        assert by[6].query_norm == "b=2"  # gclid dropped
        # case-normalized scheme + host, path case preserved
        assert by[7].scheme == "https"
        assert by[7].host == "upper.example.com"
        assert by[7].path == "/Mixed/Case"
        assert by[7].query_norm == "a=2&z=1"

    def test_psl_tiers(self, parsed):
        """PSL resolution: private suffixes, wildcard zones, exception
        rules (the publicsuffix.org algorithm, table-driven)."""
        by = {r.doc_id: r for r in parsed.collect()}
        # private tier: github.io is a (private) public suffix
        assert by[8].registered_domain == "proj.github.io"
        assert by[8].public_suffix == "github.io"
        assert by[8].is_private_suffix is True
        assert by[1].is_private_suffix is False
        # wildcard *.kawasaki.jp: one host label joins the suffix
        assert by[9].public_suffix == "b.kawasaki.jp"
        assert by[9].registered_domain == "a.b.kawasaki.jp"
        # host AT wildcard depth is itself the public suffix
        assert by[10].public_suffix == "b.kawasaki.jp"
        assert by[10].registered_domain == "b.kawasaki.jp"
        # exception !city.kawasaki.jp cancels the wildcard
        assert by[11].public_suffix == "kawasaki.jp"
        assert by[11].registered_domain == "city.kawasaki.jp"
        # exception !www.ck under *.ck
        assert by[12].public_suffix == "ck"
        assert by[12].registered_domain == "www.ck"
        # plain *.ck wildcard otherwise
        assert by[13].public_suffix == "bar.ck"
        assert by[13].registered_domain == "foo.bar.ck"
        # '?' inside a fragment is NOT a query
        assert by[14].query_norm == ""
        assert by[14].url_norm == "https://h.example.com/p"

    def test_parse_plan_exchange_free(self, spark):
        """The PSL join chain must stay broadcast — an Exchange in
        url_parse would shuffle the whole corpus at scan level."""
        from solarpos_spark.operators import urls

        df = spark.createDataFrame(self.URLS, "doc_id long, url string")
        plan = urls.url_parse(df)._jdf.queryExecution() \
            .executedPlan().toString()
        for shuffle in ("Exchange hashpartitioning",
                        "Exchange rangepartitioning",
                        "Exchange SinglePartition"):
            assert shuffle not in plan
        assert "BroadcastHashJoin" in plan

    def test_blocklist_subdomain_semantics(self, parsed):
        from solarpos_spark.operators import urls

        surv = urls.blocklist_filter(parsed, ["co.uk", "site13.com"])
        kept = sorted(r.doc_id for r in surv.collect())
        # 1 blocked via public-suffix zone, 2 exact, 6 as subdomain
        assert kept == [3, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14]
        # blocking a subdomain does NOT block its parent domain
        surv2 = urls.blocklist_filter(parsed, ["ads.site13.com"])
        kept2 = sorted(r.doc_id for r in surv2.collect())
        assert 2 in kept2 and 6 not in kept2

    def test_blocklist_plan_broadcasts(self, parsed):
        """The suffix join must broadcast the blocklist relation — a
        shuffled join on the suffix key would move the whole corpus."""
        from solarpos_spark.operators import urls

        surv = urls.blocklist_filter(parsed, ["co.uk"])
        plan = surv._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan

    def test_domain_stats(self, spark, parsed):
        from solarpos_spark.operators import urls

        stats = {r.domain: r for r in
                 urls.domain_stats(parsed, lang_col=None, chars_col=None)
                 .collect()}
        assert stats["site13.com"].n_docs == 2
        assert stats["site13.com"].n_hosts == 2


class TestShuffleShards:
    def test_permutation_properties(self, spark, docs):
        """Every doc appears exactly once; pos is contiguous 0..n-1
        within each shard (a valid shard-local total order)."""
        from solarpos_spark.operators.curate import shuffle_shards

        out = shuffle_shards(docs, 4).select("doc_id", "shard", "pos")
        rows = out.collect()
        assert len(rows) == docs.count()
        assert len({r.doc_id for r in rows}) == len(rows)
        by_shard = {}
        for r in rows:
            by_shard.setdefault(r.shard, []).append(r.pos)
        for shard, poss in by_shard.items():
            assert sorted(poss) == list(range(len(poss)))

    def test_partitioning_independent_and_seeded(self, spark, docs):
        """Same assignment on any input partitioning (the property
        orderBy(rand()) lacks); a different seed reshuffles."""
        from solarpos_spark.operators.curate import shuffle_shards

        a = sorted((r.doc_id, r.shard, r.pos) for r in
                   shuffle_shards(docs, 4).select(
                       "doc_id", "shard", "pos").collect())
        b = sorted((r.doc_id, r.shard, r.pos) for r in
                   shuffle_shards(docs.repartition(13), 4).select(
                       "doc_id", "shard", "pos").collect())
        assert a == b
        c = sorted((r.doc_id, r.shard, r.pos) for r in
                   shuffle_shards(docs, 4, seed=99).select(
                       "doc_id", "shard", "pos").collect())
        assert a != c

    def test_order_decorrelated_from_id(self, spark, docs):
        """The shard-local order must not be id order — check that at
        least one shard reads ids non-monotonically."""
        from solarpos_spark.operators.curate import shuffle_shards

        out = shuffle_shards(docs, 2).select("doc_id", "shard", "pos")
        by_shard = {}
        for r in out.collect():
            by_shard.setdefault(r.shard, []).append((r.pos, r.doc_id))
        monotone = all(
            [i for _, i in sorted(v)] == sorted(i for _, i in v)
            for v in by_shard.values())
        assert not monotone

    def test_pack_follows_shuffled_order(self, spark, docs):
        """sequence_pack(order_col='pos') lays tokens out in shuffle
        order: each doc's offset equals the running token sum of the
        docs BEFORE it in (pos) order, not id order."""
        from solarpos_spark.operators.curate import (sequence_pack,
                                                     shuffle_shards)

        shuffled = shuffle_shards(docs.limit(0).unionByName(docs), 2)
        layout = sequence_pack(shuffled, capacity=64, shard_col="shard",
                               order_col="pos")
        joined = layout.join(
            shuffled.select("doc_id", "pos"), "doc_id").collect()
        by_shard = {}
        for r in joined:
            by_shard.setdefault(r.shard, []).append(r)
        for rows in by_shard.values():
            rows.sort(key=lambda r: r.pos)
            running = 0
            for r in rows:
                assert r.offset == running
                running += r.n_tokens


def test_url_cross_engine_parse_parity(spark):
    """The parser's regex/list chain must behave identically under
    Java regex (Spark) and RE2 (DuckDB) — the invariant every gate
    oracle rests on — over adversarial in-profile inputs: deep
    subdomains, suffix-2 TLDs, empty queries, '&&' runs, '=' in
    values, trailing '?', '#' before '?', and malformed rows."""
    import duckdb

    from solarpos_spark.operators import urls
    from solarpos_spark.operators.urls import (
        _AUTH_RE, _HOST_RE, _PATH_RE, _PORT_RE, _QUERY_RE,
        _SCHEME_RE)

    cases = [
        "https://a.b.c.d.site.co.uk:9999/x/y/z?b=2&&a=1&utm_x=9&",
        "http://h.de/?",
        "https://h.io/p#frag?notquery=1",
        "https://h.com/p?k=v=w&k2",
        "ftp://files.example.org:21/pub",
        "https://single",
        "", "no scheme at all", "://broken",
        # PSL edges: private, wildcard at/below depth, exceptions,
        # 4-label private wildcard (*.compute.amazonaws.com)
        "https://user.blogspot.com/post",
        "https://deep.proj.github.io/x",
        "https://x.y.z.kawasaki.jp/",
        "https://kawasaki.jp/",
        "https://city.kawasaki.jp/",
        "https://www.ck/",
        "https://ck/",
        "https://ec2-1-2-3-4.us-east-1.compute.amazonaws.com/api",
        "https://s3.amazonaws.com/bucket",
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(cases)],
        "doc_id long, url string")
    got = {r.doc_id: (r.scheme, r.host, r.port, r.registered_domain,
                      r.public_suffix, r.is_private_suffix,
                      r.path, r.query_norm, r.url_norm)
           for r in urls.url_parse(df).collect()}

    ps_sql, priv_sql = urls.psl_resolution_sql()
    track = " OR ".join(f"starts_with(x, '{p}')"
                        for p in urls.TRACKING_PARAM_PREFIXES)
    vals = ", ".join(f"({i}, '{u}')" for i, u in enumerate(cases))
    sql = f"""
WITH u AS (SELECT * FROM (VALUES {vals}) t(doc_id, url)),
p0 AS (
  SELECT *, lower(regexp_extract(url, '{_SCHEME_RE}', 1)) AS scheme,
     regexp_extract(url, '{_AUTH_RE}', 1) AS auth,
     regexp_extract(url, '{_PATH_RE}', 1) AS path0,
     regexp_extract(regexp_extract(url, '^[^#]*', 0),
                    '{_QUERY_RE}', 1) AS query
  FROM u),
r AS (
  SELECT *, lower(regexp_extract(auth, '{_HOST_RE}', 1)) AS host,
     regexp_extract(auth, '{_PORT_RE}', 1) AS port_s,
     string_split(lower(regexp_extract(auth, '{_HOST_RE}', 1)), '.')
       AS labels,
     len(string_split(lower(regexp_extract(auth, '{_HOST_RE}', 1)),
         '.')) AS n
  FROM p0),
psl AS (
  SELECT *, {ps_sql} AS ps, {priv_sql} AS is_private_suffix
  FROM r),
parsed AS (
  SELECT doc_id, scheme, host, port_s, is_private_suffix,
     CASE WHEN port_s = '' THEN NULL
          ELSE CAST(port_s AS BIGINT) END AS port,
     CASE WHEN n > ps THEN array_to_string(labels[n-ps:n], '.')
          ELSE host END AS registered_domain,
     array_to_string(labels[n-ps+1:n], '.') AS public_suffix,
     CASE WHEN path0 = '' THEN '/' ELSE path0 END AS path,
     coalesce(array_to_string(list_sort(list_filter(
         string_split(query, '&'),
         x -> x <> '' AND NOT ({track}))), '&'), '') AS query_norm
  FROM psl)
SELECT doc_id, scheme, host, port, registered_domain, public_suffix,
   is_private_suffix, path, query_norm,
   scheme || '://' || host ||
   (CASE WHEN port_s <> ''
              AND NOT (scheme = 'http' AND port_s = '80')
              AND NOT (scheme = 'https' AND port_s = '443')
         THEN ':' || port_s ELSE '' END) ||
   path ||
   (CASE WHEN query_norm <> '' THEN '?' || query_norm
         ELSE '' END) AS url_norm
FROM parsed
"""
    con = duckdb.connect()
    want = {int(r[0]): tuple(r[1:]) for r in con.sql(sql).fetchall()}
    assert got == want


class TestChunkDocuments:
    def test_overlap_and_coverage(self, spark):
        from solarpos_spark.operators.text import chunk_documents

        words = [f"w{i}" for i in range(100)]
        df = spark.createDataFrame([(1, " ".join(words))],
                                   "doc_id long, text string")
        out = {r.chunk_idx: r for r in
               chunk_documents(df, chunk_words=32, overlap_words=8)
               .collect()}
        # stride 24: chunks start at 0, 24, 48, 72, 96
        assert sorted(out) == [0, 1, 2, 3, 4]
        assert out[0].text.split() == words[0:32]
        assert out[1].text.split() == words[24:56]
        assert out[4].text.split() == words[96:100]  # trailing partial
        assert out[1].start_pos == 24 and out[4].n_words == 4
        # consecutive full chunks share exactly overlap_words words
        assert out[0].text.split()[-8:] == out[1].text.split()[:8]
        # coverage: every word appears in at least one chunk
        seen = {w for r in out.values() for w in r.text.split()}
        assert seen == set(words)

    def test_short_doc_single_chunk(self, spark):
        from solarpos_spark.operators.text import chunk_documents

        df = spark.createDataFrame([(1, "a b c")],
                                   "doc_id long, text string")
        rows = chunk_documents(df, chunk_words=32, overlap_words=8) \
            .collect()
        assert len(rows) == 1
        assert rows[0].text == "a b c" and rows[0].n_words == 3

    def test_partitioning_independent(self, spark, docs):
        from solarpos_spark.operators.text import chunk_documents

        a = sorted((r.doc_id, r.chunk_idx, r.text) for r in
                   chunk_documents(docs, chunk_words=32, overlap_words=8)
                   .collect())
        b = sorted((r.doc_id, r.chunk_idx, r.text) for r in
                   chunk_documents(docs.repartition(13), chunk_words=32,
                                   overlap_words=8).collect())
        assert a == b


class TestCrossCorpusFuzzyDecontaminate:
    def test_paraphrased_probes_caught_cross_side_only(self, spark):
        from solarpos_spark.operators.dedup import \
            cross_corpus_verified_pairs

        base = ("the quick brown fox jumps over the lazy dog and then "
                "runs far away into the deep dark forest tonight")
        other = ("completely different content about spark shuffles "
                 "and catalyst optimizer rules with nothing shared "
                 "at all here in this sentence of words")
        corpus = spark.createDataFrame(
            [(1, base), (2, other), (3, base + " again")],
            "doc_id long, text string")
        probe = spark.createDataFrame(
            [(7, base + " extra tail"),          # paraphrase of 1 (and 3)
             (8, "totally unrelated probe text about databases and "
                 "storage engines nothing in common with anything")],
            "doc_id long, text string")
        got = {(r.doc_id, r.probe_id): r.jaccard for r in
               cross_corpus_verified_pairs(
                   corpus, probe, threshold=0.5,
                   hash_fn="poly31").collect()}
        assert (1, 7) in got and got[(1, 7)] >= 0.5
        # probe 8 matches nothing; corpus docs never pair with each
        # other (1,3 are near-dups WITHIN the corpus — out of scope)
        assert all(pid == 7 for (_, pid) in got)
        assert all(d in (1, 3) for (d, _) in got)

    def test_exact_copy_is_jaccard_one(self, spark):
        from solarpos_spark.operators.dedup import \
            cross_corpus_verified_pairs

        t = ("alpha beta gamma delta epsilon zeta eta theta iota "
             "kappa lambda mu nu xi omicron pi rho sigma tau")
        corpus = spark.createDataFrame([(1, t)],
                                       "doc_id long, text string")
        probe = spark.createDataFrame([(9, t)],
                                      "doc_id long, text string")
        got = cross_corpus_verified_pairs(corpus, probe,
                                          hash_fn="poly31").collect()
        assert [(r.doc_id, r.probe_id, r.jaccard)
                for r in got] == [(1, 9, 1.0)]


class TestCorpusDiff:
    def test_statuses(self, spark):
        from solarpos_spark.operators.curate import corpus_diff

        old = spark.createDataFrame(
            [(1, "same text"), (2, "will change"), (3, "will vanish"),
             (4, "whitespace   only")],
            "doc_id long, text string")
        new = spark.createDataFrame(
            [(1, "same text"), (2, "changed now"),
             (4, "whitespace only"),   # normalization-equal -> unchanged
             (9, "brand new")],
            "doc_id long, text string")
        got = {r.doc_id: r.status for r in
               corpus_diff(old, new).collect()}
        assert got == {1: "unchanged", 2: "changed", 3: "removed",
                       4: "unchanged", 9: "added"}

    def test_fp_null_sides(self, spark):
        from solarpos_spark.operators.curate import corpus_diff

        old = spark.createDataFrame([(1, "a")], "doc_id long, text string")
        new = spark.createDataFrame([(2, "b")], "doc_id long, text string")
        rows = {r.doc_id: (r.old_fp, r.new_fp) for r in
                corpus_diff(old, new).collect()}
        assert rows[1][1] is None and rows[2][0] is None


class TestClassifierRoc:
    def test_confusion_and_rates_vs_reference(self, spark):
        from solarpos_spark.operators.text import classifier_roc

        rows = [(i, s, y) for i, (s, y) in enumerate(
            [(5, 1), (4, 1), (4, -1), (2, -1), (1, 1), (0, -1),
             (-3, -1), (-3, -1)])]
        df = spark.createDataFrame(rows, "doc_id long, score long, y long")
        got = {r.threshold: (r.tp, r.fp, r.fn, r.tn, r.tpr, r.fpr,
                             r.prec)
               for r in classifier_roc(df).collect()}
        # reference via brute force
        import itertools
        scores = sorted({s for _, s, _ in rows}, reverse=True)
        P = sum(1 for _, _, y in rows if y == 1)
        N = len(rows) - P
        for t in scores:
            tp = sum(1 for _, s, y in rows if s >= t and y == 1)
            fp = sum(1 for _, s, y in rows if s >= t and y == -1)
            want = (tp, fp, P - tp, N - fp, round(tp / P, 6),
                    round(fp / N, 6), round(tp / (tp + fp), 6))
            assert got[t] == want, (t, got[t], want)
        assert len(got) == len(scores)

    def test_monotone_sweep(self, spark):
        from solarpos_spark.operators.text import classifier_roc

        df = spark.createDataFrame(
            [(i, (i * 7) % 13 - 6, 1 if i % 3 == 0 else -1)
             for i in range(60)], "doc_id long, score long, y long")
        pts = classifier_roc(df).orderBy(F.col("threshold").desc()) \
            .collect()
        tprs = [r.tpr for r in pts]
        fprs = [r.fpr for r in pts]
        assert tprs == sorted(tprs) and fprs == sorted(fprs)
        assert pts[-1].tp + pts[-1].fn == sum(1 for i in range(60)
                                              if i % 3 == 0)


class TestQualityFilters:
    def test_word_blocklist_whole_word(self, spark):
        from solarpos_spark.operators.text import word_blocklist_filter

        docs = spark.createDataFrame(
            [(1, "clean text passes fine"),
             (2, "contains the BAD word here"),
             (3, "badge and badly are not bad-listed words")],
            "doc_id long, text string")
        kept = {r.doc_id for r in
                word_blocklist_filter(docs, ["bad"]).collect()}
        # whole-word: 'badge'/'badly' survive, the literal 'bad' (any
        # case) does not; 'bad-listed' is one token, not the word 'bad'
        assert kept == {1, 3}

    def test_gopher_filter_gates(self, spark):
        from solarpos_spark.operators.text import gopher_quality_filter

        sw = "the a of and to in is".split()
        good = " ".join(f"{sw[i % 7]} word{i} tail{i}"
                        for i in range(20))  # varied, stopword-bearing
        short = "too short"
        repetitive = " ".join(["same same"] * 40)
        docs = spark.createDataFrame(
            [(1, good), (2, short), (3, repetitive)],
            "doc_id long, text string")
        kept = {r.doc_id for r in gopher_quality_filter(docs).collect()}
        assert kept == {1}


class TestDocKeywords:
    def test_rare_terms_beat_common(self, spark):
        from solarpos_spark.operators.text import doc_keywords

        docs = spark.createDataFrame(
            [(1, "common common rareword common"),
             (2, "common other stuff"),
             (3, "common more things")],
            "doc_id long, text string")
        got = {(r.doc_id, r.rank): r.term for r in
               doc_keywords(docs, k=2).collect()}
        # 'rareword' (df=1) outranks 'common' (df=3) despite tf 1 vs 3
        assert got[(1, 1)] == "rareword"

    def test_windowgrouplimit_plan(self, spark):
        from solarpos_spark.operators.text import doc_keywords

        docs = spark.createDataFrame(
            [(i, f"w{i} w{i+1} w{i+2}") for i in range(20)],
            "doc_id long, text string")
        plan = doc_keywords(docs, k=2)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "WindowGroupLimit" in plan


class TestR6OptimizationEquivalence:
    """r6 optimization-round rewrites must be value-identical to the
    forms they replaced (unrolled folds, arrow poly31, narrow n-grams)."""

    def test_poly31_arrow_parity(self, spark):
        """poly31_hash_arrow == poly31_hash expression fold, including
        empty strings, nulls, BMP + astral unicode and both bases."""
        from pyspark.sql import functions as F

        from solarpos_spark.operators.dedup import (poly31_hash,
                                                    poly31_hash_arrow)

        data = [("",), ("a",), ("hello world",), ("Ünïcødé tëxt",),
                ("中文 字符",), ("emoji 😀 astral 𝔘",), ("  sp  ",),
                (None,), ("x" * 600,), ("the quick brown fox",)]
        df = spark.createDataFrame(data, "s string")
        for base in (31, 131):
            rows = df.select(
                poly31_hash(F.col("s"), base).alias("e"),
                poly31_hash_arrow(F.col("s"), base).alias("a")).collect()
            for r in rows:
                assert r["e"] == r["a"], (base, r)

    def test_narrow_shingles_equal_window_form(self, spark):
        """shingle_rows / ngram_occurrences narrow rewrites reproduce the
        exact (doc_id, gram) multiset of the old posexplode+lead-window
        construction (distinct sets for shingles, occurrence bags for
        ngrams; short docs keep the degenerate whole-text shingle)."""
        from pyspark.sql import Window, functions as F

        from solarpos_spark.operators import text as T
        from solarpos_spark.operators.dedup import shingle_rows, words_col

        docs = spark.createDataFrame(
            [(1, "a b c d e a b c"), (2, "x y"), (3, "one"),
             (4, "p q r p q r p q r"), (5, "  s  t   u  v ")],
            "doc_id long, text string")

        got_sh = {(r.doc_id, r.shingle)
                  for r in shingle_rows(docs, n=3).collect()}
        # reference: old window form
        wd = docs.select("doc_id", words_col(F.col("text")).alias("_w"))
        pos = wd.selectExpr("doc_id", "posexplode(_w) AS (_p, _word)")
        win = Window.partitionBy("doc_id").orderBy("_p")
        parts = [F.col("_word")] + [F.lead("_word", j).over(win)
                                    for j in range(1, 3)]
        grams = pos.select(
            "doc_id", F.concat_ws(" ", *parts).alias("shingle"),
            F.lead("_word", 2).over(win).isNotNull().alias("_full"))
        full = grams.filter(F.col("_full")).select("doc_id", "shingle")
        shorts = wd.filter(F.size("_w") < 3).select(
            "doc_id", F.array_join("_w", " ").alias("shingle"))
        want_sh = {(r.doc_id, r.shingle)
                   for r in full.unionByName(shorts).distinct().collect()}
        assert got_sh == want_sh

        got_ng = sorted((r.doc_id, r.ngram) for r in
                        T.ngram_occurrences(docs, n=2).collect())
        pos2 = docs.select(
            "doc_id",
            F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("_w")) \
            .selectExpr("doc_id", "posexplode(_w) AS (_p, _word)")
        grams2 = pos2.select(
            "doc_id",
            F.concat_ws(" ", F.col("_word"),
                        F.lead("_word", 1).over(win)).alias("ngram"),
            F.lead("_word", 1).over(win).isNotNull().alias("_full"))
        want_ng = sorted((r.doc_id, r.ngram) for r in
                         grams2.filter(F.col("_full")).collect())
        assert got_ng == want_ng

    def test_unrolled_dot_norm_parity(self, spark):
        """_dot_u/_norm_u/_dot_lit_u are bit-identical to the interpreted
        higher-order folds for known-length arrays (same IEEE order)."""
        import random

        from pyspark.sql import functions as F

        from solarpos_spark.operators.similarity import (
            _dot, _dot_lit_u, _dot_u, _norm, _norm_u)

        rng = random.Random(3)
        dim = 17
        rows = [([rng.uniform(-2, 2) for _ in range(dim)],
                 [rng.uniform(-2, 2) for _ in range(dim)])
                for _ in range(50)]
        df = spark.createDataFrame(
            rows, f"a array<double>, b array<double>")
        lit_vec = [rng.uniform(-1, 1) for _ in range(dim)]
        out = df.select(
            _dot(F.col("a"), F.col("b")).alias("d0"),
            _dot_u(F.col("a"), F.col("b"), dim).alias("d1"),
            _norm(F.col("a")).alias("n0"),
            _norm_u(F.col("a"), dim).alias("n1"),
            _dot(F.col("a"),
                 F.array(*[F.lit(v) for v in lit_vec])).alias("l0"),
            _dot_lit_u(F.col("a"), lit_vec).alias("l1")).collect()
        for r in out:
            assert r["d0"] == r["d1"]          # bitwise double equality
            assert r["n0"] == r["n1"]
            assert r["l0"] == r["l1"]

    def test_round6_boundary_equivalence(self, spark):
        """_round6_boundary's raw-value cut must equal Spark's
        filter(round(x, 6) >= lit(t)) for boundary-adjacent doubles."""
        import math

        from pyspark.sql import functions as F

        from solarpos_spark.operators.similarity import _round6_boundary

        for t in (0.3, 0.5, 0.95, 0.132813, 0.000001, 0.299999):
            d0, inclusive = _round6_boundary(t)
            xs = []
            for base in (d0, t, t - 5e-7, t + 5e-7, t - 1e-6):
                x = base
                for _ in range(4):
                    x = math.nextafter(x, -math.inf)
                for _ in range(8):
                    xs.append(x)
                    x = math.nextafter(x, math.inf)
            xs += [0.0, -1.0, 1.0, t * 2, t / 2]
            df = spark.createDataFrame([(x,) for x in xs], "x double")
            got = sorted(r.x for r in df.filter(
                (F.col("x") >= d0) if inclusive else (F.col("x") > d0))
                .collect())
            want = sorted(r.x for r in df.filter(
                F.round(F.col("x"), 6) >= F.lit(float(t))).collect())
            assert got == want, (t, d0, inclusive,
                                 set(got) ^ set(want))
