"""Gate-registry invariants (no Spark session needed).

The driver's correctness gate samples the FIRST ~50 entries of queries()
in insertion order; _DRIVER_SAMPLE_HEAD pins a representative head
(VERDICT r4 directive #2).  These tests lock that the reorder is a pure
permutation and that the head actually spans every operator family.
"""

import __spark_entry__ as entry


def test_reorder_is_pure_permutation():
    qs = entry.queries()
    keys = list(qs)
    assert len(keys) == len(set(keys))
    head = entry._DRIVER_SAMPLE_HEAD
    assert len(head) == len(set(head))
    # every head name exists, and leads the registry in head order
    assert keys[: len(head)] == [k for k in head if k in qs] == head


def test_first_50_span_all_families():
    keys = list(entry.queries())[:50]
    first50 = set(keys)
    # all streaming committed-output entries are driver-sampled
    streaming = [k for k in entry.queries() if k.startswith("stream_")]
    assert set(streaming) <= first50 and len(streaming) >= 16
    families = {
        # twilight shares sunrise_daily's solver — dropped from the head
        # when stream_absence_committed (15th streaming entry) joined
        "astronomy": {"position_spa", "sunrise_daily"},
        "windows": {"window_tumbling", "sessionize"},
        "dedup": {"dedup_exact", "minhash_verified", "dup_clusters"},
        "ann": {"similarity_topk", "ivf_topk", "pq_topk"},
        "sketches": {"hll_user_rollup", "cms_trigrams", "bottomk_per_lang"},
        "url": {"url_parse", "url_domain_stats", "url_blocklist"},
        "text": {"quality_classifier_trained", "dsir_select",
                 "decontaminate"},
        "curation": {"curate_corpus_lsh", "mixture_sample",
                     "shuffle_shards"},
        "cep": {"sequence_pattern_3"},
        "multimodal": {"multimodal_meta"},
        "relational": {"customer_revenue"},
    }
    for fam, names in families.items():
        assert names <= first50, f"family {fam} missing from driver sample"


def test_every_query_has_oracle_or_documented_exemption():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    # rows-only entries are the two xxhash64 twins, by design
    assert set(qs) - set(oracles) == {"minhash_lsh", "simhash"}
    assert set(oracles) <= set(qs)
