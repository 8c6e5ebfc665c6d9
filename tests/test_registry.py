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
        # r6 rotation (VERDICT r5 directive #2): representatives are
        # entries the r5 driver sample never checked, one+ per family
        "astronomy": {"position_grena3", "twilight", "deltat_estimate"},
        "windows": {"window_sliding", "window_session"},
        "dedup": {"line_dedup", "dup_spans", "fuzzy_decontaminate"},
        "ann": {"ivf_topk_arrow", "ivfpq_topk", "rp_topk",
                "embedding_near_dup_bucketed", "centroid_confusion"},
        "sketches": {"hll_trigrams", "bottomk_trigrams"},
        "url": {"url_parse"},
        "text": {"quality_classifier", "gopher_filter", "doc_keywords",
                 "repetition_stats"},
        "tokenizer": {"wordpiece_tokens", "bpe_merges", "token_novelty"},
        "curation": {"priority_sample", "corpus_diff", "sequence_pack"},
        "cep": {"sequence_pattern_absent"},
        "multimodal": {"frame_sample"},
        "relational": {"event_transitions", "value_anomalies"},
        "graph": {"host_pagerank"},
        "search": {"bm25_search"},
    }
    for fam, names in families.items():
        assert names <= first50, f"family {fam} missing from driver sample"


def test_rotation_covers_never_sampled_entries():
    """VERDICT r5 directive #2: each round's driver sample must rotate
    >= 25 non-streaming slots to entries absent from the previous
    round's CORRECTNESS artifact (the r5 sample is frozen history, so
    its keys are pinned here)."""
    r5_sample = {
        "position_spa", "sunrise_daily", "time_series_zoned",
        "tokens_roundtrip", "window_tumbling", "sessionize",
        "dedup_exact", "minhash_verified", "dup_clusters",
        "similarity_topk", "quantized_topk", "ivf_topk", "pq_topk",
        "semdedup", "hll_user_rollup", "cms_trigrams", "bottomk_per_lang",
        "value_histogram_quantiles", "url_parse", "url_domain_stats",
        "url_blocklist", "lang_id_v2_margin", "quality_classifier_trained",
        "dsir_select", "perplexity_buckets", "decontaminate",
        "curate_corpus_lsh", "mixture_sample", "shuffle_shards",
        "sequence_pattern_3", "multimodal_meta", "customer_revenue",
    }
    head = [k for k in entry._DRIVER_SAMPLE_HEAD
            if not k.startswith("stream_")]
    fresh = [k for k in head if k not in r5_sample]
    assert len(fresh) >= 25, f"only {len(fresh)} rotated-in entries"


def test_every_query_has_oracle_or_documented_exemption():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    # rows-only entries are the two xxhash64 twins, by design
    assert set(qs) - set(oracles) == {"minhash_lsh", "simhash"}
    assert set(oracles) <= set(qs)
