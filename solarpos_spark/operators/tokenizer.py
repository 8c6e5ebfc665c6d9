"""Deterministic WordPiece tokenization as relational operators.

Real subword counts for token-budget curation (mixture_sample /
sequence_pack run on estimates today; training pipelines budget in real
tokenizer tokens). Three stages, all JVM-side — no Python in any path:

* :func:`wordpiece_fit` — frequency-based vocabulary: every substring
  piece of every distinct word (word-initial pieces bare, continuations
  ``##``-prefixed, the BERT convention), weighted by word frequency;
  top-``vocab_size`` by (count desc, piece asc) plus a single-character
  fallback alphabet so normalized words always tokenize.
* :func:`wordpiece_word_tokens` — greedy longest-match-first segmentation
  (the published WordPiece inference rule) computed WITHOUT per-row
  iteration: the greedy step function ``f(pos) = pos + longest vocab
  match at pos`` is materialized as a relation over (word, pos) —
  substring-candidate explode, broadcast vocab equi-join, max(l) per
  position — and the greedy PATH LENGTH from position 0 is evaluated by
  pointer doubling (functional-graph squaring): ceil(log2(max_word_chars))
  self-joins compose f into f^(2^k), an absorbing state at len stops step
  accumulation, so every word's token count lands in O(log L) shuffles
  regardless of its piece count. Words longer than ``max_word_chars``
  are [UNK] (1 token), mirroring BERT's max_input_chars_per_word guard;
  a word whose greedy path hits an unmatched position is [UNK] too
  (only possible when the char fallback is disabled).
* :func:`wordpiece_counts` — per-document totals. The segmentation work
  runs on DISTINCT words only (vocabulary-sized, not corpus-sized); the
  corpus-sized work is one explode + one equi-join + one per-doc
  aggregate.

100 TB shape: distinct words ≪ corpus occurrences, so the candidate
explode and the O(log L) squaring joins touch a relation bounded by the
corpus vocabulary (each word contributing ≤ L·P candidate rows and ≤ L+1
path rows); the per-doc pass is one shuffle on word (join) and one on
doc_id (sum). The vocab relation (≤ vocab_size + 2·36 rows) is always
broadcast. No reference counterpart (klausbrunner/solarpos has no text
surface); the algorithm is the public WordPiece inference rule.
"""

from __future__ import annotations

import string

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Fallback alphabet guaranteeing every normalized word tokenizes.
_CHARS = tuple(string.ascii_lowercase + string.digits)


def _norm_words(df: DataFrame, text_col: str,
                id_col: str | None) -> DataFrame:
    """(id?, word) rows: lowercase, non-[a-z0-9] runs become separators."""
    w = F.explode(
        F.split(F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                        "[^a-z0-9]+", " ")), " ")
    ).alias("word")
    cols = [w] if id_col is None else [F.col(id_col), w]
    return df.select(*cols).filter(F.col("word") != "")


def _piece_candidates(words: DataFrame, max_piece_chars: int) -> DataFrame:
    """Explode every (pos, len) substring piece of `word` (+ carried cols).

    pos 0 pieces are bare, pos>0 pieces are '##'-prefixed. The sequence()
    arrays are built from the word column directly (argument position —
    no lambda references an outer projection, so the CollapseProject/
    lambda-CSE trap does not apply)."""
    return (
        words
        .withColumn("i", F.explode(F.sequence(
            F.lit(0), F.length("word") - 1)))
        .withColumn("l", F.explode(F.sequence(
            F.lit(1), F.least(F.lit(max_piece_chars),
                              F.length("word") - F.col("i")))))
        .withColumn("piece", F.when(
            F.col("i") == 0, F.expr("substring(word, 1, l)"))
            .otherwise(F.concat(F.lit("##"),
                                F.expr("substring(word, i + 1, l)"))))
    )


def char_fallback_vocab(spark: SparkSession) -> DataFrame:
    """The 72-row single-character piece relation ([a-z0-9] + ## forms)."""
    rows = [(c,) for c in _CHARS] + [("##" + c,) for c in _CHARS]
    return spark.createDataFrame(rows, "piece string")


def wordpiece_fit(
    df: DataFrame,
    *,
    text_col: str = "text",
    vocab_size: int = 256,
    max_piece_chars: int = 8,
    max_word_chars: int = 16,
    char_fallback: bool = True,
) -> DataFrame:
    """Fit a deterministic WordPiece vocabulary: (piece) relation.

    Pieces are ranked by total occurrence weight (each occurrence of a
    word contributes every one of its substrings once) with (cnt desc,
    piece asc) total order — the top-k plans as TakeOrderedAndProject,
    never a global sort. Words longer than ``max_word_chars`` are
    excluded (they are [UNK] at inference, their substrings would only
    dilute the budget)."""
    spark = df.sparkSession
    words = (
        _norm_words(df.select(text_col), text_col, None)
        .filter(F.length("word") <= max_word_chars)
        .groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    )
    top = (
        _piece_candidates(words, max_piece_chars)
        .groupBy("piece").agg(F.sum("c").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("piece").asc())
        .limit(int(vocab_size))
        .select("piece")
    )
    if not char_fallback:
        return top
    return top.union(char_fallback_vocab(spark)).distinct()


def wordpiece_word_tokens(
    words: DataFrame,
    vocab: DataFrame,
    *,
    max_piece_chars: int = 8,
    max_word_chars: int = 16,
) -> DataFrame:
    """Greedy longest-match piece count per DISTINCT word.

    Input: a `word` column (distinct). Output (word, n_pieces, is_unk):
    the number of WordPiece tokens the word segments into, or (1, true)
    for [UNK] words (overlong, or greedy path hits an unmatched position).

    The greedy recurrence is evaluated by functional-graph squaring:
    G_1 = f (one greedy hop), G_{2k} = G_k ∘ G_k; after
    ceil(log2(max_word_chars)) rounds G covers ≥ max_word_chars hops and
    every path has reached the absorbing end-of-word state, where steps
    stop accumulating. One row per (word, pos) at every round."""
    words = words.select("word").filter(F.length("word") > 0).distinct()
    overlong = (
        words.filter(F.length("word") > max_word_chars)
        .select("word", F.lit(1).cast("long").alias("n_pieces"),
                F.lit(True).alias("is_unk"))
    )
    w = words.filter(F.length("word") <= max_word_chars)
    pos = w.withColumn("i", F.explode(F.sequence(
        F.lit(0), F.length("word") - 1)))
    matched = (
        _piece_candidates(w, max_piece_chars)
        .join(F.broadcast(vocab.select("piece")), "piece")
        .groupBy("word", "i").agg(F.max("l").alias("adv"))
    )
    # f: one greedy hop per position; unmatched positions absorb to len
    # with unk; the end-of-word state self-loops with step 0.
    f = (
        pos.join(matched, ["word", "i"], "left")
        .select(
            "word", F.col("i").alias("pos"),
            F.when(F.col("adv").isNull(), F.length("word"))
             .otherwise(F.col("i") + F.col("adv")).alias("nxt"),
            F.when(F.col("adv").isNull(), F.lit(0))
             .otherwise(F.lit(1)).cast("long").alias("step"),
            F.col("adv").isNull().alias("unk"))
        .union(w.select(
            "word", F.length("word").cast("int").alias("pos"),
            F.length("word").cast("int").alias("nxt"),
            F.lit(0).cast("long").alias("step"),
            F.lit(False).alias("unk")))
    )
    rounds = max(1, (max_word_chars - 1).bit_length())  # 2^rounds >= L
    # Each squaring references g TWICE: localCheckpoint per round keeps the
    # plan O(1) instead of 2^rounds copies of the candidate-explode subtree
    # (the same doubling the CC pointer-jumping loop guards against), and
    # sidesteps Spark 4.1's union-self-join dedup hazard. The relation is
    # distinct-word-sized — the checkpoint is cheap at any corpus scale.
    g = f.localCheckpoint(eager=True)
    for _ in range(rounds):
        rhs = g.select(F.col("word").alias("w2"), F.col("pos").alias("p2"),
                       F.col("nxt").alias("n2"), F.col("step").alias("s2"),
                       F.col("unk").alias("u2"))
        g = (g.join(rhs, (g["word"] == rhs["w2"]) & (g["nxt"] == rhs["p2"]))
             .select("word", "pos", F.col("n2").alias("nxt"),
                     (F.col("step") + F.col("s2")).alias("step"),
                     (F.col("unk") | F.col("u2")).alias("unk"))
             .localCheckpoint(eager=True))
    done = (
        g.filter(F.col("pos") == 0)
        .select("word",
                F.when(F.col("unk"), F.lit(1).cast("long"))
                 .otherwise(F.col("step")).alias("n_pieces"),
                F.col("unk").alias("is_unk"))
    )
    return done.union(overlong)


def wordpiece_counts(
    df: DataFrame,
    vocab: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_piece_chars: int = 8,
    max_word_chars: int = 16,
) -> DataFrame:
    """Per-document real subword totals:
    (id, n_words, n_wp_tokens, n_unk_words).

    Documents whose text normalizes to zero words keep a row of zeros
    (left join from the input ids) — empty docs must not vanish from a
    token-budget ledger."""
    occ = _norm_words(df, text_col, id_col)
    per_word = wordpiece_word_tokens(
        occ.select("word"), vocab,
        max_piece_chars=max_piece_chars, max_word_chars=max_word_chars)
    per_doc = (
        occ.join(per_word, "word")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_words"),
             F.sum("n_pieces").alias("n_wp_tokens"),
             F.sum(F.col("is_unk").cast("long")).alias("n_unk_words"))
    )
    return (
        df.select(id_col).join(per_doc, id_col, "left")
        .select(id_col,
                F.coalesce("n_words", F.lit(0)).cast("long")
                 .alias("n_words"),
                F.coalesce("n_wp_tokens", F.lit(0)).cast("long")
                 .alias("n_wp_tokens"),
                F.coalesce("n_unk_words", F.lit(0)).cast("long")
                 .alias("n_unk_words"))
    )


# --------------------------------------------------------------------------
# BPE merge training (Sennrich, Haddow & Birch 2016, ACL — "Neural Machine
# Translation of Rare Words with Subword Units"), fully relational.

_W = "_bpe_w"  # per-word event-order window alias (documentation only)


def bpe_init_symbols(words: DataFrame) -> DataFrame:
    """(word, freq, pos, sym): each distinct word split into single
    characters + the ``</w>`` end-of-word marker (the original
    algorithm's word-boundary symbol, so merges can learn suffixes)."""
    n = F.length("word")
    sym = F.when(F.col("pos") <= n,
                 F.substring(F.col("word"), F.col("pos"), 1)) \
        .otherwise(F.lit("</w>"))
    return (words
            .select("word", "freq",
                    F.explode(F.sequence(F.lit(1), n + 1)).alias("pos"))
            .withColumn("sym", sym))


def _bpe_round(symbols: DataFrame, t: int) -> tuple[DataFrame, DataFrame]:
    """One merge round: choose the max-frequency adjacent pair
    (count desc, pair lexicographic tiebreak — Sennrich's get_stats with
    a deterministic argmax) and rewrite leftmost-first non-overlapping
    occurrences. Returns (next symbols, the 1-row choice relation).

    Overlap semantics: pairs of two DIFFERENT symbols cannot overlap;
    for x==x runs ("aaa"), occurrences merge at even offsets within each
    maximal run (leftmost-first), computed with ONE per-word window pass
    via gaps-and-islands (running max of run-start row numbers — no
    second exchange). The whole round is window + aggregate + broadcast
    join; all counts integer, all orders total, so a SQL oracle replays
    the training bit-for-bit.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("word").orderBy("pos")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o = (symbols
         .withColumn("nxt", F.lead("sym").over(w))
         .withColumn("prev", F.lag("sym").over(w))
         .withColumn("rn", F.row_number().over(w)))
    pairs = (o.filter(F.col("nxt").isNotNull())
             .groupBy("sym", "nxt")
             .agg(F.sum("freq").alias("cnt")))
    choice = (pairs
              .orderBy(F.col("cnt").desc(), F.col("sym").asc(),
                       F.col("nxt").asc())
              .limit(1)
              .select(F.col("sym").alias("_x"), F.col("nxt").alias("_y"),
                      F.col("cnt").alias("_cnt"),
                      F.lit(1).alias("_j")))
    j = (o.withColumn("_j", F.lit(1))
         .join(F.broadcast(choice), "_j", "left"))
    is_x = F.col("sym") == F.col("_x")
    start_rn = F.when(
        is_x & (F.col("prev").isNull() | (F.col("prev") != F.col("_x"))),
        F.col("rn"))
    j = j.withColumn("_first", F.max(start_rn).over(run)) \
         .withColumn("_off", F.col("rn") - F.col("_first"))
    same = F.col("_x") == F.col("_y")
    mer = F.when(
        same, is_x & (F.col("nxt") == F.col("_x"))
        & (F.col("_off") % 2 == 0)
    ).otherwise((F.col("sym") == F.col("_x"))
                & (F.col("nxt") == F.col("_y")))
    dele = F.when(
        same, is_x & (F.col("_off") % 2 == 1)
    ).otherwise((F.col("sym") == F.col("_y"))
                & (F.col("prev") == F.col("_x")))
    # a dry round (no pairs left -> empty choice, _x null) is a no-op
    mer = F.col("_x").isNotNull() & F.coalesce(mer, F.lit(False))
    dele = F.col("_x").isNotNull() & F.coalesce(dele, F.lit(False))
    nxt_syms = (j.filter(~dele)
                .select("word", "freq", "pos",
                        F.when(mer, F.concat("sym", "nxt"))
                        .otherwise(F.col("sym")).alias("sym")))
    return nxt_syms, choice.select(
        F.lit(t).alias("round"), F.col("_x").alias("left_sym"),
        F.col("_y").alias("right_sym"),
        F.col("_cnt").cast("long").alias("pair_count"))


def bpe_fit(
    docs: DataFrame,
    *,
    merges: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Train a BPE merge table over the corpus word histogram — the
    companion FIT stage to :func:`wordpiece_fit` (which learns a vocab
    by substring frequency; BPE learns an ordered MERGE LIST, the GPT-2
    tokenizer-training algorithm).

    Scale shape: the corpus-sized work is ONE word-count aggregate; the
    iterative training runs on the symbol relation, bounded by
    Σ(|word|+1) over DISTINCT words — vocabulary-sized, not
    corpus-sized. Each round is one per-word window pass + one pair
    aggregate + one broadcast of the 1-row argmax (joined relationally —
    NO driver collect anywhere), localCheckpoint'ed so lineage stays
    O(1) in rounds (the CC/perceptron loop discipline). A fixed round
    count keeps the job graph and the unrolled oracle finite; rounds
    after the pair space dries are no-ops.

    Determinism: integer pair counts, total argmax order (count desc,
    pair lexicographic), total rewrite order (per-word pos), islands-
    parity for overlapping same-symbol runs — the SQL oracle re-derives
    the FULL training.

    Output: (round, left_sym, right_sym, pair_count), round 1..merges —
    the ordered merge table that IS the trained tokenizer artifact.
    """
    merges_df, _ = _bpe_train(
        _norm_words(docs, text_col, None)
        .groupBy("word").agg(F.count("*").alias("freq")),
        merges)
    return merges_df


def _bpe_train(words: DataFrame,
               merges: int) -> tuple[DataFrame, DataFrame]:
    """Run the merge loop; returns (merge table, final symbol state).
    The final state is the trained segmentation of every histogram word
    — reusing it makes same-corpus token counting free of a second
    apply pass."""
    syms = bpe_init_symbols(words).localCheckpoint(eager=True)
    out: DataFrame | None = None
    for t in range(1, merges + 1):
        syms2, round_row = _bpe_round(syms, t)
        syms = syms2.localCheckpoint(eager=True)
        # round_row is NOT checkpointed: it derives only from the round's
        # checkpointed INPUT state, so lineage depth stays O(1) without it
        # and the per-round eager job (a full pair re-aggregate each
        # round, ~1/3 of the training jobs) disappears; the final union
        # evaluates all per-round argmax subtrees concurrently in ONE job
        # (guide §2.6: overlap independent work instead of serializing).
        out = round_row if out is None else out.unionByName(round_row)
    assert out is not None
    return out, syms


def bpe_token_counts(
    docs: DataFrame,
    *,
    merges: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document REAL BPE token counts — train the merge table on the
    corpus word histogram, segment every distinct word (the training
    loop's final symbol state IS that segmentation), then join counts
    back to per-doc occurrences: the wordpiece_counts surface with the
    GPT-2-family algorithm, for token-budget curation in true target
    tokens.

    Scale shape: training is vocabulary-sized (bpe_fit); the corpus-
    sized work is one occurrence explode + one broadcast-able join on
    word + one per-doc sum — identical to wordpiece_counts.

    Output: (id_col, n_words, n_bpe_tokens).
    """
    words = _norm_words(docs, text_col, None) \
        .groupBy("word").agg(F.count("*").alias("freq"))
    _, final_syms = _bpe_train(words, merges)
    per_word = final_syms.groupBy("word").agg(
        F.count("*").alias("_tok"))
    occ = _norm_words(docs, text_col, id_col)
    return (occ.join(per_word, "word")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_words"),
                 F.sum("_tok").cast("long").alias("n_bpe_tokens")))
