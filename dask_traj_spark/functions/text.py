"""Text-analysis functions for large-scale corpus pipelines.

Beyond-reference capability block (the reference is a trajectory
engine; a 100 TB training-data pipeline needs the same engine to
score/filter/fingerprint text): tokenization, document statistics,
quality scoring, language-ID scoring, and content fingerprinting —
all as JVM-side column expressions (zero Python in the hot path,
whole-stage codegen end to end).

Determinism rules (the DuckDB oracle hash-compares values):

- counts and ratios are integer arithmetic followed by one double
  division — correctly rounded, engine-independent;
- the fingerprint is an order-independent BIGINT sum of bounded
  positional terms — exact;
- token ids come from a sorted global vocabulary (dense ranks over
  ORDER BY word), identical in any engine.

Scale notes: the vocab dense-rank is a single-partition window —
fine for bounded vocabularies (real corpora: hash the token instead;
``token_id_hashed`` provides that path). Everything else is
groupBy/join on doc_id — shuffle partial-agg friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

#: fixed marker (function-word) lists per language for the n-gram /
#: stopword language-ID heuristic. Deterministic constants — part of
#: the function's definition, mirrored verbatim in the SQL oracle.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist"),
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "los", "una", "y", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("de", "shi", "he", "zai", "le"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "is", "to", "in")

#: positional weights for the rolling fingerprint: 31^(pos % 8).
FP_WEIGHTS: tuple[int, ...] = tuple(31 ** i for i in range(8))
FP_MOD = 1_000_000_007


def spread_for_expansion(df: DataFrame, key: str = "doc_id") -> DataFrame:
    """Hash-spread a narrow input across the cluster before a
    row-multiplying expansion (bigram/shingle/n-gram explode), IF the
    scan produced fewer partitions than the configured shuffle width.

    Why: an explode multiplies each document into O(|text|) rows, and
    everything up to the first exchange runs with the SCAN's
    parallelism.  A sub-``maxPartitionBytes`` single-file input scans
    as ONE task, serializing the most expensive stage of the whole
    query on one core.  Hash-repartitioning the compact (id, text)
    rows first costs a shuffle of the small input and buys full-width
    execution of the expansion + partial aggregation.

    100-TB posture: at scale the scan already yields far more
    partitions than ``spark.sql.shuffle.partitions`` and this returns
    the input UNCHANGED — no shuffle is added on the path where the
    shuffle would hurt.  Partitioning is BY THE KEY (deterministic
    hash), never round-robin, so retried tasks repartition
    identically and downstream per-key aggregates stay exact.
    """
    if df.isStreaming:  # .rdd is illegal on unbounded plans; a
        return df  # micro-batch's partitioning is the source's anyway
    spark = df.sparkSession
    try:
        width = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except ValueError:  # "auto" under some AQE configs
        width = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= width:
        return df
    return df.repartition(width, F.col(key))


def tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    spread: bool = True,
) -> DataFrame:
    """(id, pos, word) — whitespace tokenization with positions.

    Input is spread (``spread_for_expansion``) so the explode and the
    consumer's partial aggregation run at full width even when the
    scan is a single small file; a no-op at production scale.

    ``spread=False`` opts out: for consumers whose downstream is one
    cheap map-side-collapsing aggregate (fingerprint's per-doc mod-sum,
    DSIR's bounded bucket counts), the pre-explode shuffle of the
    (id, text) rows costs more than the bought width even locally —
    measured r12: t4 0.71×, t17 0.50× of their pre-spread times —
    while the heavy consumers (self-joins, minhash signature
    aggregation, n-gram windows) keep the default (VERDICT r12
    item 3).  At production partition counts both settings are
    identical (the spread is a no-op when the scan is already wide)."""
    base = df.select(id_col, text_col)
    if spread:
        base = spread_for_expansion(base, id_col)
    return base.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"),
    )


def vocab(tok: DataFrame) -> DataFrame:
    """Global sorted vocabulary with dense int ids (1-based).

    Single-partition window — bounded-vocab path; see module
    docstring for the hashed alternative at open-vocabulary scale.
    """
    return (
        tok.select("word")
        .distinct()
        .select(
            "word",
            F.row_number().over(Window.orderBy("word")).alias("tid"),
        )
    )


def token_id_hashed(word: Column, bits: int = 31) -> Column:
    """Open-vocabulary token id: xxhash64 → non-negative int. The
    DEFAULT id path for every dedup/fingerprint operator — no global
    window, embarrassingly parallel at any corpus size. NOT
    oracle-portable (DuckDB has no xxhash64); the oracle-gated query
    wrappers pass ``id_mode='sorted'`` to get DuckDB-reproducible
    dense-rank ids instead."""
    return F.pmod(F.xxhash64(word), F.lit(2 ** bits)).cast("long")


def _n_tokens(text: Column) -> Column:
    # single-space-joined corpus: tokens = spaces + 1 (exact ints)
    return F.length(text) - F.length(F.replace(text, F.lit(" "), F.lit(""))) + 1


def doc_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document statistics: token/char counts, distinct tokens,
    mean token length. All integer counts + one double division."""
    t = F.col(text_col)
    n_tok = _n_tokens(t)
    toks = F.split(t, " ")
    return df.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        ((F.length(t) - (n_tok - 1)).cast("double") / n_tok.cast("double")).alias(
            "mean_token_len"
        ),
    )


def _quality_parts(text_col: str) -> tuple[Column, Column, Column]:
    """(stopword_ratio, length_score, distinct_ratio) column
    expressions — the shared building blocks of ``quality_score``
    and ``quality_expr`` (one definition, so the t2 gate and every
    downstream consumer stay bit-identical by construction)."""
    t = F.col(text_col)
    n_tok = _n_tokens(t).cast("double")
    toks = F.split(t, " ")
    stop_hits = F.size(
        F.filter(toks, lambda w: w.isin(*STOPWORDS))
    ).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    length_score = F.least(n_tok, F.lit(50.0)) / F.lit(50.0)
    return stop_hits / n_tok, length_score, n_distinct / n_tok


def quality_expr(text_col: str = "text") -> Column:
    """The t2 quality score as a single column expression, for
    consumers that need it fused into their own projection (e.g.
    c8's per-stratum pruning) instead of a doc_id join against
    ``quality_score``'s output."""
    stop_ratio, length_score, distinct_ratio = _quality_parts(text_col)
    return (stop_ratio + length_score + distinct_ratio) / F.lit(3.0)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1]:
    (stopword_ratio + length_score + distinct_ratio) / 3, where
    length_score = min(n_tokens, 50)/50 and distinct_ratio =
    n_distinct/n_tokens. Deterministic rational arithmetic."""
    stop_ratio, length_score, distinct_ratio = _quality_parts(text_col)
    score = (stop_ratio + length_score + distinct_ratio) / F.lit(3.0)
    return df.select(
        "doc_id",
        stop_ratio.alias("stopword_ratio"),
        length_score.alias("length_score"),
        distinct_ratio.alias("distinct_ratio"),
        score.alias("quality"),
    )


def langid_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language scores + argmax prediction (lexicographic
    tie-break). An n-gram/stopword-family heuristic: score_l =
    |tokens ∩ markers_l| / n_tokens."""
    t = F.col(text_col)
    n_tok = _n_tokens(t).cast("double")
    toks = F.split(t, " ")
    cols = []
    for lang in sorted(LANG_MARKERS):
        hits = F.size(F.filter(toks, lambda w: w.isin(*LANG_MARKERS[lang])))
        cols.append((hits.cast("double") / n_tok).alias(f"score_{lang}"))
    out = df.select("doc_id", *cols)
    # argmax with lexicographic tie-break: max over (score, reversed
    # lang ordering) structs → greatest score, smallest lang on ties
    langs = sorted(LANG_MARKERS)
    best = F.greatest(
        *[
            F.struct(
                F.col(f"score_{lang}").alias("s"),
                F.lit(len(langs) - i).alias("prio"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    return out.select("doc_id", *[f"score_{lang}" for lang in langs],
                      best["lang"].alias("pred_lang"))


def fingerprint(
    df: DataFrame, text_col: str = "text", id_mode: str = "hashed"
) -> DataFrame:
    """Order-independent rolling document fingerprint:
    sum over positions of (tid+1) * 31^(pos % 8) mod 1e9+7.

    ``id_mode='hashed'`` (default): tid = xxhash64 token id — no
    global window, the 100 TB path. ``id_mode='sorted'``: tid from the
    sorted-vocab dense rank — single-partition window, but
    reproducible in any SQL engine; used by the oracle-gated wrapper.

    All modular products are fully reduced before multiplying, so
    every intermediate fits BIGINT for either id width:
    ((tid+1) mod M) * (w mod M) < (1e9+7)^2 ≈ 1.0e18 < 2^63.

    ``spread=False``: the whole downstream is one per-doc partial+
    final aggregate (map-side collapse), so the spread shuffle buys
    nothing it costs (see ``tokens``)."""
    tok = tokens(df, text_col, spread=False)
    if id_mode == "hashed":
        j = tok.select("doc_id", "pos", token_id_hashed(F.col("word")).alias("tid"))
    elif id_mode == "sorted":
        j = tok.join(F.broadcast(vocab(tok)), "word")
    else:
        raise ValueError(f"id_mode must be 'hashed' or 'sorted', got {id_mode!r}")
    w = F.element_at(
        F.array(*[F.lit(x % FP_MOD) for x in FP_WEIGHTS]),
        (F.col("pos") % 8 + 1).cast("int"),
    )
    term = (F.col("tid").cast("long") + 1) % FP_MOD * w % FP_MOD
    return j.groupBy("doc_id").agg((F.sum(term) % FP_MOD).alias("fp"))


#: dyadic grid for per-bigram log-probabilities: ln() is not
#: guaranteed correctly-rounded (engines may differ by 1 ulp), so the
#: model's log values are snapped to 2^-20 BEFORE any aggregation —
#: sums of grid values are exact, making the per-doc average
#: independent of partial-agg order (the same trick as the coords
#: QGRID, see queries.py docstring).
LP_GRID = 1048576.0  # 2^20


def char_bigram_logprob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Statistical quality score: per-document mean log-probability
    of its character bigrams under the corpus's own MLE bigram model
    (the model-based fluency filter pipelines run when a trained LM
    is unavailable — gibberish and off-distribution text score far
    below the corpus mode).

    Two aggregations: (1) the corpus model — bigram counts and
    first-char totals, at most |alphabet|² rows, broadcast; (2) the
    per-doc average over quantized log-probs. Bigrams are
    substring(i, 2) over a JVM-side ``transform(sequence(...))`` —
    no Python, no explode of a Python UDF.

    Returns (doc_id, n_bigrams, avg_logprob).

    Plan shape: ONE explode feeding ONE (doc_id, bg) partial+final
    count; both the corpus model and the per-doc score derive from
    that table (the model by a second tiny aggregation, the score by
    a broadcast join weighted by the per-doc count), so the exchange
    on (doc_id, bg) is planned once and reused — the explode's
    O(total characters) output is shuffled and scanned a single
    time.  Weighting by the integer count k instead of summing k
    copies of lp is exact: lp is snapped to the 2^-20 grid, so k·lp
    and every partial sum are dyadic rationals well inside double
    precision — bit-identical to the row-at-a-time sum in any
    grouping/order.
    """
    # Guard length < 2: Spark's sequence(1, 0) yields a DESCENDING
    # [1, 0], which would emit spurious 1-char "bigram" rows, while
    # the oracle's generate_series(1, 0) is empty (ADVICE r4) — the
    # empty-array branch makes both engines drop short docs alike.
    bigrams = spread_for_expansion(df.select("doc_id", text_col)).select(
        "doc_id",
        F.explode(
            F.expr(
                f"CASE WHEN length({text_col}) >= 2 THEN "
                f"transform(sequence(1, length({text_col})-1), "
                f"i -> substring({text_col}, i, 2)) "
                f"ELSE array() END"
            )
        ).alias("bg"),
    )
    doc_bg = bigrams.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("k"))
    counts = doc_bg.groupBy("bg").agg(F.sum("k").alias("n_bg"))
    c1_tot = counts.groupBy(F.substring("bg", 1, 1).alias("c1")).agg(
        F.sum("n_bg").alias("n_c1")
    )
    model = F.broadcast(
        counts.join(c1_tot, F.substring("bg", 1, 1) == F.col("c1"))
        .select(
            "bg",
            (
                F.round(
                    F.log(F.col("n_bg").cast("double") / F.col("n_c1").cast("double"))
                    * F.lit(LP_GRID),
                    0,
                )
                / F.lit(LP_GRID)
            ).alias("lp"),
        )
    )
    return (
        doc_bg.join(model, "bg")
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.round(
                F.sum(F.col("lp") * F.col("k")) / F.sum("k"), 6
            ).alias("avg_logprob"),
        )
    )


# --------------------------------------------------------------- PII
#: detection patterns shared with the SQL oracle — intersection of
#: Java-regex (Spark) and RE2 (DuckDB) syntax: explicit character
#: classes only, no lookaround, no backreferences, so both engines
#: produce identical non-overlapping leftmost matches.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[A-Za-z0-9._/%-]+",
    "phone": r"[0-9]{3}-[0-9]{3}-[0-9]{4}",
}


def pii_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII detection + scrubbing → (doc_id, n_emails,
    n_urls, n_phones, redacted_len, pii_flag).

    ``redacted_len`` is the length after replacing every email, then
    every URL, then every phone with fixed tokens — the order is part
    of the function's definition (mirrored in the oracle) because a
    redaction token could otherwise feed a later pattern.

    All JVM column expressions (``regexp_count``/``regexp_replace``
    stay inside whole-stage codegen); one narrow projection, no
    shuffle — at 100 TB this is a map-only scrub pass that fuses
    with the scan.
    """
    t = F.col(text_col)
    red = t
    for kind, tok in (("email", "<EMAIL>"), ("url", "<URL>"), ("phone", "<PHONE>")):
        red = F.regexp_replace(red, F.lit(PII_PATTERNS[kind]), F.lit(tok))
    n = lambda k: F.regexp_count(t, F.lit(PII_PATTERNS[k]))  # noqa: E731
    counts = {k: n(k) for k in ("email", "url", "phone")}
    return df.select(
        "doc_id",
        counts["email"].cast("long").alias("n_emails"),
        counts["url"].cast("long").alias("n_urls"),
        counts["phone"].cast("long").alias("n_phones"),
        F.length(red).cast("long").alias("redacted_len"),
        (
            (counts["email"] + counts["url"] + counts["phone"]) > 0
        ).cast("long").alias("pii_flag"),
    )


def lexical_diversity(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document lexical-diversity statistics → (doc_id, n_tokens,
    n_types, n_hapax, ttr, hapax_ratio): type-token ratio and
    hapax-legomenon share — the classic boilerplate/repetition
    signals that complement ``quality_score`` (a templated or
    keyword-stuffed document has low TTR; natural prose keeps a
    large hapax share).

    One tokenize → per-(doc, word) count → per-doc aggregate: two
    partial+final aggregations keyed on (doc_id, word) then doc_id —
    shuffle-friendly at any corpus size, no windows, no vocabulary
    state.  Counts are exact integers; the two ratios are one
    correctly-rounded division each (engine-independent)."""
    tok = tokens(df, text_col=text_col)
    per_word = tok.groupBy("doc_id", "word").agg(
        F.count(F.lit(1)).alias("n")
    )
    agg = per_word.groupBy("doc_id").agg(
        F.sum("n").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum((F.col("n") == 1).cast("long")).alias("n_hapax"),
    )
    return agg.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        F.col("n_hapax").cast("long").alias("n_hapax"),
        (
            F.col("n_types").cast("double") / F.col("n_tokens").cast("double")
        ).alias("ttr"),
        (
            F.col("n_hapax").cast("double") / F.col("n_tokens").cast("double")
        ).alias("hapax_ratio"),
    )


#: log-prob floor for bigrams unseen in the training slice — a dyadic
#: constant (exact in f64) mirrored verbatim in the oracle
OOV_LOGPROB = -20.0


def char_bigram_crossscore(
    df: DataFrame, train_source: str, text_col: str = "text"
) -> DataFrame:
    """Domain-shift scoring: train the MLE character-bigram model on
    ONE source slice, score EVERY document under it → (doc_id,
    source, n_bigrams, n_oov, avg_logprob).  In-domain documents
    score near the training-corpus mode; off-distribution sources
    score lower and accumulate out-of-vocabulary bigrams (floored at
    ``OOV_LOGPROB``) — the cross-corpus filter used to detect
    contamination or domain drift without a trained LM.

    Same two-aggregation shape as ``char_bigram_logprob`` (the model
    is ≤|alphabet|² rows, broadcast; scoring is one partial+final
    agg), with a LEFT join so unseen bigrams survive to the floor
    term instead of dropping out."""
    t_all = df.select("doc_id", "source", F.col(text_col).alias("text"))
    # same length-<2 guard as char_bigram_logprob (ADVICE r4): an
    # empty array, not a descending sequence, for 0/1-char docs
    bigrams = t_all.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "CASE WHEN length(text) >= 2 THEN "
                "transform(sequence(1, length(text)-1), "
                "i -> substring(text, i, 2)) "
                "ELSE array() END"
            )
        ).alias("bg"),
    )
    train = bigrams.where(F.col("source") == train_source)
    counts = train.groupBy("bg").agg(F.count(F.lit(1)).alias("n_bg"))
    c1_tot = counts.groupBy(F.substring("bg", 1, 1).alias("c1")).agg(
        F.sum("n_bg").alias("n_c1")
    )
    model = F.broadcast(
        counts.join(c1_tot, F.substring("bg", 1, 1) == F.col("c1")).select(
            "bg",
            (
                F.round(
                    F.log(F.col("n_bg").cast("double") / F.col("n_c1").cast("double"))
                    * F.lit(LP_GRID),
                    0,
                )
                / F.lit(LP_GRID)
            ).alias("lp"),
        )
    )
    scored = bigrams.join(model, "bg", "left")
    lp = F.coalesce(F.col("lp"), F.lit(OOV_LOGPROB))
    return scored.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.col("lp").isNull().cast("long")).alias("n_oov"),
        F.round(F.sum(lp) / F.count(F.lit(1)), 6).alias("avg_logprob"),
    )


#: classic UTF-8-read-as-cp1252 mojibake artifacts → intended char.
#: Keys/values are shared verbatim with the SQL oracle (the gate
#: generates both sides from this table), and every sequence is
#: printable BMP text so character counting agrees across engines.
MOJIBAKE_MAP: dict[str, str] = {
    "Ã©": "é",   # Ã©  → é
    "Ã¨": "è",   # Ã¨  → è
    "Ã¼": "ü",   # Ã¼  → ü
    "Ã±": "ñ",   # Ã±  → ñ
    "â€™": "'",  # â€™ → '
    "â€œ": '"',  # â€œ → "
    "Â°": "°",   # Â°  → °
}


def mojibake_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Encoding-damage detection + repair → (doc_id, n_artifacts,
    flagged, n_chars, n_chars_repaired): count classic
    UTF-8-decoded-as-cp1252 sequences (``MOJIBAKE_MAP``), flag
    affected documents, and report the repaired length — the
    data-cleaning pass that catches double-encoded web text before
    it poisons a training corpus.

    Counting is EXACT and regex-free: occurrences of artifact ``k``
    = (length(text) − length(replace(text, k, ''))) / length(k) —
    integer arithmetic any engine reproduces bit-identically.
    Repair is the chained replace in map order.

    100-TB posture: pure JVM string expressions in one codegen'd
    projection — no Python, no shuffle."""
    t = F.col(text_col)
    counts = []
    repaired = t
    for k in MOJIBAKE_MAP:
        counts.append(
            (F.length(t) - F.length(F.replace(t, F.lit(k), F.lit(""))))
            / F.lit(len(k))
        )
        repaired = F.replace(repaired, F.lit(k), F.lit(MOJIBAKE_MAP[k]))
    n_art = sum(counts[1:], counts[0]).cast("long")
    return df.select(
        "doc_id",
        n_art.alias("n_artifacts"),
        (n_art > 0).cast("long").alias("flagged"),
        F.length(t).cast("long").alias("n_chars"),
        F.length(repaired).cast("long").alias("n_chars_repaired"),
    )


#: count-min geometry: depth rows (independent seeded hashes) ×
#: width cells.  The cell table is depth·width rows REGARDLESS of
#: vocabulary size — that bound is the whole point of the sketch.
CMS_DEPTH = 4
CMS_WIDTH = 1024


#: per-row multiplicative mixers for the oracle-portable 'mult'
#: hash mode (public Knuth/xxhash/murmur multipliers)
CMS_MIX = (2654435761, 2246822519, 3266489917, 668265263)


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    idf: str = "ratio",
) -> DataFrame:
    """Top-``k`` most distinctive terms per document by tf-idf —
    the classic curation/analytics primitive (what does this doc
    talk about that the corpus doesn't?).

    Scored with the RAW-RATIO idf variant, score = tf · N / df,
    deliberately instead of tf · ln(N/df): tf·N is an exact int64
    and one correctly-rounded IEEE division makes the ranking key
    bit-identical across engines (the module discipline), whereas
    ln() ties the result to libm ulp behavior.  ln is monotonic but
    tf·ln(N/df) is NOT order-equivalent to tf·N/df across terms, so
    the emitted score column names the variant.  Ties break on the
    term itself.

    ``idf="ln"`` switches to the textbook score tf · ln(N/df) for
    users expecting standard tf-idf values (score column
    ``tfidf_ln_q6``); the raw-ratio form stays the oracle-gated
    default because the two rankings differ and only the ratio form
    is engine-portable bit-for-bit.  Note ln(N/df) = 0 when a term
    appears in every document, so ubiquitous terms rank by tie-break
    alone under "ln" — the standard behavior.

    Plan (100-TB posture): two partial-agg shuffles (term frequency
    per doc, document frequency per term), one shuffle join on the
    term key (vocabulary-sized — too big to broadcast at corpus
    scale; AQE handles stop-word skew), a broadcast of the 1-row
    corpus count (its SinglePartition exchange carries one partial
    count per input partition, not data), and one window shuffle on
    the document key.  No collect, no UDF."""
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).where(F.col("word") != "")
    if idf not in ("ratio", "ln"):
        raise ValueError(f"idf must be 'ratio' or 'ln', got {idf!r}")
    tf = tok.groupBy(id_col, "word").agg(F.count("*").alias("tf"))
    dfreq = tok.groupBy("word").agg(F.count_distinct(id_col).alias("df"))
    n = df.agg(F.count("*").alias("n_docs"))
    if idf == "ratio":
        s = (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")
        score_alias = "tfidf_ratio_q6"
    else:
        s = F.col("tf").cast("double") * F.log(
            F.col("n_docs").cast("double") / F.col("df")
        )
        score_alias = "tfidf_ln_q6"
    w = Window.partitionBy(id_col).orderBy(F.col("s").desc(), "word")
    return (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(n))
        .withColumn("s", s)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            id_col,
            F.col("rank").cast("int").alias("rank"),
            F.col("word").alias("term"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round("s", 6).alias(score_alias),
        )
    )


def _cms_col(key, row, width: int, id_mode: str):
    if id_mode == "hashed":
        return F.pmod(F.xxhash64(key, row), F.lit(int(width)))
    mix = F.element_at(
        F.array(*[F.lit(int(m)) for m in CMS_MIX]), (row + 1).cast("int")
    )
    return ((key.cast("long") * mix) % F.lit(2 ** 32)) % F.lit(int(width))


def count_min_cells(
    df: DataFrame,
    text_col: str = "text",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    id_mode: str = "hashed",
    vocab_df: DataFrame | None = None,
) -> DataFrame:
    """Count-min sketch of the corpus token frequencies (Cormode &
    Muthukrishnan, public J. Algorithms 2005) → (row, col, n): each
    token increments cell (r, hash_r(token) mod width) for every
    depth row.  One explode + one bounded groupBy — the shuffle
    carries at most depth·width distinct keys, so frequency
    estimation over an unbounded vocabulary costs O(depth·width)
    state instead of a full-vocab groupBy.  Cells are associative
    (sums), so partial sketches merge — the same property that makes
    an incremental/streaming fold trivial."""
    tok = tokens(df, text_col).select("word")
    if id_mode == "mult":
        # oracle-portable mode: sorted-vocab tid × per-row mixer (the
        # d2/t4 playbook — xxhash64 has no DuckDB twin); production
        # default stays 'hashed' (no vocab window).  ``vocab_df``
        # overrides the vocabulary source — the streaming twin keys
        # each micro-batch against the corpus vocab, mirroring how
        # hashed keys are naturally batch-independent.
        tok = tok.join(
            F.broadcast(vocab_df if vocab_df is not None else vocab(tok)),
            "word",
        ).select(F.col("tid").alias("key"))
    elif id_mode == "hashed":
        tok = tok.select(F.col("word").alias("key"))
    else:
        raise ValueError(f"id_mode must be 'hashed' or 'mult', got {id_mode!r}")
    rows = tok.select(
        "key",
        F.explode(F.sequence(F.lit(0), F.lit(int(depth) - 1))).alias("row"),
    )
    cell = _cms_col(F.col("key"), F.col("row"), width, id_mode)
    return (
        rows.groupBy("row", cell.alias("col"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def count_min_estimate(
    cells: DataFrame,
    words: DataFrame,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    id_mode: str = "hashed",
    corpus: DataFrame | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Point-estimate token counts from a count-min sketch →
    (word, est): est = min over rows of the token's cell count.
    The sketch NEVER underestimates (every occurrence hashed into
    every row), and overestimates only by colliding mass — the
    deterministic half of the CMS guarantee, which the gate checks
    exactly.  ``words`` is the (small) query set, broadcast; in
    'mult' mode pass the corpus so the probe keys use the SAME
    sorted vocabulary the cells were built from."""
    if id_mode == "mult":
        if corpus is None:
            raise ValueError("'mult' mode needs the corpus for the vocab")
        v = vocab(tokens(corpus, text_col).select("word"))
        # LEFT join: a query word absent from the corpus vocabulary
        # has no tid, but its correct CMS estimate is 0 (it was never
        # inserted) — an inner join would drop it from the output
        # entirely, diverging from 'hashed' mode's behavior.  The
        # NULL key joins no cells below, so every probe row coalesces
        # to 0.
        keyed = words.join(F.broadcast(v), "word", "left").select(
            "word", F.col("tid").alias("key")
        )
    else:
        keyed = words.select("word", F.col("word").alias("key"))
    probes = keyed.select(
        "word",
        "key",
        F.explode(F.sequence(F.lit(0), F.lit(int(depth) - 1))).alias("row"),
    ).select(
        "word",
        "row",
        _cms_col(F.col("key"), F.col("row"), width, id_mode).alias("col"),
    )
    # LEFT join so absent (never-incremented) cells participate as 0:
    # an inner join would drop them from the min, giving a never-seen
    # word the colliding cells' mass (or no output row at all) instead
    # of the correct CMS estimate 0.  The cell table is depth·width
    # rows by construction — broadcast THAT side (left-outer streams
    # the preserved left, so the broadcast must be the right).
    return (
        probes.join(F.broadcast(cells), ["row", "col"], "left")
        .groupBy("word")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est"))
    )


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for a query string under BM25 (Robertson
    et al.) with the RAW-RATIO idf variant idf = N/df — same
    deliberate choice as :func:`tfidf_top_terms`: one correctly
    rounded IEEE division instead of a libm ln() keeps the score
    bit-identical across engines.  The retrieval primitive behind
    decontamination search and quality-by-query curation.

    score(d) = Σ_t (N/df_t) · tf·(k1+1) / (tf + k1·(1−b) + k1·b·dl·N/L)

    with dl the document token count and L the corpus token total
    (dl·N/L = dl/avgdl without an extra division).  Each per-term
    score is snapped to the 2^-20 dyadic grid BEFORE the per-doc
    sum, so the sum is exact and partial-aggregation-order
    independent (the ``char_bigram_logprob`` discipline).  The
    k1/b-derived constants are folded in Python once and embedded
    with full precision — the oracle embeds the identical reprs.

    Plan (100-TB posture): the explode is filtered to the query's
    terms in the same map stage (only matching tokens ever reach a
    shuffle); df is a query-sized broadcast; dl is a map-only
    projection (no second explode); N and L ride one broadcast
    1-row aggregate; the candidate set (docs containing ≥1 query
    term) aggregates on doc_id, and the final top-k is
    TakeOrderedAndProject — never a global sort materialization.
    No collect, no Python UDF."""
    terms = sorted({t for t in query.split(" ") if t})
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    if k1 <= 0 or not (0.0 <= b <= 1.0):
        raise ValueError(f"invalid BM25 parameters k1={k1}, b={b}")
    c_sat = k1 + 1.0
    c_fix = k1 * (1.0 - b)
    c_len = k1 * b
    base = df.select(
        F.col(id_col),
        F.size(
            F.filter(F.split(F.col(text_col), " "), lambda x: x != F.lit(""))
        ).alias("dl"),
    )
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).where(F.col("word").isin(terms))
    tf = tok.groupBy(id_col, "word").agg(F.count("*").alias("tf"))
    dfreq = tok.groupBy("word").agg(F.count_distinct(id_col).alias("df"))
    stats = base.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_len")
    )
    idf = F.col("n_docs").cast("double") / F.col("df").cast("double")
    rel_len = (F.col("dl") * F.col("n_docs")).cast("double") / F.col(
        "total_len"
    ).cast("double")
    tfd = F.col("tf").cast("double")
    s = (idf * (tfd * F.lit(c_sat))) / (
        tfd + (F.lit(c_fix) + F.lit(c_len) * rel_len)
    )
    snapped = F.floor(s * F.lit(1048576.0)) / F.lit(1048576.0)
    return (
        tf.join(F.broadcast(dfreq), "word")
        .join(base, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("s", snapped)
        .groupBy(id_col)
        .agg(F.sum("s").alias("score"), F.count("*").alias("matched"))
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            F.col("matched").cast("long").alias("matched_terms"),
            F.round("score", 6).alias("bm25_q6"),
        )
    )


def char_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document character-distribution Shannon entropy (nats) —
    the intrinsic gibberish/compressibility signal (random keyboard
    mash scores near ln(alphabet); single-character runs score 0):
    H(doc) = −Σ_c p_c·ln(p_c) over the document's OWN character
    frequencies.  Complements the corpus-trained t9/t12 models (no
    model, no training pass) and t11's token-level diversity.

    Returns (doc_id, n_chars, n_distinct_chars, entropy).

    Determinism: each p·ln(p) term is snapped to the 2^-20 dyadic
    grid (ln is the one non-correctly-rounded step — the t9
    convention), so the per-document sum is an exact sum of dyadics:
    order-independent, bit-identical across engines.  The final
    negation is written ``0.0 − Σ`` so an all-zero sum yields +0.0
    in both engines (never −0.0, which would flip the value hash).

    100-TB posture: ZERO shuffles — one projection computing the
    distinct-character histogram per row with JVM-side higher-order
    functions (no explode of a per-character row stream, no Python).
    Per-row cost is O(distinct_chars × doc_len) — bounded by the
    alphabet, not the corpus.
    """
    g = f"{LP_GRID:.1f}"
    # the histogram pass (one array scan per DISTINCT char) runs
    # once; the p·ln(p) term then works on the scalar count — HOF
    # lambdas get no common-subexpression elimination, so inlining
    # the filter into the term would scan the array twice per char
    term = (
        f"round((k / CAST(nc AS DOUBLE))"
        f" * ln(k / CAST(nc AS DOUBLE))"
        f" * {g}, 0) / {g}"
    )
    return (
        df.where(F.col(text_col).isNotNull() & (F.length(text_col) > 0))
        .select(
            "doc_id",
            F.split(F.col(text_col), "").alias("cs"),
            F.length(text_col).alias("nc"),
        )
        .select(
            "doc_id",
            F.col("nc").cast("long").alias("n_chars"),
            F.size(F.array_distinct("cs")).cast("int").alias("n_distinct_chars"),
            F.expr(
                f"CAST(0.0 AS DOUBLE) - aggregate("
                f"transform(transform(array_distinct(cs), "
                f"c -> size(filter(cs, x -> x = c))), k -> {term}), "
                f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            ).alias("entropy"),
        )
    )


def source_unigram_kl(
    docs: DataFrame, strata_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-source unigram KL divergence from the corpus distribution,
    KL(P_source ‖ P_corpus) = Σ_w p_s(w)·(ln p_s(w) − ln p(w)) — the
    mixture diagnostic ("which sources are distributionally unusual,
    and by how many nats") that decides where mixing weights (c5/c11)
    and domain-shift scoring (t12) should look first.  No smoothing
    is needed: every word of a source is in the corpus, so p(w) > 0
    wherever p_s(w) > 0 (terms with p_s(w) = 0 contribute 0).

    Returns (source, n_tokens, kl_nats), one row per source.

    Determinism: both ln's are snapped to the 2^-20 grid before the
    (exact) difference; the p_s·diff product is one correctly-rounded
    multiply, snapped again so the per-source sum is an exact sum of
    dyadics — order-independent, bit-identical across engines.

    100-TB posture: ONE corpus scan — the (word, source) counts are
    a partial+final aggregation, ``localCheckpoint``ed (the table is
    vocabulary × sources, executor-resident) so the corpus-level
    marginals derive from IT, not from re-scans; the word-marginal
    join is keyed on the word (never broadcast — vocabulary-sized);
    per-source totals and the 1-row grand total ride the audited
    broadcast pattern.
    """
    ex = docs.select(
        F.col(strata_col).alias("src"),
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    sw = (
        ex.groupBy("word", "src")
        .agg(F.count(F.lit(1)).alias("c_sw"))
        .localCheckpoint(eager=True)
    )
    w_marg = sw.groupBy("word").agg(F.sum("c_sw").alias("c_w"))
    s_tot = sw.groupBy("src").agg(F.sum("c_sw").alias("n_s"))
    tot = sw.agg(F.sum("c_sw").alias("n"))
    g = F.lit(LP_GRID)

    def _snap(col: Column) -> Column:
        return F.round(col * g, 0) / g

    p_s = F.col("c_sw").cast("double") / F.col("n_s").cast("double")
    lr = _snap(F.log(p_s)) - _snap(
        F.log(F.col("c_w").cast("double") / F.col("n").cast("double"))
    )
    return (
        sw.join(w_marg, "word")
        .join(F.broadcast(s_tot), "src")
        .crossJoin(F.broadcast(tot))
        .groupBy("src")
        .agg(
            F.sum("c_sw").alias("n_tokens"),
            F.sum(_snap(p_s * lr)).alias("kl_nats"),
        )
        .select(F.col("src").alias(strata_col), "n_tokens", "kl_nats")
    )


def _winnow_select(gh_df: DataFrame, w: int) -> DataFrame:
    """Shared winnowing selection over (doc_id, gh: array<long>):
    for every window of ``w`` consecutive gram hashes pick the
    minimum, rightmost occurrence on ties (Schleimer et al. 2003,
    robust tie-break), then emit the distinct selections.  Pure
    JVM-side higher-order functions — the fold carries a
    (pos, hash) struct accumulator; iterating positions ascending
    with ``<=`` keeps the rightmost minimal element."""
    w = int(w)
    sel = (
        f"array_distinct(transform("
        f"sequence(0, greatest(size(gh) - {w}, 0)), "
        f"j -> aggregate("
        f"sequence(j, least(j + {w}, size(gh)) - 1), "
        f"named_struct('p', CAST(-1 AS INT), "
        f"'h', CAST(9223372036854775807 AS BIGINT)), "
        f"(acc, i) -> IF(element_at(gh, i + 1) <= acc.h, "
        f"named_struct('p', CAST(i AS INT), 'h', element_at(gh, i + 1)), "
        f"acc))))"
    )
    return gh_df.select(
        "doc_id", F.explode(F.expr(sel)).alias("s")
    ).select("doc_id", F.col("s.p").alias("pos"), F.col("s.h").alias("fp"))


def winnow_fingerprints(
    df: DataFrame,
    k: int = 3,
    w: int = 4,
    text_col: str = "text",
    id_mode: str = "hashed",
) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
    2003 — the MOSS algorithm): hash every ``k``-token gram, slide a
    window of ``w`` consecutive hashes, select each window's minimum
    (rightmost on ties), and return the distinct selections
    (doc_id, pos, fp).  The guarantee: any shared run of at least
    ``w + k − 1`` tokens yields at least one shared fingerprint, at
    ~2/(w+1) selection density — the position-robust local signal
    for plagiarism/contamination matching that whole-doc hashing
    (t4) misses and span dedup (d11/d14) pays a self-join for.
    Documents shorter than ``k`` tokens yield no fingerprints; with
    between ``k`` and ``k+w−1`` tokens the single clipped window
    selects the global minimum.

    ``id_mode='hashed'`` (default): gram hash = xxhash64 — computed
    INSIDE one higher-order-function projection, ZERO shuffles, the
    100 TB path.  ``id_mode='sorted'``: gram → sorted-vocab dense id
    → multiplicative hash ((tid·2654435761) mod 2^32) — the
    SQL-mirrorable gate path (single-partition vocab window,
    gate-only like every sorted-vocab wrapper).

    Determinism: selection is pure integer comparison — no floats
    anywhere; output is bit-identical across engines and physical
    orders in 'sorted' mode.
    """
    k, w = int(k), int(w)
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k}, w={w}")
    toks = F.split(F.col(text_col), " ")
    eligible = df.where(F.col(text_col).isNotNull() & (F.size(toks) >= k))
    gram = (
        f"transform(sequence(0, size(toks) - {k}), "
        f"i -> array_join(slice(toks, i + 1, {k}), ' '))"
    )
    if id_mode == "hashed":
        # spread first: the gram/hash/winnow projection is O(|text|·w)
        # per row and must not run at a small scan's width
        gh_df = spread_for_expansion(
            eligible.select("doc_id", toks.alias("toks"))
        ).select(
            "doc_id",
            F.expr(f"transform({gram}, g -> xxhash64(g))").alias("gh"),
        )
    elif id_mode == "sorted":
        # stage the split so the gram expr sees a concrete `toks` column
        staged = spread_for_expansion(eligible.select("doc_id", toks.alias("toks")))
        grams = staged.select(
            "doc_id", F.posexplode(F.expr(gram)).alias("pos", "gram")
        )
        gvoc = (
            grams.select("gram")
            .distinct()
            .select(
                "gram",
                F.row_number().over(Window.orderBy("gram")).alias("tid"),
            )
        )
        hashed = grams.join(F.broadcast(gvoc), "gram").select(
            "doc_id",
            "pos",
            ((F.col("tid").cast("long") * F.lit(2654435761)) % F.lit(2 ** 32)).alias(
                "h"
            ),
        )
        gh_df = (
            hashed.groupBy("doc_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "h"))).alias("ph"))
            .select("doc_id", F.expr("transform(ph, s -> s.h)").alias("gh"))
        )
    else:
        raise ValueError(f"id_mode must be 'hashed' or 'sorted', got {id_mode!r}")
    return _winnow_select(gh_df, w)


def perplexity_buckets(
    docs: DataFrame, strata_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): rank
    every document WITHIN ITS SOURCE by the t9 corpus-self bigram
    log-probability and label the best-scoring third 'head', the
    next 'middle', the rest 'tail' — the standard select-head/
    sample-middle/drop-tail curation split, per-source so one clean
    source cannot crowd the others out (the c8 argument).

    Returns (doc_id, source, avg_logprob, bucket).

    Determinism: the score is t9's (grid-snapped model, exact sums,
    round-6 output — bit-identical across engines); boundaries are
    INTEGER comparisons (rk·3 ≤ n, rk·3 ≤ 2n over row_number and the
    stratum count), never a float percentile; doc_id breaks ties.

    100-TB posture: the t9 model is |alphabet|² and broadcast; one
    doc-keyed join attaches the stratum; one stratum-keyed window
    ranks (never SinglePartition).  Documents with fewer than two
    characters have no bigrams and drop out (inner join), matching
    the oracle.
    """
    score = char_bigram_logprob(docs, text_col)
    joined = docs.select("doc_id", strata_col).join(score, "doc_id")
    w = Window.partitionBy(strata_col).orderBy(
        F.col("avg_logprob").desc(), F.col("doc_id").asc()
    )
    n = F.count(F.lit(1)).over(Window.partitionBy(strata_col))
    rk = F.row_number().over(w)
    bucket = (
        F.when(rk * 3 <= n, F.lit("head"))
        .when(rk * 3 <= n * 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return joined.select(
        "doc_id", strata_col, "avg_logprob", bucket.alias("bucket")
    )


def heaps_law(
    docs: DataFrame, strata_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Heaps'-law vocabulary-growth fit per source: stream each
    source's documents in doc_id order, checkpoint (N_r, V_r) =
    (cumulative tokens, cumulative distinct words) after every
    document, and least-squares fit ln V = ln K + β·ln N — the
    corpus-growth diagnostic (natural text: β ≈ 0.4–0.6; templated /
    boilerplate sources grow their vocabulary far slower, gibberish
    far faster) that tells mixing and dedup where the vocabulary
    actually comes from.

    Returns (source, n_docs, beta, ln_k).

    Determinism: V_r counts words by their FIRST document rank (a
    min over the stratum — exact integers); ln N and ln V are
    snapped to the 2^-20 grid, each x·y / x² product is snapped
    again, so all five least-squares sums are exact dyadic sums —
    order-independent — and β / ln K are correctly-rounded
    arithmetic over them: bit-identical across engines.

    100-TB posture: one token explode feeding two keyed partial+
    final aggregations ((source, word) first-rank + per-doc counts),
    stratum-keyed windows for the doc rank and both running sums
    (never SinglePartition), and a final per-source aggregation of
    checkpoint terms.  Output is |sources| rows.
    """
    g = F.lit(LP_GRID)

    def _snap(col: Column) -> Column:
        return F.round(col * g, 0) / g

    tok = docs.select(
        F.col(strata_col).alias("src"),
        "doc_id",
        F.explode(F.split(F.col(text_col), " ")).alias("word"),
    )
    # doc rank within the source (doc_id order) + per-doc token count
    per_doc = tok.groupBy("src", "doc_id").agg(F.count(F.lit(1)).alias("nt"))
    w_rank = Window.partitionBy("src").orderBy("doc_id")
    ranked = per_doc.withColumn("r", F.row_number().over(w_rank))
    # a word's first rank within its source: min doc_id, then rank it
    first_doc = tok.groupBy("src", "word").agg(F.min("doc_id").alias("fdoc"))
    new_words = first_doc.groupBy("src", F.col("fdoc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("nw")
    )
    w_run = (
        Window.partitionBy("src")
        .orderBy("r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ck = (
        ranked.join(new_words, ["src", "doc_id"], "left")
        .select(
            "src",
            "r",
            F.sum("nt").over(w_run).alias("n_cum"),
            F.sum(F.coalesce("nw", F.lit(0))).over(w_run).alias("v_cum"),
        )
    )
    return _fit_loglog(
        ck, F.col("n_cum"), F.col("v_cum"), strata_col, "n_docs", "beta", "ln_k"
    )


def _fit_loglog(
    pts: DataFrame,
    x_raw: Column,
    y_raw: Column,
    strata_col: str,
    m_name: str,
    slope_name: str,
    icept_name: str,
) -> DataFrame:
    """Shared per-stratum least-squares fit of ln(y) on ln(x) — one
    definition for the Heaps (t24) and Zipf (t25) gates.  Both ln's
    snapped to the 2^-20 grid, each x·y / x² product snapped again,
    so all five regression sums are exact dyadic sums; slope and
    intercept are then identical correctly-rounded arithmetic in
    both engines."""
    g = F.lit(LP_GRID)

    def _snap(col: Column) -> Column:
        return F.round(col * g, 0) / g

    x = _snap(F.log(x_raw.cast("double")))
    y = _snap(F.log(y_raw.cast("double")))
    sums = pts.groupBy("src").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(_snap(x * y)).alias("sxy"),
        F.sum(_snap(x * x)).alias("sxx"),
    )
    m = F.col("m").cast("double")
    beta = (F.col("sxy") - F.col("sx") * F.col("sy") / m) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / m
    )
    return sums.select(
        F.col("src").alias(strata_col),
        F.col("m").cast("long").alias(m_name),
        beta.alias(slope_name),
        ((F.col("sy") - beta * F.col("sx")) / m).alias(icept_name),
    )


def zipf_slope(
    docs: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
    max_rank: int = 1000,
) -> DataFrame:
    """Zipf rank-frequency fit per source: rank each source's words
    by frequency (word breaking count ties) and least-squares fit
    ln(count) = ln C + s·ln(rank) over the top ``max_rank`` terms —
    natural language sits near s ≈ −1; machine-generated or
    key-value-ish text flattens toward 0.  The frequency-structure
    twin of t24's growth diagnostic, sharing the same exact-sum
    regression (``_fit_loglog``).

    Returns (source, n_terms, slope, ln_c).

    100-TB posture: one token explode → one (source, word) keyed
    aggregation; the rank is a stratum-keyed window over the
    per-source vocabulary (never SinglePartition), truncated at
    ``max_rank`` so the fit's point count is bounded; |sources|-row
    output."""
    wc = (
        docs.select(
            F.col(strata_col).alias("src"),
            F.explode(F.split(F.col(text_col), " ")).alias("word"),
        )
        .groupBy("src", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("src").orderBy(F.col("c").desc(), F.col("word").asc())
    pts = wc.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= int(max_rank)
    )
    return _fit_loglog(
        pts, F.col("rank"), F.col("c"), strata_col, "n_terms", "slope", "ln_c"
    )


def top_ngram_char_fraction(
    docs: DataFrame, n: int = 2, text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signal (Rae et al., public arXiv
    2112.11446, Table A1 "fraction of characters in most frequent
    n-gram"): for each document, its single most frequent word
    ``n``-gram and the fraction of the document's characters that
    gram's occurrences account for (occurrences × gram characters,
    the paper's multiplicative definition — overlaps not deduped;
    :func:`dup_ngram_char_fraction` is the interval-union twin).
    Natural text stays low; templated or looping generations spike.

    Returns (doc_id, top_gram, gram_count, char_frac) — one row per
    document; docs shorter than ``n`` tokens get ('', 0, 0.0).

    Determinism: counts are exact integers; the tie on count breaks
    to the lexicographically smallest gram (min over the
    (-count, gram) struct ≡ ORDER BY count DESC, gram ASC);
    char_frac is one correctly-rounded integer division.

    100-TB posture: n-gram windows are built JVM-side from the split
    array (no per-token shuffle, no Python); the occurrence count
    collapses map-side in a (doc_id, gram) partial+final
    aggregation; the per-doc argmax is a second partial-aggregable
    groupBy (min over a 2-field struct — NOT a window, so a
    boilerplate-heavy doc never sorts in one task); the zero-fill
    join is keyed on doc_id.  Nothing is cartesian or
    SinglePartition."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    base = docs.select(
        "doc_id",
        F.length(text_col).alias("n_chars"),
        F.split(F.col(text_col), " ").alias("t"),
    )
    ng_col = F.expr(
        f"transform(sequence(0, size(t) - {n}), "
        f"i -> array_join(slice(t, i + 1, {n}), ' '))"
    )
    occ = base.where(F.size("t") >= n).select(
        "doc_id", "n_chars", F.explode(ng_col).alias("gram")
    )
    cnt = occ.groupBy("doc_id", "n_chars", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    top = (
        cnt.groupBy("doc_id", "n_chars")
        .agg(
            F.min(
                F.struct((-F.col("c")).alias("negc"), F.col("gram"))
            ).alias("m")
        )
        .select(
            "doc_id",
            F.col("m.gram").alias("top_gram"),
            (-F.col("m.negc")).cast("long").alias("gram_count"),
            (
                ((-F.col("m.negc")) * F.length("m.gram")).cast("double")
                / F.col("n_chars").cast("double")
            ).alias("char_frac"),
        )
    )
    return (
        docs.select("doc_id")
        .join(top, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("top_gram", F.lit("")).alias("top_gram"),
            F.coalesce("gram_count", F.lit(0).cast("long")).alias("gram_count"),
            F.coalesce("char_frac", F.lit(0.0)).alias("char_frac"),
        )
    )


def dup_ngram_char_fraction(
    docs: DataFrame, n: int = 5, text_col: str = "text"
) -> DataFrame:
    """Gopher-style "fraction of characters in duplicate n-grams"
    (Rae et al., public arXiv 2112.11446, Table A1): the fraction of
    a document's characters covered by the INTERVAL UNION of every
    word ``n``-gram that occurs more than once WITHIN that same
    document — the within-doc twin of d11's cross-doc duplicated
    spans, and the self-repetition signal the top-gram metric
    (:func:`top_ngram_char_fraction`) undercounts when a doc loops
    through several different phrases.

    Returns (doc_id, n_chars, dup_chars, dup_frac) — one row per
    document.  Character offsets count the single joining space
    between tokens as part of a covering gram, but a space BETWEEN
    two disjoint covered islands is not covered.

    Determinism: offsets and coverage are exact integers (token
    char-starts derive from prefix join lengths); dup_frac is one
    correctly-rounded integer division.

    100-TB posture: gram windows and their char spans are built
    JVM-side from the split array (transform over sequence — no
    Python, no per-token shuffle); the duplicate filter is a
    (doc_id, gram)-keyed window count (bounded per doc — within-doc
    occurrence counts, no corpus-wide skew key); the interval union
    is a doc_id-keyed gaps-and-islands (running-max window + one
    partial-aggregable groupBy); the zero-fill join is keyed on
    doc_id.  Nothing is cartesian or SinglePartition."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    base = docs.select(
        "doc_id",
        F.length(text_col).alias("n_chars"),
        F.split(F.col(text_col), " ").alias("t"),
    )
    # Char offsets: cs(i) = chars of the first i tokens joined, plus
    # the following space (0 for i = 0); ce(i) = chars of the first
    # i + n tokens joined — all exact integer lengths, mirrored
    # verbatim in the DuckDB oracle.  The offsets derive from ONE
    # running sum over per-token lengths (joined(p) = Σ len + p =
    # chars of the first p+1 tokens joined), NOT from re-joining the
    # token prefix per window — that form is O(T²) characters per
    # document and lets a single 100k-token doc dominate a task
    # (session-6 review finding); this one is O(T·n) for the gram
    # strings plus one doc-keyed window.
    tok_col = F.expr(
        f"transform(sequence(0, size(t) - 1), i -> struct("
        f"length(element_at(t, i + 1)) AS len, "
        f"CASE WHEN i <= size(t) - {n} "
        f"THEN array_join(slice(t, i + 1, {n}), ' ') END AS gram))"
    )
    rows = base.where(F.size("t") >= n).select(
        "doc_id", "n_chars", F.posexplode(tok_col).alias("pos", "s")
    ).select("doc_id", "n_chars", "pos", "s.len", "s.gram")
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_off = Window.partitionBy("doc_id").orderBy("pos")
    joined = F.sum("len").over(w_run) + F.col("pos")
    sp = rows.withColumn("joined", joined)
    cs = F.when(F.col("pos") == 0, F.lit(0)).otherwise(
        F.lag("joined").over(w_off) + 1
    )
    ce = F.lead("joined", n - 1).over(w_off)
    occ = sp.select(
        "doc_id", "n_chars", "gram", cs.alias("cs"), ce.alias("ce")
    ).where(F.col("gram").isNotNull())
    w_cnt = Window.partitionBy("doc_id", "gram")
    hits = occ.withColumn("c", F.count(F.lit(1)).over(w_cnt)).where(
        F.col("c") >= 2
    )
    w_ord = Window.partitionBy("doc_id").orderBy("cs", "ce")
    run_max = F.max("ce").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(F.col("cs") > F.coalesce(run_max, F.lit(-1)), 1).otherwise(0)
    islands = (
        hits.withColumn("g", F.sum(brk).over(w_ord))
        .groupBy("doc_id", "n_chars", "g")
        .agg((F.max("ce") - F.min("cs")).alias("cov"))
    )
    per_doc = islands.groupBy("doc_id", "n_chars").agg(
        F.sum("cov").cast("long").alias("dup_chars")
    )
    return (
        docs.select("doc_id", F.length(text_col).alias("n_chars"))
        .join(per_doc.drop("n_chars"), "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_chars").cast("long").alias("n_chars"),
            F.coalesce("dup_chars", F.lit(0).cast("long")).alias("dup_chars"),
            # empty text would divide 0/0 (NULL in Spark, NaN in
            # DuckDB) — define the fraction as 0.0, mirrored in the
            # oracle's CASE
            F.when(
                F.col("n_chars") > 0,
                F.coalesce("dup_chars", F.lit(0).cast("long")).cast("double")
                / F.col("n_chars").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_frac"),
        )
    )
