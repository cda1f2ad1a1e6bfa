"""Driver-contract queries for the training-data pipeline blocks:
text analysis, deduplication, similarity search, multimodal.

Same bit-reproducibility discipline as ``queries.py`` (which imports
this module to populate the registry): integer arithmetic and exact
dyadic rationals on every aggregated value path; one correctly-
rounded double division at the end; transcendentals protected with
round(·, 6). DuckDB syntax notes baked in below: positions come from
``generate_subscripts`` (this build has no WITH ORDINALITY), byte
lengths from ``octet_length(encode(text))``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dask_traj_spark.queries import register


def _read_parquet_or_empty(spark, path: str, schema: str) -> DataFrame:
    """Read a streaming-twin results table, or an empty frame with
    the right schema when no micro-batch ever emitted a row (an
    all-empty results dir has no files to infer a schema from and
    spark.read.parquet raises — the contract gates must report their
    boolean row either way)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException:
        return spark.createDataFrame([], schema)

# ---------------------------------------------------------------------
# shared oracle CTE fragments
# ---------------------------------------------------------------------

TOK_CTE = """
tok AS (
    SELECT doc_id,
           generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
           unnest(string_split(text, ' ')) AS word
    FROM documents
)"""

VOC_CTE = """
voc AS (
    SELECT word, CAST(ROW_NUMBER() OVER (ORDER BY word) AS INT) AS tid
    FROM (SELECT DISTINCT word FROM tok)
)"""

DT_CTE = """
dt AS (
    SELECT DISTINCT t.doc_id, v.tid
    FROM tok t JOIN voc v USING (word)
)"""

_NTOK = "(length(text) - length(replace(text, ' ', '')) + 1)"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------

_T1_ORACLE = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST({_NTOK} AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
       CAST(length(text) - ({_NTOK} - 1) AS DOUBLE) / CAST({_NTOK} AS DOUBLE)
           AS mean_token_len
FROM documents
"""


@register("t1_doc_stats", _T1_ORACLE)
def q_doc_stats(spark, sf_dir):
    from dask_traj_spark.functions.text import doc_stats

    d = doc_stats(_docs(spark, sf_dir))
    return d.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        "n_tokens",
        "n_distinct",
        "mean_token_len",
    )


_STOP_SQL = "('the', 'a', 'of', 'and', 'is', 'to', 'in')"

_T2_ORACLE = f"""
SELECT doc_id,
       CAST(len(list_filter(string_split(text, ' '), w -> w IN {_STOP_SQL})) AS DOUBLE)
           / CAST({_NTOK} AS DOUBLE) AS stopword_ratio,
       least(CAST({_NTOK} AS DOUBLE), 50.0) / 50.0 AS length_score,
       CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / CAST({_NTOK} AS DOUBLE) AS distinct_ratio,
       (CAST(len(list_filter(string_split(text, ' '), w -> w IN {_STOP_SQL})) AS DOUBLE)
            / CAST({_NTOK} AS DOUBLE)
        + least(CAST({_NTOK} AS DOUBLE), 50.0) / 50.0
        + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / CAST({_NTOK} AS DOUBLE)) / 3.0 AS quality
FROM documents
"""


@register("t2_quality_score", _T2_ORACLE)
def q_quality(spark, sf_dir):
    from dask_traj_spark.functions.text import quality_score

    return quality_score(_docs(spark, sf_dir))


def _langid_oracle() -> str:
    from dask_traj_spark.functions.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    score_cols = []
    for lang in langs:
        markers = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        score_cols.append(
            f"CAST(len(list_filter(string_split(text, ' '), w -> w IN ({markers})))"
            f" AS DOUBLE) / CAST({_NTOK} AS DOUBLE) AS score_{lang}"
        )
    m = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    whens = " ".join(
        f"WHEN score_{lang} = {m} THEN '{lang}'" for lang in langs
    )
    return f"""
WITH s AS (SELECT doc_id, {", ".join(score_cols)} FROM documents)
SELECT doc_id, {", ".join(f"score_{lang}" for lang in langs)},
       CASE {whens} END AS pred_lang
FROM s
"""


@register("t3_langid", _langid_oracle())
def q_langid(spark, sf_dir):
    from dask_traj_spark.functions.text import langid_scores

    return langid_scores(_docs(spark, sf_dir))


_FP_W = "[1, 31, 961, 29791, 923521, 28629151, 887503681, 27512614111]"

_T4_ORACLE = f"""
WITH {TOK_CTE.strip()},
{VOC_CTE.strip()}
SELECT t.doc_id,
       CAST(sum(((CAST(v.tid AS BIGINT) + 1) * ({_FP_W}[t.pos % 8 + 1])) % 1000000007)
           % 1000000007 AS BIGINT) AS fp
FROM tok t JOIN voc v USING (word)
GROUP BY t.doc_id
"""


@register("t4_fingerprint", _T4_ORACLE)
def q_fingerprint_text(spark, sf_dir):
    from dask_traj_spark.functions.text import fingerprint

    # sorted-vocab ids: the only DuckDB-reproducible id assignment.
    # The operator default is id_mode="hashed" (no global window).
    return fingerprint(_docs(spark, sf_dir), id_mode="sorted")


_T5_ORACLE = f"""
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CAST({_NTOK} AS BIGINT)) AS BIGINT) AS total_tokens,
       CAST(sum(CAST(length(text) AS BIGINT)) AS BIGINT) AS total_chars
FROM documents
GROUP BY source
"""


@register("t5_source_stats", _T5_ORACLE)
def q_source_stats(spark, sf_dir):
    t = F.col("text")
    n_tok = (
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1
    ).cast("long")
    return (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).alias("total_tokens"),
            F.sum(F.length(t).cast("long")).alias("total_chars"),
        )
    )


def _curation_oracle() -> str:
    from dask_traj_spark.functions.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    score_cols = []
    for lang in langs:
        markers = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        score_cols.append(
            f"CAST(len(list_filter(string_split(text, ' '), w -> w IN ({markers})))"
            f" AS DOUBLE) / CAST({_NTOK} AS DOUBLE) AS score_{lang}"
        )
    m = "greatest(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    whens = " ".join(f"WHEN score_{lang} = {m} THEN '{lang}'" for lang in langs)
    return f"""
WITH q AS (
    SELECT doc_id,
           (CAST(len(list_filter(string_split(text, ' '), w -> w IN {_STOP_SQL})) AS DOUBLE)
                / CAST({_NTOK} AS DOUBLE)
            + least(CAST({_NTOK} AS DOUBLE), 50.0) / 50.0
            + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                / CAST({_NTOK} AS DOUBLE)) / 3.0 AS quality
    FROM documents
),
s AS (SELECT doc_id, {", ".join(score_cols)} FROM documents),
l AS (SELECT doc_id, CASE {whens} END AS pred_lang FROM s),
dd AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM documents
)
SELECT d.source, l.pred_lang, count(*) AS n_docs,
       CAST(sum(CAST(length(d.text) AS BIGINT)) AS BIGINT) AS total_chars
FROM documents d
JOIN q USING (doc_id) JOIN l USING (doc_id) JOIN dd USING (doc_id)
WHERE dd.rn = 1 AND q.quality >= 0.45
GROUP BY d.source, l.pred_lang
"""


@register("c1_corpus_curation", _curation_oracle())
def q_corpus_curation(spark, sf_dir):
    """End-to-end curation selection — the composite a training-data
    pipeline actually runs: exact dedup (keep lowest doc_id per
    content hash) ∧ quality ≥ 0.45 ∧ language-ID, aggregated per
    (source, predicted language). One plan: the dedup window, both
    scoring projections, and the final aggregate fuse over a single
    documents scan lineage."""
    from pyspark.sql import Window

    from dask_traj_spark.functions.text import langid_scores, quality_score

    docs = _docs(spark, sf_dir)
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", "source", "text")
    )
    q = quality_score(docs).select("doc_id", "quality")
    lang = langid_scores(docs).select("doc_id", "pred_lang")
    cur = (
        kept.join(q, "doc_id")
        .where(F.col("quality") >= 0.45)
        .join(lang, "doc_id")
    )
    return cur.groupBy("source", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text").cast("long")).alias("total_chars"),
    )


# ---------------------------------------------------------------------
# dedup
# ---------------------------------------------------------------------

_D1_ORACLE = """
SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS n
FROM documents GROUP BY md5(text)
"""


@register("d1_exact_dedup", _D1_ORACLE)
def q_exact_dedup(spark, sf_dir):
    from dask_traj_spark.operators.dedup import exact_duplicates

    return exact_duplicates(_docs(spark, sf_dir))


def _minhash_oracle(threshold: float) -> str:
    from dask_traj_spark.operators.dedup import (
        BAND_MIX,
        MAX_BUCKET,
        MINHASH_P,
        N_BANDS,
        N_HASHES,
        _hash_consts,
    )

    mins = ", ".join(
        f"min((CAST(tid AS BIGINT) * {a} + {b}) % {MINHASH_P}) AS h{i}"
        for i, (a, b) in ((i, _hash_consts(i)) for i in range(N_HASHES))
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, h{2 * b} * {BAND_MIX} + h{2 * b + 1} AS bh FROM sig"
        for b in range(N_BANDS)
    )
    return f"""
WITH {TOK_CTE.strip()},
{VOC_CTE.strip()},
{DT_CTE.strip()},
sig AS (SELECT doc_id, {mins} FROM dt GROUP BY doc_id),
bands AS ({band_selects}),
bok AS (
    SELECT band, bh FROM bands GROUP BY band, bh
    HAVING count(*) <= {MAX_BUCKET}
),
bandsf AS (SELECT b.* FROM bands b JOIN bok USING (band, bh)),
cand AS (
    SELECT DISTINCT l.doc_id AS doc1, r.doc_id AS doc2
    FROM bandsf l JOIN bandsf r ON l.band = r.band AND l.bh = r.bh
    WHERE l.doc_id < r.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM dt GROUP BY doc_id),
inter AS (
    SELECT c.doc1, c.doc2, count(*) AS i
    FROM cand c
    JOIN dt t1 ON t1.doc_id = c.doc1
    JOIN dt t2 ON t2.doc_id = c.doc2 AND t2.tid = t1.tid
    GROUP BY c.doc1, c.doc2
),
j AS (
    SELECT i.doc1, i.doc2,
           CAST(i.i AS DOUBLE) / CAST(s1.sz + s2.sz - i.i AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes s1 ON s1.doc_id = i.doc1
    JOIN sizes s2 ON s2.doc_id = i.doc2
)
SELECT doc1, doc2, jaccard FROM j WHERE jaccard >= {threshold}
"""


@register("d2_minhash_lsh_neardup", _minhash_oracle(0.9))
def q_minhash(spark, sf_dir):
    from dask_traj_spark.operators.dedup import MAX_BUCKET, near_duplicates_minhash

    # sorted ids for DuckDB parity; the operator default is hashed.
    # The bucket cap is mirrored in the oracle's HAVING clause.
    return near_duplicates_minhash(
        _docs(spark, sf_dir), threshold=0.9, id_mode="sorted",
        max_bucket=MAX_BUCKET,
    )


def _simhash_oracle() -> str:
    bits = 16
    sums = ", ".join(
        f"sum((((CAST(tid AS BIGINT) * 1103515245 + 12345) % 2147483648) >> {j}) % 2 * 2 - 1) AS s{j}"
        for j in range(bits)
    )
    sh = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(bits)
    )
    return f"""
WITH {TOK_CTE.strip()},
{VOC_CTE.strip()},
{DT_CTE.strip()},
per AS (SELECT doc_id, {sums} FROM dt GROUP BY doc_id)
SELECT doc_id, CAST({sh} AS BIGINT) AS sh FROM per
"""


@register("d3_simhash", _simhash_oracle())
def q_simhash(spark, sf_dir):
    from dask_traj_spark.operators.dedup import simhash

    return simhash(_docs(spark, sf_dir), id_mode="sorted")


def _ngram_oracle(threshold: float) -> str:
    from dask_traj_spark.operators.dedup import MAX_SHINGLE_DF as max_df

    return f"""
WITH {TOK_CTE.strip()},
big AS (
    SELECT DISTINCT t1.doc_id, t1.word || '_' || t2.word AS shingle
    FROM tok t1 JOIN tok t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
),
sv AS (
    SELECT shingle, CAST(ROW_NUMBER() OVER (ORDER BY shingle) AS INT) AS tid
    FROM (SELECT DISTINCT shingle FROM big)
),
ds AS (SELECT b.doc_id, s.tid FROM big b JOIN sv s USING (shingle)),
dok AS (SELECT tid FROM ds GROUP BY tid HAVING count(*) <= {max_df}),
dsf AS (SELECT ds.* FROM ds JOIN dok USING (tid)),
sizes AS (SELECT doc_id, count(*) AS sz FROM dsf GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS i
    FROM dsf a JOIN dsf b ON a.tid = b.tid AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc1, i.doc2,
       CAST(i.i AS DOUBLE) / CAST(s1.sz + s2.sz - i.i AS DOUBLE) AS jaccard
FROM inter i
JOIN sizes s1 ON s1.doc_id = i.doc1
JOIN sizes s2 ON s2.doc_id = i.doc2
WHERE CAST(i.i AS DOUBLE) / CAST(s1.sz + s2.sz - i.i AS DOUBLE) >= {threshold}
"""


@register("d4_ngram_jaccard_neardup", _ngram_oracle(0.9))
def q_ngram(spark, sf_dir):
    from dask_traj_spark.operators.dedup import MAX_SHINGLE_DF, near_duplicates_ngram

    return near_duplicates_ngram(
        _docs(spark, sf_dir), threshold=0.9, id_mode="sorted",
        max_df=MAX_SHINGLE_DF,
    )


# ---------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------

_N_QUERIES = 10
_TOPK = 10

_V1_ORACLE = f"""
WITH q AS (
    SELECT vec_id AS qid, generate_subscripts(embedding, 1) AS pos,
           round(CAST(unnest(embedding) AS DOUBLE) * 4096) / 4096 AS vq
    FROM embeddings WHERE vec_id < {_N_QUERIES}
),
c AS (
    SELECT vec_id AS cid, generate_subscripts(embedding, 1) AS pos,
           round(CAST(unnest(embedding) AS DOUBLE) * 4096) / 4096 AS vc
    FROM embeddings
),
dots AS (
    SELECT qid, cid, sum(vq * vc) AS dot, sum(vq * vq) AS qq, sum(vc * vc) AS cc
    FROM q JOIN c USING (pos) GROUP BY qid, cid
),
scored AS (
    SELECT qid, cid, dot / (sqrt(qq) * sqrt(cc)) AS cos
    FROM dots WHERE qid <> cid
),
ranked AS (
    SELECT qid, cid, cos,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
    FROM scored
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(cid AS BIGINT) AS vec_id, cos,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_TOPK}
"""


@register("v1_cosine_topk", _V1_ORACLE)
def q_cosine_topk(spark, sf_dir):
    from dask_traj_spark.operators.similarity import cosine_topk

    out = cosine_topk(_emb(spark, sf_dir), list(range(_N_QUERIES)), k=_TOPK)
    return out.select(
        F.col("qid").cast("long").alias("qid"),
        F.col("vec_id").cast("long").alias("vec_id"),
        "cos",
        F.col("rank").cast("int").alias("rank"),
    )


@register("v3_cosine_topk_ivf", _V1_ORACLE)
def q_cosine_topk_ivf(spark, sf_dir):
    """IVF ANN (train k-means centroids → assign clusters → probe →
    broadcast-semi-join prefilter → exact rerank). Gated in the
    full-probe configuration (nprobe == n_centroids → recall 1.0 →
    identical to the exact-top-k oracle); partial-probe recall is
    covered by the pytest suite."""
    from dask_traj_spark.operators.similarity import cosine_topk_ivf

    out = cosine_topk_ivf(
        _emb(spark, sf_dir),
        list(range(_N_QUERIES)),
        k=_TOPK,
        n_centroids=8,
        nprobe=8,
        rerank="sql",
    )
    return out.select(
        F.col("qid").cast("long").alias("qid"),
        F.col("vec_id").cast("long").alias("vec_id"),
        "cos",
        F.col("rank").cast("int").alias("rank"),
    )


# Recall-contract oracle (r22 pattern): DuckDB *can* compute the
# exact brute-force top-k (same CTE stack as _V1_ORACLE), so it
# gates exact_k per query fully; the IVF side is not SQL-
# expressible, so the oracle asserts the contract the index
# guarantees — recall@k >= 0.9 — as a literal TRUE that the Spark
# side must reproduce by actually measuring |IVF ∩ exact| in-engine
# (observed recall at nprobe=2/8 on this corpus: 1.0 at every SF).
_V4_ORACLE = f"""
WITH q AS (
    SELECT vec_id AS qid, generate_subscripts(embedding, 1) AS pos,
           round(CAST(unnest(embedding) AS DOUBLE) * 4096) / 4096 AS vq
    FROM embeddings WHERE vec_id < {_N_QUERIES}
),
c AS (
    SELECT vec_id AS cid, generate_subscripts(embedding, 1) AS pos,
           round(CAST(unnest(embedding) AS DOUBLE) * 4096) / 4096 AS vc
    FROM embeddings
),
dots AS (
    SELECT qid, cid, sum(vq * vc) AS dot, sum(vq * vq) AS qq, sum(vc * vc) AS cc
    FROM q JOIN c USING (pos) GROUP BY qid, cid
),
ranked AS (
    SELECT qid, cid,
           ROW_NUMBER() OVER (
               PARTITION BY qid
               ORDER BY dot / (sqrt(qq) * sqrt(cc)) DESC, cid ASC) AS rank
    FROM dots WHERE qid <> cid
)
SELECT CAST(qid AS BIGINT) AS qid,
       count(*) AS exact_k,
       CAST({_TOPK} AS BIGINT) AS k,
       TRUE AS recall_at_k_ge_090
FROM ranked WHERE rank <= {_TOPK}
GROUP BY qid
"""


@register("v4_ann_recall", _V4_ORACLE)
def q_ann_recall(spark, sf_dir):
    """Recall@k of the *partial-probe* IVF configuration (nprobe 3
    of 8 centroids — probes read 37.5% of the corpus, the
    configuration shape actually run at scale) measured against the
    exact brute-force top-k, entirely in-engine. Output: one row
    per query — exact_k (gated against DuckDB's own brute-force
    top-k count), and the recall contract ``hits >= 0.9*k`` as a
    boolean. Both sides break cos-ties by vec_id, so hits is
    deterministic. (nprobe=2 satisfied the contract only under the
    old order-biased ivf_train sample; the synthetic embeddings are
    near-uniform, so 8-centroid clusters are weak and 25% probe
    coverage honestly yields ~0.6-0.9 recall.)"""
    from dask_traj_spark.operators.similarity import cosine_topk, cosine_topk_ivf

    emb = _emb(spark, sf_dir)
    qids = list(range(_N_QUERIES))
    exact = cosine_topk(emb, qids, k=_TOPK).select("qid", "vec_id")
    approx = cosine_topk_ivf(
        emb, qids, k=_TOPK, n_centroids=8, nprobe=3, rerank="sql"
    ).select("qid", "vec_id")
    hits = exact.join(approx, ["qid", "vec_id"]).groupBy("qid").agg(
        F.count(F.lit(1)).alias("hits")
    )
    exact_n = exact.groupBy("qid").agg(F.count(F.lit(1)).alias("exact_k"))
    return (
        exact_n.join(hits, "qid", "left")
        .select(
            F.col("qid").cast("long").alias("qid"),
            F.col("exact_k").alias("exact_k"),
            F.lit(_TOPK).cast("long").alias("k"),
            (
                F.coalesce("hits", F.lit(0)).cast("double")
                >= 0.9 * F.lit(_TOPK)
            ).alias("recall_at_k_ge_090"),
        )
    )


def _emb_lsh_oracle(threshold: float) -> str:
    from dask_traj_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(64, 8)
    rows = []
    for j in range(8):
        for pos in range(64):
            n = int(round(float(planes[j, pos]) * 4096.0))
            rows.append(f"({j}, {pos + 1}, {n}/4096.0)")
    values = ", ".join(rows)
    bits = " + ".join(
        f"CASE WHEN d{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(8)
    )
    dcols = ", ".join(
        f"sum(CASE WHEN p.j = {j} THEN e.q * p.p ELSE 0 END) AS d{j}"
        for j in range(8)
    )
    return f"""
WITH planes(j, pos, p) AS (VALUES {values}),
e AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
           round(CAST(unnest(embedding) AS DOUBLE) * 4096) / 4096 AS q
    FROM embeddings
),
dots AS (
    SELECT e.vec_id, {dcols}
    FROM e JOIN planes p USING (pos)
    GROUP BY e.vec_id
),
buckets AS (SELECT vec_id, CAST({bits} AS BIGINT) AS bucket FROM dots),
cand AS (
    SELECT a.vec_id AS id1, b.vec_id AS id2
    FROM buckets a JOIN buckets b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
scored AS (
    SELECT c.id1, c.id2,
           sum(e1.q * e2.q) AS dot, sum(e1.q * e1.q) AS n1, sum(e2.q * e2.q) AS n2
    FROM cand c
    JOIN e e1 ON e1.vec_id = c.id1
    JOIN e e2 ON e2.vec_id = c.id2 AND e2.pos = e1.pos
    GROUP BY c.id1, c.id2
)
SELECT CAST(id1 AS BIGINT) AS id1, CAST(id2 AS BIGINT) AS id2,
       dot / (sqrt(n1) * sqrt(n2)) AS cos
FROM scored WHERE dot / (sqrt(n1) * sqrt(n2)) >= {threshold}
"""


@register("v2_embedding_neardup_lsh", _emb_lsh_oracle(0.35))
def q_emb_neardup(spark, sf_dir):
    from dask_traj_spark.operators.similarity import near_duplicates_embedding_lsh

    out = near_duplicates_embedding_lsh(_emb(spark, sf_dir), threshold=0.35)
    return out.select(
        F.col("id1").cast("long").alias("id1"),
        F.col("id2").cast("long").alias("id2"),
        "cos",
    )


# ---------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------

_M1_ORACLE = """
SELECT 'fake/utf8' AS kind,
       count(*) AS n,
       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(min(octet_length(encode(text))) AS BIGINT) AS min_bytes,
       CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
FROM documents
"""


@register("m1_media_stats", _M1_ORACLE)
def q_media_stats(spark, sf_dir):
    from dask_traj_spark.operators.multimodal import attach_payload, media_stats

    return media_stats(attach_payload(_docs(spark, sf_dir)))


# m2 runs the REAL codec path end-to-end: each doc's text bytes are
# packed into an actual 24-bit BMP (bottom-up rows, padded stride —
# multimodal.py:encode_bmp), then decode_bmp parses the header,
# strips the padding and flips the rows back. Decoded width/height/
# channels come from the BMP header; features are float32(pixel_i /
# 255) of the first 8 TOP-DOWN pixel bytes, which equal the text's
# byte head (zero-padded) — so DuckDB can predict the decoded output
# from the text alone with ord(substr(text,i,1)) (ASCII corpus: char
# offsets == byte offsets). A decoder that forgot the row flip would
# surface bytes 22..29 here; one that forgot padding would misalign
# row 2 — both hash-fail. Bytes gate as integers via round(f*255)
# (raw ARRAY<FLOAT> crashed the driver's canonicalizer in round 1).
_M2_ORACLE = """
WITH m AS (
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS nb,
           text
    FROM documents
), f AS (
    SELECT doc_id,
           CASE WHEN nb >= 1 THEN ord(substr(text, 1, 1)) ELSE 0 END AS b1,
           CASE WHEN nb >= 2 THEN ord(substr(text, 2, 1)) ELSE 0 END AS b2,
           CASE WHEN nb >= 3 THEN ord(substr(text, 3, 1)) ELSE 0 END AS b3,
           CASE WHEN nb >= 4 THEN ord(substr(text, 4, 1)) ELSE 0 END AS b4,
           CASE WHEN nb >= 5 THEN ord(substr(text, 5, 1)) ELSE 0 END AS b5,
           CASE WHEN nb >= 6 THEN ord(substr(text, 6, 1)) ELSE 0 END AS b6,
           CASE WHEN nb >= 7 THEN ord(substr(text, 7, 1)) ELSE 0 END AS b7,
           CASE WHEN nb >= 8 THEN ord(substr(text, 8, 1)) ELSE 0 END AS b8
    FROM m
)
SELECT doc_id,
       CAST(7 AS INT) AS width,
       CAST(2 AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(b1+b2+b3+b4+b5+b6+b7+b8 AS BIGINT) AS feat_sum,
       CAST(least(b1,b2,b3,b4,b5,b6,b7,b8) AS BIGINT) AS feat_min,
       CAST(greatest(b1,b2,b3,b4,b5,b6,b7,b8) AS BIGINT) AS feat_max,
       CAST(b1+b2+b3+b4+b5+b6+b7+b8 AS BIGINT) / 2040.0 AS feat_mean
FROM f
"""


@register("m2_decode_features", _M2_ORACLE)
def q_decode_features(spark, sf_dir):
    from dask_traj_spark.operators.multimodal import (
        attach_payload_bmp,
        decode_and_featurize,
    )

    decoded = decode_and_featurize(
        attach_payload_bmp(_docs(spark, sf_dir)), strict=True
    )
    # float32(b/255)*255 rounds back to the exact byte (rel. err
    # <= 2^-24 << 1/510), so these stats are exact integers on both
    # engines; feat_mean divides by the dyadic-free constant 2040 but
    # from identical BIGINT operands, so the IEEE quotient matches.
    fb = F.transform("features", lambda f: F.round(f * 255, 0).cast("long"))
    return decoded.select(
        "doc_id",
        "width",
        "height",
        "channels",
        F.aggregate(fb, F.lit(0).cast("long"), lambda a, x: a + x).alias("feat_sum"),
        F.array_min(fb).alias("feat_min"),
        F.array_max(fb).alias("feat_max"),
        (
            F.aggregate(fb, F.lit(0).cast("long"), lambda a, x: a + x).cast("double")
            / F.lit(2040.0)
        ).alias("feat_mean"),
    )


# ---------------------------------------------------------------------
# event analytics (windows / sessionization — batch twins of the
# streaming ops in streaming/ingest.py)
# ---------------------------------------------------------------------

_E1_ORACLE = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM events
GROUP BY 1, 2
"""


@register("e1_event_window_counts", _E1_ORACLE)
def q_event_windows(spark, sf_dir):
    from dask_traj_spark.sources.events import events_df

    ev = events_df(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("total_cents"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "total_cents",
        )
    )


_E2_ORACLE = """
WITH ordered AS (
    SELECT user_id, ts,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
           event_id
    FROM events
),
flagged AS (
    SELECT user_id, ts, event_id,
           CASE WHEN prev_ts IS NULL
                     OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                THEN 1 ELSE 0 END AS new_sess
    FROM ordered
),
sess AS (
    SELECT user_id, ts, event_id,
           sum(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS session_no
    FROM flagged
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       count(*) AS n_events,
       (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_s
FROM sess
GROUP BY user_id, session_no
"""


@register("e2_sessionization", _E2_ORACLE)
def q_sessionization(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity) via window
    functions — the batch twin of a session-window streaming agg."""
    from pyspark.sql import Window

    from dask_traj_spark.sources.events import events_df

    ev = events_df(spark, sf_dir).select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    new_sess = F.when(
        F.lag("ts").over(w).isNull()
        | ((us - F.unix_micros(F.lag("ts").over(w))) > 1_800_000_000),
        1,
    ).otherwise(0)
    sess = ev.withColumn(
        "session_no",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("(unix_micros(max(ts)) - unix_micros(min(ts))) div 1000000").alias(
            "duration_s"
        ),
    )


_E3_ORACLE = """
WITH ev AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS value_c, event_type
  FROM events
),
tagged AS (
  SELECT user_id, ts_us, 0 AS side, event_id AS tie,
         ts_us AS m_ts, event_id AS m_id, value_c AS m_val,
         CAST(NULL AS BIGINT) AS click_id
  FROM ev WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts_us, 1, 0, NULL, NULL, NULL, event_id
  FROM ev WHERE event_type = 'click'
),
filled AS (
  SELECT user_id, ts_us, side, click_id,
         last_value(m_ts IGNORE NULLS) OVER w AS purchase_us,
         last_value(m_id IGNORE NULLS) OVER w AS purchase_id,
         last_value(m_val IGNORE NULLS) OVER w AS value_c
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, side, tie
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id, ts_us AS click_us, click_id, purchase_us, purchase_id, value_c
FROM filled WHERE side = 1
"""


# e8 gates asof_join's TOLERANCE knob (pandas merge_asof's
# max-staleness semantics): matches older than one hour are nulled
# out, all payload fields together.  Same union+running-last plan as
# e3 — the tolerance is a post-fill projection, not another join.
_E8_ORACLE = """
WITH ev AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id,
         CAST(round(value * 100) AS BIGINT) AS value_c, event_type
  FROM events
),
tagged AS (
  SELECT user_id, ts_us, 0 AS side, event_id AS tie,
         ts_us AS m_ts, event_id AS m_id, value_c AS m_val,
         CAST(NULL AS BIGINT) AS click_id
  FROM ev WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts_us, 1, 0, NULL, NULL, NULL, event_id
  FROM ev WHERE event_type = 'click'
),
filled AS (
  SELECT user_id, ts_us, side, click_id,
         last_value(m_ts IGNORE NULLS) OVER w AS purchase_us,
         last_value(m_id IGNORE NULLS) OVER w AS purchase_id,
         last_value(m_val IGNORE NULLS) OVER w AS value_c
  FROM tagged
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, side, tie
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
tol AS (
  SELECT user_id, ts_us, side, click_id,
         CASE WHEN ts_us - purchase_us <= 3600000000 THEN purchase_us END
             AS purchase_us,
         CASE WHEN ts_us - purchase_us <= 3600000000 THEN purchase_id END
             AS purchase_id,
         CASE WHEN ts_us - purchase_us <= 3600000000 THEN value_c END
             AS value_c
  FROM filled
)
SELECT user_id, ts_us AS click_us, click_id, purchase_us, purchase_id, value_c
FROM tol WHERE side = 1
"""


@register("e8_asof_tolerance", _E8_ORACLE)
def q_asof_tolerance(spark, sf_dir):
    from dask_traj_spark.operators.asof import asof_join
    from dask_traj_spark.sources.events import events_df

    ev = events_df(spark, sf_dir).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts_us").alias("click_us"),
        F.col("event_id").alias("click_id"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts_us").alias("purch_us"),
        F.col("event_id").alias("purchase_id"),
        "value_c",
    )
    out = asof_join(
        clicks,
        purchases,
        left_on="click_us",
        right_on="purch_us",
        left_by="user_id",
        right_by="user_id",
        payload=["purchase_id", "value_c"],
        tie="purchase_id",
        tolerance=F.lit(3_600_000_000),  # 1 hour in µs
    )
    return out.select(
        "user_id",
        "click_us",
        "click_id",
        F.col("purch_us_matched").alias("purchase_us"),
        "purchase_id",
        "value_c",
    )


@register("e3_asof_last_purchase", _E3_ORACLE)
def q_asof_last_purchase(spark, sf_dir):
    """Keyed as-of join (point-in-time lookup): every click event
    gets the user's most recent purchase at-or-before it — the
    union+running-last operator from ``operators/asof.py`` (one
    shuffle total; no built-in Spark equivalent)."""
    from dask_traj_spark.operators.asof import asof_join
    from dask_traj_spark.sources.events import events_df

    ev = events_df(spark, sf_dir).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("value_c"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts_us").alias("click_us"), F.col("event_id").alias("click_id")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts_us").alias("purch_us"),
        F.col("event_id").alias("purchase_id"),
        "value_c",
    )
    out = asof_join(
        clicks,
        purchases,
        left_on="click_us",
        right_on="purch_us",
        left_by="user_id",
        right_by="user_id",
        payload=["purchase_id", "value_c"],
        tie="purchase_id",
    )
    return out.select(
        "user_id",
        "click_us",
        "click_id",
        F.col("purch_us_matched").alias("purchase_us"),
        "purchase_id",
        "value_c",
    )


_E4_ORACLE = """
WITH ev AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id, event_type FROM events
),
ordered AS (
  SELECT user_id, ts_us, event_id, event_type,
         lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
  FROM ev
),
sess AS (
  SELECT user_id, ts_us, event_id,
         sum(CASE WHEN prev IS NULL OR ts_us - prev > 1800000000
                  THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
  FROM ordered
),
intervals AS (
  SELECT user_id, session_no, min(ts_us) AS lo, max(ts_us) AS hi
  FROM sess GROUP BY user_id, session_no
),
errors AS (SELECT event_id, ts_us FROM ev WHERE event_type = 'error')
SELECT e.event_id, e.ts_us, count(*) AS n_overlap
FROM errors e JOIN intervals i ON e.ts_us >= i.lo AND e.ts_us <= i.hi
GROUP BY e.event_id, e.ts_us
"""


@register("e4_session_concurrency", _E4_ORACLE)
def q_session_concurrency(spark, sf_dir):
    """Range (interval) join via binning: for every error event,
    count the gap-sessions (all users) concurrently open at that
    instant. The binned equi-join from ``operators/rangejoin.py``
    replaces the O(|L|·|R|) nested-loop a naive BETWEEN join plans."""
    from pyspark.sql import Window

    from dask_traj_spark.operators.rangejoin import overlap_count
    from dask_traj_spark.sources.events import events_df

    ev = events_df(spark, sf_dir).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    new_sess = F.when(
        F.lag("ts_us").over(w).isNull()
        | ((F.col("ts_us") - F.lag("ts_us").over(w)) > 1_800_000_000),
        1,
    ).otherwise(0)
    intervals = (
        ev.withColumn(
            "session_no",
            F.sum(new_sess).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy("user_id", "session_no")
        .agg(F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi"))
        .select("lo", "hi")
    )
    errors = ev.where(F.col("event_type") == "error").select("event_id", "ts_us")
    return overlap_count(
        errors,
        intervals,
        "ts_us",
        "lo",
        "hi",
        bin_width=3_600_000_000,  # 1-hour bins ≈ median session span
        group_cols=["event_id", "ts_us"],
    )


# ---------------------------------------------------------------------
# trajectory similarity search (frame RMSD — SURVEY.md §7.5b)
# ---------------------------------------------------------------------

_RMSD_QFRAME = 5


def _rmsd_oracle() -> str:
    from dask_traj_spark.queries import COORDS_CTE

    return f"""
WITH {COORDS_CTE.strip()},
q AS (
    SELECT atom_id, x AS qx, y AS qy, z AS qz
    FROM coords WHERE frame_id = {_RMSD_QFRAME}
),
per AS (
    SELECT c.frame_id,
           avg(c.x*c.x + c.y*c.y + c.z*c.z) AS m_ff,
           avg(q.qx*q.qx + q.qy*q.qy + q.qz*q.qz) AS m_qq,
           avg(c.x*q.qx + c.y*q.qy + c.z*q.qz) AS m_fq,
           avg(c.x) AS cx, avg(c.y) AS cy, avg(c.z) AS cz,
           avg(q.qx) AS qcx, avg(q.qy) AS qcy, avg(q.qz) AS qcz
    FROM coords c JOIN q USING (atom_id)
    GROUP BY c.frame_id
)
SELECT frame_id,
       sqrt(greatest(
           m_ff - (cx*cx + cy*cy + cz*cz)
           + m_qq - (qcx*qcx + qcy*qcy + qcz*qcz)
           - 2 * (m_fq - (cx*qcx + cy*qcy + cz*qcz)), 0.0)) AS rmsd
FROM per
"""


@register("x1_frame_rmsd", _rmsd_oracle())
def q_frame_rmsd(spark, sf_dir):
    from dask_traj_spark.operators.rmsd import frame_rmsd
    from dask_traj_spark.queries import trajectory_from_embeddings

    traj = trajectory_from_embeddings(spark, sf_dir)
    return frame_rmsd(traj, _RMSD_QFRAME)


def _x16_oracle() -> str:
    from dask_traj_spark.queries import COORDS_CTE

    return f"""
WITH {COORDS_CTE.strip()},
per AS (
    SELECT frame_id,
           avg(x*x + y*y + z*z) AS m,
           avg(x) AS cx, avg(y) AS cy, avg(z) AS cz
    FROM coords GROUP BY frame_id
),
cross_t AS (
    SELECT a.frame_id AS frame_i, b.frame_id AS frame_j,
           avg(a.x*b.x + a.y*b.y + a.z*b.z) AS m_ij
    FROM coords a JOIN coords b
      ON a.atom_id = b.atom_id AND a.frame_id < b.frame_id
    GROUP BY a.frame_id, b.frame_id
)
SELECT c.frame_i, c.frame_j,
       sqrt(greatest(
           i.m - (i.cx*i.cx + i.cy*i.cy + i.cz*i.cz)
           + j.m - (j.cx*j.cx + j.cy*j.cy + j.cz*j.cz)
           - 2 * (c.m_ij - (i.cx*j.cx + i.cy*j.cy + i.cz*j.cz)), 0.0)) AS rmsd
FROM cross_t c
JOIN per i ON i.frame_id = c.frame_i
JOIN per j ON j.frame_id = c.frame_j
"""


@register("x16_pairwise_rmsd", _x16_oracle())
def q_pairwise_rmsd(spark, sf_dir):
    """All-pairs frame-RMSD matrix (trajectory-clustering input):
    per-frame sufficient statistics from one scan + one atom-keyed
    cross term, exact dyadic aggregation end to end."""
    from dask_traj_spark.operators.rmsd import pairwise_rmsd
    from dask_traj_spark.queries import trajectory_from_embeddings

    return pairwise_rmsd(trajectory_from_embeddings(spark, sf_dir))


@register("x16b_pairwise_rmsd_blocked", _x16_oracle())
def q_pairwise_rmsd_blocked(spark, sf_dir):
    """The ≫10⁴-frame physical shape of x16 — blocked-gram matmul
    (tile-pair tasks, dense float64 gram per task) — value-gated
    against the SAME brute-force oracle as the SQL form.  block=8
    splits the 21-frame gate corpus into 3 tiles / 6 tile pairs, so
    the tile-pair plumbing (broadcast pair table, two-sided row
    shipping, diagonal-tile i<j masking) is all exercised."""
    from dask_traj_spark.operators.rmsd import pairwise_rmsd_blocked
    from dask_traj_spark.queries import trajectory_from_embeddings

    return pairwise_rmsd_blocked(
        trajectory_from_embeddings(spark, sf_dir), block=8
    )


@register("x16c_pairwise_rmsd_auto", _x16_oracle())
def q_pairwise_rmsd_auto(spark, sf_dir):
    """The user-facing dispatched form of x16: pairwise_rmsd_auto
    picks the SQL self-join below the measured ~2k-frame crossover
    and the blocked gram above it (both bit-identical, so the same
    brute-force oracle gates whichever branch fires).  crossover=16
    forces the BLOCKED branch on the 21-frame gate corpus — the
    branch the default would not take here — so this gate plus x16
    (always SQL) covers both dispatch targets with driver evidence;
    the dispatch decision itself is pinned by
    test_pairwise_rmsd_auto_dispatch."""
    from dask_traj_spark.operators.rmsd import pairwise_rmsd_auto
    from dask_traj_spark.queries import trajectory_from_embeddings

    return pairwise_rmsd_auto(
        trajectory_from_embeddings(spark, sf_dir), block=8, crossover=16
    )


def _rmsd_topk_oracle() -> str:
    inner = _rmsd_oracle().strip()
    return f"""
WITH base AS ({inner}),
ranked AS (
    SELECT frame_id, rmsd,
           ROW_NUMBER() OVER (ORDER BY rmsd ASC, frame_id ASC) AS rank
    FROM base WHERE frame_id <> {_RMSD_QFRAME}
)
SELECT frame_id, rmsd, CAST(rank AS INT) AS rank FROM ranked WHERE rank <= 5
"""


@register("x2_rmsd_topk", _rmsd_topk_oracle())
def q_rmsd_topk(spark, sf_dir):
    from dask_traj_spark.operators.rmsd import rmsd_topk
    from dask_traj_spark.queries import trajectory_from_embeddings

    traj = trajectory_from_embeddings(spark, sf_dir)
    return rmsd_topk(traj, _RMSD_QFRAME, k=5)


def _x3_oracle() -> str:
    from dask_traj_spark.queries import N_FRAMES

    return f"""
SELECT CAST(f.frame_id AS BIGINT) AS frame_id,
       TRUE AS aligned_le_unaligned,
       TRUE AS rot_invariant,
       TRUE AS query_self_zero
FROM range({N_FRAMES}) f(frame_id)
"""


@register("x3_rmsd_aligned_contract", _x3_oracle())
def q_rmsd_aligned_contract(spark, sf_dir):
    """Contract gate for rotation-aligned (Kabsch) RMSD — the SVD is
    not SQL-expressible, so the oracle checks the three invariants
    that pin the implementation instead (v4-recall style):

    1. aligned ≤ unaligned per frame (the optimal rotation can only
       lower the residual; identity is in the feasible set);
    2. rotation invariance: rigidly rotating EVERY frame by a fixed
       non-axis-aligned rotation leaves the aligned RMSD unchanged
       (to f32-coordinate tolerance);
    3. the query frame aligns to itself at zero.

    A kernel that skipped the centering, mishandled the det(U·Vᵀ)
    reflection correction, or transposed the covariance would break
    (1) or (2) on generic data."""
    import numpy as np

    from dask_traj_spark.operators.rmsd import (
        _q,
        frame_rmsd,
        frame_rmsd_aligned,
    )
    from dask_traj_spark.queries import trajectory_from_embeddings
    from dask_traj_spark.trajectory import Trajectory

    traj = trajectory_from_embeddings(spark, sf_dir)
    # quantize once so the aligned kernel (raw coords) and the
    # self-quantizing unaligned operator see identical coordinates
    # (2^-12 dyadics < 8 are exact in f32, so the cast loses nothing)
    qc = traj.coords.select(
        "frame_id",
        "atom_id",
        _q("x").cast("float").alias("x"),
        _q("y").cast("float").alias("y"),
        _q("z").cast("float").alias("z"),
    )
    base = Trajectory(qc)

    # fixed proper rotation Rz(0.7)·Rx(1.1), f64 literals
    ct, st = np.cos(0.7), np.sin(0.7)
    cp, sp = np.cos(1.1), np.sin(1.1)
    rz = np.array([[ct, -st, 0.0], [st, ct, 0.0], [0.0, 0.0, 1.0]])
    rx = np.array([[1.0, 0.0, 0.0], [0.0, cp, -sp], [0.0, sp, cp]])
    r = rz @ rx
    rot = lambda row: sum(  # noqa: E731
        F.lit(float(r[row][c])) * F.col("xyz"[c]).cast("double")
        for c in range(3)
    )
    rc = qc.select(
        "frame_id",
        "atom_id",
        rot(0).cast("float").alias("x"),
        rot(1).cast("float").alias("y"),
        rot(2).cast("float").alias("z"),
    )
    rotated = Trajectory(rc)

    aligned = frame_rmsd_aligned(base, _RMSD_QFRAME).withColumnRenamed(
        "rmsd", "al"
    )
    aligned_rot = frame_rmsd_aligned(rotated, _RMSD_QFRAME).withColumnRenamed(
        "rmsd", "al_rot"
    )
    unaligned = frame_rmsd(base, _RMSD_QFRAME).withColumnRenamed(
        "rmsd", "un"
    )
    return (
        aligned.join(aligned_rot, "frame_id")
        .join(unaligned, "frame_id")
        .select(
            "frame_id",
            # margin 1e-7 (not tighter): at the query frame the
            # unaligned rmsd is exactly 0 while the SVD path carries
            # ~1e-8 roundoff that grows with atom count — observed
            # 1e-9 was enough at sf0.01 but not sf0.1
            (F.col("al") <= F.col("un") + F.lit(1e-7)).alias(
                "aligned_le_unaligned"
            ),
            (F.abs(F.col("al") - F.col("al_rot")) <= F.lit(1e-5)).alias(
                "rot_invariant"
            ),
            (
                (F.col("frame_id") != F.lit(_RMSD_QFRAME))
                | (F.col("al") <= F.lit(1e-7))
            ).alias("query_self_zero"),
        )
    )


# ---------------------------------------------------------------------
# streaming MinHash near-dup: batch-twin equivalence gate
# ---------------------------------------------------------------------

_SX1_ORACLE = """
SELECT CAST(0 AS BIGINT) AS stream_only_pairs,
       CAST(0 AS BIGINT) AS batch_only_pairs,
       TRUE AS jaccard_values_match
"""


@register("sx1_stream_neardup_batch_twin", _SX1_ORACLE)
def q_stream_neardup_batch_twin(spark, sf_dir):
    """Equivalence gate for the incremental streaming near-dup loop
    (streaming/dedup.py): replaying the documents corpus through the
    foreachBatch body in three deterministic micro-batches
    (doc_id % 3) must accumulate EXACTLY the batch operator's output
    — same pairs, bitwise-identical Jaccard values (the token sets
    are immutable, so a pair's Jaccard is the same whether computed
    incrementally or in one pass). Uncapped buckets on both sides:
    the bucket cap is corpus-global in batch but can only see the
    prefix in streaming, so capped runs legitimately diverge — the
    cap's own semantics are gated by d2.

    The streamed result set isn't SQL-predictable (hashed token
    ids), so the oracle asserts the contract row (v4-recall style):
    zero symmetric difference, zero value drift. Pair-content
    evidence comes from d2's value-level oracle."""
    import shutil
    import tempfile

    from dask_traj_spark.operators.dedup import near_duplicates_minhash
    from dask_traj_spark.streaming.dedup import process_neardup_batch

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="sx1_batch_twin_")
    state, results = f"{work}/state", f"{work}/results"
    try:
        for b in range(3):
            process_neardup_batch(
                docs.where(F.col("doc_id") % 3 == b),
                b,
                state,
                results,
                threshold=0.9,
                max_bucket=None,
            )
        stream = (
            _read_parquet_or_empty(
                spark, results,
                "doc1 long, doc2 long, jaccard double, batch_id int",
            )
            .select("doc1", "doc2", F.col("jaccard").alias("j_s"))
            .toPandas()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    batch = (
        near_duplicates_minhash(docs, threshold=0.9, max_bucket=None)
        .select("doc1", "doc2", F.col("jaccard").alias("j_b"))
        .toPandas()
    )
    merged = stream.merge(batch, on=["doc1", "doc2"], how="outer")
    stream_only = int(merged["j_b"].isna().sum())
    batch_only = int(merged["j_s"].isna().sum())
    both = merged.dropna()
    values_match = bool((both["j_s"] == both["j_b"]).all())
    return spark.createDataFrame(
        [(stream_only, batch_only, values_match)],
        "stream_only_pairs long, batch_only_pairs long, "
        "jaccard_values_match boolean",
    )


# ---------------------------------------------------------------------
# corpus curation II: decontamination, data mixing, repetition
# (operators/curation.py)
# ---------------------------------------------------------------------

_TRI_CTE = f"""
{TOK_CTE.strip()},
tri AS (
    SELECT DISTINCT t0.doc_id,
           t0.word || '_' || t1.word || '_' || t2.word AS gram
    FROM tok t0
    JOIN tok t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
    JOIN tok t2 ON t2.doc_id = t0.doc_id AND t2.pos = t0.pos + 2
)"""

_C2_ORACLE = f"""
WITH {_TRI_CTE.strip()},
bench AS (SELECT DISTINCT gram FROM tri WHERE doc_id % 50 = 0),
totals AS (SELECT doc_id, count(*) AS n_grams FROM tri GROUP BY doc_id),
hits AS (
    SELECT t.doc_id, count(*) AS n_contaminated
    FROM tri t JOIN bench b USING (gram)
    GROUP BY t.doc_id
)
SELECT d.doc_id,
       COALESCE(tt.n_grams, 0) AS n_grams,
       COALESCE(h.n_contaminated, 0) AS n_contaminated,
       CASE WHEN COALESCE(tt.n_grams, 0) > 0
            THEN CAST(COALESCE(h.n_contaminated, 0) AS DOUBLE)
                 / CAST(tt.n_grams AS DOUBLE)
            ELSE 0.0 END AS contamination
FROM documents d
LEFT JOIN totals tt ON tt.doc_id = d.doc_id
LEFT JOIN hits h ON h.doc_id = d.doc_id
"""


@register("c2_decontamination", _C2_ORACLE)
def q_decontamination(spark, sf_dir):
    """Benchmark decontamination over word trigrams; the "benchmark"
    is the deterministic doc_id % 50 == 0 slice of the corpus (a
    stand-in for MMLU-style eval sets — the operator takes any
    benchmark DataFrame)."""
    from dask_traj_spark.operators.curation import decontaminate

    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    return decontaminate(docs, bench, n=3)


_C3_ORACLE = """
WITH ranked AS (
    SELECT doc_id, source,
           ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY (doc_id * 2654435761) % 4294967296 ASC, doc_id ASC
           ) AS rk
    FROM documents
)
SELECT doc_id, source, CAST(rk AS INT) AS rk FROM ranked WHERE rk <= 5
"""


@register("c3_stratified_sample", _C3_ORACLE)
def q_stratified_sample(spark, sf_dir):
    """Deterministic 5-per-source quota sample (data mixing). The
    operator default orders by seeded xxhash64; the gated wrapper
    uses the multiplicative order mode, which ANSI SQL can mirror
    exactly (same integer arithmetic in both engines)."""
    from dask_traj_spark.operators.curation import stratified_sample

    return stratified_sample(
        _docs(spark, sf_dir), quota=5, strata_col="source", order_mode="mult"
    )


_T7_ORACLE = f"""
WITH {TOK_CTE.strip()},
big AS (
    SELECT t0.doc_id, t0.word || '_' || t1.word AS gram
    FROM tok t0
    JOIN tok t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
),
per AS (
    SELECT doc_id, count(*) AS total_bigrams,
           count(DISTINCT gram) AS distinct_bigrams
    FROM big GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.total_bigrams, 0) AS total_bigrams,
       COALESCE(p.distinct_bigrams, 0) AS distinct_bigrams,
       CASE WHEN COALESCE(p.total_bigrams, 0) > 0
            THEN 1.0 - CAST(p.distinct_bigrams AS DOUBLE)
                       / CAST(p.total_bigrams AS DOUBLE)
            ELSE 0.0 END AS repetition
FROM documents d
LEFT JOIN per p ON p.doc_id = d.doc_id
"""


@register("t7_repetition_score", _T7_ORACLE)
def q_repetition_score(spark, sf_dir):
    from dask_traj_spark.operators.curation import repetition_score

    return repetition_score(_docs(spark, sf_dir))


def _d5_oracle(n: int = 8) -> str:
    joins = "\n    ".join(
        f"JOIN tok t{k} ON t{k}.doc_id = t0.doc_id AND t{k}.pos = t0.pos + {k}"
        for k in range(1, n)
    )
    gram = " || '_' || ".join(f"t{k}.word" for k in range(n))
    return f"""
WITH {TOK_CTE.strip()},
grams AS (
    SELECT DISTINCT t0.doc_id, {gram} AS gram
    FROM tok t0
    {joins}
),
dfc AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2),
shared AS (
    SELECT g.doc_id, count(*) AS n_shared
    FROM grams g JOIN dfc USING (gram)
    GROUP BY g.doc_id
),
totals AS (SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(t.n_grams, 0) AS n_grams,
       COALESCE(s.n_shared, 0) AS n_shared,
       CASE WHEN COALESCE(t.n_grams, 0) > 0
            THEN CAST(COALESCE(s.n_shared, 0) AS DOUBLE)
                 / CAST(t.n_grams AS DOUBLE)
            ELSE 0.0 END AS shared_frac
FROM documents d
LEFT JOIN totals t ON t.doc_id = d.doc_id
LEFT JOIN shared s ON s.doc_id = d.doc_id
"""


@register("d5_repeated_ngram_docs", _d5_oracle())
def q_repeated_ngram_docs(spark, sf_dir):
    from dask_traj_spark.operators.dedup import repeated_ngram_docs

    return repeated_ngram_docs(_docs(spark, sf_dir), n=8)


# ---------------------------------------------------------------------
# G10: box vectors → lengths/angles (completes the unitcell pair)
# ---------------------------------------------------------------------

_G10_CASES = [
    # frame_id, ax..cz (lower-triangular boxes)
    (0, 2.0, 0.0, 0.0, 0.0, 2.0, 0.0, 0.0, 0.0, 2.0),
    (1, 0.25, 0.0, 0.0, 0.0625, 0.21875, 0.0, 0.046875, 0.03125, 0.1875),
    (2, 6.8555, 0.0, 0.0, 0.0, 6.8555, 0.0, 3.42775, 3.42775, 4.8477),
]

_G10_VALUES = ", ".join(
    "(" + ", ".join(str(v) for v in row) + ")" for row in _G10_CASES
)

_G10_ORACLE = f"""
WITH v(frame_id, ax, ay, az, bx, by, bz, cx, cy, cz) AS (VALUES {_G10_VALUES}),
n AS (
    SELECT frame_id,
           sqrt(ax*ax + ay*ay + az*az) AS na,
           sqrt(bx*bx + by*by + bz*bz) AS nb,
           sqrt(cx*cx + cy*cy + cz*cz) AS nc,
           bx*cx + by*cy + bz*cz AS dbc,
           cx*ax + cy*ay + cz*az AS dca,
           ax*bx + ay*by + az*bz AS dab
    FROM v
)
SELECT CAST(frame_id AS BIGINT) AS frame_id,
       round(na, 6) AS a, round(nb, 6) AS b, round(nc, 6) AS c,
       round(degrees(acos(greatest(-1.0, least(1.0, dbc / (nb * nc))))), 6) AS alpha,
       round(degrees(acos(greatest(-1.0, least(1.0, dca / (nc * na))))), 6) AS beta,
       round(degrees(acos(greatest(-1.0, least(1.0, dab / (na * nb))))), 6) AS gamma
FROM n
"""


@register("g10_vectors_to_lengths_angles", _G10_ORACLE)
def q_g10(spark, sf_dir):
    from dask_traj_spark.operators.unitcell import lengths_angles_exprs

    df = spark.createDataFrame(
        _G10_CASES,
        "frame_id bigint, ax double, ay double, az double, "
        "bx double, by double, bz double, cx double, cy double, cz double",
    )
    e = lengths_angles_exprs(
        *[F.col(c) for c in ("ax", "ay", "az", "bx", "by", "bz", "cx", "cy", "cz")]
    )
    return df.select("frame_id", *[F.round(v, 6).alias(k) for k, v in e.items()])


_BPE_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

_T6_ORACLE = f"""
SELECT doc_id,
       CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
           AS n_tokens_ws,
       CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT)
           AS n_pieces_bpe
FROM documents
"""


@register("t6_token_counts", _T6_ORACLE)
def q_token_counts(spark, sf_dir):
    """Token counting both ways the pipeline brief asks for:
    whitespace tokens and a BPE-ish regex piece count (the GPT-2
    pre-tokenizer pattern family, lookahead-free so Java regex and
    RE2 agree). Pure JVM-side ``regexp_count`` — no UDF."""
    d = _docs(spark, sf_dir)
    t = F.col("text")
    return d.select(
        "doc_id",
        (F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1)
        .cast("long")
        .alias("n_tokens_ws"),
        F.regexp_count(t, F.lit(_BPE_RE)).cast("long").alias("n_pieces_bpe"),
    )


_T15_ORACLE = """
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents),
tf AS (
    SELECT doc_id, word, count(*) AS tf
    FROM tok WHERE word <> '' GROUP BY doc_id, word),
dfreq AS (
    SELECT word, count(DISTINCT doc_id) AS df
    FROM tok WHERE word <> '' GROUP BY word),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.word, tf.tf, dfreq.df,
           CAST(tf.tf * n.n_docs AS DOUBLE) / dfreq.df AS s
    FROM tf JOIN dfreq USING (word) CROSS JOIN n),
ranked AS (
    SELECT doc_id, word, tf, df, s,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY s DESC, word) AS rnk
    FROM scored)
SELECT doc_id,
       CAST(rnk AS INT) AS rank,
       word AS term,
       CAST(tf AS BIGINT) AS tf,
       CAST(df AS BIGINT) AS df,
       round(s, 6) AS tfidf_ratio_q6
FROM ranked
WHERE rnk <= 3
"""


@register("t15_tfidf_top_terms", _T15_ORACLE)
def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 most distinctive terms per document by tf-idf; see
    :func:`dask_traj_spark.functions.text.tfidf_top_terms` for the
    raw-ratio-idf rationale and the 100-TB plan posture."""
    from dask_traj_spark.functions.text import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir), k=3)


# this DuckDB build cannot slice BLOBs; the corpus is ASCII so
# byte offsets == char offsets and encode(substring(text)) is the
# same bytes as slicing encode(text)
_M3_ORACLE = """
WITH m AS (
    SELECT doc_id, text,
           CAST(octet_length(encode(text)) // 16 AS INT) AS n_frames
    FROM documents),
f AS (
    SELECT doc_id, n_frames,
           unnest(range(0, n_frames, 4)) AS frame_idx
    FROM m)
SELECT f.doc_id,
       CAST(f.frame_idx AS INT) AS frame_idx,
       md5(substring(m.text, CAST(f.frame_idx AS INT) * 16 + 1, 16))
           AS frame_md5,
       f.n_frames
FROM f JOIN m USING (doc_id)
"""


@register("m3_frame_sample", _M3_ORACLE)
def q_frame_sample(spark, sf_dir):
    from dask_traj_spark.operators.multimodal import attach_payload, frame_sample

    media = attach_payload(_docs(spark, sf_dir))
    out = frame_sample(media, every=4)
    # binary columns are not hashable by the compare harness; gate
    # on an md5 digest of the sampled bytes instead (ASCII corpus →
    # DuckDB's md5-on-VARCHAR sees the same bytes)
    return out.select(
        "doc_id", "frame_idx", F.md5("frame_bytes").alias("frame_md5"), "n_frames"
    )


_E5_ORACLE = """
WITH e AS (
    SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us, event_id
    FROM events)
SELECT p.user_id, count(*) AS n_funnels
FROM e p
WHERE p.event_type = 'purchase'
  AND EXISTS (
      SELECT 1 FROM e c
      WHERE c.user_id = p.user_id AND c.event_type = 'click'
        AND c.ts_us <= p.ts_us AND c.ts_us >= p.ts_us - 86400000000
        AND EXISTS (
            SELECT 1 FROM e v
            WHERE v.user_id = c.user_id AND v.event_type = 'view'
              AND v.ts_us <= c.ts_us AND v.ts_us >= c.ts_us - 86400000000))
GROUP BY p.user_id
"""


@register("e5_funnel_completions", _E5_ORACLE)
def q_funnel(spark, sf_dir):
    """Three-step funnel (view → click → purchase, each hop within
    24 h, per user), counted per user. The oracle spells it as nested
    correlated EXISTS; the engine runs it as two *binned range
    joins* (operators/rangejoin.py — interval containment as an
    equi-join on time bins, the scale pattern) with semi-join
    dedup."""
    from dask_traj_spark.operators.rangejoin import range_join
    from dask_traj_spark.sources.events import events_df

    e = events_df(spark, sf_dir).select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us"), "event_id"
    )
    hop = 86_400_000_000  # 24 h in epoch micros
    views = e.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts_us").alias("v_lo"),
        (F.col("ts_us") + hop).alias("v_hi"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts_us", F.col("event_id").alias("click_id")
    )
    qc = (
        range_join(clicks, views, "ts_us", "v_lo", "v_hi", bin_width=hop,
                   equi_keys=["user_id"])
        .select("user_id", "ts_us", "click_id")
        .distinct()
        .select(
            "user_id",
            F.col("ts_us").alias("c_lo"),
            (F.col("ts_us") + hop).alias("c_hi"),
            "click_id",
        )
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts_us", F.col("event_id").alias("purchase_id")
    )
    funnels = (
        range_join(purchases, qc, "ts_us", "c_lo", "c_hi", bin_width=hop,
                   equi_keys=["user_id"])
        .select("user_id", "purchase_id")
        .distinct()
    )
    return funnels.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_funnels"))


# ---------------------------------------------------------------------
# round-4 additions: C4-style filters, sequence packing, SemDeDup,
# PNG decode
# ---------------------------------------------------------------------

_T8_ORACLE = """
WITH w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
c AS (SELECT doc_id, word, count(*) AS n FROM w GROUP BY doc_id, word),
d AS (
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_words,
           CAST(max(n) AS BIGINT) AS top_n,
           CAST(sum(length(word) * n) AS BIGINT) AS n_chars
    FROM c GROUP BY doc_id
),
f AS (
    SELECT doc_id, n_words,
           CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE) AS mw,
           CAST(top_n AS DOUBLE) / CAST(n_words AS DOUBLE) AS ts
    FROM d
)
SELECT doc_id, n_words,
       round(mw, 6) AS mean_wlen,
       round(ts, 6) AS top_share,
       CAST(CASE WHEN n_words BETWEEN 25 AND 100000 THEN 1 ELSE 0 END AS BIGINT) AS len_ok,
       CAST(CASE WHEN mw >= 3.0 AND mw <= 6.0 THEN 1 ELSE 0 END AS BIGINT) AS wlen_ok,
       CAST(CASE WHEN ts <= 0.15 THEN 1 ELSE 0 END AS BIGINT) AS rep_ok,
       CAST(CASE WHEN n_words BETWEEN 25 AND 100000 AND mw >= 3.0 AND mw <= 6.0
                  AND ts <= 0.15 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM f
"""


@register("t8_heuristic_filter", _T8_ORACLE)
def q_heuristic_filter(spark, sf_dir):
    from dask_traj_spark.operators.curation import heuristic_filter

    out = heuristic_filter(_docs(spark, sf_dir))
    return out.select(
        "doc_id",
        "n_words",
        "mean_wlen",
        "top_share",
        F.col("len_ok").cast("long").alias("len_ok"),
        F.col("wlen_ok").cast("long").alias("wlen_ok"),
        F.col("rep_ok").cast("long").alias("rep_ok"),
        F.col("keep").cast("long").alias("keep"),
    )


def _pack_sql(with_counts: str) -> str:
    """The single-window packing formulation (budget 512, mult-hash
    order, (ord, doc_id) tie-break) over a ``pk_counts`` CTE of
    (doc_id, n_tokens) — ONE definition shared by the whitespace
    gate (c4) and the BPE-counts gate (c10), so a packing-math fix
    can never apply to one and not the other."""
    return f"""{with_counts},
pk_t AS (
    SELECT doc_id, n_tokens,
           (doc_id * 2654435761) % 4294967296 AS ord
    FROM pk_counts
),
pk_c AS (
    SELECT doc_id, n_tokens,
           COALESCE(sum(n_tokens) OVER (
               ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
    FROM pk_t
)
SELECT doc_id, n_tokens,
       CAST(cb // 512 AS BIGINT) AS start_seq,
       CAST(cb % 512 AS BIGINT) AS "offset",
       CAST(((cb + n_tokens - 1) // 512) - (cb // 512) + 1 AS BIGINT) AS n_seqs
FROM pk_c"""


_C4_ORACLE = _pack_sql("""WITH pk_counts AS (
    SELECT doc_id,
           CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens
    FROM documents
)""")


@register("c4_sequence_packing", _C4_ORACLE)
def q_sequence_packing(spark, sf_dir):
    """Concat-and-chunk sequence packing via the distributed prefix
    sum in ``pack_sequences`` (range partition → local cumsum →
    broadcast partition offsets). The oracle is the single-window
    formulation — identical math, but the Spark side never builds a
    global single-partition sort."""
    from dask_traj_spark.operators.curation import pack_sequences

    return pack_sequences(
        _docs(spark, sf_dir), budget=512, order_mode="mult"
    ).select("doc_id", "n_tokens", "start_seq", "offset", "n_seqs")


def _d6_oracle(threshold: float, n_bits: int = 6, max_cluster: int = 4096) -> str:
    bits = " + ".join(
        f"(CASE WHEN embedding[{j + 1}] > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(n_bits)
    )
    # the capped CTE mirrors the engine's mandatory per-cluster cap
    # (_cap_buckets): members of clusters above max_cluster skip the
    # pairwise compare and keep=True by construction (d2 playbook)
    return f"""
WITH sig AS (
    SELECT vec_id, CAST({bits} AS BIGINT) AS cluster FROM embeddings
),
sizes AS (
    SELECT cluster, count(*) AS bsz FROM sig GROUP BY cluster
),
capped AS (
    SELECT s.vec_id, s.cluster
    FROM sig s JOIN sizes z ON s.cluster = z.cluster AND z.bsz <= {max_cluster}
),
e AS (
    SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
           round(CAST(unnest(embedding) AS DOUBLE) * 4096) / 4096 AS q
    FROM embeddings
),
cand AS (
    SELECT a.vec_id AS id1, b.vec_id AS id2
    FROM capped a JOIN capped b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
),
scored AS (
    SELECT c.id1, c.id2,
           sum(e1.q * e2.q) AS dot, sum(e1.q * e1.q) AS n1, sum(e2.q * e2.q) AS n2
    FROM cand c
    JOIN e e1 ON e1.vec_id = c.id1
    JOIN e e2 ON e2.vec_id = c.id2 AND e2.pos = e1.pos
    GROUP BY c.id1, c.id2
),
dropped AS (
    SELECT DISTINCT id2 FROM scored
    WHERE dot / (sqrt(n1) * sqrt(n2)) >= {threshold}
)
SELECT s.vec_id AS vec_id, s.cluster AS cluster,
       CAST(CASE WHEN d.id2 IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM sig s LEFT JOIN dropped d ON s.vec_id = d.id2
"""


# n_bits pinned at 6 so the static oracle matches at any sf (auto
# n_bits depends on runtime corpus size); max_cluster=10 deliberately
# FIRES at sf0.01 (cluster sizes run 2-15 there) so the cap mirror
# itself is value-gated, not dead SQL.
@register("d6_semantic_dedup", _d6_oracle(0.3, n_bits=6, max_cluster=10))
def q_semantic_dedup(spark, sf_dir):
    from dask_traj_spark.operators.similarity import semantic_dedup

    out = semantic_dedup(
        _emb(spark, sf_dir), threshold=0.3, n_bits=6, max_cluster=10
    )
    return out.select(
        "vec_id", "cluster", F.col("keep").cast("long").alias("keep")
    )


# m4 is m2's twin for the PNG codec path: text bytes → real
# zlib-deflated 5×3 RGB PNG with per-row scanline filters
# (None/Sub/Up) → decode_png (inflate + filter reconstruction) →
# feature head. The oracle predicts the decoded pixels from the text
# alone; a decoder that skipped un-filtering would corrupt rows 2-3
# and hash-fail. Feature sum divisor: 8 bytes * 255 = 2040.
_M4_ORACLE = """
WITH m AS (
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS nb,
           text
    FROM documents
), f AS (
    SELECT doc_id,
           CASE WHEN nb >= 1 THEN ord(substr(text, 1, 1)) ELSE 0 END AS b1,
           CASE WHEN nb >= 2 THEN ord(substr(text, 2, 1)) ELSE 0 END AS b2,
           CASE WHEN nb >= 3 THEN ord(substr(text, 3, 1)) ELSE 0 END AS b3,
           CASE WHEN nb >= 4 THEN ord(substr(text, 4, 1)) ELSE 0 END AS b4,
           CASE WHEN nb >= 5 THEN ord(substr(text, 5, 1)) ELSE 0 END AS b5,
           CASE WHEN nb >= 6 THEN ord(substr(text, 6, 1)) ELSE 0 END AS b6,
           CASE WHEN nb >= 7 THEN ord(substr(text, 7, 1)) ELSE 0 END AS b7,
           CASE WHEN nb >= 8 THEN ord(substr(text, 8, 1)) ELSE 0 END AS b8
    FROM m
)
SELECT doc_id,
       CAST(5 AS INT) AS width,
       CAST(3 AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(b1+b2+b3+b4+b5+b6+b7+b8 AS BIGINT) AS feat_sum,
       CAST(least(b1,b2,b3,b4,b5,b6,b7,b8) AS BIGINT) AS feat_min,
       CAST(greatest(b1,b2,b3,b4,b5,b6,b7,b8) AS BIGINT) AS feat_max,
       CAST(b1+b2+b3+b4+b5+b6+b7+b8 AS BIGINT) / 2040.0 AS feat_mean
FROM f
"""


@register("m4_decode_png", _M4_ORACLE)
def q_decode_png(spark, sf_dir):
    from dask_traj_spark.operators.multimodal import (
        attach_payload_png,
        decode_and_featurize,
    )

    decoded = decode_and_featurize(
        attach_payload_png(_docs(spark, sf_dir)), strict=True
    )
    fb = F.transform("features", lambda f: F.round(f * 255, 0).cast("long"))
    return decoded.select(
        "doc_id",
        "width",
        "height",
        "channels",
        F.aggregate(fb, F.lit(0).cast("long"), lambda a, x: a + x).alias("feat_sum"),
        F.array_min(fb).alias("feat_min"),
        F.array_max(fb).alias("feat_max"),
        (
            F.aggregate(fb, F.lit(0).cast("long"), lambda a, x: a + x).cast("double")
            / F.lit(2040.0)
        ).alias("feat_mean"),
    )


def _components_cte(threshold: float) -> str:
    """The recursive min-reachability closure over the d2 near-dup
    pair graph — ONE definition shared by the d7 and d16 oracles so
    a closure fix can never apply to one and not the other.  Ends in
    ``c(id, comp)``."""
    d2 = _minhash_oracle(threshold)
    return f"""WITH RECURSIVE p AS (SELECT doc1, doc2 FROM ({d2}) d2pairs),
e AS (
    SELECT doc1 AS s, doc2 AS d FROM p
    UNION ALL
    SELECT doc2 AS s, doc1 AS d FROM p
),
r(id, comp) AS (
    SELECT doc_id, doc_id FROM documents
    UNION
    SELECT e.d, r.comp FROM r JOIN e ON e.s = r.id
),
c AS (SELECT id, min(comp) AS comp FROM r GROUP BY id)"""


def _d7_oracle(threshold: float) -> str:
    """Connected components over the d2 near-dup pair graph, as a
    recursive min-reachability closure (fine at oracle scale; the
    engine runs iterative min-label propagation instead)."""
    return f"""
{_components_cte(threshold)}
SELECT CAST(id AS BIGINT) AS doc_id,
       CAST(comp AS BIGINT) AS component,
       CAST(CASE WHEN id = comp THEN 1 ELSE 0 END AS BIGINT) AS is_representative
FROM c
"""


@register("d7_dup_components", _d7_oracle(0.9))
def q_dup_components(spark, sf_dir):
    """Near-dup clusters: d2's MinHash pair graph → connected
    components (iterative min-label propagation) → per-doc component
    id + representative flag. The oracle spells the same closure as
    a recursive CTE."""
    from dask_traj_spark.operators.dedup import (
        MAX_BUCKET,
        dup_components,
        near_duplicates_minhash,
    )

    docs = _docs(spark, sf_dir)
    pairs = near_duplicates_minhash(
        docs, threshold=0.9, id_mode="sorted", max_bucket=MAX_BUCKET
    ).select(F.col("doc1").alias("id1"), F.col("doc2").alias("id2"))
    out = dup_components(pairs, docs.select("doc_id"))
    return out.select(
        "doc_id",
        "component",
        F.col("is_representative").cast("long").alias("is_representative"),
    )


# ---------------------------------------------------------------------
# x4/x5: radius of gyration + RDF histogram (beyond-reference
# trajectory analyses on the same deterministic coords derivation)
# ---------------------------------------------------------------------


def _rog_oracle() -> str:
    from dask_traj_spark.queries import COORDS_CTE

    return f"""
WITH {COORDS_CTE.strip()},
top AS (
    SELECT CAST(vec_id AS INT) AS atom_id,
           CAST(label + 1 AS DOUBLE) AS mass
    FROM embeddings
),
agg AS (
    SELECT c.frame_id,
           sum(t.mass * (c.x*c.x + c.y*c.y + c.z*c.z)) AS srr,
           sum(t.mass * c.x) AS sx,
           sum(t.mass * c.y) AS sy,
           sum(t.mass * c.z) AS sz,
           sum(t.mass) AS sm
    FROM coords c JOIN top t USING (atom_id)
    GROUP BY c.frame_id
)
SELECT frame_id,
       sqrt(greatest(
           srr/sm - ((sx/sm)*(sx/sm) + (sy/sm)*(sy/sm) + (sz/sm)*(sz/sm)),
           0.0)) AS rg
FROM agg
"""


@register("x4_radius_of_gyration", _rog_oracle())
def q_radius_of_gyration(spark, sf_dir):
    """Mass-weighted Rg per frame from sufficient statistics — one
    partial+final aggregation (all sums are exact dyadic
    accumulations, so partial-agg order cannot perturb the value;
    the divisions/sqrt are correctly-rounded on identical operands)."""
    from dask_traj_spark.operators.distance import compute_radius_of_gyration
    from dask_traj_spark.queries import trajectory_from_embeddings

    traj = trajectory_from_embeddings(spark, sf_dir)
    return compute_radius_of_gyration(traj)


def _rdf_oracle() -> str:
    from dask_traj_spark.queries import _DIST_ORACLE

    return f"""
WITH d AS ({_DIST_ORACLE}),
b AS (SELECT CAST(floor(dist * 64.0) AS BIGINT) AS bin FROM d)
SELECT bin,
       CAST(bin AS DOUBLE) * 0.015625 AS r_lo,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM b GROUP BY bin
"""


@register("x5_rdf_histogram", _rdf_oracle())
def q_rdf_histogram(spark, sf_dir):
    """Radial distribution histogram over the G1 pair set with a
    dyadic 1/64 nm bin width (floor is engine-exact on the
    float32-roundtripped distances)."""
    from dask_traj_spark.operators.distance import rdf_histogram
    from dask_traj_spark.queries import N_DIST_ATOMS, _pairs, trajectory_from_embeddings

    traj = trajectory_from_embeddings(spark, sf_dir)
    return rdf_histogram(
        traj, _pairs(N_DIST_ATOMS), bin_width=1.0 / 64.0, n_atoms=N_DIST_ATOMS
    )


def _neighbor_oracle(cutoff: float) -> str:
    from dask_traj_spark.queries import COORDS_CTE, _dist_from_components

    d = _dist_from_components("c2.x-c1.x", "c2.y-c1.y", "c2.z-c1.z")
    return f"""
WITH {COORDS_CTE.strip()}
SELECT c1.frame_id AS frame_id,
       CAST(c1.atom_id AS INT) AS i,
       CAST(c2.atom_id AS INT) AS j,
       {d} AS dist
FROM coords c1
JOIN coords c2
  ON c2.frame_id = c1.frame_id AND c1.atom_id < c2.atom_id
WHERE {d} <= {cutoff}
"""


_X20_ORACLE = """
SELECT CAST(f.pc AS BIGINT) AS pc,
       CAST(1 AS BIGINT) AS ortho_ok,
       CAST(1 AS BIGINT) AS var_ok,
       CAST(1 AS BIGINT) AS order_ok,
       CAST(1 AS BIGINT) AS sign_ok
FROM range(3) f(pc)
ORDER BY pc
"""


@register("x20_pca_contract", _X20_ORACLE)
def q_pca_contract(spark, sf_dir):
    """Conformational-PCA contract (x3/v4 pattern — eigh is not
    SQL-expressible, so the gate pins the invariants that force a
    correct covariance + decomposition): orthonormal basis,
    per-PC projection variance equal to the eigenvalue (the defining
    property of a principal axis), non-increasing eigenvalues, and
    the deterministic sign convention."""
    import numpy as np

    from dask_traj_spark.operators.pca import pca_fit, pca_project
    from dask_traj_spark.queries import trajectory_from_embeddings

    traj = trajectory_from_embeddings(spark, sf_dir)
    atoms = list(range(24))
    mean, comps, eigvals, n = pca_fit(traj, atoms, k=3)
    gram = comps @ comps.T
    ortho = np.abs(gram - np.eye(len(comps))).max() < 1e-9
    order = bool(np.all(np.diff(eigvals) <= 1e-12))
    sign = all(
        comps[i, int(np.argmax(np.abs(comps[i])))] > 0
        for i in range(len(comps))
    )
    proj = pca_project(traj, atoms, mean, comps)
    stats = proj.select(
        *[
            F.element_at("pc", i + 1).alias(f"p{i}")
            for i in range(len(comps))
        ]
    ).agg(
        *[F.avg(F.col(f"p{i}") * F.col(f"p{i}")).alias(f"m2_{i}")
          for i in range(len(comps))],
        *[F.avg(f"p{i}").alias(f"m1_{i}") for i in range(len(comps))],
    ).first()
    rows = []
    for i in range(len(comps)):
        var = stats[f"m2_{i}"] - stats[f"m1_{i}"] ** 2
        var_ok = abs(var - eigvals[i]) <= 1e-6 * max(eigvals[0], 1e-12)
        rows.append(
            (i, int(ortho), int(var_ok), int(order), int(sign))
        )
    return spark.createDataFrame(
        rows, "pc long, ortho_ok long, var_ok long, order_ok long, sign_ok long"
    )


def _x22_oracle(bin_width: float, lag: int) -> str:
    from dask_traj_spark.queries import COORDS_CTE

    return f"""
WITH {COORDS_CTE.strip()},
top AS (
    SELECT CAST(vec_id AS INT) AS atom_id,
           CAST(label + 1 AS DOUBLE) AS mass
    FROM embeddings
),
agg AS (
    SELECT c.frame_id,
           sum(t.mass * (c.x*c.x + c.y*c.y + c.z*c.z)) AS srr,
           sum(t.mass * c.x) AS sx, sum(t.mass * c.y) AS sy,
           sum(t.mass * c.z) AS sz, sum(t.mass) AS sm
    FROM coords c JOIN top t USING (atom_id) GROUP BY c.frame_id
),
rg AS (
    SELECT frame_id AS t,
           round(sqrt(greatest(
               srr/sm - ((sx/sm)*(sx/sm) + (sy/sm)*(sy/sm) + (sz/sm)*(sz/sm)),
               0.0)) * 1048576.0) / 1048576.0 AS v
    FROM agg
),
st AS (SELECT t, CAST(floor(v / {bin_width!r}) AS BIGINT) AS state FROM rg)
SELECT a.state AS from_state, b.state AS to_state,
       CAST(count(*) AS BIGINT) AS n
FROM st a JOIN st b ON b.t = a.t + {lag}
GROUP BY a.state, b.state
"""


@register("x22_msm_transition_counts", _x22_oracle(0.015625, 2))
def q_msm_transition_counts(spark, sf_dir):
    """MSM transition counting on the Rg order parameter: dyadic
    1/64-wide state bins (exact integer assignment on the snapped
    grid), lag-2 pair counts — the count matrix a Markov state model
    row-normalizes."""
    from dask_traj_spark.operators.distance import (
        compute_radius_of_gyration,
        transition_counts,
    )
    from dask_traj_spark.queries import trajectory_from_embeddings

    traj = trajectory_from_embeddings(spark, sf_dir)
    rg = compute_radius_of_gyration(traj)
    return transition_counts(rg, "rg", bin_width=0.015625, lag=2)


@register("sx8_stream_transition_counts_twin", _x22_oracle(0.015625, 2))
def q_stream_transition_counts_twin(spark, sf_dir):
    """Incremental MSM counting vs the one-pass oracle: the Rg
    series replayed in three TIME-ORDERED batches through the
    boundary-carrying fold (each pair counted by the batch owning
    its later frame; earlier frames read from strictly-earlier
    state), with a crash-replay of the middle batch — merged counts
    must equal x22's full-series answer exactly."""
    import shutil
    import tempfile

    from dask_traj_spark.operators.distance import compute_radius_of_gyration
    from dask_traj_spark.queries import trajectory_from_embeddings
    from dask_traj_spark.streaming.dedup import (
        process_transition_batch,
        transition_counts_state,
    )

    traj = trajectory_from_embeddings(spark, sf_dir)
    rg = compute_radius_of_gyration(traj).select(
        F.col("frame_id"), F.col("rg").alias("v")
    )
    hi = rg.agg(F.max("frame_id")).first()[0] + 1
    cuts = [0, hi // 3, 2 * hi // 3, hi]
    work = tempfile.mkdtemp(prefix="sx8_msm_twin_")
    state, results = f"{work}/state", f"{work}/results"
    try:
        for bno in range(3):
            process_transition_batch(
                rg.where(
                    (F.col("frame_id") >= cuts[bno])
                    & (F.col("frame_id") < cuts[bno + 1])
                ),
                bno, state, results, bin_width=0.015625, lag=2,
            )
        # crash-replay of the middle batch: its state and results
        # partitions are rewritten; the earlier-state read excludes
        # its own partition, so the recount is identical
        process_transition_batch(
            rg.where(
                (F.col("frame_id") >= cuts[1]) & (F.col("frame_id") < cuts[2])
            ),
            1, state, results, bin_width=0.015625, lag=2,
        )
        pdf = (
            transition_counts_state(spark, results)
            .select("from_state", "to_state", F.col("n").cast("long").alias("n"))
            .toPandas()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(pdf, "from_state long, to_state long, n long")


_X21_ORACLE = """
SELECT CAST(f.ic AS BIGINT) AS ic,
       CAST(1 AS BIGINT) AS bounded_ok,
       CAST(1 AS BIGINT) AS order_ok,
       CAST(1 AS BIGINT) AS unit_var_ok,
       CAST(1 AS BIGINT) AS autocorr_ok
FROM range(3) f(ic)
ORDER BY ic
"""


@register("x21_tica_contract", _X21_ORACLE)
def q_tica_contract(spark, sf_dir):
    """tICA contract (x20 pattern): eigenvalues are lag-τ
    autocorrelations (|λ| ≤ 1, non-increasing); components are
    C00-orthonormal, so each projection has UNIT variance over the
    pair set; and the projections' empirical lag-τ autocorrelation
    reproduces λ — the defining property of a tICA basis."""
    import numpy as np

    from dask_traj_spark.operators.pca import pca_project, tica_fit
    from dask_traj_spark.queries import trajectory_from_embeddings

    traj = trajectory_from_embeddings(spark, sf_dir)
    atoms = list(range(24))
    lag = 2
    mu, comps, lam, n = tica_fit(traj, atoms, lag=lag, k=3)
    proj = (
        pca_project(traj, atoms, mu, comps)
        .orderBy("frame_id")
        .collect()
    )
    y = np.array([r["pc"] for r in proj])  # (n_frames, k)
    a, b = y[:-lag], y[lag:]
    rows = []
    for i in range(len(comps)):
        pa, pb = a[:, i], b[:, i]
        ma = (pa.mean() + pb.mean()) / 2.0
        var = ((pa - ma) ** 2).mean() / 2.0 + ((pb - ma) ** 2).mean() / 2.0
        ac = ((pa - ma) * (pb - ma)).mean() / var
        rows.append((
            i,
            int(abs(lam[i]) <= 1.0 + 1e-9),
            int(i == 0 or lam[i] <= lam[i - 1] + 1e-12),
            int(abs(var - 1.0) <= 1e-6),
            int(abs(ac - lam[i]) <= 1e-6),
        ))
    return spark.createDataFrame(
        rows,
        "ic long, bounded_ok long, order_ok long, unit_var_ok long, "
        "autocorr_ok long",
    )


_X19_QUERY_ATOMS = (0, 7, 42)


def _x19_oracle(cutoff: float) -> str:
    from dask_traj_spark.queries import COORDS_CTE

    qs = ", ".join(str(a) for a in _X19_QUERY_ATOMS)
    r2 = cutoff * cutoff
    return f"""
WITH {COORDS_CTE.strip()}
SELECT DISTINCT h.frame_id, h.atom_id
FROM coords h JOIN coords q
  ON q.frame_id = h.frame_id AND q.atom_id IN ({qs})
 AND h.atom_id <> q.atom_id
WHERE (h.x - q.x)*(h.x - q.x) + (h.y - q.y)*(h.y - q.y)
      + (h.z - q.z)*(h.z - q.z) <= {r2!r}
"""


@register("x19_compute_neighbors", _x19_oracle(0.0625))
def q_compute_neighbors(spark, sf_dir):
    """mdtraj compute_neighbors parity: atoms within the cutoff of
    any query atom, per frame — cell-list pruned in the engine,
    brute-forced by the oracle (the pruning is what the gate
    verifies, the x6/x18 pattern)."""
    from dask_traj_spark.operators.distance import compute_neighbors
    from dask_traj_spark.queries import trajectory_from_embeddings

    traj = trajectory_from_embeddings(spark, sf_dir)
    return compute_neighbors(traj, cutoff=0.0625,
                             query_indices=_X19_QUERY_ATOMS)


@register("x6_neighbor_pairs", _neighbor_oracle(0.0625))
def q_neighbor_pairs(spark, sf_dir):
    """Cell-list neighbor search over ALL atoms (no driver pair
    enumeration): bin to cutoff-sized cells, 27-offset equi-join,
    exact distance trim. The oracle is the O(n²) brute-force filter —
    tractable at oracle scale, which is exactly the point: the
    engine's plan is the one that survives when n² does not."""
    from dask_traj_spark.operators.distance import neighbor_pairs
    from dask_traj_spark.queries import trajectory_from_embeddings

    traj = trajectory_from_embeddings(spark, sf_dir)
    return neighbor_pairs(traj, cutoff=0.0625).select(
        "frame_id", "i", "j", F.col("dist").cast("double").alias("dist")
    )


_X7_ORACLE = f"""
SELECT CAST(f.frame_id AS BIGINT) AS frame_id, CAST(1 AS BIGINT) AS ok
FROM range({21}) f(frame_id)
ORDER BY frame_id
"""


@register("x7_superpose_contract", _X7_ORACLE)
def q_superpose_contract(spark, sf_dir):
    """Contract gate for the superpose TRANSFORM: after rigidly
    aligning every frame onto the query frame, the plain
    coordinate-space RMSD against the (self-superposed) query must
    equal frame_rmsd_aligned of the ORIGINAL trajectory — i.e. the
    emitted coordinates actually realize the optimal rotation, not
    just its residual. Tolerance 1e-5 absorbs float32 coordinate
    storage; a wrong rotation/reflection/centering shifts RMSD by
    ~0.1 and fails every frame."""
    from dask_traj_spark.operators.rmsd import frame_rmsd_aligned, superpose
    from dask_traj_spark.queries import trajectory_from_embeddings

    Q = 5
    traj = trajectory_from_embeddings(spark, sf_dir)
    sup = superpose(traj, Q)
    qref = F.broadcast(
        sup.where(F.col("frame_id") == Q).select(
            "atom_id",
            F.col("x").alias("qx"),
            F.col("y").alias("qy"),
            F.col("z").alias("qz"),
        )
    )
    dx = F.col("x").cast("double") - F.col("qx").cast("double")
    dy = F.col("y").cast("double") - F.col("qy").cast("double")
    dz = F.col("z").cast("double") - F.col("qz").cast("double")
    plain = (
        sup.join(qref, "atom_id")
        .groupBy("frame_id")
        .agg(F.sqrt(F.avg(dx * dx + dy * dy + dz * dz)).alias("rmsd_sup"))
    )
    aligned = frame_rmsd_aligned(traj, Q).withColumnRenamed("rmsd", "rmsd_aln")
    return (
        plain.join(aligned, "frame_id")
        .select(
            "frame_id",
            (F.abs(F.col("rmsd_sup") - F.col("rmsd_aln")) < 1e-5)
            .cast("long")
            .alias("ok"),
        )
        .orderBy("frame_id")
    )


_E6_ORACLE = """
WITH w AS (
    SELECT user_id,
           (epoch_us(ts) // 1000000) // 86400 AS wk
    FROM events
),
cohort AS (SELECT user_id, min(wk) AS cw FROM w GROUP BY user_id)
SELECT CAST(c.cw AS BIGINT) AS cohort_day,
       CAST(w.wk - c.cw AS BIGINT) AS day_offset,
       CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_users
FROM w JOIN cohort c USING (user_id)
GROUP BY c.cw, w.wk - c.cw
ORDER BY cohort_day, day_offset
"""


@register("e6_cohort_retention", _E6_ORACLE)
def q_cohort_retention(spark, sf_dir):
    """Cohort retention — the classic event-analytics triangle:
    users bucketed by first-seen epoch day, distinct active users
    per (cohort, day offset). Day ids are pure epoch-seconds
    integer division (no calendar/timezone semantics to disagree
    on). Two aggregations, both shuffling only on user_id / the
    tiny (cohort, offset) key."""
    from dask_traj_spark.sources.events import events_df

    ev = events_df(spark, sf_dir)
    w = ev.select(
        "user_id",
        (F.col("ts").cast("long") / F.lit(86400)).cast("long").alias("wk"),
    )
    cohort = w.groupBy("user_id").agg(F.min("wk").alias("cw"))
    return (
        w.join(cohort, "user_id")
        .groupBy(
            F.col("cw").alias("cohort_day"),
            (F.col("wk") - F.col("cw")).alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


#: shared t9 CTE chain (bigram explode → MLE model → per-doc score) —
#: one definition for the t9 gate and the t23 bucket gate (the
#: d14/d15 shared-fragment rule), ending at ``t9sc(doc_id,
#: n_bigrams, avg_logprob)``.
_T9_CTES = """bigrams AS (
    SELECT d.doc_id, substr(d.text, u.i, 2) AS bg
    FROM documents d, unnest(generate_series(1, length(d.text) - 1)) AS u(i)
),
counts AS (SELECT bg, count(*) AS n_bg FROM bigrams GROUP BY bg),
c1_tot AS (
    SELECT substr(bg, 1, 1) AS c1, sum(n_bg) AS n_c1
    FROM counts GROUP BY substr(bg, 1, 1)
),
model AS (
    SELECT c.bg,
           round(ln(CAST(c.n_bg AS DOUBLE) / CAST(t.n_c1 AS DOUBLE)) * 1048576.0)
               / 1048576.0 AS lp
    FROM counts c JOIN c1_tot t ON substr(c.bg, 1, 1) = t.c1
),
t9sc AS (
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(sum(m.lp) / count(*), 6) AS avg_logprob
    FROM bigrams b JOIN model m USING (bg)
    GROUP BY b.doc_id
)"""

_T9_ORACLE = f"""
WITH {_T9_CTES}
SELECT doc_id, n_bigrams, avg_logprob FROM t9sc
"""


@register("t9_char_bigram_logprob", _T9_ORACLE)
def q_char_bigram_logprob(spark, sf_dir):
    """Corpus-self char-bigram mean log-probability (model-based
    fluency filter). The model's per-bigram ln values are snapped to
    the 2^-20 grid before aggregation — ln is not correctly-rounded
    (engines can differ by an ulp) and the per-doc sum must be
    order-independent; quantized values sum exactly."""
    from dask_traj_spark.functions.text import char_bigram_logprob

    return char_bigram_logprob(_docs(spark, sf_dir))


def _dihedral_oracle() -> str:
    from dask_traj_spark.queries import COORDS_CTE

    n = 10  # quartets from the first 10 atoms
    return f"""
WITH {COORDS_CTE.strip()},
quartets AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY i.a, j.b, k.c, l.d) - 1 AS INT) AS quartet_id,
           CAST(i.a AS INT) AS i, CAST(j.b AS INT) AS j,
           CAST(k.c AS INT) AS k, CAST(l.d AS INT) AS l
    FROM range({n}) i(a), range({n}) j(b), range({n}) k(c), range({n}) l(d)
    WHERE i.a < j.b AND j.b < k.c AND k.c < l.d
),
c10 AS (SELECT * FROM coords WHERE atom_id < {n}),
legs AS (
    SELECT cj.frame_id, q.quartet_id,
           cj.x - ci.x AS b1x, cj.y - ci.y AS b1y, cj.z - ci.z AS b1z,
           ck.x - cj.x AS b2x, ck.y - cj.y AS b2y, ck.z - cj.z AS b2z,
           cl.x - ck.x AS b3x, cl.y - ck.y AS b3y, cl.z - ck.z AS b3z
    FROM quartets q
    JOIN c10 ci ON ci.atom_id = q.i
    JOIN c10 cj ON cj.atom_id = q.j AND cj.frame_id = ci.frame_id
    JOIN c10 ck ON ck.atom_id = q.k AND ck.frame_id = ci.frame_id
    JOIN c10 cl ON cl.atom_id = q.l AND cl.frame_id = ci.frame_id
),
cr AS (
    SELECT frame_id, quartet_id, b1x, b1y, b1z, b2x, b2y, b2z,
           b2y*b3z - b2z*b3y AS c23x,
           b2z*b3x - b2x*b3z AS c23y,
           b2x*b3y - b2y*b3x AS c23z,
           b1y*b2z - b1z*b2y AS c12x,
           b1z*b2x - b1x*b2z AS c12y,
           b1x*b2y - b1y*b2x AS c12z
    FROM legs
)
SELECT frame_id, quartet_id,
       round(atan2(
           sqrt(b2x*b2x + b2y*b2y + b2z*b2z)
               * (b1x*c23x + b1y*c23y + b1z*c23z),
           c12x*c23x + c12y*c23y + c12z*c23z
       ), 6) AS dihedral_rad
FROM cr
"""


@register("x8_dihedrals", _dihedral_oracle())
def q_dihedrals(spark, sf_dir):
    """Signed torsions over all C(10,4)=210 quartets of the first 10
    atoms — the angles stitch widened to four roles. Non-periodic;
    every cross/dot is an exact product of dyadic-grid displacements,
    so only atan2 is transcendental (round-6 double, policy item 3)."""
    import itertools

    from dask_traj_spark.operators.angle import compute_dihedrals
    from dask_traj_spark.queries import trajectory_from_embeddings

    traj = trajectory_from_embeddings(spark, sf_dir)
    quartets = list(itertools.combinations(range(10), 4))
    return compute_dihedrals(
        traj, quartets, periodic=False, form="sql", n_atoms=10,
        _round6_double=True,
    )


def _msd_oracle(max_lag: int) -> str:
    from dask_traj_spark.queries import COORDS_CTE

    return f"""
WITH {COORDS_CTE.strip()}
SELECT CAST(c2.frame_id - c1.frame_id AS BIGINT) AS lag,
       CAST(count(*) AS BIGINT) AS n_samples,
       avg((c2.x-c1.x)*(c2.x-c1.x) + (c2.y-c1.y)*(c2.y-c1.y)
           + (c2.z-c1.z)*(c2.z-c1.z)) AS msd
FROM coords c1
JOIN coords c2 ON c2.atom_id = c1.atom_id
              AND c2.frame_id > c1.frame_id
              AND c2.frame_id <= c1.frame_id + {max_lag}
GROUP BY c2.frame_id - c1.frame_id
ORDER BY lag
"""


@register("x9_msd", _msd_oracle(8))
def q_msd(spark, sf_dir):
    """Mean squared displacement vs time lag (diffusion curve) via
    the banded time-lag self-join. Squared displacements of dyadic
    grid coords are exact, so the per-lag average is partial-agg-
    order independent."""
    from dask_traj_spark.operators.distance import mean_squared_displacement
    from dask_traj_spark.queries import trajectory_from_embeddings

    traj = trajectory_from_embeddings(spark, sf_dir)
    return mean_squared_displacement(traj, max_lag=8).orderBy("lag")


@register("sx2_stream_exact_dedup_twin", _D1_ORACLE)
def q_stream_exact_dedup_twin(spark, sf_dir):
    """Streaming exact dedup vs the SQL value oracle directly: replay
    the corpus in three deterministic micro-batches through the
    foreachBatch body (per-batch mergeable partials, batch_id-
    partitioned state, dynamic-overwrite replay idempotence) — the
    merged state must equal d1's full-corpus answer VALUE-FOR-VALUE
    (not just a contract row; the partial agg is associative, so the
    stream and the one-pass batch are bit-identical)."""
    import shutil
    import tempfile

    from dask_traj_spark.streaming.dedup import (
        exact_dedup_state,
        process_exact_dedup_batch,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="sx2_exact_twin_")
    state = f"{work}/state"
    try:
        for b in range(3):
            process_exact_dedup_batch(
                docs.where(F.col("doc_id") % 3 == b), b, state
            )
        # simulate a crash-replay of the middle batch: the partition
        # is rewritten in place and the merge must not double-count
        process_exact_dedup_batch(
            docs.where(F.col("doc_id") % 3 == 1), 1, state
        )
        out = exact_dedup_state(spark, state)
        # materialize before the tempdir vanishes
        pdf = out.toPandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(pdf, "h string, keep_id long, n long")


@register(
    "sx6_stream_semantic_dedup_twin",
    _d6_oracle(0.3, n_bits=6, max_cluster=10**9),
)
def q_stream_semantic_twin(spark, sf_dir):
    """Incremental SemDeDup vs d6's value oracle directly: replay
    the embedding corpus in three ID-ORDERED micro-batches through
    the foreachBatch body (state = cluster members partitioned by
    batch, decisions computed against strictly-earlier state — the
    close-is-final shape), with a crash-replay of the middle batch
    simulated in-query.  The union of per-batch decisions must
    equal the one-shot batch operator VALUE-FOR-VALUE (same grid
    quantization + gram kernel, drop rule quantifies over smaller
    ids only, all already in state under id ordering).  Uncapped on
    both sides: the cluster cap is corpus-global in batch but
    prefix-local in streaming — sx1's documented asymmetry."""
    import shutil
    import tempfile

    from dask_traj_spark.streaming.dedup import (
        process_semantic_batch,
        semantic_dedup_results,
    )

    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    hi = emb.agg(F.max("vec_id")).first()[0] + 1
    cuts = [0, hi // 3, 2 * hi // 3, hi]
    work = tempfile.mkdtemp(prefix="sx6_semantic_twin_")
    state, results = f"{work}/state", f"{work}/results"
    try:
        for b in range(3):
            process_semantic_batch(
                emb.where(
                    (F.col("vec_id") >= cuts[b]) & (F.col("vec_id") < cuts[b + 1])
                ),
                b, state, results, threshold=0.3, n_bits=6,
            )
        # crash-replay of the middle batch: both its state and its
        # decisions partitions are rewritten in place; the state read
        # excludes the batch's own partition, so the recomputation is
        # bit-identical
        process_semantic_batch(
            emb.where(
                (F.col("vec_id") >= cuts[1]) & (F.col("vec_id") < cuts[2])
            ),
            1, state, results, threshold=0.3, n_bits=6,
        )
        out = semantic_dedup_results(spark, results)
        pdf = out.select(
            "vec_id", "cluster", F.col("keep").cast("long").alias("keep")
        ).toPandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(pdf, "vec_id long, cluster long, keep long")


# m12 gates content sniffing: six payload families built by the
# real encoders, routed by doc_id % 6 (r6: the ISO-BMFF family
# joined when the mp4 sniff branch landed), with the %6==4 slice
# deliberately MISLABELED (BMP bytes declared image/png) — the
# oracle predicts declared kind, sniffed kind and the match flag
# from doc_id alone.
_M12_ORACLE = """
SELECT doc_id,
       CASE doc_id % 6
            WHEN 0 THEN 'image/bmp'
            WHEN 1 THEN 'image/png'
            WHEN 2 THEN 'image/jpeg'
            WHEN 3 THEN 'audio/wav'
            WHEN 5 THEN 'video/mp4'
            ELSE 'image/png' END AS kind,
       CASE doc_id % 6
            WHEN 0 THEN 'image/bmp'
            WHEN 1 THEN 'image/png'
            WHEN 2 THEN 'image/jpeg'
            WHEN 3 THEN 'audio/wav'
            WHEN 5 THEN 'video/mp4'
            ELSE 'image/bmp' END AS sniffed_kind,
       CAST(CASE WHEN doc_id % 6 = 4 THEN 0 ELSE 1 END AS BIGINT) AS match
FROM documents
"""


@register("m12_sniff_kind", _M12_ORACLE)
def q_sniff_kind(spark, sf_dir):
    from dask_traj_spark.operators.multimodal import (
        attach_payload_bmp,
        attach_payload_jpeg,
        attach_payload_mp4,
        attach_payload_png,
        attach_payload_wav,
        sniff_kind,
    )

    docs = _docs(spark, sf_dir)
    pick = lambda r: docs.where(F.col("doc_id") % 6 == r)  # noqa: E731
    media = (
        attach_payload_bmp(pick(0))
        .unionByName(attach_payload_png(pick(1)))
        .unionByName(attach_payload_jpeg(pick(2)))
        .unionByName(attach_payload_wav(pick(3)))
        .unionByName(
            # mislabeled slice: BMP bytes, PNG label
            attach_payload_bmp(pick(4)).withColumn("kind", F.lit("image/png"))
        )
        .unionByName(attach_payload_mp4(pick(5)))
    )
    return sniff_kind(media)


# m13 gates the ISO-BMFF demux value-level: every field the box walk
# produces (tkhd dimensions, stsd codec, mdhd/mvhd timing, stsz/stsc/
# stco-resolved sample byte ranges) is closed-form in doc_id, and
# s0_head_sum proves the resolved offsets land on the actual sample
# bytes in mdat — a wrong chunk offset or size table shifts the sum.
_M13_ORACLE = f"""
SELECT doc_id,
       'mp4' AS container,
       'avc1' AS codec,
       CAST(16 * (1 + doc_id % 4) AS INT) AS width,
       CAST(16 * (1 + doc_id % 3) AS INT) AS height,
       CAST(2 + doc_id % 3 AS INT) AS n_samples,
       CAST(10 AS BIGINT) AS timescale,
       CAST(2 + doc_id % 3 AS BIGINT) AS duration_ticks,
       CAST(8 * (2 + doc_id % 3) AS BIGINT) AS total_sample_bytes,
       CAST({' + '.join(f'(31 * doc_id + {j}) % 256' for j in range(8))}
            AS BIGINT) AS s0_head_sum
FROM documents
"""


@register("m13_video_container_stats", _M13_ORACLE)
def q_video_container_stats(spark, sf_dir):
    from dask_traj_spark.operators.multimodal import (
        attach_payload_mp4,
        video_container_stats,
    )

    return video_container_stats(attach_payload_mp4(_docs(spark, sf_dir)))


# m14 gates per-codec corpus triage (the m13 follow-up, VERDICT r9
# item 6c): six payload classes by doc_id % 6 — four MP4 codec
# fourccs (avc1/hev1/vp09/av01), one AVI, and one MISLABELED slice
# (BMP bytes declared video/mp4) that must route by SNIFF into the
# non-video bucket.  Every aggregate is closed-form in doc_id: mp4
# n_samples = 2 + d%3 at 8 bytes each, width 16·(1 + d%4); the AVI
# fixture is 3 frames of 4×2 24-bit DIB = 72 decoded bytes at
# width 4.
_M14_ORACLE = """
WITH f AS (SELECT doc_id, doc_id % 6 AS r FROM documents),
v AS (
    SELECT CASE WHEN r <= 3 THEN 'mp4' WHEN r = 4 THEN 'avi'
                ELSE 'none' END AS container,
           CASE r WHEN 0 THEN 'avc1' WHEN 1 THEN 'hev1'
                  WHEN 2 THEN 'vp09' WHEN 3 THEN 'av01'
                  WHEN 4 THEN 'DIB' ELSE 'image/bmp' END AS codec,
           CASE WHEN r <= 3 THEN 2 + doc_id % 3
                WHEN r = 4 THEN 3 ELSE 0 END AS ns,
           CASE WHEN r <= 3 THEN 8 * (2 + doc_id % 3)
                WHEN r = 4 THEN 72 ELSE 0 END AS nb,
           CASE WHEN r <= 3 THEN 16 * (1 + doc_id % 4)
                WHEN r = 4 THEN 4 ELSE 0 END AS w
    FROM f
)
SELECT container, codec,
       CAST(count(*) AS BIGINT) AS n_videos,
       CAST(sum(ns) AS BIGINT) AS n_samples,
       CAST(sum(nb) AS BIGINT) AS total_sample_bytes,
       CAST(min(w) AS BIGINT) AS min_width,
       CAST(max(w) AS BIGINT) AS max_width
FROM v GROUP BY container, codec
"""


@register("m14_video_codec_mix", _M14_ORACLE)
def q_video_codec_mix(spark, sf_dir):
    """Sniff-routed per-codec triage over a mixed-container corpus;
    the %6==5 slice is deliberately mislabeled (BMP bytes, mp4
    label) and must land in the 'none' bucket — the operator trusts
    magic bytes, never the label.  See
    :func:`dask_traj_spark.operators.multimodal.video_codec_mix`."""
    from dask_traj_spark.operators.multimodal import (
        attach_payload_avi,
        attach_payload_bmp,
        attach_payload_mp4,
        video_codec_mix,
    )

    docs = _docs(spark, sf_dir)
    pick = lambda r: docs.where(F.col("doc_id") % 6 == r)  # noqa: E731
    fourcc = {0: b"avc1", 1: b"hev1", 2: b"vp09", 3: b"av01"}
    media = attach_payload_mp4(pick(0), codec_fn=lambda d: fourcc[0])
    for r in (1, 2, 3):
        media = media.unionByName(
            attach_payload_mp4(pick(r), codec_fn=lambda d, r=r: fourcc[r])
        )
    media = media.unionByName(attach_payload_avi(pick(4)))
    media = media.unionByName(
        attach_payload_bmp(pick(5)).withColumn("kind", F.lit("video/mp4"))
    )
    return video_codec_mix(media)


# d9 gates URL-canonicalization dedup: URLs synthesized from doc_id
# (the corpus has no url column) with deliberate case/port/tracking/
# fragment/trailing-slash noise; both engines canonicalize with the
# same regex chain (only the $1-vs-\1 replacement spelling differs)
# and group.  Variants %4∈{2,3} collapse per page; %4==1 keeps a real
# query param and %4==0 a mid-token-'utm_' param (anchoring test) —
# both stay distinct.
_D9_ORACLE = r"""
WITH u AS (
    SELECT doc_id,
           'HTTPS://WWW.Example' || CAST(doc_id % 5 AS VARCHAR)
           || '.COM:443/Page/' || CAST(doc_id // 20 AS VARCHAR)
           || CASE doc_id % 4
                WHEN 1 THEN '?utm_source=feed&id=7'
                WHEN 2 THEN '#section2'
                WHEN 3 THEN '/'
                ELSE '?xutm_source=keep' END AS url
    FROM documents
),
c AS (
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       lower(regexp_extract(regexp_replace(url, '#.*$', ''),
                                            '^([^/]+://[^/]+)', 1))
                       || regexp_replace(regexp_replace(url, '#.*$', ''),
                                         '^[^/]+://[^/]+', ''),
                       '^(https://[^/:]+):443($|/)', '\1\2'),
                     '^(http://[^/:]+):80($|/)', '\1\2'),
                   '([?&])(utm_[a-z]+|fbclid|gclid)=[^&#]*', '\1', 'g'),
                 '([?&])&+', '\1', 'g'),
               '[?&]$', ''),
             '/$', '') AS canonical_url
    FROM u
)
SELECT canonical_url,
       CAST(min(doc_id) AS BIGINT) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_variants
FROM c GROUP BY canonical_url
"""


@register("d9_url_canonical_dedup", _D9_ORACLE)
def q_url_canonical_dedup(spark, sf_dir):
    from dask_traj_spark.operators.dedup import url_duplicates

    doc = F.col("doc_id")
    urls = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://WWW.Example"), (doc % 5).cast("string"),
            F.lit(".COM:443/Page/"), F.floor(doc / 20).cast("long").cast("string"),
            # %4==0 carries a mid-token 'utm_' that must be KEPT —
            # the unanchored-regex regression case (ADVICE r5): an
            # unanchored strip collapses it to '?x' and hash-fails
            F.when(doc % 4 == 1, F.lit("?utm_source=feed&id=7"))
            .when(doc % 4 == 2, F.lit("#section2"))
            .when(doc % 4 == 3, F.lit("/"))
            .otherwise(F.lit("?xutm_source=keep")),
        ).alias("url"),
    )
    return url_duplicates(urls)


# t14 gates the count-min sketch VALUE-level (not just a contract):
# both engines build the identical sketch in 'mult' mode (sorted-
# vocab tid × public multiplicative mixers), probe it for the exact
# top-10 tokens, and emit (word, true_n, est, never_under).  The
# oracle reproduces the whole construction, so a wrong cell key, a
# max instead of min, or a dropped depth row hash-fails — and the
# deterministic CMS guarantee est ≥ true is value-checked per word.
_T14_ORACLE = """
WITH w AS (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
v AS (
    SELECT word, CAST(row_number() OVER (ORDER BY word) AS BIGINT) AS tid
    FROM (SELECT DISTINCT word FROM w)
),
keyed AS (SELECT v.tid AS key FROM w JOIN v USING (word)),
mix(row_id, m) AS (VALUES (0, 2654435761), (1, 2246822519),
                          (2, 3266489917), (3, 668265263)),
cells AS (
    SELECT row_id, ((key * m) % 4294967296) % 1024 AS col,
           CAST(count(*) AS BIGINT) AS n
    FROM keyed, mix GROUP BY row_id, ((key * m) % 4294967296) % 1024
),
true_counts AS (
    SELECT word, CAST(count(*) AS BIGINT) AS true_n FROM w GROUP BY word
),
top10 AS (
    SELECT word, true_n FROM true_counts
    ORDER BY true_n DESC, word ASC LIMIT 10
),
probes AS (
    SELECT t.word, t.true_n, x.row_id,
           ((v.tid * x.m) % 4294967296) % 1024 AS col
    FROM top10 t JOIN v USING (word), mix x
),
est AS (
    -- LEFT join: an empty (never-incremented) cell counts as 0 in
    -- the min — same semantics as count_min_estimate
    SELECT p.word, p.true_n, min(coalesce(c.n, 0)) AS est
    FROM probes p LEFT JOIN cells c
      ON c.row_id = p.row_id AND c.col = p.col
    GROUP BY p.word, p.true_n
)
SELECT word, true_n, est,
       CAST(CASE WHEN est >= true_n THEN 1 ELSE 0 END AS BIGINT)
           AS never_under
FROM est
"""


@register("t14_count_min_heavy_hitters", _T14_ORACLE)
def q_count_min_heavy_hitters(spark, sf_dir):
    from dask_traj_spark.functions.text import (
        count_min_cells,
        count_min_estimate,
        tokens,
    )

    docs = _docs(spark, sf_dir)
    cells = count_min_cells(docs, id_mode="mult")
    true_counts = (
        tokens(docs).groupBy("word").agg(F.count(F.lit(1)).alias("true_n"))
    )
    top10 = true_counts.orderBy(
        F.col("true_n").desc(), F.col("word").asc()
    ).limit(10)
    est = count_min_estimate(
        cells, top10.select("word"), id_mode="mult", corpus=docs
    )
    return top10.join(est, "word").select(
        "word",
        "true_n",
        "est",
        (F.col("est") >= F.col("true_n")).cast("long").alias("never_under"),
    )


# sx7 gates the STREAMING count-min fold value-level: three
# micro-batch partials + a crash-replay of the middle batch, merged
# by cell-wise sum, must equal the one-pass corpus sketch the oracle
# rebuilds (cells are associative — the sx2 class of exactly-once).
_SX7_ORACLE = """
WITH w AS (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
v AS (
    SELECT word, CAST(row_number() OVER (ORDER BY word) AS BIGINT) AS tid
    FROM (SELECT DISTINCT word FROM w)
),
keyed AS (SELECT v.tid AS key FROM w JOIN v USING (word)),
mix(row_id, m) AS (VALUES (0, 2654435761), (1, 2246822519),
                          (2, 3266489917), (3, 668265263))
SELECT CAST(row_id AS BIGINT) AS row,
       CAST(((key * m) % 4294967296) % 1024 AS BIGINT) AS col,
       CAST(count(*) AS BIGINT) AS n
FROM keyed, mix GROUP BY row_id, ((key * m) % 4294967296) % 1024
"""


@register("sx7_stream_count_min_twin", _SX7_ORACLE)
def q_stream_count_min_twin(spark, sf_dir):
    """Incremental count-min vs the one-pass sketch: per-batch cell
    partials are pure functions of their own rows (associative
    sums), so the merged state equals the batch sketch regardless of
    batch order or replay — simulated here with a middle-batch
    crash-replay.  Keys use the corpus vocab in 'mult' mode only for
    oracle portability; production 'hashed' keys are
    batch-independent by construction."""
    import shutil
    import tempfile

    from dask_traj_spark.functions.text import tokens, vocab
    from dask_traj_spark.streaming.dedup import cms_state, process_cms_batch

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    vdf = vocab(tokens(docs).select("word"))
    work = tempfile.mkdtemp(prefix="sx7_cms_twin_")
    state = f"{work}/state"
    try:
        for b in range(3):
            process_cms_batch(
                docs.where(F.col("doc_id") % 3 == b), b, state,
                id_mode="mult", vocab_df=vdf,
            )
        # crash-replay of the middle batch: its partition is
        # rewritten identically, the merge must not double-count
        process_cms_batch(
            docs.where(F.col("doc_id") % 3 == 1), 1, state,
            id_mode="mult", vocab_df=vdf,
        )
        pdf = (
            cms_state(spark, state)
            .select(
                F.col("row").cast("long").alias("row"),
                F.col("col").cast("long").alias("col"),
                F.col("n").cast("long").alias("n"),
            )
            .toPandas()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(pdf, "row long, col long, n long")


def _t13_oracle() -> str:
    # generated from MOJIBAKE_MAP so the artifact table and the exact
    # length-diff counting formula are shared verbatim with the engine
    from dask_traj_spark.functions.text import MOJIBAKE_MAP

    q = lambda x: x.replace("'", "''")  # noqa: E731
    counts = " + ".join(
        f"(length(t) - length(replace(t, '{q(k)}', ''))) / {len(k)}"
        for k in MOJIBAKE_MAP
    )
    repaired = "t"
    for k, v in MOJIBAKE_MAP.items():
        repaired = f"replace({repaired}, '{q(k)}', '{q(v)}')"
    return f"""
WITH e AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 3 = 0 THEN ' cafÃ© crÃ¨me' ELSE '' END
           || CASE WHEN doc_id % 4 = 0 THEN ' donâ€™t â€œsay' ELSE '' END
           || CASE WHEN doc_id % 7 = 0 THEN ' 25Â° Ã¼ber maÃ±ana' ELSE '' END
               AS t
    FROM documents
)
SELECT doc_id,
       CAST({counts} AS BIGINT) AS n_artifacts,
       CAST(CASE WHEN {counts} > 0 THEN 1 ELSE 0 END AS BIGINT) AS flagged,
       CAST(length(t) AS BIGINT) AS n_chars,
       CAST(length({repaired}) AS BIGINT) AS n_chars_repaired
FROM e
"""


@register("t13_mojibake", _t13_oracle())
def q_mojibake(spark, sf_dir):
    """Encoding-damage stats over a deterministically mojibake-
    enriched corpus (the synthetic documents are clean ASCII, so both
    engines append doc_id-derived damaged spans before scanning — the
    t10 fixture-synthesis pattern)."""
    from dask_traj_spark.functions.text import mojibake_stats

    doc = F.col("doc_id")
    opt = lambda cond, lit: F.when(cond, F.lit(lit)).otherwise(F.lit(""))  # noqa: E731
    enriched = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            opt(doc % 3 == 0, " cafÃ© crÃ¨me"),
            opt(doc % 4 == 0, " donâ€™t â€œsay"),
            opt(doc % 7 == 0, " 25Â° Ã¼ber maÃ±ana"),
        ).alias("text"),
    )
    return mojibake_stats(enriched)


def _m5_oracle() -> str:
    # per (doc, frame): frame f's pixels are text bytes [24f, 24f+24);
    # stats over the first 8 of them (0 past end-of-text)
    b = lambda i: (  # noqa: E731
        f"CASE WHEN nb >= 24*f.frame_idx + {i} "
        f"THEN ord(substr(text, 24*f.frame_idx + {i}, 1)) ELSE 0 END"
    )
    cols = [b(i) for i in range(1, 9)]
    total = " + ".join(cols)
    least = "least(" + ", ".join(cols) + ")"
    greatest = "greatest(" + ", ".join(cols) + ")"
    return f"""
WITH m AS (
    SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS nb, text
    FROM documents
)
SELECT m.doc_id,
       CAST(f.frame_idx AS INT) AS frame_idx,
       CAST(4 AS INT) AS width, CAST(2 AS INT) AS height,
       CAST({total} AS BIGINT) AS head_sum,
       CAST({least} AS BIGINT) AS head_min,
       CAST({greatest} AS BIGINT) AS head_max
FROM m CROSS JOIN range(3) f(frame_idx)
"""


@register("m5_decode_avi_frames", _m5_oracle())
def q_decode_avi_frames(spark, sf_dir):
    """REAL video pipeline end to end: text bytes → uncompressed AVI
    (RIFF container, 3 raw-DIB frames) → container walk + per-frame
    DIB decode (stride strip, row flip) → per-frame byte-head stats.
    The oracle predicts every frame's decoded pixels from the text —
    a decoder that misparsed the RIFF tree or forgot the row flip
    hash-fails on every frame past the first byte row."""
    from dask_traj_spark.operators.multimodal import (
        attach_payload_avi,
        decode_avi_frames,
    )

    frames = decode_avi_frames(attach_payload_avi(_docs(spark, sf_dir)))
    # byte i of the binary column, JVM-side: two hex chars -> BIGINT
    head = F.expr(
        "transform(sequence(0, 7), "
        "i -> CAST(conv(substring(hex(frame_bytes), 2*i + 1, 2), 16, 10) AS BIGINT))"
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        "width",
        "height",
        F.aggregate(head, F.lit(0).cast("long"), lambda a, x: a + x).alias("head_sum"),
        F.array_min(head).alias("head_min"),
        F.array_max(head).alias("head_max"),
    )


_M6_ORACLE = """
WITH m AS (
    SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS nb, text
    FROM documents
), f AS (
    SELECT doc_id,
           CASE WHEN nb >= 1 THEN (ord(substr(text, 1, 1)) - 128) * 256 ELSE 0 END AS s1,
           CASE WHEN nb >= 2 THEN (ord(substr(text, 2, 1)) - 128) * 256 ELSE 0 END AS s2,
           CASE WHEN nb >= 3 THEN (ord(substr(text, 3, 1)) - 128) * 256 ELSE 0 END AS s3,
           CASE WHEN nb >= 4 THEN (ord(substr(text, 4, 1)) - 128) * 256 ELSE 0 END AS s4,
           CASE WHEN nb >= 5 THEN (ord(substr(text, 5, 1)) - 128) * 256 ELSE 0 END AS s5,
           CASE WHEN nb >= 6 THEN (ord(substr(text, 6, 1)) - 128) * 256 ELSE 0 END AS s6,
           CASE WHEN nb >= 7 THEN (ord(substr(text, 7, 1)) - 128) * 256 ELSE 0 END AS s7,
           CASE WHEN nb >= 8 THEN (ord(substr(text, 8, 1)) - 128) * 256 ELSE 0 END AS s8
    FROM m
)
SELECT doc_id,
       CAST(32 AS INT) AS n_frames,
       CAST(1 AS INT) AS channels,
       CAST(s1+s2+s3+s4+s5+s6+s7+s8 AS BIGINT) AS samp_sum,
       CAST(least(s1,s2,s3,s4,s5,s6,s7,s8) AS BIGINT) AS samp_min,
       CAST(greatest(s1,s2,s3,s4,s5,s6,s7,s8) AS BIGINT) AS samp_max
FROM f
"""


@register("m6_decode_wav", _M6_ORACLE)
def q_decode_wav(spark, sf_dir):
    """REAL audio path gate: text byte head → PCM-16 WAV (proper
    RIFF chunks) → decode_wav → sample-head stats. Sample values
    (b−128)·256 round-trip float32 exactly (|s| ≤ 32512 and the
    /32768 scaling is dyadic), so the stats are exact integers."""
    from dask_traj_spark.operators.multimodal import (
        attach_payload_wav,
        decode_and_featurize,
    )

    decoded = decode_and_featurize(
        attach_payload_wav(_docs(spark, sf_dir)), strict=True
    )
    sb = F.transform("features", lambda f: F.round(f * 32768, 0).cast("long"))
    return decoded.select(
        "doc_id",
        F.col("width").alias("n_frames"),
        "channels",
        F.aggregate(sb, F.lit(0).cast("long"), lambda a, x: a + x).alias("samp_sum"),
        F.array_min(sb).alias("samp_min"),
        F.array_max(sb).alias("samp_max"),
    )


_V5_ORACLE = """
SELECT CAST(f.qid AS BIGINT) AS qid, CAST(1 AS BIGINT) AS recall_ok
FROM range(10) f(qid)
ORDER BY qid
"""


@register("v5_pq_recall", _V5_ORACLE)
def q_pq_recall(spark, sf_dir):
    """Product-quantization ANN contract (v4 pattern): ADC top-100
    candidates over 32×-compressed codes (m=16 subspaces × 64
    centroids) → exact quantized-cosine rerank of just those
    candidates → top-10 must recover ≥ 60% of the true exact top-10
    per query. Codebooks are seeded k-means (not SQL-expressible),
    so the oracle pins the contract flags; value-level cosine
    evidence comes from v1's oracle."""
    from dask_traj_spark.operators.similarity import (
        _quantized_elements,
        cosine_topk,
        pq_topk,
    )

    emb = _emb(spark, sf_dir)
    qids = list(range(10))
    cand = pq_topk(emb, qids, k=100, m=16, n_codes=64).select("qid", "vec_id")
    e1 = _quantized_elements(
        emb.where(F.col("vec_id").isin(qids)), "vec_id", "qv"
    ).withColumnRenamed("qv", "qid")
    e2 = _quantized_elements(emb, "vec_id", "cv").withColumnRenamed("cv", "vec_id")
    scored = (
        cand.join(F.broadcast(e1.withColumnRenamed("v_qv", "vq")), "qid")
        .join(e2.withColumnRenamed("v_cv", "vc"), ["vec_id", "pos"])
        .groupBy("qid", "vec_id")
        .agg(
            F.sum(F.col("vq") * F.col("vc")).alias("dot"),
            F.sum(F.col("vq") * F.col("vq")).alias("n1"),
            F.sum(F.col("vc") * F.col("vc")).alias("n2"),
        )
        .select(
            "qid", "vec_id",
            (F.col("dot") / (F.sqrt("n1") * F.sqrt("n2"))).alias("cos"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    pq10 = scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 10)
    exact10 = cosine_topk(emb, qids, k=10).select("qid", "vec_id")
    hits = (
        exact10.join(pq10.select("qid", "vec_id"), ["qid", "vec_id"], "left_semi")
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        spark.range(10).select(F.col("id").alias("qid"))
        .join(hits, "qid", "left")
        .select(
            "qid",
            (F.coalesce("n_hit", F.lit(0)) >= 6).cast("long").alias("recall_ok"),
        )
        .orderBy("qid")
    )


# c7 chains the REAL curation operators end to end in ONE plan —
# the composite a training pipeline actually runs downstream of c1:
# heuristic filter (t8's C4-style rules) → exact dedup (d1's
# min-id-per-hash representatives) → leak-proof split (c6's mult
# bucketing) → per-(split, source) doc/token totals.  Unlike the
# contract gates this is fully SQL-expressible, so the WHOLE chain
# is value-gated: a drift in any stage's semantics (a filter
# threshold, the dedup keep rule, the split hash) shifts the
# aggregates and hash-fails.
_C7_ORACLE = """
WITH w AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
c AS (SELECT doc_id, word, count(*) AS n FROM w GROUP BY doc_id, word),
d AS (
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_words,
           CAST(max(n) AS BIGINT) AS top_n,
           CAST(sum(length(word) * n) AS BIGINT) AS n_chars
    FROM c GROUP BY doc_id
),
f AS (
    SELECT doc_id
    FROM d
    WHERE n_words BETWEEN 25 AND 100000
      AND CAST(n_chars AS DOUBLE) / CAST(n_words AS DOUBLE) BETWEEN 3.0 AND 6.0
      AND CAST(top_n AS DOUBLE) / CAST(n_words AS DOUBLE) <= 0.15
),
clean AS (
    SELECT dd.doc_id, dd.source, dd.text
    FROM documents dd JOIN f ON dd.doc_id = f.doc_id
),
rep AS (
    SELECT doc_id, source, text FROM (
        SELECT clean.*,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM clean
    ) WHERE rn = 1
),
s AS (
    SELECT doc_id, source,
           ((doc_id * 2654435761) % 4294967296) % 100 AS bucket,
           CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
               AS n_tokens
    FROM rep
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM s GROUP BY 1, 2
"""


@register("c7_curation_chain", _C7_ORACLE)
def q_curation_chain(spark, sf_dir):
    from dask_traj_spark.functions.text import _n_tokens
    from dask_traj_spark.operators.curation import (
        dataset_split,
        heuristic_filter,
    )
    from dask_traj_spark.operators.dedup import exact_duplicates

    docs = _docs(spark, sf_dir)
    flags = heuristic_filter(docs).where(F.col("keep")).select("doc_id")
    clean = docs.join(flags, "doc_id", "left_semi")
    keeps = exact_duplicates(clean).select(F.col("keep_id").alias("doc_id"))
    rep = clean.join(keeps, "doc_id", "left_semi")
    split = dataset_split(rep, order_mode="mult")
    toks = rep.select("doc_id", _n_tokens(F.col("text")).alias("n_tokens"))
    return (
        split.join(toks, "doc_id")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


_V8_ORACLE = """
SELECT CAST(f.qid AS BIGINT) AS qid, CAST(1 AS BIGINT) AS recall_ok
FROM range(10) f(qid)
ORDER BY qid
"""


@register("v8_ivf_pq_recall", _V8_ORACLE)
def q_ivf_pq_recall(spark, sf_dir):
    """IVFPQ composition contract (v4/v5 pattern): IVF coarse
    pruning (nprobe 3/8 = 37.5% probe coverage) x PQ ADC scoring
    over 32x-compressed codes x exact rerank of the top-100
    survivors must recover >= 60% of the true exact top-10 per
    query.  Measured 0.8-0.9 at sf0.01 — the 0.6 floor is the
    honest-coverage bound, not a tuned pass line.  Codebooks and
    centroids are seeded k-means (not SQL-expressible), so the
    oracle pins the contract flags; value-level cosine evidence
    comes from v1's oracle."""
    from dask_traj_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_ivf_pq,
    )

    emb = _emb(spark, sf_dir)
    qids = list(range(10))
    got = cosine_topk_ivf_pq(
        emb, qids, k=10, n_centroids=8, nprobe=3, m=16, n_codes=64,
        rerank_depth=100,
    ).select("qid", "vec_id")
    exact10 = cosine_topk(emb, qids, k=10).select("qid", "vec_id")
    hits = (
        exact10.join(got, ["qid", "vec_id"], "left_semi")
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        spark.range(10).select(F.col("id").alias("qid"))
        .join(hits, "qid", "left")
        .select(
            "qid",
            (F.coalesce("n_hit", F.lit(0)) >= 6).cast("long").alias("recall_ok"),
        )
        .orderBy("qid")
    )


_C5_ORACLE = """
WITH t AS (
    SELECT doc_id, source,
           CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT) AS n_tokens,
           (doc_id * 2654435761) % 4294967296 AS ord
    FROM documents
),
c AS (
    SELECT doc_id, source, n_tokens,
           COALESCE(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY ord, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
    FROM t
)
SELECT doc_id, source, n_tokens, CAST(tok_before AS BIGINT) AS tok_before
FROM c WHERE tok_before < 400
"""


@register("c5_source_token_mixture", _C5_ORACLE)
def q_source_token_mixture(spark, sf_dir):
    """Per-source token-budget mixing (400 tokens/source): seeded
    hash-order draw until the budget fills — stratified_sample's
    quota lifted to token counts; the oracle is the identical
    per-source window."""
    from dask_traj_spark.operators.curation import source_token_mixture

    return source_token_mixture(
        _docs(spark, sf_dir), token_budget=400, order_mode="mult"
    )


# ---------------------------------------------------------------------
# x10: per-atom RMSF (beyond-reference trajectory analysis)
# ---------------------------------------------------------------------


def _rmsf_oracle() -> str:
    from dask_traj_spark.queries import COORDS_CTE

    return f"""
WITH {COORDS_CTE.strip()},
agg AS (
    SELECT atom_id,
           avg(x*x + y*y + z*z) AS m_rr,
           avg(x) AS mx, avg(y) AS my, avg(z) AS mz
    FROM coords GROUP BY atom_id
)
SELECT CAST(atom_id AS INT) AS atom_id,
       sqrt(greatest(m_rr - (mx*mx + my*my + mz*mz), 0.0)) AS rmsf
FROM agg
"""


@register("x10_rmsf", _rmsf_oracle())
def q_rmsf(spark, sf_dir):
    """Per-atom RMSF from sufficient statistics — one partial+final
    aggregation keyed on atom_id; exact dyadic sums make the value
    independent of partial-merge order (mdtraj ``compute_rmsf``
    API shape; the reference has no RMSF)."""
    from dask_traj_spark.operators.rmsd import compute_rmsf
    from dask_traj_spark.queries import trajectory_from_embeddings

    return compute_rmsf(trajectory_from_embeddings(spark, sf_dir))


# ---------------------------------------------------------------------
# t10: PII detection + scrubbing (training-data pipeline hygiene)
# ---------------------------------------------------------------------


def _t10_oracle() -> str:
    from dask_traj_spark.functions.text import PII_PATTERNS

    ep, up, pp = PII_PATTERNS["email"], PII_PATTERNS["url"], PII_PATTERNS["phone"]
    count = "CAST(len(regexp_extract_all(text, '%s')) AS BIGINT)"
    red = (
        "regexp_replace(regexp_replace(regexp_replace(text, '%s', '<EMAIL>', 'g'),"
        " '%s', '<URL>', 'g'), '%s', '<PHONE>', 'g')" % (ep, up, pp)
    )
    return f"""
WITH t AS (
    SELECT doc_id,
           text ||
           CASE WHEN doc_id %% 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com now' ELSE '' END ||
           CASE WHEN doc_id %% 4 = 0 THEN ' see https://docs.example.org/page/' || CAST(doc_id AS VARCHAR) || ' today' ELSE '' END ||
           CASE WHEN doc_id %% 5 = 0 THEN ' call 555-867-' || lpad(CAST(doc_id %% 10000 AS VARCHAR), 4, '0') || ' now' ELSE '' END
           AS text
    FROM documents
)
SELECT doc_id,
       {count % ep} AS n_emails,
       {count % up} AS n_urls,
       {count % pp} AS n_phones,
       CAST(length({red}) AS BIGINT) AS redacted_len,
       CAST(CASE WHEN len(regexp_extract_all(text, '{ep}'))
                    + len(regexp_extract_all(text, '{up}'))
                    + len(regexp_extract_all(text, '{pp}')) > 0
                 THEN 1 ELSE 0 END AS BIGINT) AS pii_flag
FROM t
""".replace("%%", "%")


@register("t10_pii_scrub", _t10_oracle())
def q_pii_scrub(spark, sf_dir):
    """PII detection + redaction over a deterministically PII-enriched
    corpus (the synthetic documents carry no emails/URLs/phones, so
    both engines append doc_id-derived PII spans to the text before
    scanning — the same fixture-synthesis pattern as m2/m5).  The
    patterns live in ``PII_PATTERNS`` and are restricted to the
    Java-regex ∩ RE2 syntax intersection so the match spans are
    engine-identical."""
    from dask_traj_spark.functions.text import pii_stats

    doc = F.col("doc_id")
    opt = lambda cond, *parts: F.when(cond, F.concat(*parts)).otherwise(F.lit(""))  # noqa: E731
    enriched = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            opt(doc % 3 == 0, F.lit(" contact user"), doc.cast("string"),
                F.lit("@mail.example.com now")),
            opt(doc % 4 == 0, F.lit(" see https://docs.example.org/page/"),
                doc.cast("string"), F.lit(" today")),
            opt(doc % 5 == 0, F.lit(" call 555-867-"),
                F.lpad((doc % 10000).cast("string"), 4, "0"), F.lit(" now")),
        ).alias("text"),
    )
    return pii_stats(enriched)


# ---------------------------------------------------------------------
# v6: first-class k-means clustering (topic bucketing) contract gate
# ---------------------------------------------------------------------

_V6_K = 8

_V6_ORACLE = f"""
SELECT CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_points,
       CAST({_V6_K} AS BIGINT) AS k,
       TRUE AS coverage_ok,
       TRUE AS balance_ok,
       TRUE AS quality_ok
"""


@register("v6_kmeans_contract", _V6_ORACLE)
def q_kmeans_contract(spark, sf_dir):
    """Contract gate for ``kmeans_cluster`` (the x3/v4 pattern — an
    iterative trained model has no SQL twin, so the gate pins the
    invariants that any correct spherical k-means must satisfy):

    - partition: every embedding is assigned exactly once
      (``n_points`` is value-gated against the oracle's count);
    - coverage: at least k/2 clusters are non-empty (k-means++ init
      cannot collapse near-uniform data into a couple of buckets);
    - balance: no cluster holds more than 80% of the corpus;
    - quality: the mean assigned-centroid cosine beats the best
      achievable SINGLE-direction mean cosine, which is analytically
      |Σ x̂ᵢ|/n (the mean-direction bound) — clustering into k
      buckets must beat k=1.  The margin on near-uniform synthetic
      embeddings is large (~0.25 vs ~0.04), so float32 kernel
      roundoff cannot flip the flag.

    The mean-direction bound is computed in-engine via posexplode —
    gate-side instrumentation over n·dim rows, not part of the
    operator (which is sample-train + broadcast-matmul assign)."""
    from dask_traj_spark.operators.similarity import kmeans_cluster

    emb = _emb(spark, sf_dir)
    assign = kmeans_cluster(emb, k=_V6_K)
    stats = assign.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.countDistinct("cluster").alias("n_used"),
        F.avg(F.col("sim").cast("double")).alias("avg_sim"),
    )
    sizes = (
        assign.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(F.max("sz").alias("max_sz"))
    )
    v = F.col("v").cast("double")
    el = emb.select("vec_id", F.posexplode("embedding").alias("pos", "v"))
    norms = el.groupBy("vec_id").agg(F.sqrt(F.sum(v * v)).alias("nrm"))
    u = (
        el.join(norms, "vec_id")
        .groupBy("pos")
        .agg(F.sum(v / F.col("nrm")).alias("u_d"))
    )
    base = u.agg(F.sqrt(F.sum(F.col("u_d") * F.col("u_d"))).alias("u_norm"))
    return (
        stats.crossJoin(F.broadcast(sizes))
        .crossJoin(F.broadcast(base))
        .select(
            F.col("n_points").cast("long").alias("n_points"),
            F.lit(_V6_K).cast("long").alias("k"),
            (F.col("n_used") >= F.lit(_V6_K // 2)).alias("coverage_ok"),
            (
                F.col("max_sz").cast("double")
                <= 0.8 * F.col("n_points").cast("double")
            ).alias("balance_ok"),
            (
                F.col("avg_sim") >= F.col("u_norm") / F.col("n_points")
            ).alias("quality_ok"),
        )
    )


# ---------------------------------------------------------------------
# m7: nearest-neighbor image resize over REAL decoded BMP pixels
# ---------------------------------------------------------------------


def _m7_oracle() -> str:
    # (7,2) -> (3,1) under src = floor(dst*src/dst_extent):
    # xs = [0,2,4], ys = [0]; top-down row 0 = text bytes 1..21
    # (1-based), so the 9 resized channel bytes sit at text positions
    # 3x+1..3x+3 for x in {0,2,4}.  A decoder that forgot the BMP
    # bottom-up row flip would read row 1 (bytes 22..42); a wrong
    # sampling rule (ceil/round/half-pixel) picks different columns —
    # either hash-fails the sum below.
    pos = [p for x in (0, 2, 4) for p in (3 * x + 1, 3 * x + 2, 3 * x + 3)]
    bytes_sql = ", ".join(
        f"CASE WHEN nb >= {p} THEN ord(substr(text, {p}, 1)) ELSE 0 END AS b{i}"
        for i, p in enumerate(pos)
    )
    bs = ", ".join(f"b{i}" for i in range(9))
    return f"""
WITH m AS (
    SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS nb, text
    FROM documents
), f AS (
    SELECT doc_id, {bytes_sql} FROM m
)
SELECT doc_id,
       CAST(3 AS INT) AS width,
       CAST(1 AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(b0 AS BIGINT) AS px_first,
       CAST(b0+b1+b2+b3+b4+b5+b6+b7+b8 AS BIGINT) AS px_sum,
       CAST(least({bs}) AS BIGINT) AS px_min,
       CAST(greatest({bs}) AS BIGINT) AS px_max
FROM f
"""


@register("m7_resize_bmp", _m7_oracle())
def q_resize_bmp(spark, sf_dir):
    """End-to-end encode→decode→resize: each doc's text bytes become
    a real 7×2 BMP (padded stride, bottom-up rows), ``resize_images``
    decodes and nearest-neighbor-resizes to 3×1, and the oracle
    predicts every resized byte from the text alone."""
    from dask_traj_spark.operators.multimodal import (
        attach_payload_bmp,
        resize_images,
    )

    out = resize_images(attach_payload_bmp(_docs(spark, sf_dir)), out_w=3, out_h=1)
    px = F.col("pixels").cast("array<long>")
    return out.select(
        "doc_id",
        "width",
        "height",
        "channels",
        F.element_at(px, 1).alias("px_first"),
        F.aggregate(px, F.lit(0).cast("long"), lambda a, x: a + x).alias("px_sum"),
        F.array_min(px).alias("px_min"),
        F.array_max(px).alias("px_max"),
    )


@register("sx3_stream_window_counts_twin", _E1_ORACLE)
def q_stream_window_counts_twin(spark, sf_dir):
    """Streaming hourly windowed counts vs e1's SQL value oracle:
    replay the events corpus in three deterministic micro-batches
    through the foreachBatch body (batch_id-partitioned mergeable
    partials), crash-replay the middle batch, and the merged state
    must equal the one-pass batch aggregation VALUE-FOR-VALUE (the
    count/sum partial is associative and dynamic overwrite makes
    replay idempotent)."""
    import shutil
    import tempfile

    from dask_traj_spark.sources.events import events_df
    from dask_traj_spark.streaming.ingest import (
        process_window_counts_batch,
        window_counts_state,
    )

    ev = events_df(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="sx3_window_twin_")
    state = f"{work}/state"
    try:
        for b in range(3):
            process_window_counts_batch(
                ev.where(F.col("event_id") % 3 == b), b, state
            )
        # crash-replay of the middle batch — partition rewritten in
        # place, the merge must not double-count
        process_window_counts_batch(
            ev.where(F.col("event_id") % 3 == 1), 1, state
        )
        out = window_counts_state(spark, state).select(
            F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "total_cents",
        )
        pdf = out.toPandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        pdf, "window_start string, event_type string, n long, total_cents long"
    )


# ---------------------------------------------------------------------
# x11: geometric hydrogen-bond criterion (G1 x G3 composition)
# ---------------------------------------------------------------------

_X11_N = 10
_X11_CUT = 0.5    # dyadic thresholds: exact in f32 and f64, so the
_X11_AMIN = 1.75  # flag comparison cannot straddle engine rounding


def _x11_oracle() -> str:
    from dask_traj_spark.queries import (
        COORDS_CTE,
        TRIPLETS_CTE,
        _dist_from_components,
    )

    dist = _dist_from_components("ck.x-cj.x", "ck.y-cj.y", "ck.z-cj.z")
    ang = """round(acos(greatest(-1.0, least(1.0,
           (ux*vx + uy*vy + uz*vz) /
           (sqrt(ux*ux + uy*uy + uz*uz) * sqrt(vx*vx + vy*vy + vz*vz))
       ))), 6)"""
    return f"""
WITH {COORDS_CTE.strip()},
{TRIPLETS_CTE.format(n=_X11_N).strip()},
legs AS (
    SELECT cj.frame_id, t.triplet_id,
           ci.x-cj.x AS ux, ci.y-cj.y AS uy, ci.z-cj.z AS uz,
           ck.x-cj.x AS vx, ck.y-cj.y AS vy, ck.z-cj.z AS vz,
           {dist} AS dist
    FROM triplets t
    JOIN coords ci ON ci.atom_id = t.i
    JOIN coords cj ON cj.atom_id = t.j AND cj.frame_id = ci.frame_id
    JOIN coords ck ON ck.atom_id = t.k AND ck.frame_id = ci.frame_id
)
SELECT frame_id, triplet_id, dist,
       {ang} AS angle_rad,
       CAST(CASE WHEN dist < {_X11_CUT} AND {ang} > {_X11_AMIN}
                 THEN 1 ELSE 0 END AS BIGINT) AS is_hbond
FROM legs
"""


@register("x11_hbond_geometric", _x11_oracle())
def q_hbond_geometric(spark, sf_dir):
    """H-bond flags over all C(10,3) (donor, hydrogen, acceptor)
    triplets: H···A distance below 0.5 nm AND D-H···A angle above
    1.75 rad — the two public primitives composed through one
    (frame_id, triplet_id) equi-join (mdtraj ``baker_hubbard``
    geometry shape; the reference's users escape-hatch through
    ``to_mdtraj`` for this)."""
    import itertools

    from dask_traj_spark.operators.angle import hydrogen_bonds
    from dask_traj_spark.queries import trajectory_from_embeddings

    traj = trajectory_from_embeddings(spark, sf_dir)
    trips = list(itertools.combinations(range(_X11_N), 3))
    out = hydrogen_bonds(
        traj, trips, dist_cutoff=_X11_CUT, angle_min=_X11_AMIN,
        periodic=False, n_atoms=_X11_N, _round6_double=True,
    )
    return out.select(
        "frame_id",
        "triplet_id",
        F.col("dist").cast("double").alias("dist"),
        "angle_rad",
        F.col("is_hbond").cast("long").alias("is_hbond"),
    )


def _vacf_oracle(max_lag: int) -> str:
    from dask_traj_spark.queries import COORDS_CTE

    return f"""
WITH {COORDS_CTE.strip()},
v AS (
    SELECT c1.atom_id, c1.frame_id,
           c2.x - c1.x AS vx, c2.y - c1.y AS vy, c2.z - c1.z AS vz
    FROM coords c1
    JOIN coords c2 ON c2.atom_id = c1.atom_id
                  AND c2.frame_id = c1.frame_id + 1
)
SELECT CAST(v2.frame_id - v1.frame_id AS BIGINT) AS lag,
       CAST(count(*) AS BIGINT) AS n_samples,
       avg(v1.vx*v2.vx + v1.vy*v2.vy + v1.vz*v2.vz) AS vacf
FROM v v1
JOIN v v2 ON v2.atom_id = v1.atom_id
         AND v2.frame_id >= v1.frame_id
         AND v2.frame_id <= v1.frame_id + {max_lag}
GROUP BY v2.frame_id - v1.frame_id
ORDER BY lag
"""


@register("x12_vacf", _vacf_oracle(6))
def q_vacf(spark, sf_dir):
    """Velocity autocorrelation vs time lag (finite-difference
    velocities): one atom-keyed window builds the velocity series,
    then the banded time-lag self-join from x9. Dyadic velocity
    components make every averaged dot product exact."""
    from dask_traj_spark.operators.distance import velocity_autocorrelation
    from dask_traj_spark.queries import trajectory_from_embeddings

    traj = trajectory_from_embeddings(spark, sf_dir)
    return velocity_autocorrelation(traj, max_lag=6).orderBy("lag")


_T11_ORACLE = """
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents
),
pw AS (
    SELECT doc_id, word, count(*) AS n
    FROM tok GROUP BY doc_id, word
),
agg AS (
    SELECT doc_id,
           CAST(sum(n) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
    FROM pw GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_types, n_hapax,
       CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS ttr,
       CAST(n_hapax AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS hapax_ratio
FROM agg
"""


@register("t11_lexical_diversity", _T11_ORACLE)
def q_lexical_diversity(spark, sf_dir):
    """Type-token ratio + hapax share per document — two chained
    partial+final aggregations, exact integer counts, one division
    per ratio."""
    from dask_traj_spark.functions.text import lexical_diversity

    return lexical_diversity(_docs(spark, sf_dir))


# ---------------------------------------------------------------------
# m8: windowed audio features over REAL decoded PCM samples
# ---------------------------------------------------------------------


def _m8_oracle() -> str:
    # sample i (0-based, i < 32) = (byte_{i+1} - 128) * 256, zero past
    # end-of-text; windows of 8 -> 4 windows per doc.  Zero crossings
    # via lag() within (doc, window) ordered by position, sign(x) :=
    # (x < 0) with zeros non-negative — the operator's definition.
    return """
WITH m AS (
    SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS nb, text
    FROM documents
),
s AS (
    SELECT doc_id, CAST(w.widx AS INT) AS window_idx, p.pos,
           CASE WHEN nb >= 8*w.widx + p.pos + 1
                THEN (ord(substr(text, CAST(8*w.widx + p.pos + 1 AS INT), 1)) - 128) * 256
                ELSE 0 END AS samp
    FROM m CROSS JOIN range(4) w(widx) CROSS JOIN range(8) p(pos)
),
sl AS (
    SELECT doc_id, window_idx, pos, samp,
           lag(samp) OVER (PARTITION BY doc_id, window_idx ORDER BY pos) AS prev
    FROM s
)
SELECT doc_id, window_idx,
       CAST(sum(samp * samp) AS BIGINT) AS energy,
       CAST(sum(CASE WHEN prev IS NOT NULL
                      AND (samp < 0) <> (prev < 0) THEN 1 ELSE 0 END) AS BIGINT)
           AS zero_crossings,
       CAST(max(abs(samp)) AS BIGINT) AS peak
FROM sl
GROUP BY doc_id, window_idx
"""


@register("m8_audio_window_features", _m8_oracle())
def q_audio_window_features(spark, sf_dir):
    """Audio front-end gate: text byte head → PCM-16 WAV →
    ``decode_wav`` → 8-sample windowed energy / zero-crossings /
    peak. Sample values (b−128)·256 are exact int16, so every
    windowed statistic is an exact integer on both engines."""
    from dask_traj_spark.operators.multimodal import (
        attach_payload_wav,
        audio_window_features,
    )

    return audio_window_features(
        attach_payload_wav(_docs(spark, sf_dir)), window=8
    )


@register("sx4_stream_sessionization_twin", _E2_ORACLE)
def q_stream_sessionization_twin(spark, sf_dir):
    """Incremental gap sessionization vs e2's SQL value oracle —
    the ORDER-DEPENDENT streaming fold (unlike sx2/sx3's associative
    partials, a batch's first per-user session can merge into the
    open tail of the previous state version).  The corpus replays
    in three event-time slices; the middle batch is crash-replayed
    inside the query; the final view (closed sessions + open tails)
    must match the one-pass batch sessionization VALUE-FOR-VALUE."""
    import shutil
    import tempfile

    from dask_traj_spark.sources.events import events_df
    from dask_traj_spark.streaming.ingest import (
        process_sessions_batch,
        sessions_final,
    )

    ev = events_df(spark, sf_dir).select("user_id", "ts", "event_id")
    lo, hi = ev.agg(
        F.unix_micros(F.min("ts")), F.unix_micros(F.max("ts"))
    ).first()
    c1, c2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    us = F.unix_micros(F.col("ts"))
    slices = [
        ev.where(us < c1),
        ev.where((us >= c1) & (us < c2)),
        ev.where(us >= c2),
    ]
    work = tempfile.mkdtemp(prefix="sx4_sessions_twin_")
    state, results = f"{work}/state", f"{work}/results"
    try:
        for b, sl in enumerate(slices):
            process_sessions_batch(sl, b, state, results)
        # crash-replay of the middle batch: state version 1 and the
        # batch-1 results partition are rewritten from version 0
        process_sessions_batch(slices[1], 1, state, results)
        pdf = sessions_final(spark, state, results, 2).toPandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        pdf, "user_id long, session_no long, n_events long, duration_s long"
    )


# ---------------------------------------------------------------------
# m9: temporal frame differencing (scene-cut signal) over real AVI
# ---------------------------------------------------------------------


def _m9_oracle() -> str:
    b = lambda f: (  # noqa: E731  (byte of frame expr f at position pos)
        f"CASE WHEN nb >= 24*({f}) + p.pos + 1 "
        f"THEN ord(substr(text, CAST(24*({f}) + p.pos + 1 AS INT), 1)) "
        f"ELSE 0 END"
    )
    return f"""
WITH m AS (
    SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS nb, text
    FROM documents
),
d AS (
    SELECT doc_id, CAST(t.fidx AS INT) AS frame_idx, p.pos,
           abs(({b('t.fidx')}) - ({b('t.fidx - 1')})) AS ad
    FROM m CROSS JOIN range(1, 3) t(fidx) CROSS JOIN range(24) p(pos)
)
SELECT doc_id, frame_idx,
       CAST(sum(ad) AS BIGINT) AS diff_sum,
       CAST(max(ad) AS BIGINT) AS max_px_diff
FROM d GROUP BY doc_id, frame_idx
"""


@register("m9_frame_diffs", _m9_oracle())
def q_frame_diffs(spark, sf_dir):
    """Video motion-energy gate: text bytes → 3-frame uncompressed
    AVI → decode_avi → per-transition L1 diff + peak channel change.
    Frame f's decoded pixels are text bytes [24f, 24f+24), so the
    oracle predicts every difference exactly."""
    from dask_traj_spark.operators.multimodal import (
        attach_payload_avi,
        frame_diffs,
    )

    return frame_diffs(attach_payload_avi(_docs(spark, sf_dir)))


# ---------------------------------------------------------------------
# e7: rolling-baseline burst detection over hourly event counts
# ---------------------------------------------------------------------

_E7_ORACLE = """
WITH hourly AS (
    SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
    FROM events GROUP BY 1, 2
),
trail AS (
    SELECT h, event_type, n,
           sum(n) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS t_sum,
           count(n) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS t_n
    FROM hourly
)
SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       CAST(n AS BIGINT) AS n,
       CAST(COALESCE(t_sum, 0) AS BIGINT) AS trail_sum,
       CAST(t_n AS BIGINT) AS trail_n,
       CAST(CASE WHEN t_n > 0 AND n * t_n > 2 * t_sum
                 THEN 1 ELSE 0 END AS BIGINT) AS is_burst
FROM trail
"""


@register("e7_burst_detection", _E7_ORACLE)
def q_burst_detection(spark, sf_dir):
    """Burst flags per (hour, event_type): the hour's count against
    the trailing-3-hour baseline, flagged when count exceeds 2× the
    trailing mean.  The comparison is pure integer cross-
    multiplication (n·t_n > 2·t_sum) — no division anywhere, so the
    flag cannot straddle a rounding boundary.  Plan: one partial+
    final agg, then a window partitioned by event_type (never
    SinglePartition; at 100 TB the window input is the tiny hourly
    rollup, not the events)."""
    from pyspark.sql import Window

    from dask_traj_spark.sources.events import events_df

    hourly = (
        events_df(spark, sf_dir)
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(-3, -1)
    t = hourly.withColumns(
        {
            "t_sum": F.coalesce(F.sum("n").over(w), F.lit(0)),
            "t_n": F.count("n").over(w),
        }
    )
    return t.select(
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("t_sum").cast("long").alias("trail_sum"),
        F.col("t_n").cast("long").alias("trail_n"),
        (
            (F.col("t_n") > 0)
            & (F.col("n") * F.col("t_n") > 2 * F.col("t_sum"))
        ).cast("long").alias("is_burst"),
    )


# ---------------------------------------------------------------------
# x13: gyration-tensor shape analysis (Cardano closed-form eigenvalues)
# ---------------------------------------------------------------------


def _x13_oracle() -> str:
    from dask_traj_spark.queries import COORDS_CTE

    l1 = "round(tr/3.0 + 2.0*sqrt(p2)*cos(acos(q)/3.0), 6)"
    l3 = "round(tr/3.0 + 2.0*sqrt(p2)*cos(acos(q)/3.0 + 2.0943951023931953), 6)"
    return f"""
WITH {COORDS_CTE.strip()},
top AS (
    SELECT CAST(vec_id AS INT) AS atom_id,
           CAST(label + 1 AS DOUBLE) AS mass
    FROM embeddings
),
agg AS (
    SELECT c.frame_id,
           sum(t.mass * c.x * c.x) AS sxx, sum(t.mass * c.y * c.y) AS syy,
           sum(t.mass * c.z * c.z) AS szz, sum(t.mass * c.x * c.y) AS sxy,
           sum(t.mass * c.x * c.z) AS sxz, sum(t.mass * c.y * c.z) AS syz,
           sum(t.mass * c.x) AS sx, sum(t.mass * c.y) AS sy,
           sum(t.mass * c.z) AS sz, sum(t.mass) AS sm
    FROM coords c JOIN top t USING (atom_id) GROUP BY c.frame_id
),
s AS (
    SELECT frame_id,
           sxx/sm - (sx/sm)*(sx/sm) AS s11,
           syy/sm - (sy/sm)*(sy/sm) AS s22,
           szz/sm - (sz/sm)*(sz/sm) AS s33,
           sxy/sm - (sx/sm)*(sy/sm) AS s12,
           sxz/sm - (sx/sm)*(sz/sm) AS s13,
           syz/sm - (sy/sm)*(sz/sm) AS s23
    FROM agg
),
t2 AS (
    SELECT *, s11 + s22 + s33 AS tr FROM s
),
b AS (
    SELECT *, s11 - tr/3.0 AS b11, s22 - tr/3.0 AS b22, s33 - tr/3.0 AS b33
    FROM t2
),
inv AS (
    SELECT *,
           (b11*b11 + b22*b22 + b33*b33
            + 2.0*(s12*s12 + s13*s13 + s23*s23)) / 6.0 AS p2,
           b11*(b22*b33 - s23*s23) - s12*(s12*b33 - s23*s13)
               + s13*(s12*s23 - b22*s13) AS detb
    FROM b
),
qv AS (
    SELECT *, greatest(-1.0, least(1.0, detb / (2.0*p2*sqrt(p2)))) AS q
    FROM inv
),
eig AS (
    SELECT frame_id, tr,
           CASE WHEN p2 <= 0.0 THEN tr/3.0 ELSE {l1} END AS l1,
           CASE WHEN p2 <= 0.0 THEN tr/3.0 ELSE {l3} END AS l3
    FROM qv
)
SELECT frame_id, tr AS rg2,
       l1 AS lambda1,
       tr - l1 - l3 AS lambda2,
       l3 AS lambda3,
       l1 - ((tr - l1 - l3) + l3)/2.0 AS asphericity,
       (tr - l1 - l3) - l3 AS acylindricity
FROM eig
"""


@register("x13_gyration_tensor", _x13_oracle())
def q_gyration_tensor(spark, sf_dir):
    """Gyration-tensor principal moments + asphericity/acylindricity
    per frame — one sufficient-statistics aggregation, closed-form
    symmetric-3×3 eigenvalues; λ₁/λ₃ round-6 protected (the only
    transcendental step), λ₂ recovered as trace−λ₁−λ₃."""
    from dask_traj_spark.operators.distance import gyration_tensor
    from dask_traj_spark.queries import trajectory_from_embeddings

    traj = trajectory_from_embeddings(spark, sf_dir)
    return gyration_tensor(traj, _round6_double=True)


_C6_ORACLE = """
WITH b AS (
    SELECT doc_id, source,
           ((doc_id * 2654435761) % 4294967296) % 100 AS bucket,
           CAST(length(text) - length(replace(text, ' ', '')) + 1 AS BIGINT)
               AS n_tokens
    FROM documents
),
s AS (
    SELECT doc_id, source,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           n_tokens
    FROM b
)
SELECT split, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM s GROUP BY split, source
"""


@register("c6_dataset_split", _C6_ORACLE)
def q_dataset_split(spark, sf_dir):
    """Leak-proof deterministic train/val/test split (hash-of-id
    buckets, 80/10/10) summarized per (split, source) with doc and
    token counts — the assignment is a map-only projection; the
    rollup is one partial+final agg."""
    from dask_traj_spark.functions.text import _n_tokens
    from dask_traj_spark.operators.curation import dataset_split

    docs = _docs(spark, sf_dir)
    sp = dataset_split(docs, fractions=(80, 10), order_mode="mult")
    toks = docs.select("doc_id", _n_tokens(F.col("text")).alias("n_tokens"))
    return (
        sp.join(toks, "doc_id")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


def _x14_oracle() -> str:
    from dask_traj_spark.queries import _DIST_ORACLE

    return f"""
WITH d AS ({_DIST_ORACLE}),
ref AS (SELECT pair_id FROM d WHERE frame_id = 0 AND dist < 0.5)
SELECT d.frame_id,
       CAST(count(*) AS BIGINT) AS n_native,
       CAST(sum(CASE WHEN d.dist < 0.625 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_formed,
       CAST(sum(CASE WHEN d.dist < 0.625 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS q
FROM d JOIN ref USING (pair_id)
GROUP BY d.frame_id
"""


@register("x14_native_contacts", _x14_oracle())
def q_native_contacts(spark, sf_dir):
    """Best-Hummer-style Q(t): contacts defined at frame 0 under the
    dyadic 0.5 cutoff, formed-at-t under 1.25x — one distance pass,
    reference set broadcast back onto it."""
    from dask_traj_spark.operators.distance import native_contact_fraction
    from dask_traj_spark.queries import (
        N_DIST_ATOMS,
        _pairs,
        trajectory_from_embeddings,
    )

    traj = trajectory_from_embeddings(spark, sf_dir)
    return native_contact_fraction(
        traj, _pairs(N_DIST_ATOMS), r_cut=0.5, lam=1.25, n_atoms=N_DIST_ATOMS
    )


_M10_ORACLE = """
WITH m AS (
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS nb,
           text
    FROM documents
), f AS (
    SELECT doc_id,
           CASE WHEN nb >= 1 THEN ord(substr(text, 1, 1)) ELSE 0 END AS b1,
           CASE WHEN nb >= 2 THEN ord(substr(text, 2, 1)) ELSE 0 END AS b2,
           CASE WHEN nb >= 3 THEN ord(substr(text, 3, 1)) ELSE 0 END AS b3,
           CASE WHEN nb >= 4 THEN ord(substr(text, 4, 1)) ELSE 0 END AS b4,
           CASE WHEN nb >= 5 THEN ord(substr(text, 5, 1)) ELSE 0 END AS b5,
           CASE WHEN nb >= 6 THEN ord(substr(text, 6, 1)) ELSE 0 END AS b6,
           CASE WHEN nb >= 7 THEN ord(substr(text, 7, 1)) ELSE 0 END AS b7,
           CASE WHEN nb >= 8 THEN ord(substr(text, 8, 1)) ELSE 0 END AS b8
    FROM m
)
SELECT doc_id,
       CAST(6 AS INT) AS width,
       CAST(2 AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(b1+b2+b3+b4+b5+b6+b7+b8 AS BIGINT) AS feat_sum,
       CAST(least(b1,b2,b3,b4,b5,b6,b7,b8) AS BIGINT) AS feat_min,
       CAST(greatest(b1,b2,b3,b4,b5,b6,b7,b8) AS BIGINT) AS feat_max
FROM f
"""


@register("m10_decode_tiff", _M10_ORACLE)
def q_decode_tiff(spark, sf_dir):
    """REAL TIFF path gate: text byte head → single-strip TIFF (IFD
    tag list per the 6.0 spec) → decode_tiff → byte-head stats. A
    misparsed SHORT tag or wrong strip offset shifts every byte and
    hash-fails."""
    from dask_traj_spark.operators.multimodal import (
        attach_payload_tiff,
        decode_and_featurize,
    )

    decoded = decode_and_featurize(
        attach_payload_tiff(_docs(spark, sf_dir)), strict=True
    )
    fb = F.transform("features", lambda f: F.round(f * 255, 0).cast("long"))
    return decoded.select(
        "doc_id",
        "width",
        "height",
        "channels",
        F.aggregate(fb, F.lit(0).cast("long"), lambda a, x: a + x).alias("feat_sum"),
        F.array_min(fb).alias("feat_min"),
        F.array_max(fb).alias("feat_max"),
    )


# m11 gates the baseline JPEG codec end to end: text's first five
# bytes → five constant 8×8 tiles in a 40×8 grayscale JFIF (quant=1
# → bit-exact roundtrip) → decode_jpeg (segment walk, canonical
# Huffman from DHT, DC-predictor chain across five blocks, dequant +
# IDCT) → WHOLE-image integer pixel stats.  The oracle predicts
# every aggregate from the text alone: a wrong Huffman table, a
# missed DC diff, a transposed IDCT or a dropped tile changes
# px_sum/min/max and hash-fails.
_M11_ORACLE = """
WITH m AS (
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS nb,
           text
    FROM documents
), f AS (
    SELECT doc_id,
           CASE WHEN nb >= 1 THEN ord(substr(text, 1, 1)) ELSE 0 END AS b1,
           CASE WHEN nb >= 2 THEN ord(substr(text, 2, 1)) ELSE 0 END AS b2,
           CASE WHEN nb >= 3 THEN ord(substr(text, 3, 1)) ELSE 0 END AS b3,
           CASE WHEN nb >= 4 THEN ord(substr(text, 4, 1)) ELSE 0 END AS b4,
           CASE WHEN nb >= 5 THEN ord(substr(text, 5, 1)) ELSE 0 END AS b5
    FROM m
)
SELECT doc_id,
       CAST(40 AS INT) AS width,
       CAST(8 AS INT) AS height,
       CAST(1 AS INT) AS channels,
       CAST(320 AS BIGINT) AS n_px,
       CAST(64 * (b1 + b2 + b3 + b4 + b5) AS BIGINT) AS px_sum,
       CAST(least(b1, b2, b3, b4, b5) AS BIGINT) AS px_min,
       CAST(greatest(b1, b2, b3, b4, b5) AS BIGINT) AS px_max
FROM f
"""


@register("m11_decode_jpeg", _M11_ORACLE)
def q_decode_jpeg(spark, sf_dir):
    from dask_traj_spark.operators.multimodal import (
        attach_payload_jpeg,
        image_pixel_stats,
    )

    return image_pixel_stats(
        attach_payload_jpeg(_docs(spark, sf_dir))
    ).select(
        "doc_id", "width", "height", "channels",
        "n_px", "px_sum", "px_min", "px_max",
    )


@register("m11b_decode_jpeg_progressive", _M11_ORACLE)
def q_decode_jpeg_progressive(spark, sf_dir):
    """m11's tiles through the round-6 scan machineries (doc_id % 4
    cycles progressive / progressive+DC-successive-approximation /
    baseline+restart-intervals / progressive+restart-intervals).
    The progression reorders bits, not
    information, so the SAME closed-form oracle applies — a broken
    EOB run, refinement bit or restart reset changes px_sum and
    hash-fails."""
    from dask_traj_spark.operators.multimodal import (
        attach_payload_jpeg_variants,
        image_pixel_stats,
    )

    return image_pixel_stats(
        attach_payload_jpeg_variants(_docs(spark, sf_dir))
    ).select(
        "doc_id", "width", "height", "channels",
        "n_px", "px_sum", "px_min", "px_max",
    )


@register("m11c_decode_jpeg_arith", _M11_ORACLE)
def q_decode_jpeg_arith(spark, sf_dir):
    """m11's tiles through the ARITHMETIC entropy layer (SOF9, with
    doc_id % 2 cycling a 2-MCU restart interval): the QM coder +
    Annex F conditioning trees under m11's unchanged closed-form
    oracle — a wrong decision, statistics update, carry or restart
    re-init changes px_sum and hash-fails.  The codec itself is
    additionally cross-validated bitwise against the system libjpeg
    in tests/test_properties.py."""
    from dask_traj_spark.operators.multimodal import (
        attach_payload_jpeg_arith,
        image_pixel_stats,
    )

    return image_pixel_stats(
        attach_payload_jpeg_arith(_docs(spark, sf_dir))
    ).select(
        "doc_id", "width", "height", "channels",
        "n_px", "px_sum", "px_min", "px_max",
    )


_T12_ORACLE = """
WITH bigrams AS (
    SELECT d.doc_id, d.source, substr(d.text, u.i, 2) AS bg
    FROM documents d, unnest(generate_series(1, length(d.text) - 1)) AS u(i)
),
counts AS (
    SELECT bg, count(*) AS n_bg FROM bigrams WHERE source = 'src0' GROUP BY bg
),
c1_tot AS (
    SELECT substr(bg, 1, 1) AS c1, sum(n_bg) AS n_c1
    FROM counts GROUP BY substr(bg, 1, 1)
),
model AS (
    SELECT c.bg,
           round(ln(CAST(c.n_bg AS DOUBLE) / CAST(t.n_c1 AS DOUBLE)) * 1048576.0)
               / 1048576.0 AS lp
    FROM counts c JOIN c1_tot t ON substr(c.bg, 1, 1) = t.c1
)
SELECT b.doc_id, b.source,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(CASE WHEN m.lp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       round(sum(COALESCE(m.lp, -20.0)) / count(*), 6) AS avg_logprob
FROM bigrams b LEFT JOIN model m USING (bg)
GROUP BY b.doc_id, b.source
"""


@register("t12_bigram_crossscore", _T12_ORACLE)
def q_bigram_crossscore(spark, sf_dir):
    """Domain-shift scoring: bigram model trained on the 'src0'
    slice only, every document scored under it with the dyadic -20
    OOV floor — in-domain documents cluster near the training mode,
    off-distribution text accumulates floored bigrams."""
    from dask_traj_spark.functions.text import char_bigram_crossscore

    return char_bigram_crossscore(_docs(spark, sf_dir), train_source="src0")


_V7_ORACLE = """
SELECT CAST(f.qid AS BIGINT) AS qid, CAST(1 AS BIGINT) AS recall_ok
FROM range(10) f(qid)
ORDER BY qid
"""


@register("v7_sq_recall", _V7_ORACLE)
def q_sq_recall(spark, sf_dir):
    """Scalar-quantization ANN contract (v5 pattern, one notch
    simpler): int8 codes (4x compression, no codebooks) generate
    top-100 candidates via integer matmul → exact quantized-cosine
    rerank → top-10 must recover ≥ 60% of the true exact top-10 per
    query. int8 keeps ~7 bits/dim, so recall is much higher than
    PQ's — the contract margin is wide."""
    from pyspark.sql import Window

    from dask_traj_spark.operators.similarity import (
        _quantized_elements,
        cosine_topk,
        sq_topk,
    )

    emb = _emb(spark, sf_dir)
    qids = list(range(10))
    cand = sq_topk(emb, qids, k=100).select("qid", "vec_id")
    e1 = _quantized_elements(
        emb.where(F.col("vec_id").isin(qids)), "vec_id", "qv"
    ).withColumnRenamed("qv", "qid")
    e2 = _quantized_elements(emb, "vec_id", "cv").withColumnRenamed("cv", "vec_id")
    scored = (
        cand.join(F.broadcast(e1.withColumnRenamed("v_qv", "vq")), "qid")
        .join(e2.withColumnRenamed("v_cv", "vc"), ["vec_id", "pos"])
        .groupBy("qid", "vec_id")
        .agg(
            F.sum(F.col("vq") * F.col("vc")).alias("dot"),
            F.sum(F.col("vq") * F.col("vq")).alias("n1"),
            F.sum(F.col("vc") * F.col("vc")).alias("n2"),
        )
        .select(
            "qid", "vec_id",
            (F.col("dot") / (F.sqrt("n1") * F.sqrt("n2"))).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    sq10 = scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 10)
    exact10 = cosine_topk(emb, qids, k=10).select("qid", "vec_id")
    hits = (
        exact10.join(sq10.select("qid", "vec_id"), ["qid", "vec_id"], "left_semi")
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        spark.range(10).select(F.col("id").alias("qid"))
        .join(hits, "qid", "left")
        .select(
            "qid",
            (F.coalesce("n_hit", F.lit(0)) >= 6).cast("long").alias("recall_ok"),
        )
        .orderBy("qid")
    )


@register("sx5_incremental_ivf_twin", _V1_ORACLE)
def q_incremental_ivf_twin(spark, sf_dir):
    """Incremental ANN ingest vs v1's exact value oracle: build the
    IVF index on a third of the corpus, append the other two thirds
    as micro-batches against the FROZEN centroids, crash-replay the
    middle batch (dynamic overwrite of its (cluster, batch_id)
    partitions), then reload the corpus from the index directories
    and run the exact SQL top-k over it.  Equality with the
    brute-force oracle proves the index holds every vector EXACTLY
    once after appends + replay — a lost partition or a double-write
    changes the top-k and hash-fails."""
    import shutil
    import tempfile

    from dask_traj_spark.operators.similarity import (
        cosine_topk,
        ivf_append_batch,
        ivf_build_index,
    )

    emb = _emb(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="sx5_ivf_twin_")
    try:
        ivf_build_index(
            emb.where(F.col("vec_id") % 3 == 0), work, n_centroids=8
        )
        for b in (1, 2, 1):  # append both, then crash-replay batch 1
            ivf_append_batch(emb.where(F.col("vec_id") % 3 == b), b, work)
        corpus = spark.read.parquet(f"{work}/corpus").select(
            "vec_id", "embedding"
        )
        out = cosine_topk(corpus, list(range(_N_QUERIES)), k=_TOPK)
        pdf = out.select(
            F.col("qid").cast("long").alias("qid"),
            F.col("vec_id").cast("long").alias("vec_id"),
            "cos",
            F.col("rank").cast("int").alias("rank"),
        ).toPandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        pdf, "qid long, vec_id long, cos double, rank int"
    )


def _d8_oracle(threshold: float) -> str:
    from dask_traj_spark.operators.dedup import MAX_SHINGLE_DF as max_df

    return f"""
WITH {TOK_CTE.strip()},
big AS (
    SELECT DISTINCT t1.doc_id, t1.word || '_' || t2.word AS shingle
    FROM tok t1 JOIN tok t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
),
sv AS (
    SELECT shingle, CAST(ROW_NUMBER() OVER (ORDER BY shingle) AS INT) AS tid
    FROM (SELECT DISTINCT shingle FROM big)
),
ds AS (SELECT b.doc_id, s.tid FROM big b JOIN sv s USING (shingle)),
dok AS (SELECT tid FROM ds GROUP BY tid HAVING count(*) <= {max_df}),
dsf AS (SELECT ds.* FROM ds JOIN dok USING (tid)),
sizes AS (SELECT doc_id, count(*) AS sz FROM dsf GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS inner_doc, b.doc_id AS outer_doc, count(*) AS i
    FROM dsf a JOIN dsf b ON a.tid = b.tid AND a.doc_id <> b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT i.inner_doc, i.outer_doc,
       CAST(i.i AS DOUBLE) / CAST(s.sz AS DOUBLE) AS containment
FROM inter i JOIN sizes s ON s.doc_id = i.inner_doc
WHERE CAST(i.i AS DOUBLE) / CAST(s.sz AS DOUBLE) >= {threshold}
"""


@register("d8_containment_neardup", _d8_oracle(0.9))
def q_containment(spark, sf_dir):
    """Asymmetric containment near-dup (Broder containment): the
    quote/superset signal Jaccard misses — same single capped
    intersection self-join as d4, directed, inner-size denominator."""
    from dask_traj_spark.operators.dedup import MAX_SHINGLE_DF, containment_pairs

    return containment_pairs(
        _docs(spark, sf_dir), threshold=0.9, id_mode="sorted",
        max_df=MAX_SHINGLE_DF,
    )


def _x17_oracle() -> str:
    from dask_traj_spark.queries import COORDS_CTE

    return f"""
WITH {COORDS_CTE.strip()},
top AS (
    SELECT CAST(vec_id AS INT) AS atom_id,
           CAST(label + 1 AS DOUBLE) AS mass
    FROM embeddings
),
agg AS (
    SELECT c.frame_id,
           sum(t.mass * (c.x*c.x + c.y*c.y + c.z*c.z)) AS srr,
           sum(t.mass * c.x) AS sx, sum(t.mass * c.y) AS sy,
           sum(t.mass * c.z) AS sz, sum(t.mass) AS sm
    FROM coords c JOIN top t USING (atom_id) GROUP BY c.frame_id
),
rg AS (
    SELECT frame_id AS t,
           round(sqrt(greatest(
               srr/sm - ((sx/sm)*(sx/sm) + (sy/sm)*(sy/sm) + (sz/sm)*(sz/sm)),
               0.0)) * 1048576.0) / 1048576.0 AS v
    FROM agg
),
ex AS (
    SELECT t, v, bsz FROM rg, (VALUES (1), (2), (4)) AS b(bsz)
),
blocks AS (
    SELECT bsz, t // bsz AS blk, sum(v) AS sv, count(*) AS cnt
    FROM ex GROUP BY bsz, t // bsz
),
means AS (
    SELECT bsz, sv / bsz AS m FROM blocks WHERE cnt = bsz
)
SELECT CAST(bsz AS BIGINT) AS block_size,
       CAST(count(*) AS BIGINT) AS n_blocks,
       sum(m) AS sum_m,
       sum(m * m) AS sum_m2
FROM means GROUP BY bsz
"""


@register("x17_rg_block_average", _x17_oracle())
def q_rg_block_average(spark, sf_dir):
    """Block-averaging error analysis of the Rg series (Flyvbjerg-
    Petersen): exact dyadic block means at power-of-two sizes →
    sufficient statistics for SEM/statistical-inefficiency curves."""
    from dask_traj_spark.operators.distance import (
        block_average_stats,
        compute_radius_of_gyration,
    )
    from dask_traj_spark.queries import trajectory_from_embeddings

    traj = trajectory_from_embeddings(spark, sf_dir)
    rg = compute_radius_of_gyration(traj)
    return block_average_stats(rg, "rg", [1, 2, 4]).orderBy("block_size")


# d10 gates the Manku-style Hamming-ball near-dup: the oracle
# rebuilds the sorted-id SimHash (d3's formula), enumerates pairs by
# the same block-agreement rule, and verifies bit_count(xor) <= k —
# uncapped on both sides at oracle scale.
_D10_ORACLE = """
WITH w AS (
    SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents
),
v AS (
    SELECT word, CAST(row_number() OVER (ORDER BY word) AS BIGINT) AS tid
    FROM (SELECT DISTINCT word FROM w)
),
dt AS (SELECT w.doc_id, v.tid FROM w JOIN v USING (word)),
h AS (
    SELECT doc_id, (tid * 1103515245 + 12345) % 2147483648 AS hv FROM dt
),
bitsum AS (
    SELECT doc_id, b.j,
           sum(((hv // (1 << b.j)) % 2) * 2 - 1) AS s
    FROM h, (SELECT unnest(generate_series(0, 15)) AS j) b
    GROUP BY doc_id, b.j
),
sig AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN s > 0 THEN (1 << j) ELSE 0 END) AS BIGINT) AS sh
    FROM bitsum GROUP BY doc_id
),
blocks AS (
    SELECT doc_id, sh, b.blk, (sh // (1 << (b.blk * 4))) % 16 AS bv
    FROM sig, (SELECT unnest(generate_series(0, 3)) AS blk) b
),
cand AS (
    SELECT DISTINCT l.doc_id AS doc1, r.doc_id AS doc2,
                    l.sh AS sh1, r.sh AS sh2
    FROM blocks l JOIN blocks r
      ON l.blk = r.blk AND l.bv = r.bv AND l.doc_id < r.doc_id
)
SELECT doc1, doc2,
       CAST(bit_count(xor(sh1, sh2)) AS BIGINT) AS hamming
FROM cand WHERE bit_count(xor(sh1, sh2)) <= 3
"""


@register("d10_simhash_hamming_pairs", _D10_ORACLE)
def q_simhash_hamming_pairs(spark, sf_dir):
    from dask_traj_spark.operators.dedup import simhash_neardup_pairs

    return simhash_neardup_pairs(
        _docs(spark, sf_dir), bits=16, k=3, id_mode="sorted", max_bucket=None
    )


_D11_W = 8

_D11_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
idx AS (
    SELECT doc_id, t,
           unnest(generate_series(1, len(t) - {_D11_W - 1})) AS i
    FROM toks WHERE len(t) >= {_D11_W}
),
ngr AS (
    SELECT doc_id, i - 1 AS pos,
           array_to_string(t[i:i + {_D11_W - 1}], ' ') AS ng
    FROM idx
),
dup AS (
    SELECT ng FROM (SELECT DISTINCT ng, doc_id FROM ngr)
    GROUP BY ng HAVING count(*) >= 2
),
hit AS (SELECT doc_id, pos FROM ngr JOIN dup USING (ng)),
isl AS (
    SELECT doc_id, pos,
           CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                         + {_D11_W} THEN 1 ELSE 0 END AS brk
    FROM hit
),
grp AS (
    SELECT doc_id, pos,
           sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
    FROM isl
)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + {_D11_W - 1} AS BIGINT) AS span_end,
       CAST(max(pos) - min(pos) + {_D11_W} AS BIGINT) AS span_tokens
FROM grp GROUP BY doc_id, g
"""


_D14_CAP = 64


def _d14_match_ctes(pair_pred: str, base: str = "documents") -> str:
    """The shared n-gram/cap/islands CTE chain of the d14, d15 and
    d21 oracles, parameterized by the anchor-pair predicate and the
    base relation (d21 passes the side-tagged union) — ONE source of
    truth so a cap or position-base fix can never apply to one gate
    and not the others."""
    return f"""toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM {base}
),
idx AS (
    SELECT doc_id, t,
           unnest(generate_series(1, len(t) - {_D11_W - 1})) AS i
    FROM toks WHERE len(t) >= {_D11_W}
),
ngr AS (
    SELECT doc_id, i - 1 AS pos,
           array_to_string(t[i:i + {_D11_W - 1}], ' ') AS ng
    FROM idx
),
occ AS (
    SELECT doc_id, pos, ng FROM (
        SELECT doc_id, pos, ng, count(*) OVER (PARTITION BY ng) AS c
        FROM ngr)
    WHERE c BETWEEN 2 AND {_D14_CAP}
),
pr AS (
    SELECT a.doc_id AS doc1, b.doc_id AS doc2,
           a.pos AS p1, b.pos AS p2, a.pos - b.pos AS diag
    FROM occ a JOIN occ b ON a.ng = b.ng
    WHERE {pair_pred}
),
isl AS (
    SELECT doc1, doc2, p1, p2, diag,
           CASE WHEN p1 > lag(p1) OVER (PARTITION BY doc1, doc2, diag
                                        ORDER BY p1) + 1
                THEN 1 ELSE 0 END AS brk
    FROM pr
),
grp AS (
    SELECT doc1, doc2, p1, p2, diag,
           sum(brk) OVER (PARTITION BY doc1, doc2, diag ORDER BY p1) AS g
    FROM isl
)"""


_D14_ORACLE = f"""
WITH {_d14_match_ctes("a.doc_id < b.doc_id")}
SELECT doc1, doc2,
       CAST(min(p1) AS BIGINT) AS start1,
       CAST(min(p2) AS BIGINT) AS start2,
       CAST(max(p1) - min(p1) + {_D11_W} AS BIGINT) AS match_tokens
FROM grp GROUP BY doc1, doc2, diag, g
"""


@register("d14_maximal_matches", _D14_ORACLE)
def q_maximal_matches(spark, sf_dir):
    """Pairwise variable-length maximal shared substrings (the
    Lee-et-al. suffix-array signal, from d11's bucketed n-gram plan:
    consecutive anchors on one (doc1, doc2) alignment diagonal ARE
    the maximal matches).  Exact n-gram keys for DuckDB parity; the
    operator default is hashed (8-byte keys — the 100-TB path).
    The occurrence cap (keys kept only at 2..{cap} occurrences) is
    mirrored verbatim in the oracle.  See
    :func:`dask_traj_spark.operators.dedup.maximal_matches` for the
    scale posture (cap before the pair join, keyed islands
    window)."""
    from dask_traj_spark.operators.dedup import maximal_matches

    return maximal_matches(
        _docs(spark, sf_dir), ngram=_D11_W, max_occ=_D14_CAP,
        key_mode="exact",
    )


@register("d11_duplicate_spans", _D11_ORACLE)
def q_duplicate_spans(spark, sf_dir):
    from dask_traj_spark.operators.dedup import duplicate_spans

    # exact n-gram keys for DuckDB parity; the operator default is
    # hashed (xxhash64 keys — the 100-TB path)
    return duplicate_spans(_docs(spark, sf_dir), ngram=_D11_W, key_mode="exact")


_D12_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
idx AS (
    SELECT doc_id, t,
           unnest(generate_series(1, len(t) - {_D11_W - 1})) AS i
    FROM toks WHERE len(t) >= {_D11_W}
),
ngr AS (
    SELECT doc_id, i - 1 AS pos,
           array_to_string(t[i:i + {_D11_W - 1}], ' ') AS ng
    FROM idx
),
dup AS (
    SELECT ng FROM (SELECT DISTINCT ng, doc_id FROM ngr)
    GROUP BY ng HAVING count(*) >= 2
),
hit AS (SELECT doc_id, pos FROM ngr JOIN dup USING (ng)),
isl AS (
    SELECT doc_id, pos,
           CASE WHEN pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                         + {_D11_W} THEN 1 ELSE 0 END AS brk
    FROM hit
),
grp AS (
    SELECT doc_id, pos,
           sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
    FROM isl
),
spans AS (
    SELECT doc_id, min(pos) AS s, max(pos) + {_D11_W - 1} AS e
    FROM grp GROUP BY doc_id, g
),
tokall AS (
    SELECT doc_id, generate_subscripts(t, 1) - 1 AS pos, unnest(t) AS word
    FROM toks
),
keep AS (
    SELECT k.doc_id, k.pos, k.word FROM tokall k
    WHERE NOT EXISTS (
        SELECT 1 FROM spans s
        WHERE s.doc_id = k.doc_id AND k.pos BETWEEN s.s AND s.e
    )
),
agg AS (
    SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text2,
           count(*) AS kept
    FROM keep GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS n FROM tokall GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.text2, '') AS text,
       CAST(t.n - coalesce(a.kept, 0) AS BIGINT) AS n_removed
FROM documents d
JOIN tot t USING (doc_id)
LEFT JOIN agg a USING (doc_id)
"""


_D15_ORACLE = f"""
WITH {_d14_match_ctes(
    "a.doc_id < b.doc_id OR (a.doc_id = b.doc_id AND a.pos > b.pos)"
)},
matches AS (
    SELECT doc1, doc2, min(p1) AS start1, min(p2) AS start2,
           max(p1) - min(p1) + {_D11_W} AS L
    FROM grp GROUP BY doc1, doc2, diag, g
),
spans AS (
    SELECT DISTINCT
           CASE WHEN doc1 < doc2 THEN doc2 ELSE doc1 END AS doc_id,
           CASE WHEN doc1 < doc2 THEN start2 ELSE start1 END AS s,
           CASE WHEN doc1 < doc2 THEN start2 ELSE start1 END + L - 1 AS e
    FROM matches
),
tokall AS (
    SELECT doc_id, generate_subscripts(t, 1) - 1 AS pos, unnest(t) AS word
    FROM toks
),
keep AS (
    SELECT k.doc_id, k.pos, k.word FROM tokall k
    WHERE NOT EXISTS (
        SELECT 1 FROM spans s
        WHERE s.doc_id = k.doc_id AND k.pos BETWEEN s.s AND s.e
    )
),
agg AS (
    SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text2,
           count(*) AS kept
    FROM keep GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS n FROM tokall GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(a.text2, '') AS text,
       CAST(t.n - coalesce(a.kept, 0) AS BIGINT) AS n_removed
FROM documents d
JOIN tot t USING (doc_id)
LEFT JOIN agg a USING (doc_id)
"""


@register("d15_keep_first_excision", _D15_ORACLE)
def q_keep_first_excision(spark, sf_dir):
    """The complete Lee-et-al. substring-dedup ACTION, end to end:
    variable-length maximal matches (cross-doc AND within-doc) →
    keep-first-occurrence span selection → excision — the pipeline a
    100-TB curation pass actually runs.  Exact n-gram keys for
    DuckDB parity; occurrence cap mirrored verbatim.  See
    :func:`dask_traj_spark.operators.dedup.maximal_matches`,
    :func:`~dask_traj_spark.operators.dedup.spans_from_matches`,
    :func:`~dask_traj_spark.operators.dedup.excise_duplicate_spans`."""
    from dask_traj_spark.operators.dedup import (
        excise_duplicate_spans,
        maximal_matches,
        spans_from_matches,
    )

    docs = _docs(spark, sf_dir)
    m = maximal_matches(
        docs, ngram=_D11_W, max_occ=_D14_CAP, key_mode="exact",
        within_doc=True,
    )
    return excise_duplicate_spans(docs, spans_from_matches(m)).select(
        "doc_id", "text", "n_removed"
    )


@register("d12_excise_duplicate_spans", _D12_ORACLE)
def q_excise_duplicate_spans(spark, sf_dir):
    from dask_traj_spark.operators.dedup import (
        duplicate_spans,
        excise_duplicate_spans,
    )

    docs = _docs(spark, sf_dir)
    spans = duplicate_spans(docs, ngram=_D11_W, key_mode="exact")
    return excise_duplicate_spans(docs, spans).select(
        "doc_id", "text", "n_removed"
    )


def _x18_oracle(radius: float, n_points: int) -> str:
    from dask_traj_spark.operators.distance import _sasa_sphere_offsets
    from dask_traj_spark.queries import COORDS_CTE

    pts = _sasa_sphere_offsets(radius, n_points)
    # grid offsets have terminating decimal expansions — exact literals
    values = ", ".join(f"({i}, {ox!r}, {oy!r}, {oz!r})" for i, ox, oy, oz in pts)
    r2 = radius * radius
    return f"""
WITH {COORDS_CTE.strip()},
pts(pt, ox, oy, oz) AS (VALUES {values}),
ap AS (
    SELECT c.frame_id, c.atom_id, p.pt,
           c.x + p.ox AS px, c.y + p.oy AS py, c.z + p.oz AS pz
    FROM coords c, pts p
),
occ AS (
    SELECT DISTINCT a.frame_id, a.atom_id, a.pt
    FROM ap a JOIN coords o
      ON o.frame_id = a.frame_id AND o.atom_id <> a.atom_id
    WHERE (a.px - o.x)*(a.px - o.x) + (a.py - o.y)*(a.py - o.y)
          + (a.pz - o.z)*(a.pz - o.z) < {r2!r}
)
SELECT a.frame_id, a.atom_id,
       CAST(count(*) AS BIGINT) AS n_points,
       CAST(sum(CASE WHEN c.pt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exposed
FROM ap a
LEFT JOIN occ c
  ON c.frame_id = a.frame_id AND c.atom_id = a.atom_id AND c.pt = a.pt
GROUP BY a.frame_id, a.atom_id
"""


@register("x18_sasa_exposure", _x18_oracle(0.03125, 32))
def q_sasa_exposure(spark, sf_dir):
    """Shrake-Rupley solvent-exposure counts: the engine prunes
    occluders with the cell-list neighbor join; the oracle
    brute-forces every (point, other-atom) pair — the pruning is
    exactly what the value gate verifies."""
    from dask_traj_spark.operators.distance import sasa_exposure
    from dask_traj_spark.queries import trajectory_from_embeddings

    traj = trajectory_from_embeddings(spark, sf_dir)
    return sasa_exposure(traj, radius=0.03125, n_points=32)


def _x15_oracle(max_lag: int) -> str:
    from dask_traj_spark.queries import COORDS_CTE

    return f"""
WITH {COORDS_CTE.strip()},
top AS (
    SELECT CAST(vec_id AS INT) AS atom_id,
           CAST(label + 1 AS DOUBLE) AS mass
    FROM embeddings
),
agg AS (
    SELECT c.frame_id,
           sum(t.mass * (c.x*c.x + c.y*c.y + c.z*c.z)) AS srr,
           sum(t.mass * c.x) AS sx, sum(t.mass * c.y) AS sy,
           sum(t.mass * c.z) AS sz, sum(t.mass) AS sm
    FROM coords c JOIN top t USING (atom_id) GROUP BY c.frame_id
),
rg AS (
    SELECT frame_id AS t,
           round(sqrt(greatest(
               srr/sm - ((sx/sm)*(sx/sm) + (sy/sm)*(sy/sm) + (sz/sm)*(sz/sm)),
               0.0)) * 1048576.0) / 1048576.0 AS v
    FROM agg
)
SELECT CAST(b.t - a.t AS BIGINT) AS lag,
       CAST(count(*) AS BIGINT) AS n,
       sum(a.v * b.v) AS sum_ab,
       sum(a.v) AS sum_a,
       sum(b.v) AS sum_b
FROM rg a
JOIN rg b ON b.t >= a.t AND b.t <= a.t + {max_lag}
GROUP BY b.t - a.t
"""


@register("x15_rg_autocorrelation", _x15_oracle(6))
def q_rg_autocorrelation(spark, sf_dir):
    """Order-parameter relaxation: autocorrelation sufficient
    statistics of the Rg time series (2^-20-snapped values — exact
    products/sums, the t9 trick — through the x9 banded lag
    join)."""
    from dask_traj_spark.operators.distance import rg_autocorrelation
    from dask_traj_spark.queries import trajectory_from_embeddings

    traj = trajectory_from_embeddings(spark, sf_dir)
    return rg_autocorrelation(traj, max_lag=6).orderBy("lag")


# BM25 constants for the gated default (k1=1.2, b=0.75), folded in
# Python and embedded at FULL precision on both sides: repr() emits
# the shortest decimal that parses back to the identical double in
# Spark literals and in DuckDB's SQL reader, so k1*b =
# 0.8999999999999999 here is deliberate — the literal 0.9 would be a
# DIFFERENT double from what the operator multiplies with
_T16_QUERY = "hash join merge order"
_T16_CS, _T16_CF, _T16_CL = repr(1.2 + 1.0), repr(1.2 * 0.25), repr(1.2 * 0.75)

_T16_ORACLE = f"""
WITH base AS (
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> '')) AS dl
    FROM documents),
tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents),
qt AS (
    SELECT doc_id, word FROM tok
    WHERE word IN ('hash', 'join', 'merge', 'order')),
tf AS (
    SELECT doc_id, word, count(*) AS tf FROM qt GROUP BY doc_id, word),
dfreq AS (
    SELECT word, count(DISTINCT doc_id) AS df FROM qt GROUP BY word),
stats AS (
    SELECT count(*) AS n_docs, sum(dl) AS total_len FROM base),
scored AS (
    SELECT tf.doc_id,
           floor(((CAST(stats.n_docs AS DOUBLE) / CAST(dfreq.df AS DOUBLE))
                  * (CAST(tf.tf AS DOUBLE) * {_T16_CS}))
                 / (CAST(tf.tf AS DOUBLE)
                    + ({_T16_CF} + {_T16_CL}
                       * (CAST(base.dl * stats.n_docs AS DOUBLE)
                          / CAST(stats.total_len AS DOUBLE))))
                 * 1048576.0) / 1048576.0 AS s
    FROM tf
    JOIN dfreq USING (word)
    JOIN base USING (doc_id)
    CROSS JOIN stats),
agg AS (
    SELECT doc_id, sum(s) AS score, count(*) AS matched
    FROM scored GROUP BY doc_id)
SELECT doc_id,
       CAST(matched AS BIGINT) AS matched_terms,
       round(score, 6) AS bm25_q6
FROM agg
ORDER BY score DESC, doc_id
LIMIT 5
"""


@register("t16_bm25_topk", _T16_ORACLE)
def q_bm25_topk(spark, sf_dir):
    """BM25 top-5 retrieval for a fixed 4-term query over the
    documents table — the decontamination-search / query-driven
    curation primitive; see
    :func:`dask_traj_spark.functions.text.bm25_topk` for the
    raw-ratio-idf + dyadic-snap exactness rationale and the 100-TB
    plan posture (filtered explode, broadcast df/stats, top-k via
    TakeOrderedAndProject)."""
    from dask_traj_spark.functions.text import bm25_topk

    return bm25_topk(_docs(spark, sf_dir), _T16_QUERY, k=5)


_D13_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_probes,
       CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_true_members,
       CAST(0 AS BIGINT) AS false_negatives,
       TRUE AS fp_within_bound
FROM documents
"""


@register("d13_bloom_cross_corpus", _D13_ORACLE)
def q_bloom_cross_corpus(spark, sf_dir):
    """Cross-corpus Bloom membership contract gate: even-id docs
    probe with their own text (true members), odd-id docs probe with
    a guaranteed-novel suffix (true non-members).  The Spark side
    measures the filter's ACTUAL false negatives (must be exactly 0
    — Bloom filters never false-negative under one hash family) and
    checks the false-positive count against a generous integer bound
    (20·fp <= non_members + 100).  The filter is sized FROM the
    corpus (next power of two >= 16 bits/key, floor 2^16 — with 4
    hashes that is ~0.2-0.5% theoretical FP at ANY scale factor), so
    a scale bump can never cross the 5% gate bound and read as an
    operator regression; the oracle pins the membership arithmetic
    and the contract flags.  See
    :func:`dask_traj_spark.operators.dedup.bloom_membership` for the
    100-TB plan posture (bounded bitmap shuffle, broadcast-or-
    shuffle lookups, the corpus never joined row-to-row)."""
    from dask_traj_spark.operators.dedup import bloom_membership

    docs = _docs(spark, sf_dir)
    n_bits = 1 << max(16, (16 * docs.count() - 1).bit_length())
    members = docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    nonmembers = docs.where(F.col("doc_id") % 2 == 1).select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" zz-novel-"), F.col("doc_id")
        ).alias("text"),
    )
    probes = members.unionByName(nonmembers)
    flags = bloom_membership(
        docs, probes, n_bits=n_bits, n_hashes=4
    )
    truly = F.col("doc_id") % 2 == 0
    dup = F.col("maybe_dup")
    return flags.agg(
        F.count("*").alias("n_probes"),
        F.sum(truly.cast("long")).alias("n_true_members"),
        F.sum((truly & ~dup).cast("long")).alias("false_negatives"),
        (
            F.sum(((~truly) & dup).cast("long")) * F.lit(20)
            <= F.sum((~truly).cast("long")) + F.lit(100)
        ).alias("fp_within_bound"),
    )


_SX9_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_probes,
       CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_true_members,
       CAST(0 AS BIGINT) AS false_negatives,
       TRUE AS fp_within_bound,
       TRUE AS state_matches_oneshot
FROM documents
"""


@register("sx9_stream_bloom_twin", _SX9_ORACLE)
def q_stream_bloom_twin(spark, sf_dir):
    """Incremental Bloom vs the one-shot build, bitwise: replay the
    corpus in three deterministic micro-batches through the
    foreachBatch body (per-batch bitmap partials, batch_id-
    partitioned state, dynamic-overwrite replay of the middle batch),
    merge with ``bloom_state``, and (a) prove the merged bitmap
    equals ``bloom_build`` over the whole corpus word-for-word —
    bit_or is associative, so the stream and the batch build are
    bit-identical — then (b) run d13's full membership contract
    against the STREAMED bitmap."""
    import shutil
    import tempfile

    from dask_traj_spark.operators.dedup import bloom_build, bloom_membership
    from dask_traj_spark.streaming.dedup import (
        bloom_state,
        process_bloom_batch,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    # same corpus-driven sizing as d13 (16 bits/key, floor 2^16):
    # keeps the FP gate's 5% bound safe at any scale factor
    n_bits = 1 << max(16, (16 * docs.count() - 1).bit_length())
    work = tempfile.mkdtemp(prefix="sx9_bloom_twin_")
    state = f"{work}/state"
    try:
        for bch in range(3):
            process_bloom_batch(
                docs.where(F.col("doc_id") % 3 == bch), bch, state,
                n_bits=n_bits,
            )
        # crash-replay of the middle batch: the partition is rewritten
        # in place and the bit_or merge must be unaffected
        process_bloom_batch(
            docs.where(F.col("doc_id") % 3 == 1), 1, state,
            n_bits=n_bits,
        )
        merged = bloom_state(spark, state)
        oneshot = bloom_build(docs, n_bits=n_bits)
        mismatches = (
            merged.withColumnRenamed("bits", "sb")
            .join(oneshot.withColumnRenamed("bits", "ob"), "word_idx", "full")
            .where(
                F.coalesce(F.col("sb"), F.lit(0))
                != F.coalesce(F.col("ob"), F.lit(0))
            )
            .count()
        )
        members = docs.where(F.col("doc_id") % 2 == 0).select(
            "doc_id", "text"
        )
        nonmembers = docs.where(F.col("doc_id") % 2 == 1).select(
            "doc_id",
            F.concat(
                F.col("text"), F.lit(" zz-novel-"), F.col("doc_id")
            ).alias("text"),
        )
        flags = bloom_membership(
            None, members.unionByName(nonmembers), bitmap=merged,
            n_bits=n_bits,
        )
        truly = F.col("doc_id") % 2 == 0
        dup = F.col("maybe_dup")
        pdf = flags.agg(
            F.count("*").alias("n_probes"),
            F.sum(truly.cast("long")).alias("n_true_members"),
            F.sum((truly & ~dup).cast("long")).alias("false_negatives"),
            (
                F.sum(((~truly) & dup).cast("long")) * F.lit(20)
                <= F.sum((~truly).cast("long")) + F.lit(100)
            ).alias("fp_within_bound"),
            F.lit(mismatches == 0).alias("state_matches_oneshot"),
        ).toPandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        pdf,
        "n_probes long, n_true_members long, false_negatives long, "
        "fp_within_bound boolean, state_matches_oneshot boolean",
    )


# ---------------------------------------------------------------------
# c8: per-stratum quality-percentile pruning
# ---------------------------------------------------------------------

_C8_QUALITY = f"""(CAST(len(list_filter(string_split(text, ' '), w -> w IN {_STOP_SQL})) AS DOUBLE)
            / CAST({_NTOK} AS DOUBLE)
        + least(CAST({_NTOK} AS DOUBLE), 50.0) / 50.0
        + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / CAST({_NTOK} AS DOUBLE)) / 3.0"""

_C8_ORACLE = f"""
WITH q AS (
    SELECT doc_id, source, {_C8_QUALITY} AS quality FROM documents
),
r AS (
    SELECT doc_id, source, quality,
           percent_rank() OVER (
               PARTITION BY source ORDER BY quality DESC, doc_id ASC
           ) AS pct_rank
    FROM q
)
SELECT doc_id, source, quality, pct_rank FROM r WHERE pct_rank <= 0.6
"""


@register("c8_quantile_prune", _C8_ORACLE)
def q_quantile_prune(spark, sf_dir):
    """Keep the top 60% of every source by the t2 quality score —
    the per-source percentile pruning step (a global threshold would
    let one clean source crowd out the rest).  percent_rank is
    (rank-1)/(n-1) in both engines, ties broken by doc_id, so the
    keep decision is bit-deterministic."""
    from dask_traj_spark.operators.curation import quantile_prune

    return quantile_prune(_docs(spark, sf_dir), keep_frac=0.6)


# ---------------------------------------------------------------------
# t17: DSIR hashed-unigram importance weights
# ---------------------------------------------------------------------

def _t17_oracle(n_buckets: int) -> str:
    from dask_traj_spark.operators.curation import DSIR_GRID, _MIX_A, _MIX_M

    bkt = f"((CAST(v.tid AS BIGINT) * {_MIX_A}) % {_MIX_M}) % {n_buckets}"
    return f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
ttok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    WHERE doc_id % 20 = 0
),
voc AS (
    SELECT word, CAST(ROW_NUMBER() OVER (ORDER BY word) AS INT) AS tid
    FROM (SELECT DISTINCT word
          FROM (SELECT word FROM tok UNION ALL SELECT word FROM ttok))
),
rb AS (
    SELECT {bkt} AS bucket, count(*) AS c_raw
    FROM tok t JOIN voc v USING (word) GROUP BY 1
),
tb AS (
    SELECT {bkt} AS bucket, count(*) AS c_tgt
    FROM ttok t JOIN voc v USING (word) GROUP BY 1
),
tot AS (SELECT (SELECT count(*) FROM tok) AS n_raw,
               (SELECT count(*) FROM ttok) AS n_tgt),
model AS (
    SELECT rb.bucket,
           round(ln(CAST(COALESCE(tb.c_tgt, 0) + 1 AS DOUBLE)
                    / CAST(tot.n_tgt + {n_buckets} AS DOUBLE)) * {DSIR_GRID}, 0)
               / {DSIR_GRID}
         - round(ln(CAST(rb.c_raw + 1 AS DOUBLE)
                    / CAST(tot.n_raw + {n_buckets} AS DOUBLE)) * {DSIR_GRID}, 0)
               / {DSIR_GRID} AS lr
    FROM rb LEFT JOIN tb USING (bucket), tot
)
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       round(sum(m.lr) / count(*), 6) AS avg_logratio
FROM tok t JOIN voc v USING (word)
JOIN model m ON m.bucket = {bkt}
GROUP BY t.doc_id
"""


@register("t17_dsir_importance", _t17_oracle(4096))
def q_dsir_importance(spark, sf_dir):
    """DSIR importance weights with the doc_id % 20 == 0 slice as
    the target distribution (a stand-in for "looks like Wikipedia" —
    the operator takes any target DataFrame).  Sorted-vocab ids for
    DuckDB parity; the operator default is open-vocabulary xxhash."""
    from dask_traj_spark.operators.curation import dsir_importance

    docs = _docs(spark, sf_dir)
    target = docs.where(F.col("doc_id") % 20 == 0)
    return dsir_importance(docs, target, n_buckets=4096, id_mode="sorted")


# ---------------------------------------------------------------------
# c9: weighted sampling without replacement (exponential race)
# ---------------------------------------------------------------------

def _c9_oracle(k: int) -> str:
    from dask_traj_spark.operators.curation import DSIR_GRID, _MIX_A, _MIX_M

    return f"""
WITH keyed AS (
    SELECT doc_id, CAST({_NTOK} AS DOUBLE) AS weight,
           round(-ln(CAST(((doc_id * {_MIX_A}) % {_MIX_M}) + 1 AS DOUBLE)
                     / {float(_MIX_M)}) * {DSIR_GRID}, 0) / {DSIR_GRID}
               / CAST({_NTOK} AS DOUBLE) AS key
    FROM documents
)
SELECT doc_id, weight, key FROM keyed ORDER BY key, doc_id LIMIT {k}
"""


@register("c9_weighted_sample", _c9_oracle(100))
def q_weighted_sample(spark, sf_dir):
    """Token-count-weighted document draw (Efraimidis–Spirakis
    exponential race): key = snap(−ln(u))/n_tokens, k smallest keys.
    Long documents are proportionally overrepresented — the
    length-proportional mixing draw.  mult-hash u for DuckDB parity;
    the operator default is seeded xxhash."""
    from dask_traj_spark.operators.curation import weighted_sample

    return weighted_sample(_docs(spark, sf_dir), k=100, order_mode="mult")


@register("sx10_stream_weighted_sample_twin", _c9_oracle(100))
def q_stream_weighted_sample_twin(spark, sf_dir):
    """Streaming weighted sampling vs c9's value oracle directly:
    replay the corpus in three deterministic micro-batches through
    the foreachBatch body (per-batch local top-k partials, batch_id-
    partitioned state, dynamic-overwrite replay idempotence) — the
    k-smallest-keys merge is associative, so the merged state must
    equal the one-shot batch draw VALUE-FOR-VALUE."""
    import shutil
    import tempfile

    from dask_traj_spark.streaming.sampling import (
        process_weighted_sample_batch,
        weighted_sample_state,
    )

    docs = _docs(spark, sf_dir)
    work = tempfile.mkdtemp(prefix="sx10_wsample_twin_")
    state = f"{work}/state"
    try:
        for b in range(3):
            process_weighted_sample_batch(
                docs.where(F.col("doc_id") % 3 == b), b, state,
                k=100, order_mode="mult",
            )
        # crash-replay of the middle batch: its partition is rewritten
        # in place and the merge must not change
        process_weighted_sample_batch(
            docs.where(F.col("doc_id") % 3 == 1), 1, state,
            k=100, order_mode="mult",
        )
        pdf = weighted_sample_state(spark, state, k=100).toPandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(pdf, "doc_id long, weight double, key double")


# ---------------------------------------------------------------------
# t18/t19: distributed BPE tokenizer training + token accounting
# ---------------------------------------------------------------------

def _bpe_ctes(k: int) -> str:
    """k chained merge rounds as generated CTE stages (the MinHash
    generated-oracle pattern).  MATERIALIZED is load-bearing: each
    round references its predecessor several times, and un-pinned
    CTEs would inline exponentially.  Overlap resolution: only
    lft==rgt matches can overlap (s[i]=a, s[i+1]=b=a, s[i+2]=b), so
    keeping even offsets within each consecutive-match run is exactly
    the left-to-right non-overlapping greedy scan."""
    parts = [TOK_CTE.strip(), """
wf AS (SELECT word, count(*) AS freq FROM tok WHERE word != '' GROUP BY word),
w0 AS MATERIALIZED (SELECT word, freq,
              list_filter(regexp_split_to_array(word, ''), x -> x != '') AS syms
       FROM wf)""".strip()]
    for r in range(1, k + 1):
        p = r - 1
        parts.append(f"""
s{r} AS MATERIALIZED (SELECT word, freq, generate_subscripts(syms, 1) AS pos,
                unnest(syms) AS sym
         FROM w{p}),
p{r} AS (SELECT a.sym AS lft, b.sym AS rgt, sum(a.freq) AS cnt
         FROM s{r} a JOIN s{r} b ON b.word = a.word AND b.pos = a.pos + 1
         GROUP BY 1, 2),
b{r} AS MATERIALIZED (SELECT lft, rgt, cnt FROM p{r}
         ORDER BY cnt DESC, lft ASC, rgt ASC LIMIT 1),
mm{r} AS (SELECT a.word, a.pos
          FROM s{r} a
          JOIN s{r} b ON b.word = a.word AND b.pos = a.pos + 1
          JOIN b{r} ON a.sym = b{r}.lft AND b.sym = b{r}.rgt),
mg{r} AS (SELECT word, pos,
                 pos - ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos) AS grp
          FROM mm{r}),
mk{r} AS (SELECT word, pos FROM (
              SELECT word, pos,
                     min(pos) OVER (PARTITION BY word, grp) AS g0
              FROM mg{r})
          WHERE (pos - g0) % 2 = 0),
w{r} AS MATERIALIZED (SELECT s.word, min(s.freq) AS freq,
                list(CASE WHEN k1.pos IS NOT NULL
                          THEN (SELECT lft || rgt FROM b{r})
                          ELSE s.sym END ORDER BY s.pos) AS syms
         FROM s{r} s
         LEFT JOIN mk{r} k1 ON k1.word = s.word AND k1.pos = s.pos
         LEFT JOIN mk{r} k2 ON k2.word = s.word AND k2.pos = s.pos - 1
         WHERE k2.pos IS NULL
         GROUP BY s.word)""".strip())
    return ",\n".join(parts)


def _t18_oracle(k: int) -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS rank, lft, rgt, "
        f"CAST(cnt AS BIGINT) AS cnt FROM b{r}"
        for r in range(1, k + 1)
    )
    return f"WITH {_bpe_ctes(k)}\n{unions}"


def _t19_oracle(k: int) -> str:
    return f"""WITH {_bpe_ctes(k)}
SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(len(w.syms)) AS BIGINT) AS n_bpe_tokens
FROM tok t JOIN w{k} w USING (word)
GROUP BY t.doc_id"""


_BPE_MERGES = 8


def _bpe_cached(spark, sf_dir):
    """t18 and t19 share one training run per (session, sf_dir)."""
    from dask_traj_spark.operators.bpe import bpe_train

    key = ("_bpe_cache", sf_dir)
    cache = getattr(spark, "_dts_bpe", None)
    if cache is None or cache[0] != key:
        merges, seg = bpe_train(_docs(spark, sf_dir), n_merges=_BPE_MERGES)
        spark._dts_bpe = (key, merges, seg)
        cache = spark._dts_bpe
    return cache[1], cache[2]


@register("t18_bpe_train", _t18_oracle(_BPE_MERGES))
def q_bpe_train(spark, sf_dir):
    """Distributed BPE tokenizer training: 8 merge rounds on the
    corpus word-frequency table, deterministic tie-break
    (count DESC, pair ASC).  The oracle replays the identical merge
    sequence through generated positional-rewrite CTE stages."""
    merges, _seg = _bpe_cached(spark, sf_dir)
    return spark.createDataFrame(
        merges, "rank long, lft string, rgt string, cnt long"
    )


@register("t19_bpe_token_counts", _t19_oracle(_BPE_MERGES))
def q_bpe_token_counts(spark, sf_dir):
    """Per-document token accounting under the trained BPE
    vocabulary — the exact counts sequence packing and mixture
    budgets need (whitespace words → learned subword segmentation)."""
    from dask_traj_spark.operators.bpe import bpe_token_counts

    _merges, seg = _bpe_cached(spark, sf_dir)
    return bpe_token_counts(_docs(spark, sf_dir), seg)


def _c10_oracle(k: int) -> str:
    """BPE-aware packing: the t19 per-doc counts feed the SHARED
    packing formulation (_pack_sql — identical math to c4; the Spark
    side runs the distributed prefix sum, never a global sort)."""
    return _pack_sql(f"""WITH {_bpe_ctes(k)},
pk_counts AS (SELECT t.doc_id, CAST(sum(len(w.syms)) AS BIGINT) AS n_tokens
       FROM tok t JOIN w{k} w USING (word) GROUP BY t.doc_id)""")


@register("c10_bpe_sequence_packing", _c10_oracle(_BPE_MERGES))
def q_bpe_sequence_packing(spark, sf_dir):
    """Sequence packing by REAL tokenizer counts: the trained BPE
    segmentation's per-doc token counts (t19) drive c4's distributed
    prefix-sum packing — production packs by what the tokenizer
    emits, not by whitespace words."""
    from dask_traj_spark.operators.bpe import bpe_token_counts
    from dask_traj_spark.operators.curation import pack_sequences

    docs = _docs(spark, sf_dir)
    _m, seg = _bpe_cached(spark, sf_dir)
    counts = bpe_token_counts(docs, seg).select(
        "doc_id", F.col("n_bpe_tokens").alias("n_tokens")
    )
    return pack_sequences(
        docs, budget=512, order_mode="mult", token_counts=counts
    )


# ---------------------------------------------------------------------
# d16: quality-aware cluster keep policy (NEW post-rotation — tail-
# resident with local three-SF evidence, seats FIRST in r11 per the
# r4 late-addition precedent)
# ---------------------------------------------------------------------

def _d16_oracle(threshold: float) -> str:
    """The shared d7 closure (_components_cte) + the t2 quality
    expression + a per-component argmax window
    (quality DESC, doc_id ASC)."""
    return f"""
{_components_cte(threshold)},
q AS (
    SELECT doc_id, {_C8_QUALITY} AS quality FROM documents
),
ranked AS (
    SELECT c.id AS doc_id, c.comp AS component, q.quality,
           ROW_NUMBER() OVER (
               PARTITION BY c.comp
               ORDER BY q.quality DESC, c.id ASC
           ) AS rk
    FROM c JOIN q ON q.doc_id = c.id
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(component AS BIGINT) AS component,
       quality,
       CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM ranked
"""


@register("d16_cluster_keep_best", _d16_oracle(0.9))
def q_cluster_keep_best(spark, sf_dir):
    """Near-dup clusters keep their BEST-QUALITY member: d2's pair
    graph → d7's min-label components → one keep per component by
    the t2 quality argmax (doc_id breaks ties) — the decision real
    pipelines apply to templated near-dup runs."""
    from dask_traj_spark.operators.dedup import (
        MAX_BUCKET,
        keep_best_in_clusters,
        near_duplicates_minhash,
    )

    docs = _docs(spark, sf_dir)
    pairs = near_duplicates_minhash(
        docs, threshold=0.9, id_mode="sorted", max_bucket=MAX_BUCKET
    ).select(F.col("doc1").alias("id1"), F.col("doc2").alias("id2"))
    return keep_best_in_clusters(docs, pairs)


# ---------------------------------------------------------------------
# c11: temperature-scaled mixture weights (NEW post-rotation — tail-
# resident with local three-SF evidence, seats r11 with d16)
# ---------------------------------------------------------------------

def _c11_oracle(total_budget: int) -> str:
    from dask_traj_spark.operators.curation import DSIR_GRID

    return f"""
WITH per AS (
    SELECT source,
           CAST(sum({_NTOK}) AS BIGINT) AS n_tokens
    FROM documents GROUP BY source
),
sc AS (
    SELECT source, n_tokens,
           round(sqrt(CAST(n_tokens AS DOUBLE)) * {DSIR_GRID}, 0) / {DSIR_GRID}
               AS scaled
    FROM per
),
tot AS (SELECT sum(scaled) AS z FROM sc)
SELECT source, n_tokens,
       scaled / tot.z AS weight,
       CAST(floor(scaled / tot.z * {float(int(total_budget))}) AS BIGINT)
           AS budget_tokens
FROM sc, tot
"""


@register("c11_mixture_weights", _c11_oracle(1_000_000))
def q_mixture_weights(spark, sf_dir):
    """UniMax/T5-style α=0.5 mixture weights: per-source sampling
    weight ∝ sqrt(token count), normalized, with a 1M-token budget
    split.  sqrt is the one correctly-rounded power; each sqrt is
    snapped to the 2^-20 grid before the normalizing sum so the
    total is an exact dyadic sum in both engines."""
    from dask_traj_spark.operators.curation import mixture_weights

    return mixture_weights(_docs(spark, sf_dir), total_budget=1_000_000)


# ---------------------------------------------------------------------
# c12: fixed-window context chunking (NEW post-rotation — tail-
# resident with local three-SF evidence, seats r11 with d16/c11)
# ---------------------------------------------------------------------

def _c12_ctes(chunk: int, stride: int, src: str = "documents") -> str:
    """Shared chunking CTE chain over any (doc_id, text) relation —
    one definition for the c12 gate and the c14 composite (the
    d14/d15 shared-fragment rule), ending at ``chunks(doc_id,
    chunk_idx, n_tokens, chunk_text)``."""
    return f"""t AS (
    SELECT doc_id, string_split(text, ' ') AS toks,
           len(string_split(text, ' ')) AS n_doc
    FROM {src} WHERE text IS NOT NULL
),
c AS (
    SELECT doc_id, toks, n_doc,
           unnest(generate_series(0,
               CASE WHEN n_doc <= {chunk} THEN 0
                    ELSE (n_doc - {chunk} + {stride - 1}) // {stride} END))
               AS chunk_idx
    FROM t
),
chunks AS (
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(least({chunk}, n_doc - chunk_idx * {stride}) AS INT)
               AS n_tokens,
           array_to_string(
               list_slice(toks, chunk_idx * {stride} + 1,
                          chunk_idx * {stride} + {chunk}), ' ') AS chunk_text
    FROM c
)"""


def _c12_oracle(chunk: int, stride: int) -> str:
    return f"""
WITH {_c12_ctes(chunk, stride)}
SELECT doc_id, chunk_idx, n_tokens, chunk_text FROM chunks
"""


@register("c12_context_chunks", _c12_oracle(64, 48))
def q_context_chunks(spark, sf_dir):
    """Fixed 64-token windows at stride 48 (16-token overlap): the
    context-length splitting step, the complement of c4/c10 packing.
    Pure integer arithmetic — chunk boundaries and the re-joined
    chunk text are exact in both engines; zero shuffles."""
    from dask_traj_spark.operators.curation import context_chunks

    return context_chunks(_docs(spark, sf_dir), chunk_tokens=64, stride=48)


# ---------------------------------------------------------------------
# t20: per-document character-distribution entropy (tail-resident,
# seats r11)
# ---------------------------------------------------------------------

_T20_TERM = (
    "round((len(list_filter(string_split(text, ''), x -> x = c))"
    " / CAST(length(text) AS DOUBLE))"
    " * ln(len(list_filter(string_split(text, ''), x -> x = c))"
    " / CAST(length(text) AS DOUBLE))"
    " * 1048576.0, 0) / 1048576.0"
)

_T20_ORACLE = f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(list_distinct(string_split(text, ''))) AS INT)
           AS n_distinct_chars,
       0.0 - list_sum(list_transform(
           list_distinct(string_split(text, '')), c -> {_T20_TERM}))
           AS entropy
FROM documents WHERE text IS NOT NULL AND length(text) > 0
"""


@register("t20_char_entropy", _T20_ORACLE)
def q_char_entropy(spark, sf_dir):
    """Per-doc character-distribution Shannon entropy (nats) — the
    model-free gibberish/compressibility signal.  Each p·ln(p) term
    is snapped to the 2^-20 grid so the per-doc sum is an exact sum
    of dyadics (order-independent in both engines); the ASCII corpus
    makes Spark's split('') and DuckDB's string_split('') agree
    character-for-character.  Zero shuffles — one JVM-side HOF
    projection."""
    from dask_traj_spark.functions.text import char_entropy

    return char_entropy(_docs(spark, sf_dir))


# ---------------------------------------------------------------------
# t21: per-source unigram KL divergence from the corpus (tail-
# resident, seats r11)
# ---------------------------------------------------------------------

def _t21_oracle() -> str:
    from dask_traj_spark.functions.text import LP_GRID

    g = f"{LP_GRID:.1f}"
    p_s = "CAST(sw.c_sw AS DOUBLE) / CAST(st.n_s AS DOUBLE)"
    p_w = "CAST(wm.c_w AS DOUBLE) / CAST(tot.n AS DOUBLE)"
    return f"""
WITH ex AS (
    SELECT source AS src, unnest(string_split(text, ' ')) AS word
    FROM documents
),
sw AS (SELECT word, src, count(*) AS c_sw FROM ex GROUP BY word, src),
wm AS (SELECT word, sum(c_sw) AS c_w FROM sw GROUP BY word),
st AS (SELECT src, sum(c_sw) AS n_s FROM sw GROUP BY src),
tot AS (SELECT sum(c_sw) AS n FROM sw)
SELECT sw.src AS source,
       CAST(sum(sw.c_sw) AS BIGINT) AS n_tokens,
       sum(round(({p_s})
           * (round(ln({p_s}) * {g}, 0) / {g}
              - round(ln({p_w}) * {g}, 0) / {g})
           * {g}, 0) / {g}) AS kl_nats
FROM sw JOIN wm USING (word) JOIN st USING (src), tot
GROUP BY sw.src
"""


@register("t21_source_unigram_kl", _t21_oracle())
def q_source_unigram_kl(spark, sf_dir):
    """KL(P_source ‖ P_corpus) over unigrams, one row per source —
    the mixture diagnostic for c5/c11 weighting.  No smoothing needed
    (every source word is a corpus word); both ln's snapped to the
    2^-20 grid before the exact difference, the product snapped again
    so each per-source sum is an exact dyadic sum."""
    from dask_traj_spark.functions.text import source_unigram_kl

    return source_unigram_kl(_docs(spark, sf_dir))


# ---------------------------------------------------------------------
# t22: winnowing fingerprints (tail-resident, seats r11)
# ---------------------------------------------------------------------

def _t22_ctes(k: int, w: int) -> str:
    """Shared winnowing CTE chain (gram → sorted-vocab mult-hash →
    window-min → rightmost selection) — one definition for the t22
    fingerprint gate and the d17 match gate (the d14/d15
    shared-fragment rule), ending at ``sel(doc_id, wmin, pos)``."""
    return f"""t AS (
    SELECT doc_id, string_split(text, ' ') AS toks
    FROM documents
    WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= {k}
),
ix AS (
    SELECT doc_id, toks,
           unnest(generate_series(1, len(toks) - {k} + 1)) AS i
    FROM t
),
g AS (
    SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
           array_to_string(list_slice(toks, i, i + {k} - 1), ' ') AS gram
    FROM ix
),
voc AS (
    SELECT gram, CAST(row_number() OVER (ORDER BY gram) AS BIGINT) AS tid
    FROM (SELECT DISTINCT gram FROM g)
),
h AS (
    SELECT doc_id, pos, (tid * 2654435761) % 4294967296 AS fp
    FROM g JOIN voc USING (gram)
),
m AS (SELECT doc_id, count(*) AS m FROM h GROUP BY doc_id),
r AS (
    SELECT doc_id, pos AS j,
           min(fp) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
               AS wmin
    FROM h
),
wins AS (
    SELECT r.doc_id, r.j, r.wmin
    FROM r JOIN m USING (doc_id)
    WHERE r.j <= greatest(m.m - {w}, 0)
),
sel AS (
    SELECT w.doc_id, w.wmin, max(h2.pos) AS pos
    FROM wins w JOIN h h2 ON h2.doc_id = w.doc_id
        AND h2.pos BETWEEN w.j AND w.j + {w - 1} AND h2.fp = w.wmin
    GROUP BY w.doc_id, w.j, w.wmin
)"""


def _t22_oracle(k: int, w: int) -> str:
    return f"""
WITH {_t22_ctes(k, w)}
SELECT DISTINCT doc_id, CAST(pos AS INT) AS pos, CAST(wmin AS BIGINT) AS fp
FROM sel
"""


def _d17_ctes(k: int, w: int, min_shared: int, max_df: int) -> str:
    """t22's winnowing chain + the capped match-pair CTE — one
    definition for the d17 gate and the d18 PageRank gate, ending at
    ``d17p(doc1, doc2, n_shared)``."""
    return f"""{_t22_ctes(k, w)},
fps AS (SELECT DISTINCT doc_id, wmin AS fp FROM sel),
capped AS (
    SELECT doc_id, fp FROM (
        SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS dfq FROM fps
    ) WHERE dfq <= {max_df}
),
d17p AS (
    SELECT a.doc_id AS doc1, b.doc_id AS doc2,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {min_shared}
)"""


def _d17_oracle(k: int, w: int, min_shared: int, max_df: int) -> str:
    return f"""
WITH {_d17_ctes(k, w, min_shared, max_df)}
SELECT doc1, doc2, n_shared FROM d17p
"""


@register("t22_winnowing", _t22_oracle(3, 4))
def q_winnowing(spark, sf_dir):
    """Winnowing fingerprints (Schleimer et al. 2003 / MOSS) over
    3-token grams, window 4: per window select the minimum hash,
    rightmost on ties — any shared run of >= w+k-1 = 6 tokens is
    guaranteed a shared fingerprint.  Selection is pure integer
    comparison (no floats); the sorted-vocab mult-hash gate path is
    mirrored positionally in SQL (the engine's HOF fold and the
    oracle's window-min + rightmost-argmax-join compute the same
    selection set).  Production default is zero-shuffle xxhash64."""
    from dask_traj_spark.functions.text import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf_dir), k=3, w=4, id_mode="sorted")


# ---------------------------------------------------------------------
# d17: MOSS-style winnowing matches (tail-resident, seats r11)
# ---------------------------------------------------------------------

@register("d17_winnow_matches", _d17_oracle(3, 4, 2, 64))
def q_winnow_matches(spark, sf_dir):
    """Shared-winnowing-fingerprint pair matching (the MOSS report
    candidates): distinct (doc, fp) selections, document-frequency
    cap 64 (mirrored in the oracle — the MAX_BUCKET discipline),
    one fp-keyed self-join, pairs with >= 2 shared fingerprints.
    Counting is pure integers; the winnowing CTE chain is shared
    verbatim with t22's oracle."""
    from dask_traj_spark.operators.dedup import winnow_matches

    return winnow_matches(
        _docs(spark, sf_dir), k=3, w=4, min_shared=2, max_df=64,
        id_mode="sorted",
    )


# ---------------------------------------------------------------------
# c13: deterministic training-shard shuffle (tail-resident, seats r11)
# ---------------------------------------------------------------------

def _c13_oracle(n_shards: int) -> str:
    from dask_traj_spark.operators.curation import _MIX_A, _MIX_M

    return f"""
WITH keyed AS (
    SELECT doc_id, (doc_id * {_MIX_A}) % {_MIX_M} AS h FROM documents
)
SELECT doc_id, CAST(h % {n_shards} AS INT) AS shard,
       CAST(row_number() OVER (
           PARTITION BY h % {n_shards} ORDER BY h, doc_id
       ) AS BIGINT) AS pos
FROM keyed
"""


@register("c13_shuffle_shards", _c13_oracle(8))
def q_shuffle_shards(spark, sf_dir):
    """Deterministic global shuffle into 8 training shards: shard =
    seeded hash mod 8, pos = hash rank within the shard (doc_id on
    ties) — the reproducible "shuffle before training" step.  Pure
    integer arithmetic; mult-hash for DuckDB parity (operator
    default is seeded xxhash)."""
    from dask_traj_spark.operators.curation import shuffle_shards

    return shuffle_shards(
        _docs(spark, sf_dir), n_shards=8, order_mode="mult"
    ).select("doc_id", "shard", "pos")


# ---------------------------------------------------------------------
# t23: CCNet-style perplexity buckets (tail-resident, seats r11)
# ---------------------------------------------------------------------

_T23_ORACLE = f"""
WITH {_T9_CTES},
j AS (
    SELECT d.doc_id, d.source, s.avg_logprob
    FROM documents d JOIN t9sc s USING (doc_id)
),
r AS (
    SELECT doc_id, source, avg_logprob,
           row_number() OVER (
               PARTITION BY source ORDER BY avg_logprob DESC, doc_id
           ) AS rk,
           count(*) OVER (PARTITION BY source) AS n
    FROM j
)
SELECT doc_id, source, avg_logprob,
       CASE WHEN rk * 3 <= n THEN 'head'
            WHEN rk * 3 <= n * 2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM r
"""


@register("t23_perplexity_buckets", _T23_ORACLE)
def q_perplexity_buckets(spark, sf_dir):
    """CCNet head/middle/tail bucketing: rank every doc within its
    source by the t9 bigram log-prob (best third = head), boundaries
    as INTEGER comparisons (rk·3 ≤ n), doc_id breaking ties — the
    select/sample/drop curation split, bit-deterministic in both
    engines.  The t9 CTE chain is shared verbatim with t9's oracle."""
    from dask_traj_spark.functions.text import perplexity_buckets

    return perplexity_buckets(_docs(spark, sf_dir))


# ---------------------------------------------------------------------
# sx11: streaming winnowing-match twin (tail-resident, seats r11)
# ---------------------------------------------------------------------

_SX11_ORACLE = """
SELECT CAST(0 AS BIGINT) AS stream_only_pairs,
       CAST(0 AS BIGINT) AS batch_only_pairs,
       TRUE AS n_shared_values_match,
       TRUE AS replay_idempotent
"""


@register("sx11_stream_winnow_twin", _SX11_ORACLE)
def q_stream_winnow_twin(spark, sf_dir):
    """Equivalence gate for the incremental winnowing-match loop:
    replay the corpus through the foreachBatch body in three
    deterministic micro-batches (doc_id % 3) with a crash-replay of
    the middle batch; the accumulated results must equal the batch
    operator's output EXACTLY — same pairs, identical n_shared
    (fingerprints are stateless xxhash64, so a pair's intersection
    is the same incrementally or in one pass).  Uncapped on both
    sides (the df cap is corpus-global in batch but prefix-local in
    streaming — sx1's documented divergence class; the cap's own
    semantics are gated by d17's value oracle).  Contract-row
    oracle, the sx1 convention."""
    import shutil
    import tempfile

    from dask_traj_spark.operators.dedup import winnow_matches
    from dask_traj_spark.streaming.dedup import process_winnow_batch

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    work = tempfile.mkdtemp(prefix="sx11_winnow_twin_")
    state, results = f"{work}/state", f"{work}/results"
    try:
        for b in range(3):
            process_winnow_batch(
                docs.where(F.col("doc_id") % 3 == b), b, state, results,
                k=3, w=4, min_shared=1, max_df=None,
            )
        res_schema = "doc1 long, doc2 long, n_shared long, batch_id int"
        pre = (
            _read_parquet_or_empty(spark, results, res_schema)
            .select("doc1", "doc2", "n_shared")
            .toPandas()
            .sort_values(["doc1", "doc2"])
            .reset_index(drop=True)
        )
        # crash-replay of the middle batch: its results/state
        # partitions are rewritten in place from strictly-earlier
        # state — output must be unchanged
        process_winnow_batch(
            docs.where(F.col("doc_id") % 3 == 1), 1, state, results,
            k=3, w=4, min_shared=1, max_df=None,
        )
        post = (
            _read_parquet_or_empty(spark, results, res_schema)
            .select("doc1", "doc2", "n_shared")
            .toPandas()
            .sort_values(["doc1", "doc2"])
            .reset_index(drop=True)
        )
        replay_ok = pre.equals(post)
        stream = post.rename(columns={"n_shared": "n_s"})
    finally:
        shutil.rmtree(work, ignore_errors=True)
    batch = (
        winnow_matches(docs, k=3, w=4, min_shared=1, max_df=None)
        .select("doc1", "doc2", F.col("n_shared").alias("n_b"))
        .toPandas()
    )
    merged = stream.merge(batch, on=["doc1", "doc2"], how="outer")
    stream_only = int(merged["n_b"].isna().sum())
    batch_only = int(merged["n_s"].isna().sum())
    both = merged.dropna()
    values_match = bool((both["n_s"] == both["n_b"]).all())
    return spark.createDataFrame(
        [(stream_only, batch_only, values_match, bool(replay_ok))],
        "stream_only_pairs long, batch_only_pairs long, "
        "n_shared_values_match boolean, replay_idempotent boolean",
    )


# ---------------------------------------------------------------------
# d18: PageRank over the duplicate graph (tail-resident, seats r11)
# ---------------------------------------------------------------------

def _d18_oracle(
    k: int, w: int, min_shared: int, max_df: int, n_iter: int
) -> str:
    from dask_traj_spark.functions.text import LP_GRID
    from dask_traj_spark.operators.graph import DAMPING

    g = f"{LP_GRID:.1f}"
    d_lit = repr(DAMPING)
    t_lit = repr(1.0 - DAMPING)
    stages = []
    for i in range(1, n_iter + 1):
        prev = f"p{i - 1}"
        stages.append(f"""p{i} AS MATERIALIZED (
    SELECT v.v, {t_lit} / nv.n + COALESCE(s.acc, 0.0) AS p
    FROM verts v CROSS JOIN nv LEFT JOIN (
        SELECT e.dst AS v,
               sum(round((({d_lit} * p.p) / d.deg) * {g}, 0) / {g}) AS acc
        FROM edges e JOIN {prev} p ON p.v = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst) s ON s.v = v.v
)""")
    chain = ",\n".join(stages)
    return f"""
WITH {_d17_ctes(k, w, min_shared, max_df)},
edges AS (
    SELECT doc1 AS src, doc2 AS dst FROM d17p
    UNION ALL
    SELECT doc2 AS src, doc1 AS dst FROM d17p
),
verts AS (SELECT DISTINCT src AS v FROM edges),
nv AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts),
deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS deg FROM edges GROUP BY src),
p0 AS (SELECT v, 1.0 / nv.n AS p FROM verts CROSS JOIN nv),
{chain}
SELECT v AS vertex, p AS pagerank FROM p{n_iter}
"""


@register("d18_pagerank_dup_graph", _d18_oracle(3, 4, 2, 64, 8))
def q_pagerank_dup_graph(spark, sf_dir):
    """PageRank centrality over the SYMMETRIZED d17 winnowing-match
    graph — the template/boilerplate hubs whose excision pays the
    most.  8 power iterations from 1/N, damping 7/8 (an exact dyadic,
    unlike the textbook 0.85), every edge contribution grid-snapped
    before the in-neighbor sum so per-vertex ranks are bit-identical
    across engines and partial-agg orders.  The oracle chains the
    d17 CTEs verbatim into 8 generated MATERIALIZED stages (the BPE
    generated-oracle pattern)."""
    from dask_traj_spark.operators.dedup import winnow_matches
    from dask_traj_spark.operators.graph import pagerank

    pairs = winnow_matches(
        _docs(spark, sf_dir), k=3, w=4, min_shared=2, max_df=64,
        id_mode="sorted",
    ).localCheckpoint(eager=True)
    edges = pairs.select(
        F.col("doc1").alias("src"), F.col("doc2").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc2").alias("src"), F.col("doc1").alias("dst"))
    )
    return pagerank(edges, n_iter=8)


# ---------------------------------------------------------------------
# c14: end-to-end chunk-and-shard composite (tail-resident, seats r11)
# ---------------------------------------------------------------------

def _c14_oracle(chunk: int, stride: int, n_shards: int) -> str:
    from dask_traj_spark.operators.curation import _MIX_A, _MIX_M

    return f"""
WITH kept AS (
    SELECT doc_id, text FROM documents
    WHERE {_C8_QUALITY} >= 0.5
),
{_c12_ctes(chunk, stride, src="kept")},
keyed AS (
    SELECT doc_id, chunk_idx, n_tokens,
           ((doc_id * 1024 + chunk_idx) * {_MIX_A}) % {_MIX_M} AS h
    FROM chunks
)
SELECT doc_id, chunk_idx, n_tokens,
       CAST(h % {n_shards} AS INT) AS shard,
       CAST(row_number() OVER (
           PARTITION BY h % {n_shards}
           ORDER BY h, doc_id * 1024 + chunk_idx
       ) AS BIGINT) AS pos
FROM keyed
"""


@register("c14_chunk_shard_pipeline", _c14_oracle(64, 48, 8))
def q_chunk_shard_pipeline(spark, sf_dir):
    """The training-data tail of the pipeline as ONE plan (the c7
    whole-chain convention, over this round's operators): t2 quality
    filter (>= 0.5, the shared quality_expr) → 64/48 context chunks
    (c12) → deterministic 8-shard shuffle (c13) keyed on the chunk
    id doc_id·1024 + chunk_idx (chunk_idx < 1024 at every gate
    scale; the product stays far inside BIGINT before the mult
    hash).  Output: every kept chunk with its shard and within-shard
    training position."""
    from dask_traj_spark.functions.text import quality_expr
    from dask_traj_spark.operators.curation import context_chunks, shuffle_shards

    docs = _docs(spark, sf_dir)
    chunks = context_chunks(
        docs.where(quality_expr() >= 0.5), chunk_tokens=64, stride=48
    )
    # the chunk id is unique ONLY while chunk_idx < 1024 — enforce the
    # domain loudly instead of letting a 50k-token doc silently
    # collide ids (review finding; corpus max is ~120 tokens)
    guarded_idx = F.when(
        F.col("chunk_idx") < 1024, F.col("chunk_idx")
    ).otherwise(
        F.raise_error(F.lit("c14 chunk id domain exceeded: chunk_idx >= 1024"))
    )
    keyed = chunks.withColumn(
        "chunk_id", F.col("doc_id") * F.lit(1024) + guarded_idx
    )
    return shuffle_shards(
        keyed, n_shards=8, order_mode="mult", id_col="chunk_id"
    ).select("doc_id", "chunk_idx", "n_tokens", "shard", "pos")


# ---------------------------------------------------------------------
# t24: Heaps-law vocabulary growth (tail-resident, seats r11)
# ---------------------------------------------------------------------

def _t24_oracle() -> str:
    from dask_traj_spark.functions.text import LP_GRID

    g = f"{LP_GRID:.1f}"
    beta = "(sxy - sx * sy / CAST(m AS DOUBLE)) / (sxx - sx * sx / CAST(m AS DOUBLE))"
    return f"""
WITH tok AS (
    SELECT source AS src, doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents
),
per_doc AS (SELECT src, doc_id, count(*) AS nt FROM tok GROUP BY src, doc_id),
ranked AS (
    SELECT src, doc_id, nt,
           row_number() OVER (PARTITION BY src ORDER BY doc_id) AS r
    FROM per_doc
),
first_doc AS (SELECT src, word, min(doc_id) AS fdoc FROM tok GROUP BY src, word),
new_words AS (
    SELECT src, fdoc AS doc_id, count(*) AS nw FROM first_doc GROUP BY src, fdoc
),
ck AS (
    SELECT rk.src, rk.r,
           sum(rk.nt) OVER w AS n_cum,
           sum(COALESCE(nw.nw, 0)) OVER w AS v_cum
    FROM ranked rk LEFT JOIN new_words nw USING (src, doc_id)
    WINDOW w AS (PARTITION BY rk.src ORDER BY rk.r
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
terms AS (
    SELECT src,
           round(ln(CAST(n_cum AS DOUBLE)) * {g}, 0) / {g} AS x,
           round(ln(CAST(v_cum AS DOUBLE)) * {g}, 0) / {g} AS y
    FROM ck
),
sums AS (
    SELECT src, count(*) AS m, sum(x) AS sx, sum(y) AS sy,
           sum(round(x * y * {g}, 0) / {g}) AS sxy,
           sum(round(x * x * {g}, 0) / {g}) AS sxx
    FROM terms GROUP BY src
)
SELECT src AS source, CAST(m AS BIGINT) AS n_docs,
       {beta} AS beta,
       (sy - ({beta}) * sx) / CAST(m AS DOUBLE) AS ln_k
FROM sums
"""


@register("t24_heaps_law", _t24_oracle())
def q_heaps_law(spark, sf_dir):
    """Heaps'-law fit per source: checkpoint (cumulative tokens,
    cumulative distinct words) after every document in doc_id order,
    least-squares ln V = ln K + β·ln N.  All five regression sums
    are exact dyadic sums of grid-snapped terms, so β and ln K are
    the same correctly-rounded arithmetic in both engines."""
    from dask_traj_spark.functions.text import heaps_law

    return heaps_law(_docs(spark, sf_dir))


# ---------------------------------------------------------------------
# t25: Zipf rank-frequency slope (tail-resident, seats r11)
# ---------------------------------------------------------------------

def _t25_oracle(max_rank: int) -> str:
    from dask_traj_spark.functions.text import LP_GRID

    g = f"{LP_GRID:.1f}"
    beta = ("(sxy - sx * sy / CAST(m AS DOUBLE))"
            " / (sxx - sx * sx / CAST(m AS DOUBLE))")
    return f"""
WITH wc AS (
    SELECT source AS src, word, count(*) AS c
    FROM (SELECT source, unnest(string_split(text, ' ')) AS word
          FROM documents)
    GROUP BY src, word
),
pts AS (
    SELECT src, c,
           row_number() OVER (PARTITION BY src ORDER BY c DESC, word ASC)
               AS rank
    FROM wc
    QUALIFY rank <= {max_rank}
),
terms AS (
    SELECT src,
           round(ln(CAST(rank AS DOUBLE)) * {g}, 0) / {g} AS x,
           round(ln(CAST(c AS DOUBLE)) * {g}, 0) / {g} AS y
    FROM pts
),
sums AS (
    SELECT src, count(*) AS m, sum(x) AS sx, sum(y) AS sy,
           sum(round(x * y * {g}, 0) / {g}) AS sxy,
           sum(round(x * x * {g}, 0) / {g}) AS sxx
    FROM terms GROUP BY src
)
SELECT src AS source, CAST(m AS BIGINT) AS n_terms,
       {beta} AS slope,
       (sy - ({beta}) * sx) / CAST(m AS DOUBLE) AS ln_c
FROM sums
"""


@register("t25_zipf_slope", _t25_oracle(1000))
def q_zipf_slope(spark, sf_dir):
    """Zipf slope per source over the top-1000 rank-frequency points
    (count ties broken by word): natural text ≈ −1, flat/templated
    text toward 0.  Shares t24's exact-dyadic-sum regression, so the
    slope is bit-identical in both engines."""
    from dask_traj_spark.functions.text import zipf_slope

    return zipf_slope(_docs(spark, sf_dir), max_rank=1000)


# ---------------------------------------------------------------------
# t26: Gopher top-n-gram character fraction (tail-resident, seats r11)
# ---------------------------------------------------------------------

_T26_ORACLE = f"""
WITH {TOK_CTE.strip()},
g AS (
    SELECT t0.doc_id, t0.word || ' ' || t1.word AS gram
    FROM tok t0
    JOIN tok t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
),
cnt AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram),
top AS (
    SELECT doc_id, gram, c,
           row_number() OVER (
               PARTITION BY doc_id ORDER BY c DESC, gram ASC
           ) AS rk
    FROM cnt
)
SELECT d.doc_id,
       COALESCE(t.gram, '') AS top_gram,
       CAST(COALESCE(t.c, 0) AS BIGINT) AS gram_count,
       CASE WHEN t.c IS NOT NULL
            THEN CAST(t.c * length(t.gram) AS DOUBLE)
                 / CAST(length(d.text) AS DOUBLE)
            ELSE 0.0 END AS char_frac
FROM documents d
LEFT JOIN (SELECT doc_id, gram, c FROM top WHERE rk = 1) t USING (doc_id)
"""


@register("t26_top_ngram_fraction", _T26_ORACLE)
def q_top_ngram_fraction(spark, sf_dir):
    """Gopher repetition rule "fraction of characters in the most
    frequent 2-gram" (Rae et al., arXiv 2112.11446 Table A1): the
    per-doc argmax gram (count ties break to the smallest gram — a
    min over the (-count, gram) struct, partial-aggregable, never a
    window) and its multiplicative char coverage."""
    from dask_traj_spark.functions.text import top_ngram_char_fraction

    return top_ngram_char_fraction(_docs(spark, sf_dir), n=2)


# ---------------------------------------------------------------------
# t27: Gopher duplicate-n-gram char coverage (tail-resident, seats r11)
# ---------------------------------------------------------------------

_T27_N = 5

_T27_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
idx AS (
    SELECT doc_id, t,
           unnest(generate_series(1, len(t) - {_T27_N - 1})) AS i
    FROM toks WHERE len(t) >= {_T27_N}
),
spans AS (
    SELECT doc_id,
           array_to_string(t[i:i + {_T27_N - 1}], ' ') AS gram,
           CASE WHEN i = 1 THEN 0
                ELSE length(array_to_string(t[1:i - 1], ' ')) + 1 END AS cs,
           length(array_to_string(t[1:i + {_T27_N - 1}], ' ')) AS ce
    FROM idx
),
hits AS (
    SELECT doc_id, cs, ce FROM (
        SELECT doc_id, cs, ce,
               count(*) OVER (PARTITION BY doc_id, gram) AS c
        FROM spans)
    WHERE c >= 2
),
isl AS (
    SELECT doc_id, cs, ce,
           CASE WHEN cs > COALESCE(max(ce) OVER (
                    PARTITION BY doc_id ORDER BY cs, ce
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                THEN 1 ELSE 0 END AS brk
    FROM hits
),
grp AS (
    SELECT doc_id, cs, ce,
           sum(brk) OVER (PARTITION BY doc_id ORDER BY cs, ce) AS g
    FROM isl
),
cov AS (
    SELECT doc_id, max(ce) - min(cs) AS cov FROM grp GROUP BY doc_id, g
),
per AS (SELECT doc_id, sum(cov) AS dup_chars FROM cov GROUP BY doc_id)
SELECT d.doc_id,
       CAST(length(d.text) AS BIGINT) AS n_chars,
       CAST(COALESCE(p.dup_chars, 0) AS BIGINT) AS dup_chars,
       CASE WHEN length(d.text) > 0
            THEN CAST(COALESCE(p.dup_chars, 0) AS DOUBLE)
                 / CAST(length(d.text) AS DOUBLE)
            ELSE 0.0 END AS dup_frac
FROM documents d LEFT JOIN per p USING (doc_id)
"""


@register("t27_dup_ngram_char_fraction", _T27_ORACLE)
def q_dup_ngram_char_fraction(spark, sf_dir):
    """Gopher repetition rule "fraction of characters in duplicate
    n-grams" (Rae et al., arXiv 2112.11446 Table A1): interval union
    of every 5-gram occurring more than once WITHIN a doc, measured
    in characters — the within-doc twin of d11's cross-doc spans."""
    from dask_traj_spark.functions.text import dup_ngram_char_fraction

    return dup_ngram_char_fraction(_docs(spark, sf_dir), n=_T27_N)


# ---------------------------------------------------------------------
# d19: soft dedup — inverse-cluster-size sampling weights (tail-
# resident, seats r11)
# ---------------------------------------------------------------------

_D19_ORACLE = f"""
{_components_cte(0.9)},
sz AS (SELECT comp, count(*) AS s FROM c GROUP BY comp)
SELECT CAST(c.id AS BIGINT) AS doc_id,
       CAST(c.comp AS BIGINT) AS component,
       CAST(sz.s AS BIGINT) AS cluster_size,
       1.0 / CAST(sz.s AS DOUBLE) AS weight
FROM c JOIN sz ON sz.comp = c.comp
"""


@register("d19_soft_dedup_weights", _D19_ORACLE)
def q_soft_dedup_weights(spark, sf_dir):
    """SoftDeDup reweighting: d2's MinHash pair graph → d7's
    min-label components → weight = 1/|cluster| per document — the
    keep-everything, downweight-duplicates alternative to d16's
    keep-one policy.  Shares the d7/d16 closure CTE verbatim."""
    from dask_traj_spark.operators.dedup import (
        MAX_BUCKET,
        near_duplicates_minhash,
        soft_dedup_weights,
    )

    docs = _docs(spark, sf_dir)
    pairs = near_duplicates_minhash(
        docs, threshold=0.9, id_mode="sorted", max_bucket=MAX_BUCKET
    ).select(F.col("doc1").alias("id1"), F.col("doc2").alias("id2"))
    return soft_dedup_weights(pairs, docs.select("doc_id"))


# ---------------------------------------------------------------------
# d22: quality-apportioned soft dedup — the d16 × d19 composition
# (NEW in r11, seats first under new-query-first)
# ---------------------------------------------------------------------

_D22_ORACLE = f"""
{_components_cte(0.9)},
q AS (
    SELECT doc_id,
           round(({_C8_QUALITY}) * 1048576.0) / 1048576.0 AS quality
    FROM documents
),
j AS (
    SELECT c.id AS doc_id, c.comp AS component, q.quality
    FROM c JOIN q ON q.doc_id = c.id
),
tot AS (
    SELECT component, sum(quality) AS qsum FROM j GROUP BY component
)
SELECT CAST(j.doc_id AS BIGINT) AS doc_id,
       CAST(j.component AS BIGINT) AS component,
       j.quality AS quality,
       j.quality / tot.qsum AS weight
FROM j JOIN tot ON tot.component = j.component
"""


@register("d22_quality_soft_dedup", _D22_ORACLE)
def q_quality_soft_dedup(spark, sf_dir):
    """Quality-apportioned SoftDeDup (VERDICT r10 item 6a): each
    near-dup cluster's unit sampling mass is split by the t2 quality
    score (snapped to the 2^-20 grid before the cluster sum) instead
    of uniformly — d16's argmax keep and d19's 1/size weights are
    the two limits.  Shares d7/d16/d19's closure CTE and the t2
    quality expression verbatim."""
    from dask_traj_spark.operators.dedup import (
        MAX_BUCKET,
        near_duplicates_minhash,
        quality_soft_dedup_weights,
    )

    docs = _docs(spark, sf_dir)
    pairs = near_duplicates_minhash(
        docs, threshold=0.9, id_mode="sorted", max_bucket=MAX_BUCKET
    ).select(F.col("doc1").alias("id1"), F.col("doc2").alias("id2"))
    return quality_soft_dedup_weights(docs, pairs)


# ---------------------------------------------------------------------
# d23: tol-stopped PageRank contract (NEW in r11, tail-resident,
# seats first in r12)
# ---------------------------------------------------------------------

_D23_TOL = 1.0 / 4096  # 2^-12 — dyadic, so the delta compare is exact
_D23_CAP = 40

_D23_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_vertices,
       TRUE AS converged_ok,
       TRUE AS within_cap_ok,
       TRUE AS mass_ok,
       TRUE AS endpoint_ok
FROM documents
"""


@register("d23_pagerank_tol_contract", _D23_ORACLE)
def q_pagerank_tol_contract(spark, sf_dir):
    """Contract gate for PageRank's approx mode (VERDICT r10 item
    6c — the v6/x3 pattern: a data-dependent stopping round has no
    fixed-stage SQL twin, so the gate pins the invariants any
    correct tol-stopped power iteration must satisfy) on the
    symmetrized doc-id chain graph (consecutive doc ids — a
    long-diameter graph where fixed-8 rounds would NOT converge, so
    the tol machinery is genuinely load-bearing):

    - partition: every chain vertex is ranked exactly once
      (``n_vertices`` value-gated against the oracle's count);
    - converged: the final L1 delta the operator reports is < tol;
    - within cap: it stopped by tol, not by exhausting the round cap
      (damping 1/2 contracts by ~2× per round, so 2^-12 needs ~13
      rounds against the 40 cap);
    - mass: the symmetrized graph has no dangling leak, so Σ rank
      = 1 up to per-edge grid dust — bounded by n_edges · n_rounds ·
      2^-20 (each snap moves a contribution by ≤ 2^-21; doubled for
      slack).  A genuine leak (dangling vertex, dropped edge) loses
      O(damping/n_rounds) mass and trips the bound by orders of
      magnitude;
    - endpoints: the chain's minimum rank sits at one of its two
      degree-1 endpoints — the qualitative centrality ordering.
    """
    from dask_traj_spark.operators.graph import pagerank

    ids = _docs(spark, sf_dir).select("doc_id")
    nxt = ids.select(
        F.col("doc_id").alias("src"), (F.col("doc_id") + 1).alias("dst")
    ).join(ids.select(F.col("doc_id").alias("dst")), "dst")
    edges = nxt.select(
        F.explode(
            F.array(
                F.struct(F.col("src"), F.col("dst")),
                F.struct(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    ranks, meta = pagerank(
        edges, n_iter=_D23_CAP, tol=_D23_TOL, damping=0.5, return_meta=True
    )
    stats = ranks.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum("pagerank").alias("mass"),
        F.min(F.struct(F.col("pagerank"), F.col("vertex"))).alias("mn"),
        F.min("vertex").alias("vmin"),
        F.max("vertex").alias("vmax"),
    )
    # grid-dust mass bound: 2 snaps' worth (2^-20) per edge per
    # round, CAPPED size-independently at 2^-8 (ADVICE r11: the
    # linear-in-n bound goes vacuous once n ≳ 40k since |Σrank−1|
    # ≤ 1 always; snap errors contract geometrically under damping
    # 1/2, so actual dust stays orders below 2^-8 at every SF and a
    # genuine mass leak — O(d·sink_mass) per round — still trips it)
    dust = F.least(
        2.0
        * (F.col("n_vertices") - 1).cast("double")
        * F.lit(float(meta["n_rounds"]))
        / F.lit(1048576.0),
        F.lit(2.0 ** -8),
    )
    return stats.select(
        F.col("n_vertices").cast("long").alias("n_vertices"),
        F.lit(bool(meta["final_delta"] < _D23_TOL)).alias("converged_ok"),
        F.lit(bool(meta["n_rounds"] < _D23_CAP)).alias("within_cap_ok"),
        (F.abs(F.col("mass") - F.lit(1.0)) < dust).alias("mass_ok"),
        (
            (F.col("mn.vertex") == F.col("vmin"))
            | (F.col("mn.vertex") == F.col("vmax"))
        ).alias("endpoint_ok"),
    )


# ---------------------------------------------------------------------
# d24: dangling-mass PageRank contract (NEW in r12, tail-resident,
# seats first in r13)
# ---------------------------------------------------------------------

_D24_ROUNDS = 8

_D24_ORACLE = """
SELECT CAST(2 * count(*) AS BIGINT) AS n_vertices,
       TRUE AS mass_ok,
       TRUE AS leak_demo_ok,
       TRUE AS source_min_ok
FROM documents d
WHERE d.doc_id % 2 = 0
  AND EXISTS (SELECT 1 FROM documents s WHERE s.doc_id = d.doc_id + 1)
"""


@register("d24_pagerank_dangling_contract", _D24_ORACLE)
def q_pagerank_dangling_contract(spark, sf_dir):
    """Contract gate for PageRank's dangling-mass redistribution
    (VERDICT r11 item 5a — the directed-graph completeness gap the
    operator's own docstring named): on the even→odd doc-id pair
    graph (edges doc→doc+1 for even doc only), HALF the vertices are
    sinks, so leak mode loses ~d/2 of the remaining mass every round
    while ``dangling="redistribute"`` must conserve it.

    - partition: every vertex ranked exactly once (``n_vertices``
      value-gated against the oracle's 2× even-with-successor
      count);
    - mass: redistribute mode keeps |Σ rank − 1| under grid dust
      (per-edge snap + per-vertex dangling-share snap per round,
      capped size-independently at 2^-8 — the d23 bound);
    - leak demo: the SAME graph under default leak mode ends with
      Σ rank < 1 − 2^-4 after 8 rounds (damping 1/2, sinks hold
      ≈ half the mass ⇒ ≈ 1/4 of it leaks per round) — pins that
      the mode is load-bearing, not a no-op;
    - ordering: the minimum rank sits on an even (source-side)
      vertex — sinks receive a full out-edge's mass plus the
      dangling share, sources only teleport + share.
    """
    from dask_traj_spark.operators.graph import pagerank

    ids = _docs(spark, sf_dir).select("doc_id")
    edges = (
        ids.where(F.col("doc_id") % 2 == 0)
        .select(
            F.col("doc_id").alias("src"), (F.col("doc_id") + 1).alias("dst")
        )
        .join(ids.select(F.col("doc_id").alias("dst")), "dst")
        .select("src", "dst")
    )
    redis = pagerank(
        edges, n_iter=_D24_ROUNDS, damping=0.5, dangling="redistribute"
    )
    leak = pagerank(edges, n_iter=_D24_ROUNDS, damping=0.5)
    leak_row = F.broadcast(
        leak.agg(F.sum("pagerank").alias("leak_mass"))
    )
    stats = redis.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum("pagerank").alias("mass"),
        F.min(F.struct(F.col("pagerank"), F.col("vertex"))).alias("mn"),
    ).crossJoin(leak_row)
    # per round: one snap per edge + one dangling-share snap per
    # vertex (n_edges = n_vertices/2 here) → ≤ 2·n·rounds·2^-21;
    # capped at 2^-8 like d23 (ADVICE r11)
    dust = F.least(
        2.0
        * F.col("n_vertices").cast("double")
        * F.lit(float(_D24_ROUNDS))
        / F.lit(1048576.0),
        F.lit(2.0 ** -8),
    )
    return stats.select(
        F.col("n_vertices").cast("long").alias("n_vertices"),
        (F.abs(F.col("mass") - F.lit(1.0)) < dust).alias("mass_ok"),
        (F.col("leak_mass") < F.lit(1.0 - 2.0 ** -4)).alias("leak_demo_ok"),
        (F.col("mn.vertex") % 2 == 0).alias("source_min_ok"),
    )


# ---------------------------------------------------------------------
# v9: metadata-filtered vector search (tail-resident, seats r11)
# ---------------------------------------------------------------------

_V9_ORACLE = f"""
WITH q AS (
    SELECT vec_id AS qid, generate_subscripts(embedding, 1) AS pos,
           round(CAST(unnest(embedding) AS DOUBLE) * 4096) / 4096 AS vq
    FROM embeddings WHERE vec_id < {_N_QUERIES}
),
c AS (
    SELECT vec_id AS cid, generate_subscripts(embedding, 1) AS pos,
           round(CAST(unnest(embedding) AS DOUBLE) * 4096) / 4096 AS vc
    FROM embeddings WHERE label % 2 = 0
),
dots AS (
    SELECT qid, cid, sum(vq * vc) AS dot, sum(vq * vq) AS qq, sum(vc * vc) AS cc
    FROM q JOIN c USING (pos) GROUP BY qid, cid
),
scored AS (
    SELECT qid, cid, dot / (sqrt(qq) * sqrt(cc)) AS cos
    FROM dots WHERE qid <> cid
),
ranked AS (
    SELECT qid, cid, cos,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
    FROM scored
)
SELECT CAST(qid AS BIGINT) AS qid, CAST(cid AS BIGINT) AS vec_id, cos,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_TOPK}
"""


@register("v9_filtered_topk", _V9_ORACLE)
def q_filtered_topk(spark, sf_dir):
    """Filtered vector search: exact cosine top-k restricted to the
    corpus slice satisfying a metadata predicate (label % 2 = 0),
    with PRE-filter semantics — k results from the filtered set, the
    predicate pushed into the corpus scan.  The v1 machinery with
    ``corpus_filter``; queries need not satisfy their own filter."""
    from dask_traj_spark.operators.similarity import cosine_topk

    out = cosine_topk(
        _emb(spark, sf_dir),
        list(range(_N_QUERIES)),
        k=_TOPK,
        corpus_filter="label % 2 = 0",
    )
    return out.select(
        F.col("qid").cast("long").alias("qid"),
        F.col("vec_id").cast("long").alias("vec_id"),
        "cos",
        F.col("rank").cast("int").alias("rank"),
    )


# ---------------------------------------------------------------------
# e9: inter-event gap quantiles (tail-resident, seats r11)
# ---------------------------------------------------------------------

_E9_ORACLE = """
WITH g AS (
    SELECT event_type,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS gap_us
    FROM events
)
SELECT event_type,
       count(*) AS n_gaps,
       CAST(sum(gap_us) AS DOUBLE) / count(*) AS mean_gap_us,
       quantile_cont(gap_us, 0.5) AS p50_us,
       quantile_cont(gap_us, 0.875) AS p875_us
FROM g WHERE gap_us IS NOT NULL
GROUP BY event_type
"""


def _gap_rollup(gaps: DataFrame) -> DataFrame:
    """The shared per-type rollup of (event_type, gap_us) rows — ONE
    definition for the e9 batch gate and its sx12 streaming twin:
    exact linear-interpolation quantiles at DYADIC percentiles (0.5,
    0.875 = 7/8 — exactly representable, so Spark ``percentile`` ≡
    DuckDB ``quantile_cont`` bit-for-bit, the r19 rule) plus the
    exact-integer-sum mean."""
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        (F.sum("gap_us").cast("double") / F.count(F.lit(1))).alias("mean_gap_us"),
        F.percentile("gap_us", F.lit(0.5)).alias("p50_us"),
        F.percentile("gap_us", F.lit(0.875)).alias("p875_us"),
    )


@register("e9_inter_event_gaps", _E9_ORACLE)
def q_inter_event_gaps(spark, sf_dir):
    """Per-type inter-arrival structure: each user's consecutive-event
    gap (microseconds, attributed to the LATER event's type), rolled
    up per event type (``_gap_rollup``).  The cadence diagnostic
    behind rate-limit/burst policies (e7 flags the bursts; e9
    measures the baseline rhythm).

    100-TB posture: one user-keyed window (lag only — no unbounded
    frame), one partial+final aggregation on the tiny event_type key;
    |event types| rows out; never SinglePartition."""
    from pyspark.sql import Window

    from dask_traj_spark.sources.events import events_df

    ev = events_df(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.withColumn(
        "gap_us",
        F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)),
    ).where(F.col("gap_us").isNotNull())
    return _gap_rollup(g)


@register("sx12_stream_gap_twin", _E9_ORACLE)
def q_stream_gap_twin(spark, sf_dir):
    """Incremental inter-event gaps vs e9's SQL value oracle: the
    corpus replays in three event-time slices through the versioned
    per-user last-timestamp fold (``process_gaps_batch``); the middle
    batch is crash-replayed inside the query; the union of emitted
    gaps rolled up by the SHARED ``_gap_rollup`` must match the
    one-pass batch computation value-for-value."""
    import shutil
    import tempfile

    from dask_traj_spark.sources.events import events_df
    from dask_traj_spark.streaming.ingest import gaps_final, process_gaps_batch

    ev = events_df(spark, sf_dir).select("user_id", "ts", "event_id", "event_type")
    lo, hi = ev.agg(
        F.unix_micros(F.min("ts")), F.unix_micros(F.max("ts"))
    ).first()
    c1, c2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    us = F.unix_micros(F.col("ts"))
    slices = [
        ev.where(us < c1),
        ev.where((us >= c1) & (us < c2)),
        ev.where(us >= c2),
    ]
    work = tempfile.mkdtemp(prefix="sx12_gaps_twin_")
    state, results = f"{work}/state", f"{work}/results"
    try:
        for b, sl in enumerate(slices):
            process_gaps_batch(sl, b, state, results)
        # crash-replay of the middle batch: its results partition and
        # state version 1 are rewritten from version 0
        process_gaps_batch(slices[1], 1, state, results)
        pdf = _gap_rollup(gaps_final(spark, results)).toPandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return spark.createDataFrame(
        pdf,
        "event_type string, n_gaps long, mean_gap_us double, "
        "p50_us double, p875_us double",
    )


# ---------------------------------------------------------------------
# m15: audio clipping QC (tail-resident, seats r11)
# ---------------------------------------------------------------------

_M15_THR = 20000

_M15_ORACLE = f"""
WITH m AS (
    SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS nb, text
    FROM documents
),
s AS (
    SELECT doc_id, p.pos,
           CASE WHEN nb >= p.pos + 1
                THEN (ord(substr(text, CAST(p.pos + 1 AS INT), 1)) - 128) * 256
                ELSE 0 END AS samp
    FROM m CROSS JOIN range(32) p(pos)
),
c AS (SELECT doc_id, pos, samp, abs(samp) >= {_M15_THR} AS clip FROM s),
runs AS (
    SELECT doc_id, count(*) AS run
    FROM (SELECT doc_id, pos,
                 pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
                     AS grp
          FROM c WHERE clip)
    GROUP BY doc_id, grp
),
mr AS (SELECT doc_id, max(run) AS max_run FROM runs GROUP BY doc_id),
agg AS (
    SELECT doc_id, max(abs(samp)) AS peak,
           sum(CASE WHEN clip THEN 1 ELSE 0 END) AS clipped
    FROM c GROUP BY doc_id
)
SELECT a.doc_id,
       CAST(32 AS BIGINT) AS n_samples,
       CAST(a.peak AS BIGINT) AS peak,
       CAST(a.clipped AS BIGINT) AS clipped,
       CAST(COALESCE(mr.max_run, 0) AS BIGINT) AS max_clip_run,
       CAST(a.clipped AS DOUBLE) / 32.0 AS clip_frac
FROM agg a LEFT JOIN mr USING (doc_id)
"""


@register("m15_audio_clipping", _M15_ORACLE)
def q_audio_clipping(spark, sf_dir):
    """Audio clipping QC gate: text byte head → PCM-16 WAV →
    ``decode_wav`` → per-doc peak / clipped count / longest clipped
    run / clipped fraction at |s| ≥ {thr}.  Sample values (b−128)·256
    are exact int16, the /32 fraction an exact dyadic division — all
    values bit-identical across engines."""
    from dask_traj_spark.operators.multimodal import (
        attach_payload_wav,
        audio_clipping,
    )

    return audio_clipping(
        attach_payload_wav(_docs(spark, sf_dir)), threshold=_M15_THR
    )


# ---------------------------------------------------------------------
# d20: cross-corpus near-dup join (tail-resident, seats r11)
# ---------------------------------------------------------------------

def _d20_oracle(threshold: float, ref_mod: int) -> str:
    from dask_traj_spark.operators.dedup import (
        BAND_MIX,
        MAX_BUCKET,
        MINHASH_P,
        N_BANDS,
        N_HASHES,
        _hash_consts,
    )

    mins = ", ".join(
        f"min((CAST(tid AS BIGINT) * {a} + {b}) % {MINHASH_P}) AS h{i}"
        for i, (a, b) in ((i, _hash_consts(i)) for i in range(N_HASHES))
    )
    band_selects = " UNION ALL ".join(
        f"SELECT sid, {b} AS band, h{2 * b} * {BAND_MIX} + h{2 * b + 1} AS bh FROM sig"
        for b in range(N_BANDS)
    )
    return f"""
WITH base AS (
    SELECT doc_id * 2 AS sid, text FROM documents WHERE doc_id % {ref_mod} <> 0
    UNION ALL
    SELECT doc_id * 2 + 1 AS sid, text FROM documents WHERE doc_id % {ref_mod} = 0
),
tok AS (
    SELECT sid, unnest(string_split(text, ' ')) AS word FROM base
),
voc AS (
    SELECT word, CAST(ROW_NUMBER() OVER (ORDER BY word) AS INT) AS tid
    FROM (SELECT DISTINCT word FROM tok)
),
dt AS (SELECT DISTINCT t.sid, v.tid FROM tok t JOIN voc v USING (word)),
sig AS (SELECT sid, {mins} FROM dt GROUP BY sid),
bands AS ({band_selects}),
bok AS (
    SELECT band, bh FROM bands GROUP BY band, bh
    HAVING count(*) <= {MAX_BUCKET}
),
bandsf AS (SELECT b.* FROM bands b JOIN bok USING (band, bh)),
cand AS (
    SELECT DISTINCT l.sid AS s1, r.sid AS s2
    FROM bandsf l JOIN bandsf r ON l.band = r.band AND l.bh = r.bh
    WHERE l.sid % 2 = 0 AND r.sid % 2 = 1
),
sizes AS (SELECT sid, count(*) AS sz FROM dt GROUP BY sid),
inter AS (
    SELECT c.s1, c.s2, count(*) AS i
    FROM cand c
    JOIN dt t1 ON t1.sid = c.s1
    JOIN dt t2 ON t2.sid = c.s2 AND t2.tid = t1.tid
    GROUP BY c.s1, c.s2
),
j AS (
    SELECT i.s1, i.s2,
           CAST(i.i AS DOUBLE) / CAST(z1.sz + z2.sz - i.i AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes z1 ON z1.sid = i.s1
    JOIN sizes z2 ON z2.sid = i.s2
)
SELECT s1 // 2 AS doc_id, s2 // 2 AS ref_id, jaccard
FROM j WHERE jaccard >= {threshold}
"""


_D20_REF_MOD = 7


@register("d20_cross_corpus_neardup", _d20_oracle(0.9, _D20_REF_MOD))
def q_cross_corpus_neardup(spark, sf_dir):
    """Cross-corpus near-dup decontamination: the doc_id % 7 == 0
    slice plays the benchmark corpus, the rest the training corpus;
    bipartite MinHash-LSH (union vocab, union bucket cap, side-split
    band join) with exact-Jaccard verification at 0.9."""
    from dask_traj_spark.operators.dedup import MAX_BUCKET, cross_corpus_neardup

    docs = _docs(spark, sf_dir)
    return cross_corpus_neardup(
        docs.where(F.col("doc_id") % _D20_REF_MOD != 0),
        docs.where(F.col("doc_id") % _D20_REF_MOD == 0),
        threshold=0.9,
        id_mode="sorted",
        max_bucket=MAX_BUCKET,
    )


# ---------------------------------------------------------------------
# d21: cross-corpus verbatim span matches (tail-resident, seats r11)
# ---------------------------------------------------------------------

_D21_BASE = (
    f"(SELECT doc_id * 2 AS doc_id, text FROM documents "
    f"WHERE doc_id % {_D20_REF_MOD} <> 0 "
    f"UNION ALL SELECT doc_id * 2 + 1, text FROM documents "
    f"WHERE doc_id % {_D20_REF_MOD} = 0)"
)

_D21_ORACLE = f"""
WITH {_d14_match_ctes("a.doc_id % 2 = 0 AND b.doc_id % 2 = 1", _D21_BASE)}
SELECT doc1 // 2 AS doc_id, doc2 // 2 AS ref_id,
       CAST(min(p1) AS BIGINT) AS start_doc,
       CAST(min(p2) AS BIGINT) AS start_ref,
       CAST(max(p1) - min(p1) + {_D11_W} AS BIGINT) AS match_tokens
FROM grp GROUP BY doc1, doc2, diag, g
"""


@register("d21_cross_corpus_matches", _D21_ORACLE)
def q_cross_corpus_matches(spark, sf_dir):
    """Span-attribution decontamination: verbatim maximal token runs
    shared between the training slice (doc_id % 7 != 0) and the
    benchmark slice (doc_id % 7 == 0) — d14's diagonal-islands
    machinery restricted to cross-corpus alignments via the d20
    side-tagging convention; the occurrence cap counts UNION
    occurrences, mirrored in the shared CTE chain."""
    from dask_traj_spark.operators.dedup import cross_corpus_matches

    docs = _docs(spark, sf_dir)
    return cross_corpus_matches(
        docs.where(F.col("doc_id") % _D20_REF_MOD != 0),
        docs.where(F.col("doc_id") % _D20_REF_MOD == 0),
        ngram=_D11_W,
        max_occ=_D14_CAP,
        key_mode="exact",
    )


# ---------------------------------------------------------------------
# v10: kNN label vote (tail-resident, seats r11)
# ---------------------------------------------------------------------

_V10_ORACLE = f"""
WITH q AS (
    SELECT vec_id AS qid, generate_subscripts(embedding, 1) AS pos,
           round(CAST(unnest(embedding) AS DOUBLE) * 4096) / 4096 AS vq
    FROM embeddings WHERE vec_id < {_N_QUERIES}
),
c AS (
    SELECT vec_id AS cid, generate_subscripts(embedding, 1) AS pos,
           round(CAST(unnest(embedding) AS DOUBLE) * 4096) / 4096 AS vc
    FROM embeddings
),
dots AS (
    SELECT qid, cid, sum(vq * vc) AS dot, sum(vq * vq) AS qq, sum(vc * vc) AS cc
    FROM q JOIN c USING (pos) GROUP BY qid, cid
),
scored AS (
    SELECT qid, cid, dot / (sqrt(qq) * sqrt(cc)) AS cos
    FROM dots WHERE qid <> cid
),
ranked AS (
    SELECT qid, cid, cos,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC) AS rank
    FROM scored
),
top AS (SELECT qid, cid, cos FROM ranked WHERE rank <= {_TOPK}),
votes AS (
    SELECT t.qid, e.label AS nb_label, count(*) AS votes,
           sum(round(t.cos * 1048576) / 1048576) AS sum_cos
    FROM top t JOIN embeddings e ON e.vec_id = t.cid
    GROUP BY t.qid, e.label
),
best AS (
    SELECT qid, nb_label, votes, sum_cos,
           ROW_NUMBER() OVER (
               PARTITION BY qid ORDER BY votes DESC, nb_label ASC
           ) AS rk
    FROM votes
)
SELECT CAST(qid AS BIGINT) AS qid,
       CAST(nb_label AS BIGINT) AS pred_label,
       CAST(votes AS BIGINT) AS votes,
       sum_cos / CAST(votes AS DOUBLE) AS mean_cos
FROM best WHERE rk = 1
"""


@register("v10_knn_classify", _V10_ORACLE)
def q_knn_classify(spark, sf_dir):
    """kNN label vote (classifier-style curation): exact cosine
    top-{k} neighbors vote with their labels, majority wins (ties →
    smallest label), mean similarity of the winning voters
    grid-snapped for cross-engine bit-stability."""
    from dask_traj_spark.operators.similarity import knn_classify

    return knn_classify(_emb(spark, sf_dir), list(range(_N_QUERIES)), k=_TOPK)


# ---------------------------------------------------------------------
# c15: token-budget-constrained selection (tail-resident, seats r11)
# ---------------------------------------------------------------------

_C15_BUDGET = 1500

_C15_ORACLE = f"""
WITH q AS (
    SELECT doc_id, source, {_C8_QUALITY} AS quality,
           CAST({_NTOK} AS BIGINT) AS n_tokens
    FROM documents
),
r AS (
    SELECT doc_id, source, quality, n_tokens,
           sum(n_tokens) OVER (
               PARTITION BY source ORDER BY quality DESC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum_tokens
    FROM q
)
SELECT doc_id, source, quality, n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       CAST(CASE WHEN cum_tokens <= {_C15_BUDGET} THEN 1 ELSE 0 END AS BIGINT)
           AS selected
FROM r
"""


@register("c15_budget_select", _C15_ORACLE)
def q_budget_select(spark, sf_dir):
    """Token-budget selection: per source, keep the best-quality
    prefix (t2 quality, doc_id ties) whose running token total fits
    the budget — the "best data that fits the compute budget" cut,
    sharing the t2/c8/d16 quality definition."""
    from dask_traj_spark.operators.curation import budget_select

    return budget_select(_docs(spark, sf_dir), budget_tokens=_C15_BUDGET)


# ---------------------------------------------------------------------
# m16: perceptual image hash (tail-resident, seats r11)
# ---------------------------------------------------------------------

def _m16_oracle() -> str:
    # aHash over the decoded 7x2 BMP (top-down pixels = text bytes
    # 1..42, zero-padded) at a 4x2 grid: src = floor(dst*src/dst) ->
    # xs = [0,1,3,5], ys = [0,1]; cell gray = the 3 channel bytes at
    # text positions 21*y + 3*x + 1..3; bit i (= y*4 + x) set iff
    # gray_i * 8 > total (STRICT, mirroring the operator).
    from dask_traj_spark.operators.multimodal import BMP_WIDTH

    xs = [(dx * BMP_WIDTH) // 4 for dx in range(4)]
    cells = []
    for y in (0, 1):
        for x in xs:
            base = 21 * y + 3 * x
            cells.append(
                "("
                + " + ".join(
                    f"CASE WHEN nb >= {base + c} "
                    f"THEN ord(substr(text, {base + c}, 1)) ELSE 0 END"
                    for c in (1, 2, 3)
                )
                + ")"
            )
    grays = ", ".join(f"{c} AS g{i}" for i, c in enumerate(cells))
    total = " + ".join(f"g{i}" for i in range(8))
    ph = " + ".join(
        f"(CASE WHEN g{i} * 8 > ({total}) THEN {1 << i} ELSE 0 END)"
        for i in range(8)
    )
    return f"""
WITH m AS (
    SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS nb, text
    FROM documents
),
g AS (SELECT doc_id, {grays} FROM m)
SELECT doc_id, CAST({ph} AS BIGINT) AS ph FROM g
"""


@register("m16_perceptual_hash", _m16_oracle())
def q_perceptual_hash(spark, sf_dir):
    """Perceptual image fingerprints: text byte head → REAL 7×2 BMP →
    decode → 4×2 aHash (integer gray, strict above-mean bits) —
    the multimodal dedup signature, bit-predictable end to end."""
    from dask_traj_spark.operators.multimodal import (
        attach_payload_bmp,
        perceptual_hash,
    )

    return perceptual_hash(
        attach_payload_bmp(_docs(spark, sf_dir)), grid_w=4, grid_h=2
    )


# ---------------------------------------------------------------------
# t28: tokenizer fertility per source (tail-resident, seats r11)
# ---------------------------------------------------------------------

def _t28_oracle(k: int) -> str:
    return f"""WITH {_bpe_ctes(k)},
cnt AS (
    SELECT t.doc_id, count(*) AS n_words, sum(len(w.syms)) AS n_bpe
    FROM tok t JOIN w{k} w USING (word) GROUP BY t.doc_id
)
SELECT d.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(d.text)) AS BIGINT) AS n_chars,
       CAST(sum(c.n_words) AS BIGINT) AS n_words,
       CAST(sum(c.n_bpe) AS BIGINT) AS n_bpe_tokens,
       CAST(sum(c.n_bpe) AS DOUBLE) / CAST(sum(c.n_words) AS DOUBLE)
           AS tokens_per_word,
       CAST(sum(length(d.text)) AS DOUBLE) / CAST(sum(c.n_bpe) AS DOUBLE)
           AS chars_per_token
FROM documents d JOIN cnt c ON c.doc_id = d.doc_id
GROUP BY d.source"""


@register("t28_tokenizer_fertility", _t28_oracle(_BPE_MERGES))
def q_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility per source under the trained BPE (shared
    t18 training run): subwords per word and chars per token — the
    vocabulary-fit diagnostic; exact integer sums, two divisions."""
    from dask_traj_spark.operators.bpe import tokenizer_fertility

    _m, seg = _bpe_cached(spark, sf_dir)
    return tokenizer_fertility(_docs(spark, sf_dir), seg)


# ---------------------------------------------------------------------
# v11: per-stratum embedding diversity (tail-resident, seats r11)
# ---------------------------------------------------------------------

_V11_ORACLE = """
WITH e AS (
    SELECT label AS st, vec_id AS vid,
           generate_subscripts(embedding, 1) AS pos,
           round(CAST(unnest(embedding) AS DOUBLE) * 4096) / 4096 AS v
    FROM embeddings
),
nr AS (
    SELECT st, vid, sqrt(sum(v * v)) AS nrm FROM e GROUP BY st, vid
    HAVING sqrt(sum(v * v)) > 0
),
u AS (
    SELECT e.st, e.vid, e.pos,
           round(e.v / n.nrm * 1048576) / 1048576 AS u
    FROM e JOIN nr n ON n.st = e.st AND n.vid = e.vid
),
per_pos AS (SELECT st, pos, sum(u) AS s FROM u GROUP BY st, pos),
s2 AS (
    SELECT st, sum(round(s * s * 1048576) / 1048576) AS s2
    FROM per_pos GROUP BY st
),
q AS (
    SELECT st, sum(round(u * u * 1048576) / 1048576) AS qq,
           count(DISTINCT vid) AS n
    FROM u GROUP BY st
)
SELECT CAST(s2.st AS BIGINT) AS label,
       CAST(q.n AS BIGINT) AS n_vectors,
       (s2.s2 - q.qq) / (CAST(q.n AS DOUBLE) * (CAST(q.n AS DOUBLE) - 1.0))
           AS mean_pairwise_cos
FROM s2 JOIN q ON q.st = s2.st
WHERE q.n >= 2
"""


@register("v11_embedding_diversity", _V11_ORACLE)
def q_embedding_diversity(spark, sf_dir):
    """Per-label mean pairwise cosine WITHOUT a pairwise join (the
    |Σu|² identity): the corpus-diversity diagnostic at O(n·dim)
    aggregation cost.  Normalized components and both squared terms
    grid-snapped so every sum is exact — bit-identical engines."""
    from dask_traj_spark.operators.similarity import embedding_diversity

    out = embedding_diversity(_emb(spark, sf_dir), strata_col="label")
    return out.select(
        F.col("label").cast("long").alias("label"),
        "n_vectors",
        "mean_pairwise_cos",
    )
