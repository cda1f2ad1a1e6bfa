"""Plan-quality tests: the 100 TB posture, asserted.

Correctness tests can't see a missing pushdown or a join that went
sort-merge; these lock the physical plan shapes we designed for:
broadcast dimensions, partial aggregation (one shuffle), parquet
filter pushdown + column pruning, shuffle-free vectorized geometry
over packed input."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_traj_spark.plans.audit import assert_max_shuffles, audit


@pytest.fixture(scope="module")
def parquet_traj(spark, tmp_path_factory):
    """Small parquet-backed trajectory (the storage layout)."""
    from dask_traj_spark.trajectory import Trajectory

    base = str(tmp_path_factory.mktemp("pq_traj"))
    rng = np.random.default_rng(2)
    rows = [
        (f, a, *[float(v) for v in rng.uniform(0, 2, 3)])
        for f in range(20)
        for a in range(30)
    ]
    spark.createDataFrame(
        rows, "frame_id long, atom_id int, x float, y float, z float"
    ).coalesce(2).write.parquet(f"{base}/coords")
    coords = spark.read.parquet(f"{base}/coords")
    top = spark.createDataFrame(
        [(a, "C", "C", 12.0, 0, "ALA", 0) for a in range(30)],
        "atom_id int, name string, element string, mass double, "
        "residue_id int, residue_name string, chain_id int",
    )
    return Trajectory(coords, topology=top)


def test_frame_filter_pushed_to_scan(parquet_traj):
    df = parquet_traj.coords.where(F.col("frame_id") < 5).select("frame_id", "x")
    a = audit(df)
    assert any("frame_id" in p for p in a.pushed_filters), a.text
    # column pruning: scan must not read y/z
    assert a.read_schemas and all(
        "y" not in s and "z" not in s for s in a.read_schemas
    ), a.read_schemas


def test_com_is_single_shuffle_broadcast_join(parquet_traj):
    from dask_traj_spark.operators.distance import compute_center_of_mass

    df = compute_center_of_mass(parquet_traj)
    a = audit(df)
    assert a.n_sortmerge_joins == 0, a.text
    assert a.n_broadcast_joins >= 1, a.text  # topology is broadcast
    assert a.n_shuffles <= 1, a.text  # partial + final agg only


def test_cog_single_shuffle(parquet_traj):
    from dask_traj_spark.operators.distance import compute_center_of_geometry

    a = audit(compute_center_of_geometry(parquet_traj))
    assert a.n_shuffles <= 1, a.text


def test_vectorized_distances_shuffle_free_on_packed(spark):
    """A packed trajectory (frame-aligned partitions) runs the whole
    vectorized distance pipeline without a single shuffle."""
    from dask_traj_spark.operators.distance import compute_distances
    from dask_traj_spark.trajectory import Trajectory

    coords = (
        spark.range(8, numPartitions=2)
        .select(
            F.col("id").alias("frame_id"),
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("atom_id"),
        )
        .select(
            "frame_id",
            F.col("atom_id").cast("int").alias("atom_id"),
            (F.rand(1) * 2).cast("float").alias("x"),
            (F.rand(2) * 2).cast("float").alias("y"),
            (F.rand(3) * 2).cast("float").alias("z"),
        )
    )
    traj = Trajectory(coords, packed=True)
    df = compute_distances(
        traj, [(0, 1), (2, 3)], periodic=False, form="vectorized", n_atoms=10
    )
    a = audit(df)
    assert a.n_shuffles == 0, a.text


def test_exact_dedup_single_shuffle(spark):
    from dask_traj_spark.operators.dedup import exact_duplicates

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b"), (2, "c")], "doc_id long, text string"
    )
    a = audit(exact_duplicates(docs))
    assert a.n_shuffles <= 1, a.text


def test_media_payload_pruned_from_stats_scan(spark, tmp_path_factory):
    """Metadata-only aggregates over a media table never read the
    (large) payload column — ReadSchema excludes it."""
    from dask_traj_spark.operators.multimodal import attach_payload, media_stats

    base = str(tmp_path_factory.mktemp("media"))
    docs = spark.createDataFrame(
        [(i, "x" * 100) for i in range(10)], "doc_id long, text string"
    )
    attach_payload(docs).write.parquet(f"{base}/media")
    media = spark.read.parquet(f"{base}/media")
    a = audit(media_stats(media))
    assert a.read_schemas and all("payload" not in s for s in a.read_schemas), (
        a.read_schemas
    )


def test_bucketed_sink_prunes_partitions(spark, tmp_path_factory, parquet_traj):
    """save_tables(bucket_frames=N) → frame-range predicates prune
    whole hive partitions (PartitionFilters), and the round-trip
    preserves content."""
    from dask_traj_spark.sources.loaders import load_tables, save_tables

    base = str(tmp_path_factory.mktemp("bucketed"))
    save_tables(parquet_traj, base, bucket_frames=5)
    back = load_tables(spark, base)
    assert back.coords.columns == ["frame_id", "atom_id", "x", "y", "z"]
    assert back.coords.count() == parquet_traj.coords.count()

    from dask_traj_spark.sources.loaders import load_frame_range

    ranged = load_frame_range(spark, base, 0, 5)
    text = audit(ranged.coords).text
    assert "PartitionFilters: [" in text and "frame_bucket" in text, text
    assert ranged.coords.count() == 5 * 30
    # content parity on a sample frame
    a = (
        parquet_traj.coords.where(F.col("frame_id") == 3)
        .orderBy("atom_id")
        .toPandas()
    )
    b = back.coords.where(F.col("frame_id") == 3).orderBy("atom_id").toPandas()
    assert np.allclose(a[["x", "y", "z"]], b[["x", "y", "z"]])


def test_distances_sql_broadcasts_pairs(parquet_traj):
    from dask_traj_spark.operators.distance import compute_distances

    df = compute_distances(
        parquet_traj, [(0, 1), (1, 2), (3, 4)], periodic=False, form="sql"
    )
    a = audit(df)
    # the pairs dimension must arrive via broadcast, never sort-merge
    assert a.n_broadcast_joins >= 2, a.text


def test_q5_join_broadcasts_all_dims(spark):
    """r7 (TPC-H Q5 shape): supplier/nation/region broadcast; the
    only shuffle exchanges feed the lineitem⋈orders⋈customer joins
    and the final aggregate."""
    from dask_traj_spark.queries_relational import q_r7

    a = audit(q_r7(spark, "/root/testdata/sf0.001"))
    assert a.n_broadcast_joins >= 3, a.text
    assert a.n_sortmerge_joins + a.n_shuffledhash_joins <= 2, a.text


def test_q17_window_form_single_shuffle_no_join(spark):
    """r10 uses a window average instead of the agg+self-join the
    oracle spells - one shuffle on l_partkey, zero join nodes."""
    from dask_traj_spark.queries_relational import q_r10

    a = audit(q_r10(spark, "/root/testdata/sf0.001"))
    assert a.n_broadcast_joins + a.n_sortmerge_joins + a.n_shuffledhash_joins == 0, (
        a.text
    )
    # window shuffle + final agg shuffle (partial agg collapses first)
    assert a.n_shuffles <= 2, a.text


def test_promo_share_broadcasts_part(spark):
    from dask_traj_spark.queries_relational import q_r11

    a = audit(q_r11(spark, "/root/testdata/sf0.001"))
    assert a.n_broadcast_joins == 1, a.text
    assert a.n_shuffles <= 1, a.text


def test_asof_query_single_shuffle(spark):
    """e3: the union+running-last as-of join is one exchange end to
    end (plus the events-scan normalization)."""
    from dask_traj_spark.queries_pipeline import q_asof_last_purchase

    a = audit(q_asof_last_purchase(spark, "/root/testdata/sf0.001"))
    assert a.n_broadcast_joins + a.n_sortmerge_joins + a.n_shuffledhash_joins == 0, (
        a.text
    )
    assert a.n_shuffles <= 1, a.text


def test_q3_shape_broadcasts_customer(spark):
    """r12 (TPC-H Q3 shape): the filtered customer dim broadcasts;
    lineitem⋈orders may shuffle, plus agg + top-k ordering."""
    from dask_traj_spark.queries_relational2 import q_r12

    a = audit(q_r12(spark, "/root/testdata/sf0.001"))
    assert a.n_broadcast_joins >= 1, a.text
    assert a.n_sortmerge_joins + a.n_shuffledhash_joins <= 1, a.text


def test_q7_shape_broadcasts_enriched_dims(spark):
    """r13 (TPC-H Q7 shape): supplier⋈nation and customer⋈nation are
    pre-joined broadcast-side — 4 broadcast joins, only the
    lineitem⋈orders join may exchange."""
    from dask_traj_spark.queries_relational2 import q_r13

    a = audit(q_r13(spark, "/root/testdata/sf0.001"))
    assert a.n_broadcast_joins >= 4, a.text
    assert a.n_sortmerge_joins + a.n_shuffledhash_joins <= 1, a.text


def test_q16_shape_anti_join_is_broadcast(spark):
    """r14 (TPC-H Q16 shape): the NOT-IN suppliers anti-join and the
    part join both broadcast; shuffles only for the distinct agg."""
    from dask_traj_spark.queries_relational2 import q_r14

    a = audit(q_r14(spark, "/root/testdata/sf0.001"))
    assert a.n_broadcast_joins >= 2, a.text
    assert a.n_sortmerge_joins + a.n_shuffledhash_joins == 0, a.text


def test_window_breadth_single_shuffle(spark):
    """r18: all five window functions share one window spec — a
    single exchange on nationkey, no joins."""
    from dask_traj_spark.queries_relational2 import q_r18

    a = audit(q_r18(spark, "/root/testdata/sf0.001"))
    assert a.n_broadcast_joins + a.n_sortmerge_joins + a.n_shuffledhash_joins == 0, (
        a.text
    )
    assert a.n_shuffles <= 1, a.text


def _docs_fixture(spark):
    return spark.createDataFrame(
        [(i, f"w{i % 7} common w{i % 5} tail{i}") for i in range(40)],
        "doc_id long, text string",
    )


def test_default_dedup_paths_have_no_single_partition_window(spark):
    """The hashed-id default for minhash/simhash/ngram/fingerprint must
    compile without any single-partition exchange — the sorted-vocab
    global window is reserved for the oracle-gated wrappers."""
    from dask_traj_spark.functions.text import fingerprint
    from dask_traj_spark.operators.dedup import (
        near_duplicates_minhash,
        near_duplicates_ngram,
        simhash,
    )

    docs = _docs_fixture(spark)
    for df in (
        near_duplicates_minhash(docs, threshold=0.5),
        simhash(docs),
        near_duplicates_ngram(docs, threshold=0.3),
        fingerprint(docs),
    ):
        text = audit(df).text
        assert "SinglePartition" not in text, text


def test_tfidf_single_partition_only_for_corpus_count(spark):
    """tfidf_top_terms may carry exactly ONE SinglePartition
    exchange — the 1-row corpus count (one partial count per input
    partition, not data).  The ranking window must partition by the
    document key, and everything stays JVM-side."""
    from dask_traj_spark.functions.text import tfidf_top_terms

    text = audit(tfidf_top_terms(_docs_fixture(spark))).text
    assert text.count("SinglePartition") == 1, text
    assert "hashpartitioning(doc_id" in text, text
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text


def test_curation_paths_have_no_single_partition_exchange(spark):
    """The curation operators (decontamination, stratified sample,
    repetition, repeated-ngram) must compile without any
    single-partition exchange: the stratified window partitions by
    the stratum key, everything else is partial+final aggregation."""
    from dask_traj_spark.operators.curation import (
        decontaminate,
        repetition_score,
        stratified_sample,
    )
    from dask_traj_spark.operators.dedup import repeated_ngram_docs

    from pyspark.sql import functions as F

    docs = _docs_fixture(spark).withColumn(
        "source", F.concat(F.lit("s"), F.col("doc_id") % 3)
    )
    bench = docs.where(F.col("doc_id") == 0)
    for df in (
        decontaminate(docs, bench, n=3),
        stratified_sample(docs, quota=2),
        repetition_score(docs),
        repeated_ngram_docs(docs, n=4),
    ):
        text = audit(df).text
        assert "SinglePartition" not in text, text


def test_mic_distance_fastpath_stays_interpreted_hof(spark):
    """The distance-only MIC path must keep its 27-image min inside
    a higher-order function (interpreted evaluation — the shape that
    dodges the 4.1.2 codegen miscompilation documented in
    operators/mic.py); a refactor inlining it as flat scalar
    expressions would silently reintroduce wrong results."""
    import numpy as np

    from dask_traj_spark.operators.distance import compute_distances
    from dask_traj_spark.trajectory import Trajectory

    coords = spark.createDataFrame(
        [(0, 0, 0.1, 0.2, 0.3), (0, 1, 0.4, 0.5, 0.6)],
        "frame_id bigint, atom_id int, x float, y float, z float",
    )
    from pyspark.sql import functions as F

    vals = dict(
        ax=0.25, ay=0.0, az=0.0, bx=0.0625, by=0.21875, bz=0.0,
        cx=0.046875, cy=0.03125, cz=0.1875,
        a=0.25, b=0.2273, c=0.1938, alpha=76.0, beta=73.0, gamma=74.0,
    )
    uc = spark.range(1).select(
        F.col("id").alias("frame_id"),
        *[F.lit(v).cast("float").alias(k) for k, v in vals.items()],
    )
    traj = Trajectory(coords, unitcell=uc)
    df = compute_distances(
        traj, np.array([[0, 1]]), periodic=True, form="sql"
    )
    text = audit(df).text
    assert "array_min" in text and "transform" in text, text
    """Jaccard is invariant under injective id mapping: for pairs both
    modes surface, the values must agree exactly."""
    from dask_traj_spark.operators.dedup import near_duplicates_ngram

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps"),
            (1, "the quick brown fox leaps"),
            (2, "entirely different text here"),
        ],
        "doc_id long, text string",
    )
    hashed = {
        (r.doc1, r.doc2): r.jaccard
        for r in near_duplicates_ngram(docs, threshold=0.1).collect()
    }
    sorted_ = {
        (r.doc1, r.doc2): r.jaccard
        for r in near_duplicates_ngram(
            docs, threshold=0.1, id_mode="sorted"
        ).collect()
    }
    # candidate generation is id-independent for ngram (docs sharing a
    # shingle) so the pair sets coincide, and values must be identical
    assert hashed == sorted_
    assert (0, 1) in hashed


def test_degenerate_bucket_cap_drops_boilerplate_pairs(spark):
    """A shingle shared by every doc must not pair the whole corpus
    when its document frequency exceeds max_df."""
    from dask_traj_spark.operators.dedup import near_duplicates_ngram

    # 12 docs all sharing the boilerplate bigram "x y"; otherwise unique
    docs = spark.createDataFrame(
        [(i, f"x y unique{i} token{i}") for i in range(12)],
        "doc_id long, text string",
    )
    uncapped = near_duplicates_ngram(docs, threshold=0.0, max_df=None)
    capped = near_duplicates_ngram(docs, threshold=0.0, max_df=5)
    assert uncapped.count() == 12 * 11 // 2
    assert capped.count() == 0


def test_atom_selection_pushes_to_parquet_scan(spark, tmp_path_factory):
    """The literal atom filter must reach the parquet source as
    PushedFilters (range + In) — the property that lets a 24-atom
    query read row groups, not the 100 TB fact table."""
    from dask_traj_spark.operators.distance import compute_distances
    from dask_traj_spark.trajectory import Trajectory

    base = str(tmp_path_factory.mktemp("pushdown"))
    spark.range(300).selectExpr(
        "id div 30 as frame_id",
        "cast(id % 30 as int) as atom_id",
        "cast(id as float) x", "cast(id as float) y", "cast(id as float) z",
    ).write.parquet(f"{base}/coords")
    traj = Trajectory(spark.read.parquet(f"{base}/coords"))
    d = compute_distances(traj, [(0, 1), (2, 5)], periodic=False, form="sql")
    a = audit(d)
    pushed = " ".join(a.pushed_filters)
    assert "atom_id" in pushed, a.pushed_filters


def test_q6_shape_predicates_push_to_scan(spark):
    """r24 (TPC-H Q6 shape): shipdate/quantity predicates reach the
    parquet scan; no join; one partial+final aggregate."""
    from dask_traj_spark.queries_relational3 import q_r24

    a = audit(q_r24(spark, "/root/testdata/sf0.001"))
    assert any("l_shipdate" in p for p in a.pushed_filters), a.text
    assert any("l_quantity" in p for p in a.pushed_filters), a.text
    assert a.n_broadcast_joins + a.n_sortmerge_joins + a.n_shuffledhash_joins == 0, a.text


def test_q8_shape_broadcasts_every_dimension(spark):
    """r25 (TPC-H Q8 shape): part/supplier/customer-region all
    broadcast; only lineitem⋈orders may shuffle."""
    from dask_traj_spark.queries_relational3 import q_r25

    a = audit(q_r25(spark, "/root/testdata/sf0.001"))
    assert a.n_broadcast_joins >= 3, a.text
    assert a.n_sortmerge_joins + a.n_shuffledhash_joins <= 1, a.text


def test_q15_shape_scalar_max_is_broadcast(spark):
    """r31 (TPC-H Q15 shape): the max-revenue scalar joins back as a
    broadcast, never a global sort."""
    from dask_traj_spark.queries_relational3 import q_r31

    a = audit(q_r31(spark, "/root/testdata/sf0.001"))
    assert a.n_broadcast_joins >= 2, a.text
    assert "SinglePartition" not in a.text or "Sort" not in a.text.split("SinglePartition")[0][-200:], a.text


def test_q21_shape_no_lineitem_rescan_per_exists(spark):
    """r33 (TPC-H Q21 shape): the EXISTS/NOT-EXISTS pair is rewritten
    to orderkey-local aggregates — supplier broadcasts and the join
    tree stays on the orderkey family (no cartesian, no per-row
    subquery nodes)."""
    from dask_traj_spark.queries_relational3 import q_r33

    a = audit(q_r33(spark, "/root/testdata/sf0.001"))
    assert a.n_broadcast_joins >= 1, a.text
    assert "CartesianProduct" not in a.text, a.text


def test_q4_shape_semi_join_carries_range_predicate(spark):
    """r23 (TPC-H Q4 shape): the EXISTS runs as ONE left-semi join
    (equality + range in the same join), not a correlated rescan."""
    from dask_traj_spark.queries_relational3 import q_r23

    a = audit(q_r23(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in a.text, a.text
    total_joins = a.n_broadcast_joins + a.n_sortmerge_joins + a.n_shuffledhash_joins
    assert total_joins == 1, a.text


def test_q13_left_join_not_converted_to_inner(spark):
    """r30 (TPC-H Q13 shape): the non-key predicate lives in the
    join condition, so zero-order customers must survive — assert
    the plan keeps an outer join."""
    from dask_traj_spark.queries_relational3 import q_r30

    a = audit(q_r30(spark, "/root/testdata/sf0.001"))
    assert "LeftOuter" in a.text or "RightOuter" in a.text, a.text


def test_pii_and_lexical_paths_plan_shapes(spark):
    """t10 is a map-only scrub (zero shuffles — regex stays inside
    codegen over the scan); t11 is exactly its two chained partial+
    final aggregations, never a single-partition exchange."""
    from dask_traj_spark.functions.text import lexical_diversity, pii_stats

    docs = _docs_fixture(spark)
    assert_max_shuffles(pii_stats(docs), 0)
    a = assert_max_shuffles(lexical_diversity(docs), 2)
    assert "SinglePartition" not in a.text, a.text


def test_multimodal_feature_paths_are_map_only(spark):
    """m7 resize and m8 audio windows are map-only Arrow passes: the
    payload column never crosses a shuffle boundary."""
    from dask_traj_spark.operators.multimodal import (
        attach_payload_bmp,
        attach_payload_wav,
        audio_window_features,
        resize_images,
    )

    docs = _docs_fixture(spark)
    assert_max_shuffles(resize_images(attach_payload_bmp(docs), 3, 1), 0)
    assert_max_shuffles(audio_window_features(attach_payload_wav(docs)), 0)


def test_vacf_and_rmsf_shuffle_budgets(spark):
    """x12: one atom-keyed window shuffle + the banded-join shuffles +
    the final agg — but never a cartesian or single partition; x10 is
    one partial+final agg."""
    import numpy as np

    from dask_traj_spark.operators.distance import velocity_autocorrelation
    from dask_traj_spark.operators.rmsd import compute_rmsf
    from dask_traj_spark.sources.loaders import from_wide_pandas

    xyz = np.zeros((4, 6, 3), dtype=np.float32)
    traj = from_wide_pandas(spark, xyz)
    a = assert_max_shuffles(compute_rmsf(traj), 1)
    assert "SinglePartition" not in a.text, a.text
    v = audit(velocity_autocorrelation(traj, max_lag=2))
    assert "CartesianProduct" not in v.text, v.text
    assert "SinglePartition" not in v.text, v.text


def test_image_pixel_stats_is_map_only(spark):
    """m11's decode + stats must compile to a zero-shuffle map pass:
    two mapInPandas stages fused over one scan lineage."""
    from dask_traj_spark.operators.multimodal import (
        attach_payload_jpeg,
        image_pixel_stats,
    )
    from dask_traj_spark.plans.audit import formatted_plan

    docs = spark.createDataFrame([(1, "ab cd")], "doc_id long, text string")
    plan = formatted_plan(image_pixel_stats(attach_payload_jpeg(docs)))
    assert "Exchange" not in plan


def test_ivf_pq_rerank_broadcasts_survivors(spark):
    """v8's exact-rerank join must broadcast the tiny survivor set —
    the corpus side must not shuffle after encoding."""
    import numpy as np

    from dask_traj_spark.operators.similarity import cosine_topk_ivf_pq
    from dask_traj_spark.plans.audit import formatted_plan

    rng = np.random.default_rng(31)
    rows = [
        (int(i), [float(x) for x in rng.standard_normal(16)])
        for i in range(64)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    plan = formatted_plan(
        cosine_topk_ivf_pq(emb, [0], k=3, n_centroids=2, nprobe=1, m=4,
                           n_codes=4, rerank_depth=16)
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_curation_chain_no_cartesian(spark):
    """c7's four-stage chain stays join-keyed end to end."""
    from dask_traj_spark.plans.audit import formatted_plan
    from dask_traj_spark.queries_pipeline import q_curation_chain

    plan = formatted_plan(q_curation_chain(spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pairwise_rmsd_no_cartesian(spark):
    """x16: the cross term must be an atom-keyed equi-join, the
    per-frame stat joins broadcast."""
    import numpy as np

    from dask_traj_spark.operators.rmsd import pairwise_rmsd
    from dask_traj_spark.plans.audit import formatted_plan
    from dask_traj_spark.trajectory import Trajectory

    rng = np.random.default_rng(3)
    rows = [
        (f, a, float(v[0]), float(v[1]), float(v[2]))
        for f in range(4) for a, v in enumerate(rng.uniform(0, 1, (6, 3)))
    ]
    traj = Trajectory(spark.createDataFrame(
        rows, "frame_id long, atom_id int, x double, y double, z double"
    ))
    plan = formatted_plan(pairwise_rmsd(traj))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # per-frame stats broadcast


def test_pairwise_rmsd_blocked_plan(spark):
    """x16b: rows reach the tile-pair gram through BROADCAST joins
    with the tiny pair table (never a row-level cartesian/shuffle
    join), and the only wide exchange feeds the applyInPandas
    gram — the blocked-matmul 100-TB shape."""
    import numpy as np

    from dask_traj_spark.operators.rmsd import pairwise_rmsd_blocked
    from dask_traj_spark.plans.audit import formatted_plan
    from dask_traj_spark.trajectory import Trajectory

    rng = np.random.default_rng(7)
    rows = [
        (f, a, float(v[0]), float(v[1]), float(v[2]))
        for f in range(9) for a, v in enumerate(rng.uniform(0, 1, (6, 3)))
    ]
    traj = Trajectory(spark.createDataFrame(
        rows, "frame_id long, atom_id int, x double, y double, z double"
    ))
    plan = formatted_plan(pairwise_rmsd_blocked(traj, block=3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # coords × tiny tile-pair table
    assert "FlatMapGroupsInPandas" in plan  # the tile-pair gram


def test_count_min_no_python_and_bounded_shuffle(spark):
    """t14: the sketch is pure SQL (no Python eval); the cell
    groupBy is the only wide operation."""
    from dask_traj_spark.functions.text import count_min_cells
    from dask_traj_spark.plans.audit import formatted_plan

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = formatted_plan(count_min_cells(docs))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_simhash_hamming_no_cartesian(spark):
    """d10: candidates come from the (block, value) equi-join."""
    from dask_traj_spark.operators.dedup import simhash_neardup_pairs
    from dask_traj_spark.plans.audit import formatted_plan

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "b c")], "doc_id long, text string"
    )
    plan = formatted_plan(simhash_neardup_pairs(docs))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sasa_join_shapes(spark):
    """x18: the only unconditioned join is the broadcast of the
    constant 32-row sphere-point table; occluder candidates come
    from the cell-list equi-join (no CartesianProduct anywhere)."""
    import numpy as np

    from dask_traj_spark.operators.distance import sasa_exposure
    from dask_traj_spark.plans.audit import formatted_plan
    from dask_traj_spark.trajectory import Trajectory

    rng = np.random.default_rng(5)
    rows = [
        (0, a, float(v[0]), float(v[1]), float(v[2]))
        for a, v in enumerate(rng.uniform(0, 1, (8, 3)))
    ]
    traj = Trajectory(spark.createDataFrame(
        rows, "frame_id long, atom_id int, x double, y double, z double"
    ))
    plan = formatted_plan(sasa_exposure(traj))
    assert "CartesianProduct" not in plan


def test_duplicate_spans_plan_shape(spark):
    """d11's 100-TB posture: n-gram windows built JVM-side (zero
    Python evals), duplicated-key detection through partial-agg
    groupBys (never a window over raw occurrences — a boilerplate
    n-gram must collapse map-side), no cartesian anything, and the
    island merge reuses ONE doc_id exchange for both windows and
    the final aggregate."""
    from dask_traj_spark.operators.dedup import duplicate_spans

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(4)],
        "doc_id long, text string",
    )
    a = audit(duplicate_spans(docs))
    assert "CartesianProduct" not in a.text, a.text
    assert "ArrowEvalPython" not in a.text, a.text
    assert "BatchEvalPython" not in a.text, a.text
    # (ng,doc) distinct + ng count + doc_id islands = 3 keyed
    # shuffles; the dup-set side may add a broadcast (free) or, if
    # AQE declines, one more keyed exchange
    assert a.n_shuffles <= 4, a.text
    assert "SinglePartition" not in a.text, a.text


def test_maximal_matches_plan_shape(spark):
    """d14's 100-TB posture: windows JVM-side (zero Python evals),
    the occurrence cap collapses map-side and filters BEFORE the
    pair join (so the join fan-out is bounded by max_occ² per key),
    the islands window is keyed on (doc1, doc2, diag) — never
    SinglePartition — and nothing is cartesian."""
    from dask_traj_spark.operators.dedup import maximal_matches

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(4)],
        "doc_id long, text string",
    )
    a = audit(maximal_matches(docs))
    assert "CartesianProduct" not in a.text, a.text
    assert "BroadcastNestedLoopJoin" not in a.text, a.text
    assert "ArrowEvalPython" not in a.text, a.text
    assert "BatchEvalPython" not in a.text, a.text
    assert "SinglePartition" not in a.text, a.text


def test_video_codec_mix_plan_shape(spark):
    """m14: sniff is a JVM-side CASE feeding ONE Arrow-batched
    mapInPandas demux; the only exchange is the partial+final
    aggregation on the tiny (container, codec) key — no cartesian,
    no SinglePartition, no row-at-a-time Python."""
    from dask_traj_spark.operators.multimodal import (
        attach_payload_mp4,
        video_codec_mix,
    )

    docs = spark.createDataFrame(
        [(i, "x") for i in range(4)], "doc_id long, text string"
    )
    a = audit(video_codec_mix(attach_payload_mp4(docs)))
    assert "CartesianProduct" not in a.text, a.text
    assert "SinglePartition" not in a.text, a.text
    assert "BatchEvalPython" not in a.text, a.text
    assert a.n_shuffles <= 1, a.text


def test_excise_spans_plan_shape(spark):
    """d12's rewrite is a JVM-side array filter — no explode of the
    corpus tokens, no Python, and the only wide operations are the
    span groupBy and one doc_id-keyed join."""
    from dask_traj_spark.operators.dedup import (
        duplicate_spans,
        excise_duplicate_spans,
    )

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(4)],
        "doc_id long, text string",
    )
    a = audit(excise_duplicate_spans(docs, duplicate_spans(docs)))
    assert "CartesianProduct" not in a.text, a.text
    assert "ArrowEvalPython" not in a.text, a.text
    assert "BatchEvalPython" not in a.text, a.text
    assert "SinglePartition" not in a.text, a.text


def test_bm25_plan_broadcasts_stats_and_stays_jvm_side(spark):
    """bm25_topk: exactly one SinglePartition exchange (the 1-row
    corpus stats aggregate), df and stats ride broadcast joins, the
    final top-k is TakeOrderedAndProject (never a global sort
    materialization), and nothing drops to Python."""
    from dask_traj_spark.functions.text import bm25_topk

    text = audit(bm25_topk(_docs_fixture(spark), "common w1 w3", k=3)).text
    assert text.count("SinglePartition") == 1, text
    assert "BroadcastExchange" in text, text
    assert "TakeOrderedAndProject" in text, text
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text


def test_bloom_membership_plan_is_bounded_and_jvm_side(spark):
    """bloom_membership: the bitmap side aggregates to at most
    n_bits/64 rows and rides a BroadcastExchange by default; the
    probe side is explode + join + one groupBy on the probe id —
    no Python evals, no cartesian."""
    from dask_traj_spark.operators.dedup import bloom_membership

    docs = _docs_fixture(spark)
    text = audit(
        bloom_membership(docs, docs, n_bits=1 << 12, n_hashes=3)
    ).text
    assert "BroadcastExchange" in text, text
    assert "CartesianProduct" not in text and "BroadcastNestedLoop" not in text
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    # the shuffle-fallback path compiles without the broadcast
    text2 = audit(
        bloom_membership(docs, docs, n_bits=1 << 12, broadcast=False)
    ).text
    assert "CartesianProduct" not in text2


def test_quantile_prune_is_one_stratum_shuffle(spark):
    """c8: the quality score is fused into the scan projection (no
    doc_id join against a scored table), so the ONLY exchange is the
    stratum-key window — never SinglePartition, no Python."""
    from dask_traj_spark.operators.curation import quantile_prune

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} common w{i % 5}", f"s{i % 3}") for i in range(30)],
        "doc_id long, text string, source string",
    )
    a = audit(quantile_prune(docs, keep_frac=0.5))
    assert a.n_shuffles <= 1, a.text
    assert "SinglePartition" not in a.text, a.text
    assert "CartesianProduct" not in a.text, a.text
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text


def test_dsir_importance_default_is_open_vocabulary(spark):
    """t17's production path (hashed buckets): the model is bounded
    by n_buckets and rides BroadcastExchanges; the only
    SinglePartition exchanges are the two 1-row token totals; no
    sorted-vocab funnel, no cartesian fan-out, no Python."""
    from dask_traj_spark.operators.curation import dsir_importance

    docs = _docs_fixture(spark)
    target = docs.where(F.col("doc_id") % 4 == 0)
    a = audit(dsir_importance(docs, target, n_buckets=256, id_mode="hash"))
    text = a.text
    # 1-row totals only: the cross-join against them broadcasts
    assert text.count("SinglePartition") <= 2, text
    assert "BroadcastExchange" in text, text
    assert "CartesianProduct" not in text, text
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    # no global sorted-vocab window in the default mode
    assert "row_number" not in text.lower(), text


def test_weighted_sample_topk_never_global_sorts(spark):
    """c9: the global-k form must select through TakeOrderedAndProject
    (a k-row heap per partition + k-row final merge), never a global
    sort materialization; the stratified form windows on the stratum
    key — neither drops to Python."""
    from dask_traj_spark.operators.curation import weighted_sample

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} common w{i % 5}", f"s{i % 3}") for i in range(30)],
        "doc_id long, text string, source string",
    )
    text = audit(weighted_sample(docs, k=5)).text
    assert "TakeOrderedAndProject" in text, text
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    text2 = audit(weighted_sample(docs, k=2, strata_col="source")).text
    assert "SinglePartition" not in text2, text2
    assert "BatchEvalPython" not in text2 and "ArrowEvalPython" not in text2


def test_bpe_round_is_one_keyed_exchange_no_python(spark):
    """t18's per-round plan: the pair count is a position self-join
    plus one keyed aggregation over the WORD table (never the raw
    corpus), the merge rewrite is a JVM-side fold (zero Python
    evals), and nothing is cartesian or SinglePartition except the
    bounded 1-row argmax the driver collects."""
    from dask_traj_spark.operators.bpe import (
        _apply_merge,
        _init_symbols,
        _pair_counts,
        _word_freq,
    )

    docs = _docs_fixture(spark)
    table = _init_symbols(_word_freq(docs, "text"))
    a = audit(_pair_counts(table))
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text
    assert "CartesianProduct" not in a.text, a.text
    assert "SinglePartition" not in a.text, a.text
    rewritten = _apply_merge(table, "c", "o")
    b = audit(rewritten)
    assert "BatchEvalPython" not in b.text and "ArrowEvalPython" not in b.text
    assert "CartesianProduct" not in b.text, b.text


def test_bpe_token_counts_broadcasts_word_table(spark):
    """t19: the (word → |syms|) table rides a broadcast join onto
    the token stream; one doc_id aggregation finishes."""
    from dask_traj_spark.operators.bpe import (
        bpe_token_counts,
        bpe_train,
    )

    docs = _docs_fixture(spark)
    _m, seg = bpe_train(docs, n_merges=2)
    a = audit(bpe_token_counts(docs, seg))
    assert "BroadcastHashJoin" in a.text, a.text
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text
    assert "CartesianProduct" not in a.text, a.text
    # open-vocabulary fallback: one keyed exchange, still no Python
    b = audit(bpe_token_counts(docs, seg, broadcast=False))
    assert "CartesianProduct" not in b.text, b.text
    assert "BatchEvalPython" not in b.text and "ArrowEvalPython" not in b.text


def test_cluster_keep_best_window_is_component_keyed(spark):
    """d16: past the (checkpoint-bounded) component loop, the keep
    decision is one component-keyed window — no SinglePartition, no
    cartesian, no Python."""
    from dask_traj_spark.operators.dedup import keep_best_in_clusters

    docs = _docs_fixture(spark)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 20, 2)], "id1 long, id2 long"
    )
    a = audit(keep_best_in_clusters(docs, pairs))
    assert "SinglePartition" not in a.text, a.text
    assert "CartesianProduct" not in a.text, a.text
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text


def test_quality_soft_dedup_is_keyed_aggs_only(spark):
    """d22: past the checkpoint-bounded component loop, the quality
    apportioning is one component-keyed sum + keyed joins with the
    quality expression fused into the scan — no SinglePartition, no
    cartesian, no Python, no per-member window."""
    from dask_traj_spark.operators.dedup import quality_soft_dedup_weights

    docs = _docs_fixture(spark)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 20, 2)], "id1 long, id2 long"
    )
    a = audit(quality_soft_dedup_weights(docs, pairs))
    assert "SinglePartition" not in a.text, a.text
    assert "CartesianProduct" not in a.text, a.text
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text
    assert "row_number" not in a.text.lower(), a.text


def test_mixture_weights_single_stratum_agg(spark):
    """c11: one stratum-keyed partial+final aggregation; the 1-row
    normalizer rides the audited broadcast cross-join pattern; no
    Python, no cartesian."""
    from dask_traj_spark.operators.curation import mixture_weights

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} common", f"s{i % 3}") for i in range(30)],
        "doc_id long, text string, source string",
    )
    a = audit(mixture_weights(docs, total_budget=1000))
    assert "CartesianProduct" not in a.text, a.text
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text
    assert a.text.count("SinglePartition") <= 1, a.text


def test_context_chunks_is_shuffle_free(spark):
    """c12: one projection + explode(sequence) — ZERO exchanges of
    any kind, no Python, never SinglePartition.  The chunking step
    must stay embarrassingly parallel at any corpus size."""
    from dask_traj_spark.operators.curation import context_chunks

    a = audit(context_chunks(_docs_fixture(spark), chunk_tokens=4, stride=3))
    assert a.n_shuffles == 0, a.text
    assert "SinglePartition" not in a.text, a.text
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text


def test_char_entropy_is_shuffle_free_hof_projection(spark):
    """t20: the per-doc character histogram is computed inside one
    JVM-side higher-order-function projection — zero exchanges, no
    per-character row explosion, no Python."""
    from dask_traj_spark.functions.text import char_entropy

    a = audit(char_entropy(_docs_fixture(spark)))
    assert a.n_shuffles == 0, a.text
    assert "Generate" not in a.text, a.text  # no explode
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text


def test_source_kl_is_one_corpus_scan_bounded_joins(spark):
    """t21: (word, source) counts are checkpointed so the marginals
    derive from the bounded table, not corpus re-scans; per-source
    totals and the grand total ride broadcasts; the word-marginal
    join is keyed (no cartesian); at most one SinglePartition (the
    1-row grand total); no Python."""
    from dask_traj_spark.functions.text import source_unigram_kl

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} common w{i % 5}", f"s{i % 3}") for i in range(30)],
        "doc_id long, text string, source string",
    )
    a = audit(source_unigram_kl(docs))
    assert "CartesianProduct" not in a.text, a.text
    assert a.text.count("SinglePartition") <= 1, a.text
    assert "BroadcastExchange" in a.text, a.text
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text
    # the corpus scan happens before the checkpoint: the audited plan
    # reads the checkpointed RDD, not the parquet/LocalTableScan twice
    assert "Scan ExistingRDD" in a.text, a.text


def test_winnowing_default_is_shuffle_free(spark):
    """t22's production path (xxhash64 gram hashes): the whole
    gram-hash → window-min → distinct-selection chain runs inside
    JVM-side higher-order functions — zero exchanges, no Python.
    The sorted-vocab funnel is gate-only (allowlisted)."""
    from dask_traj_spark.functions.text import winnow_fingerprints

    a = audit(winnow_fingerprints(_docs_fixture(spark), k=2, w=3))
    assert a.n_shuffles == 0, a.text
    assert "SinglePartition" not in a.text, a.text
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text


def test_winnow_matches_default_no_cartesian_no_python(spark):
    """d17's production path: zero-shuffle fingerprinting, the df
    cap's fp-keyed window, one fp-keyed self-join — no cartesian, no
    SinglePartition, no Python."""
    from dask_traj_spark.operators.dedup import winnow_matches

    a = audit(winnow_matches(_docs_fixture(spark), k=2, w=3))
    assert "CartesianProduct" not in a.text, a.text
    assert "SinglePartition" not in a.text, a.text
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text


def test_shuffle_shards_is_one_shard_keyed_window(spark):
    """c13: one exchange on the shard key, rank inside the shard
    window — never SinglePartition, no Python."""
    from dask_traj_spark.operators.curation import shuffle_shards

    a = audit(shuffle_shards(_docs_fixture(spark), n_shards=4))
    assert a.n_shuffles <= 1, a.text
    assert "SinglePartition" not in a.text, a.text
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text


def test_perplexity_buckets_broadcast_model_stratum_window(spark):
    """t23: the bigram model rides broadcasts (|alphabet|² rows);
    ranking is a stratum-keyed window — never SinglePartition, no
    cartesian, no Python."""
    from dask_traj_spark.functions.text import perplexity_buckets

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} common w{i % 5}", f"s{i % 3}") for i in range(30)],
        "doc_id long, text string, source string",
    )
    a = audit(perplexity_buckets(docs))
    assert "SinglePartition" not in a.text, a.text
    assert "CartesianProduct" not in a.text, a.text
    assert "BroadcastExchange" in a.text, a.text
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text


def test_pagerank_round_is_keyed_joins_no_python(spark):
    """d18: each power iteration is one src-keyed join + one
    dst-keyed aggregation; the only nested-loop is the 1-row
    vertex-count broadcast; no Python anywhere."""
    from dask_traj_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, (i + 1) % 10) for i in range(10)]
        + [((i + 1) % 10, i) for i in range(10)],
        "src long, dst long",
    )
    a = audit(pagerank(edges, n_iter=2, checkpoint_every=0))
    assert "CartesianProduct" not in a.text, a.text
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text
    # the 1-row vertex count is checkpointed ONCE — no per-round
    # SinglePartition re-aggregation
    assert a.text.count("SinglePartition") == 0, a.text


def test_pagerank_redistribute_round_shape(spark):
    """d24: dangling redistribution adds exactly ONE 1-row aggregate
    per round (the sink-mass sum — the documented broadcast pattern)
    on top of d18's keyed-join round; still no cartesian product and
    no Python.  checkpoint_every=0 keeps both rounds in one audited
    plan."""
    from dask_traj_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i, i + 10) for i in range(10)], "src long, dst long"
    )
    a = audit(
        pagerank(edges, n_iter=2, checkpoint_every=0,
                 dangling="redistribute")
    )
    assert "CartesianProduct" not in a.text, a.text
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text
    # one dangling-mass SinglePartition per round, nothing else
    assert a.text.count("SinglePartition") <= 2 * 2, a.text


def test_chunk_shard_pipeline_composite_plan(spark):
    """c14's whole chain in one plan: quality filter fused into the
    scan projection, shuffle-free chunking, shard-keyed window, one
    chunk_id-keyed join — no cartesian, no SinglePartition, no
    Python."""
    from dask_traj_spark.functions.text import quality_expr
    from dask_traj_spark.operators.curation import (
        context_chunks,
        shuffle_shards,
    )

    docs = _docs_fixture(spark)
    chunks = context_chunks(
        docs.where(quality_expr() >= 0.5), chunk_tokens=4, stride=3
    )
    keyed = chunks.withColumn(
        "chunk_id", F.col("doc_id") * F.lit(1024) + F.col("chunk_idx")
    )
    a = audit(shuffle_shards(keyed, n_shards=4, id_col="chunk_id"))
    # join-free since the keep-columns rework: ONE shard-keyed window
    # over the fused filter+chunk projection
    assert a.n_shuffles <= 1, a.text
    assert "Join" not in a.text, a.text
    assert "CartesianProduct" not in a.text, a.text
    assert "SinglePartition" not in a.text, a.text
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text


def test_heaps_law_stratum_windows_no_single_partition(spark):
    """t24: two keyed aggregations + stratum-keyed rank/running-sum
    windows + one per-source final agg — never SinglePartition, no
    cartesian, no Python."""
    from dask_traj_spark.functions.text import heaps_law

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} common w{i % 5} tail{i}", f"s{i % 3}") for i in range(30)],
        "doc_id long, text string, source string",
    )
    a = audit(heaps_law(docs))
    assert "SinglePartition" not in a.text, a.text
    assert "CartesianProduct" not in a.text, a.text
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text


def test_zipf_slope_stratum_window_no_single_partition(spark):
    """t25: one keyed aggregation + a stratum-keyed rank window +
    the shared regression agg — never SinglePartition, no Python."""
    from dask_traj_spark.functions.text import zipf_slope

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} common w{i % 5} tail{i}", f"s{i % 3}") for i in range(30)],
        "doc_id long, text string, source string",
    )
    a = audit(zipf_slope(docs))
    assert "SinglePartition" not in a.text, a.text
    assert "CartesianProduct" not in a.text, a.text
    assert "BatchEvalPython" not in a.text and "ArrowEvalPython" not in a.text


def test_top_ngram_char_fraction_plan_shape(spark):
    """t26's 100-TB posture: gram windows JVM-side (no Python), the
    per-doc argmax is a partial-aggregable min-over-struct groupBy
    (never a window over raw occurrences), the zero-fill join is
    keyed on doc_id — no cartesian, no SinglePartition."""
    from dask_traj_spark.functions.text import top_ngram_char_fraction

    docs = spark.createDataFrame(
        [(i, "a b c a b c") for i in range(4)], "doc_id long, text string"
    )
    a = audit(top_ngram_char_fraction(docs, n=2))
    assert "CartesianProduct" not in a.text, a.text
    assert "BroadcastNestedLoopJoin" not in a.text, a.text
    assert "ArrowEvalPython" not in a.text, a.text
    assert "BatchEvalPython" not in a.text, a.text
    assert "SinglePartition" not in a.text, a.text


def test_dup_ngram_char_fraction_plan_shape(spark):
    """t27's 100-TB posture: gram windows + char offsets JVM-side,
    the duplicate filter a (doc_id, gram)-keyed window (within-doc
    counts — no corpus-wide skew key), islands keyed on doc_id — no
    cartesian, no Python, no SinglePartition."""
    from dask_traj_spark.functions.text import dup_ngram_char_fraction

    docs = spark.createDataFrame(
        [(i, "a b c d e f a b c d e f") for i in range(4)],
        "doc_id long, text string",
    )
    a = audit(dup_ngram_char_fraction(docs, n=5))
    assert "CartesianProduct" not in a.text, a.text
    assert "BroadcastNestedLoopJoin" not in a.text, a.text
    assert "ArrowEvalPython" not in a.text, a.text
    assert "BatchEvalPython" not in a.text, a.text
    assert "SinglePartition" not in a.text, a.text


def test_soft_dedup_weights_plan_shape(spark):
    """d19's 100-TB posture: the size attach is a partial-aggregable
    component-keyed count + keyed join — no cartesian, no Python, no
    SinglePartition (the component loop is checkpoint-bounded)."""
    from dask_traj_spark.operators.dedup import soft_dedup_weights

    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1), (2, 3)], "id1 long, id2 long")
    a = audit(soft_dedup_weights(pairs, nodes))
    assert "CartesianProduct" not in a.text, a.text
    assert "BroadcastNestedLoopJoin" not in a.text, a.text
    assert "ArrowEvalPython" not in a.text, a.text
    assert "BatchEvalPython" not in a.text, a.text
    assert "SinglePartition" not in a.text, a.text


def test_cosine_topk_filtered_pushdown(spark, tmp_path):
    """v9's 100-TB posture: the metadata predicate reaches the
    corpus parquet scan (PushedFilters), the query side is
    broadcast, and the plan has no cartesian/Python/SinglePartition
    beyond v1's shape."""
    import random

    from dask_traj_spark.operators.similarity import cosine_topk

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(4)], i % 2)
        for i in range(20)
    ]
    p = str(tmp_path / "emb.parquet")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(p)
    emb = spark.read.parquet(p)
    a = audit(cosine_topk(emb, [0], k=3, corpus_filter="label = 0"))
    assert "CartesianProduct" not in a.text, a.text
    assert "ArrowEvalPython" not in a.text, a.text
    assert "BatchEvalPython" not in a.text, a.text
    # the label predicate is pushed into a parquet scan
    assert "PushedFilters" in a.text and "label" in a.text, a.text


def test_inter_event_gaps_plan_shape(spark):
    """e9's 100-TB posture: one user-keyed lag window feeding one
    partial+final agg on event_type — no cartesian, no Python, no
    SinglePartition."""
    import datetime as dt

    from dask_traj_spark.queries_pipeline import _gap_rollup

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [(i, i % 3, t0 + dt.timedelta(minutes=i), "a") for i in range(9)],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.withColumn(
        "gap_us",
        F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)),
    ).where(F.col("gap_us").isNotNull())
    a = audit(_gap_rollup(g))
    assert "CartesianProduct" not in a.text, a.text
    assert "ArrowEvalPython" not in a.text, a.text
    assert "BatchEvalPython" not in a.text, a.text
    assert "SinglePartition" not in a.text, a.text


def test_cross_corpus_neardup_plan_shape(spark):
    """d20's 100-TB posture (hashed-id scale path): one union-wide
    signature agg, side-split band join (no same-side candidates),
    capped buckets — no cartesian, no Python, no SinglePartition."""
    from dask_traj_spark.operators.dedup import cross_corpus_neardup

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(4)], "doc_id long, text string"
    )
    ref = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(2)], "doc_id long, text string"
    )
    a = audit(cross_corpus_neardup(docs, ref, threshold=0.5))
    assert "CartesianProduct" not in a.text, a.text
    assert "BroadcastNestedLoopJoin" not in a.text, a.text
    assert "ArrowEvalPython" not in a.text, a.text
    assert "BatchEvalPython" not in a.text, a.text
    assert "SinglePartition" not in a.text, a.text


def test_cross_corpus_matches_plan_shape(spark):
    """d21's 100-TB posture (hashed production mode): union-wide
    window construction, occurrence cap BEFORE the side-split pair
    join, diagonal-keyed islands — no cartesian, no Python, no
    SinglePartition."""
    from dask_traj_spark.operators.dedup import cross_corpus_matches

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(3)],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(9, "a b c d e f g h i j")], "doc_id long, text string"
    )
    a = audit(cross_corpus_matches(docs, ref))
    assert "CartesianProduct" not in a.text, a.text
    assert "BroadcastNestedLoopJoin" not in a.text, a.text
    assert "ArrowEvalPython" not in a.text, a.text
    assert "BatchEvalPython" not in a.text, a.text
    assert "SinglePartition" not in a.text, a.text


def test_knn_classify_plan_shape(spark):
    """v10's 100-TB posture: the label attach joins the tiny top-k
    table (broadcast-eligible), both vote aggs partial-aggregable —
    no cartesian, no Python, no SinglePartition."""
    from dask_traj_spark.operators.similarity import knn_classify

    emb = spark.createDataFrame(
        [(i, [float(i % 3), 1.0], i % 2) for i in range(12)],
        "vec_id long, embedding array<float>, label int",
    )
    a = audit(knn_classify(emb, [0, 1], k=3))
    assert "CartesianProduct" not in a.text, a.text
    assert "ArrowEvalPython" not in a.text, a.text
    assert "BatchEvalPython" not in a.text, a.text
    assert "SinglePartition" not in a.text, a.text


def test_budget_select_plan_shape(spark):
    """c15's 100-TB posture: quality fused into the scan projection,
    ONE stratum-keyed window exchange — no join, no cartesian, no
    Python, no SinglePartition."""
    from dask_traj_spark.operators.curation import budget_select

    docs = spark.createDataFrame(
        [(i, "a b c d e", f"s{i % 2}") for i in range(6)],
        "doc_id long, text string, source string",
    )
    df = budget_select(docs, budget_tokens=10)
    a = audit(df)
    assert "CartesianProduct" not in a.text, a.text
    assert "Join" not in a.text, a.text
    assert "ArrowEvalPython" not in a.text, a.text
    assert "BatchEvalPython" not in a.text, a.text
    assert "SinglePartition" not in a.text, a.text
    assert_max_shuffles(df, 1)


def test_embedding_diversity_plan_shape(spark):
    """v11's 100-TB posture: NO pairwise join — three keyed
    partial+final aggs + one keyed normalize join; no cartesian, no
    Python, no SinglePartition."""
    from dask_traj_spark.operators.similarity import embedding_diversity

    emb = spark.createDataFrame(
        [(i, [1.0, float(i)], i % 2) for i in range(8)],
        "vec_id long, embedding array<float>, label int",
    )
    a = audit(embedding_diversity(emb))
    assert "CartesianProduct" not in a.text, a.text
    assert "BroadcastNestedLoopJoin" not in a.text, a.text
    assert "ArrowEvalPython" not in a.text, a.text
    assert "BatchEvalPython" not in a.text, a.text
    assert "SinglePartition" not in a.text, a.text


def test_tokenizer_fertility_plan_shape(spark):
    """t28's 100-TB posture: broadcast word join + two
    partial-aggregable groupBys; no cartesian, no Python, no
    SinglePartition."""
    from dask_traj_spark.operators.bpe import tokenizer_fertility

    docs = spark.createDataFrame(
        [(i, "aa bb", f"s{i % 2}") for i in range(4)],
        "doc_id long, text string, source string",
    )
    seg = spark.createDataFrame(
        [("aa", ["aa"]), ("bb", ["b", "b"])],
        "word string, syms array<string>",
    )
    a = audit(tokenizer_fertility(docs, seg))
    assert "CartesianProduct" not in a.text, a.text
    assert "ArrowEvalPython" not in a.text, a.text
    assert "BatchEvalPython" not in a.text, a.text
    assert "SinglePartition" not in a.text, a.text


def test_band_candidates_capped_is_joinless_single_band_exchange(spark):
    """r13: the capped LSH candidate path packs each band bucket with
    ONE groupBy and emits pairs in-row — no self-join, so the band
    pipeline cannot re-execute whatever join strategy AQE picks (the
    r12 join form relied on exchange reuse that never fired above a
    cached table).  The uncapped path keeps the legacy streaming
    join (unbounded buckets must not be packed into one row)."""
    from dask_traj_spark.operators.dedup import lsh_candidate_pairs

    docs = _docs_fixture(spark)
    capped = audit(lsh_candidate_pairs(docs, max_bucket=64)).text
    assert "Join" not in capped, capped
    assert "SinglePartition" not in capped, capped
    uncapped = audit(lsh_candidate_pairs(docs, max_bucket=None)).text
    assert "Join" in uncapped, uncapped


def test_band_candidates_packed_matches_legacy_join_form(spark):
    """The packed-bucket emitter and the legacy self-join must produce
    the identical candidate-pair SET (the capped form additionally
    drops over-cap buckets, checked with a cap that keeps all)."""
    from dask_traj_spark.operators.dedup import lsh_candidate_pairs

    docs = _docs_fixture(spark)
    packed = {
        (r.doc1, r.doc2)
        for r in lsh_candidate_pairs(docs, max_bucket=10_000).collect()
    }
    legacy = {
        (r.doc1, r.doc2)
        for r in lsh_candidate_pairs(docs, max_bucket=None).collect()
    }
    assert packed == legacy and packed, (len(packed), len(legacy))


def test_band_candidates_cap_drops_oversized_buckets(spark):
    """The groupBy size filter must keep the _cap_buckets semantics:
    a boilerplate bucket above the cap emits NO pairs."""
    from dask_traj_spark.operators.dedup import lsh_candidate_pairs

    same = spark.createDataFrame(
        [(i, "a b c d e") for i in range(12)], "doc_id long, text string"
    )
    # every doc identical -> each band bucket holds all 12 docs
    assert lsh_candidate_pairs(same, max_bucket=11).count() == 0
    assert lsh_candidate_pairs(same, max_bucket=12).count() == 12 * 11 // 2


def test_cross_corpus_capped_is_joinless_and_matches_uncapped(spark):
    """d20's capped bipartite path: parity-split in-row emission, no
    band join; result set identical to the legacy join form."""
    from dask_traj_spark.operators.dedup import cross_corpus_neardup

    docs = spark.createDataFrame(
        [(i, f"a b c d e f tail{i % 3}") for i in range(9)],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(i, f"a b c d e f tail{i % 3}") for i in range(4)],
        "doc_id long, text string",
    )
    capped = cross_corpus_neardup(docs, ref, threshold=0.1, max_bucket=10_000)
    uncapped = cross_corpus_neardup(docs, ref, threshold=0.1, max_bucket=None)
    got = {(r.doc_id, r.ref_id, r.jaccard) for r in capped.collect()}
    want = {(r.doc_id, r.ref_id, r.jaccard) for r in uncapped.collect()}
    assert got == want and got, (len(got), len(want))


def test_tokens_spread_optout_has_no_repartition(spark):
    """r13 spread budget: fingerprint and DSIR opt out of the
    pre-explode spread (their downstream is one map-side-collapsing
    aggregate), so their plans carry no REPARTITION exchange; the
    heavy consumers (minhash front end) keep it."""
    from dask_traj_spark.functions.text import fingerprint
    from dask_traj_spark.operators.curation import dsir_importance
    from dask_traj_spark.operators.dedup import minhash_signatures

    # one input partition so spread_for_expansion WOULD fire if asked
    docs = _docs_fixture(spark).coalesce(1)
    assert "REPARTITION" not in audit(fingerprint(docs)).text
    assert "REPARTITION" not in audit(
        dsir_importance(docs, docs.where(F.col("doc_id") % 4 == 0))
    ).text
    assert "REPARTITION" in audit(minhash_signatures(docs)).text
