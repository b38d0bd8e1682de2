"""10x scale stress: build a multi-file 10x copy of sf0.1 (distinct ids per
copy) and time the headline queries against it next to their sf0.1 runs.

Unlike the single-row-group driver files, the stress dataset has 10 part
files per table, so scans parallelize the way they do on a real cluster —
`scan_parallel` must detect that and stay out of the way (its repartition
is for the toy files only).  Ratios near 10x mean per-row work dominates
(linear scaling); well under 10x means fixed overhead still dominates at
sf0.1; over ~10x is a red flag (super-linear operator).

Pair-producing dedup IS expected to grow faster than 10x here: every copy
duplicates the corpus, so a 10x-duplicated corpus has ~50x more true
duplicate pairs — the output itself is bigger.

A second dataset variant measures SKEW: the events table rebuilt with
half of all rows remapped onto a single hot user (deterministically, by
event-id parity), same total row count as the uniform 10x copy.  The
as-of and binned range joins run against both and print skewed/uniform
ratios — the binned join's bounded fan-in claim (candidates limited to
same-bin + adjacent-bin rows per key, not the full hot-key history) is
thereby measured rather than argued.  A ratio near 1x means the bins are
doing their job; the as-of join's single-window-per-key shape is timed
alongside for an honest account of what a hot key costs a window.

Usage: python tools/scale_stress.py [out_dir] [query ...]
       python tools/scale_stress.py --skew [out_dir]
       python tools/scale_stress.py --degenerate [out_dir]
       python tools/scale_stress.py --hot-host [out_dir]

``--hot-host`` stresses politeness scheduling with ~50% of all URLs on
one host (the monster-host case the per-host FIFO window makes one
long partition by definition) and prints the hot/uniform ratio.

``--skew`` also covers the two superlinear-output dedup operators
(span-dedup application, semantic dedup) against duplicate-heavy skew
twins (one hot text / one hot vector on half the rows).  ``--degenerate``
stresses the banded prefix-sum selector with a CONSTANT priority column —
the case the adaptive id-sub-banding exists for.
"""

from __future__ import annotations

import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from adtl_spark import queries as Q  # noqa: E402
from adtl_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10
# id column to offset per copy so keys stay unique; None = copy verbatim
ID_OFFSETS = {
    "lineitem": ("l_orderkey", 10_000_000),
    "orders": ("o_orderkey", 10_000_000),
    "events": ("event_id", 100_000_000),
    "documents": ("doc_id", 1_000_000),
    "embeddings": ("vec_id", 1_000_000),
}
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
QUERIES = [
    "q1_pricing_summary",
    "adtl_engine_groupby",
    "adtl_engine_typed",
    "a2_last_not_null",
    "dedup_exact",
    "dedup_ngram",
    "dedup_minhash",
    "text_quality",
    "text_tfidf",
    "corpus_pack",
    "corpus_decontaminate",
    "corpus_unigram_logprob",
    "emb_kmeans",
    "w6_range_join",
    "ann_cosine_topk",
    # round-4 operators
    "tokenizer_bpe_merges",
    "tokenizer_bpe_segment",
    "graph_pagerank",
    "fuzzy_pairs_suppliers",
    "w11_scd2",
    "w12_transitions",
    "w13_anomaly",
    "sample_weighted",
    "corpus_merge_upsert",
    "emb_pca_project",
    "q4_order_priority",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q21_waiting_supplier",
    "q22_sales_opportunity",
    "dedup_minhash_recall",
    "text_hll_distinct",
    "quality_nb",
    "w7_asof_forward",
    "w8_asof_nearest",
    "dedup_semantic",
    "corpus_decontaminate_bloom",
    "text_ngram_topk",
    "emb_gram_matrix",
    "dedup_spans",
    "corpus_length_quantiles",
    "dedup_spans_apply",
    "text_bm25_topk",
    "text_normalize",
    "text_cms_counts",
    "corpus_bigram_logprob",
    "dedup_tfidf_cosine",
    "w9_funnel",
    "w10_retention",
    "olap_rollup",
    "olap_pivot",
    "emb_outliers",
    "emb_nearest_centroid",
    "corpus_length_filter",
    "corpus_zipf",
    "text_pmi_topk",
    "corpus_budget_by_source",
    "corpus_length_quantiles_hist",
    "pipeline_corpus_assemble",
    "corpus_pack_texts",
    "q5_local_supplier_volume",
    "q18_large_volume_customer",
    "privacy_k_anonymity",
    # dedup_keep_best: excluded like dedup_cluster — on the all-dupes 10x
    # corpus the SimHash pair set itself is pathological (every doc links
    # to ~40 near-identical copies), so the stress measures pair-set
    # explosion, not the representative-selection operator under test
    "sample_mixture",
    "corpus_budget_select",
    "corpus_shuffle",
    # round-5 operators
    "q2_best_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_parts",
    "q12_shipping_delay",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q20_excess_shipments",
    "tokenizer_bpe_train_local",
    "tokenizer_bpe_segment_model",
    "olap_cube",
    "olap_grouping_sets",
    "olap_unpivot",
    "join_salted_hot_key",
    "text_heavy_hitters",
    "ann_pq_topk",
    "ann_l2_topk",
    "sample_temperature",
    "graph_triangles",
    "multimodal_frame_sample",
    "w14_rank_functions",
    "layout_zorder_key",
    "pipeline_curriculum",
    "emb_jl_project",
    "w15_gapfill",
    "w16_gapfill_linear",
    # round-7 additions
    "corpus_dsir_select",
    "quality_psi_drift",
    "quality_ks_drift",
    "sketch_kmv_overlap",
    "multimodal_audio_features",
    "multimodal_image_resize",
    "text_containment",
    "graph_entity_resolution",
    # round-9 additions (retrieval / graph / mixture block)
    "retrieval_ql_topk",
    "retrieval_rrf_fuse",
    "retrieval_hybrid_rrf",
    "retrieval_rm3_expand",
    "retrieval_mmr_topk",
    "retrieval_ndcg_truncated",
    "graph_label_propagation",
    "graph_modularity",
    "text_textrank_keywords",
    "mixture_doremi_step",
    "corpus_heldout_ppl",
    "retrieval_snippet",
    # round-10 additions (PNG decode chain, WET extraction, paragraph
    # dedup, URL canonicalization)
    "multimodal_png_resize",
    "wet_extract",
    "text_paragraph_dedup",
    "web_url_normalize",
    "multimodal_jpeg_roundtrip",
    "multimodal_image_dhash",
    "multimodal_audio_vad",
    "web_tar_roundtrip",
    "multimodal_video_frames",
    "multimodal_adpcm_roundtrip",
    "multimodal_dhash_pairs",
    # round-11 additions (G.711 companding, real-container AVI sampling;
    # multimodal_dhash_recall excluded like the other recall gates — its
    # exact truth side measures the truth, dhash_pairs covers the operator)
    "multimodal_g711_roundtrip",
    "multimodal_video_frames_avi",
    "multimodal_avi_soundtrack_vad",
    "multimodal_image_resize_box",
    "multimodal_audio_resample",
    "sample_split_leakage_safe",
    # round-12 additions (codec/format gates: linear-in-payload codec
    # work inside Arrow batches, like the PNG/JPEG family)
    "multimodal_flac_roundtrip",
    "multimodal_mp3_probe",
    "web_warc_gz_roundtrip",
    "doc_pdf_extract",
    # preference/label-QC family: comparison-log-sized shuffles collapse
    # to item-sized state (BT) / rater-pair cells (kappa)
    "pref_bradley_terry",
    "pref_rater_kappa",
    "corpus_kn_bigram",
    "tokenizer_unigram_segment",
    "pref_krippendorff",
    "multimodal_id3_tags",
    "multimodal_audio_normalize",
    "web_robots_filter",
    "multimodal_image_augment",
    "quality_compression_ratio",
    "web_sitemap_parse",
    "web_sitemap_index",
    "web_frontier_compose",
    "web_wet_charset",
    "web_frontier_politeness",
    "pref_winrate_wilson",
    "text_script_profile",
    "text_nfc_normalize",
    "multimodal_audio_clipping",
    "multimodal_image_sharpness",
    "corpus_ngram_novelty",
    # round-14 additions
    "web_frontier_priority",
    "web_frontier_banded",
    "doc_pdf_extract_modern",
    "multimodal_jpeg_progressive",
    "multimodal_mp2_decode",
    # round-15 additions
    "multimodal_mp2_lsf",
    "multimodal_jpeg_411",
    "web_frontier_auto",
    "doc_pdf_encrypted",
    "doc_pdf_cid",
    "doc_pdf_encoding",
    # ann_pq_recall: excluded like the other recall gates' truth sides —
    # the exact-L2 all-pairs join dominates and measures the truth, not
    # the PQ operator (ann_pq_topk and ann_l2_topk cover both halves)
]


def build(spark, out: Path) -> None:
    for t in TABLES:
        dst = out / f"{t}.parquet"
        if dst.exists():
            continue
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if t in ID_OFFSETS:
            col, step = ID_OFFSETS[t]
            for i in range(COPIES):
                shifted = df.withColumn(col, F.col(col) + F.lit(i * step))
                shifted.coalesce(1).write.mode(
                    "append" if i else "overwrite"
                ).parquet(str(dst))
        else:
            df.write.mode("overwrite").parquet(str(dst))


SKEW_QUERIES = ["w5_asof_join", "w6_range_join", "w7_asof_forward", "w8_asof_nearest"]


def build_skew_events(spark, uniform: Path, out: Path) -> None:
    """Events-only skew twin of the uniform 10x dataset: identical rows,
    but every even event_id lands on user 0 — one key now owns ~half the
    corpus.  Deterministic (parity, not rand), so runs are repeatable."""
    dst = out / "events.parquet"
    if dst.exists():
        return
    df = spark.read.parquet(str(uniform / "events.parquet"))
    df.withColumn(
        "user_id",
        F.when(F.col("event_id") % 2 == 0, F.lit(0)).otherwise(F.col("user_id")),
    ).write.mode("overwrite").parquet(str(dst))


SKEW_SUPPLIER_QUERIES = ["q21_waiting_supplier", "graph_pagerank"]

# the two superlinear-output dedup operators: a duplicate-heavy AND skewed
# corpus is their worst case (one hot span / one hot vector owning half
# the rows), so they get their own skew twins
SKEW_DOC_QUERIES = ["dedup_spans_apply", "dedup_semantic"]


def build_skew_documents(spark, uniform: Path, out: Path) -> None:
    """Documents skew twin: every even doc_id gets ONE shared hot text, so
    a single 12-token span is duplicated across ~half the corpus — the
    duplicated-spans worst case (maximum span df, maximum rows carrying
    the flagged span into remove_spans' narrow cut)."""
    dst = out / "documents.parquet"
    if dst.exists():
        return
    df = spark.read.parquet(str(uniform / "documents.parquet"))
    hot = "the quick brown fox jumps over the lazy dog again and again"
    df.withColumn(
        "text",
        F.when(F.col("doc_id") % 2 == 0, F.lit(hot)).otherwise(F.col("text")),
    ).write.mode("overwrite").parquet(str(dst))


def build_skew_embeddings(spark, uniform: Path, out: Path) -> None:
    """Embeddings skew twin: every even vec_id gets ONE shared hot vector
    — half the corpus is byte-identical, the SemDeDup worst case.  The
    exact-vector collapse in semantic_dedup must keep this linear (one
    distinct-side row for the hot group, not (n/2)^2 candidate pairs)."""
    dst = out / "embeddings.parquet"
    if dst.exists():
        return
    df = spark.read.parquet(str(uniform / "embeddings.parquet"))
    dim = len(df.select("embedding").first()["embedding"])
    hot = F.array(*[F.lit(float((i % 7) + 1) / 7.0) for i in range(dim)])
    df.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 2 == 0, hot).otherwise(F.col("embedding")),
    ).write.mode("overwrite").parquet(str(dst))


def run_degenerate(spark, uniform: Path) -> None:
    """Constant-priority stress for the banded prefix-sum selector: the
    case where fixed priority-banding collapses to ONE window partition.
    Runs select_until_budget on the 10x documents with (a) the normal
    distinct-token priority and (b) a CONSTANT priority, and prints the
    ratio plus the adaptive band fan-out — near-1x ratio and fan-out >>1
    mean the id-sub-banding removed the single-partition window."""
    from adtl_spark.operators import sampling as SA
    from adtl_spark.operators import text as X

    docs = spark.read.parquet(str(uniform / "documents.parquet"))
    toks = X.tokens(F.col("text"))
    scored = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("priority"),
    )
    budget = 1_000_000
    variants = {
        "varying": scored,
        "constant": scored.withColumn("priority", F.lit(7).cast("long")),
    }
    times = {}
    for label, df in variants.items():
        sel = SA.select_until_budget(df, budget)
        sel.write.mode("overwrite").format("noop").save()  # warm
        t0 = time.time()
        SA.select_until_budget(df, budget).write.mode("overwrite").format(
            "noop"
        ).save()
        times[label] = time.time() - t0
        pband, iband = SA._derive_bands(df, "priority", "doc_id", None)
        fanout = df.select(pband.alias("p"), iband.alias("i")).distinct().count()
        print(f"select_until_budget[{label}]: {times[label]:.2f}s, "
              f"adaptive band fan-out {fanout}", flush=True)
    print(
        f"degenerate/varying ratio {times['constant'] / times['varying']:.2f}x",
        flush=True,
    )


def build_skew_lineitem(spark, uniform: Path, out: Path) -> None:
    """Lineitem skew twin: every even-l_orderkey lineitem is remapped to
    supplier 0 — one supplier now appears in ~half of all orders.  Hits
    q21's (order, supplier) aggregate and PageRank's hot-vertex edge
    join: the co-occurrence edge list gains a hub whose outgoing weight
    dwarfs every other vertex."""
    dst = out / "lineitem.parquet"
    if dst.exists():
        return
    df = spark.read.parquet(str(uniform / "lineitem.parquet"))
    df.withColumn(
        "l_suppkey",
        F.when(F.col("l_orderkey") % 2 == 0, F.lit(0)).otherwise(
            F.col("l_suppkey")
        ),
    ).write.mode("overwrite").parquet(str(dst))


def run_skew_profile(spark, uniform: Path, skew: Path) -> None:
    """The skew DETECTOR on the skew twin: skew_report(l_suppkey) must
    (a) cost the same on uniform and hot-key data — its state is the
    count-of-counts cells, which SHRINK under skew — and (b) make the
    hot key visible (max-share and Gini jump).  This is the tool a user
    runs before deciding the salting the other skew stresses measure."""
    from adtl_spark.operators.profile import skew_report

    build_skew_lineitem(spark, uniform, skew)
    for label, src in (("uniform-10x", uniform), ("hot-key-10x", skew)):
        li = spark.read.parquet(str(src / "lineitem.parquet"))
        skew_report(li, "l_suppkey").write.mode("overwrite").format(
            "noop"
        ).save()  # warm
        t0 = time.time()
        row = skew_report(li, "l_suppkey").collect()[0]
        dt = time.time() - t0
        print(
            f"skew_report[{label}]: {dt:.2f}s  max_share "
            f"{row['max_share_q6'] / 1e6:.3f}  top10 "
            f"{row['topk_share_q6'] / 1e6:.3f}  gini "
            f"{row['gini_q6'] / 1e6:.3f}  keys {row['n_keys']}",
            flush=True,
        )

    # the two-sided planner on the same twins: join_cardinality must
    # price lineitem x supplier exactly and surface the hot supplier as
    # max_key_pairs / top-k concentration BEFORE anyone runs the join
    from adtl_spark.operators.profile import join_cardinality

    sup = spark.read.parquet(str(uniform / "supplier.parquet"))
    for label, src in (("uniform-10x", uniform), ("hot-key-10x", skew)):
        li = spark.read.parquet(str(src / "lineitem.parquet"))
        join_cardinality(li, sup, "l_suppkey", "s_suppkey").write.mode(
            "overwrite"
        ).format("noop").save()  # warm
        t0 = time.time()
        row = join_cardinality(li, sup, "l_suppkey", "s_suppkey").collect()[0]
        dt = time.time() - t0
        print(
            f"join_cardinality[{label}]: {dt:.2f}s  join_rows "
            f"{row['join_rows']}  max_key_pairs {row['max_key_pairs']}  "
            f"top10_share {row['topk_share_q6'] / 1e6:.3f}",
            flush=True,
        )


def run_skew(spark, uniform: Path, skew: Path) -> None:
    run_skew_profile(spark, uniform, skew)
    build_skew_events(spark, uniform, skew)
    build_skew_lineitem(spark, uniform, skew)
    build_skew_documents(spark, uniform, skew)
    build_skew_embeddings(spark, uniform, skew)
    for t in ("orders", "supplier", "nation"):
        dst = skew / f"{t}.parquet"
        if not dst.exists():
            spark.read.parquet(str(uniform / f"{t}.parquet")).write.mode(
                "overwrite"
            ).parquet(str(dst))
    all_q = Q.all_queries()
    for name in SKEW_QUERIES + SKEW_SUPPLIER_QUERIES + SKEW_DOC_QUERIES:
        fn = all_q[name]
        fn(spark, str(uniform)).write.mode("overwrite").format("noop").save()  # warm
        t0 = time.time()
        fn(spark, str(uniform)).write.mode("overwrite").format("noop").save()
        base = time.time() - t0
        t0 = time.time()
        fn(spark, str(skew)).write.mode("overwrite").format("noop").save()
        hot = time.time() - t0
        print(
            f"{name}: uniform-10x {base:.2f}s -> hot-key-10x {hot:.2f}s "
            f"(skew ratio {hot / base:.1f}x)",
            flush=True,
        )


def run_hot_host(spark, uniform: Path) -> None:
    """Politeness scheduling under HOST SKEW — the stress the per-host
    FIFO semantics makes inherent: schedule_frontier numbers each
    host's queue with one window partition per host, so a monster host
    is ONE long partition by definition (operators/text.py docstring).
    Builds two URL relations from the 10x documents table: uniform
    (1024 hosts, ids spread evenly) and hot (the SAME total rows, but
    ~50% of URLs on one host).  Prints both times and the ratio — the
    number that tells a crawl operator when to sub-shard a monster
    host by path prefix (hand the host's URL set to schedule_frontier
    again with a path-derived pseudo-host) rather than queue it whole."""
    from adtl_spark.operators.text import schedule_frontier

    docs = spark.read.parquet(str(uniform / "documents.parquet"))
    # 100 URLs per document (~5M total at the 10x clone): the hot case
    # must put MILLIONS of rows in one window partition to measure the
    # long pole rather than scheduler noise
    urls = docs.select(
        F.posexplode(F.array_repeat(F.col("doc_id"), 100)).alias("k", "d")
    ).select((F.col("d") * 100 + F.col("k")).alias("uid"))
    d = F.col("uid")
    uniform_urls = urls.select(
        F.concat(
            F.lit("http://h"), (d % 1024).cast("string"),
            F.lit(".test/p/"), d.cast("string"),
        ).alias("url")
    )
    hot_host = F.when(d % 2 == 0, F.lit(0)).otherwise(d % 1024)
    hot_urls = urls.select(
        F.concat(
            F.lit("http://h"), hot_host.cast("string"),
            F.lit(".test/p/"), d.cast("string"),
        ).alias("url")
    )
    times = {}
    variants = (
        ("uniform-hosts", uniform_urls, {}),
        ("hot-host", hot_urls, {}),
        ("hot-host-banded", hot_urls, {"banded_numbering": True}),
        # auto mode pays one aggregate-only probe job and then picks
        # the plan the data calls for: plain below the threshold,
        # banded above it
        ("uniform-hosts-auto", uniform_urls, {"banded_numbering": "auto"}),
        ("hot-host-auto", hot_urls, {"banded_numbering": "auto"}),
    )
    for label, rel, kw in variants:
        schedule_frontier(rel, **kw).write.mode("overwrite").format(
            "noop"
        ).save()  # warm
        t0 = time.time()
        schedule_frontier(rel, **kw).write.mode("overwrite").format(
            "noop"
        ).save()
        times[label] = time.time() - t0
        print(f"schedule_frontier[{label}]: {times[label]:.2f}s", flush=True)
    print(
        "hot-host/uniform ratio "
        f"{times['hot-host'] / times['uniform-hosts']:.2f}x "
        "(one window partition holds ~50% of rows — the per-host FIFO "
        "long pole); banded/plain hot-host ratio "
        f"{times['hot-host-banded'] / times['hot-host']:.2f}x "
        "(banded_numbering replaces the unbounded window with ~3 "
        "bounded shuffles — exact same fetch plan); auto overhead: "
        f"uniform {times['uniform-hosts-auto'] / times['uniform-hosts']:.2f}x "
        f"of plain, hot {times['hot-host-auto'] / times['hot-host-banded']:.2f}x "
        "of banded (the skew-probe aggregate)",
        flush=True,
    )


def main() -> None:
    argv = sys.argv[1:]
    skew_mode = "--skew" in argv
    degen_mode = "--degenerate" in argv
    skew_profile_mode = "--skew-profile" in argv
    hot_host_mode = "--hot-host" in argv
    argv = [a for a in argv if a not in ("--skew", "--degenerate", "--skew-profile", "--hot-host")]
    out = Path(argv[0] if argv else "/tmp/adtl_stress_10x")
    only = set(argv[1:])
    spark = get_spark("scale_stress")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    build(spark, out)
    if degen_mode:
        run_degenerate(spark, out)
        return
    if hot_host_mode:
        run_hot_host(spark, out)
        return
    if skew_profile_mode:
        run_skew_profile(spark, out, Path(str(out) + "_skew"))
        return
    if skew_mode:
        run_skew(spark, out, Path(str(out) + "_skew"))
        return

    all_q = Q.all_queries()
    for name in QUERIES:
        if only and name not in only:
            continue
        fn = all_q[name]
        fn(spark, SRC).write.mode("overwrite").format("noop").save()  # warm
        t0 = time.time()
        fn(spark, SRC).write.mode("overwrite").format("noop").save()
        base = time.time() - t0
        t0 = time.time()
        fn(spark, str(out)).write.mode("overwrite").format("noop").save()
        big = time.time() - t0
        print(
            f"{name}: sf0.1 {base:.2f}s -> 10x {big:.2f}s "
            f"(ratio {big / base:.1f}x)",
            flush=True,
        )


if __name__ == "__main__":
    main()
