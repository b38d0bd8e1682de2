"""Reusable corpus-cleaning pipeline (the CLI-facing form of the
``pipeline_corpus_clean`` gate query): quality filter -> repetition
filter -> MinHash near-dup removal, as one lazily-composed DataFrame DAG
plus an eager per-stage report.

The stages are exactly the oracle-gated operators
(text.quality_score / text.repetition_stats / dedup.dedup_minhash_lsh);
this module only composes them and counts survivors, so the CLI path and
the correctness-gated path cannot drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from adtl_spark.operators import dedup as D
from adtl_spark.operators import text as X


def corpus_clean(
    docs: DataFrame,
    min_quality: float = 0.5,
    max_top_bigram_frac: float = 0.2,
    minhash_k: int = 16,
    minhash_bands: int = 4,
    threshold: float = 0.6,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, dict[str, int]]:
    """Clean a document corpus; returns (clean_df, report).

    The report counts documents surviving each stage.  The input and
    post-filter counts ride on ``Observation``s — metrics collected as a
    side effect of the ONE materializing action, not separate count()
    jobs re-running each stage (two fewer corpus passes than the naive
    form; the same trick `dedup.cluster_pairs` uses for zero-job
    convergence checks).  The returned frame is the cleaned corpus with
    the original columns.
    """
    from pyspark.sql import Observation

    obs_in = Observation("corpus_clean_input")
    obs_kept = Observation("corpus_clean_kept")
    docs = docs.observe(obs_in, F.count(F.lit(1)).alias("n"))
    good = X.quality_score(docs, text_col).filter(
        F.col("quality") >= min_quality
    )
    rep_ok = X.repetition_stats(docs, text_col).filter(
        F.col("top_bigram_frac") <= max_top_bigram_frac
    )
    kept = (
        docs.join(good.select(id_col), id_col)
        .join(rep_ok.select(id_col), id_col)
        .observe(obs_kept, F.count(F.lit(1)).alias("n"))
        .persist()
    )
    pairs = D.dedup_minhash_lsh(
        kept,
        k=minhash_k,
        bands=minhash_bands,
        threshold=threshold,
        n=shingle_n,
        text_col=text_col,
        id_col=id_col,
    )
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    clean = kept.join(drop, id_col, "left_anti")
    report: dict[str, int] = {"after_near_dedup": clean.count()}
    report["input"] = int(obs_in.get["n"])
    report["after_quality_and_repetition"] = int(obs_kept.get["n"])
    kept.unpersist()
    return clean, report
