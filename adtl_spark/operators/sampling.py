"""Sampling and splitting operators for training-data pipelines.

Corpus curation needs reproducible subsets: a documentation sample, a
held-out eval split, k exemplars per language/source for inspection.
``df.sample()`` draws from a per-partition RNG — results change with
partitioning, retries, and engine, and cannot be oracled.  Everything here
derives the keep/assign decision from the portable 60-bit md5 hash of the
row's OWN key (``dedup.md5_60``), which buys three properties at once:

- deterministic across runs, task retries, partition layouts and engines
  (every operator has an exact DuckDB twin);
- append-stable: adding documents to the corpus never changes the
  decision for existing documents (hash depends only on the row);
- plan-friendly: Bernoulli sampling and split assignment are narrow
  expressions — no shuffle, no RNG state, evaluated next to the scan.

Salts namespace the hash so a sample and a split drawn from the same
corpus are independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from adtl_spark.operators.dedup import md5_60, md5_60_sql

# md5_60 yields 60-bit non-negative values; thresholds scale against this
HASH_SPACE = 1 << 60


def _keyed_hash(key: Column, salt: str) -> Column:
    return md5_60(F.concat_ws("|", F.lit(salt), key.cast("string")))


def _keyed_hash_sql(key_expr: str, salt: str) -> str:
    "DuckDB twin of _keyed_hash"
    return md5_60_sql(f"concat_ws('|', '{salt}', CAST({key_expr} AS VARCHAR))")


def hash_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose salted key hash
    falls in the first ``fraction`` of the hash space.

    A narrow filter — no shuffle, no RNG, survives predicate pushdown; at
    scale the sample IS the scan filter, so a 1% sample reads ~1% of
    row-group data wherever the layout allows skipping."""
    threshold = int(fraction * HASH_SPACE)
    return df.filter(_keyed_hash(F.col(key_col), salt) < F.lit(threshold))


def hash_sample_where_sql(fraction: float, key_expr: str, salt: str = "sample") -> str:
    "DuckDB WHERE predicate twin of hash_sample"
    threshold = int(fraction * HASH_SPACE)
    return f"{_keyed_hash_sql(key_expr, salt)} < {threshold}"


def train_test_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Label every row with a split name ('train'/'valid'/'test'/...) by
    hash bucket; weights are normalized.  Deterministic and append-stable —
    a document never migrates between splits as the corpus grows, which is
    the property that keeps eval sets uncontaminated across corpus
    versions.  Narrow map: no shuffle, no RNG."""
    total = float(sum(weights.values()))
    expr: Column | None = None
    acc = 0.0
    names = list(weights)
    h = _keyed_hash(F.col(key_col), salt)
    for name in names[:-1]:
        acc += weights[name] / total
        bound = F.lit(int(acc * HASH_SPACE))
        expr = F.when(h < bound, F.lit(name)) if expr is None else expr.when(h < bound, F.lit(name))
    label = F.lit(names[0]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", label)


def train_test_split_case_sql(
    weights: dict[str, float], key_expr: str, salt: str = "split"
) -> str:
    "DuckDB CASE expression twin of train_test_split's split column"
    total = float(sum(weights.values()))
    names = list(weights)
    if len(names) == 1:
        return f"'{names[0]}'"
    h = _keyed_hash_sql(key_expr, salt)
    acc = 0.0
    whens = []
    for name in names[:-1]:
        acc += weights[name] / total
        whens.append(f"WHEN {h} < {int(acc * HASH_SPACE)} THEN '{name}'")
    return "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    k: int,
    key_col: str = "doc_id",
    salt: str = "strat",
) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, chosen by hash order
    (deterministic "random" exemplars; ties impossible at distinct keys).

    Two-phase selection instead of a rank window: each scan partition keeps
    its local k best keys per stratum map-side, so only
    ``k * partitions_per_stratum`` candidate rows shuffle — a rank window
    would shuffle and sort the ENTIRE table to then discard all but k rows
    per stratum.  The winning key set (|strata| * k rows) is broadcast back
    to select the full rows without a second shuffle."""
    h = _keyed_hash(F.col(key_col), salt)
    keyed = df.select(
        F.col(strata_col).alias("__stratum"),
        F.struct(h.alias("h"), F.col(key_col).alias("key")).alias("__sk"),
        F.spark_partition_id().alias("__pid"),
    )
    partial = keyed.groupBy("__stratum", "__pid").agg(
        F.slice(F.sort_array(F.collect_list("__sk")), 1, k).alias("top")
    )
    winners = (
        partial.groupBy("__stratum")
        .agg(
            F.slice(F.sort_array(F.flatten(F.collect_list("top"))), 1, k).alias("top")
        )
        .select(F.explode("top").alias("sk"))
        .select(F.col("sk.key").alias(key_col))
    )
    return df.join(F.broadcast(winners), key_col, "left_semi")


def stratified_sample_oracle_sql(
    table: str,
    strata_col: str,
    k: int,
    key_col: str = "doc_id",
    salt: str = "strat",
    select: str = "*",
) -> str:
    """DuckDB twin of stratified_sample: rank by the same salted hash within
    each stratum (the naive window form — the Spark side's two-phase
    selection is an execution strategy, not a semantic change)."""
    h = _keyed_hash_sql(key_col, salt)
    return f"""
    SELECT {select} FROM (
      SELECT *, row_number() OVER (
        PARTITION BY {strata_col} ORDER BY {h}, {key_col}
      ) AS __rn
      FROM {table}
    ) WHERE __rn <= {k}
    """
