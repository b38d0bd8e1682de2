"""Key-distribution diagnostics: the numbers you read before choosing a
partitioning/salting strategy for a join or aggregation key.

``skew_report`` collapses a key column to its count-of-counts cells
(frequency f -> how many keys occur f times) and derives every statistic
from that tiny relation: the corpus never sorts, and the only
single-partition window runs over the cells (bounded by the number of
DISTINCT frequency values — a few hundred even at petabyte scale, since
frequencies concentrate under any realistic distribution).

Everything is exact integer arithmetic until the final quantized floats
(the repo's cross-engine float protocol): rank sums for Gini come from
closed-form runs over the cells, entropy sums quantized per-key terms.

The reference has no profiling operators (row-at-a-time interpreter,
/root/reference/src/adtl/__init__.py); this module is extension surface
alongside tools/dataset_report.py (which profiles whole tables
driver-side — skew_report is the in-plan, oracle-checked operator form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def skew_report(df: DataFrame, key: Column | str, top_k: int = 10) -> DataFrame:
    """One-row skew diagnostic for ``key``:

    - ``n_rows`` / ``n_keys`` — exact totals;
    - ``max_share_q6`` / ``topk_share_q6`` — share of the heaviest key
      and of the ``top_k`` heaviest together (the "how hot is the hot
      key" number that decides salting);
    - ``entropy_q6`` — Shannon entropy of the key distribution in nats
      (log of the effective key count);
    - ``gini_q6`` — Gini coefficient of the key-frequency distribution
      (0 = uniform keys, ->1 = one key dominates).

    Shapes: one map-side-combinable count per key, then a count-of-counts
    aggregate; Gini rank sums use the closed form over frequency runs
    (keys sharing frequency f occupy a contiguous ascending-rank run, so
    ``sum(rank*count)`` for the run is ``f*(m*r0 + m*(m-1)/2)`` — exact
    BIGINT).  Top-k is a TakeOrderedAndProject over the key counts.
    """
    key = F.col(key) if isinstance(key, str) else key
    counts = df.groupBy(key.alias("k")).agg(F.count(F.lit(1)).alias("c"))
    cells = counts.groupBy("c").agg(F.count(F.lit(1)).alias("m"))

    from pyspark.sql import Window

    # ascending-frequency rank runs: keys with smaller counts rank first;
    # r0 = 1 + (number of keys in cells with smaller c)
    w_prev = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, -1)
    ranked = cells.withColumn(
        "r0", F.lit(1) + F.coalesce(F.sum("m").over(w_prev), F.lit(0))
    )
    # per-cell exact contributions
    contrib = ranked.select(
        "c",
        "m",
        (F.col("c") * F.col("m")).alias("rows_in_cell"),
        (
            F.col("c")
            * (
                F.col("m") * F.col("r0")
                + F.expr("(m * (m - 1)) DIV 2")
            )
        ).cast("long").alias("rank_sum"),
    )
    totals = contrib.agg(
        F.coalesce(F.sum("rows_in_cell"), F.lit(0)).cast("long").alias("n_rows"),
        F.coalesce(F.sum("m"), F.lit(0)).cast("long").alias("n_keys"),
        F.coalesce(F.sum("rank_sum"), F.lit(0)).cast("long").alias("s_rank"),
    )
    top = counts.orderBy(F.desc("c"), F.asc("k")).limit(top_k)
    top_stats = top.agg(
        F.coalesce(F.max("c"), F.lit(0)).cast("long").alias("max_c"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("topk_c"),
    )
    # entropy from the cells: sum m * (c/N) * ln(N/c).  Floating sums are
    # partition-order-dependent, so the per-KEY term is quantized to an
    # integer at 1e-7 FIRST (the repo protocol: floor(x*1e7+0.5)) and the
    # exact integer products m*t sum in any order; the q6 output divides
    # back by 10 with round-half-up.  Accuracy cost: <= n_keys * 5e-8
    # absolute — a diagnostic-grade bias, and bit-identical both engines.
    ent_cells = cells.crossJoin(F.broadcast(totals.select("n_rows")))
    t_q7 = F.floor(
        (F.col("c").cast("double") / F.col("n_rows"))
        * F.log(F.col("n_rows").cast("double") / F.col("c"))
        * 10000000
        + F.lit(0.5)
    ).cast("long")
    ent = ent_cells.agg(
        F.coalesce(F.sum(F.col("m") * t_q7), F.lit(0)).cast("long").alias("h_q7")
    )
    joined = totals.crossJoin(F.broadcast(top_stats)).crossJoin(F.broadcast(ent))
    n = F.col("n_rows").cast("double")
    k_ = F.col("n_keys").cast("double")
    gini = (
        F.lit(2.0) * F.col("s_rank").cast("double") / (k_ * n)
        - (k_ + F.lit(1.0)) / k_
    )

    def q6(x: Column) -> Column:
        return F.floor(x * 1000000 + F.lit(0.5)).cast("long")

    return joined.select(
        "n_rows",
        "n_keys",
        F.when(F.col("n_rows") > 0, q6(F.col("max_c").cast("double") / n))
        .otherwise(F.lit(None))
        .alias("max_share_q6"),
        F.when(F.col("n_rows") > 0, q6(F.col("topk_c").cast("double") / n))
        .otherwise(F.lit(None))
        .alias("topk_share_q6"),
        F.when(
            F.col("n_rows") > 0, F.expr("(h_q7 + 5) DIV 10")
        ).otherwise(F.lit(None)).alias("entropy_q6"),
        F.when(F.col("n_keys") > 0, q6(gini)).otherwise(F.lit(None)).alias(
            "gini_q6"
        ),
    )


def skew_report_oracle_sql(
    source_sql: str, key_expr: str, top_k: int = 10
) -> str:
    """DuckDB replay twin of :func:`skew_report` — same cells, same
    closed-form rank sums, same float op order."""
    return f"""
    WITH counts AS (
      SELECT {key_expr} AS k, count(*) AS c FROM ({source_sql}) GROUP BY 1
    ),
    cells AS (SELECT c, count(*) AS m FROM counts GROUP BY c),
    ranked AS (
      SELECT c, m,
             1 + CAST(coalesce(sum(m) OVER (ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS r0
      FROM cells
    ),
    contrib AS (
      SELECT c, m, c * m AS rows_in_cell,
             CAST(c * (m * r0 + (m * (m - 1)) // 2) AS BIGINT) AS rank_sum
      FROM ranked
    ),
    totals AS (
      SELECT CAST(coalesce(sum(rows_in_cell), 0) AS BIGINT) AS n_rows,
             CAST(coalesce(sum(m), 0) AS BIGINT) AS n_keys,
             CAST(coalesce(sum(rank_sum), 0) AS BIGINT) AS s_rank
      FROM contrib
    ),
    top AS (
      SELECT CAST(coalesce(max(c), 0) AS BIGINT) AS max_c,
             CAST(coalesce(sum(c), 0) AS BIGINT) AS topk_c
      FROM (SELECT c FROM counts ORDER BY c DESC, k ASC LIMIT {top_k})
    ),
    ent AS (
      SELECT CAST(coalesce(sum(
               m * CAST(floor(
                 (CAST(c AS DOUBLE) / n_rows)
                   * ln(CAST(n_rows AS DOUBLE) / c)
                   * 10000000 + 0.5) AS BIGINT)
             ), 0) AS BIGINT) AS h_q7
      FROM cells CROSS JOIN totals
    )
    SELECT n_rows, n_keys,
           CASE WHEN n_rows > 0 THEN CAST(floor(CAST(max_c AS DOUBLE) / CAST(n_rows AS DOUBLE) * 1000000 + 0.5) AS BIGINT) END AS max_share_q6,
           CASE WHEN n_rows > 0 THEN CAST(floor(CAST(topk_c AS DOUBLE) / CAST(n_rows AS DOUBLE) * 1000000 + 0.5) AS BIGINT) END AS topk_share_q6,
           CASE WHEN n_rows > 0 THEN (h_q7 + 5) // 10 END AS entropy_q6,
           CASE WHEN n_keys > 0 THEN CAST(floor(
             (2.0 * CAST(s_rank AS DOUBLE) / (CAST(n_keys AS DOUBLE) * CAST(n_rows AS DOUBLE))
              - (CAST(n_keys AS DOUBLE) + 1.0) / CAST(n_keys AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) END AS gini_q6
    FROM totals CROSS JOIN top CROSS JOIN ent
    """
