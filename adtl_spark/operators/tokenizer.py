"""Distributed BPE tokenizer training (merge learning) over a corpus.

The classic byte-pair-encoding trainer loop — count adjacent symbol pairs,
merge the most frequent, repeat — re-expressed for Spark's execution
model.  The key scale move is the same one real tokenizer trainers
(SentencePiece, HF tokenizers) make: train on the WORD-FREQUENCY table,
not the raw corpus.  A 100 TB corpus collapses to a |vocab|-row
(word, count) relation after one map-side-combined aggregation; every
merge iteration then scans only that table:

    per iteration:  vocab scan (narrow)  ->  pair-count agg (small
    shuffle, map-side combine)  ->  top-1 collect (ONE row — a model
    parameter, the legitimate kind of driver collect)  ->  narrow
    literal substitution folded into the next scan.

Cross-engine determinism (the DuckDB oracle unrolls the same loop as a
CTE chain):

- words come from the repo-wide tokenizer contract (text.tokens);
- symbols are space-joined inside a word ('h e l l o'), so a merge
  substitution is a plain ``replace`` of ``' a b '`` with ``' ab '`` on
  the space-padded string — symbols never contain spaces, so a match
  always aligns to whole symbols;
- ``replace`` is a single left-to-right non-overlapping pass in BOTH
  engines.  One pass misses every second occurrence in an overlapping
  run (``a a a a`` -> ``aa a a``), so each merge applies TWO passes —
  identical, documented semantics both sides ("BPE-ish": a bounded
  number of passes instead of SentencePiece's fixpoint loop; runs of
  five or more identical symbols may stay partially merged);
- the winning pair breaks ties by (count DESC, symbol_a ASC, symbol_b
  ASC) — total order, deterministic in both engines.

The reference has no tokenizer tooling (row-at-a-time spec interpreter);
this is part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adtl_spark.operators.text import tokens


def _spaced(col):
    """'hello' -> 'h e l l o' (initial one-symbol-per-char state)."""
    return F.trim(F.regexp_replace(col, "(.)", "$1 "))


def _merge_once(col, a: str, b: str):
    """Two single-pass replaces of the pair (a, b) on a spaced string."""
    pat = F.lit(f" {a} {b} ")
    rep = F.lit(f" {a}{b} ")
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    once = F.replace(padded, pat, rep)
    return F.trim(F.replace(once, pat, rep))


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges; returns the merge table
    (step, s1, s2, cnt) — the model a BPE segmenter replays in order.

    ``cnt`` is the corpus-wide frequency of the winning pair at the time
    it was chosen (weighted by word frequency)."""
    spark: SparkSession = docs.sparkSession
    vocab = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(_spaced(F.col("word")).alias("w"), "cnt")
    )
    # the loop re-scans vocab once per merge; persist the aggregated form
    # so the corpus itself is tokenized exactly once
    vocab = vocab.persist()
    try:
        merges: list[tuple[int, str, str, int]] = []
        w = F.col("w")
        for step in range(1, n_merges + 1):
            arr = F.split(w, " ")
            pairs = (
                vocab.select(
                    F.explode(
                        F.arrays_zip(
                            F.slice(arr, 1, F.size(arr) - 1).alias("s1"),
                            F.slice(arr, 2, F.size(arr) - 1).alias("s2"),
                        )
                    ).alias("p"),
                    F.col("cnt"),
                )
                .groupBy(F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
                .agg(F.sum("cnt").alias("pcnt"))
                .orderBy(F.desc("pcnt"), F.asc("s1"), F.asc("s2"))
                .limit(1)
                .collect()
            )
            if not pairs:
                break
            top = pairs[0]
            merges.append((step, top["s1"], top["s2"], int(top["pcnt"])))
            w = _merge_once(w, top["s1"], top["s2"])
        return spark.createDataFrame(
            merges, "step INT, s1 STRING, s2 STRING, cnt BIGINT"
        )
    finally:
        vocab.unpersist()


def bpe_segment(
    docs: DataFrame,
    merge_rows: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to a document set: per-document BPE-ish
    segmentation replaying the merges in order (zero-shuffle narrow map).
    Output: (id_col, n_words, n_pieces) — the compression the tokenizer
    achieves, the number a data pipeline actually budgets on."""
    toks = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    )
    w = _spaced(F.col("word"))
    for a, b in merge_rows:
        w = _merge_once(w, a, b)
    return (
        toks.select(F.col(id_col), F.size(F.split(w, " ")).alias("np"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("np").cast("long").alias("n_pieces"),
        )
    )


def bpe_merges_oracle_sql(source_sql: str, n_merges: int = 5) -> str:
    """DuckDB twin of :func:`bpe_merges`: the same loop unrolled as a CTE
    chain (w0 -> p1/m1 -> w1 -> ... ), same two-pass replace, same
    tie-break.  Every CTE is MATERIALIZED: the chain references w{i-1}
    from three places (p{i}, and twice via m{i} in w{i}) and DuckDB's
    default inlining re-evaluates each reference — exponential (~3^n)
    blowup without materialization."""

    def pair_cte(i: int) -> str:
        return f"""
    p{i} AS MATERIALIZED (
      SELECT s1, s2, CAST(sum(cnt) AS BIGINT) AS pcnt
      FROM (
        SELECT unnest(arr[1:len(arr)-1]) AS s1,
               unnest(arr[2:len(arr)]) AS s2,
               cnt
        FROM (SELECT string_split(w, ' ') AS arr, cnt FROM w{i - 1})
      )
      GROUP BY s1, s2
    ),
    m{i} AS MATERIALIZED (
      SELECT {i} AS step, s1, s2, pcnt
      FROM p{i} ORDER BY pcnt DESC, s1 ASC, s2 ASC LIMIT 1
    )"""

    def apply_cte(i: int) -> str:
        pat = f"(SELECT ' ' || s1 || ' ' || s2 || ' ' FROM m{i})"
        rep = f"(SELECT ' ' || s1 || s2 || ' ' FROM m{i})"
        return f"""
    w{i} AS MATERIALIZED (
      SELECT trim(replace(replace(' ' || w || ' ', {pat}, {rep}), {pat}, {rep})) AS w,
             cnt
      FROM w{i - 1}
    )"""

    ctes = [
        f"""
    w0 AS MATERIALIZED (
      SELECT trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS w,
             cnt
      FROM (
        SELECT word, count(*) AS cnt
        FROM (
          SELECT unnest(
            list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')
          ) AS word
          FROM ({source_sql})
        )
        GROUP BY word
      )
    )"""
    ]
    for i in range(1, n_merges + 1):
        ctes.append(pair_cte(i))
        if i < n_merges:
            ctes.append(apply_cte(i))
    unions = "\n      UNION ALL ".join(
        f"SELECT step, s1, s2, pcnt AS cnt FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    return (
        "WITH" + ",".join(ctes) + f"\n    SELECT CAST(step AS INT) AS step, s1, s2, cnt FROM ({unions}) ORDER BY step"
    )


def bpe_segment_oracle_sql(source_sql: str, n_merges: int = 5) -> str:
    """DuckDB twin of bpe_merges + bpe_segment composed: learn the merges
    with the same unrolled CTE chain, then apply all of them (two-pass
    replace each, via scalar subqueries on m1..mN) to every document's
    words and count the resulting pieces."""
    # reuse the merge-learning chain: everything up to m{n_merges},
    # including the apply CTEs that feed later iterations
    learn = bpe_merges_oracle_sql(source_sql, n_merges)
    ctes = learn.split("\n    SELECT CAST(step AS INT)")[0]  # "WITH w0 ... )"
    expr = "' ' || w || ' '"
    for i in range(1, n_merges + 1):
        pat = f"(SELECT ' ' || s1 || ' ' || s2 || ' ' FROM m{i})"
        rep = f"(SELECT ' ' || s1 || s2 || ' ' FROM m{i})"
        expr = f"' ' || trim(replace(replace({expr}, {pat}, {rep}), {pat}, {rep})) || ' '"
    return (
        ctes
        + f""",
    docw AS MATERIALIZED (
      SELECT doc_id,
             trim(regexp_replace(word, '(.)', '\\1 ', 'g')) AS w
      FROM (
        SELECT doc_id, unnest(
          list_filter(string_split_regex(lower(text), '\\s+'), t -> t != '')
        ) AS word
        FROM ({source_sql})
      )
    ),
    seg AS (
      SELECT doc_id, trim({expr}) AS w FROM docw
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(len(string_split(w, ' '))) AS BIGINT) AS n_pieces
    FROM seg GROUP BY doc_id ORDER BY doc_id
    """
    )
