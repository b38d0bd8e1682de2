"""Fuzzy string matching (entity resolution) via deletion-neighborhood
blocking — the SymSpell technique turned into a join strategy.

The naive edit-distance self-join is O(n^2) levenshtein calls — the
oracle states it that way because DuckDB can afford it at test scale.
This side is the shape that survives 100 TB: every string generates its
deletion neighborhood (itself + each single-character deletion, len+1
keys), candidate pairs are an EQUI-join on those keys (shuffle by key,
no cross product), and only candidates pay the exact levenshtein
verification.  Two strings within edit distance 1 — one substitution,
insertion, or deletion — always share at least one deletion key, so the
blocking has no false negatives at distance 1; blowup is bounded by
(string length) keys per row, not by the table size.

Both engines ship the same ``levenshtein``; candidate verification and
the naive oracle agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deletion_keys(col, max_len: int = 64):
    """Array of blocking keys: the string itself plus every
    single-character deletion (positions capped at ``max_len``)."""
    return F.array_distinct(
        F.concat(
            F.array(col),
            F.transform(
                F.sequence(F.lit(1), F.least(F.length(col), F.lit(max_len))),
                lambda i: F.concat(
                    F.substr(col, F.lit(1), i - 1),
                    F.substr(col, i + 1, F.length(col)),
                ),
            ),
        )
    )


def fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_dist: int = 1,
    max_len: int = 64,
) -> DataFrame:
    """All pairs (id_a, id_b, name_a, name_b, dist) with
    levenshtein(name_a, name_b) <= max_dist and id_a < id_b, found by
    deletion-neighborhood blocking + exact verification.

    Completeness bound: the distance-1 no-false-negatives guarantee holds
    for strings up to ``max_len + 1`` characters — deletion positions are
    capped at ``max_len``, so a single edit strictly past that position
    in a longer string can fall outside the shared-key neighborhood.
    Raise ``max_len`` (cost: that many keys per row) when keying strings
    longer than 65 chars.  For max_dist > 1 the blocking is a
    recall-oriented prefilter and the contract is 'distance-1-complete'.
    """
    # two-step select: aliasing and exploding the same source column in
    # one projection trips lateral-alias resolution when name_col == "name"
    named = df.select(F.col(id_col).alias("id"), F.col(name_col).alias("name"))
    keyed = named.select(
        "id", "name", F.explode(deletion_keys(F.col("name"), max_len)).alias("k")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, "k")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        cand.withColumn(
            "dist", F.levenshtein(F.col("name_a"), F.col("name_b"))
        )
        .filter(F.col("dist") <= max_dist)
        .orderBy("id_a", "id_b")
    )


def fuzzy_pairs_oracle_sql(
    source_sql: str, id_col: str, name_col: str, max_dist: int = 1
) -> str:
    """DuckDB twin stated the textbook way: quadratic self-join +
    levenshtein filter.  Affordable at oracle scale; deliberately NOT the
    executable strategy (see module docstring)."""
    return f"""
    WITH t AS (SELECT {id_col} AS id, {name_col} AS name FROM ({source_sql}))
    SELECT a.id AS id_a, b.id AS id_b,
           a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS INT) AS dist
    FROM t a JOIN t b ON a.id < b.id
    WHERE levenshtein(a.name, b.name) <= {max_dist}
    ORDER BY id_a, id_b
    """


def entity_resolution_oracle_sql(
    source_sql: str,
    id_col: str,
    name_col: str,
    max_dist: int = 1,
    block_col: str | None = None,
) -> str:
    """DuckDB twin of the fuzzy-join -> connected-components entity
    resolution pipeline (queries.graph_entity_resolution): naive
    quadratic levenshtein pairs (restricted to equal ``block_col`` when
    given — the blocking key), recursive-CTE transitive closure with
    per-node minimum as the entity label, singletons re-attached as
    their own entity."""
    blk_sel = f", {block_col} AS blk" if block_col else ""
    blk_cond = " AND a.blk = b.blk" if block_col else ""
    return f"""
    WITH RECURSIVE t AS (
      SELECT {id_col} AS id, {name_col} AS name{blk_sel} FROM ({source_sql})
    ),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM t a JOIN t b ON a.id < b.id{blk_cond}
      WHERE levenshtein(a.name, b.name) <= {max_dist}
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
    ),
    canon AS (
      SELECT src AS id, least(src, min(dst)) AS entity FROM reach GROUP BY src
    )
    SELECT CAST(COALESCE(canon.entity, t.id) AS BIGINT) AS entity_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(max(t.id) AS BIGINT) AS max_member
    FROM t LEFT JOIN canon ON canon.id = t.id
    GROUP BY 1
    ORDER BY entity_id
    """
