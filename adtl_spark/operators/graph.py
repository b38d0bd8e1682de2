"""Graph analytics over relational co-occurrence: weighted PageRank.

Complements the connected-components operator (dedup.cluster_pairs) with
the other classic iterative graph computation.  The edge list is derived
relationally (suppliers co-appearing in an order), and each PageRank
iteration is the textbook distributed shape — one join of the edge list
with the current rank vector on the source key, one aggregation by the
destination key:

    contributions = edges JOIN ranks ON src   (shuffle on src — ranks and
                                               edges co-partition after
                                               the first iteration)
    ranks'        = base + damping * SUM(contribution) GROUP BY dst

The rank vector is |V| rows; AQE broadcasts it when small, and at
billion-edge scale the join degrades gracefully to a co-partitioned
shuffle join — the same execution shape GraphX/Pregel lowers to.

Cross-engine determinism: ranks are carried as EXACT integers (1e9-scaled
BIGINTs).  A per-edge contribution is floor(damping * rank_q * weight /
outdeg): the numerator stays below 2^53 (exact in double), the divide is
a portable double op, and the floor re-enters integer land — so the
per-vertex SUM is order-independent BIGINT arithmetic and the DuckDB
oracle (the same loop unrolled as MATERIALIZED CTEs) matches bit for bit.

No dangling-mass redistribution: isolated vertices hold the base rank
(1-d), documented semantics on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000_000


def cooccurrence_edges(
    pairs: DataFrame, group_col: str, member_col: str
) -> DataFrame:
    """Undirected co-occurrence edges from a (group, member) relation:
    weight = number of groups where both members appear.  Emitted in both
    directions (src, dst, w) so PageRank consumes it directly.

    Scale shape: the self-join is per-group (equi-join on the group key),
    so the expansion is bounded by the per-group membership count squared
    — for order/supplier co-occurrence that is a handful, never a
    corpus-sized blowup.  Distinct (group, member) first so duplicate
    lineitems do not inflate weights."""
    m = pairs.select(
        F.col(group_col).alias("g"), F.col(member_col).alias("m")
    ).distinct()
    a, b = m.alias("a"), m.alias("b")
    return (
        a.join(b, "g")
        .filter(F.col("a.m") != F.col("b.m"))
        .groupBy(
            F.col("a.m").alias("src"), F.col("b.m").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
    )


def pagerank(
    edges: DataFrame,
    vertices: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank over (src, dst, w) edges for the given vertex
    set — ``iters`` exact-integer iterations (see module docstring).

    Output: (v, pagerank) for every vertex, pagerank rounded to 4
    decimals, ordered by rank descending then vertex id."""
    base_q = int(round((1.0 - damping) * PR_SCALE))
    # persist the JOINED (edge, outdeg) relation, not the bare edge list:
    # every iteration scans ew, and caching only edges would re-run the
    # outdegree aggregation + join once per iteration
    edges = edges.persist()  # read twice while building ew
    outdeg = edges.groupBy("src").agg(F.sum("w").alias("outdeg"))
    ew = edges.join(outdeg, "src").persist()
    ew.count()  # materialize ew, then the bare edge cache can go
    edges.unpersist()
    try:
        ranks = vertices.select(
            F.col("v"), F.lit(PR_SCALE).cast("long").alias("rq")
        )
        # each iteration ends in an eager localCheckpoint: it truncates the
        # lineage (otherwise the final DAG embeds ew once PER iteration and
        # recomputes it that many times at materialization), keeps the rank
        # vector distributed (never collected), and lets the ew cache be
        # released before returning.  The standard iterative-graph shape —
        # GraphX/Pregel checkpoint the same way.  Trade-off: checkpointed
        # blocks skip lineage recovery, acceptable for a 3-iteration model
        # build (rerun on executor loss).
        for _ in range(iters):
            contrib = (
                ew.join(ranks, ew["src"] == ranks["v"])
                .select(
                    F.col("dst"),
                    F.floor(
                        F.lit(damping)
                        * F.col("rq").cast("double")
                        * F.col("w")
                        / F.col("outdeg")
                    )
                    .cast("long")
                    .alias("c"),
                )
                .groupBy("dst")
                .agg(F.sum("c").alias("csum"))
            )
            ranks = (
                vertices.join(contrib, vertices["v"] == contrib["dst"], "left")
                .select(
                    F.col("v"),
                    (
                        F.lit(base_q) + F.coalesce(F.col("csum"), F.lit(0))
                    ).alias("rq"),
                )
                .localCheckpoint(eager=True)
            )
        return ranks.select(
            F.col("v"),
            (
                F.floor(F.col("rq") / F.lit(PR_SCALE / 10000.0) + F.lit(0.5))
                / 10000.0
            ).alias("pagerank"),
        ).orderBy(F.desc("pagerank"), F.asc("v"))
    finally:
        ew.unpersist()


def pagerank_cooccurrence_oracle_sql(
    pairs_sql: str,
    vertices_sql: str,
    iters: int = 3,
    damping: float = 0.85,
) -> str:
    """DuckDB twin of cooccurrence_edges + pagerank composed: the same
    loop unrolled as MATERIALIZED CTEs (r0 -> c1/r1 -> ...), identical
    integer protocol.  ``pairs_sql`` must yield (g, m); ``vertices_sql``
    must yield (v)."""
    base_q = int(round((1.0 - damping) * PR_SCALE))
    ctes = [
        f"""
    mem AS MATERIALIZED (SELECT DISTINCT g, m FROM ({pairs_sql})),
    verts AS MATERIALIZED (SELECT v FROM ({vertices_sql})),
    edges AS MATERIALIZED (
      SELECT a.m AS src, b.m AS dst, CAST(count(*) AS BIGINT) AS w
      FROM mem a JOIN mem b USING (g)
      WHERE a.m <> b.m
      GROUP BY 1, 2
    ),
    ew AS MATERIALIZED (
      SELECT e.src, e.dst, e.w, o.outdeg
      FROM edges e
      JOIN (SELECT src, sum(w) AS outdeg FROM edges GROUP BY src) o
        USING (src)
    ),
    r0 AS MATERIALIZED (SELECT v, CAST({PR_SCALE} AS BIGINT) AS rq FROM verts)"""
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""
    c{i} AS MATERIALIZED (
      SELECT ew.dst,
             CAST(sum(CAST(floor(CAST({damping!r} AS DOUBLE) * CAST(r.rq AS DOUBLE) * ew.w / ew.outdeg) AS BIGINT)) AS BIGINT) AS csum
      FROM ew JOIN r{i - 1} r ON ew.src = r.v
      GROUP BY ew.dst
    ),
    r{i} AS MATERIALIZED (
      SELECT verts.v, {base_q} + COALESCE(c.csum, 0) AS rq
      FROM verts LEFT JOIN c{i} c ON verts.v = c.dst
    )"""
        )
    return (
        "WITH"
        + ",".join(ctes)
        + f"""
    SELECT v,
           floor(CAST(rq AS DOUBLE) / CAST({PR_SCALE / 10000.0!r} AS DOUBLE) + 0.5) / 10000.0 AS pagerank
    FROM r{iters}
    ORDER BY pagerank DESC, v ASC
    """
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count over an undirected edge list (both-direction
    (src, dst, w) rows, as cooccurrence_edges emits).

    The classic two-join shape on ORIENTED edges: keep each undirected
    edge once as (lo, hi), build wedges lo->mid->hi, close them against
    the oriented edge set — every triangle a<b<c counts exactly once, and
    orientation halves both join inputs.  At scale the refinement is
    degree-orientation (orient toward the higher-degree endpoint, bounding
    wedge fan-out by sqrt(|E|) per node); id-orientation keeps the oracle
    a three-way SQL join while the join/shuffle shape — two equi-joins on
    vertex keys — is identical.  Returns one row (n_triangles)."""
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    return (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e1.src") == F.col("e3.src"))
            & (F.col("e2.dst") == F.col("e3.dst")),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


def triangle_count_cooccurrence_oracle_sql(pairs_sql: str) -> str:
    """DuckDB twin of cooccurrence_edges + triangle_count composed;
    ``pairs_sql`` must yield (g, m)."""
    return f"""
    WITH mem AS MATERIALIZED (SELECT DISTINCT g, m FROM ({pairs_sql})),
    e AS MATERIALIZED (
      SELECT DISTINCT a.m AS src, b.m AS dst
      FROM mem a JOIN mem b USING (g)
      WHERE a.m < b.m
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM e e1
    JOIN e e2 ON e1.dst = e2.src
    JOIN e e3 ON e1.src = e3.src AND e2.dst = e3.dst
    """
