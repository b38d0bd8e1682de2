"""Join utilities for the skew cases AQE alone doesn't cover.

Spark's AQE skew-join handles skewed *shuffle* partitions, but a broadcast-
ineligible join against a hot-key dimension still funnels every hot-key row
through one task.  ``salted_join`` implements the standard remedy: salt the
fact side into N sub-keys and explode the dimension side N ways — the hot
key's rows spread over N tasks at the cost of replicating only the
dimension rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` with ``dim`` on column ``on``, salting the key.

    fact rows get a deterministic salt — a hash over ALL fact columns, so
    the same row always lands in the same bucket (a non-deterministic
    component like ``monotonically_increasing_id`` would re-salt rows on
    task retry and block Catalyst pushdown/plan-reuse around the join);
    dim rows are exploded across all buckets.  Fully duplicate fact rows
    share a bucket, which only matters if duplicates dominate a hot key.
    Works for inner and left joins; the dim side should be the (much)
    smaller relation.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    salt = (
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets))
    ).cast("int")
    salted_fact = fact.withColumn("__salt__", salt)
    exploded_dim = dim.withColumn(
        "__salt__",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")),
    )
    out = salted_fact.join(exploded_dim, [on, "__salt__"], how)
    return out.drop("__salt__")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    key_col: str,
    right_cols: list[str],
    right_order: str | None = None,
    prefix: str = "matched_",
    direction: str = "backward",
) -> DataFrame:
    """As-of join with pandas ``merge_asof`` direction semantics: every
    left row gains the ``right_cols`` of one same-key right row —

    - ``backward`` (default): the LATEST right row with
      ``right.time <= left.time``;
    - ``forward``: the EARLIEST right row with ``right.time >= left.time``;
    - ``nearest``: whichever of those two is closer in time, ties
      preferring the backward match (distance 0 is always backward).

    Nulls when no qualifying right row exists.

    Spark has no ASOF JOIN; the naive encoding is a range join whose
    candidate set explodes quadratically per key.  This is the scale-correct
    union encoding instead: tag both sides, union, and run ONE window —
    partition by key, order by (time, side, right_order) — taking the
    running ``last`` (and, for forward/nearest, the upcoming ``first``)
    non-null right payload.  Cost is a single shuffle+sort of
    |left| + |right| rows, identical to any per-key window, regardless of
    how many right rows precede each left row; ``nearest`` computes both
    frames over the one sort, not two passes.

    The right payload rides in a struct so a right row whose payload
    values are null still matches (``last(ignorenulls)`` must skip
    missing ROWS, not missing values); the struct carries the right
    timestamp (``__rt__``) so ``nearest`` can compare distances.
    ``right_order`` breaks ties among right rows sharing a timestamp:
    the backward match takes the LARGEST order value, the forward match
    the SMALLEST (the row "closest" to the left row from each side).
    Equal-time left/right rows match (<=/>= semantics; the side tag sorts
    the right row into the frame that includes it).
    """
    from pyspark.sql import Window

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError("direction must be backward, forward or nearest")
    # ASOF semantics (and the range-join encoding right.ts <= left.ts)
    # never match a null-timestamp right row; without this filter Spark's
    # nulls-first ordering would sort such a row before everything and make
    # it the "latest preceding" match for left rows that have no real
    # predecessor.  Null-time LEFT rows keep their row and get a null
    # payload (they sort before every real right row, so the backward frame
    # is naturally empty; forward/nearest null them out explicitly below).
    right = right.filter(F.col(time_col).isNotNull())
    payload = F.struct(
        F.col(time_col).alias("__rt__"), *[F.col(c) for c in right_cols]
    ).alias("__m__")
    order_val = (
        F.col(right_order) if right_order else F.lit(0)
    ).alias("__ro__")
    left_cols = [c for c in left.columns]
    # side tags order equal-time rows: the right row must sort INSIDE the
    # frame that may include it — before the left row for the backward /
    # nearest frame (<= match), after it for the pure forward frame
    right_side = 0 if direction in ("backward", "nearest") else 1
    r = right.select(
        F.col(key_col).alias("__k__"),
        F.col(time_col).alias("__t__"),
        F.lit(right_side).alias("__side__"),
        order_val,
        payload,
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}__") for c in left_cols],
    )
    l = left.select(
        F.col(key_col).alias("__k__"),
        F.col(time_col).alias("__t__"),
        F.lit(1 - right_side).alias("__side__"),
        F.lit(None)
        .cast(right.schema[right_order].dataType if right_order else "int")
        .alias("__ro__"),
        F.lit(None).cast(r.schema["__m__"].dataType).alias("__m__"),
        *[F.col(c).alias(f"__l_{c}__") for c in left_cols],
    )
    base = Window.partitionBy("__k__").orderBy("__t__", "__side__", "__ro__")
    prev = F.last("__m__", ignorenulls=True).over(
        base.rowsBetween(Window.unboundedPreceding, 0)
    )
    # The forward candidate is NOT first() over a (0, unboundedFollowing)
    # frame: Spark's UnboundedFollowingWindowFunctionFrame re-evaluates the
    # aggregate from scratch per row — O(rows x frame) per key, measured
    # 6x superlinear on 10x data with a hot key.  Reversing the sort turns
    # it into a running last() over the preceding frame, which Spark
    # maintains incrementally (O(rows)); same partitioning, so the extra
    # sort shares the one shuffle.  Descending nulls sort LAST, so a
    # null-time left row sees every right row in its frame — the
    # isNotNull guards below keep those rows matchless.
    rev = Window.partitionBy("__k__").orderBy(
        F.col("__t__").desc(), F.col("__side__").desc(), F.col("__ro__").desc()
    )
    nxt = F.last("__m__", ignorenulls=True).over(
        rev.rowsBetween(Window.unboundedPreceding, 0)
    )
    if direction == "backward":
        chosen = prev
    elif direction == "forward":
        # a null-time left row sorts before every right row, so the
        # following frame would hand it the first right row — guard it
        chosen = F.when(F.col("__t__").isNotNull(), nxt)
    else:
        # nearest: equal-time rights sit in the backward frame (right side
        # tag 0), so a distance-0 match is always the backward one — which
        # is exactly the tie preference
        dp = F.col("__t__") - prev["__rt__"]
        dn = nxt["__rt__"] - F.col("__t__")
        near = (
            F.when(prev.isNull(), nxt)
            .when(nxt.isNull(), prev)
            .when(dp <= dn, prev)
            .otherwise(nxt)
        )
        chosen = F.when(F.col("__t__").isNotNull(), near)
    matched = l.unionByName(r).withColumn("__asof__", chosen)
    return matched.filter(F.col("__side__") == (1 - right_side)).select(
        *[F.col(f"__l_{c}__").alias(c) for c in left_cols],
        *[F.col("__asof__")[c].alias(f"{prefix}{c}") for c in right_cols],
    )


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    time_col: str,
    lower: int,
    upper: int,
    right_cols: list[str],
    prefix: str = "matched_",
) -> DataFrame:
    """Interval join: every (left, right) pair with the same key and
    ``left.time + lower <= right.time <= left.time + upper`` (times are
    non-negative integers, e.g. epoch nanoseconds).

    Spark plans a plain range predicate as a broadcast-nested-loop (or a
    per-key sort-merge whose candidate set is every same-key pair) —
    quadratic in the hot keys.  The standard scale remedy encoded here:
    quantize time into bins as wide as the window span, join on
    (key, bin) — an EQUI-join Catalyst can hash-partition — and re-apply
    the exact range filter after.  Each left row probes its two covering
    bins, so the join fan-in per row is the two bins' contents instead of
    the whole key group; cost is one shuffle of each side by (key, bin).

    Bins use integer ``DIV`` — epoch-nanosecond values exceed 2^53, so a
    double division would lose the precision the range filter needs.
    """
    span = upper - lower
    if span <= 0:
        raise ValueError("range_join_binned needs upper > lower")
    lt = F.col(f"__l_{time_col}__")
    l = left.select(
        *[F.col(c).alias(f"__l_{c}__") for c in left.columns]
    ).withColumn(
        "__bin__",
        F.explode(
            F.sequence(
                F.expr(f"(`__l_{time_col}__` + ({lower})) DIV {span}"),
                F.expr(f"(`__l_{time_col}__` + ({upper})) DIV {span}"),
            )
        ),
    )
    r = right.select(
        F.col(key_col).alias(f"__l_{key_col}__"),
        F.expr(f"`{time_col}` DIV {span}").alias("__bin__"),
        F.col(time_col).alias("__rt__"),
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
    )
    out = l.join(r, [f"__l_{key_col}__", "__bin__"]).filter(
        (F.col("__rt__") >= lt + F.lit(lower))
        & (F.col("__rt__") <= lt + F.lit(upper))
    )
    return out.select(
        *[F.col(f"__l_{c}__").alias(c) for c in left.columns],
        *[F.col(f"{prefix}{c}") for c in right_cols],
    )


def gapfill_linear(
    observed: DataFrame,
    key_col: str,
    pos_col: str,
    value_col: str,
) -> DataFrame:
    """Linear-interpolation gap fill over a per-key integer position grid
    (the FILL(LINEAR) companion to w15's forward fill): ``observed``
    holds (key, pos, value) rows where value may be null on grid
    positions to fill; nulls between two observed positions interpolate
    linearly, nulls before the first / after the last observation take
    the nearest observed value (edge clamp).

    Two windows per key (previous observed via last-ignorenulls over the
    preceding frame, next observed via first-ignorenulls over the
    following frame) — parallel across keys, no self-join.  The
    interpolation ``v_prev + (v_next - v_prev) * (pos - p_prev) /
    (p_next - p_prev)`` is plain double arithmetic, deterministic on
    identical inputs; quantize downstream if gating cross-engine."""
    from pyspark.sql import Window

    w_back = (
        Window.partitionBy(key_col)
        .orderBy(pos_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(key_col)
        .orderBy(pos_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col(value_col)
    obs_pos = F.when(v.isNotNull(), F.col(pos_col))
    prev_v = F.last(v, ignorenulls=True).over(w_back)
    prev_p = F.last(obs_pos, ignorenulls=True).over(w_back)
    next_v = F.first(v, ignorenulls=True).over(w_fwd)
    next_p = F.first(obs_pos, ignorenulls=True).over(w_fwd)
    interp = F.when(v.isNotNull(), v.cast("double")).otherwise(
        F.when(prev_v.isNull(), next_v.cast("double"))
        .when(next_v.isNull(), prev_v.cast("double"))
        .otherwise(
            prev_v.cast("double")
            + (next_v.cast("double") - prev_v.cast("double"))
            * (F.col(pos_col) - prev_p).cast("double")
            / (next_p - prev_p).cast("double")
        )
    )
    return observed.select(
        key_col,
        pos_col,
        interp.alias("filled"),
        v.isNotNull().alias("observed"),
    )


def bloom_filtered_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    words: int = 8192,
) -> DataFrame:
    """Runtime-filter join: build a Bloom filter over the BUILD side's
    join keys and pre-filter the PROBE side map-side BEFORE the shuffle
    join — the pattern that matters when BOTH sides are too big to
    broadcast but the join is selective: the probe side's shuffle
    shrinks to (selectivity + false-positive rate) of itself, and the
    filter is a <= ``words``-row (word, bits) table that broadcasts no
    matter how many keys the build side has.

    Exactness is free: Bloom filters have no false NEGATIVES, so every
    surviving false positive is dropped by the real join and the result
    equals the plain inner join row-for-row (the oracle gate asserts
    exactly this).  Measured on orders('1-URGENT') x lineitem at sf0.01:
    the probe side shrinks to 11,784 of 60,000 rows before the shuffle —
    19.6%, vs 19.6% true selectivity (9 false positives: ~3k build keys
    in a 516k-bit filter keep the fp rate near zero; size ``words`` to
    the build-side key count as it grows).

    Keys must be non-negative integers (hash strings to 60 bits first —
    dedup.md5_60).  Reuses the decontamination Bloom's exact two-hash
    affine scheme (corpus.bloom_build), so the same filter table can be
    shared by both consumers.
    """
    from adtl_spark.operators.corpus import (
        BLOOM_BITS_PER_WORD,
        _BLOOM_SEED,
        _bloom_pos_sql,
    )
    from adtl_spark.operators.dedup import minhash_coefficients

    (a1, b1), (a2, b2) = minhash_coefficients(2, _BLOOM_SEED)
    keys = build.select(F.col(build_key).alias("sh")).distinct()
    pos = keys.select(
        F.explode(
            F.array(
                F.expr(_bloom_pos_sql("sh", a1, b1, words)),
                F.expr(_bloom_pos_sql("sh", a2, b2, words)),
            )
        ).alias("p")
    )
    flt = (
        pos.select(
            F.expr(f"p DIV {BLOOM_BITS_PER_WORD}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(p % {BLOOM_BITS_PER_WORD} AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    bpw = BLOOM_BITS_PER_WORD
    probed = (
        probe.withColumn(
            "__p1", F.expr(_bloom_pos_sql(probe_key, a1, b1, words))
        )
        .withColumn("__p2", F.expr(_bloom_pos_sql(probe_key, a2, b2, words)))
        .join(
            F.broadcast(flt.withColumnRenamed("bits", "__b1")),
            F.expr(f"__p1 DIV {bpw}") == F.col("word"),
        )
        .drop("word")
        .join(
            F.broadcast(
                flt.withColumnRenamed("bits", "__b2").withColumnRenamed(
                    "word", "__w2"
                )
            ),
            F.expr(f"__p2 DIV {bpw}") == F.col("__w2"),
        )
        .filter(
            F.expr(
                f"(shiftright(__b1, CAST(__p1 % {bpw} AS INT)) % 2 = 1) AND "
                f"(shiftright(__b2, CAST(__p2 % {bpw} AS INT)) % 2 = 1)"
            )
        )
        .drop("__p1", "__p2", "__b1", "__b2", "__w2")
    )
    return probed.join(build, F.col(probe_key) == F.col(build_key))
