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

    fact rows get a random-but-deterministic salt (hash of the full row's
    key + a uniform bucket from the key's hash and a per-row component);
    dim rows are exploded across all buckets.  Works for inner and left
    joins; the dim side should be the (much) smaller relation.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    salt = (F.pmod(F.xxhash64(F.col(on), F.monotonically_increasing_id()), salt_buckets)).cast("int")
    salted_fact = fact.withColumn("__salt__", salt)
    exploded_dim = dim.withColumn(
        "__salt__",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")),
    )
    out = salted_fact.join(exploded_dim, [on, "__salt__"], how)
    return out.drop("__salt__")
