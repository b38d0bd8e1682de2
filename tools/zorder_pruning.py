"""Measure what Z-order clustering buys: parquet row-group min/max pruning
on BOTH dimensions of a 2-column predicate space, vs a 1-D sort and an
unsorted layout.

Writes the sf documents table three ways (unsorted / sorted by n_chars /
Z-ordered on (n_chars, doc_id)), then uses the parquet FOOTER STATS alone
(pyarrow metadata — exactly what a scan planner sees) to count the row
groups a range predicate on each dimension could skip.  Prints, per
layout x predicate, the skippable fraction: the Z-order claim is that it
prunes on EITHER dimension, where the 1-D sort prunes on its sort column
only and the unsorted layout prunes on neither.

Usage: python tools/zorder_pruning.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow.parquet as pq  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from adtl_spark.session import get_spark  # noqa: E402
from adtl_spark.sources.io import write_zordered, zorder_key  # noqa: E402

BITS = 12
ROW_GROUP = "16384"  # small row groups so sf0.1 yields enough of them


def rowgroup_skip_fraction(path: Path, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(skippable, total) row groups for predicate col BETWEEN lo AND hi,
    judged by footer min/max only."""
    total = skippable = 0
    for f in sorted(path.glob("*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is not None and (st.max < lo or st.min > hi):
                skippable += 1
    return skippable, total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/adtl_zorder")
    spark = get_spark("zorder_pruning")
    spark.conf.set("spark.hadoop.parquet.block.size", ROW_GROUP)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    layouts = {
        "unsorted": lambda df, p: df.repartition(16).write.mode("overwrite")
        .option("parquet.block.size", ROW_GROUP).parquet(p),
        "sorted_n_chars": lambda df, p: df.repartitionByRange(16, "n_chars")
        .sortWithinPartitions("n_chars")
        .write.mode("overwrite").option("parquet.block.size", ROW_GROUP).parquet(p),
        "zordered": lambda df, p: write_zordered(
            df, p, ["zb_n", "zb_d"], bits=BITS, n_files=16
        ),
    }
    stats = docs.agg(
        F.min("n_chars"), F.max("n_chars"), F.min("doc_id"), F.max("doc_id")
    ).collect()[0]
    n_lo, n_hi = int(stats[0]), int(stats[1])
    d_lo, d_hi = int(stats[2]), int(stats[3])
    # normalize both dimensions to the full BITS-bit range before
    # interleaving — zorder_key's documented contract ("rank or bucket
    # them first"): raw columns at different scales waste interleave bits
    # on the wider one and the curve degenerates to a 1-D sort
    full = (1 << BITS) - 1
    docs = docs.select(
        "doc_id",
        "n_chars",
        ((F.col("n_chars") - n_lo) * full / max(1, n_hi - n_lo))
        .cast("long").alias("zb_n"),
        ((F.col("doc_id") - d_lo) * full / max(1, d_hi - d_lo))
        .cast("long").alias("zb_d"),
    )
    preds = {
        "n_chars_decile": ("n_chars", n_lo, n_lo + max(1, (n_hi - n_lo) // 10)),
        "doc_id_decile": ("doc_id", d_lo, d_lo + max(1, (d_hi - d_lo) // 10)),
    }
    for name, writer in layouts.items():
        p = out / name
        writer(docs, str(p))
        for pname, (col, lo, hi) in preds.items():
            sk, tot = rowgroup_skip_fraction(p, col, lo, hi)
            print(
                f"{name:16s} {pname:16s} skips {sk}/{tot} row groups "
                f"({sk / max(tot, 1):.0%})",
                flush=True,
            )


if __name__ == "__main__":
    main()
