"""Materialize an N-x scaled copy of a testdata scale factor for bench
snapshots (default: sf0.1 x 10 -> ./.bench_sf1, gitignored).

Scaling strategy — designed so the scaled corpus stresses the same plan
shapes instead of degenerate ones:

- Relational tables replicate COPY times with a per-copy key offset
  (1e9 * copy) applied consistently to every foreign/primary key that
  participates in joins (orderkey/custkey/suppkey/partkey, event ids,
  doc/vec ids), so each copy is a self-consistent TPC-H-ish universe and
  the join selectivities match the base corpus.  region/nation stay
  single-copy dimensions (copies share them, like a real warehouse).
- documents TEXT is re-vocabularied per copy (every token gets a
  per-copy suffix): replicating text verbatim would multiply the
  near-dup pair relation ~COPY^2 (every doc would near-match its 9
  clones), turning the dedup family into a pathological-pair benchmark
  instead of a 10x-corpus one.  Suffixing keeps the per-copy dup
  structure and Zipf shape while making cross-copy Jaccard ~0.
- embeddings ROTATE by copy (cyclic dim shift): preserves norms and
  within-copy geometry, makes cross-copy cosine ~uncorrelated, so
  ANN/near-dup candidate counts scale ~linearly like a real corpus.

Usage: python tools/make_sf_scaled.py [src_sf_dir] [dest_dir] [copies]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from adtl_spark.session import get_spark

OFFSET = 10**9

KEY_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SINGLE_COPY = ("region", "nation")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else str(
        Path(__file__).resolve().parent.parent / ".bench_sf1"
    )
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    spark = get_spark("make_sf_scaled")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(dest, exist_ok=True)

    for table in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        df = spark.read.parquet(f"{src}/{table}.parquet")
        if table in SINGLE_COPY:
            out = df
        else:
            parts = []
            for c in range(copies):
                copy = df
                for keycol in KEY_COLS[table]:
                    copy = copy.withColumn(
                        keycol, (F.col(keycol) + F.lit(c * OFFSET)).cast("long")
                    )
                if table == "supplier" and c > 0:
                    # names copied verbatim would give every supplier 9
                    # exact clones and inflate the fuzzy-join deletion
                    # neighborhoods quadratically per name group (the
                    # named fuzzy_pairs_suppliers artifact in the first
                    # sf1 snapshot); suffixing keeps realistic name
                    # structure with fresh identities per copy
                    copy = copy.withColumn(
                        "s_name", F.concat(F.col("s_name"), F.lit(f"-{c}"))
                    )
                if table == "documents" and c > 0:
                    copy = copy.withColumn(
                        "text",
                        F.array_join(
                            F.transform(
                                F.split(F.col("text"), " "),
                                lambda w: F.concat(w, F.lit(f"x{c}")),
                            ),
                            " ",
                        ),
                    )
                if table == "embeddings" and c > 0:
                    dim = len(df.select("embedding").first()["embedding"])
                    rot = c % dim
                    copy = copy.withColumn(
                        "embedding",
                        F.concat(
                            F.slice(F.col("embedding"), rot + 1, dim - rot),
                            F.slice(F.col("embedding"), 1, rot),
                        ),
                    )
                parts.append(copy)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        # one file per table mirrors the source layout; the engine's _t
        # loader re-parallelizes the compute-heavy tables itself
        out.coalesce(4).write.mode("overwrite").parquet(f"{dest}/_tmp_{table}")
        # flatten to <table>.parquet the way the source dir is laid out
        import shutil

        final = Path(dest) / f"{table}.parquet"
        if final.exists():
            shutil.rmtree(final) if final.is_dir() else final.unlink()
        shutil.move(f"{dest}/_tmp_{table}", str(final))
        print(f"{table}: {out.count()} rows")


if __name__ == "__main__":
    main()
