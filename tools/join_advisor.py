"""Pre-join strategy advisor: compose the oracle-gated profiling
operators (profile.join_cardinality + profile.skew_report) into the
recommendation a reviewer would write by hand.

Given two tables and their join keys it prints, from EXACT numbers:

- the join output size (priced from count tables, the join never runs);
- broadcastability of either side (vs spark.sql.autoBroadcastJoinThreshold,
  using a conservative bytes/row estimate from a sampled average);
- hot-key risk: the heaviest key's share of the join output and the
  top-10 concentration, with a salting factor suggestion when one task
  would otherwise straggle (>10% of output on one key);
- the Bloom runtime-filter opportunity: when the selective side matches
  a small fraction of the probe side's keys, the expected probe-shuffle
  reduction from joins.bloom_filtered_join.

Usage:
  python tools/join_advisor.py SF_DIR LEFT_TABLE LEFT_KEY RIGHT_TABLE RIGHT_KEY
  python tools/join_advisor.py /root/testdata/sf0.1 lineitem l_suppkey supplier s_suppkey
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BROADCAST_BYTES = 10 * 1024 * 1024  # Spark's default autoBroadcastJoinThreshold


def main() -> None:
    from pyspark.sql import functions as F

    from adtl_spark.operators.profile import join_cardinality, skew_report
    from adtl_spark.session import get_spark

    if len(sys.argv) != 6:
        print(__doc__)
        raise SystemExit(2)
    sf_dir, lt, lk, rt, rk = sys.argv[1:6]
    spark = get_spark("join_advisor")
    left = spark.read.parquet(f"{sf_dir}/{lt}.parquet")
    right = spark.read.parquet(f"{sf_dir}/{rt}.parquet")

    card = join_cardinality(left, right, lk, rk).collect()[0]
    lskew = skew_report(left, lk).collect()[0]

    # conservative per-row bytes from a sampled average of the columns a
    # join would carry (the full row; callers pruning columns do better)
    def est_bytes(df, n_rows: int) -> int:
        if n_rows == 0:
            return 0
        sample = df.limit(1000).collect()
        if not sample:
            return 0
        per = max(len(repr(r)) for r in sample)
        return per * n_rows

    lbytes = est_bytes(left, card["n_left"])
    rbytes = est_bytes(right, card["n_right"])

    print(f"\n=== join_advisor: {lt}.{lk} JOIN {rt}.{rk} ===")
    print(
        f"rows: left {card['n_left']:,} / right {card['n_right']:,}; "
        f"keys: {card['keys_left']:,} / {card['keys_right']:,} "
        f"(shared {card['shared_keys']:,})"
    )
    print(
        f"exact join output: {card['join_rows']:,} rows; hottest key "
        f"contributes {card['max_key_pairs']:,} "
        f"({card['max_key_pairs'] / max(card['join_rows'], 1):.1%}); "
        f"top-10 share {card['topk_share_q6'] / 1e6:.1%}"
    )
    print(
        f"left-key skew: max_share {lskew['max_share_q6'] / 1e6:.3f}, "
        f"gini {lskew['gini_q6'] / 1e6:.3f}"
    )

    recs = []
    if rbytes and rbytes <= BROADCAST_BYTES:
        recs.append(
            f"BROADCAST the right side (~{rbytes / 1e6:.1f} MB est. "
            f"<= {BROADCAST_BYTES / 1e6:.0f} MB threshold) — no shuffle."
        )
    elif lbytes and lbytes <= BROADCAST_BYTES:
        recs.append(
            f"BROADCAST the left side (~{lbytes / 1e6:.1f} MB est.) — no shuffle."
        )
    else:
        recs.append("Both sides exceed the broadcast threshold: shuffle join.")
        hot = card["max_key_pairs"] / max(card["join_rows"], 1)
        if hot > 0.10:
            salt = min(32, max(4, int(hot * 64)))
            recs.append(
                f"SALT the hot key (one key owns {hot:.0%} of the output): "
                f"joins.salted_join with ~{salt} salts spreads that task."
            )
        shared_frac = card["shared_keys"] / max(card["keys_left"], 1)
        if shared_frac < 0.5:
            recs.append(
                f"BLOOM-prefilter the probe side "
                f"(only {shared_frac:.0%} of left keys match): "
                f"joins.bloom_filtered_join cuts the probe shuffle to "
                f"~matching rows + ~0 false positives at default sizing."
            )
    for r in recs:
        print(f"  -> {r}")
    print()


if __name__ == "__main__":
    main()
