"""Round-7 operator units: DSIR selection, PSI drift, the KMV overlap
sketch, containment pairs, and the exact decode+DSP / decode+resize
multimodal paths.  Each operator's oracle twin is exercised by the
registry gate (tools/check_oracle.py); these tests pin the SEMANTICS
against straight-line Python/numpy reimplementations on small inputs,
plus the edge cases the gate corpus never hits."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------- DSIR --
def _py_tokens(text):
    return [t for t in text.lower().split() if t]


def test_dsir_select_matches_python(spark):
    from adtl_spark.operators.dedup import md5_60
    from adtl_spark.operators.sampling import dsir_select

    rows = [
        (0, "the quick brown fox", "en"),
        (1, "le renard brun rapide", "fr"),
        (2, "the lazy dog sleeps", "en"),
        (3, "der faule hund schlaeft", "de"),
        (4, "quick quick fox fox the", "en"),
        (5, "renard renard rapide", "fr"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    target = docs.filter(F.col("lang") == "en")
    B = 64
    out = {
        r["doc_id"]: (r["n_tokens"], r["weight_q4"])
        for r in dsir_select(docs, target, top_n=6, n_buckets=B).collect()
    }

    # straight-line python twin using Spark's own md5_60 for bucketing
    toks = {i: _py_tokens(t) for i, t, _ in rows}
    all_tokens = sorted({t for ts in toks.values() for t in ts})
    hdf = spark.createDataFrame([(t,) for t in all_tokens], ["t"])
    h = {
        r["t"]: r["h"] % B
        for r in hdf.select("t", md5_60(F.col("t")).alias("h")).collect()
    }
    t_hist, r_hist = {}, {}
    t_total = r_total = 0
    for i, ts in toks.items():
        for t in ts:
            b = h[t]
            r_hist[b] = r_hist.get(b, 0) + 1
            r_total += 1
            if rows[i][2] == "en":
                t_hist[b] = t_hist.get(b, 0) + 1
                t_total += 1

    def qlog(cnt, total):
        return math.floor(
            math.log((cnt + 0.5) / (total + 0.5 * B)) * 10000 + 0.5
        )

    for i, ts in toks.items():
        w = sum(
            qlog(t_hist.get(h[t], 0), t_total) - qlog(r_hist.get(h[t], 0), r_total)
            for t in ts
        )
        assert out[i] == (len(ts), w)
    # english docs should outrank non-english ones under an english target
    ranked = sorted(out, key=lambda i: (-out[i][1], i))
    assert set(ranked[:3]) == {0, 2, 4}


# ----------------------------------------------------------------- PSI --
def test_psi_drift_matches_python(spark):
    from adtl_spark.operators.monitor import psi_drift

    ref_vals = [0, 0, 1, 1, 1, 2, 3]
    cur_vals = [0, 1, 2, 2, 2, 2, 5]
    ref = spark.createDataFrame([(v,) for v in ref_vals], ["b"])
    cur = spark.createDataFrame([(v,) for v in cur_vals], ["b"])
    n_buckets = 6
    out = {
        r["bucket"]: r
        for r in psi_drift(ref, cur, F.col("b"), n_buckets).collect()
    }
    # occupied buckets only; bucket 4 appears in neither side
    assert set(out) == {0, 1, 2, 3, 5}
    for b in out:
        n_ref = ref_vals.count(b)
        n_cur = cur_vals.count(b)
        p = (n_ref + 0.5) / (len(ref_vals) + 0.5 * n_buckets)
        q = (n_cur + 0.5) / (len(cur_vals) + 0.5 * n_buckets)
        assert out[b]["n_ref"] == n_ref and out[b]["n_cur"] == n_cur
        assert out[b]["p_q6"] == math.floor(p * 1e6 + 0.5)
        assert out[b]["psi_q6"] == math.floor((p - q) * math.log(p / q) * 1e6 + 0.5)
    # identical snapshots -> every contribution is exactly zero
    same = psi_drift(ref, ref, F.col("b"), n_buckets).collect()
    assert all(r["psi_q6"] == 0 for r in same)


# ----------------------------------------------------------------- KMV --
def test_kmv_overlap_exact_and_estimates(spark):
    from adtl_spark.operators.dedup import md5_60
    from adtl_spark.operators.sketches import KMV_SPACE, kmv_overlap

    # below-k sides: estimates must be EXACT distinct counts and the
    # overlap exact jaccard
    a_vals = [f"tok{i}" for i in range(40)] * 3  # duplicates collapse
    b_vals = [f"tok{i}" for i in range(20, 70)]
    a = spark.createDataFrame([(v,) for v in a_vals], ["v"])
    b = spark.createDataFrame([(v,) for v in b_vals], ["v"])
    row = kmv_overlap(a, b, "v", k=128).collect()[0]
    assert (row["k_a"], row["k_b"]) == (40, 50)
    assert row["est_a"] == 40 and row["est_b"] == 50 and row["est_union"] == 70
    assert row["matches"] == 20  # |intersection| exact below k
    assert row["jaccard_q6"] == math.floor(20 / 70 * 1e6 + 0.5)
    assert row["est_inter"] == math.floor(20 / 70 * 70 + 0.5) == 20

    # above-k side: estimator formula (k-1)*SPACE/kth on the k-th minimum
    big = spark.createDataFrame([(f"item{i}",) for i in range(500)], ["v"])
    k = 64
    row = kmv_overlap(big, big, "v", k=k).collect()[0]
    hashes = sorted(
        r["h"]
        for r in big.select(md5_60(F.col("v")).alias("h")).distinct().collect()
    )
    kth = hashes[k - 1]
    est = math.floor((k - 1) * KMV_SPACE / kth + 0.5)
    assert row["k_a"] == k and row["est_a"] == est
    # identical sides: sketches coincide
    assert row["matches"] == k and row["jaccard_q6"] == 1_000_000
    assert row["est_inter"] == row["est_union"] == est
    # the estimate lands in a sane band around the true 500
    assert 250 <= est <= 1000


# --------------------------------------------------------- containment --
def test_containment_pairs_matches_naive(spark):
    from adtl_spark.operators.dedup import containment_pairs

    docs = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta"),  # contained in 0
        (2, "gamma delta epsilon zeta eta theta"),
        (3, "completely different words here now"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        (r["src"], r["dst"]): (r["inter"], r["n_src"], r["containment_q4"])
        for r in containment_pairs(
            df, threshold=0.5, n=3, max_doc_freq_frac=None
        ).collect()
    }

    def shingles(text, n=3):
        ts = _py_tokens(text)
        return {
            " ".join(ts[i : i + n]) for i in range(max(len(ts) - n + 1, 1))
        }

    expected = {}
    for i, ti in docs:
        for j, tj in docs:
            if i == j:
                continue
            si, sj = shingles(ti), shingles(tj)
            inter = len(si & sj)
            if inter >= 0.5 * len(si):
                expected[(i, j)] = (
                    inter,
                    len(si),
                    math.floor(inter / len(si) * 1e4 + 0.5) / 1e4,
                )
    assert out == expected
    # directionality: the short doc is FULLY contained in the long one,
    # while the long one is only half-covered by the short one
    assert out[(1, 0)] == (2, 2, 1.0)
    assert out[(0, 1)][2] == 0.5


# ---------------------------------------------------------- multimodal --
def test_synthetic_wav_arith_roundtrip_and_features(spark):
    import numpy as np

    from adtl_spark.operators.multimodal import (
        _WAV_MIX_A,
        _WAV_MIX_B,
        audio_signal_features,
        decode_wav,
        synthetic_wav_arith,
    )

    n, seed = 320, 7
    payload = synthetic_wav_arith(n, seed)
    rate, ch, bits, pcm = decode_wav(payload)
    assert (rate, ch, bits) == (16000, 1, 16)
    x = np.frombuffer(pcm, dtype="<i2").astype(np.int64)
    ref = np.array(
        [((seed * _WAV_MIX_A + i * _WAV_MIX_B) % 65536) - 32768 for i in range(n)]
    )
    assert (x == ref).all()

    df = spark.createDataFrame([(1, payload), (2, None)], "media_id long, payload binary")
    rows = {r["media_id"]: r for r in audio_signal_features(df).collect()}
    sign = ref >= 0
    assert rows[1]["n_samples"] == n
    assert rows[1]["peak"] == int(np.max(np.abs(ref)))
    assert rows[1]["sum_abs"] == int(np.sum(np.abs(ref)))
    assert rows[1]["zero_crossings"] == int(np.count_nonzero(sign[1:] != sign[:-1]))
    assert rows[1]["rms_q6"] == math.floor(
        math.sqrt(int(np.sum(ref * ref)) / n) * 1e6 + 0.5
    )
    assert rows[2]["n_samples"] is None  # null payload propagates nulls


def test_resize_image_nn_and_pixel_stats(spark):
    import numpy as np

    from adtl_spark.operators.multimodal import (
        decode_ppm,
        image_pixel_stats,
        resize_image_nn,
        synthetic_ppm_arith,
    )

    w, h, seed = 11, 7, 3  # odd dims exercise the ceil-division stride
    payload = synthetic_ppm_arith(w, h, seed)
    dw, dh, rgb = decode_ppm(payload)
    assert (dw, dh) == (w, h)
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)

    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    out = resize_image_nn(df, factor=2)
    row = image_pixel_stats(out).collect()[0]
    small = a[::2, ::2, :]
    oh, ow = small.shape[0], small.shape[1]
    assert (row["width"], row["height"]) == (ow, oh)
    flat = small.reshape(-1, 3).astype(np.int64)
    weights = np.arange(1, oh * ow + 1)
    assert row["sum_r"] == int(flat[:, 0].sum())
    assert row["checksum"] == int(
        (weights * (flat[:, 0] + 2 * flat[:, 1] + 3 * flat[:, 2])).sum()
    )

    # factor=1 is the identity transform byte-for-byte
    same = resize_image_nn(df, factor=1).collect()[0]["payload"]
    assert bytes(same) == payload
    with pytest.raises(ValueError):
        resize_image_nn(df, factor=0)


# ------------------------------------------------------- file ingestion --
def test_binary_dir_feeds_decode_pipeline(spark, tmp_path):
    import numpy as np

    from adtl_spark.operators.multimodal import (
        image_pixel_stats,
        synthetic_ppm_arith,
    )
    from adtl_spark.sources.io import media_from_binary_dir, read_binary_dir

    dims = {"a": (6, 4), "b": (9, 5), "c": (3, 8)}
    for name, (w, h) in dims.items():
        (tmp_path / f"{name}.ppm").write_bytes(synthetic_ppm_arith(w, h, seed=w))
    (tmp_path / "ignore.txt").write_text("not media")

    raw = read_binary_dir(spark, str(tmp_path), glob="*.ppm")
    assert raw.count() == 3  # glob prunes at listing time
    assert {"path", "content", "length"} <= set(raw.columns)

    media = media_from_binary_dir(spark, str(tmp_path), glob="*.ppm")
    stats = image_pixel_stats(media.select("media_id", "payload"))
    got = {
        (r["width"], r["height"]): (r["sum_r"], r["checksum"])
        for r in stats.collect()
    }
    assert set(got) == {(w, h) for w, h in dims.values()}
    for w, h in dims.values():
        rgb = synthetic_ppm_arith(w, h, seed=w)[
            len(f"P6\n{w} {h}\n255\n".encode()):
        ]
        a = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3).astype(np.int64)
        weights = np.arange(1, w * h + 1)
        assert got[(w, h)] == (
            int(a[:, 0].sum()),
            int((weights * (a[:, 0] + 2 * a[:, 1] + 3 * a[:, 2])).sum()),
        )
    # ids are stable across listings
    again = media_from_binary_dir(spark, str(tmp_path), glob="*.ppm")
    assert sorted(r["media_id"] for r in media.select("media_id").collect()) == \
        sorted(r["media_id"] for r in again.select("media_id").collect())


def test_read_text_dir_line_and_file_grain(spark, tmp_path):
    from adtl_spark.sources.io import read_text_dir

    (tmp_path / "x.txt").write_text("line one\nline two\n")
    (tmp_path / "y.txt").write_text("only line\n")
    lines = read_text_dir(spark, str(tmp_path))
    assert sorted(r["value"] for r in lines.collect()) == [
        "line one",
        "line two",
        "only line",
    ]
    files = read_text_dir(spark, str(tmp_path), whole_files=True)
    vals = sorted(r["value"] for r in files.collect())
    assert vals == ["line one\nline two\n", "only line\n"]


# ------------------------------------------------------------ KS drift --
def test_ks_drift_matches_python(spark):
    from adtl_spark.operators.monitor import ks_drift

    ref_vals = [10, 10, 20, 30, 30, 30, 50]
    cur_vals = [10, 20, 20, 40, 50, 50]
    ref = spark.createDataFrame([(v,) for v in ref_vals], ["x"])
    cur = spark.createDataFrame([(v,) for v in cur_vals], ["x"])
    row = ks_drift(ref, cur, F.col("x")).collect()[0]

    pts = sorted(set(ref_vals) | set(cur_vals))
    gaps = {
        v: abs(
            sum(1 for a in ref_vals if a <= v) / len(ref_vals)
            - sum(1 for b in cur_vals if b <= v) / len(cur_vals)
        )
        for v in pts
    }
    g_q6 = {v: math.floor(g * 1e6 + 0.5) for v, g in gaps.items()}
    d = max(g_q6.values())
    assert row["n_ref"] == len(ref_vals) and row["n_cur"] == len(cur_vals)
    assert row["d_q6"] == d
    assert row["d_at"] == min(v for v, g in g_q6.items() if g == d)

    # identical snapshots: D is exactly zero everywhere
    same = ks_drift(ref, ref, F.col("x")).collect()[0]
    assert same["d_q6"] == 0

    # the domain guard fails loudly instead of sorting a huge domain
    big = spark.range(0, 1000).select(F.col("id").alias("x"))
    with pytest.raises(ValueError, match="distinct values exceeds"):
        ks_drift(big, big, F.col("x"), max_points=100)


def test_containment_collapse_expands_duplicate_members(spark):
    """Exact-duplicate collapse must be semantics-preserving: clones share
    every containment relation of their canonical doc, within-group
    members are mutually contained at 1.0, and zero-shingle docs (empty
    after the cap) contribute nothing — all matching the naive form."""
    from adtl_spark.operators.dedup import containment_pairs

    docs = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),  # exact clone of 1
        (3, "alpha beta gamma delta epsilon zeta"),  # exact clone of 0
        (4, "unrelated totally different text here"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        (r["src"], r["dst"]): (r["inter"], r["n_src"], r["containment_q4"])
        for r in containment_pairs(
            df, threshold=0.5, n=3, max_doc_freq_frac=None
        ).collect()
    }

    def shingles(text, n=3):
        ts = text.lower().split()
        return {" ".join(ts[i : i + n]) for i in range(max(len(ts) - n + 1, 1))}

    expected = {}
    for i, ti in docs:
        for j, tj in docs:
            if i == j:
                continue
            si, sj = shingles(ti), shingles(tj)
            inter = len(si & sj)
            if inter >= 0.5 * len(si):
                import math as _m

                expected[(i, j)] = (
                    inter,
                    len(si),
                    _m.floor(inter / len(si) * 1e4 + 0.5) / 1e4,
                )
    assert out == expected
    # clones are mutually contained at 1.0 in both directions
    assert out[(1, 2)][2] == 1.0 and out[(2, 1)][2] == 1.0
    # a clone inherits its canonical doc's cross-group relations
    assert out[(1, 0)] == out[(2, 3)] == out[(1, 3)] == out[(2, 0)]


# ------------------------------------------------------- degenerate inputs --
def test_dsir_empty_target_is_loud_not_silent(spark):
    """A DSIR target with zero tokens cannot define a distribution: the
    scored weights come back NULL (the same loud-anomaly contract as
    score_unigram's empty-model behavior) instead of silently ranking by
    the raw distribution alone."""
    from adtl_spark.operators.sampling import dsir_select

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta")], ["doc_id", "text"]
    )
    out = dsir_select(
        docs, docs.filter(F.col("doc_id") < 0), top_n=5, n_buckets=16
    ).collect()
    assert len(out) == 2
    assert all(r["weight_q4"] is None for r in out)


def test_psi_and_ks_with_empty_current_snapshot(spark):
    """An empty current snapshot is a legal (maximal-drift) input: PSI
    rows carry n_cur=0 with the smoothed floor share, and KS reports
    D = max CDF gap = 1.0 — no crashes, no division artifacts."""
    from adtl_spark.operators.monitor import ks_drift, psi_drift

    ref = spark.createDataFrame([(v,) for v in [0, 1, 1, 2]], ["b"])
    empty = ref.filter(F.col("b") < 0)
    rows = psi_drift(ref, empty, F.col("b"), 4).collect()
    assert [r["bucket"] for r in rows] == [0, 1, 2]
    assert all(r["n_cur"] == 0 and r["psi_q6"] >= 0 for r in rows)

    row = ks_drift(ref, empty, F.col("b")).collect()[0]
    # CDF of the empty side is 0 everywhere -> D = 1.0 at the ref median
    assert row["n_cur"] == 0 and row["d_q6"] == 1_000_000


def test_kmv_overlap_empty_side(spark):
    """An empty side yields exact zeros (size < k path), not NaNs: the
    union sketch equals the non-empty side and intersection is 0."""
    from adtl_spark.operators.sketches import kmv_overlap

    a = spark.createDataFrame([(f"t{i}",) for i in range(30)], ["v"])
    b = a.filter(F.col("v") == "nope")
    row = kmv_overlap(a, b, "v", k=64).collect()[0]
    assert row["k_b"] == 0 and row["est_b"] == 0
    assert row["k_u"] == 30 and row["matches"] == 0
    assert row["jaccard_q6"] == 0 and row["est_inter"] == 0


# --------------------------------------------- bottom-k quantile sketch --
def test_quantile_bottomk_small_group_is_exact(spark):
    """When a group has fewer distinct keys than k the sample IS the
    population, so the sketch quantiles equal exact type-1 quantiles."""
    from adtl_spark.operators.sketches import quantile_bottomk

    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3]  # key i -> value vals[i]
    df = spark.createDataFrame(
        [(i, v, "g") for i, v in enumerate(vals)], ["k", "v", "g"]
    )
    row = quantile_bottomk(df, "v", "k", "g", k=256).collect()[0]
    srt = sorted(vals)
    n = len(srt)
    assert row["n_sample"] == n
    for q in (10, 25, 50, 75, 90):
        assert row[f"q{q}"] == srt[(n * q + 99) // 100 - 1]


def test_quantile_bottomk_merge_law(spark):
    """sketch(A ∪ B) == bottom_k(sketch(A) ∪ sketch(B)): shards sketch
    independently and merge without touching the raw data again."""
    from pyspark.sql import Window

    from adtl_spark.operators.dedup import md5_60
    from adtl_spark.operators.sketches import quantile_bottomk

    k = 16
    rows = [(i, (i * 37) % 101, "g") for i in range(400)]
    df = spark.createDataFrame(rows, ["k", "v", "g"])
    a, b = df.filter(F.col("k") % 2 == 0), df.filter(F.col("k") % 2 == 1)

    def sample(side):
        h = md5_60(F.concat_ws("|", F.lit("qsk"), F.col("k").cast("string")))
        w = Window.partitionBy("g").orderBy("h")
        return (
            side.select("g", h.alias("h"), F.col("v").cast("long").alias("v"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn")
        )

    merged = sample(a).unionByName(sample(b))
    w = Window.partitionBy("g").orderBy("h")
    remerged = (
        merged.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("g", "h", "v")
    )
    wv = Window.partitionBy("g").orderBy("v", "h")
    ranked = remerged.withColumn("rn", F.row_number().over(wv)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    via_merge = ranked.groupBy("g").agg(
        F.max("n").cast("long").alias("n_sample"),
        *[
            F.max(
                F.expr(f"CASE WHEN rn = (n*{q}+99) DIV 100 THEN v END")
            ).cast("long").alias(f"q{q}")
            for q in (10, 25, 50, 75, 90)
        ],
    )
    direct = quantile_bottomk(df, "v", "k", "g", k=k)
    assert direct.collect() == via_merge.collect()


def test_quantile_bottomk_duplicate_keys_collapse(spark):
    """Duplicate keys contribute one sample row (min value), so re-feeding
    the same corpus twice never skews the sample toward repeated rows."""
    from adtl_spark.operators.sketches import quantile_bottomk

    df = spark.createDataFrame(
        [(i, i, "g") for i in range(50)], ["k", "v", "g"]
    )
    doubled = df.unionByName(df)
    assert (
        quantile_bottomk(df, "v", "k", "g", k=64).collect()
        == quantile_bottomk(doubled, "v", "k", "g", k=64).collect()
    )


# ----------------------------------------------------------- HLL rollup --
def test_hll_rollup_total_matches_ungrouped_estimate(spark):
    """The merged __all__ row must equal hll_distinct over the whole
    corpus with a single group — merging registers IS re-sketching."""
    from adtl_spark.operators.sketches import hll_distinct, hll_rollup

    rows = [(f"tok{i % 97}", f"s{i % 3}") for i in range(500)]
    df = spark.createDataFrame(rows, ["token", "src"])
    rolled = {
        r["src"]: (r["n_set"], r["est_distinct"])
        for r in hll_rollup(df, "token", "src", "src").collect()
    }
    whole = hll_distinct(
        df, F.col("token"), F.lit("__all__"), "src"
    ).collect()[0]
    assert rolled["__all__"] == (whole["n_set"], whole["est_distinct"])
    assert set(rolled) == {"s0", "s1", "s2", "__all__"}


# -------------------------------------------------------- shard manifest --
def test_shard_manifest_partitioning_invariant(spark):
    """Counts and xor checksums are identical under any repartitioning or
    row order — the manifest describes content, not scheduling."""
    from adtl_spark.sources.io import shard_manifest

    df = spark.createDataFrame(
        [(i, f"d{i}", 10 + i % 7) for i in range(300)],
        ["doc_id", "text", "n_chars"],
    )
    base = shard_manifest(df, 8, size_col="n_chars").collect()
    scrambled = shard_manifest(
        df.repartition(13).sortWithinPartitions(F.col("n_chars").desc()),
        8,
        size_col="n_chars",
    ).collect()
    assert base == scrambled
    assert sum(r["n_rows"] for r in base) == 300


def test_shard_manifest_detects_single_row_change(spark):
    """A one-row edit flips exactly that shard's checksum and size."""
    from adtl_spark.sources.io import shard_manifest

    df = spark.createDataFrame(
        [(i, 100) for i in range(64)], ["doc_id", "n_chars"]
    )
    edited = df.withColumn(
        "n_chars",
        F.when(F.col("doc_id") == 7, 999).otherwise(F.col("n_chars")),
    )
    a = {r["shard"]: r for r in shard_manifest(df, 4, size_col="n_chars").collect()}
    b = {r["shard"]: r for r in shard_manifest(edited, 4, size_col="n_chars").collect()}
    diff = [s for s in a if a[s] != b[s]]
    assert len(diff) == 1
    s = diff[0]
    assert a[s]["n_rows"] == b[s]["n_rows"]
    assert a[s]["checksum"] != b[s]["checksum"]
    assert b[s]["total_size"] - a[s]["total_size"] == 999 - 100


def test_shard_manifest_matches_written_shards(spark, tmp_path):
    """The manifest computed from the DataFrame agrees with per-directory
    counts of an actual write_training_shards export."""
    from adtl_spark.sources.io import shard_manifest, write_training_shards

    df = spark.createDataFrame(
        [(i, 5 * i) for i in range(200)], ["doc_id", "n_chars"]
    )
    out = str(tmp_path / "shards")
    write_training_shards(df, out, n_shards=4)
    manifest = {
        r["shard"]: r["n_rows"]
        for r in shard_manifest(df, 4, size_col="n_chars").collect()
    }
    written = spark.read.parquet(out)
    counts = {
        r["__shard__"]: r["n"]
        for r in written.groupBy("__shard__").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert manifest == counts


def test_shard_manifest_is_additive(spark):
    """Manifests of disjoint batches combine with sum/xor into the
    manifest of the union — per-shard bookkeeping for incremental
    appends without rescanning the corpus."""
    from adtl_spark.sources.io import shard_manifest

    df = spark.createDataFrame(
        [(i, 3 * i + 1) for i in range(500)], ["doc_id", "n_chars"]
    )
    a, b = df.filter(F.col("doc_id") < 250), df.filter(F.col("doc_id") >= 250)
    ma = {r["shard"]: r for r in shard_manifest(a, 8, size_col="n_chars").collect()}
    mb = {r["shard"]: r for r in shard_manifest(b, 8, size_col="n_chars").collect()}
    combined = {}
    for s in set(ma) | set(mb):
        ra, rb = ma.get(s), mb.get(s)
        combined[s] = (
            (ra["n_rows"] if ra else 0) + (rb["n_rows"] if rb else 0),
            (ra["total_size"] if ra else 0) + (rb["total_size"] if rb else 0),
            (ra["checksum"] if ra else 0) ^ (rb["checksum"] if rb else 0),
        )
    whole = {
        r["shard"]: (r["n_rows"], r["total_size"], r["checksum"])
        for r in shard_manifest(df, 8, size_col="n_chars").collect()
    }
    assert combined == whole


# ---------------------------------------------------------- PR curve --
def test_pr_curve_matches_python(spark):
    """pr_curve against a straight-line Python sweep on a small labeled
    score set, including the all-one-bin degenerate case."""
    from adtl_spark.operators.corpus import pr_curve

    data = [
        (0.9, True), (0.8, True), (0.7, False), (0.6, True),
        (0.4, False), (0.3, False), (0.2, True), (0.1, False),
    ]
    df = spark.createDataFrame(data, ["nb_score", "label"])
    n_bins = 4
    got = pr_curve(df, "label", "nb_score", n_bins=n_bins).collect()

    scores = [int(s * 10000 + 0.5) for s, _ in data]
    lo, hi = min(scores), max(scores)
    cells = {}
    for (s, y), i in zip(data, scores):
        b = 0 if hi == lo else ((i - lo) * n_bins) // (hi - lo + 1)
        n, npos, smin = cells.get(b, (0, 0, None))
        cells[b] = (n + 1, npos + (1 if y else 0),
                    i if smin is None else min(smin, i))
    tot_pos = sum(v[1] for v in cells.values())
    cum_n = cum_tp = 0
    want = []
    for b in sorted(cells, reverse=True):
        n, npos, smin = cells[b]
        cum_n += n
        cum_tp += npos
        want.append((b, smin, n, npos, cum_n, cum_tp,
                     int(cum_tp / cum_n * 1e6 + 0.5),
                     int(cum_tp / tot_pos * 1e6 + 0.5)))
    assert [tuple(r) for r in got] == want

    # degenerate: constant score -> one bin, precision = base rate
    const = spark.createDataFrame(
        [(0.5, True), (0.5, False), (0.5, False), (0.5, True)],
        ["nb_score", "label"],
    )
    rows = pr_curve(const, "label", "nb_score", n_bins=8).collect()
    assert len(rows) == 1
    assert rows[0]["bin"] == 0 and rows[0]["cum_n"] == 4
    assert rows[0]["precision_q6"] == 500000 and rows[0]["recall_q6"] == 1000000


def test_score_nb_carry_label_identical_scores(spark):
    """The carry column changes nothing about the scores — it only rides
    the aggregate; scores with and without carry must be identical."""
    from adtl_spark.operators.corpus import score_nb, train_nb

    docs = spark.createDataFrame(
        [(0, "good clean text", "a"), (1, "spam spam spam", "b"),
         (2, "good text again", "a"), (3, "", "b")],
        ["doc_id", "text", "src"],
    )
    pos = F.col("src") == "a"
    model, prior = train_nb(docs, pos, vocab_k=10)
    plain = score_nb(docs, model, prior).orderBy("doc_id").collect()
    carried = score_nb(docs, model, prior, carry=pos).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["nb_score"], r["nb_keep"]) for r in plain] == [
        (r["doc_id"], r["nb_score"], r["nb_keep"]) for r in carried
    ]
    assert [r["label"] for r in carried] == [True, False, True, False]


def test_roc_auc_matches_pairwise_python(spark):
    """roc_auc against the O(P*N) pairwise definition (ties credit 1/2)
    on randomized scores, plus the single-class NULL contract."""
    import random

    from adtl_spark.operators.corpus import roc_auc

    rng = random.Random(99)
    data = [
        (round(rng.choice([0.1, 0.2, 0.2, 0.35, 0.5, -0.4]), 4),
         rng.random() < 0.4)
        for _ in range(200)
    ]
    df = spark.createDataFrame(data, ["nb_score", "label"])
    row = roc_auc(df, "label", "nb_score", band_width=2).collect()[0]

    import math

    qp = [math.floor(s * 10000 + 0.5) for s, y in data if y]
    qn = [math.floor(s * 10000 + 0.5) for s, y in data if not y]
    u2 = sum(
        2 if p > n else (1 if p == n else 0) for p in qp for n in qn
    )
    assert row["n_pos"] == len(qp) and row["n_neg"] == len(qn)
    assert row["u2"] == u2
    want_auc = math.floor(u2 / (2.0 * len(qp) * len(qn)) * 1e6 + 0.5)
    assert row["auc_q6"] == want_auc

    one_class = spark.createDataFrame(
        [(0.5, True), (0.7, True)], ["nb_score", "label"]
    )
    r = roc_auc(one_class, "label", "nb_score").collect()[0]
    assert r["auc_q6"] is None and r["n_neg"] == 0


# ---------------------------------------- degenerate-input contracts --
def test_new_sketches_on_empty_input(spark):
    """Empty corpus: quantile sketch, rollup, manifest, PR curve and AUC
    all return empty / defined-null results rather than erroring."""
    from adtl_spark.operators.corpus import pr_curve, roc_auc
    from adtl_spark.operators.sketches import hll_rollup, quantile_bottomk
    from adtl_spark.sources.io import shard_manifest

    empty_docs = spark.createDataFrame([], "doc_id long, n_chars long, source string")
    empty_toks = spark.createDataFrame([], "token string, source string")
    empty_scored = spark.createDataFrame([], "nb_score double, label boolean")

    assert quantile_bottomk(
        empty_docs, "n_chars", "doc_id", "source", k=8, group_name="source"
    ).collect() == []
    # rollup still emits the __all__ row over zero registers?  No: no
    # registers at all -> empty result (nothing was ever observed)
    assert hll_rollup(empty_toks, "token", "source", "source").collect() == []
    assert shard_manifest(empty_docs, 4, size_col="n_chars").collect() == []
    assert pr_curve(empty_scored, "label", "nb_score").collect() == []
    row = roc_auc(empty_scored, "label", "nb_score").collect()[0]
    assert row["n_pos"] == 0 and row["n_neg"] == 0 and row["auc_q6"] is None


def test_quantile_bottomk_single_row_group(spark):
    """A one-row group reports that value at every quantile."""
    from adtl_spark.operators.sketches import quantile_bottomk

    df = spark.createDataFrame([(1, 42, "g")], ["k", "v", "g"])
    row = quantile_bottomk(df, "v", "k", "g", k=8).collect()[0]
    assert row["n_sample"] == 1
    assert all(row[f"q{q}"] == 42 for q in (10, 25, 50, 75, 90))


# ------------------------------------------------------- skew report --
def test_skew_report_matches_python(spark):
    """skew_report vs straight-line Python on a skewed key set, plus the
    uniform case (gini 0) and the empty case (NULL stats)."""
    import math

    from adtl_spark.operators.profile import skew_report

    keys = ["hot"] * 50 + ["warm"] * 20 + [f"cold{i}" for i in range(30)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    row = skew_report(df, "k", top_k=3).collect()[0]

    from collections import Counter

    cnt = Counter(keys)
    n, kk = len(keys), len(cnt)
    assert (row["n_rows"], row["n_keys"]) == (n, kk)
    assert row["max_share_q6"] == math.floor(50 / n * 1e6 + 0.5)
    top3 = sum(c for _, c in cnt.most_common(3))
    assert row["topk_share_q6"] == math.floor(top3 / n * 1e6 + 0.5)
    # entropy from q7-quantized per-key terms
    h_q7 = sum(
        m * math.floor((c / n) * math.log(n / c) * 1e7 + 0.5)
        for c, m in Counter(cnt.values()).items()
    )
    assert row["entropy_q6"] == (h_q7 + 5) // 10
    # gini from sorted ascending counts
    xs = sorted(cnt.values())
    s_rank = sum((i + 1) * x for i, x in enumerate(xs))
    gini = 2.0 * s_rank / (kk * n) - (kk + 1.0) / kk
    assert row["gini_q6"] == math.floor(gini * 1e6 + 0.5)

    uniform = spark.createDataFrame([(f"u{i}",) for i in range(40)], ["k"])
    u = skew_report(uniform, "k").collect()[0]
    assert u["gini_q6"] == 0 and u["max_share_q6"] == 25000

    empty = spark.createDataFrame([], "k string")
    e = skew_report(empty, "k").collect()[0]
    assert e["n_rows"] == 0 and e["max_share_q6"] is None
    assert e["entropy_q6"] is None and e["gini_q6"] is None


def test_manifest_diff_classifies_shards(spark):
    """manifest_diff pinpoints exactly the shards an edit touched."""
    from adtl_spark.sources.io import manifest_diff, shard_manifest

    base = spark.createDataFrame(
        [(i, 100 + i) for i in range(128)], ["doc_id", "n_chars"]
    )
    edited = base.withColumn(
        "n_chars",
        F.when(F.col("doc_id") == 11, 1).otherwise(F.col("n_chars")),
    ).filter(F.col("doc_id") != 77)  # one edit + one delete
    m_old = shard_manifest(base, 8, size_col="n_chars")
    m_new = shard_manifest(edited, 8, size_col="n_chars")
    rows = {r["shard"]: r["status"] for r in manifest_diff(m_old, m_new).collect()}
    assert len(rows) == 8
    changed = [s for s, st in rows.items() if st == "changed"]
    assert len(changed) == 2  # the edit's shard and the delete's shard
    assert all(st in ("changed", "unchanged") for st in rows.values())


def test_range_bounds_partition_preview(spark):
    """Bounds are monotone, derived from the sample's type-1 quantiles,
    and below-k they split the EXACT population into near-equal ranges;
    repartitionByRange-style assignment respects the bounds."""
    from adtl_spark.operators.sketches import range_bounds

    df = spark.createDataFrame(
        [(i, (i * 17) % 1000) for i in range(800)], ["doc_id", "n_chars"]
    )
    bounds = range_bounds(df, "n_chars", "doc_id", n_ranges=8, k=1024).collect()
    assert [r["bound_idx"] for r in bounds] == list(range(1, 8))
    ups = [r["upper"] for r in bounds]
    assert ups == sorted(ups)
    # below-k: sample == population, so bound i is the exact octile
    vals = sorted(((i * 17) % 1000) for i in range(800))
    n = len(vals)
    for i, u in enumerate(ups, start=1):
        assert u == vals[(n * i + 7) // 8 - 1]
    # assignment sanity: each range holds between 0.5x and 2x the ideal
    counts = []
    prev = None
    for u in ups + [None]:
        if prev is None and u is not None:
            c = sum(1 for v in vals if v <= u)
        elif u is not None:
            c = sum(1 for v in vals if prev < v <= u)
        else:
            c = sum(1 for v in vals if v > prev)
        counts.append(c)
        prev = u
    ideal = n / 8
    assert all(0.5 * ideal <= c <= 2 * ideal for c in counts)


def test_vocab_js_drift_matches_python(spark):
    """vocab_js_drift vs straight-line Python (Counter + JS formula),
    including the OOV remainder and the identical-snapshot zero case."""
    import math
    from collections import Counter

    from adtl_spark.operators.monitor import vocab_js_drift

    a_docs = ["the cat sat", "the dog ran fast", "cat and dog"]
    b_docs = ["the bird flew", "the cat slept", "fish swam deep today"]
    ref = spark.createDataFrame([(i, t) for i, t in enumerate(a_docs)], ["doc_id", "text"])
    cur = spark.createDataFrame([(i, t) for i, t in enumerate(b_docs)], ["doc_id", "text"])
    K = 4
    got = {
        r["token"]: (r["n_ref"], r["n_cur"], r["js_q6"])
        for r in vocab_js_drift(ref, cur, vocab_k=K).collect()
    }

    ca = Counter(w for d in a_docs for w in d.split())
    cb = Counter(w for d in b_docs for w in d.split())
    combined = Counter(ca) + Counter(cb)
    top = sorted(combined, key=lambda t: (-combined[t], t))[:K]
    nr_tot, nc_tot = sum(ca.values()), sum(cb.values())
    cells = {t: (ca.get(t, 0), cb.get(t, 0)) for t in top}
    cells["__oov__"] = (
        nr_tot - sum(ca.get(t, 0) for t in top),
        nc_tot - sum(cb.get(t, 0) for t in top),
    )
    smooth = 0.5 * (K + 1)
    want = {}
    for t, (nr, nc) in cells.items():
        p = (nr + 0.5) / (nr_tot + smooth)
        q = (nc + 0.5) / (nc_tot + smooth)
        m = (p + q) / 2
        js = 0.5 * (p * math.log(p / m) + q * math.log(q / m))
        want[t] = (nr, nc, math.floor(js * 1e6 + 0.5))
    assert got == want
    assert len(got) == K + 1

    same = vocab_js_drift(ref, ref, vocab_k=K).collect()
    assert all(r["js_q6"] == 0 for r in same)

    # both empty -> single zero-drift OOV row
    empty = spark.createDataFrame([], "doc_id long, text string")
    z = vocab_js_drift(empty, empty, vocab_k=K).collect()
    assert len(z) == 1 and z[0]["token"] == "__oov__" and z[0]["js_q6"] == 0
