"""Round-11 block: the G.711 codec, the measured dHash-banding recall
gate, URL canonicalization edge cases (query-less URLs, fragments with
'?'), the fmt-tag audio dispatch, and the memoized index-meta read."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# ----------------------------------------------------------- G.711 ---


def _ref_linear2ulaw(pcm: int) -> int:
    """Scalar reference µ-law compressor (the public-domain Sun g711.c
    algorithm, transcribed from ITU-T G.711) — the differential truth."""
    bias, clip = 0x84, 8159
    seg_uend = [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF]
    pcm >>= 2
    if pcm < 0:
        pcm, mask = -pcm, 0x7F
    else:
        mask = 0xFF
    pcm = min(pcm, clip) + (bias >> 2)
    seg = next((i for i, v in enumerate(seg_uend) if pcm <= v), 8)
    if seg >= 8:
        return 0x7F ^ mask
    return ((seg << 4) | ((pcm >> (seg + 1)) & 0xF)) ^ mask


def _ref_linear2alaw(pcm: int) -> int:
    """Scalar reference A-law compressor (same provenance)."""
    seg_aend = [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]
    pcm >>= 3
    if pcm >= 0:
        mask = 0xD5
    else:
        mask, pcm = 0x55, -pcm - 1
    seg = next((i for i, v in enumerate(seg_aend) if pcm <= v), 8)
    if seg >= 8:
        return 0x7F ^ mask
    aval = seg << 4
    aval |= (pcm >> 1) & 0xF if seg < 2 else (pcm >> seg) & 0xF
    return aval ^ mask


def test_g711_encode_differential_full_int16_range():
    """The vectorized compressor matches the reference algorithm on
    every one of the 65536 input values, both laws."""
    from adtl_spark.operators.multimodal import _g711_encode

    allx = np.arange(-32768, 32768, dtype=np.int64)
    got_u = _g711_encode(allx, "ulaw")
    want_u = np.array([_ref_linear2ulaw(int(v)) for v in allx], dtype=np.uint8)
    assert (got_u == want_u).all()
    got_a = _g711_encode(allx, "alaw")
    want_a = np.array([_ref_linear2alaw(int(v)) for v in allx], dtype=np.uint8)
    assert (got_a == want_a).all()


def test_g711_decode_is_left_inverse_of_encode_on_code_points():
    """enc(dec(code)) == code for all 256 codes, both laws — except the
    inherent µ-law ±0 aliasing (0x7F and 0xFF both decode to 0, which
    canonically re-encodes as 0xFF)."""
    from adtl_spark.operators.multimodal import (
        _g711_decode_tables,
        _g711_encode,
    )

    ulaw_t, alaw_t = _g711_decode_tables()
    codes = np.arange(256, dtype=np.uint8)
    re_u = _g711_encode(np.take(ulaw_t, codes), "ulaw")
    bad = np.nonzero(re_u != codes)[0]
    assert list(bad) == [0x7F] and re_u[0x7F] == 0xFF
    re_a = _g711_encode(np.take(alaw_t, codes), "alaw")
    assert (re_a == codes).all()


def test_g711_wav_roundtrip_error_bound():
    from adtl_spark.operators.multimodal import (
        decode_audio,
        encode_wav_g711,
    )

    tri = (np.abs((np.arange(3000) * 64) % 16000 - 8000) - 4000).astype(
        np.int16
    )
    for law, bound in (("ulaw", 128), ("alaw", 64)):
        rate, ch, bits, pcm = decode_audio(
            encode_wav_g711(tri.tobytes(), rate=8000, law=law)
        )
        out = np.frombuffer(pcm, dtype=np.int16)
        assert (rate, ch, bits) == (8000, 1, 16)
        assert len(out) == len(tri)
        assert np.abs(out.astype(int) - tri.astype(int)).max() <= bound


def test_decode_audio_dispatches_on_fmt_tag_not_error_text():
    """A WAV with format tag 170 (or any non-PCM, non-ADPCM, non-G.711
    tag) must surface the PCM reader's accurate error, never be
    misrouted into the ADPCM decoder by a '17' substring match."""
    import struct

    from adtl_spark.operators.multimodal import decode_audio

    def wav_with_tag(tag: int) -> bytes:
        fmt = struct.pack("<HHIIHH", tag, 1, 8000, 16000, 2, 16)
        body = (
            b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
        )
        return b"RIFF" + struct.pack("<I", len(body)) + body

    for tag in (170, 1792):
        with pytest.raises(ValueError, match=f"format {tag}"):
            decode_audio(wav_with_tag(tag))
    # PCM still routes to the PCM reader
    rate, ch, bits, pcm = decode_audio(wav_with_tag(1))
    assert (rate, ch, bits, pcm) == (8000, 1, 16, b"\x00\x00\x00\x00")


# ------------------------------------------- dHash banding recall ---


def test_dhash_recall_classes_distances_and_band_structure():
    """The constructed corpus has the shape the gate claims: nested flip
    sets (same-parity distance == |v1-v2|), the adversarial family
    spreads any 4+ span over all four 16-bit bands, the friendly family
    never leaves bands 0-1."""
    from adtl_spark.queries import _dhash_recall_classes

    rows = _dhash_recall_classes()
    assert len(rows) == 18
    h = {
        (p, v): (hi << 32) | lo for p, v, _cid, hi, lo in rows
    }
    for p in (0, 1):
        for v1 in range(9):
            for v2 in range(9):
                d = bin(h[(p, v1)] ^ h[(p, v2)]).count("1")
                assert d == abs(v1 - v2)
    # adversarial: base vs v=4 differs in all four bands -> band-join misses
    x = h[(0, 0)] ^ h[(0, 4)]
    bands = {k for k in range(4) if (x >> (16 * k)) & 0xFFFF}
    assert bands == {0, 1, 2, 3}
    # friendly: base vs v=8 stays in bands 0-1 -> band-join catches
    x = h[(1, 0)] ^ h[(1, 8)]
    bands = {k for k in range(4) if (x >> (16 * k)) & 0xFFFF}
    assert bands <= {0, 1}


def test_dhash_recall_gate_pigeonhole_and_degradation(spark):
    """recall == 1.0 at hamming <= 3 (pigeonhole-complete), < 1.0
    somewhere in 4..8 (the measured tradeoff the docstring reports), and
    n_hit <= n_true everywhere."""
    from adtl_spark.queries import multimodal_dhash_recall

    rows = {
        r["hamming"]: r
        for r in multimodal_dhash_recall(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    for d, r in rows.items():
        assert r["n_hit"] <= r["n_true"]
        if d <= 3:
            assert r["recall"] == 1.0
    assert any(r["recall"] < 1.0 for d, r in rows.items() if d >= 4)


def test_vad_trims_g711_like_its_pcm_expansion(spark):
    """A G.711-companded clip endpoints exactly like its decoded PCM
    expansion (same frames, same active span) — the decode->VAD combo an
    ASR corpus runs on telephony audio without a transcode step.  The
    signal is built far from the energy threshold so companding loss
    (max |err| 128) can never flip a frame decision."""
    import struct

    from adtl_spark.operators.multimodal import (
        audio_vad_trim,
        decode_audio,
        encode_wav_g711,
    )

    # 160-sample frames: silent, loud, silent, loud (amplitudes 0 / 8000)
    frames = [0, 8000, 0, 8000, 0]
    pcm = np.concatenate(
        [np.full(160, a, dtype=np.int16) for a in frames]
    ).tobytes()
    g711 = encode_wav_g711(pcm, rate=8000, law="ulaw")
    # the PCM expansion as a plain WAV
    rate, ch, bits, expanded = decode_audio(g711)
    wav = (
        b"RIFF"
        + struct.pack("<I", 36 + len(expanded))
        + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(expanded)) + expanded
    )
    df = spark.createDataFrame(
        [(1, bytearray(g711)), (2, bytearray(wav))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in audio_vad_trim(df).collect()}
    assert tuple(rows[1])[1:] == tuple(rows[2])[1:]
    assert rows[1]["n_frames"] == 5 and rows[1]["n_speech"] == 2
    assert rows[1]["first_speech"] == 1 and rows[1]["last_speech"] == 3
    assert rows[1]["trimmed_samples"] == 3 * 160


# ------------------------------------------------- box-filter resize ---


def test_resize_image_box_exact_mean_and_truncation(spark):
    """Every output pixel is the floor of its f x f block mean (checked
    against an independent numpy computation), ragged right/bottom edges
    truncate, factor=1 is the identity, and an image smaller than the
    filter fails loudly."""
    from adtl_spark.operators.multimodal import (
        decode_image,
        resize_image_box,
        synthetic_ppm_arith,
    )

    w, h, f = 13, 11, 3  # ragged on both axes
    payload = synthetic_ppm_arith(w, h, seed=7)
    _w, _h, rgb = decode_image(payload)
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3).astype(np.int64)
    ow, oh = w // f, h // f
    want = (
        a[: oh * f, : ow * f, :].reshape(oh, f, ow, f, 3).sum(axis=(1, 3))
        // (f * f)
    ).astype(np.uint8)

    df = spark.createDataFrame(
        [(1, bytearray(payload))], "media_id long, payload binary"
    )
    out = bytes(resize_image_box(df, factor=f).collect()[0]["payload"])
    gw, gh, grgb = decode_image(out)
    assert (gw, gh) == (ow, oh)
    assert np.frombuffer(grgb, dtype=np.uint8).reshape(oh, ow, 3).tolist() == want.tolist()
    # factor=1 identity (decode->re-encode of the same pixels)
    out1 = bytes(resize_image_box(df, factor=1).collect()[0]["payload"])
    assert decode_image(out1) == (w, h, rgb)
    # smaller than the filter: loud failure, not a 0-dim image
    tiny = spark.createDataFrame(
        [(1, bytearray(synthetic_ppm_arith(2, 2, seed=1)))],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="smaller than"):
        resize_image_box(tiny, factor=4).collect()


def test_audio_stats_and_vad_null_out_mp3_not_crash(spark):
    """The MP3 stub raises NotImplementedError from decode_audio; the
    corpus stats/VAD operators must yield null rows for such payloads,
    never kill the job (the pre-dispatch contract, kept)."""
    from adtl_spark.operators.multimodal import (
        audio_signal_features,
        audio_vad_trim,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"ID3" + b"\x00" * 30)), (2, bytearray(b"junk"))],
        "media_id long, payload binary",
    )
    for rows in (
        audio_signal_features(df).collect(),
        audio_vad_trim(df).collect(),
    ):
        assert len(rows) == 2
        for r in rows:
            assert all(v is None for k, v in r.asDict().items() if k != "media_id")


def test_avi_multiple_audio_streams_raise():
    """Two interleaved soundtracks must raise, not concatenate into
    byte-shuffled garbage under one stream's format."""
    import struct

    from adtl_spark.operators.multimodal import _avi_header, mux_avi_mjpeg

    frames = _gradient_jpegs(16, 16, 2)
    pcm = np.zeros(320, dtype=np.int16).tobytes()
    avi = mux_avi_mjpeg(frames, 4, 16, 16, audio=(8000, pcm))
    # splice a duplicate of the auds strl into hdrl
    li = avi.rindex(b"LIST", 0, avi.index(b"auds"))
    (lsz,) = struct.unpack("<I", avi[li + 4 : li + 8])
    strl = avi[li : li + 8 + lsz]
    hd = avi.index(b"LIST", 12)
    (hsz,) = struct.unpack("<I", avi[hd + 4 : hd + 8])
    body = avi[hd + 8 : hd + 8 + hsz] + strl
    doubled = bytearray(
        avi[:hd] + b"LIST" + struct.pack("<I", len(body)) + body
        + avi[hd + 8 + hsz:]
    )
    doubled[4:8] = struct.pack("<I", len(doubled) - 8)
    with pytest.raises(ValueError, match="multiple audio streams"):
        _avi_header(bytes(doubled))


def test_wav_format_tag_rejects_non_wave_riff():
    """An AVI also starts with RIFF; the dispatcher must return None for
    it (decode_audio then raises the accurate WAVE error), not walk AVI
    lists as WAV chunks."""
    from adtl_spark.operators.multimodal import (
        _wav_format_tag,
        mux_avi_mjpeg,
    )

    avi = mux_avi_mjpeg(_gradient_jpegs(16, 16, 1), 4, 16, 16)
    assert _wav_format_tag(avi) is None


def test_resample_audio_box_exact_and_composes(spark):
    """Every output sample is floor(mean of its f-sample block) (checked
    vs independent numpy, negatives included), the WAV rewrap halves the
    rate, ragged tails truncate, a G.711 input resamples without a
    transcode step, and factor=1 is the identity."""
    from adtl_spark.operators.multimodal import (
        decode_audio,
        encode_wav_g711,
        resample_audio_box,
    )

    rng_x = np.array(
        [-32768, -3, -2, -1, 0, 1, 2, 3, 32767, -7, 5, 4, 9], dtype=np.int16
    )
    from adtl_spark.operators.multimodal import pcm_to_wav

    wav = pcm_to_wav(16000, 1, 16, rng_x.tobytes())
    df = spark.createDataFrame(
        [(1, bytearray(wav))], "media_id long, payload binary"
    )
    out = bytes(resample_audio_box(df, factor=2).collect()[0]["payload"])
    rate, ch, bits, pcm = decode_audio(out)
    got = np.frombuffer(pcm, dtype="<i2")
    m = rng_x.size // 2
    want = np.floor_divide(
        rng_x[: m * 2].astype(np.int64).reshape(m, 2).sum(axis=1), 2
    )
    assert (rate, ch, bits) == (8000, 1, 16)
    assert got.tolist() == want.tolist()  # floor semantics, negatives too
    # factor=1 identity
    out1 = bytes(resample_audio_box(df, factor=1).collect()[0]["payload"])
    assert decode_audio(out1)[3] == rng_x.tobytes()
    # compressed input flows straight through the dispatch
    loud = np.full(320, 8000, dtype=np.int16)
    g = spark.createDataFrame(
        [(1, bytearray(encode_wav_g711(loud.tobytes(), rate=8000)))],
        "media_id long, payload binary",
    )
    rate2, _c, _b, pcm2 = decode_audio(
        bytes(resample_audio_box(g, factor=2).collect()[0]["payload"])
    )
    assert rate2 == 4000 and len(pcm2) == 320  # 160 samples * 2 bytes


# ------------------------------------------------------ MJPEG AVI ---


def _gradient_jpegs(w, h, nf):
    from adtl_spark.operators.jpeg_lite import encode_jpeg

    x = np.arange(w)[None, :, None]
    y = np.arange(h)[:, None, None]
    c = np.arange(3)[None, None, :]
    return [
        encode_jpeg(
            w,
            h,
            (x + y + c * 17 + f * 5).astype(np.uint8).tobytes(),
            quality=92,
            subsampling="444",
        )
        for f in range(nf)
    ]


def test_avi_mux_demux_frame_byte_identity():
    """Frames come back byte-for-byte through the movi walk; meta reads
    the stream header's rate/scale and the ACTUAL chunk count."""
    from adtl_spark.operators.multimodal import (
        decode_avi_frame,
        decode_avi_meta,
        mux_avi_mjpeg,
    )

    frames = _gradient_jpegs(20, 18, 5)
    avi = mux_avi_mjpeg(frames, fps=4, width=20, height=18)
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    assert decode_avi_meta(avi) == (5, 4, 20, 18)
    for i, f in enumerate(frames):
        assert decode_avi_frame(avi, i) == f
    with pytest.raises(ValueError, match="out of range"):
        decode_avi_frame(avi, 5)


def test_avi_word_alignment_with_odd_chunk_sizes():
    """RIFF chunks are word-aligned: an odd-length frame must not shift
    subsequent chunk parsing."""
    from adtl_spark.operators.multimodal import (
        decode_avi_frame,
        decode_avi_meta,
        mux_avi_mjpeg,
    )

    frames = [b"\xff\xd8\xff" + b"a" * 8, b"\xff\xd8\xff" + b"bb" * 5]
    avi = mux_avi_mjpeg(frames, fps=2, width=4, height=4)
    assert decode_avi_meta(avi)[0] == 2
    assert decode_avi_frame(avi, 0) == frames[0]
    assert decode_avi_frame(avi, 1) == frames[1]


def test_avi_idx1_offsets_point_at_frame_chunks():
    """The written idx1 entries resolve: movi_fourcc_pos + offset lands
    on a '00dc' fourcc whose size matches the index entry."""
    import struct

    from adtl_spark.operators.multimodal import mux_avi_mjpeg

    frames = _gradient_jpegs(16, 16, 3)
    avi = mux_avi_mjpeg(frames, fps=4, width=16, height=16)
    movi_pos = avi.index(b"movi")
    idx_pos = avi.index(b"idx1")
    (idx_size,) = struct.unpack("<I", avi[idx_pos + 4 : idx_pos + 8])
    assert idx_size == 16 * len(frames)
    for k in range(len(frames)):
        ent = avi[idx_pos + 8 + 16 * k : idx_pos + 8 + 16 * (k + 1)]
        ckid, _flags, off, ln = struct.unpack("<4sIII", ent)
        assert ckid == b"00dc"
        chunk_pos = movi_pos + off
        assert avi[chunk_pos : chunk_pos + 4] == b"00dc"
        (csize,) = struct.unpack("<I", avi[chunk_pos + 4 : chunk_pos + 8])
        assert csize == ln == len(frames[k])


def test_avi_audio_interleave_roundtrip_and_vad():
    """An interleaved PCM soundtrack survives mux -> demux
    byte-for-byte (tail chunks past the last video frame included), the
    WAVEFORMATEX facts come back, the video frames stay byte-identical
    next to the audio chunks, and a video-only file raises."""
    from adtl_spark.operators.multimodal import (
        decode_audio,
        decode_avi_audio,
        decode_avi_frame,
        decode_avi_meta,
        mux_avi_mjpeg,
        pcm_to_wav,
    )

    frames = _gradient_jpegs(16, 16, 3)
    pcm = np.concatenate(
        [np.full(160, a, dtype=np.int16) for a in (0, 8000, 0, 8000, 0, 0, 8000)]
    ).tobytes()
    avi = mux_avi_mjpeg(frames, 4, 16, 16, audio=(8000, pcm))
    assert decode_avi_meta(avi) == (3, 4, 16, 16)
    for i, f in enumerate(frames):
        assert decode_avi_frame(avi, i) == f
    rate, ch, bits, got = decode_avi_audio(avi)
    assert (rate, ch, bits) == (8000, 1, 16) and got == pcm
    # soundtrack longer than the video: tail chunks still land
    avi2 = mux_avi_mjpeg(frames, 4, 16, 16, audio=(8000, pcm * 3))
    assert decode_avi_audio(avi2)[3] == pcm * 3
    # the rewrap adapter feeds the WAV-payload operators
    assert decode_audio(pcm_to_wav(rate, ch, bits, got)) == (
        8000, 1, 16, pcm,
    )
    with pytest.raises(ValueError, match="no audio stream"):
        decode_avi_audio(mux_avi_mjpeg(frames, 4, 16, 16))


def test_sample_video_frames_routes_avi_and_legacy_identically(spark):
    """The same schedule over the same frames in BOTH containers yields
    the same (frame_idx, ts_ms) rows and near-identical pixels (JPEG
    loss <= 3 on smooth gradients)."""
    from adtl_spark.operators import multimodal as M

    w, h, nf = 16, 16, 6
    jpegs = _gradient_jpegs(w, h, nf)
    # decode each jpeg to P6 for the legacy container so pixel sources match
    from adtl_spark.operators.jpeg_lite import decode_jpeg

    p6 = [
        f"P6\n{w} {h}\n255\n".encode() + decode_jpeg(j)[2] for j in jpegs
    ]
    df = spark.createDataFrame(
        [
            (1, bytearray(M.mux_avi_mjpeg(jpegs, 4, w, h))),
            (2, bytearray(M.encode_video(p6, fps=4))),
        ],
        "media_id long, payload binary",
    )
    rows = M.sample_video_frames(df, every_ms=500).collect()
    avi = sorted(
        [(r["frame_idx"], r["ts_ms"], bytes(r["payload"])) for r in rows if r["media_id"] == 1]
    )
    leg = sorted(
        [(r["frame_idx"], r["ts_ms"], bytes(r["payload"])) for r in rows if r["media_id"] == 2]
    )
    assert [(f, t) for f, t, _ in avi] == [(f, t) for f, t, _ in leg]
    assert len(avi) == 3  # duration 1500 ms / 500
    for (_, _, pa), (_, _, pl) in zip(avi, leg):
        assert pa == pl  # both decode the same JPEG through the same codec


# -------------------------------------------------- URL edge cases ---


def test_normalize_url_queryless_and_fragment_question_mark(spark):
    from adtl_spark.operators.text import normalize_url

    df = spark.createDataFrame(
        [
            ("HTTP://A.com:80/b",),  # no query, no fragment
            ("http://a.com/b#frag",),  # fragment only
            ("http://a.com/b#sec?x=1",),  # '?' only inside the fragment
            ("http://a.com/b?z=1&a=2#s?y",),  # query AND '?' in fragment
        ],
        "url string",
    )
    got = [r[0] for r in df.select(normalize_url(F.col("url"))).collect()]
    assert got == [
        "http://a.com/b",
        "http://a.com/b",
        "http://a.com/b",
        "http://a.com/b?a=2&z=1",
    ]


def test_normalize_url_sql_twin_matches_on_edge_cases():
    duckdb = pytest.importorskip("duckdb")
    from adtl_spark.operators.text import normalize_url_expr_sql

    con = duckdb.connect()
    expr = normalize_url_expr_sql("url")
    got = con.execute(
        f"""SELECT {expr} FROM (VALUES
            ('HTTP://A.com:80/b'),
            ('http://a.com/b#frag'),
            ('http://a.com/b#sec?x=1'),
            ('http://a.com/b?z=1&a=2#s?y')) t(url)"""
    ).fetchall()
    assert [r[0] for r in got] == [
        "http://a.com/b",
        "http://a.com/b",
        "http://a.com/b",
        "http://a.com/b?a=2&z=1",
    ]


# ------------------------------------------- atomic index appends ---


def _bm25_rows(spark, path, qdf):
    from adtl_spark.operators.retrieval import bm25_query_index

    return sorted(
        (r["query_id"], r["doc_id"], r["rank"])
        for r in bm25_query_index(spark, path, qdf, k=5, n_buckets=8).collect()
    )


def test_append_crash_between_steps_serves_pre_append_state(spark, tmp_path):
    """The staged-commit contract: an append that dies at ANY point
    before its commit marker leaves served results exactly equal to the
    pre-append state, and retrying the batch is safe (no double count).
    Crash is simulated at the worst point — every component written,
    marker missing — plus an earlier partial (postings-only) orphan."""
    from adtl_spark.operators import retrieval as R

    base = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta beta delta"), (3, "gamma alpha")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(4, "alpha alpha epsilon"), (5, "delta gamma")],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [(0, "alpha delta"), (1, "beta gamma")], "query_id long, query string"
    )
    path = str(tmp_path / "idx")
    R.write_search_index(base, path, n_buckets=8)
    before = _bm25_rows(spark, path, qdf)

    # crash simulation 1: full append, then strip its commit marker --
    # identical on-disk state to dying between the stats write and commit
    R.append_to_search_index(batch, path, n_buckets=8)
    committed, all_gens = R._delta_gens(spark, path)
    assert committed == all_gens == [1]
    import shutil

    shutil.rmtree(tmp_path / "idx" / "delta" / "1" / "commit")
    assert R._delta_gens(spark, path) == ([], [1])
    assert _bm25_rows(spark, path, qdf) == before

    # crash simulation 2: an even earlier death (postings only, no
    # lexicon/docs/stats) must equally be invisible
    batch.limit(1).selectExpr(
        "doc_id as id", "'x' as token", "CAST(1 AS LONG) as tf",
        "CAST(0 AS INT) as bucket",
    ).write.partitionBy("bucket").parquet(str(tmp_path / "idx/delta/2/postings"))
    assert R._delta_gens(spark, path) == ([], [1, 2])
    assert _bm25_rows(spark, path, qdf) == before

    # retry is safe: the new generation skips the orphans entirely
    R.append_to_search_index(batch, path, n_buckets=8)
    assert R._delta_gens(spark, path)[0] == [3]
    full = str(tmp_path / "full")
    R.write_search_index(base.unionByName(batch), full, n_buckets=8)
    assert _bm25_rows(spark, path, qdf) == _bm25_rows(spark, full, qdf)


def test_compact_search_index_preserves_results_and_reclaims(spark, tmp_path):
    """Compaction folds committed generations into the base (identical
    query results, delta tree gone — orphans included) and is a no-op
    rebuilding nothing when there are no deltas."""
    from adtl_spark.operators import retrieval as R

    docs = spark.createDataFrame(
        [(i, f"tok{i % 3} tok{i % 5} alpha") for i in range(10)],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [(0, "tok1 alpha"), (1, "tok2 tok4")], "query_id long, query string"
    )
    path = str(tmp_path / "idx")
    R.write_search_index(docs.filter("doc_id < 4"), path, n_buckets=8)
    R.append_to_search_index(docs.filter("doc_id >= 4 and doc_id < 7"), path)
    R.append_to_search_index(docs.filter("doc_id >= 7"), path)
    # plus one orphan from a "crashed" append
    import shutil

    shutil.rmtree(tmp_path / "idx" / "delta" / "2" / "commit")
    want = _bm25_rows(spark, path, qdf)
    assert want  # non-trivial
    # wait: gen 2 was one of the two committed appends; recompute truth
    # against a from-scratch index over what is actually committed
    visible = docs.filter("doc_id < 7")
    full = str(tmp_path / "full")
    R.write_search_index(visible, full, n_buckets=8)
    assert want == _bm25_rows(spark, full, qdf)
    R.compact_search_index(spark, path)
    assert R._delta_gens(spark, path) == ([], [])
    assert _bm25_rows(spark, path, qdf) == want
    # append after compaction starts a fresh generation line
    R.append_to_search_index(docs.filter("doc_id >= 7"), path)
    full2 = str(tmp_path / "full2")
    R.write_search_index(docs, full2, n_buckets=8)
    assert _bm25_rows(spark, path, qdf) == _bm25_rows(spark, full2, qdf)


# ------------------------------------------- leakage-safe splits ---


def test_split_leakage_safe_no_pair_straddles_splits(spark):
    """The contamination property: over a MULTI-HOP pair relation (a-b,
    b-c chains — where per-pair checks alone would not imply per-cluster
    agreement), every connected component lands in exactly one split;
    singletons split by their own id exactly like train_test_split."""
    from adtl_spark.operators.sampling import (
        split_leakage_safe,
        train_test_split,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string"
    )
    # chains 0-1-2, 3-4, 10-11-12-13, plus scattered singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (10, 11), (11, 12), (12, 13)],
        "id_a long, id_b long",
    )
    out = split_leakage_safe(
        docs, pairs, {"train": 0.7, "test": 0.3}
    ).collect()
    split = {r["doc_id"]: r["split"] for r in out}
    key = {r["doc_id"]: r["split_key"] for r in out}
    assert len(split) == 40
    for cluster in ([0, 1, 2], [3, 4], [10, 11, 12, 13]):
        assert len({split[d] for d in cluster}) == 1
        assert {key[d] for d in cluster} == {min(cluster)}
    # singletons behave exactly like the plain splitter
    plain = {
        r["doc_id"]: r["split"]
        for r in train_test_split(docs, {"train": 0.7, "test": 0.3}).collect()
    }
    for d in range(40):
        if d not in (0, 1, 2, 3, 4, 10, 11, 12, 13):
            assert split[d] == plain[d] and key[d] == d


# ------------------------------------- streaming paragraph dedup ---


def test_paragraph_freq_maintained_on_stream_equals_batch(spark, tmp_path):
    """The paragraph-frequency store maintained via foreachBatch across
    micro-batch boundaries scores documents EXACTLY like a one-shot
    paragraph_dedup over the full corpus — including a boilerplate
    paragraph that only crosses the min_df threshold across different
    micro-batches; replaying a delta (at-least-once) changes nothing."""
    from adtl_spark.operators.dedup import (
        paragraph_dedup,
        paragraph_dedup_apply,
        paragraph_freq,
    )
    from adtl_spark.streaming.pipeline import (
        paragraph_freq_sink,
        paragraph_store_freq,
    )

    boiler = "subscribe to our newsletter"
    docs = [
        (1, f"unique one\n\n{boiler}"),
        (2, "unique two\n\nsecond thoughts"),
        (3, f"unique three\n\n{boiler}"),  # crosses min_df only w/ batch 1
        (4, f"{boiler}\n\nunique four"),
        (5, "all alone here"),
        (6, f"unique six\n\n{boiler}\n\nunique six again"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    src = tmp_path / "pd_stream"
    src.mkdir()
    for i, pred in enumerate(("doc_id <= 2", "doc_id IN (3, 4)", "doc_id >= 5")):
        df.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"p{i}")
        )
    store = str(tmp_path / "pd_store")
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src) + "/*")
    q = stream.writeStream.foreachBatch(paragraph_freq_sink(store)).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    freq = paragraph_store_freq(spark, store)
    got = sorted(
        tuple(r) for r in paragraph_dedup_apply(df, freq, min_df=2).collect()
    )
    want = sorted(tuple(r) for r in paragraph_dedup(df, min_df=2).collect())
    assert got == want
    # the cross-batch boilerplate was actually removed (not a vacuous pass)
    by_id = {r[0]: r for r in got}
    assert by_id[3][3] == 1 and boiler not in by_id[3][1]
    # replaying a batch's delta is idempotent: overwrite, not append
    batch0 = df.filter("doc_id <= 2")
    paragraph_freq_sink(store)(batch0, 0)
    freq2 = paragraph_store_freq(spark, store)
    got2 = sorted(
        tuple(r) for r in paragraph_dedup_apply(df, freq2, min_df=2).collect()
    )
    assert got2 == want
    # the maintained relation itself equals from-scratch paragraph_freq
    want_freq = sorted(tuple(r) for r in paragraph_freq(df).collect())
    got_freq = sorted(tuple(r) for r in freq2.collect())
    assert got_freq == want_freq


# ------------------------------------------- index meta memoization ---


def test_index_buckets_memoized_and_invalidated_on_rebuild(spark, tmp_path):
    """The meta-sidecar read happens once per index path (serving-path
    latency fix); an in-process REBUILD with a different bucket count
    invalidates, and the explicit-argument fail-fast still fires from
    the memoized value."""
    from adtl_spark.operators import retrieval as R

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    path = str(tmp_path / "idx")
    R.write_search_index(docs, path, n_buckets=4)
    assert R._index_buckets(spark, path, None) == 4
    assert path in R._INDEX_META_CACHE
    # poison the cache to prove the second resolve never re-reads parquet
    R._INDEX_META_CACHE[path] = 4
    assert R._index_buckets(spark, path, 4) == 4
    with pytest.raises(ValueError, match="n_buckets=4"):
        R._index_buckets(spark, path, 8)
    # rebuild with a different layout must invalidate and re-read
    R.write_search_index(docs, path, n_buckets=2)
    assert R._index_buckets(spark, path, None) == 2
