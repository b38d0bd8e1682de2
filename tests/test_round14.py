"""Round-14 block: priority frontier scheduling + host normalization,
cardinality-preserving charset decode, MPEG-sync audio dispatch, and
(as they land) modern-PDF xref/ObjStm, progressive JPEG, and MPEG-1
Layer I/II decode."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# schedule_frontier: host normalization + priority ordering


def test_schedule_frontier_strips_userinfo_and_port(spark):
    """Decorated authorities (userinfo, port, case) must share the bare
    host's politeness queue AND its broadcast Crawl-delay — a raw
    authority key would split them into separate queues silently."""
    from adtl_spark.operators.text import schedule_frontier

    urls = spark.createDataFrame(
        [
            ("http://h.test/a",),
            ("http://crawler@h.test/b",),
            ("http://H.test:8080/c",),
            ("http://u:pw@H.TEST:80/d",),
        ],
        "url string",
    )
    delays = spark.createDataFrame(
        [("h.test", 700)], "host string, delay_ms long"
    )
    rows = (
        schedule_frontier(urls, delays, default_delay_ms=9999)
        .orderBy("fetch_seq")
        .collect()
    )
    assert {r.host for r in rows} == {"h.test"}
    assert [r.fetch_seq for r in rows] == [1, 2, 3, 4]
    # all four take h.test's delay, never the default
    assert [r.fetch_after_ms for r in rows] == [0, 700, 1400, 2100]


def test_schedule_frontier_priority_ordering(spark):
    """priority_col reorders each host's queue descending, URL string
    as the tie-break; fetch_after_ms follows the new sequence."""
    from adtl_spark.operators.text import schedule_frontier

    urls = spark.createDataFrame(
        [
            ("http://h.test/low", 1),
            ("http://h.test/hi", 9),
            ("http://h.test/tie-b", 5),
            ("http://h.test/tie-a", 5),
            ("http://other.test/solo", 0),
        ],
        "url string, priority int",
    )
    out = (
        schedule_frontier(urls, default_delay_ms=100, priority_col="priority")
        .orderBy("host", "fetch_seq")
        .collect()
    )
    h = [r.url for r in out if r.host == "h.test"]
    assert h == [
        "http://h.test/hi",
        "http://h.test/tie-a",
        "http://h.test/tie-b",
        "http://h.test/low",
    ]
    assert [r.fetch_after_ms for r in out if r.host == "h.test"] == [
        0, 100, 200, 300,
    ]
    assert [r.fetch_seq for r in out if r.host == "other.test"] == [1]


# ---------------------------------------------------------------------------
# http_text_records: cardinality preservation


def test_http_text_records_null_payload_rows_survive(spark):
    """A NULL payload yields a (NULL, NULL, NULL) row, never a dropped
    one — record counts in must equal record counts out."""
    from adtl_spark.sources.io import http_text_records

    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nhello"
    recs = spark.createDataFrame(
        [("u1", body), ("u2", None), ("u3", body)],
        "target_uri string, content binary",
    )
    out = http_text_records(recs, passthrough=("target_uri",)).orderBy(
        "target_uri"
    )
    rows = out.collect()
    assert len(rows) == 3
    null_row = rows[1]
    assert null_row.target_uri == "u2"
    assert null_row.http_status is None
    assert null_row.charset is None
    assert null_row.text is None
    assert rows[0].http_status == 200 and rows[0].text == "hello"


# ---------------------------------------------------------------------------
# decode_audio: MPEG sync dispatch


def test_decode_audio_routes_all_mpeg_sync_variants():
    """MPEG-2/2.5 and protection-bit sync bytes must reach the mp3
    registry seam instead of 'unrecognized audio payload'."""
    from adtl_spark.operators import multimodal as M

    seen = []

    def spy(payload):
        seen.append(bytes(payload[:2]))
        return (8000, 1, 16, b"\x00\x00")

    for first2 in (b"\xff\xfb", b"\xff\xf3", b"\xff\xf2", b"\xff\xfa",
                   b"\xff\xe2"):
        M.decode_audio(first2 + b"\x90\x00rest", {"mp3": spy})
    assert len(seen) == 5
    # a non-sync 0xFF prefix still fails loudly
    with pytest.raises(ValueError, match="unrecognized audio"):
        M.decode_audio(b"\xff\x1b\x90\x00", {"mp3": spy})


# ---------------------------------------------------------------------------
# Modern PDF layouts: xref streams + object streams


def _modern_pages():
    return [["Hello (world) \\ one", "line two"], ["page 2"], ["p3 àé"]]


def test_pdf_modern_roundtrip_all_variants():
    from adtl_spark.operators.pdf_lite import build_pdf_modern, pdf_pages

    pages = _modern_pages()
    want = ["\n".join(p) for p in pages]
    for predictor in (True, False):
        for compress in (True, False):
            payload = build_pdf_modern(
                pages, compress=compress, predictor=predictor
            )
            assert pdf_pages(payload) == want, (predictor, compress)
    payload = build_pdf_modern(pages)
    # really the modern layout: xref stream + ObjStm, no classic trailer
    assert b"trailer" not in payload
    assert b"/Type /XRef" in payload and b"/Type /ObjStm" in payload


def test_pdf_modern_xref_decides_liveness_on_incremental_update():
    """A stale top-level copy of an ObjStm member (the incremental-
    update shape) must lose to the xref stream's type-2 entry."""
    from adtl_spark.operators.pdf_lite import build_pdf_modern, pdf_pages

    pages = [["live text"]]
    payload = build_pdf_modern(pages)
    stale = (
        b"4 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 999 0 R >>\n"
        b"endobj\n"
    )
    assert pdf_pages(payload + stale) == ["live text"]


def test_pdf_png_unpredict_filters():
    from adtl_spark.operators.pdf_lite import _png_unpredict

    raw = bytes([1, 2, 3, 4, 5, 6])  # two rows of three columns
    # Sub filter: row[i] += row[i-1]
    sub = bytes([1, 1, 1, 1]) + bytes([1, 4, 1, 1])
    assert _png_unpredict(sub, 3, 12) == bytes([1, 2, 3, 4, 5, 6])
    # Up filter round trip
    up = bytes([2, 1, 2, 3]) + bytes([2, 3, 3, 3])
    assert _png_unpredict(up, 3, 12) == raw
    # predictor 1 = identity
    assert _png_unpredict(b"anything", 99, 1) == b"anything"
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        _png_unpredict(b"\x00" * 4, 3, 2)


# ---------------------------------------------------------------------------
# Progressive JPEG


def test_jpeg_progressive_matches_baseline_exactly():
    """Same quantization => a progressive re-encode must decode to the
    IDENTICAL pixels the baseline encode of the same image decodes to."""
    import numpy as np

    from adtl_spark.operators.jpeg_lite import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(3)
    for (w, h, q) in [(16, 16, 90), (13, 9, 75), (56, 40, 20), (8, 8, 95)]:
        rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
        base = decode_jpeg(encode_jpeg(w, h, rgb, quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(w, h, rgb, quality=q))
        assert base == prog, (w, h, q)
    gray = rng.randint(0, 256, size=(9, 11), dtype=np.uint8).tobytes()
    assert decode_jpeg(
        encode_jpeg(11, 9, gray, quality=85, gray=True)
    ) == decode_jpeg(encode_jpeg_progressive(11, 9, gray, quality=85, gray=True))


def test_jpeg_progressive_multiblock_eob_run():
    """Hand-built two-block progressive stream using EOB runs that span
    blocks (what libjpeg emits, which our per-block encoder does not):
    the run must skip whole blocks in first scans and consume correction
    bits across blocks in refinement scans."""
    import struct

    import numpy as np

    from adtl_spark.operators import jpeg_lite as J

    dc_codes = J._canonical_codes(J._DC_BITS, J._DC_VALS)
    # custom AC table: the module's shared table has no EOBn (r>0)
    # symbols — that is exactly the path under test here
    ac_bits = [0, 3, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    ac_vals = [0x00, 0x01, 0x10]
    ac_codes = J._canonical_codes(ac_bits, ac_vals)
    ones = np.ones((8, 8), dtype=np.int32)

    out = bytearray(b"\xff\xd8")
    out += J._dqt_segment(0, ones)
    sof = struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += J._dht_segment(0, 0, J._DC_BITS, J._DC_VALS)
    out += J._dht_segment(1, 0, ac_bits, ac_vals)

    def sos(ss, se, ah, al):
        body = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body

    # DC first scan, Al=0: dc values 40 and 48 (diffs 40, +8)
    w = J._BitWriter()
    for diff in (40, 8):
        size = J._category(diff)
        code, length = dc_codes[size]
        w.write(code, length)
        w.write(J._amplitude(diff, size), size)
    out += sos(0, 0, 0, 0) + w.flush()

    # AC first scan, Al=1: block 1 codes +1 at k=1 then EOB1 with extra
    # bit 0 => eobrun covers block 2 entirely (block 2 has no AC here)
    w = J._BitWriter()
    code, length = ac_codes[0x01]  # run 0, size 1
    w.write(code, length)
    w.write(1, 1)  # amplitude +1
    code, length = ac_codes[0x10]  # EOBn, r=1
    w.write(code, length)
    w.write(0, 1)  # extension bits: run length 2^1 + 0 = 2 blocks
    out += sos(1, 63, 0, 1) + w.flush()

    # AC refinement to Al=0: block 2 first becomes significant (+1 at
    # k=2), then EOB1 run covering... block layout: block1 has history
    # coef 2 at k=1; emit EOB2-run immediately: sym 0x10 + ext 0 covers
    # blocks 1 and 2 via the eobrun tail, whose correction bits are:
    # block1 k=1 (bit 1 -> 2 becomes 3); block 2 has no nonzero: none.
    w = J._BitWriter()
    code, length = ac_codes[0x10]
    w.write(code, length)
    w.write(0, 1)
    w.write(1, 1)  # correction bit for block1 k=1: 2 -> 3
    out += sos(1, 63, 1, 0) + w.flush()
    out += b"\xff\xd9"

    gw, gh, rgb = J.decode_jpeg(bytes(out))
    assert (gw, gh) == (16, 8)
    got = np.frombuffer(rgb, np.uint8).reshape(8, 16, 3)[:, :, 0]

    # expected: block1 coefs DC=40, k=1 (natural (0,1)) = 3; block2 DC=48
    def idct(coefs):
        return np.clip(
            np.round(J._DCT_M.T @ coefs @ J._DCT_M + 128.0), 0, 255
        ).astype(np.uint8)

    c1 = np.zeros((8, 8)); c1[0, 0] = 40; c1[0, 1] = 3
    c2 = np.zeros((8, 8)); c2[0, 0] = 48
    expected = np.concatenate([idct(c1), idct(c2)], axis=1)
    assert np.array_equal(got, expected)


# ---------------------------------------------------------------------------
# MPEG-1 Layer I/II decode (mp2_lite)


def _chirp_pcm(n, amp=0.5, rate=48000):
    import numpy as np

    t = np.arange(n)
    x = amp * np.sin(2 * np.pi * (300 + 2.0e-2 * t) * t / rate)
    return np.round(x * 32767).astype("<i2")


def _best_lag_snr(y, x, lo=1500, hi=3800):
    import numpy as np

    best = (-1, -1e9, 0.0)
    for lag in range(440, 540):
        a = y[lo:hi]
        b = x[lo - lag : hi - lag]
        g = (a @ b) / max((b @ b), 1.0)
        err = a - g * b
        s = 10 * np.log10((b**2).sum() / max((err**2).sum(), 1e-9))
        if s > best[1]:
            best = (lag, s, g)
    return best


def test_mp2_roundtrip_mono_and_stereo():
    import numpy as np

    from adtl_spark.operators.mp2_lite import decode_mpeg_audio, encode_mp2

    pcm = _chirp_pcm(4 * 1152)
    r, ch, bits, out = decode_mpeg_audio(
        encode_mp2(pcm.tobytes(), channels=1, kbps=320)
    )
    assert (r, ch, bits) == (48000, 1, 16)
    y = np.frombuffer(out, "<i2").astype(float)
    lag, snr, gain = _best_lag_snr(y, pcm.astype(float))
    assert lag == 480, "polyphase delay must be the filterbank's 480"
    assert snr > 40, snr
    assert 0.9 < gain < 1.1

    st = np.stack([pcm, pcm // 2], axis=1).reshape(-1)
    r, ch, _b, out = decode_mpeg_audio(
        encode_mp2(st.tobytes(), channels=2, kbps=384)
    )
    assert ch == 2
    y = np.frombuffer(out, "<i2").astype(float).reshape(-1, 2)
    for c, ref in ((0, pcm), (1, pcm // 2)):
        lag, snr, gain = _best_lag_snr(y[:, c], ref.astype(float))
        assert lag == 480 and snr > 18, (c, lag, snr)


def test_mp1_roundtrip():
    import numpy as np

    from adtl_spark.operators.mp2_lite import decode_mpeg_audio, encode_mp1

    pcm = _chirp_pcm(12 * 384)
    r, ch, bits, out = decode_mpeg_audio(
        encode_mp1(pcm.tobytes(), channels=1, kbps=448)
    )
    assert (r, ch, bits) == (48000, 1, 16)
    y = np.frombuffer(out, "<i2").astype(float)
    lag, snr, _g = _best_lag_snr(y, pcm.astype(float))
    assert lag == 480 and snr > 35, (lag, snr)


def test_mp2_intensity_joint_stereo_collapses_above_bound():
    """Above the joint bound both channels reconstruct the transmitted
    channel mean; below it they stay independent."""
    import numpy as np

    from adtl_spark.operators.mp2_lite import decode_mpeg_audio, encode_mp2

    rate = 48000
    t = np.arange(4 * 1152)
    # low tone differs per channel (below bound 8 => subband < 8:
    # < 6 kHz); high tone identical-frequency but ch1 is silent there
    lo0 = 0.4 * np.sin(2 * np.pi * 700 * t / rate)
    lo1 = 0.4 * np.sin(2 * np.pi * 1900 * t / rate)
    hi = 0.3 * np.sin(2 * np.pi * 9000 * t / rate)
    ch0 = np.round((lo0 + hi) * 32767).astype("<i2")
    ch1 = np.round(lo1 * 32767).astype("<i2")
    st = np.stack([ch0, ch1], axis=1).reshape(-1)
    enc = encode_mp2(st.tobytes(), channels=2, kbps=384, joint_bound=8)
    _r, ch, _b, out = decode_mpeg_audio(enc)
    assert ch == 2
    y = np.frombuffer(out, "<i2").astype(float).reshape(-1, 2)
    # both output channels must carry the 9 kHz mean component at
    # roughly half the original amplitude: correlate with the shifted
    # carrier (delay 480)
    carrier = hi * 32767
    seg = slice(1500, 3800)
    for c in range(2):
        a = y[seg, c]
        b = carrier[1500 - 480 : 3800 - 480]
        g = (a @ b) / (b @ b)
        assert 0.35 < g < 0.65, (c, g)  # mean of (hi, 0) = hi/2
    # below the bound the channels stay distinct: 700 Hz only on ch0
    b700 = (lo0 * 32767)[1500 - 480 : 3800 - 480]
    g0 = (y[seg, 0] @ b700) / (b700 @ b700)
    g1 = (y[seg, 1] @ b700) / (b700 @ b700)
    assert g0 > 0.8 and abs(g1) < 0.15, (g0, g1)


def test_mpeg_decode_scope_errors():
    import pytest as _pytest

    from adtl_spark.operators import multimodal as M
    from adtl_spark.operators.mp2_lite import decode_mpeg_audio, encode_mp2

    # Layer III through the full dispatch names the registry seam
    l3 = M.build_mpeg_audio([128, 128], layer=3)
    with _pytest.raises(NotImplementedError, match="register_decoder"):
        M.decode_audio(l3)
    # MPEG-2 (LSF) and low-rate MPEG-1 frames now DECODE (round 15;
    # all-zero allocation bodies -> silence at the right rate)
    l2_lsf = M.build_mpeg_audio([64, 64], version="2", layer=2, rate=24000)
    rate, nch, bits, pcm = decode_mpeg_audio(l2_lsf)
    assert (rate, nch, bits) == (24000, 2, 16)
    lo = encode_mp2(_chirp_pcm(1152).tobytes(), channels=1, kbps=48)
    rate, nch, bits, pcm = decode_mpeg_audio(lo)
    assert (rate, nch, bits) == (48000, 1, 16)
    # junk raises ValueError, never NotImplementedError
    with _pytest.raises(ValueError):
        decode_mpeg_audio(b"ID3\x04\x00\x00\x00\x00\x00\x00junk")


def test_mp2_decodes_through_audio_operators(spark):
    """A Layer-II payload flows through the real decode_audio-based
    operators (extract_audio_features) with correct rate/channels."""
    from adtl_spark.operators import multimodal as M
    from adtl_spark.operators.mp2_lite import encode_mp2

    pcm = _chirp_pcm(2 * 1152)
    payload = encode_mp2(pcm.tobytes(), channels=1, kbps=320)
    df = spark.createDataFrame(
        [(1, payload)], "media_id long, payload binary"
    )
    row = M.extract_audio_features(df).collect()[0]
    assert (row["sample_rate"], row["channels"], row["bits"]) == (
        48000, 1, 16,
    )
    assert row["n_samples"] == 2 * 1152


def test_sharpness_and_dhash_operators_accept_progressive(spark):
    """The corpus screens must consume progressive payloads through the
    decode_image dispatch and agree with the baseline encode of the
    same pixels (identical quantized coefficients => identical stats)."""
    import numpy as np

    from adtl_spark.operators import multimodal as M
    from adtl_spark.operators.jpeg_lite import (
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(5)
    rows = []
    for i in range(4):
        w, h = 16 + i, 12 + i
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
        rows.append((2 * i, encode_jpeg(w, h, img, quality=85)))
        rows.append((2 * i + 1, encode_jpeg_progressive(w, h, img, quality=85)))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    sharp = {r.media_id: (r.n_interior, r.lap_sum)
             for r in M.image_sharpness(media).collect()}
    dh = {r.media_id: (r.dhash_lo, r.dhash_hi)
          for r in M.image_dhash(media).collect()}
    for i in range(4):
        assert sharp[2 * i] == sharp[2 * i + 1], i
        assert sharp[2 * i][0] is not None
        assert dh[2 * i] == dh[2 * i + 1], i
        assert dh[2 * i][0] is not None


def test_mp2_decodes_behind_id3v2_tag():
    import numpy as np

    from adtl_spark.operators.mp2_lite import decode_mpeg_audio, encode_mp2

    pcm = np.round(
        0.5 * np.sin(2 * np.pi * 1000 * np.arange(2 * 1152) / 48000) * 32767
    ).astype("<i2")
    enc = encode_mp2(pcm.tobytes(), channels=1, kbps=320)
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 64]) + b"\x00" * 64
    r, ch, bits, out = decode_mpeg_audio(id3 + enc)
    assert (r, ch, bits) == (48000, 1, 16)
    assert len(out) == 2 * 2 * 1152  # int16 mono, 2 frames


def test_pdf_indirect_length_streams_resolve():
    """/Length N 0 R (indirect, routine in incrementally-written PDFs)
    must resolve through the object table — including when the stream
    payload itself contains the literal bytes 'endstream', which would
    truncate the first-pass search-based extent."""
    import re as _re

    from adtl_spark.operators.pdf_lite import build_pdf, pdf_pages

    # identity-stream page whose text CONTAINS 'endstream'
    pages = [["before endstream after", "line two"]]
    payload = build_pdf(pages, compress=False)
    # rewrite the content stream's direct /Length to an indirect ref
    m = _re.search(rb"<< /Length (\d+) >>", payload)
    assert m is not None
    n = int(m.group(1))
    patched = (
        payload[: m.start()]
        + b"<< /Length 99 0 R >>"
        + payload[m.end() :]
        + b"99 0 obj\n%d\nendobj\n" % n
    )
    assert pdf_pages(patched) == ["before endstream after\nline two"]

    # compressed variant: indirect length on a Flate stream
    payload = build_pdf([["flate indirect"]], compress=True)
    m = _re.search(rb"<< /Filter /FlateDecode /Length (\d+) >>", payload)
    assert m is not None
    n = int(m.group(1))
    patched = (
        payload[: m.start()]
        + b"<< /Filter /FlateDecode /Length 99 0 R >>"
        + payload[m.end() :]
        + b"99 0 obj\n%d\nendobj\n" % n
    )
    assert pdf_pages(patched) == ["flate indirect"]


def test_jpeg_progressive_420_matches_baseline_420():
    """4:2:0 progressive (the dominant web layout: interleaved
    multi-block DC MCUs over the PADDED grid, per-component AC scans
    over the TRUE block grid) must decode byte-exactly to the baseline
    4:2:0 encode of the same pixels."""
    import numpy as np

    from adtl_spark.operators.jpeg_lite import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(17)
    for (w, h, q) in [(16, 16, 90), (13, 9, 85), (24, 17, 75)]:
        rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
        base = decode_jpeg(encode_jpeg(w, h, rgb, quality=q, subsampling="420"))
        prog = decode_jpeg(
            encode_jpeg_progressive(w, h, rgb, quality=q, subsampling="420")
        )
        assert base == prog, (w, h, q)


# ---------------------------------------------------------------------------
# Real-file robustness paths: progressive restarts, CRC frames, W[0]=0


def test_jpeg_progressive_restart_markers():
    """Progressive scans WITH restart intervals (DRI + RSTn, common in
    camera/producer output) must reset DC predictors and EOB runs at
    each marker — hand-built 4-block stream, pixel math checked."""
    import struct

    import numpy as np

    from adtl_spark.operators import jpeg_lite as J

    dc_codes = J._canonical_codes(J._DC_BITS, J._DC_VALS)
    ones = np.ones((8, 8), dtype=np.int32)
    out = bytearray(b"\xff\xd8")
    out += J._dqt_segment(0, ones)
    sof = struct.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    out += J._dht_segment(0, 0, J._DC_BITS, J._DC_VALS)
    ac_bits = [0, 1] + [0] * 14
    ac_vals = [0x00]
    out += J._dht_segment(1, 0, ac_bits, ac_vals)
    out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 2)

    def sos(ss, se, ah, al):
        body = bytes([1, 1, 0x00, ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body

    dcs = [10, 20, 30, 40]
    out += sos(0, 0, 0, 0)
    w = J._BitWriter()
    pred = 0
    for i, dc in enumerate(dcs):
        if i and i % 2 == 0:
            out += w.flush()
            out += bytes([0xFF, 0xD0 + (i // 2 - 1) % 8])
            w = J._BitWriter()
            pred = 0  # restart resets the predictor
        diff = dc - pred
        pred = dc
        size = J._category(diff)
        code, length = dc_codes[size]
        w.write(code, length)
        if size:
            w.write(J._amplitude(diff, size), size)
    out += w.flush()
    out += sos(1, 63, 0, 0)
    acc = J._canonical_codes(ac_bits, ac_vals)
    w = J._BitWriter()
    for i in range(4):
        if i and i % 2 == 0:
            out += w.flush()
            out += bytes([0xFF, 0xD0 + (i // 2 - 1) % 8])
            w = J._BitWriter()
        code, length = acc[0x00]
        w.write(code, length)
    out += w.flush()
    out += b"\xff\xd9"

    gw, gh, rgb = J.decode_jpeg(bytes(out))
    assert (gw, gh) == (32, 8)
    got = np.frombuffer(rgb, np.uint8).reshape(8, 32, 3)[:, :, 0]
    expect = []
    for dc in dcs:
        blk = np.zeros((8, 8))
        blk[0, 0] = dc
        expect.append(
            np.clip(
                np.round(J._DCT_M.T @ blk @ J._DCT_M + 128.0), 0, 255
            ).astype(np.uint8)
        )
    assert np.array_equal(got, np.concatenate(expect, axis=1))


def test_mp2_crc_protected_frames_decode():
    """Frames with the protection bit set (CRC-16 after the header —
    standard in broadcast Layer II) must decode identically; the CRC
    bytes are skipped, not verified (documented)."""
    import numpy as np

    from adtl_spark.operators.mp2_lite import decode_mpeg_audio, encode_mp2

    pcm = np.round(
        0.5 * np.sin(2 * np.pi * 1000 * np.arange(2 * 1152) / 48000) * 32767
    ).astype("<i2")
    enc = encode_mp2(pcm.tobytes(), channels=1, kbps=320)
    fb = 144 * 320000 // 48000
    crc_frames = []
    for i in range(2):
        f = enc[i * fb : (i + 1) * fb]
        h = bytearray(f[:4])
        h[1] &= ~0x01  # protection bit 0 = CRC present
        # steal two trailing pad bytes for the CRC slot (the fixture
        # encoder always leaves padding slack at these bitrates)
        crc_frames.append(bytes(h) + b"\xbe\xef" + f[4:-2])
    assert decode_mpeg_audio(b"".join(crc_frames)) == decode_mpeg_audio(enc)


def test_pdf_xref_stream_w0_defaults_to_type1():
    """ISO 32000-1 §7.5.8.3: a zero-width first field means every entry
    is type 1 — producers emit W [0 n m] for offset-only tables."""
    from adtl_spark.operators.pdf_lite import _decode_xref_stream

    body = b"<< /Type /XRef /Size 3 /W [0 2 1] /Index [1 2] >>"
    stream = bytes([0, 50, 0, 0, 99, 0])
    assert _decode_xref_stream(body, stream) == {
        1: (1, 50, 0),
        2: (1, 99, 0),
    }


def test_schedule_frontier_banded_equals_plain(spark):
    """banded_numbering must produce the identical fetch plan the plain
    per-host window produces — including under host skew and with a
    priority column — while no window partition holds a whole host."""
    from adtl_spark.operators.text import schedule_frontier

    d = F.col("id")
    urls = spark.range(0, 4000).select(
        F.concat(
            F.lit("http://h"),
            F.when(d % 2 == 0, F.lit(0)).otherwise(d % 17).cast("string"),
            F.lit(".test/p/"), d.cast("string"),
        ).alias("url"),
        (d % 5).cast("int").alias("priority"),
    )
    delays = spark.createDataFrame(
        [("h0.test", 100)], "host string, delay_ms long"
    )
    cols = ["url", "host", "shard", "fetch_seq", "fetch_after_ms"]
    for prio in (None, "priority"):
        plain = sorted(
            map(tuple, schedule_frontier(
                urls, delays, priority_col=prio
            ).select(cols).collect())
        )
        banded = sorted(
            map(tuple, schedule_frontier(
                urls, delays, priority_col=prio,
                banded_numbering=True, n_bands=37,
            ).select(cols).collect())
        )
        assert plain == banded, f"banded plan diverged (priority={prio})"
