"""Round-10 units: the WARC record-boundary fix (anchored Column split +
the strict Content-Length walker), html entity decode ordering, the
search-index bucket-count validation, the modularity hint removal, and
the stdlib PNG codec.  Each behavior here is either a fixed hazard from
the round-9 advice (payload collisions, &amp; double-decode, silent
bucket mis-routing, forced |V|-row broadcast) or a new decode path that
the registry gate value-checks end to end."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------ WARC boundaries ---

# A response whose PAYLOAD mentions the version string mid-line and after a
# single newline: a conformant reader keeps the record whole.  Before the
# boundary-anchored split, 'WARC/1.0\r\n' ANYWHERE fragmented the record.
WARC_COLLIDING = (
    "WARC/1.0\r\n"
    "WARC-Type: response\r\n"
    "WARC-Record-ID: <urn:uuid:aaa-111>\r\n"
    "WARC-Target-URI: http://example.com/a\r\n"
    "Content-Length: 32\r\n"
    "\r\n"
    "the spec says:\nWARC/1.0\r\nis fine\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: conversion\r\n"
    "WARC-Record-ID: <urn:uuid:bbb-222>\r\n"
    "WARC-Target-URI: http://example.com/b\r\n"
    "Content-Length: 5\r\n"
    "\r\n"
    "hello\r\n"
)

# A payload containing a FULL record boundary (blank line + version line):
# only the strict Content-Length walker keeps this one whole.
WARC_BOUNDARY_IN_PAYLOAD = (
    "WARC/1.0\r\n"
    "WARC-Type: response\r\n"
    "WARC-Record-ID: <urn:uuid:ccc-333>\r\n"
    "WARC-Target-URI: http://example.com/c\r\n"
    "Content-Length: 28\r\n"
    "\r\n"
    "quoted:\r\n\r\nWARC/1.0\r\ngotcha!\r\n"
    "\r\n"
    "WARC/1.0\r\n"
    "WARC-Type: conversion\r\n"
    "WARC-Record-ID: <urn:uuid:ddd-444>\r\n"
    "WARC-Target-URI: http://example.com/d\r\n"
    "Content-Length: 3\r\n"
    "\r\n"
    "end\r\n"
)


def _write_warc(tmp_path, name: str, text: str):
    d = tmp_path / name
    d.mkdir()
    (d / "f.warc").write_text(text)
    return str(d)


def test_column_parse_survives_version_string_in_payload(spark, tmp_path):
    from adtl_spark.sources.io import parse_warc_records, read_text_dir

    path = _write_warc(tmp_path, "w1", WARC_COLLIDING)
    rows = {
        r["rec_pos"]: r
        for r in parse_warc_records(
            read_text_dir(spark, path, whole_files=True)
        ).collect()
    }
    assert len(rows) == 2
    assert rows[0]["content"] == "the spec says:\nWARC/1.0\r\nis fine"
    assert rows[0]["content_length"] == 32
    assert rows[1]["content"] == "hello"


def test_strict_parse_equals_column_parse_on_conformant_archive(
    spark, tmp_path
):
    from adtl_spark.sources.io import (
        parse_warc_records,
        parse_warc_records_strict,
        read_text_dir,
    )

    path = _write_warc(tmp_path, "w2", WARC_COLLIDING)
    files = read_text_dir(spark, path, whole_files=True)
    col_rows = sorted(
        parse_warc_records(files).collect(), key=lambda r: r["rec_pos"]
    )
    strict_rows = sorted(
        parse_warc_records_strict(files).collect(), key=lambda r: r["rec_pos"]
    )
    assert [tuple(r) for r in col_rows] == [tuple(r) for r in strict_rows]


def test_strict_parse_survives_full_boundary_in_payload(spark, tmp_path):
    from adtl_spark.sources.io import (
        parse_warc_records,
        parse_warc_records_strict,
        read_text_dir,
    )

    path = _write_warc(tmp_path, "w3", WARC_BOUNDARY_IN_PAYLOAD)
    files = read_text_dir(spark, path, whole_files=True)
    strict = {
        r["rec_pos"]: r for r in parse_warc_records_strict(files).collect()
    }
    assert len(strict) == 2
    assert strict[0]["content"] == "quoted:\r\n\r\nWARC/1.0\r\ngotcha!"
    assert strict[1]["content"] == "end"
    # the Column path documents this exact failure mode: it fragments
    col = parse_warc_records(files).collect()
    assert len(col) != 2 or col[0]["content"] != strict[0]["content"]


def test_strict_parse_no_content_length_trims_padding(spark, tmp_path):
    from adtl_spark.sources.io import parse_warc_records_strict, read_text_dir

    raw = (
        "WARC/1.0\r\n"
        "WARC-Type: request\r\n"
        "WARC-Target-URI: http://example.com/q\r\n"
        "\r\n"
        "GET /q HTTP/1.1\r\n"
        "\r\n"
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        "WARC-Target-URI: http://example.com/r\r\n"
        "Content-Length: 2\r\n"
        "\r\n"
        "ok\r\n"
    )
    path = _write_warc(tmp_path, "w4", raw)
    rows = {
        r["rec_pos"]: r
        for r in parse_warc_records_strict(
            read_text_dir(spark, path, whole_files=True)
        ).collect()
    }
    assert rows[0]["content_length"] is None
    assert rows[0]["content"] == "GET /q HTTP/1.1"
    assert rows[1]["content"] == "ok"


def test_warc_parsers_property_round_trip(spark, tmp_path):
    """Hypothesis over archive construction: arbitrary payloads
    (including ones containing version strings, lone newlines, and full
    record boundaries) written with correct Content-Length headers must
    come back intact from the STRICT parser; the Column parser must
    agree whenever no payload contains a full record boundary."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from adtl_spark.sources.io import (
        parse_warc_records,
        parse_warc_records_strict,
        read_text_dir,
    )

    payload_st = st.text(
        alphabet=st.sampled_from(
            list("abc WARC/1.0") + ["\r", "\n"]
        ),
        min_size=0,
        max_size=40,
    )

    counter = [0]

    @settings(max_examples=10, deadline=None)
    @given(payloads=st.lists(payload_st, min_size=1, max_size=4))
    def inner(payloads):
        counter[0] += 1
        d = tmp_path / f"prop{counter[0]}"
        d.mkdir()
        raw = "".join(
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: http://t/{i}\r\n"
            f"Content-Length: {len(p)}\r\n"
            "\r\n" + p + "\r\n\r\n"
            for i, p in enumerate(payloads)
        )
        (d / "f.warc").write_text(raw)
        files = read_text_dir(spark, str(d), whole_files=True)
        strict = sorted(
            parse_warc_records_strict(files).collect(),
            key=lambda r: r["rec_pos"],
        )
        assert [r["content"] for r in strict] == payloads
        boundary_free = not any(
            "\n\nWARC/1.0" in p.replace("\r", "")
            # a payload STARTING with the version line sits right after
            # the real record separator — same false boundary
            or p.replace("\r", "").startswith("WARC/1.0")
            for p in payloads
        )
        if boundary_free:
            col = sorted(
                parse_warc_records(files).collect(),
                key=lambda r: r["rec_pos"],
            )
            assert [tuple(r) for r in col] == [tuple(r) for r in strict]

    inner()


# ------------------------------------------------- entity decode order ---


def test_html_escaped_entities_do_not_double_decode(spark):
    from adtl_spark.operators.text import html_to_text

    df = spark.createDataFrame(
        [("<p>write &amp;lt; for &lt; and &amp;amp; for &amp;</p>",)],
        "html string",
    )
    out = df.select(html_to_text(F.col("html")).alias("t")).collect()[0]["t"]
    assert out == "write &lt; for < and &amp; for &"


# ------------------------------------------- index bucket validation ---


def test_append_rejects_mismatched_bucket_count(spark, tmp_path):
    from adtl_spark.operators.retrieval import (
        append_to_search_index,
        write_search_index,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "beta gamma")], "doc_id long, text string"
    )
    path = str(tmp_path / "idx")
    write_search_index(docs, path, n_buckets=8)
    batch = spark.createDataFrame([(3, "delta")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_buckets"):
        append_to_search_index(batch, path, n_buckets=16)
    # matching explicit count and meta-resolved count both still work
    append_to_search_index(batch, path, n_buckets=8)


# ------------------------------------------------------- PNG codec ---


def _spec_filtered_stream(pixels: bytes, width: int, height: int, bpp: int):
    """Filtered scanline stream computed DIRECTLY from the PNG spec §6
    formulas (independent of multimodal._png_filter_line): row y uses
    filter type y % 5; predictors read the reconstructed (= original)
    bytes of the current and previous rows."""
    stride = width * bpp
    out = bytearray()
    for y in range(height):
        ftype = y % 5
        out.append(ftype)
        for x in range(stride):
            orig = pixels[y * stride + x]
            a = pixels[y * stride + x - bpp] if x >= bpp else 0
            b = pixels[(y - 1) * stride + x] if y > 0 else 0
            c = pixels[(y - 1) * stride + x - bpp] if (y > 0 and x >= bpp) else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((orig - pred) & 0xFF)
    return bytes(out)


def _hand_png(width, height, color_type, stream, palette=None, depth=8, interlace=0):
    """Assemble a PNG container by hand (struct + zlib only — independent
    of multimodal.encode_png)."""
    import struct
    import zlib

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", width, height, depth, color_type, 0, 0, interlace),
    )
    if palette is not None:
        out += chunk(b"PLTE", palette)
    out += chunk(b"IDAT", zlib.compress(stream))
    out += chunk(b"IEND", b"")
    return out


def _arith_bytes(n, seed):
    return bytes((seed * 31 + j * 131) % 256 for j in range(n))


def test_decode_png_all_filters_from_spec_formulas():
    """Decoder correctness independent of our own encoder: the filtered
    stream is computed in-test straight from the spec formulas (6 rows
    -> every filter type incl. a second None row), container assembled
    by hand."""
    from adtl_spark.operators.multimodal import decode_png

    w, h, bpp = 7, 6, 3
    pixels = _arith_bytes(w * h * bpp, seed=9)
    payload = _hand_png(w, h, 2, _spec_filtered_stream(pixels, w, h, bpp))
    dw, dh, rgb = decode_png(payload)
    assert (dw, dh) == (w, h)
    assert rgb == pixels


def test_encode_decode_round_trip_rgb_rgba_gray():
    from adtl_spark.operators.multimodal import decode_png, encode_png

    w, h = 9, 7
    rgb = _arith_bytes(w * h * 3, seed=3)
    assert decode_png(encode_png(w, h, rgb, color_type=2)) == (w, h, rgb)

    rgba = _arith_bytes(w * h * 4, seed=4)
    exp = bytes(
        rgba[4 * i + c] for i in range(w * h) for c in range(3)
    )  # alpha stripped
    assert decode_png(encode_png(w, h, rgba, color_type=6)) == (w, h, exp)

    gray = _arith_bytes(w * h, seed=5)
    exp_g = bytes(v for v in gray for _ in range(3))
    assert decode_png(encode_png(w, h, gray, color_type=0)) == (w, h, exp_g)


def test_decode_png_palette_and_gray_alpha():
    from adtl_spark.operators.multimodal import decode_png

    # palette: 4 entries, 2x2 image, filter 0 rows
    palette = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    idx = bytes([0, 3, 1, 2])
    stream = bytes([0]) + idx[:2] + bytes([0]) + idx[2:]
    payload = _hand_png(2, 2, 3, stream, palette=palette)
    _, _, rgb = decode_png(payload)
    assert rgb == bytes(
        [10, 20, 30, 100, 110, 120, 40, 50, 60, 70, 80, 90]
    )
    # gray+alpha (type 4): alpha dropped, gray replicated
    ga = bytes([200, 255, 100, 0])
    stream = bytes([0]) + ga
    _, _, rgb = decode_png(_hand_png(2, 1, 4, stream))
    assert rgb == bytes([200, 200, 200, 100, 100, 100])


def test_decode_png_rejects_corruption_and_unsupported():
    import struct
    import zlib as _z

    from adtl_spark.operators.multimodal import decode_png, encode_png

    good = encode_png(5, 5, _arith_bytes(75, 1), color_type=2)
    # flip a byte inside IDAT -> CRC mismatch
    bad = bytearray(good)
    idat_at = good.index(b"IDAT") + 4
    bad[idat_at] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        decode_png(good[: len(good) // 2])  # truncated

    # genuinely unsupported: sub-byte depths and 16-bit palette
    stream = bytes([0, 0])
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(_hand_png(2, 2, 2, stream, depth=4))
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(_hand_png(2, 2, 3, stream, depth=16))
    _ = struct, _z  # container helpers above keep their imports
    # unknown filter type byte
    stream = bytes([7]) + bytes(6)
    with pytest.raises(ValueError, match="filter type"):
        decode_png(_hand_png(2, 1, 2, stream))


def test_decode_png_16bit_high_byte_view():
    """16-bit gray: big-endian samples decode to their high byte (the
    standard 8-bit view), replicated to RGB."""
    from adtl_spark.operators.multimodal import decode_png

    samples = [0x1234, 0xFF00, 0x0001, 0x8081]
    row1 = b"\x00" + samples[0].to_bytes(2, "big") + samples[1].to_bytes(2, "big")
    row2 = b"\x00" + samples[2].to_bytes(2, "big") + samples[3].to_bytes(2, "big")
    payload = _hand_png(2, 2, 0, row1 + row2, depth=16)
    w, h, rgb = decode_png(payload)
    assert (w, h) == (2, 2)
    assert rgb == bytes(
        v for s in samples for v in (s >> 8, s >> 8, s >> 8)
    )


def test_decode_png_adam7_interlace_from_spec_passes():
    """Adam7: the seven passes are built IN-TEST straight from the spec
    pass grid (filter-0 rows), and the decoder must scatter them back to
    the original pixel positions."""
    from adtl_spark.operators.multimodal import decode_png

    w = h = 4
    px = lambda y, x, c: (y * 16 + x * 4 + c) & 0xFF  # noqa: E731
    passes = []
    for x0, y0, dx, dy in [
        (0, 0, 8, 8),
        (4, 0, 8, 8),
        (0, 4, 4, 8),
        (2, 0, 4, 4),
        (0, 2, 2, 4),
        (1, 0, 2, 2),
        (0, 1, 1, 2),
    ]:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        for j in range(ph):
            row = bytes(
                px(y0 + j * dy, x0 + i * dx, c)
                for i in range(pw)
                for c in range(3)
            )
            passes.append(b"\x00" + row)
    payload = _hand_png(w, h, 2, b"".join(passes), interlace=1)
    dw, dh, rgb = decode_png(payload)
    assert (dw, dh) == (w, h)
    assert rgb == bytes(
        px(y, x, c) for y in range(h) for x in range(w) for c in range(3)
    )


def test_resize_and_pixel_stats_flow_png(spark):
    """PNG payloads flow through the SAME resize/stats pipeline as PPM:
    decode_image dispatch, RGBA stripping, NN stride, P6 re-encode."""
    from adtl_spark.operators.multimodal import (
        image_pixel_stats,
        resize_image_nn,
        synthetic_png_arith,
    )

    df = spark.createDataFrame(
        [(i, synthetic_png_arith(8 + i, 6 + i, seed=i)) for i in range(4)],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in image_pixel_stats(resize_image_nn(df, factor=2)).collect()
    }
    for i in range(4):
        w, h = 8 + i, 6 + i
        ow, oh = (w + 1) // 2, (h + 1) // 2
        assert (rows[i]["width"], rows[i]["height"]) == (ow, oh)
        # replay: output pixel p reads input pixel (2y, 2x), channel c at
        # source flat byte ((2y*w + 2x)*4 + c) of the arith RGBA stream
        sum_r = sum_g = sum_b = chk = 0
        for p in range(ow * oh):
            y, x = divmod(p, ow)
            j = ((2 * y) * w + 2 * x) * 4
            r = (i * 31 + j * 131) % 256
            g = (i * 31 + (j + 1) * 131) % 256
            b = (i * 31 + (j + 2) * 131) % 256
            sum_r += r
            sum_g += g
            sum_b += b
            chk += (p + 1) * (r + 2 * g + 3 * b)
        assert rows[i]["sum_r"] == sum_r
        assert rows[i]["sum_g"] == sum_g
        assert rows[i]["sum_b"] == sum_b
        assert rows[i]["checksum"] == chk


# ------------------------------------------------------ JPEG codec ---


def test_decode_jpeg_dc_only_hand_stream_exact():
    """Decoder pinned against a HAND-BUILT single-block stream (own
    minimal Huffman tables, not the encoder's): gray 8x8, quant[0,0]=16,
    DC category 2 with amplitude bits '11' -> coefficient 3*16=48; the
    IDCT of a DC-only block is flat 48/8=6, +128 level shift = 134
    exactly, every pixel, every channel."""
    import struct
    import numpy as np

    from adtl_spark.operators.jpeg_lite import _ZIGZAG, decode_jpeg

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    qt = np.full(64, 16, dtype=np.uint8)
    zz = bytearray(64)
    for k in range(64):
        zz[k] = qt[_ZIGZAG[k]]
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + bytes(zz))
    out += seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    # DC table: one 1-bit code '0' -> symbol 2 (category 2)
    out += seg(0xC4, bytes([0x00]) + bytes([1] + [0] * 15) + bytes([2]))
    # AC table: one 1-bit code '0' -> symbol 0x00 (EOB)
    out += seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00]))
    out += seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    # scan bits: DC code '0', amplitude '11' (=3), AC EOB '0', pad 1s
    out += bytes([0b01101111])
    out += b"\xff\xd9"
    w, h, rgb = decode_jpeg(out)
    assert (w, h) == (8, 8)
    assert rgb == bytes([134]) * (8 * 8 * 3)


def test_jpeg_round_trips_flat_gradient_noise_gray_420():
    import numpy as np

    from adtl_spark.operators.jpeg_lite import decode_jpeg, encode_jpeg

    def err(w, h, rgb, **kw):
        payload = encode_jpeg(w, h, rgb, **kw)
        dw, dh, out = decode_jpeg(payload)
        assert (dw, dh) == (w, h)
        a = np.frombuffer(out, dtype=np.uint8).astype(int)
        b = np.frombuffer(rgb, dtype=np.uint8).astype(int)
        return int(np.abs(a - b).max()), payload

    w, h = 21, 19
    flat = bytes([77, 77, 77]) * (w * h)
    e, p = err(w, h, flat, quality=90)
    assert e == 0
    assert encode_jpeg(w, h, flat, quality=90) == p  # deterministic

    grad = bytes(
        min(255, x * 6 + y * 4 + 30 * c)
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    e, _ = err(w, h, grad, quality=92)
    assert e <= 2
    e, _ = err(w, h, grad, quality=92, subsampling="420")
    assert e <= 3  # chroma replication upsample on a smooth ramp

    # adversarial arithmetic noise: lossy by design, bounded not exact
    noise = bytes((31 * j * j + 7 * j) % 256 for j in range(w * h * 3))
    e, _ = err(w, h, noise, quality=95)
    assert e <= 96, e  # high-frequency noise at q95 keeps most energy

    grayv = bytes(min(255, x * 10 + y) for y in range(h) for x in range(w))
    payload = encode_jpeg(w, h, grayv, quality=92, gray=True)
    dw, dh, out = decode_jpeg(payload)
    a = np.frombuffer(out, dtype=np.uint8).reshape(h, w, 3)
    assert (a[:, :, 0] == a[:, :, 1]).all() and (a[:, :, 0] == a[:, :, 2]).all()
    b = np.frombuffer(grayv, dtype=np.uint8).reshape(h, w).astype(int)
    assert np.abs(a[:, :, 0].astype(int) - b).max() <= 2


def test_jpeg_rejects_unsupported_modes_and_truncated():
    # (round-14 update: SOF2 progressive now DECODES — see
    # tests/test_round14.py — so the rejection contract covers the
    # remaining out-of-scope modes: lossless and arithmetic coding)
    from adtl_spark.operators.jpeg_lite import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    noise = bytes((31 * j * j + 7 * j) % 256 for j in range(32 * 32 * 3))
    p = encode_jpeg(32, 32, noise, quality=90)
    for sof in (0xC3, 0xC9, 0xCB):  # lossless / arithmetic variants
        alt = bytearray(p)
        at = p.index(b"\xff\xc0")
        alt[at + 1] = sof
        with pytest.raises(NotImplementedError, match="SOF"):
            decode_jpeg(bytes(alt))
    sos_at = p.index(b"\xff\xda")
    assert len(p) > sos_at + 200  # the cut really lands inside the scan
    with pytest.raises(ValueError):
        decode_jpeg(p[: sos_at + 200])  # cut inside the entropy data
    # truncated PROGRESSIVE entropy data fails loudly too
    pr = encode_jpeg_progressive(32, 32, noise, quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(pr[: pr.index(b"\xff\xda") + 40])
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0hello")


def test_decode_image_dispatches_jpeg(spark):
    import numpy as np

    from adtl_spark.operators.jpeg_lite import encode_jpeg
    from adtl_spark.operators.multimodal import image_pixel_stats

    w, h = 16, 12
    rgb = bytes(
        min(255, x * 8 + y * 5 + 20 * c)
        for y in range(h)
        for x in range(w)
        for c in range(3)
    )
    df = spark.createDataFrame(
        [(1, encode_jpeg(w, h, rgb, quality=95))], "media_id long, payload binary"
    )
    row = image_pixel_stats(df).collect()[0]
    assert (row["width"], row["height"]) == (w, h)
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(-1, 3).astype(int)
    # lossy: channel sums within 2/pixel of the source
    assert abs(row["sum_r"] - a[:, 0].sum()) <= 2 * w * h
    assert abs(row["sum_g"] - a[:, 1].sum()) <= 2 * w * h
    assert abs(row["sum_b"] - a[:, 2].sum()) <= 2 * w * h


# ------------------------------------------------- paragraph dedup ---


def test_paragraph_dedup_removes_boilerplate_keeps_order(spark):
    from adtl_spark.operators.dedup import paragraph_dedup

    boiler = "subscribe now"
    docs = spark.createDataFrame(
        [
            (1, f"alpha one\n\n{boiler}\n\nbeta two"),
            (2, f"{boiler}\n\ngamma three"),
            (3, f"delta four\n\nSubscribe Now"),  # case-insensitive key
            (4, "unique only"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs, min_df=2).collect()}
    assert out[1]["text"] == "alpha one\n\nbeta two"
    assert (out[1]["n_kept"], out[1]["n_removed"]) == (2, 1)
    assert out[2]["text"] == "gamma three"
    assert out[3]["text"] == "delta four"  # 'Subscribe Now' matched by key
    assert out[4]["text"] == "unique only"
    assert out[4]["n_removed"] == 0


def test_paragraph_dedup_all_boilerplate_and_empty_paragraphs(spark):
    from adtl_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "same\n\n\n\nsame"), (2, "same"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs, min_df=2).collect()}
    # 'same' appears in 2 distinct docs -> removed everywhere; the empty
    # paragraph between the doubled seps never counts
    assert (out[1]["text"], out[1]["n_kept"], out[1]["n_removed"]) == ("", 0, 2)
    assert (out[2]["text"], out[2]["n_kept"], out[2]["n_removed"]) == ("", 0, 1)
    # a document with no non-empty paragraphs still appears
    assert (out[3]["text"], out[3]["n_kept"], out[3]["n_removed"]) == ("", 0, 0)


def test_paragraph_dedup_within_doc_repeat_survives(spark):
    """df counts DISTINCT documents: a paragraph repeated twice inside
    ONE document is not boilerplate and must survive (both copies)."""
    from adtl_spark.operators.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "echo\n\necho\n\nfoxtrot")], "doc_id long, text string"
    )
    row = paragraph_dedup(docs, min_df=2).collect()[0]
    assert row["text"] == "echo\n\necho\n\nfoxtrot"
    assert row["n_removed"] == 0


# ------------------------------------------------- URL normalization ---


def test_normalize_url_cases(spark):
    from adtl_spark.operators.text import normalize_url, url_host

    cases = [
        # (input, expected_norm, expected_host)
        (
            "HTTP://WWW.Example.COM:80//A/b//c?z=1&a=2#frag",
            "http://www.example.com/A/b/c?a=2&z=1",
            "www.example.com",
        ),
        (
            "https://Host.Test:443/path",
            "https://host.test/path",
            "host.test",
        ),
        (
            "https://host.test:8443/path",
            "https://host.test:8443/path",
            "host.test",
        ),
        ("http://h.co", "http://h.co/", "h.co"),
        ("http://h.co/?", "http://h.co/", "h.co"),
        ("http://h.co/x?b=2&&a=1", "http://h.co/x?a=1&b=2", "h.co"),
        ("ftp://F.co:21/f", "ftp://f.co/f", "f.co"),
        ("not a url", None, None),
        ("/relative/path", None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], "u string")
    rows = df.select(
        "u",
        normalize_url(F.col("u")).alias("n"),
        url_host(F.col("u")).alias("h"),
    ).collect()
    got = {r["u"]: (r["n"], r["h"]) for r in rows}
    for u, n, h in cases:
        assert got[u] == (n, h), u


# ------------------------------------------------ video container ---


def test_video_container_and_frame_sampling(spark):
    from adtl_spark.operators.multimodal import (
        decode_video_frame,
        decode_video_meta,
        encode_video,
        sample_video_frames,
        synthetic_ppm_arith,
    )

    frames = [synthetic_ppm_arith(10, 9, seed=f) for f in range(6)]
    vid = encode_video(frames, fps=2)  # 3000 ms duration
    assert decode_video_meta(vid) == (6, 2)
    assert decode_video_frame(vid, 0) == frames[0]
    assert decode_video_frame(vid, 5) == frames[5]
    with pytest.raises(ValueError):
        decode_video_frame(vid, 6)
    with pytest.raises(ValueError):
        decode_video_meta(b"not a video")

    df = spark.createDataFrame([(1, vid)], "media_id long, payload binary")
    rows = sorted(
        sample_video_frames(df, every_ms=1000).collect(),
        key=lambda r: r["ts_ms"],
    )
    # duration 3000 ms -> samples at 0/1000/2000 ms -> frames 0/2/4
    assert [(r["frame_idx"], r["ts_ms"]) for r in rows] == [
        (0, 0), (2, 1000), (4, 2000),
    ]
    assert bytes(rows[1]["payload"]) == frames[2]


# ------------------------------------------------------ IMA ADPCM ---


def test_adpcm_tables_and_hand_vector():
    from adtl_spark.operators.multimodal import (
        _ADPCM_INDEX,
        _ADPCM_STEPS,
        decode_adpcm_block,
    )

    assert len(_ADPCM_STEPS) == 89
    assert _ADPCM_STEPS[0] == 7 and _ADPCM_STEPS[-1] == 32767
    assert all(b > a for a, b in zip(_ADPCM_STEPS, _ADPCM_STEPS[1:]))
    assert _ADPCM_INDEX == [-1, -1, -1, -1, 2, 4, 6, 8]
    # hand replay from the spec arithmetic: pred=100, index=4 (step 11),
    # nibbles 0x3 then 0x9
    # 0x3: diff = 11>>3 + 11>>2 + 11>>1 = 1+2+5 = 8 -> pred 108, idx 4-1=3
    # 0x9: step=10; diff = -(10>>3 + 10>>2) = -(1+2) = -3 -> 105, idx 2
    block = bytes([100, 0, 4, 0, 0x93])  # int16 100 LE, index 4, nibbles 3,9
    assert decode_adpcm_block(block, 3) == [100, 108, 105]


def test_adpcm_round_trip_and_dispatch(spark):
    import numpy as np

    from adtl_spark.operators.multimodal import (
        audio_vad_trim,
        decode_audio,
        encode_wav_adpcm,
    )

    n = 505 * 2 + 77  # full blocks + ragged
    i = np.arange(n)
    tri = (np.abs((i * 64) % 16000 - 8000) - 4000).astype(np.int16)
    payload = encode_wav_adpcm(tri.tobytes(), rate=16000)
    assert len(payload) < len(tri.tobytes()) // 2  # actually compressed
    rate, ch, bits, pcm = decode_audio(payload)  # dispatch via format tag
    assert (rate, ch, bits) == (16000, 1, 16)
    out = np.frombuffer(pcm, dtype=np.int16)
    assert len(out) == n  # fact-chunk trim through ragged final block
    assert int(np.abs(out.astype(int) - tri.astype(int)).max()) <= 128
    # deterministic
    assert encode_wav_adpcm(tri.tobytes(), rate=16000) == payload
    # PCM-consuming operators now decode the compressed container
    # through the full dispatch (round-11 change): the ADPCM clip
    # endpoints like its 16-bit PCM expansion, not as null stats
    df = spark.createDataFrame(
        [(1, payload)], "media_id long, payload binary"
    )
    row = audio_vad_trim(df).collect()[0]
    assert row["n_frames"] == n // 160  # decoded, framed, not rejected


# --------------------------------------------- codec properties ---


def test_png_round_trip_property():
    """Hypothesis over the PNG codec pair: any dims (incl. single-row/
    single-column images where filter lanes degenerate), any supported
    color type, mixed filters — decode(encode(x)) must reproduce the
    expected RGB exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from adtl_spark.operators.multimodal import decode_png, encode_png

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 13),
        h=st.integers(1, 13),
        ct=st.sampled_from([0, 2, 6]),
        seed=st.integers(0, 2**31 - 1),
        mode=st.sampled_from(["mixed", "none"]),
    )
    def inner(w, h, ct, seed, mode):
        ch = {0: 1, 2: 3, 6: 4}[ct]
        raw = bytes((seed * 31 + j * 131) % 256 for j in range(w * h * ch))
        dw, dh, rgb = decode_png(
            encode_png(w, h, raw, color_type=ct, filter_mode=mode)
        )
        assert (dw, dh) == (w, h)
        if ct == 2:
            assert rgb == raw
        elif ct == 6:
            assert rgb == bytes(
                raw[4 * i + c] for i in range(w * h) for c in range(3)
            )
        else:
            assert rgb == bytes(v for v in raw for _ in range(3))

    inner()


def test_jpeg_flat_blocks_exact_property():
    """Hypothesis over the JPEG pair on per-8x8-block-constant images:
    piecewise-flat content is DC-only, which the codec must reproduce
    EXACTLY (quantization of a multiple-of-16 coefficient is lossless at
    these qualities), for both subsamplings and odd dims."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    from adtl_spark.operators.jpeg_lite import decode_jpeg, encode_jpeg

    @settings(max_examples=15, deadline=None)
    @given(
        bw=st.integers(1, 3),
        bh=st.integers(1, 3),
        gray_level=st.integers(0, 255),
        seed=st.integers(0, 1000),
    )
    def inner(bw, bh, gray_level, seed):
        w, h = bw * 16, bh * 16
        img = np.full((h, w, 3), gray_level, dtype=np.uint8)
        payload = encode_jpeg(w, h, img.tobytes(), quality=90)
        dw, dh, out = decode_jpeg(payload)
        got = np.frombuffer(out, dtype=np.uint8)
        assert (dw, dh) == (w, h)
        assert int(np.abs(got.astype(int) - gray_level).max()) == 0

    inner()


# ------------------------------------------------ tar shards ---


def test_tar_shards_disk_round_trip_and_determinism(spark, tmp_path):
    """write_tar_shards -> binaryFile scan -> read_tar_members must
    reproduce every (member, payload) exactly; shard assignment is the
    portable hash (stable across runs), and two exports byte-match
    (mtime pinned to 0)."""
    from adtl_spark.sources.io import (
        read_binary_dir,
        read_tar_members,
        write_tar_shards,
    )

    rows = [
        (f"{i:06d}.txt", f"payload number {i} é".encode("utf-8"))
        for i in range(97)
    ]
    df = spark.createDataFrame(rows, "member string, payload binary")
    out1, out2 = str(tmp_path / "shards1"), str(tmp_path / "shards2")
    write_tar_shards(df, out1, n_shards=5)
    write_tar_shards(df, out2, n_shards=5)

    import pathlib

    files1 = sorted(p.name for p in pathlib.Path(out1).glob("*.tar"))
    assert files1 and len(files1) <= 5
    for name in files1:  # deterministic re-export
        assert (pathlib.Path(out1) / name).read_bytes() == (
            pathlib.Path(out2) / name
        ).read_bytes()

    back = read_tar_members(read_binary_dir(spark, out1, glob="*.tar"))
    got = {r["member"]: bytes(r["payload"]) for r in back.collect()}
    assert got == dict(rows)
    sizes = {r["member"]: r["size"] for r in back.collect()}
    assert all(sizes[m] == len(p) for m, p in rows)


# ------------------------------------------- dHash + VAD operators ---


def test_image_dhash_groups_duplicates_and_skips_thumbnails(spark):
    from adtl_spark.operators.multimodal import image_dhash, synthetic_ppm_arith

    rows = [
        (1, synthetic_ppm_arith(16, 12, seed=7)),
        (2, synthetic_ppm_arith(16, 12, seed=7)),   # exact duplicate
        (3, synthetic_ppm_arith(16, 12, seed=8)),   # different texture
        (4, synthetic_ppm_arith(8, 4, seed=7)),     # below 9x8: null
        (5, None),
    ]
    out = {r["media_id"]: r for r in image_dhash(
        spark.createDataFrame(rows, "media_id long, payload binary")
    ).collect()}
    assert (out[1]["dhash_hi"], out[1]["dhash_lo"]) == (
        out[2]["dhash_hi"], out[2]["dhash_lo"],
    )
    assert (out[1]["dhash_hi"], out[1]["dhash_lo"]) != (
        out[3]["dhash_hi"], out[3]["dhash_lo"],
    )
    assert out[4]["dhash_hi"] is None and out[5]["dhash_lo"] is None
    # straight-line replay of the grid/grayscale/bit arithmetic
    w, h, seed = 16, 12, 7
    def gray(x, y):
        j = (y * w + x) * 3
        px = [(seed * 31 + (j + c) * 131) % 256 for c in range(3)]
        return px[0] * 299 + px[1] * 587 + px[2] * 114
    bits = []
    for k in range(64):
        x0, x1 = ((k % 8) * w) // 9, (((k % 8) + 1) * w) // 9
        y0 = ((k // 8) * h) // 8
        bits.append(1 if gray(x0, y0) < gray(x1, y0) else 0)
    lo = sum(b << i for i, b in enumerate(bits[:32]))
    hi = sum(b << i for i, b in enumerate(bits[32:]))
    assert (out[1]["dhash_hi"], out[1]["dhash_lo"]) == (hi, lo)


def test_dhash_pairs_banding_contract(spark):
    """Pairs within the block guarantee are found with exact Hamming;
    a pair whose four 16-bit blocks ALL differ is missed (documented
    blocking tradeoff); null hashes never pair."""
    from adtl_spark.operators.multimodal import dhash_pairs

    H, L = 0x1234_5678_9ABC_DEF0 >> 32, 0x1234_5678_9ABC_DEF0 & 0xFFFFFFFF
    rows = [
        (1, H, L),
        (2, H, L ^ 0b11),          # hamming 2, three shared blocks
        (3, H ^ (1 << 20), L),     # hamming 1 vs id 1
        (4, H ^ 0x0001_0001, L ^ 0x0001_0001),  # all 4 blocks differ
        (5, None, None),
    ]
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_pairs(
            spark.createDataFrame(
                rows, "media_id long, dhash_hi long, dhash_lo long"
            ),
            max_hamming=8,
        ).collect()
    }
    assert out[(1, 2)] == 2
    assert out[(1, 3)] == 1
    assert out[(2, 3)] == 3
    assert not any(4 in k or 5 in k for k in out)


def test_audio_vad_trim_edges(spark):
    import struct

    from adtl_spark.operators.multimodal import (
        audio_vad_trim,
        synthetic_wav_arith_gated,
    )

    def silent_wav(n):
        pcm = b"\x00\x00" * n
        fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    rows = [
        (1, synthetic_wav_arith_gated(960, seed=3)),  # silent,loud,silent blocks
        (2, silent_wav(640)),                          # all silence
        (3, silent_wav(100)),                          # shorter than one frame
    ]
    out = {r["media_id"]: r for r in audio_vad_trim(
        spark.createDataFrame(rows, "media_id long, payload binary")
    ).collect()}
    # 960 samples = 6 frames; 320-sample blocks gate as [sil, loud, loud]
    # (block b silent iff b % 3 == 0), so frames 2..5 are speech
    assert out[1]["n_frames"] == 6 and out[1]["n_speech"] == 4
    assert (out[1]["first_speech"], out[1]["last_speech"]) == (2, 5)
    assert out[1]["trimmed_samples"] == 640
    assert out[2]["n_speech"] == 0 and out[2]["trimmed_samples"] == 0
    assert out[2]["first_speech"] is None
    assert out[3]["n_frames"] == 0 and out[3]["trimmed_samples"] == 0


# ------------------------------------------------ streaming WET ---


def test_wet_ingest_stream_matches_batch_and_appends(spark, tmp_path):
    """Streaming WET-making over a WARC drop folder: the availableNow
    catch-up run must equal the batch wet_documents output; a later
    archive drop appends ONLY its own records with the same stable
    ids."""
    from adtl_spark.sources.io import read_text_dir, wet_documents
    from adtl_spark.streaming.pipeline import wet_ingest_stream

    def archive(uri_prefix, texts):
        recs = []
        for i, t in enumerate(texts):
            recs.append(
                "WARC/1.0\r\n"
                "WARC-Type: conversion\r\n"
                f"WARC-Target-URI: http://{uri_prefix}/{i}\r\n"
                f"Content-Length: {len(t)}\r\n"
                "\r\n" + t + "\r\n\r\n"
            )
        return "".join(recs)

    src = tmp_path / "drop"
    src.mkdir()
    (src / "a.warc").write_text(archive("a.test", ["alpha one", "beta two"]))
    (src / "b.warc").write_text(archive("b.test", ["gamma three"]))
    dest = str(tmp_path / "wet_out")
    cp = str(tmp_path / "cp")

    q = wet_ingest_stream(spark, str(src), dest, cp)
    q.awaitTermination(120)
    got = {
        (r["uri"], r["text"]): r["doc_id"]
        for r in spark.read.parquet(dest).collect()
    }
    batch = {
        (r["uri"], r["text"]): r["doc_id"]
        for r in wet_documents(
            read_text_dir(spark, str(src), whole_files=True)
        ).collect()
    }
    assert got == batch and len(got) == 3  # same rows, same stable ids

    (src / "c.warc").write_text(archive("c.test", ["delta four"]))
    q2 = wet_ingest_stream(spark, str(src), dest, cp)
    q2.awaitTermination(120)
    after = spark.read.parquet(dest).collect()
    assert len(after) == 4  # only the new archive's record appended
    assert {r["text"] for r in after} == {
        "alpha one", "beta two", "gamma three", "delta four",
    }


def test_wet_ingest_stream_html_extraction(spark, tmp_path):
    from adtl_spark.streaming.pipeline import wet_ingest_stream

    html = "<html><body><h1>T</h1><p>hello &amp; goodbye</p></body></html>"
    rec = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        "WARC-Target-URI: http://h.test/p\r\n"
        f"Content-Length: {len(html)}\r\n"
        "\r\n" + html + "\r\n\r\n"
    )
    src = tmp_path / "drop2"
    src.mkdir()
    (src / "a.warc").write_text(rec)
    dest = str(tmp_path / "html_out")
    q = wet_ingest_stream(
        spark, str(src), dest, str(tmp_path / "cp2"), extract_html=True
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(dest).collect()
    assert len(rows) == 1
    assert rows[0]["text"] == "T\nhello & goodbye"


# ------------------------------------------------- modularity plan ---


def test_modularity_label_join_broadcasts_via_aqe_not_hint(spark):
    """The |V|-row label vector carries NO forced broadcast hint (a hint
    OOMs at web-scale |V|); at small scale AQE must still pick broadcast
    joins for it, so the plan keeps the zero-shuffle shape."""
    from adtl_spark.operators.graph import modularity

    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 1, 1), (3, 4, 1), (4, 3, 1)], "src long, dst long, w long"
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 3)], "v long, community long"
    )
    row = modularity(edges, labels).collect()[0]
    assert row["n_communities"] == 2 and row["modularity"] == 0.5
    # no forced hint anywhere in the label joins
    import inspect

    src = inspect.getsource(modularity)
    assert "F.broadcast(lab" not in src
