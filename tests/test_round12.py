"""Round-12 block: FLAC codec (lossless round trip, decoder-only paths
via hand-built bitstreams, CRC/MD5 strictness, dispatch)."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from adtl_spark.operators.flac_lite import (
    _BitWriter,
    _crc8,
    _crc16,
    _encode_coded_number,
    decode_flac,
    encode_flac,
    flac_stream_info,
)


def _rt(sig: np.ndarray, channels: int = 1, rate: int = 16000, **kw):
    enc = encode_flac(sig.tobytes(), rate=rate, channels=channels, **kw)
    out_rate, out_ch, bits, pcm = decode_flac(enc)
    assert (out_rate, out_ch, bits) == (rate, channels, 16)
    return np.frombuffer(pcm, dtype=np.int16), enc


def test_flac_roundtrip_shapes_and_block_sizes():
    rng = np.random.RandomState(11)
    t = np.arange(4101)
    shapes = {
        "noise": rng.randint(-3000, 3000, len(t)).astype(np.int16),
        "ramp": (t % 997 - 498).astype(np.int16),
        "sine": (2500 * np.sin(t / 17)).astype(np.int16),
        "const": np.full(len(t), 42, dtype=np.int16),
        "extremes": np.where(t % 2 == 0, 32767, -32768).astype(np.int16),
    }
    # 511 exercises the 16-bit block-size header escape, 192/256/4096
    # the table codes, and every signal ends with a partial final block.
    for bs in (192, 256, 511, 4096):
        for name, sig in shapes.items():
            out, _ = _rt(sig, block_size=bs)
            assert np.array_equal(out, sig), (name, bs)


def test_flac_roundtrip_stereo_modes_and_odd_rate():
    rng = np.random.RandomState(3)
    n = 2000
    left = (1500 * np.sin(np.arange(n) / 23)).astype(np.int16)
    right = (left + rng.randint(-40, 40, n)).astype(np.int16)
    inter = np.empty(2 * n, dtype=np.int16)
    inter[0::2], inter[1::2] = left, right
    for mode in ("independent", "left_side", "auto"):
        # 11025 is not in the sample-rate code table -> 16-bit Hz escape
        out, enc = _rt(inter, channels=2, rate=11025, stereo_mode=mode)
        assert np.array_equal(out, inter), mode
        info = flac_stream_info(enc)
        assert info["channels"] == 2 and info["sample_rate"] == 11025
    # correlated stereo must compress better under left/side
    _, enc_ind = _rt(inter, channels=2, stereo_mode="independent")
    _, enc_ls = _rt(inter, channels=2, stereo_mode="left_side")
    assert len(enc_ls) < len(enc_ind)


def test_flac_streaminfo_and_md5_verification():
    sig = (np.arange(900) % 311 - 155).astype(np.int16)
    enc = bytearray(encode_flac(sig.tobytes(), rate=48000))
    info = flac_stream_info(bytes(enc))
    assert info["total_samples"] == 900
    assert info["md5"] == hashlib.md5(sig.tobytes()).digest()
    # flip one MD5 byte in STREAMINFO: CRCs still pass, MD5 gate trips
    md5_off = bytes(enc).index(info["md5"])
    enc[md5_off] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(enc))
    # but an opt-out decode still succeeds (streaming use)
    _, _, _, pcm = decode_flac(bytes(enc), verify_md5=False)
    assert np.array_equal(np.frombuffer(pcm, dtype=np.int16), sig)


def test_flac_crc_strictness():
    sig = (np.arange(600) % 100 - 50).astype(np.int16)
    enc = bytearray(encode_flac(sig.tobytes(), block_size=256))
    start = flac_stream_info(bytes(enc))["frames_start"]
    # corrupt one byte inside the first frame's payload
    enc[start + 8] ^= 0x40
    with pytest.raises(ValueError, match="CRC|sync|truncated|reserved"):
        decode_flac(bytes(enc))


# ---------------------------------------------------------------------------
# Hand-built bitstreams for decoder paths the fixture encoder never
# emits: LPC, fixed orders 3-4, RICE2, escape partitions, partition
# order > 0, wasted bits, mid/side and right/side stereo.


def _streaminfo(rate, channels, bits, total, pcm_md5=b"\x00" * 16):
    out = bytearray(b"fLaC")
    info = struct.pack(">HH", 192, 65535) + b"\x00" * 6
    packed = (rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36) | total
    info += packed.to_bytes(8, "big") + pcm_md5
    out.append(0x80)
    out += (34).to_bytes(3, "big")
    out += info
    return out


def _frame_header(bw, block_size, ch_code, frame_no=0):
    bw.write(0x3FFE, 14)
    bw.write(0, 2)
    bw.write(7, 4)  # block size: 16-bit at end of header
    bw.write(5, 4)  # 16 kHz
    bw.write(ch_code, 4)
    bw.write(4, 3)  # 16-bit samples
    bw.write(0, 1)
    for b in _encode_coded_number(frame_no):
        bw.write(b, 8)
    bw.write(block_size - 1, 16)


def _finish_frame(bw):
    bw.align()
    header = bw.getvalue()
    # CRC-8 covers the header (everything before it); our builders call
    # this immediately after the header bits, so split is exact.
    return header


def _emit_rice(bw, residuals, param, method=0, porder=0, pred_order=0,
               block_size=None):
    bw.write(method, 2)
    bw.write(porder, 4)
    pbits = 4 if method == 0 else 5
    nparts = 1 << porder
    idx = 0
    for p in range(nparts):
        cnt = block_size >> porder
        if p == 0:
            cnt -= pred_order
        bw.write(param, pbits)
        for r in residuals[idx : idx + cnt]:
            z = (r << 1) if r >= 0 else (((-r) << 1) - 1)
            q = z >> param
            while q >= 32:
                bw.write(0, 32)
                q -= 32
            bw.write(1, q + 1)
            if param:
                bw.write(z, param)
        idx += cnt
    assert idx == len(residuals)


def _build_stream(body_builder, block_size, channels=1, ch_code=None,
                  total=None):
    """Assemble fLaC + STREAMINFO + one frame whose subframe bits are
    written by ``body_builder(bw)``."""
    ch_code = channels - 1 if ch_code is None else ch_code
    hdr = _BitWriter()
    _frame_header(hdr, block_size, ch_code)
    hdr.align()
    header = hdr.getvalue()
    body = _BitWriter()
    body_builder(body)
    body.align()
    frame = header + bytes([_crc8(header)]) + body.getvalue()
    frame += _crc16(frame).to_bytes(2, "big")
    out = _streaminfo(16000, channels, 16,
                      block_size if total is None else total)
    return bytes(out) + frame


def test_flac_decoder_lpc_subframe():
    # target signal obeying s[i] = r[i] + ((c0*s[i-1] + c1*s[i-2]) >> shift)
    n, order, shift = 64, 2, 4
    coefs = [30, -15]
    sig = [100, 103]
    residuals = []
    rng = np.random.RandomState(5)
    for i in range(order, n):
        pred = (coefs[0] * sig[i - 1] + coefs[1] * sig[i - 2]) >> shift
        r = int(rng.randint(-8, 8))
        sig.append(pred + r)
        residuals.append(r)

    def body(bw):
        bw.write(0, 1)
        bw.write(32 + (order - 1), 6)  # LPC order 2
        bw.write(0, 1)  # no wasted bits
        for s in sig[:order]:
            bw.write(s & 0xFFFF, 16)
        bw.write(6 - 1, 4)  # precision 6
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c & 0x3F, 6)
        _emit_rice(bw, residuals, param=3, pred_order=order,
                   block_size=n)

    rate, ch, bits, pcm = decode_flac(_build_stream(body, n))
    assert np.array_equal(np.frombuffer(pcm, dtype=np.int16),
                          np.array(sig, dtype=np.int16))


def test_flac_decoder_fixed_orders_3_4_and_partitions():
    n = 64
    for order in (3, 4):
        sig = list(range(-order, 0))  # warmup
        from adtl_spark.operators.flac_lite import _FIXED_COEFS

        coefs = _FIXED_COEFS[order]
        residuals = []
        for i in range(order, n):
            r = (i * 7) % 5 - 2
            pred = sum(c * sig[i - 1 - j] for j, c in enumerate(coefs))
            sig.append(pred + r)
            residuals.append(r)

        def body(bw, order=order, sig=sig, residuals=residuals):
            bw.write(0, 1)
            bw.write(8 + order, 6)
            bw.write(0, 1)
            for s in sig[:order]:
                bw.write(s & 0xFFFF, 16)
            # partition order 1: two partitions exercise the
            # first-partition predictor-order discount
            _emit_rice(bw, residuals, param=2, porder=1,
                       pred_order=order, block_size=n)

        _, _, _, pcm = decode_flac(_build_stream(body, n))
        got = np.frombuffer(pcm, dtype=np.int16)
        assert np.array_equal(got, np.array(sig, dtype=np.int16)), order


def test_flac_decoder_rice2_escape_and_wasted_bits():
    n = 32
    base = [((i * 5) % 17 - 8) * 4 for i in range(n)]  # 2 wasted bits

    def body(bw):
        bw.write(0, 1)
        bw.write(8, 6)  # FIXED order 0
        bw.write(1, 1)  # wasted-bits flag
        bw.write(1, 2)  # unary 1 -> k-1=1 -> 2 wasted bits
        shifted = [s >> 2 for s in base]
        # RICE2 method with an escaped partition: raw 6-bit residuals
        bw.write(1, 2)  # method=RICE2
        bw.write(0, 4)  # one partition
        bw.write(31, 5)  # escape
        bw.write(6, 5)  # 6 raw bits per residual
        for s in shifted:
            bw.write(s & 0x3F, 6)

    _, _, _, pcm = decode_flac(_build_stream(body, n))
    assert np.array_equal(np.frombuffer(pcm, dtype=np.int16),
                          np.array(base, dtype=np.int16))


def test_flac_decoder_mid_side_and_right_side():
    n = 48
    rng = np.random.RandomState(9)
    left = rng.randint(-2000, 2000, n).astype(int).tolist()
    right = [l - int(d) for l, d in zip(left, rng.randint(-30, 30, n))]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    side = [l - r for l, r in zip(left, right)]

    def verbatim(bw, vals, bps):
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for v in vals:
            bw.write(v & ((1 << bps) - 1), bps)

    def body_ms(bw):
        verbatim(bw, mid, 16)
        verbatim(bw, side, 17)  # side channel at +1 bit

    _, ch, _, pcm = decode_flac(
        _build_stream(body_ms, n, channels=2, ch_code=10)
    )
    got = np.frombuffer(pcm, dtype=np.int16)
    assert ch == 2
    assert got[0::2].tolist() == left and got[1::2].tolist() == right

    def body_rs(bw):
        verbatim(bw, side, 17)  # right/side stores side first
        verbatim(bw, right, 16)

    _, _, _, pcm2 = decode_flac(
        _build_stream(body_rs, n, channels=2, ch_code=9)
    )
    got2 = np.frombuffer(pcm2, dtype=np.int16)
    assert got2[0::2].tolist() == left and got2[1::2].tolist() == right


def test_decode_audio_dispatches_flac():
    from adtl_spark.operators.multimodal import decode_audio

    sig = (np.arange(500) % 201 - 100).astype(np.int16)
    rate, ch, bits, pcm = decode_audio(
        encode_flac(sig.tobytes(), rate=22050)
    )
    assert (rate, ch, bits) == (22050, 1, 16)
    assert np.array_equal(np.frombuffer(pcm, dtype=np.int16), sig)


# ---------------------------------------------------------------------------
# MPEG audio header probe (multimodal.probe_mpeg_audio).


def test_mpeg_probe_cbr_vbr_and_id3():
    from adtl_spark.operators.multimodal import (
        build_mpeg_audio,
        probe_mpeg_audio,
    )

    r = probe_mpeg_audio(build_mpeg_audio([128] * 40, rate=44100))
    assert r["n_frames"] == 40 and not r["vbr"]
    # 144000*128//44100 = 417 bytes/frame
    assert r["total_bytes"] == 40 * (144000 * 128 // 44100)
    assert r["duration_ms"] == 40 * (1152 * 1_000_000 // 44100) // 1000

    r2 = probe_mpeg_audio(
        build_mpeg_audio(
            [64, 80, 96] * 10, version="2.5", layer=2, rate=8000,
            channels=1, pad_every=3, id3v2_size=57,
        )
    )
    assert r2["vbr"] and r2["id3v2_bytes"] == 57
    assert r2["version"] == "2.5" and r2["channels"] == 1
    # padding adds exactly one byte on every third frame (layer 2)
    base = sum(144000 * k // 8000 for k in [64, 80, 96] * 10)
    assert r2["total_bytes"] == base + 10


def test_mpeg_probe_layer_variants_and_strictness():
    import pytest as _pytest

    from adtl_spark.operators.multimodal import (
        build_mpeg_audio,
        probe_mpeg_audio,
    )

    # Layer I: 384 samples/frame, 4-byte-slot lengths
    r = probe_mpeg_audio(build_mpeg_audio([224] * 7, layer=1, rate=32000))
    assert r["layer"] == 1 and r["total_samples"] == 7 * 384
    # MPEG-2 Layer III: 576 samples/frame
    r2 = probe_mpeg_audio(
        build_mpeg_audio([64] * 10, version="2", layer=3, rate=16000)
    )
    assert r2["total_samples"] == 5760
    # trailing junk is excluded, junk-only raises
    p = build_mpeg_audio([128] * 5)
    assert probe_mpeg_audio(p + b"TAG" + b"\x00" * 125)["n_frames"] == 5
    with _pytest.raises(ValueError, match="no MPEG audio frame"):
        probe_mpeg_audio(b"\x00" * 64)
    # a truncated final frame is excluded from every tally
    r3 = probe_mpeg_audio(p[:-10])
    assert r3["n_frames"] == 4 and r3["total_bytes"] == len(p) // 5 * 4


# ---------------------------------------------------------------------------
# gzip-member archives (.warc.gz layout) — sources/io.py.


def test_split_gzip_members_roundtrip_and_offsets():
    import gzip

    from adtl_spark.sources.io import gzip_members_bytes, split_gzip_members

    payloads = [b"alpha", b"", b"WARC/1.0\r\n" * 40, bytes(range(256)) * 9]
    blob = gzip_members_bytes(payloads)
    got = split_gzip_members(blob)
    assert [g[2] for g in got] == payloads
    # offsets tile the blob exactly: off[i+1] = off[i] + clen[i]
    pos = 0
    for off, clen, _ in got:
        assert off == pos
        pos += clen
    assert pos == len(blob)
    # deterministic output (mtime pinned)
    assert blob == gzip_members_bytes(payloads)
    # a payload containing the gzip magic must NOT false-split
    tricky = [b"x" + bytes([0x1F, 0x8B, 0x08]) * 50, b"y"]
    assert [g[2] for g in split_gzip_members(gzip_members_bytes(tricky))] \
        == tricky
    # truncated member raises with the offset
    with pytest.raises(ValueError, match="truncated gzip member"):
        split_gzip_members(blob[:-3])
    # plain single-member gzip still works (a .gz that is not an archive)
    assert split_gzip_members(gzip.compress(b"solo"))[0][2] == b"solo"


def test_gzip_member_records_and_strict_parse_passthrough(spark):
    from adtl_spark.sources.io import (
        gzip_member_records,
        gzip_members_bytes,
        parse_warc_records_strict,
    )

    recs = []
    for i in range(5):
        body = f"payload-{i}\r\n\r\nWARC/1.0\r\nnot-a-record"
        recs.append(
            (
                "WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: http://t/{i}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n{body}\r\n\r\n"
            ).encode()
        )
    files = spark.createDataFrame(
        [(0, bytearray(gzip_members_bytes(recs[:3]))),
         (1, bytearray(gzip_members_bytes(recs[3:])))],
        "archive_id long, content binary",
    )
    members = gzip_member_records(files, passthrough=("archive_id",))
    rows = members.orderBy("archive_id", "member_off").collect()
    assert [r.member_pos for r in rows if r.member_len > 0] == [0, 1, 2, 0, 1]
    assert [r.archive_id for r in rows] == [0, 0, 0, 1, 1]
    parsed = parse_warc_records_strict(
        members, content_col="value", passthrough=("member_pos", "member_off")
    ).collect()
    assert len(parsed) == 5
    for r in parsed:
        i = int(r.target_uri.rsplit("/", 1)[1])
        # Content-Length cut kept the WARC-looking payload intact
        assert r.content.startswith(f"payload-{i}\r\n\r\nWARC/1.0")
        assert r.member_pos == (i if i < 3 else i - 3)
        assert r.member_off >= 0


# ---------------------------------------------------------------------------
# PDF text extraction (operators/pdf_lite.py).


def test_pdf_roundtrip_escapes_pages_and_compression():
    from adtl_spark.operators.pdf_lite import build_pdf, pdf_pages, pdf_text

    pages = [
        ["hello world", "line (two) \\ done", ""],
        ["page 2 with )unbalanced( parens"],
        [],
    ]
    for compress in (True, False):
        got = pdf_pages(build_pdf(pages, compress=compress))
        assert got == [
            "hello world\nline (two) \\ done",
            "page 2 with )unbalanced( parens",
            "",
        ], compress
    assert pdf_text(build_pdf([["a"], ["b"]]), page_sep="|") == "a|b"


def test_pdf_extractor_tj_arrays_hex_octal_and_quote_ops():
    import zlib

    from adtl_spark.operators.pdf_lite import _content_text

    # TJ array with kerning numbers; hex string; octal + named escapes;
    # ' starts a new line, T* breaks lines
    cs = (
        b"BT /F1 12 Tf 72 720 Td "
        b"[(Hel) -20 (lo) 5 ( )] TJ <776F726C64> Tj "
        b"T* (o\\143t\\141l \\t tab) Tj "
        b"(next)' ET"
    )
    assert _content_text(cs) == "Hello world\noctal \t tab\nnext"
    # the same stream must survive a Flate round trip through pdf_pages
    from adtl_spark.operators.pdf_lite import pdf_pages

    content = zlib.compress(cs)
    pdf = (
        b"%PDF-1.7\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Filter /FlateDecode /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
    )
    assert pdf_pages(pdf) == ["Hello world\noctal \t tab\nnext"]


def test_pdf_page_tree_order_beats_document_order():
    from adtl_spark.operators.pdf_lite import pdf_pages

    def page(num, content_num):
        return (
            str(num).encode()
            + b" 0 obj\n<< /Type /Page /Parent 2 0 R /Contents "
            + str(content_num).encode() + b" 0 R >>\nendobj\n"
        )

    def stream(num, text):
        body = b"BT (" + text + b") Tj ET"
        return (
            str(num).encode()
            + b" 0 obj\n<< /Length " + str(len(body)).encode()
            + b" >>\nstream\n" + body + b"\nendstream\nendobj\n"
        )

    # Kids list order [5, 3] reverses document order
    pdf = (
        b"%PDF-1.7\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [5 0 R 3 0 R] /Count 2 >>\nendobj\n"
        + page(3, 4) + stream(4, b"second")
        + page(5, 6) + stream(6, b"first")
    )
    assert pdf_pages(pdf) == ["first", "second"]


def test_pdf_strictness_and_fallbacks():
    import pytest as _pytest

    from adtl_spark.operators.pdf_lite import build_pdf, pdf_pages

    with _pytest.raises(ValueError, match="not a PDF"):
        pdf_pages(b"GIF89a...")
    with _pytest.raises(NotImplementedError, match="encrypted"):
        pdf_pages(b"%PDF-1.7\n1 0 obj\n<< /Encrypt 9 0 R >>\nendobj\n")
    # corrupt Flate stream raises, never silently yields empty text
    good = bytearray(build_pdf([["abc"]]))
    i = good.index(b"stream\n") + 9
    good[i : i + 4] = b"\x00\x00\x00\x00"
    with _pytest.raises(ValueError, match="Flate"):
        pdf_pages(bytes(good))
    # no catalog: falls back to document order instead of zero pages
    pdf = (
        b"%PDF-1.7\n"
        b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length 15 >>\nstream\nBT (solo) Tj ET\nendstream\nendobj\n"
    )
    assert pdf_pages(pdf) == ["solo"]


# ---------------------------------------------------------------------------
# Preference / label-QC analytics (operators/feedback.py).


def test_bradley_terry_recovers_order_and_matches_numpy(spark):
    from adtl_spark.operators.feedback import bradley_terry

    # item 2 beats 1 beats 0, with enough games to be unambiguous
    pairs = [(2, 1)] * 30 + [(1, 2)] * 10 + [(1, 0)] * 30 + [(0, 1)] * 10 \
        + [(2, 0)] * 35 + [(0, 2)] * 5
    df = spark.createDataFrame(pairs, "winner long, loser long")
    got = {
        r.item: (r.strength, r.wins, r.games)
        for r in bradley_terry(df, iters=3).collect()
    }
    assert got[2][0] > got[1][0] > got[0][0]
    assert got[2][1] == 65 and got[0][2] == 80

    # independent dense replay of the same MM update
    import numpy as np

    n = np.zeros((3, 3))
    w = np.zeros(3)
    for a, b in pairs:
        n[a][b] += 1
        n[b][a] += 1
        w[a] += 1
    s = np.ones(3)
    for _ in range(3):
        d = np.array(
            [sum(n[i][j] / (s[i] + s[j]) for j in range(3) if j != i)
             for i in range(3)]
        )
        s = w / d
        s = s * 3 / s.sum()
    for i in range(3):
        assert abs(got[i][0] - s[i]) < 1e-9, i


def test_pairwise_kappa_textbook_and_degenerate(spark):
    from adtl_spark.operators.feedback import pairwise_kappa

    # classic 2x2 example: po=0.7, marginals a:(0.6,0.4) b:(0.5,0.5)
    # -> pe=0.5, kappa=0.4
    labels = []
    grid = [(1, 1)] * 40 + [(1, 0)] * 20 + [(0, 1)] * 10 + [(0, 0)] * 30
    for item, (la, lb) in enumerate(grid):
        labels += [(item, 0, la), (item, 1, lb)]
    # a third rater with a CONSTANT label: pe=po for the constant pair
    labels += [(item, 2, 1) for item in range(100)]
    df = spark.createDataFrame(labels, "item long, rater long, label long")
    rows = {(r.rater_a, r.rater_b): r for r in pairwise_kappa(df).collect()}
    r01 = rows[(0, 1)]
    assert abs(r01.po - 0.7) < 1e-12
    assert abs(r01.pe - 0.5) < 1e-12
    assert abs(r01.kappa - 0.4) < 1e-12
    assert r01.n_items == 100
    # rater 2 constant: pe = p_a(1)*1, kappa defined unless pe=1
    r02 = rows[(0, 2)]
    assert abs(r02.po - 0.6) < 1e-12 and abs(r02.pe - 0.6) < 1e-12
    assert abs(r02.kappa - 0.0) < 1e-12
    # two identical constant raters -> pe=1 -> kappa NULL
    const = [(i, 0, 7) for i in range(10)] + [(i, 1, 7) for i in range(10)]
    cdf = spark.createDataFrame(const, "item long, rater long, label long")
    row = pairwise_kappa(cdf).collect()[0]
    assert row.po == 1.0 and row.pe == 1.0 and row.kappa is None


def test_fleiss_kappa_matches_reference_formula(spark):
    import numpy as np

    from adtl_spark.operators.feedback import fleiss_kappa

    rng = np.random.RandomState(4)
    n_items, n_raters = 60, 4
    lab = rng.randint(0, 3, size=(n_items, n_raters))
    rows = [
        (i, r, int(lab[i, r])) for i in range(n_items) for r in range(n_raters)
    ]
    # one off-panel item (3 raters) must be excluded and counted
    rows += [(999, r, 0) for r in range(3)]
    df = spark.createDataFrame(rows, "item long, rater long, label long")
    got = fleiss_kappa(df, n_raters=4).collect()[0]
    assert got.n_items == n_items and got.n_excluded == 1

    # reference formula on the dense matrix
    counts = np.zeros((n_items, 3))
    for i in range(n_items):
        for r in range(n_raters):
            counts[i, lab[i, r]] += 1
    p_i = ((counts**2).sum(axis=1) - n_raters) / (n_raters * (n_raters - 1))
    p_bar = p_i.mean()
    pk = counts.sum(axis=0) / counts.sum()
    p_e = (pk**2).sum()
    kappa = (p_bar - p_e) / (1 - p_e)
    assert abs(got.p_bar - p_bar) < 1e-12
    assert abs(got.p_e - p_e) < 1e-12
    assert abs(got.kappa - kappa) < 1e-12
    # modal-count inference picks 4 when n_raters is omitted
    inferred = fleiss_kappa(df).collect()[0]
    assert inferred.n_raters == 4


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram scoring (operators/corpus.py).


def test_kn_bigram_matches_dense_reference(spark):
    import math

    from adtl_spark.operators.corpus import kn_bigram_logprob

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "a cat and a dog"),
        (3, "mat log cat the the"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    # vocab large enough that nothing is <unk>, no bigram pruning
    got = {
        r.doc_id: (r.n_pairs, r.avg_logprob)
        for r in kn_bigram_logprob(df, vocab_k=50, bigram_m=1000).collect()
    }

    # dense reference: interpolated KN with D=0.75 over the same corpus
    from collections import Counter, defaultdict

    pairs = []
    for _i, text in docs:
        toks = text.split()
        pairs += list(zip(toks, toks[1:]))
    c2 = Counter(pairs)
    ctx = Counter(w1 for w1, _ in pairs)
    n1f = defaultdict(set)
    n1b = defaultdict(set)
    for w1, w2 in c2:
        n1f[w1].add(w2)
        n1b[w2].add(w1)
    ntypes = len(c2)
    D = 0.75
    for i, text in docs:
        toks = text.split()
        ps = 0
        for w1, w2 in zip(toks, toks[1:]):
            p = max(c2[(w1, w2)] - D, 0.0) / ctx[w1] + (
                (D * len(n1f[w1])) / ctx[w1]
            ) * (len(n1b[w2]) / float(ntypes))
            ps += math.floor(math.log(p) * 10000 + 0.5)
        n = len(toks) - 1
        want = math.floor(ps / n / 10000.0 * 10000 + 0.5) / 10000.0
        assert got[i] == (n, want), i


def test_kn_bigram_context_distribution_sums_to_one():
    # the interpolated-KN formula itself: for any context, summing over
    # the full alphabet must give exactly 1 (discount mass = lambda)
    from collections import Counter, defaultdict

    pairs = [("a", "b")] * 5 + [("a", "c")] * 2 + [("b", "a")] * 3 + [
        ("c", "a"), ("c", "b"), ("b", "b"),
    ]
    c2 = Counter(pairs)
    ctx = Counter(w1 for w1, _ in pairs)
    n1f = defaultdict(set)
    n1b = defaultdict(set)
    for w1, w2 in c2:
        n1f[w1].add(w2)
        n1b[w2].add(w1)
    ntypes = len(c2)
    D = 0.75
    alphabet = {w for p in pairs for w in p}
    # P_cont must itself sum to 1 over the alphabet
    assert abs(sum(len(n1b[w]) / ntypes for w in alphabet) - 1.0) < 1e-12
    for w1 in alphabet:
        total = sum(
            max(c2[(w1, w2)] - D, 0.0) / ctx[w1]
            + ((D * len(n1f[w1])) / ctx[w1]) * (len(n1b[w2]) / ntypes)
            for w2 in alphabet
        )
        assert abs(total - 1.0) < 1e-12, w1


def test_kn_bigram_prefers_coherent_sequences(spark):
    from adtl_spark.operators.corpus import kn_bigram_logprob

    phrase = "hash join scan filter " * 10
    scrambled = "hash hash join scan join filter scan filter " \
        "filter join hash scan " * 3 + "hash join scan filter"
    corpus = [(i, phrase) for i in range(8)] + [(100, scrambled.strip())]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = {r.doc_id: r.avg_logprob
            for r in kn_bigram_logprob(df, vocab_k=10, bigram_m=50).collect()}
    assert rows[0] > rows[100]


def test_read_gzip_member_at_and_fetch(spark):
    from adtl_spark.sources.io import (
        fetch_gzip_members,
        gzip_member_records,
        gzip_members_bytes,
        read_gzip_member_at,
        split_gzip_members,
    )

    payloads = [f"record-{i}".encode() * (i + 1) for i in range(6)]
    blob = gzip_members_bytes(payloads)
    offsets = split_gzip_members(blob)
    for (off, clen, want), orig in zip(offsets, payloads):
        # exact-length slice (the HTTP Range contract) and open-ended
        assert read_gzip_member_at(blob, off, clen) == orig
        assert read_gzip_member_at(blob, off) == orig
    # a wrong offset is loud, not silently misparsed
    with pytest.raises(Exception):
        read_gzip_member_at(blob, offsets[1][0] + 1, offsets[1][1])

    files = spark.createDataFrame(
        [(0, bytearray(blob)), (1, bytearray(gzip_members_bytes(payloads[:2])))],
        "archive_id long, content binary",
    )
    members = gzip_member_records(files, passthrough=("archive_id",))
    manifest = members.filter(
        (F.col("member_pos") % 2 == 1)
    ).select("archive_id", "member_off", "member_len", "member_pos")
    got = fetch_gzip_members(files, manifest).collect()
    assert len(got) == 4  # members 1,3,5 of archive 0 + member 1 of archive 1
    for r in got:
        assert r.value == payloads[r.member_pos].decode()


def test_bt_weighted_fit_equals_row_fit(spark):
    from adtl_spark.operators.feedback import bradley_terry

    rows = [(2, 1)] * 7 + [(1, 2)] * 3 + [(1, 0)] * 6 + [(2, 0)] * 4 \
        + [(0, 2)] * 2
    df = spark.createDataFrame(rows, "winner long, loser long")
    counted = df.groupBy("winner", "loser").agg(F.count("*").alias("c"))
    a = sorted(tuple(r) for r in bradley_terry(df, iters=2).collect())
    b = sorted(
        tuple(r)
        for r in bradley_terry(counted, weight_col="c", iters=2).collect()
    )
    assert a == b


def test_preference_store_maintained_on_stream_equals_batch(spark, tmp_path):
    """Bradley-Terry refit from the foreachBatch-maintained win-count
    store equals a one-shot fit over the full comparison log — win
    counts are pure adds, so any micro-batch partitioning lands on the
    same sufficient statistics; replaying a delta changes nothing."""
    from adtl_spark.operators.feedback import bradley_terry
    from adtl_spark.streaming.pipeline import (
        preference_sink,
        preference_store_fit,
    )

    rows = [(i, (2, 1) if i % 5 else (1, 2)) for i in range(40)]
    rows += [(40 + i, (1, 0) if i % 3 else (0, 1)) for i in range(30)]
    rows += [(70 + i, (2, 0)) for i in range(10)]
    flat = [(rid, w, l) for rid, (w, l) in rows]
    df = spark.createDataFrame(flat, "row_id long, winner long, loser long")
    src = tmp_path / "bt_stream"
    src.mkdir()
    for i, pred in enumerate(
        ("row_id < 25", "row_id >= 25 AND row_id < 60", "row_id >= 60")
    ):
        df.filter(pred).coalesce(1).write.mode("overwrite").parquet(
            str(src / f"p{i}")
        )
    store = str(tmp_path / "bt_store")
    stream = (
        spark.readStream.schema("row_id long, winner long, loser long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = stream.writeStream.foreachBatch(preference_sink(store)).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        tuple(r) for r in preference_store_fit(spark, store, iters=2).collect()
    )
    want = sorted(
        tuple(r)
        for r in bradley_terry(
            df.select("winner", "loser"), iters=2
        ).collect()
    )
    assert got == want
    # replaying one batch's delta is idempotent (overwrite semantics)
    preference_sink(store)(df.filter("row_id < 25"), 0)
    got2 = sorted(
        tuple(r) for r in preference_store_fit(spark, store, iters=2).collect()
    )
    assert got2 == want


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (operators/tokenizer.py, Kudo 2018 hard-EM form).


def test_unigram_distributed_matches_local_model(spark):
    from adtl_spark.operators.tokenizer import (
        unigram_train,
        unigram_train_local,
    )

    docs = [(i, "the quick brown fox jumps over the lazy dog the quick")
            for i in range(6)]
    docs += [(10 + i, "internationalization and internationalism wins")
             for i in range(4)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    loc = sorted(tuple(r) for r in
                 unigram_train_local(df, vocab_size=40, iters=2).collect())
    dist = sorted(tuple(r) for r in
                  unigram_train(df, vocab_size=40, iters=2).collect())
    assert loc == dist and len(loc) > 0


def test_unigram_viterbi_optimal_and_total_coverage():
    import itertools
    import math

    from adtl_spark.operators.tokenizer import _viterbi_pieces

    counts = {"a": 50, "b": 30, "ab": 20, "ba": 10, "abab": 8, "c": 5}
    total = sum(counts.values())

    def score(pieces):
        s = 0.0
        for p in pieces:
            c = counts.get(p)
            if c is None and len(p) > 1:
                return float("-inf")
            s += math.log((c if c else 0.5) / total)
        return s

    def all_segs(w):
        if not w:
            yield []
            return
        for i in range(1, min(len(w), 8) + 1):
            for rest in all_segs(w[i:]):
                yield [w[:i]] + rest

    for w in ("ababab", "abba", "aabb", "abcab", "bbbb"):
        got = _viterbi_pieces(w, counts, total, 8)
        assert "".join(got) == w  # lossless
        best = max(score(list(s)) for s in all_segs(w))
        assert abs(score(got) - best) < 1e-12, (w, got)
    # unseen characters fall back to the 0.5/total floor, never fail
    got = _viterbi_pieces("axb", counts, total, 8)
    assert "".join(got) == "axb" and "x" in got


def test_unigram_segment_model_shape_and_fallback(spark):
    from adtl_spark.operators.tokenizer import (
        unigram_segment_model,
        unigram_train,
    )

    train = spark.createDataFrame(
        [(i, "hash join scan hash join filter") for i in range(5)],
        "doc_id long, text string",
    )
    model = [tuple(r) for r in unigram_train(train, vocab_size=30).collect()]
    # unseen word ("zzz") still segments via the char floor
    df = spark.createDataFrame(
        [(0, "hash join"), (1, "zzz hash")], "doc_id long, text string"
    )
    rows = {r.doc_id: (r.n_words, r.n_pieces)
            for r in unigram_segment_model(df, model).collect()}
    assert rows[0] == (2, 2)  # frequent words become single pieces
    assert rows[1][0] == 2 and rows[1][1] >= 4  # zzz -> 3 char pieces


def test_krippendorff_alpha_matches_reference_and_handles_missing(spark):
    import math

    from adtl_spark.operators.feedback import krippendorff_alpha

    # classic missing-data panel: 4 raters, 12 units, holes
    grid = {
        # unit: {rater: label}
        0: {0: 1, 1: 1, 2: None, 3: 1},
        1: {0: 2, 1: 2, 2: 3, 3: 2},
        2: {0: 3, 1: 3, 2: 3, 3: 3},
        3: {0: 3, 1: 3, 2: 3, 3: 3},
        4: {0: 2, 1: 2, 2: 2, 3: 2},
        5: {0: 1, 1: 2, 2: 3, 3: 4},
        6: {0: 4, 1: 4, 2: 4, 3: 4},
        7: {0: 1, 1: 1, 2: 2, 3: 1},
        8: {0: 2, 1: 2, 2: 2, 3: None},
        9: {0: None, 1: 5, 2: 5, 3: 5},
        10: {0: None, 1: None, 2: 1, 3: 1},
        11: {0: None, 1: None, 2: 3, 3: None},  # single rating: excluded
    }
    rows = [
        (u, r, lab)
        for u, rl in grid.items()
        for r, lab in rl.items()
        if lab is not None
    ]
    df = spark.createDataFrame(rows, "item long, rater long, label long")
    got = krippendorff_alpha(df).collect()[0]
    assert got.n_excluded == 1 and got.n_units == 11

    # dense coincidence-matrix reference with the same 1e-6 protocol
    from collections import Counter

    do_q6 = 0
    n = 0
    nc = Counter()
    for u, rl in grid.items():
        labs = [v for v in rl.values() if v is not None]
        m = len(labs)
        if m < 2:
            continue
        cnt = Counter(labs)
        sq = sum(c * c for c in cnt.values())
        do_q6 += math.floor((m * m - sq) / (m - 1) * 1000000 + 0.5)
        n += m
        nc.update(labs)
    ncsq = sum(c * c for c in nc.values())
    d_o = (do_q6 / 1000000.0) / n
    d_e = (n * n - ncsq) / (n * (n - 1.0))
    alpha_q6 = math.floor((1.0 - d_o / d_e) * 1000000 + 0.5)
    assert got.n_ratings == n
    assert got.do_q6_sum == do_q6
    assert got.alpha_q6 == alpha_q6
    # perfect within-unit agreement across VARYING labels -> alpha = 1
    perf = spark.createDataFrame(
        [(u, r, u % 3) for u in range(6) for r in range(3)],
        "item long, rater long, label long",
    )
    assert krippendorff_alpha(perf).collect()[0].alpha_q6 == 1000000
    # a single label everywhere: d_e = 0, alpha indeterminate -> NULL
    mono = spark.createDataFrame(
        [(u, r, 7) for u in range(5) for r in range(3)],
        "item long, rater long, label long",
    )
    assert krippendorff_alpha(mono).collect()[0].alpha_q6 is None


# ---------------------------------------------------------------------------
# ID3v2 text frames + peak normalization (operators/multimodal.py).


def test_id3v2_parse_build_roundtrip_and_encodings():
    from adtl_spark.operators.multimodal import (
        build_id3v2,
        build_mpeg_audio,
        parse_id3v2,
        probe_mpeg_audio,
    )

    frames = {"TIT2": "My Söng", "TPE1": "Ärtist", "TALB": "Album/X"}
    for version in (3, 4):
        tag = build_id3v2(frames, version=version)
        assert parse_id3v2(tag) == frames, version
    # utf-16 and latin-1 encodings decode too
    body = b"TIT2" + bytes([0, 0, 0, 1 + len("ab".encode("utf-16"))]) \
        + b"\x00\x00" + b"\x01" + "ab".encode("utf-16")
    tag = b"ID3\x03\x00\x00" + bytes(
        [(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
         (len(body) >> 7) & 0x7F, len(body) & 0x7F]
    ) + body
    assert parse_id3v2(tag) == {"TIT2": "ab"}
    # non-tagged payloads and junk return {}
    assert parse_id3v2(b"\xff\xfbxxxx") == {}
    assert parse_id3v2(b"") == {}
    # probe agrees on the skip length
    p = build_id3v2(frames) + build_mpeg_audio([128] * 3)
    assert probe_mpeg_audio(p)["id3v2_bytes"] == len(build_id3v2(frames))


def test_normalize_audio_peak_exact_and_silence(spark):
    import numpy as np

    from adtl_spark.operators.multimodal import (
        decode_audio,
        normalize_audio_peak,
        pcm_to_wav,
    )

    sig = np.array([-15000, 0, 7500, 15000, -2], dtype=np.int16)
    silent = np.zeros(16, dtype=np.int16)
    df = spark.createDataFrame(
        [
            (0, bytearray(pcm_to_wav(8000, 1, 16, sig.tobytes()))),
            (1, bytearray(pcm_to_wav(8000, 1, 16, silent.tobytes()))),
        ],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in normalize_audio_peak(df, 30000).collect()}
    want = sig.astype(np.int64) * 30000 // 15000
    assert rows[0].peak == 15000
    assert rows[0].pcm_sum == int(want.sum())
    got = np.frombuffer(
        decode_audio(bytes(rows[0].payload))[3], dtype=np.int16
    )
    assert np.array_equal(got.astype(np.int64), want)  # floor, incl. -2 -> -4
    assert got[4] == -4
    # silence passes through untouched
    assert rows[1].peak == 0 and rows[1].pcm_sum == 0


# ---------------------------------------------------------------------------
# robots.txt (RFC 9309) — operators/text.py.


def test_parse_robots_group_selection_and_empty_disallow():
    from adtl_spark.operators.text import parse_robots

    txt = """
    User-agent: megabot
    User-agent: superbot
    Disallow: /m/

    User-agent: mega
    Disallow: /short/

    User-agent: *
    Disallow:
    Allow: /x
    """
    # longest agent-prefix group wins; shared user-agent lines group
    assert parse_robots(txt, "megabot/3.1") == [(False, "/m/")]
    assert parse_robots(txt, "superbot") == [(False, "/m/")]
    assert parse_robots(txt, "megab") == [(False, "/short/")]
    # fallback * group; empty Disallow contributes no rule
    assert parse_robots(txt, "other") == [(True, "/x")]
    # no matching group at all -> empty rules (allow everything)
    assert parse_robots("User-agent: a\nDisallow: /", "b") == []


def test_apply_robots_semantics(spark):
    from adtl_spark.operators.text import apply_robots, parse_robots

    rules = parse_robots(
        "User-agent: *\nDisallow: /private/\nDisallow: /tmp*\n"
        "Allow: /private/pub/\nDisallow: /exact$\nAllow: /exa\n"
        "Disallow: /esc\\%age\n",
        "bot",
    )
    urls = spark.createDataFrame(
        [
            (0, "http://t/ok"),
            (1, "http://t/private/a"),
            (2, "http://t/private/pub/b"),   # longer Allow overrides
            (3, "http://t/tmp123"),          # * wildcard
            (4, "http://t/exact"),           # $ anchor beats /exa
            (5, "http://t/exactly"),         # anchor does NOT match
            (6, "http://t"),                 # pathless -> "/"
            (7, "http://t/esc\\%age"),       # LIKE metachars escaped
        ],
        "id long, url string",
    )
    got = {r.id: (r.allowed, r.rule)
           for r in apply_robots(urls, rules).collect()}
    assert got[0] == (True, None)
    assert got[1] == (False, "/private/")
    assert got[2] == (True, "/private/pub/")
    assert got[3] == (False, "/tmp*")
    assert got[4] == (False, "/exact$")
    assert got[5] == (True, "/exa")
    assert got[6] == (True, None)
    assert got[7] == (False, "/esc\\%age")
    # empty rule list allows everything
    all_ok = apply_robots(urls, []).select("allowed").collect()
    assert all(r.allowed for r in all_ok)


def test_flip_crop_exact_and_strict(spark):
    import numpy as np

    from adtl_spark.operators.multimodal import (
        crop_image,
        decode_image,
        flip_image_h,
        synthetic_ppm_arith,
    )

    base = synthetic_ppm_arith(8, 6, seed=9)
    w, h, rgb = decode_image(base)
    a = np.frombuffer(rgb, dtype=np.uint8).reshape(h, w, 3)
    df = spark.createDataFrame(
        [(0, bytearray(base))], "media_id long, payload binary"
    )
    # flip is an exact mirror; flipping twice restores the original
    f1 = flip_image_h(df).collect()[0].payload
    _, _, frgb = decode_image(bytes(f1))
    fa = np.frombuffer(frgb, dtype=np.uint8).reshape(h, w, 3)
    assert np.array_equal(fa, a[:, ::-1, :])
    f2 = flip_image_h(flip_image_h(df)).collect()[0].payload
    assert bytes(f2)[-len(rgb):] == rgb
    # default center-half crop slices exactly
    c1 = crop_image(df).collect()[0].payload
    cw, chh, crgb = decode_image(bytes(c1))
    assert (cw, chh) == (w // 2, h // 2)
    ca = np.frombuffer(crgb, dtype=np.uint8).reshape(chh, cw, 3)
    assert np.array_equal(ca, a[h // 4 : h // 4 + chh, w // 4 : w // 4 + cw, :])
    # out-of-bounds boxes are loud
    import pytest as _pytest

    bad = crop_image(df, box=lambda ww, hh: (ww - 2, 0, 4, 2))
    with _pytest.raises(Exception, match="crop box"):
        bad.collect()


def test_compression_signal_orders_and_edges(spark):
    from adtl_spark.operators.text import compression_signal

    docs = spark.createDataFrame(
        [
            (0, "spam " * 200),                      # highly repetitive
            (1, " ".join(f"w{i}x{i*7%97}" for i in range(200))),  # varied
            (2, ""),                                  # empty
            (3, None),                                # null
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in compression_signal(docs).collect()}
    assert rows[0].ratio_q4 < rows[1].ratio_q4  # repetition compresses better
    assert 0 < rows[0].ratio_q4 < 10000
    assert rows[0].n_bytes == 1000
    assert rows[2].n_bytes == 0 and rows[2].ratio_q4 is None
    assert rows[3].n_bytes == 0 and rows[3].ratio_q4 is None
    # deterministic across invocations
    again = {r.doc_id: r.ratio_q4 for r in compression_signal(docs).collect()}
    assert again[1] == rows[1].ratio_q4


# ---------------------------------------------------------------------------
# Review-fix regressions (round-12 inline review).


def test_normalize_audio_peak_honors_bit_depth(spark):
    import numpy as np

    from adtl_spark.operators.multimodal import (
        normalize_audio_peak,
        pcm_to_wav,
    )

    # 8-bit PCM must be rejected loudly, never reinterpreted as int16
    df = spark.createDataFrame(
        [(0, bytearray(pcm_to_wav(8000, 1, 8, bytes([1, 2, 3, 4]))))],
        "media_id long, payload binary",
    )
    with pytest.raises(Exception, match="unsupported 8-bit"):
        normalize_audio_peak(df).collect()


def test_mpeg_probe_truncated_first_frame_raises():
    from adtl_spark.operators.multimodal import (
        build_mpeg_audio,
        probe_mpeg_audio,
    )

    p = build_mpeg_audio([128])
    with pytest.raises(ValueError, match="no complete MPEG audio frame"):
        probe_mpeg_audio(p[:100])


def test_robots_query_matching_and_group_merge(spark):
    from adtl_spark.operators.text import apply_robots, parse_robots

    # RFC 9309: rules match path+query; split user-agent:* groups merge
    txt = (
        "User-agent: *\nDisallow: /*?sessionid=\n\n"
        "User-agent: *\nDisallow: /b/\n"
    )
    rules = parse_robots(txt, "bot")
    assert (False, "/*?sessionid=") in rules and (False, "/b/") in rules
    urls = spark.createDataFrame(
        [
            (0, "http://t/page?sessionid=5"),
            (1, "http://t/page?x=1"),
            (2, "http://t/b/y"),
            (3, "http://t/page?sessionid=5#frag"),  # fragment dropped
        ],
        "id long, url string",
    )
    got = {r.id: r.allowed for r in apply_robots(urls, rules).collect()}
    assert got == {0: False, 1: True, 2: False, 3: False}


def test_split_gzip_members_linear_feed_large_members():
    from adtl_spark.sources.io import gzip_members_bytes, split_gzip_members

    # members larger than the 1 MiB feed chunk exercise the bounded loop
    big = [bytes([i]) * (3 << 20) for i in range(3)] + [b"tail"]
    blob = gzip_members_bytes(big)
    got = split_gzip_members(blob)
    assert [g[2] for g in got] == big
    pos = 0
    for off, clen, _ in got:
        assert off == pos
        pos += clen
    assert pos == len(blob)


def test_pdf_indirect_length_stream_ending_in_newline_byte():
    import zlib

    from adtl_spark.operators.pdf_lite import pdf_pages

    # indirect /Length forces the endstream fallback; pad the Flate
    # payload so its LAST byte is 0x0a — old rstrip ate it
    # the adler32 tail tracks the byte sum; a 3-char pad over a
    # contiguous alphabet sweeps > 256 consecutive sums, guaranteeing
    # a variant whose final byte is 0x0a or 0x0d
    comp = None
    for total in range(3 * 33, 3 * 33 + 280):
        a = min(total - 66, 122)
        rest = total - a
        b = min(rest - 33, 122)
        c = rest - b
        if not all(33 <= x <= 122 for x in (a, b, c)):
            continue
        c2 = zlib.compress(
            b"BT (edge) Tj ET % " + bytes([a, b, c]), 9
        )
        if c2.endswith((b"\n", b"\r")):
            comp = c2
            break
    assert comp is not None, "no variant produced a CR/LF-final stream"
    pdf = (
        b"%PDF-1.7\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Filter /FlateDecode /Length 9 0 R >>\nstream\n"
        + comp + b"\nendstream\nendobj\n"
    )
    assert pdf_pages(pdf) == ["edge"]


def test_flac_sr_code14_and_unrepresentable_rate():
    import numpy as np

    from adtl_spark.operators.flac_lite import decode_flac, encode_flac

    sig = (np.arange(400) % 99 - 49).astype(np.int16)
    # 88000 Hz: not in the table, too big for 16-bit Hz -> code 14
    rate, _, _, pcm = decode_flac(encode_flac(sig.tobytes(), rate=88000))
    assert rate == 88000
    assert np.array_equal(np.frombuffer(pcm, dtype=np.int16), sig)
    with pytest.raises(ValueError, match="not representable"):
        encode_flac(sig.tobytes(), rate=655361)


def test_parse_sitemap_optional_fields_and_degradation(spark):
    from adtl_spark.operators.text import parse_sitemap

    xml = (
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc> http://a/1 </loc><lastmod>2024-02-03</lastmod></url>"
        "<url><loc>http://a/2</loc></url>"
        "<url><lastmod>2024-01-01</lastmod></url>"  # loc-less: dropped
        "</urlset>"
    )
    df = spark.createDataFrame([(7, xml), (8, "<sitemapindex/>")],
                               "doc_id long, xml string")
    rows = sorted(
        tuple(r) for r in parse_sitemap(df).collect()
    )
    # whitespace trimmed, lastmod NULL when absent, loc-less dropped,
    # non-urlset XML yields zero rows (never wrong ones)
    assert rows == [
        (7, 0, "http://a/1", "2024-02-03"),
        (7, 1, "http://a/2", None),
    ]
