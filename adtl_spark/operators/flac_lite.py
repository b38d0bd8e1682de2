"""Dependency-free FLAC codec (decoder + fixture-grade encoder).

Written to the public FLAC format specification (RFC 9639 / the xiph.org
format document) — no reference-repo counterpart exists (the reference,
adtl, has no media handling at all; this is extension surface for the
multimodal training-data pipeline, where FLAC is the dominant lossless
ASR-corpus format, e.g. LibriSpeech/MLS distribution files).

Decoder coverage
----------------
* STREAMINFO parse + trailing-MD5 verification of the decoded stream
* frame walk: 14-bit sync, fixed/variable blocking, all block-size /
  sample-rate / sample-size code forms (incl. end-of-header 8/16-bit)
* UTF-8-style coded frame/sample numbers (up to 36 bits)
* CRC-8 frame-header check and CRC-16 whole-frame check (both verified,
  not skipped)
* subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized-coefficient reconstruction with arithmetic shift)
* partitioned Rice residuals, RICE (4-bit) and RICE2 (5-bit) methods,
  escape-to-raw partitions, wasted-bits shifts
* stereo decorrelation: independent, left/side, right/side, mid/side
  (side channel at +1 bit depth per spec)

Encoder coverage (enough to produce real, spec-valid streams that any
FLAC decoder accepts — used to build gate/test fixtures)
----------------
* STREAMINFO with exact total-sample count and MD5 of the unencoded PCM
* fixed blocking, per-block best-of {CONSTANT, FIXED order 0/1/2}
* single-partition Rice residuals with a mean-derived parameter
* independent or left/side stereo (``stereo_mode``)

Like the repo's PNG/JPEG/ADPCM codecs this is per-payload Python meant
to run inside Arrow ``mapInPandas`` batches: it distributes linearly and
is the documented swap-in point for libFLAC in production.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = [
    "decode_flac",
    "encode_flac",
    "flac_stream_info",
]


# ---------------------------------------------------------------------------
# CRCs (FLAC uses CRC-8 poly 0x07 for frame headers, CRC-16 poly 0x8005
# for whole frames; both init 0, no reflection, no final xor).


def _make_crc8_table() -> list[int]:
    table = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        table.append(c)
    return table


def _make_crc16_table() -> list[int]:
    table = []
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
        table.append(c)
    return table


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def _crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# Bit-level IO.


class _BitReader:
    """MSB-first bit reader over a bytes buffer (FLAC is big-endian at
    the bit level everywhere outside the PCM payload itself)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos_bits: int = 0) -> None:
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        pos = self.pos
        end = pos + n
        if end > len(self.data) * 8:
            raise ValueError("FLAC: bitstream truncated")
        first = pos >> 3
        last = (end + 7) >> 3
        chunk = int.from_bytes(self.data[first:last], "big")
        chunk >>= (last << 3) - end
        self.pos = end
        return chunk & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        if n and v & (1 << (n - 1)):
            v -= 1 << n
        return v

    def read_unary(self) -> int:
        """Count of 0 bits before the next 1 bit (consumes the 1)."""
        data = self.data
        pos = self.pos
        count = 0
        # Finish the current partial byte, then scan whole zero bytes.
        while True:
            byte_idx = pos >> 3
            if byte_idx >= len(data):
                raise ValueError("FLAC: bitstream truncated in unary code")
            bit_off = pos & 7
            cur = data[byte_idx] & (0xFF >> bit_off)
            if cur == 0:
                count += 8 - bit_off
                pos += 8 - bit_off
                continue
            # bit_length of the remaining byte gives the position of the
            # first set bit from the right; convert to from-the-left.
            lead = 8 - cur.bit_length()
            count += lead - bit_off
            self.pos = pos + (lead - bit_off) + 1
            return count

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def getvalue(self) -> bytes:
        assert self.nbits == 0, "unaligned flush"
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# Coded numbers (the UTF-8-like scheme frame headers use, up to 36 bits).


def _read_coded_number(br: _BitReader) -> int:
    first = br.read(8)
    if first < 0x80:
        return first
    ones = 0
    mask = 0x80
    while mask and first & mask:
        ones += 1
        mask >>= 1
    if ones < 2 or ones > 7:
        raise ValueError("FLAC: invalid coded number prefix")
    value = first & (0xFF >> (ones + 1))
    for _ in range(ones - 1):
        cont = br.read(8)
        if cont & 0xC0 != 0x80:
            raise ValueError("FLAC: invalid coded number continuation")
        value = (value << 6) | (cont & 0x3F)
    return value


def _encode_coded_number(value: int) -> bytes:
    if value < 0x80:
        return bytes([value])
    out = bytearray()
    nbytes = 2
    while value >= (1 << (6 * (nbytes - 1) + (7 - nbytes))) and nbytes < 7:
        nbytes += 1
    shift = 6 * (nbytes - 1)
    lead_mask = (0xFF << (8 - nbytes)) & 0xFF
    out.append(lead_mask | (value >> shift))
    for i in range(nbytes - 1):
        shift -= 6
        out.append(0x80 | ((value >> shift) & 0x3F))
    return bytes(out)


# ---------------------------------------------------------------------------
# Header code tables.

_BLOCK_SIZE_CODES = {
    192: 1,
    576: 2,
    1152: 3,
    2304: 4,
    4608: 5,
    256: 8,
    512: 9,
    1024: 10,
    2048: 11,
    4096: 12,
    8192: 13,
    16384: 14,
    32768: 15,
}

_SAMPLE_RATE_CODES = {
    88200: 1,
    176400: 2,
    192000: 3,
    8000: 4,
    16000: 5,
    22050: 6,
    24000: 7,
    32000: 8,
    44100: 9,
    48000: 10,
    96000: 11,
}

_SAMPLE_SIZE_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}
_SAMPLE_SIZE_FROM_CODE = {v: k for k, v in _SAMPLE_SIZE_CODES.items()}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# ---------------------------------------------------------------------------
# Decoder.


def flac_stream_info(payload: bytes) -> dict:
    """Parse the mandatory STREAMINFO block; returns a dict with
    min/max block size, sample_rate, channels, bits, total_samples and
    the stream MD5 (bytes)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    info = None
    while True:
        if pos + 4 > len(payload):
            raise ValueError("FLAC: truncated metadata")
        hdr = payload[pos]
        is_last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if btype == 0:
            if length != 34:
                raise ValueError("FLAC: bad STREAMINFO length")
            min_bs, max_bs = struct.unpack(">HH", body[:4])
            packed = int.from_bytes(body[10:18], "big")
            sample_rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bits = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            info = {
                "min_block_size": min_bs,
                "max_block_size": max_bs,
                "sample_rate": sample_rate,
                "channels": channels,
                "bits": bits,
                "total_samples": total,
                "md5": body[18:34],
                "frames_start": pos + 4 + length,
            }
        pos += 4 + length
        if is_last:
            break
    if info is None:
        raise ValueError("FLAC: missing STREAMINFO")
    info["frames_start"] = pos
    return info


def _read_residual(br: _BitReader, block_size: int, pred_order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = br.read(4)
    nparts = 1 << porder
    if block_size >> porder << porder != block_size:
        raise ValueError("FLAC: block size not divisible by partitions")
    res: list[int] = []
    for p in range(nparts):
        cnt = block_size >> porder
        if p == 0:
            cnt -= pred_order
        param = br.read(pbits)
        if param == escape:
            nbits = br.read(5)
            if nbits == 0:
                res.extend([0] * cnt)
            else:
                for _ in range(cnt):
                    res.append(br.read_signed(nbits))
        else:
            for _ in range(cnt):
                q = br.read_unary()
                v = (q << param) | br.read(param)
                res.append((v >> 1) ^ -(v & 1))
    return res


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> list[int]:
    if br.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    stype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        samples = [br.read_signed(eff)] * block_size
    elif stype == 1:  # VERBATIM
        samples = [br.read_signed(eff) for _ in range(block_size)]
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        samples = [br.read_signed(eff) for _ in range(order)]
        res = _read_residual(br, block_size, order)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * samples[-1 - j]
            samples.append(r + pred)
    elif stype >= 32:  # LPC
        order = (stype & 0x1F) + 1
        samples = [br.read_signed(eff) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision code")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _read_residual(br, block_size, order)
        for r in res:
            acc = 0
            for j in range(order):
                acc += coefs[j] * samples[-1 - j]
            samples.append(r + (acc >> shift))
    else:
        raise ValueError(f"FLAC: reserved subframe type {stype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(payload: bytes, verify_md5: bool = True):
    """Decode a FLAC stream to ``(sample_rate, channels, bits, pcm)``.

    ``pcm`` is interleaved little-endian int16 when bits <= 16 (smaller
    depths are returned at their native amplitude in int16 containers,
    matching the repo's other decoders), int32 beyond.  Frame CRC-8 and
    CRC-16 are verified; when STREAMINFO carries a non-zero MD5 and
    ``verify_md5`` is set, the decoded stream digest is checked too.
    """
    info = flac_stream_info(payload)
    rate = info["sample_rate"]
    channels = info["channels"]
    bits = info["bits"]
    total = info["total_samples"]
    pos = info["frames_start"]
    out: list[list[int]] = [[] for _ in range(channels)]
    data = payload
    ndec = 0
    while pos < len(data) and (total == 0 or ndec < total):
        br = _BitReader(data, pos * 8)
        if br.read(14) != 0x3FFE:
            raise ValueError("FLAC: lost frame sync")
        if br.read(1):
            raise ValueError("FLAC: reserved frame bit set")
        br.read(1)  # blocking strategy (frame vs sample numbering)
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("FLAC: reserved frame bit set")
        _read_coded_number(br)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code")
        elif bs_code == 1:
            block_size = 192
        elif bs_code <= 5:
            block_size = 576 << (bs_code - 2)
        elif bs_code == 6:
            block_size = br.read(8) + 1
        elif bs_code == 7:
            block_size = br.read(16) + 1
        else:
            block_size = 256 << (bs_code - 8)
        if sr_code == 12:
            _ = br.read(8)
        elif sr_code in (13, 14):
            _ = br.read(16)
        elif sr_code == 15:
            raise ValueError("FLAC: invalid sample rate code")
        if ss_code == 0:
            frame_bits = bits
        elif ss_code == 3:
            raise ValueError("FLAC: reserved sample size code")
        else:
            frame_bits = _SAMPLE_SIZE_FROM_CODE[ss_code]
        header_len = br.byte_pos() - pos
        if _crc8(data[pos : pos + header_len]) != br.read(8):
            raise ValueError("FLAC: frame header CRC-8 mismatch")

        if ch_code <= 7:
            nch = ch_code + 1
            if nch != channels:
                raise ValueError("FLAC: frame channel count != STREAMINFO")
            chans = [
                _decode_subframe(br, block_size, frame_bits)
                for _ in range(nch)
            ]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("FLAC: stereo decorrelation in non-stereo stream")
            # side channel carries +1 bit of depth
            if ch_code == 8:  # left/side
                left = _decode_subframe(br, block_size, frame_bits)
                side = _decode_subframe(br, block_size, frame_bits + 1)
                chans = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side (side stored first)
                side = _decode_subframe(br, block_size, frame_bits + 1)
                right = _decode_subframe(br, block_size, frame_bits)
                chans = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _decode_subframe(br, block_size, frame_bits)
                side = _decode_subframe(br, block_size, frame_bits + 1)
                lr: list[list[int]] = [[], []]
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    lr[0].append((m + s) >> 1)
                    lr[1].append((m - s) >> 1)
                chans = lr
        else:
            raise ValueError("FLAC: reserved channel assignment")

        br.align()
        frame_len = br.byte_pos() - pos
        if _crc16(data[pos : pos + frame_len]) != br.read(16):
            raise ValueError("FLAC: frame CRC-16 mismatch")
        pos = br.byte_pos()
        keep = block_size
        if total:
            keep = min(block_size, total - ndec)
        for c in range(channels):
            out[c].extend(chans[c][:keep])
        ndec += keep

    n = min(len(ch) for ch in out) if out else 0
    width = 2 if bits <= 16 else 4
    fmt = "<%d%s" % (n * channels, "h" if width == 2 else "i")
    inter: list[int] = [0] * (n * channels)
    for c in range(channels):
        inter[c::channels] = out[c][:n]
    pcm = struct.pack(fmt, *inter)
    if verify_md5 and info["md5"] != b"\x00" * 16:
        # STREAMINFO MD5 is over the unencoded stream at native width
        if bits == 8:
            raw = struct.pack("<%db" % (n * channels), *inter)
        elif bits <= 16:
            raw = pcm
        elif bits <= 24:
            raw = b"".join(
                (v & 0xFFFFFF).to_bytes(3, "little") for v in inter
            )
        else:
            raw = pcm
        if hashlib.md5(raw).digest() != info["md5"]:
            raise ValueError("FLAC: decoded stream MD5 mismatch")
    return rate, channels, bits, pcm


# ---------------------------------------------------------------------------
# Encoder (fixture side).


def _best_rice_param(zigzags: list[int]) -> int:
    total = sum(zigzags)
    cnt = max(1, len(zigzags))
    k = 0
    while k < 14 and (cnt << (k + 1)) < total:
        k += 1
    return k


def _rice_cost(res: list[int]) -> tuple[int, int]:
    zz = [((r << 1) if r >= 0 else (((-r) << 1) - 1)) for r in res]
    k = _best_rice_param(zz)
    bits = sum((z >> k) + 1 + k for z in zz)
    return k, bits


def _write_rice_residual(bw: _BitWriter, res: list[int], param: int) -> None:
    bw.write(0, 2)  # RICE (4-bit params)
    bw.write(0, 4)  # partition order 0 — single partition
    bw.write(param, 4)
    for r in res:
        z = (r << 1) if r >= 0 else (((-r) << 1) - 1)
        bw.write_unary(z >> param)
        if param:
            bw.write(z, param)


def _encode_subframe(bw: _BitWriter, samples: list[int], bps: int) -> None:
    n = len(samples)
    if n and all(s == samples[0] for s in samples):
        bw.write(0, 1)
        bw.write(0, 6)  # CONSTANT
        bw.write(0, 1)  # no wasted bits
        bw.write(samples[0] & ((1 << bps) - 1), bps)
        return
    best_order, best_res, best_k, best_bits = 0, None, 0, None
    for order in (0, 1, 2):
        if n <= order:
            continue
        res = []
        coefs = _FIXED_COEFS[order]
        for i in range(order, n):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * samples[i - 1 - j]
            res.append(samples[i] - pred)
        k, cost = _rice_cost(res)
        cost += order * bps
        if best_bits is None or cost < best_bits:
            best_order, best_res, best_k, best_bits = order, res, k, cost
    verbatim_bits = n * bps
    if best_bits is None or verbatim_bits < best_bits:
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        mask = (1 << bps) - 1
        for s in samples:
            bw.write(s & mask, bps)
        return
    bw.write(0, 1)
    bw.write(8 + best_order, 6)  # FIXED
    bw.write(0, 1)  # no wasted bits
    mask = (1 << bps) - 1
    for s in samples[:best_order]:
        bw.write(s & mask, bps)
    _write_rice_residual(bw, best_res, best_k)


def encode_flac(
    pcm: bytes,
    rate: int = 16000,
    channels: int = 1,
    bits: int = 16,
    block_size: int = 4096,
    stereo_mode: str = "auto",
) -> bytes:
    """Encode interleaved little-endian int16 PCM to a spec-valid FLAC
    stream (fixed blocking; CONSTANT / FIXED-order-0..2 / VERBATIM
    subframes; single-partition Rice residuals; optional left/side
    stereo).  ``stereo_mode``: 'independent', 'left_side', or 'auto'
    (left/side when it shrinks the residual sum)."""
    if bits != 16:
        raise ValueError("encoder fixture supports 16-bit PCM only")
    n_total = len(pcm) // 2
    if n_total % channels:
        raise ValueError("PCM length not divisible by channel count")
    samples = struct.unpack("<%dh" % n_total, pcm[: n_total * 2])
    n = n_total // channels
    chans = [list(samples[c::channels]) for c in range(channels)]

    out = bytearray(b"fLaC")
    info = bytearray()
    info += struct.pack(">HH", min(block_size, n or block_size), block_size)
    info += b"\x00\x00\x00" * 2  # min/max frame size unknown
    packed = (rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36) | n
    info += packed.to_bytes(8, "big")
    info += hashlib.md5(pcm[: n_total * 2]).digest()
    out.append(0x80)  # last-metadata-block flag + type 0 (STREAMINFO)
    out += (34).to_bytes(3, "big")
    out += info

    bs_known = block_size in _BLOCK_SIZE_CODES
    sr_known = rate in _SAMPLE_RATE_CODES
    frame_no = 0
    for start in range(0, max(n, 1), block_size):
        blk = [ch[start : start + block_size] for ch in chans]
        bs = len(blk[0])
        if bs == 0:
            break
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking
        if bs == block_size and bs_known:
            bs_code, bs_extra = _BLOCK_SIZE_CODES[bs], None
        elif bs <= 256:
            bs_code, bs_extra = 6, bs - 1
        else:
            bs_code, bs_extra = 7, bs - 1
        bw.write(bs_code, 4)
        if sr_known:
            sr_code, sr_extra = _SAMPLE_RATE_CODES[rate], None
        elif rate < 65536:
            sr_code, sr_extra = 13, rate  # 16-bit Hz
        elif rate % 10 == 0 and rate // 10 < 65536:
            sr_code, sr_extra = 14, rate // 10  # 16-bit tens-of-Hz
        else:
            raise ValueError(
                f"sample rate {rate} not representable in a frame header"
            )
        bw.write(sr_code, 4)

        use_side = False
        if channels == 2 and stereo_mode in ("auto", "left_side"):
            side = [l - r for l, r in zip(blk[0], blk[1])]
            if stereo_mode == "left_side":
                use_side = True
            else:
                use_side = sum(abs(s) for s in side) < sum(
                    abs(r) for r in blk[1]
                )
        bw.write(8 if use_side else channels - 1, 4)
        bw.write(_SAMPLE_SIZE_CODES[bits], 3)
        bw.write(0, 1)
        for b in _encode_coded_number(frame_no):
            bw.write(b, 8)
        if bs_code == 6:
            bw.write(bs_extra, 8)
        elif bs_code == 7:
            bw.write(bs_extra, 16)
        if sr_code in (13, 14):
            bw.write(sr_extra, 16)
        bw.align()
        header = bw.getvalue()
        body = _BitWriter()
        if use_side:
            side = [l - r for l, r in zip(blk[0], blk[1])]
            _encode_subframe(body, blk[0], bits)
            _encode_subframe(body, side, bits + 1)
        else:
            for ch in blk:
                _encode_subframe(body, ch, bits)
        body.align()
        frame = header + bytes([_crc8(header)]) + body.getvalue()
        frame += _crc16(frame).to_bytes(2, "big")
        out += frame
        frame_no += 1
    return bytes(out)
