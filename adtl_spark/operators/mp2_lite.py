"""Dependency-free MPEG-1/MPEG-2 Layer I/II audio codec — stdlib + numpy.

Closes the broadcast-audio decode gap behind the codec registry's MP3
seam: MPEG-1 Layer II is the DAB/DVB/broadcast archive format (and
Layer I its simpler sibling), and its decode is ~an order of magnitude
less machinery than Layer III (no Huffman tables, no IMDCT, no bit
reservoir).  Written from the public ISO/IEC 11172-3 + 13818-3
structure:

- **decode** (:func:`decode_mpeg_audio`): frame-header walk (shared
  sync/bitrate/samplerate layout with ``probe_mpeg_audio``), CRC skip,
  Layer II bit allocation — the FULL (sample_rate, bitrate-class)
  selection of ISO 11172-3 §2.4.2.3: Tables 3-B.2a/b (high-rate, 27
  and 30 subbands), 3-B.2c/d (low-rate <= 48 kbit/s per channel, 8 and
  12 subbands — speech/low-bitrate broadcast archives), and the single
  ISO 13818-3 Table B.1 (30 subbands) for MPEG-2 LSF (22.05/24/16 kHz)
  and MPEG-2.5 (11.025/12/8 kHz) frames — then scfsi/scalefactor
  decoding, grouped (3/5/9-level) and ungrouped sample dequantization,
  intensity joint stereo above the bound, and the 32-band polyphase
  synthesis filterbank.  Layer I decodes with the same machinery
  (4-bit allocations, 12 samples/subband, no grouping) at every
  version.  Layer III payloads raise NotImplementedError naming the
  registry seam (``register_decoder('mp3', fn)``), as before — its
  exact ISO Huffman table data cannot be honestly re-derived.
- **encode** (:func:`encode_mp2`, :func:`encode_mp1`): fixture-side
  encoders producing spec-shaped frames (real headers, allocation /
  scfsi / scalefactor / sample fields in bitstream order) from PCM, so
  the decode path is exercised on byte streams any conformant decoder
  agrees on structurally.  The version is inferred from the sample
  rate (44.1/48/32 kHz -> MPEG-1, 22.05/24/16 -> MPEG-2 LSF,
  11.025/12/8 -> MPEG-2.5), and the allocation ladder adapts to the
  selected table, so low-rate and LSF fixtures come out of the same
  entry points.

DISCLOSED APPROXIMATION — the filterbank prototype: ISO 11172-3 gives
the 512-tap analysis/synthesis window as a numeric table (Tables
3-C.1/3-B.3) with no closed form; reproducing it from memory is not
possible and copying it is not the point.  This module instead derives
both windows from a Kaiser-windowed sinc pseudo-QMF prototype (cutoff
1.12/128 cycles/sample, beta 6.5, the standard (-1)^k*pi/4 phasing for
adjacent-band alias cancellation), numerically validated at ~70 dB
single-tone alias rejection and ~36 dB composite reconstruction SNR —
BELOW certified ISO quality (the Layer II quantizer itself bounds real
streams to ~60 dB) but comfortably above what corpus screening (VAD,
clipping, features, dedup) needs.  Bit-exact ISO conformance is NOT
claimed: real MP2 files decode intelligibly and feature-faithfully, a
certified decoder still arrives via ``register_decoder``.  The
quantization layer (midtread reconstruction ``(2c+1-steps)/steps``) IS
exactly ISO Table 3-B.4 (algebraically identical to the C/D constants).

The Layer I AND Layer II SAMPLE SECTIONS are fully vectorized: their
field layout is static once the allocation is read, so decode extracts
every sample field of a frame with one ``np.unpackbits`` + weighted
``reduceat`` pass (:func:`_extract_bits`) and Layer II encode packs the
whole frame with one ``np.packbits`` pass (:func:`_pack_bits`) —
measured 2-4x decode / 6-8x encode over the per-bit reader,
byte-identical output (the per-bit reader remains for the small
sequential allocation/scfsi/scalefactor headers, and Layer I's per-bit
sample walk is retained as :func:`_decode_frame_l1_perbit`, the
differential ground truth).  Per-payload work inside Arrow
``mapInPandas`` batches like the repo's other codecs.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_mpeg_audio", "encode_mp2", "encode_mp1"]

# --------------------------------------------------------------------------
# 32-band polyphase filterbank (see the module docstring's disclosure)

_N = 512


def _filterbank() -> tuple[np.ndarray, np.ndarray]:
    n = np.arange(_N)
    proto = np.sinc((n - (_N - 1) / 2) * 1.12 / 64.0) * np.kaiser(_N, 6.5)
    k = np.arange(32)[:, None]
    phase = (2 * k + 1) * np.pi / 64.0 * (n[None, :] - (_N - 1) / 2)
    phi = ((-1) ** k) * np.pi / 4
    analysis = proto[None, :] * np.cos(phase + phi)
    synthesis = (proto[None, :] * np.cos(phase - phi)).T
    # scale so (a) full-scale input -> subband samples inside the
    # quantizer's (-1, 1) with headroom (scalefactors reach 2.0) and
    # (b) analysis->synthesis is unity gain (measured passband gain of
    # the unscaled pair: 25.9034)
    return analysis / 32.0, synthesis * (32.0 / 25.903414)


_H, _F = _filterbank()


def _analyze(x: np.ndarray) -> np.ndarray:
    """PCM (float, (-1,1)) -> subband sample blocks (T, 32); one block
    per 32 input samples, 512-sample history window (zero-primed)."""
    nblocks = len(x) // 32
    xp = np.concatenate([np.zeros(_N), x[: nblocks * 32]])
    # windows: for block t, the 512 most recent samples, newest first
    idx = (
        _N + 32 * (np.arange(nblocks)[:, None] + 1) - 1
        - np.arange(_N)[None, :]
    )
    return xp[idx] @ _H.T


def _synthesize(S: np.ndarray) -> np.ndarray:
    """Subband blocks (T, 32) -> PCM floats (32*T samples)."""
    T = S.shape[0]
    y = np.zeros(32 * T + _N)
    contrib = S @ _F.T  # (T, 512)
    for t in range(T):
        y[32 * t : 32 * t + _N] += contrib[t]
    return y[: 32 * T]


# --------------------------------------------------------------------------
# Tables (ISO 11172-3): scalefactors, Layer II allocation

# Table 3-B.1: sf[i] = 2 * 2^(-i/3), indices 0..62 (63 is forbidden)
_SF = 2.0 * np.exp2(-np.arange(63) / 3.0)

# quantization classes: steps -> (bits, grouped).  Grouped classes pack
# 3 samples into one code of the given width.
_CLASS_BITS = {
    3: (5, True), 5: (7, True), 7: (3, False), 9: (10, True),
    15: (4, False), 31: (5, False), 63: (6, False), 127: (7, False),
    255: (8, False), 511: (9, False), 1023: (10, False),
    2047: (11, False), 4095: (12, False), 8191: (13, False),
    16383: (14, False), 32767: (15, False), 65535: (16, False),
}

# Layer II allocation tables.  Each entry: (nbal, allowed-steps list
# indexed by the allocation code - 1).  High-rate (>= 56 kbit/s/ch)
# rows (3-B.2a: 27 subbands; 3-B.2b: 30):
_STEPS_LO = [3, 7, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095, 8191,
             16383, 32767, 65535]
_STEPS_MID = [3, 5, 7, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
              8191, 65535]
_STEPS_HI = [3, 5, 7, 9, 15, 31, 65535]
_STEPS_TOP = [3, 5, 65535]
# Low-rate (<= 48 kbit/s/ch) rows (3-B.2c: 8 subbands at 44.1/48 kHz;
# 3-B.2d: 12 subbands at 32 kHz) — all-grouped small quantizers, topping
# out at 15-bit ungrouped (32767; the straight-to-16-bit jump belongs to
# the high-rate 3-B.2a/b rows only):
_STEPS_LR4 = [3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
              8191, 16383, 32767]
_STEPS_LR3 = [3, 5, 9, 15, 31, 63, 127]
# MPEG-2 LSF (ISO 13818-3 Table B.1, 30 subbands, ALL bitrates) rows —
# same shape as the low-rate rows but capped at 15 bits and with a
# 2-bit top tier:
_STEPS_LSF4 = [3, 5, 9, 15, 31, 63, 127, 255, 511, 1023, 2047, 4095,
               8191, 16383, 32767]
_STEPS_LSF2 = [3, 5, 9]


def _alloc_table(sample_rate: int, kbps_per_ch: int, version: int = 3) -> list:
    """Per-subband (nbal, steps-list) rows, selected per ISO 11172-3
    §2.4.2.3 by BOTH sample rate and bitrate class (a 44.1 kHz
    112-160 kbit/s stereo stream is the 27-subband 3-B.2a, not the
    30-subband 3-B.2b a rate-only lookup would pick):

    - MPEG-2 LSF / MPEG-2.5 (``version`` != 3): the single ISO 13818-3
      Table B.1 (30 subbands) at every rate and bitrate;
    - <= 48 kbit/s per channel: 3-B.2c (8 subbands, 44.1/48 kHz) or
      3-B.2d (12 subbands, 32 kHz);
    - 56-80 kbit/s per channel: 3-B.2a (27 subbands) at ALL rates;
    - >= 96 kbit/s per channel: 3-B.2a at 48 kHz, 3-B.2b (30 subbands)
      at 44.1/32 kHz.
    """
    if version != 3:
        return (
            [(4, _STEPS_LSF4)] * 4
            + [(3, _STEPS_LR3)] * 7
            + [(2, _STEPS_LSF2)] * 19
        )
    if kbps_per_ch <= 48:
        sblimit = 8 if sample_rate in (44100, 48000) else 12
        return [(4, _STEPS_LR4)] * 2 + [(3, _STEPS_LR3)] * (sblimit - 2)
    rows = (
        [(4, _STEPS_LO)] * 3
        + [(4, _STEPS_MID)] * 8
        + [(3, _STEPS_HI)] * 12
        + [(2, _STEPS_TOP)] * 4
    )
    if sample_rate != 48000 and kbps_per_ch >= 96:
        rows = rows + [(2, _STEPS_TOP)] * 3  # 3-B.2b extends to 30
    return rows


# --------------------------------------------------------------------------
# Bit I/O (MSB-first, the MPEG audio convention)


class _BitReader:
    def __init__(self, data: bytes, bitpos: int = 0) -> None:
        self.data = data
        self.pos = bitpos

    def read(self, n: int) -> int:
        v = 0
        pos, data = self.pos, self.data
        for _ in range(n):
            v = (v << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return v


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.out.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush_to(self, nbytes: int) -> bytes:
        if self.nbits:
            self.write(0, 8 - self.nbits)
        if len(self.out) > nbytes:
            raise ValueError(
                f"frame overflow: {len(self.out)} > {nbytes} bytes"
            )
        return bytes(self.out) + b"\x00" * (nbytes - len(self.out))



def _extract_bits(data: bytes, start_bit: int, widths) -> "np.ndarray":
    """All variable-width big-endian fields starting at ``start_bit``,
    widths per field, in ONE vectorized pass: unpackbits once, weight
    each bit by its position within its field, reduceat per field.
    The Layer I/II sample section has a FIXED field layout once the
    allocation is known — one call replaces ~a thousand per-bit Python
    reads per frame."""
    widths = np.asarray(widths, dtype=np.int64)
    if len(widths) == 0:
        return np.zeros(0, dtype=np.int64)
    ends = np.cumsum(widths)
    total = int(ends[-1])
    nbytes = min((start_bit + total + 7) // 8, len(data))
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8, count=nbytes))
    if start_bit + total > len(bits):
        raise ValueError("MPEG audio frame shorter than its field layout")
    starts = np.repeat(start_bit + ends - widths, widths)
    within = np.arange(total) - np.repeat(ends - widths, widths)
    w = np.repeat(widths, widths)
    weights = np.left_shift(np.int64(1), w - 1 - within)
    vals = bits[starts + within].astype(np.int64) * weights
    bounds = np.concatenate([[0], ends[:-1]])
    return np.add.reduceat(vals, bounds)


def _pack_bits(values, widths) -> tuple[bytes, int]:
    """Inverse of :func:`_extract_bits`: concatenate variable-width
    big-endian fields into zero-padded bytes; returns (packed, nbits)."""
    widths = np.asarray(widths, dtype=np.int64)
    values = np.asarray(values, dtype=np.int64)
    if len(widths) == 0:
        return b"", 0
    ends = np.cumsum(widths)
    total = int(ends[-1])
    within = np.arange(total) - np.repeat(ends - widths, widths)
    w = np.repeat(widths, widths)
    v = np.repeat(values, widths)
    bits = ((v >> (w - 1 - within)) & 1).astype(np.uint8)
    return np.packbits(bits).tobytes(), total


# --------------------------------------------------------------------------
# Header parsing (same public layout as multimodal.probe_mpeg_audio)

_BITRATES_L1 = (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
                416, 448)
_BITRATES_L2 = (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
                320, 384)
# MPEG-2 LSF (and 2.5) bitrate tables, ISO 13818-3 — Layer II/III share
# one table
_BITRATES_L1_LSF = (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176,
                    192, 224, 256)
_BITRATES_L2_LSF = (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                    144, 160)
_RATES = {
    3: (44100, 48000, 32000),        # MPEG-1
    2: (22050, 24000, 16000),        # MPEG-2 LSF
    0: (11025, 12000, 8000),         # MPEG-2.5
}


def _parse_header(h: int) -> dict:
    if (h >> 21) != 0x7FF:
        raise ValueError("lost MPEG audio sync")
    version_bits = (h >> 19) & 0x3
    layer = 4 - ((h >> 17) & 0x3)
    if version_bits == 1:
        raise ValueError("reserved MPEG version bits")
    if layer == 3:
        raise NotImplementedError(
            "MP3 (Layer III) decoding requires a codec library; install "
            "one via register_decoder('mp3', fn) — Layers I/II decode "
            "natively and probe_mpeg_audio covers Layer III metadata"
        )
    if layer == 4:
        raise ValueError("reserved layer bits")
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        raise ValueError("free-format or invalid bitrate/samplerate")
    if version_bits == 3:
        table = _BITRATES_L1 if layer == 1 else _BITRATES_L2
    else:
        table = _BITRATES_L1_LSF if layer == 1 else _BITRATES_L2_LSF
    kbps = table[br_idx - 1]
    rate = _RATES[version_bits][sr_idx]
    mode = (h >> 6) & 0x3
    return {
        "version": version_bits,
        "layer": layer,
        "kbps": kbps,
        "rate": rate,
        "padding": (h >> 9) & 1,
        "crc": ((h >> 16) & 1) == 0,
        "mode": mode,
        "nch": 1 if mode == 3 else 2,
        "bound": (
            (((h >> 4) & 0x3) + 1) * 4 if mode == 1 else None
        ),  # joint stereo: intensity bound; None = all independent
        "frame_bytes": (
            (12 * kbps * 1000 // rate + ((h >> 9) & 1)) * 4
            if layer == 1
            else 144 * kbps * 1000 // rate + ((h >> 9) & 1)
        ),
    }


# --------------------------------------------------------------------------
# Layer II frame decode


def _dequant(code: int, steps: int) -> float:
    # ISO Table 3-B.4 (C, D constants) in closed form: midtread
    return (2 * code + 1 - steps) / steps


def _decode_frame_l2(data: bytes, hdr: dict) -> np.ndarray:
    nch = hdr["nch"]
    table = _alloc_table(hdr["rate"], hdr["kbps"] // nch, hdr["version"])
    sblimit = len(table)
    bound = hdr["bound"] if hdr["bound"] is not None else sblimit
    bound = min(bound, sblimit)
    br = _BitReader(data, (4 + (2 if hdr["crc"] else 0)) * 8)

    alloc = [[0] * sblimit for _ in range(nch)]
    for sb in range(sblimit):
        nbal, steps_list = table[sb]
        if sb < bound:
            for ch in range(nch):
                idx = br.read(nbal)
                alloc[ch][sb] = steps_list[idx - 1] if idx else 0
        else:
            idx = br.read(nbal)
            steps = steps_list[idx - 1] if idx else 0
            for ch in range(nch):
                alloc[ch][sb] = steps

    scfsi = [[0] * sblimit for _ in range(nch)]
    for sb in range(sblimit):
        for ch in range(nch):
            if alloc[ch][sb]:
                scfsi[ch][sb] = br.read(2)

    sf = [[(1.0, 1.0, 1.0)] * sblimit for _ in range(nch)]
    for sb in range(sblimit):
        for ch in range(nch):
            if not alloc[ch][sb]:
                continue
            si = scfsi[ch][sb]
            if si == 0:
                a, b, c = br.read(6), br.read(6), br.read(6)
            elif si == 1:
                a = br.read(6)
                b, c = a, br.read(6)
            elif si == 2:
                a = br.read(6)
                b = c = a
            else:
                a, c = br.read(6), br.read(6)
                b = c  # pattern [a, c, c] per 2.4.3.3 ("11": parts 1, 2+3)
            sf[ch][sb] = (_SF[a], _SF[b], _SF[c])

    # ---- sample section: ONE vectorized extraction ----
    # grouped classes read one `bits`-wide code; ungrouped triplets fold
    # into ONE 3*bits-wide field and split arithmetically (3*16 = 48
    # bits, safe in int64)
    gr_l, sb_l, ch_l, steps_l, grouped_l, bits_l, widths = (
        [], [], [], [], [], [], []
    )
    for gr in range(12):
        for sb in range(sblimit):
            shared = sb >= bound
            for ch in range(1 if shared else nch):
                steps = alloc[ch][sb]
                if not steps:
                    continue
                bits, grouped = _CLASS_BITS[steps]
                gr_l.append(gr)
                sb_l.append(sb)
                ch_l.append(ch)
                steps_l.append(steps)
                grouped_l.append(grouped)
                bits_l.append(bits)
                widths.append(bits if grouped else 3 * bits)
    S = np.zeros((36, nch, 32))
    if not widths:
        return S
    vals = _extract_bits(data, br.pos, widths)
    gr_a, sb_a = np.array(gr_l), np.array(sb_l)
    steps_a = np.array(steps_l, dtype=np.int64)
    g = np.array(grouped_l)
    bits_a = np.array(bits_l, dtype=np.int64)
    c = np.empty((len(vals), 3), dtype=np.int64)
    if g.any():
        vg, sg = vals[g], steps_a[g]
        c[g, 0] = vg % sg
        c[g, 1] = (vg // sg) % sg
        c[g, 2] = vg // (sg * sg)
    ng = ~g
    if ng.any():
        vn, bn = vals[ng], bits_a[ng]
        mask = (np.int64(1) << bn) - 1
        c[ng, 0] = (vn >> (2 * bn)) & mask
        c[ng, 1] = (vn >> bn) & mask
        c[ng, 2] = vn & mask
    x = (2 * c + 1 - steps_a[:, None]) / steps_a[:, None]  # Table 3-B.4
    # scalefactor application + scatter: shared (intensity) subbands
    # land on BOTH channels, each scaled by its own scalefactor
    sf_a = np.array(sf)  # (nch, sblimit, 3) scalefactor values
    part_a = gr_a // 4
    rows = 3 * gr_a[:, None] + np.arange(3)[None, :]
    shared_a = sb_a >= bound
    src_ch = np.array(ch_l)
    for tch in range(nch):
        take = (src_ch == tch) | shared_a if nch > 1 else src_ch == tch
        if not take.any():
            continue
        f = sf_a[tch, sb_a[take], part_a[take]]
        S[rows[take], tch, sb_a[take][:, None]] = x[take] * f[:, None]
    return S


def _l1_headers(data: bytes, hdr: dict):
    """Layer I allocation + scalefactor sections (sequential, tiny);
    returns (alloc, sf, bound, bit position of the sample section)."""
    nch = hdr["nch"]
    bound = hdr["bound"] if hdr["bound"] is not None else 32
    br = _BitReader(data, (4 + (2 if hdr["crc"] else 0)) * 8)

    alloc = [[0] * 32 for _ in range(nch)]
    for sb in range(32):
        if sb < bound:
            for ch in range(nch):
                a = br.read(4)
                if a == 15:
                    raise ValueError("forbidden Layer I allocation 15")
                alloc[ch][sb] = (1 << (a + 1)) - 1 if a else 0
        else:
            a = br.read(4)
            if a == 15:
                raise ValueError("forbidden Layer I allocation 15")
            steps = (1 << (a + 1)) - 1 if a else 0
            for ch in range(nch):
                alloc[ch][sb] = steps

    sf = [[1.0] * 32 for _ in range(nch)]
    for sb in range(32):
        for ch in range(nch):
            if alloc[ch][sb]:
                sf[ch][sb] = _SF[br.read(6)]
    return alloc, sf, bound, br.pos


def _decode_frame_l1(data: bytes, hdr: dict) -> np.ndarray:
    """Layer I frame decode with the sample section extracted in ONE
    vectorized :func:`_extract_bits` pass (the same static-layout
    property as Layer II: once the allocation is read, every sample
    field's width is known).  Byte-identical to the retained per-bit
    path (:func:`_decode_frame_l1_perbit` — differential-tested)."""
    nch = hdr["nch"]
    alloc, sf, bound, pos = _l1_headers(data, hdr)

    S = np.zeros((12, nch, 32))
    s_l, sb_l, ch_l, steps_l, widths = [], [], [], [], []
    for s in range(12):
        for sb in range(32):
            shared = sb >= bound
            for ch in range(1 if shared else nch):
                steps = alloc[ch][sb]
                if not steps:
                    continue
                s_l.append(s)
                sb_l.append(sb)
                ch_l.append(ch)
                steps_l.append(steps)
                widths.append(steps.bit_length())
    if not widths:
        return S
    codes = _extract_bits(data, pos, widths)
    steps_a = np.array(steps_l, dtype=np.int64)
    x = (2 * codes + 1 - steps_a) / steps_a  # Table 3-B.4 midtread
    s_a, sb_a = np.array(s_l), np.array(sb_l)
    src_ch = np.array(ch_l)
    shared_a = sb_a >= bound
    sf_a = np.array(sf)  # (nch, 32)
    for tch in range(nch):
        take = (src_ch == tch) | shared_a if nch > 1 else src_ch == tch
        if not take.any():
            continue
        # a shared subband lands on a channel only if that channel's
        # allocation is live (mirrors the per-bit path exactly)
        live = np.array(alloc[tch])[sb_a[take]] > 0
        tk = np.where(take)[0][live]
        S[s_a[tk], tch, sb_a[tk]] = x[tk] * sf_a[tch, sb_a[tk]]
    return S


def _decode_frame_l1_perbit(data: bytes, hdr: dict) -> np.ndarray:
    """The original per-bit Layer I sample walk, kept as the
    differential ground truth for :func:`_decode_frame_l1`."""
    nch = hdr["nch"]
    alloc, sf, bound, pos = _l1_headers(data, hdr)
    br = _BitReader(data, pos)

    S = np.zeros((12, nch, 32))
    for s in range(12):
        for sb in range(32):
            shared = sb >= bound
            for ch in range(1 if shared else nch):
                steps = alloc[ch][sb]
                if not steps:
                    continue
                nb = steps.bit_length()
                code = br.read(nb)
                v = _dequant(code, steps)
                for tch in range(nch) if shared else (ch,):
                    if alloc[tch][sb]:
                        S[s, tch, sb] = v * sf[tch][sb]
    return S


def decode_mpeg_audio(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode an MPEG-1 Layer I/II stream to ``(sample_rate, channels,
    16, pcm_bytes)`` — the decode_audio contract.  Skips a leading
    ID3v2 tag, walks frames until the first non-frame byte (trailing
    ID3v1/junk tolerated), and synthesizes once over the concatenated
    subband blocks per channel.  Layer III and MPEG-2/2.5 raise
    NotImplementedError (see module docstring)."""
    pos = 0
    if payload[:3] == b"ID3" and len(payload) >= 10:
        size = 0
        for b in payload[6:10]:
            size = (size << 7) | (b & 0x7F)
        pos = 10 + size + (10 if payload[5] & 0x10 else 0)
    blocks: list[np.ndarray] = []
    meta = None
    while pos + 4 <= len(payload):
        h = int.from_bytes(payload[pos : pos + 4], "big")
        if (h >> 21) != 0x7FF:
            break
        hdr = _parse_header(h)
        if meta is None:
            meta = (hdr["rate"], hdr["nch"], hdr["layer"])
        elif meta != (hdr["rate"], hdr["nch"], hdr["layer"]):
            break  # format change: stop at the consistent prefix
        frame = payload[pos : pos + hdr["frame_bytes"]]
        if len(frame) < hdr["frame_bytes"]:
            break  # truncated final frame
        dec = _decode_frame_l2 if hdr["layer"] == 2 else _decode_frame_l1
        blocks.append(dec(frame, hdr))
        pos += hdr["frame_bytes"]
    if meta is None or not blocks:
        raise ValueError("no complete MPEG audio frame found")
    S = np.concatenate(blocks, axis=0)  # (T, nch, 32)
    rate, nch, _layer = meta
    chans = [_synthesize(S[:, ch, :]) for ch in range(nch)]
    pcm = np.stack(chans, axis=1).reshape(-1)
    pcm = np.clip(np.round(pcm * 32767.0), -32768, 32767).astype("<i2")
    return rate, nch, 16, pcm.tobytes()


# --------------------------------------------------------------------------
# Fixture encoders


def _version_of(rate: int) -> int:
    """MPEG version bits inferred from the sample rate (the three rate
    families are disjoint): 44.1/48/32 kHz -> MPEG-1 (3), halved ->
    MPEG-2 LSF (2), quartered -> MPEG-2.5 (0)."""
    for version, rates in _RATES.items():
        if rate in rates:
            return version
    raise ValueError(f"sample rate {rate} is not an MPEG audio rate")


def _header_int(layer: int, kbps: int, rate: int, nch: int) -> int:
    version = _version_of(rate)
    if version == 3:
        table = _BITRATES_L1 if layer == 1 else _BITRATES_L2
    else:
        table = _BITRATES_L1_LSF if layer == 1 else _BITRATES_L2_LSF
    if kbps not in table:
        raise ValueError(
            f"{kbps} kbit/s is not a Layer {'I' * layer} bitrate at "
            f"{rate} Hz; valid: {table}"
        )
    return (
        (0x7FF << 21)
        | (version << 19)
        | ((4 - layer) << 17)
        | (1 << 16)                      # no CRC
        | ((table.index(kbps) + 1) << 12)
        | (_RATES[version].index(rate) << 10)
        | ((3 if nch == 1 else 0) << 6)  # mono / stereo
    )


def _quant(x: float, steps: int) -> int:
    # inverse of _dequant: midtread on (-1, 1)
    c = int(np.floor(((x + 1.0) * steps) / 2.0))
    return min(max(c, 0), steps - 1)


def _pick_sf(maxabs: float) -> int:
    """Smallest scalefactor (largest index) still covering maxabs."""
    idx = int(np.searchsorted(-_SF, -maxabs, side="right")) - 1
    return min(max(idx, 0), 62)


def _l2_ladder_cost(steps_by_sb: list[int], nch: int) -> int:
    """Sample bits per frame for a per-subband steps choice (0 = that
    subband is not allocated and costs no sample bits)."""
    total = 0
    for steps in steps_by_sb:
        if not steps:
            continue
        bits, grouped = _CLASS_BITS[steps]
        total += 12 * nch * (bits if grouped else 3 * bits)
    return total


def _l2_allocation(table: list, nch: int, frame_bits: int) -> list[int]:
    """Static fixture allocation: the richest ladder that fits the
    frame's sample-bit budget (header + allocation + scfsi=0 + full
    scalefactors are fixed costs), expressed as allocation codes into
    the table's steps lists.  The high-rate 3-B.2a/b tables keep the
    original three hand-tiered ladders FIRST (byte-stability of every
    existing fixture); all tables then fall through to generic tiered
    ladders built from each subband's own allowed-steps list (largest
    allowed value <= a per-nbal cap), which is what makes the low-rate
    3-B.2c/d and LSF B.1 tables encodable without per-table ladder
    hand-tuning."""
    sblimit = len(table)
    # header + allocation codes are always transmitted; scfsi (2) +
    # three scalefactors (18) per channel only for ALLOCATED subbands
    # (steps 0 = allocation code 0, the decoder skips them) — this is
    # what lets mid/low bitrates fit: real encoders leave upper
    # subbands unallocated rather than thinning every quantizer
    always = 32 + nch * sum(nbal for nbal, _ in table)
    budget = frame_bits - always

    def fits(steps_by_sb: list[int]) -> bool:
        nalloc = sum(1 for s in steps_by_sb if s)
        return (
            nch * 20 * nalloc + _l2_ladder_cost(steps_by_sb, nch)
            <= budget
        )

    ladders: list[list[int]] = []
    if sblimit >= 23 and 7 in table[12][1]:  # high-rate 3-B.2a/b shape
        ladders += [
            [16383] * 3 + [255] * 8 + [7] * 12 + [3] * (sblimit - 23),
            [15] * 3 + [9] * 8 + [7] * 12 + [3] * (sblimit - 23),
            [7] * 3 + [5] * 8 + [3] * 12 + [3] * (sblimit - 23),
        ]
    # coverage-major order: a ladder keeping MORE subbands (coarser
    # quantizers) beats one keeping fewer rich ones — zeroing a band
    # the signal lives in is the one unrecoverable allocation choice
    for k in (sblimit, 24, 16, 12, 8, 5, 3, 2):
        if k > sblimit:
            continue
        for cap4, cap3, cap2 in (
            (16383, 127, 9), (255, 63, 5), (15, 9, 3), (9, 5, 3),
            (5, 3, 3), (3, 3, 3),
        ):
            cap_by_nbal = {4: cap4, 3: cap3, 2: cap2}
            full = [
                max(s for s in steps if s <= cap_by_nbal[nbal])
                for nbal, steps in table
            ]
            ladders.append(full[:k] + [0] * (sblimit - k))
    for steps_by_sb in ladders:
        if fits(steps_by_sb):
            return [
                table[sb][1].index(steps_by_sb[sb]) + 1
                if steps_by_sb[sb] else 0
                for sb in range(sblimit)
            ]
    raise ValueError(
        f"bitrate too low for the leanest fixture ladder "
        f"({frame_bits} frame bits, {nch} ch)"
    )


def encode_mp2(
    pcm: bytes | np.ndarray,
    rate: int = 48000,
    channels: int = 1,
    kbps: int | None = None,
    joint_bound: int | None = None,
) -> bytes:
    """Encode 16-bit PCM to MPEG-1/MPEG-2 Layer II frames (fixture
    encoder): static allocation, scfsi=0 (all three scalefactors
    transmitted), per-part scalefactor selection, grouped/ungrouped
    quantization — every field in bitstream order, zero-padded to the
    frame length.  The MPEG version follows the sample rate
    (44.1/48/32 kHz -> MPEG-1 with the full 3-B.2a-d table selection;
    22.05/24/16 -> MPEG-2 LSF; 11.025/12/8 -> MPEG-2.5 — both LSF
    families use ISO 13818-3 Table B.1).  Default bitrates (MPEG-1):
    192 kbit/s mono, 384 kbit/s stereo; LSF rates need an explicit
    ``kbps`` from the 8-160 table for stereo.
    ``joint_bound`` (4/8/12/16, stereo only) writes intensity joint
    stereo: above the bound one allocation and one sample set (the
    channel mean) are shared, scalefactors stay per channel — the
    decoder's intensity path, exercised by fixture."""
    if kbps is None:
        kbps = 192 * channels
    if joint_bound is not None and (
        channels != 2 or joint_bound not in (4, 8, 12, 16)
    ):
        raise ValueError("joint_bound requires stereo and bound in 4/8/12/16")
    x = (
        np.frombuffer(pcm, dtype="<i2").astype(np.float64) / 32768.0
        if isinstance(pcm, (bytes, bytearray))
        else np.asarray(pcm, dtype=np.float64)
    )
    x = x.reshape(-1, channels)
    nframes = -(-x.shape[0] // 1152)
    pad = nframes * 1152 - x.shape[0]
    if pad:
        x = np.vstack([x, np.zeros((pad, channels))])
    S = np.stack(
        [_analyze(x[:, ch]) for ch in range(channels)], axis=1
    )  # (T, nch, 32)
    table = _alloc_table(rate, kbps // channels, _version_of(rate))
    sblimit = len(table)
    bound = joint_bound if joint_bound is not None else sblimit
    hdr = _header_int(2, kbps, rate, channels)
    if joint_bound is not None:
        hdr = (hdr & ~(0x3 << 6) & ~(0x3 << 4)) | (1 << 6) | (
            (joint_bound // 4 - 1) << 4
        )
    frame_bytes = 144 * kbps * 1000 // rate
    alloc_codes = _l2_allocation(table, channels, frame_bytes * 8)
    steps_by_sb = np.array(
        [
            table[sb][1][alloc_codes[sb] - 1] if alloc_codes[sb] else 0
            for sb in range(sblimit)
        ],
        dtype=np.int64,
    )
    bits_by_sb = np.array(
        [_CLASS_BITS[int(st)][0] if st else 0 for st in steps_by_sb],
        dtype=np.int64,
    )
    grouped_by_sb = np.array(
        [_CLASS_BITS[int(st)][1] if st else False for st in steps_by_sb]
    )
    live_sb = [sb for sb in range(sblimit) if alloc_codes[sb]]
    out = bytearray()
    for f in range(nframes):
        Sf = S[36 * f : 36 * f + 36].copy()  # (36, nch, 32)
        if joint_bound is not None:
            # intensity: the channel mean is what's transmitted above
            # the bound; both channels get its scalefactor, so the
            # decoder reconstructs the mean on both sides
            Sf[:, :, bound:] = Sf[:, :, bound:].mean(axis=1, keepdims=True)
        # the WHOLE frame is one (values, widths) field list packed in a
        # single vectorized np.packbits pass; quantization is one array
        # expression (the midtread inverse of Table 3-B.4)
        Sb = Sf[:, :, :sblimit]
        maxabs = np.abs(Sb.reshape(3, 12, channels, sblimit)).max(axis=1)
        sf_idx = (np.searchsorted(-_SF, -maxabs, side="right") - 1).clip(
            0, 62
        )  # (3, nch, sblimit)
        sfv = _SF[sf_idx]
        steps_s = steps_by_sb[None, None, :]
        xq = Sb / sfv[np.repeat(np.arange(3), 12)]
        codes = np.floor((xq + 1.0) * steps_s / 2.0).astype(np.int64)
        codes = codes.clip(0, steps_s - 1)  # (36, nch, sblimit)
        values, widths = [np.int64(hdr)], [32]
        for sb in range(sblimit):
            for _ch in range(channels if sb < bound else 1):
                values.append(alloc_codes[sb])
                widths.append(table[sb][0])
        # scfsi = 0 and scalefactors only for ALLOCATED subbands (the
        # decoder skips both for allocation code 0)
        values.extend([0] * (len(live_sb) * channels))
        widths.extend([2] * (len(live_sb) * channels))
        # scalefactors in (sb, ch, part) transmission order
        sf_t = sf_idx.transpose(2, 1, 0)[live_sb].reshape(-1)
        values.extend(sf_t.tolist())
        widths.extend([6] * len(sf_t))
        # samples: grouped triplets fold to one code; ungrouped triplets
        # fold to one 3*bits field (matching the decoder's extraction)
        c0 = codes[0::3]  # (12, nch, sblimit) granule-major views
        c1 = codes[1::3]
        c2 = codes[2::3]
        fold_g = c0 + steps_s * c1 + steps_s * steps_s * c2
        fold_u = (
            (c0 << (2 * bits_by_sb[None, None, :]))
            | (c1 << bits_by_sb[None, None, :])
            | c2
        )
        fold = np.where(grouped_by_sb[None, None, :], fold_g, fold_u)
        fw = np.where(grouped_by_sb, bits_by_sb, 3 * bits_by_sb)
        for gr in range(12):
            for sb in live_sb:
                for ch in range(channels if sb < bound else 1):
                    values.append(int(fold[gr, ch, sb]))
                    widths.append(int(fw[sb]))
        packed, nbits = _pack_bits(values, widths)
        if len(packed) > frame_bytes:
            raise ValueError(
                f"frame overflow: {len(packed)} > {frame_bytes} bytes"
            )
        out += packed + b"\x00" * (frame_bytes - len(packed))
    return bytes(out)


def encode_mp1(
    pcm: bytes | np.ndarray,
    rate: int = 48000,
    channels: int = 1,
    kbps: int | None = None,
    alloc_bits: int | None = None,
) -> bytes:
    """Encode 16-bit PCM to MPEG-1/MPEG-2 Layer I frames (fixture
    encoder): uniform per-subband allocation (``alloc_bits`` auto-picked
    as the largest uniform width the frame budget affords when not
    given), one scalefactor per subband.  The MPEG version follows the
    sample rate (:func:`_version_of`).  Default bitrates (MPEG-1):
    192 kbit/s mono, 384 kbit/s stereo; LSF needs ``kbps`` from the
    32-256 LSF Layer I table for stereo."""
    if kbps is None:
        kbps = 192 * channels
    x = (
        np.frombuffer(pcm, dtype="<i2").astype(np.float64) / 32768.0
        if isinstance(pcm, (bytes, bytearray))
        else np.asarray(pcm, dtype=np.float64)
    )
    x = x.reshape(-1, channels)
    nframes = -(-x.shape[0] // 384)
    pad = nframes * 384 - x.shape[0]
    if pad:
        x = np.vstack([x, np.zeros((pad, channels))])
    S = np.stack([_analyze(x[:, ch]) for ch in range(channels)], axis=1)
    hdr = _header_int(1, kbps, rate, channels)
    frame_bytes = (12 * kbps * 1000 // rate) * 4
    if alloc_bits is None:
        avail = frame_bytes * 8 - 32 - channels * 32 * (4 + 6)
        alloc_bits = min(max(avail // (12 * 32 * channels), 2), 15)
    steps = (1 << alloc_bits) - 1
    acode = alloc_bits - 1  # nb = alloc + 1
    out = bytearray()
    for f in range(nframes):
        Sf = S[12 * f : 12 * f + 12]
        w = _BitWriter()
        w.write(hdr, 32)
        for _sb in range(32):
            for _ch in range(channels):
                w.write(acode, 4)
        sf_idx = np.zeros((channels, 32), dtype=int)
        for sb in range(32):
            for ch in range(channels):
                sf_idx[ch, sb] = _pick_sf(float(np.abs(Sf[:, ch, sb]).max()))
                w.write(int(sf_idx[ch, sb]), 6)
        for s in range(12):
            for sb in range(32):
                for ch in range(channels):
                    f_ = _SF[sf_idx[ch, sb]]
                    w.write(_quant(float(Sf[s, ch, sb]) / f_, steps),
                            alloc_bits)
        out += w.flush_to(frame_bytes)
    return bytes(out)
