"""Standard-security-handler decryption for pdf_lite — the
empty-user-password case that covers most "encrypted" PDFs on the open
web (files encrypted only to restrict printing/copying: the user
password is empty, so any conformant reader opens them silently, and a
corpus pipeline must too).  Written from the public ISO 32000-1 §7.6
algorithms (2/4/5/6) and FIPS-197:

- **RC4** (:func:`rc4`): the classic V1/V2 and /V2-crypt-filter cipher.
- **AES-128/256-CBC** (:func:`aes_cbc_decrypt` / ``aes_cbc_encrypt``):
  the /AESV2 crypt filter (16-byte IV prefix, PKCS#7 padding).  The
  S-box is GENERATED from its FIPS-197 definition (multiplicative
  inverse in GF(2^8) + affine transform) rather than transcribed, and
  the implementation is pinned to the FIPS-197 Appendix C test vector.
  Pure-Python by design: content streams are KB-sized, and the module
  is fixture/extraction-side — a production swap-in (pdfium) takes the
  whole pdf_pages call site with it.
- **Key derivation** (:func:`standard_key`): Algorithm 2 — MD5 over
  (padded password, /O, /P as signed little-endian int32, first /ID
  element), 50 re-hash rounds for R >= 3, key length /Length bits.
- **Empty-user-password check** (:func:`check_empty_user_password`):
  Algorithm 4 (R2: RC4 of the pad) / Algorithm 5 (R >= 3: MD5(pad +
  ID) through 20 XOR-keyed RC4 rounds, first 16 bytes compared).
- **Per-object keys** (:func:`object_key`): Algorithm 1 — MD5(key +
  objnum[0:3] + gen[0:2] (+ b"sAlT" for AESV2)), truncated to
  min(n + 5, 16).

R5/R6 (AES-256 / PDF 2.0) is covered too: the SHA-2-based Algorithm
2.A/2.B hash (:func:`hash_r6` — the 64+-round AES-CBC/SHA-256/384/512
iteration), empty-user-password validation against the 48-byte /U
(hash + validation salt + key salt), and file-key recovery by
AES-256-CBC-decrypting /UE with the key-salt intermediate.  /V 5
content uses the FILE key directly (no per-object derivation) with the
same IV-prefixed CBC layout as AESV2.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = [
    "rc4",
    "aes_cbc_decrypt",
    "aes_cbc_encrypt",
    "aes_cbc_raw",
    "hash_r6",
    "standard_key",
    "check_empty_user_password",
    "check_empty_user_password_r6",
    "object_key",
    "PAD",
]

# ISO 32000-1 Table 7.6.3.3: the 32-byte password padding constant
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, byte in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = byte ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# --------------------------------------------------------------------------
# AES (FIPS-197), tables generated from their definitions


def _gf_mul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return p


def _build_sbox() -> tuple[list[int], list[int]]:
    # multiplicative inverses in GF(2^8) via exp/log over generator 3
    exp, log = [0] * 256, [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x = _gf_mul(x, 3)
    inv = [0] * 256
    for a in range(1, 256):
        # g^255 = 1, so reduce the exponent mod 255 (a = 1 -> g^0)
        inv[a] = exp[(255 - log[a]) % 255]
    sbox = [0] * 256
    for a in range(256):
        b = inv[a]
        s = 0
        for i in range(8):
            bit = (
                (b >> i) ^ (b >> ((i + 4) % 8)) ^ (b >> ((i + 5) % 8))
                ^ (b >> ((i + 6) % 8)) ^ (b >> ((i + 7) % 8))
                ^ (0x63 >> i)
            ) & 1
            s |= bit << i
        sbox[a] = s
    inv_sbox = [0] * 256
    for a in range(256):
        inv_sbox[sbox[a]] = a
    return sbox, inv_sbox


_SBOX, _INV_SBOX = _build_sbox()


def _expand_key(key: bytes) -> list[list[int]]:
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= rcon
            rcon = _gf_mul(rcon, 2)
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([w[i - nk][j] ^ t[j] for j in range(4)])
    return w


def _build_te() -> tuple[list[int], list[int], list[int], list[int]]:
    # T-tables: one fused SubBytes+MixColumns word per input byte
    # (row0 in the MSB), Te_i shifted per MixColumns row rotation
    te0, te1, te2, te3 = [], [], [], []
    for x in range(256):
        s = _SBOX[x]
        s2, s3 = _gf_mul(s, 2), _gf_mul(s, 3)
        te0.append((s2 << 24) | (s << 16) | (s << 8) | s3)
        te1.append((s3 << 24) | (s2 << 16) | (s << 8) | s)
        te2.append((s << 24) | (s3 << 16) | (s2 << 8) | s)
        te3.append((s << 24) | (s << 16) | (s3 << 8) | s2)
    return te0, te1, te2, te3


_TE0, _TE1, _TE2, _TE3 = _build_te()


def _rk_words(w) -> list[int]:
    return [
        (wi[0] << 24) | (wi[1] << 16) | (wi[2] << 8) | wi[3] for wi in w
    ]


def _encrypt_block_fast(block: bytes, rk: list[int], nr: int) -> bytes:
    """T-table encryption — the R6 KDF runs ~10k block encryptions per
    hash, where the schoolbook per-byte path is ~50x too slow.
    Differential-pinned byte-identical to :func:`_encrypt_block`."""
    c0 = int.from_bytes(block[0:4], "big") ^ rk[0]
    c1 = int.from_bytes(block[4:8], "big") ^ rk[1]
    c2 = int.from_bytes(block[8:12], "big") ^ rk[2]
    c3 = int.from_bytes(block[12:16], "big") ^ rk[3]
    for rnd in range(1, nr):
        k = 4 * rnd
        t0 = (
            _TE0[(c0 >> 24) & 255] ^ _TE1[(c1 >> 16) & 255]
            ^ _TE2[(c2 >> 8) & 255] ^ _TE3[c3 & 255] ^ rk[k]
        )
        t1 = (
            _TE0[(c1 >> 24) & 255] ^ _TE1[(c2 >> 16) & 255]
            ^ _TE2[(c3 >> 8) & 255] ^ _TE3[c0 & 255] ^ rk[k + 1]
        )
        t2 = (
            _TE0[(c2 >> 24) & 255] ^ _TE1[(c3 >> 16) & 255]
            ^ _TE2[(c0 >> 8) & 255] ^ _TE3[c1 & 255] ^ rk[k + 2]
        )
        t3 = (
            _TE0[(c3 >> 24) & 255] ^ _TE1[(c0 >> 16) & 255]
            ^ _TE2[(c1 >> 8) & 255] ^ _TE3[c2 & 255] ^ rk[k + 3]
        )
        c0, c1, c2, c3 = t0, t1, t2, t3
    k = 4 * nr
    out = bytearray(16)
    S = _SBOX
    cols = (c0, c1, c2, c3)
    for j in range(4):
        w_ = (
            (S[(cols[j] >> 24) & 255] << 24)
            | (S[(cols[(j + 1) % 4] >> 16) & 255] << 16)
            | (S[(cols[(j + 2) % 4] >> 8) & 255] << 8)
            | S[cols[(j + 3) % 4] & 255]
        ) ^ rk[k + j]
        out[4 * j : 4 * j + 4] = w_.to_bytes(4, "big")
    return bytes(out)


def _add_round_key(s, w, rnd):
    for c in range(4):
        for r in range(4):
            s[r][c] ^= w[4 * rnd + c][r]


def _encrypt_block(block: bytes, w, nr: int) -> bytes:
    s = [[block[r + 4 * c] for c in range(4)] for r in range(4)]
    _add_round_key(s, w, 0)
    for rnd in range(1, nr + 1):
        for r in range(4):
            for c in range(4):
                s[r][c] = _SBOX[s[r][c]]
        for r in range(1, 4):
            s[r] = s[r][r:] + s[r][:r]
        if rnd < nr:
            for c in range(4):
                a = [s[r][c] for r in range(4)]
                s[0][c] = _gf_mul(a[0], 2) ^ _gf_mul(a[1], 3) ^ a[2] ^ a[3]
                s[1][c] = a[0] ^ _gf_mul(a[1], 2) ^ _gf_mul(a[2], 3) ^ a[3]
                s[2][c] = a[0] ^ a[1] ^ _gf_mul(a[2], 2) ^ _gf_mul(a[3], 3)
                s[3][c] = _gf_mul(a[0], 3) ^ a[1] ^ a[2] ^ _gf_mul(a[3], 2)
        _add_round_key(s, w, rnd)
    return bytes(s[r][c] for c in range(4) for r in range(4))


def _decrypt_block(block: bytes, w, nr: int) -> bytes:
    s = [[block[r + 4 * c] for c in range(4)] for r in range(4)]
    _add_round_key(s, w, nr)
    for rnd in range(nr - 1, -1, -1):
        for r in range(1, 4):
            s[r] = s[r][-r:] + s[r][:-r]
        for r in range(4):
            for c in range(4):
                s[r][c] = _INV_SBOX[s[r][c]]
        _add_round_key(s, w, rnd)
        if rnd > 0:
            for c in range(4):
                a = [s[r][c] for r in range(4)]
                s[0][c] = (
                    _gf_mul(a[0], 14) ^ _gf_mul(a[1], 11)
                    ^ _gf_mul(a[2], 13) ^ _gf_mul(a[3], 9)
                )
                s[1][c] = (
                    _gf_mul(a[0], 9) ^ _gf_mul(a[1], 14)
                    ^ _gf_mul(a[2], 11) ^ _gf_mul(a[3], 13)
                )
                s[2][c] = (
                    _gf_mul(a[0], 13) ^ _gf_mul(a[1], 9)
                    ^ _gf_mul(a[2], 14) ^ _gf_mul(a[3], 11)
                )
                s[3][c] = (
                    _gf_mul(a[0], 11) ^ _gf_mul(a[1], 13)
                    ^ _gf_mul(a[2], 9) ^ _gf_mul(a[3], 14)
                )
    return bytes(s[r][c] for c in range(4) for r in range(4))


def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """AES-CBC with the PDF /AESV2 layout: the first 16 bytes of
    ``data`` are the IV; PKCS#7 padding is stripped.  Zero-length and
    IV-only payloads (some producers emit them for empty streams)
    degrade to an empty stream rather than aborting the whole file."""
    if len(data) <= 16:
        return b""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("AES-CBC data must be IV + non-empty blocks")
    w = _expand_key(key)
    nr = len(key) // 4 + 6
    prev = data[:16]
    out = bytearray()
    for i in range(16, len(data), 16):
        block = data[i : i + 16]
        plain = _decrypt_block(block, w, nr)
        out += bytes(p ^ v for p, v in zip(plain, prev))
        prev = block
    pad = out[-1]
    if not 1 <= pad <= 16:
        raise ValueError("bad AES-CBC padding")
    return bytes(out[:-pad])


def aes_cbc_raw(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    """AES-CBC with NO padding and NO IV prefix — the R6 KDF and the
    /UE //OE file-key wrapping use exact-multiple-of-16 payloads.  The
    encrypt side takes the T-table fast path: the KDF chains ~10k
    sequential block encryptions per hash."""
    if len(data) % 16:
        raise ValueError("raw CBC needs a block multiple")
    w = _expand_key(key)
    nr = len(key) // 4 + 6
    out = bytearray()
    prev = iv
    if encrypt:
        rk = _rk_words(w)
        for i in range(0, len(data), 16):
            prev = _encrypt_block_fast(
                bytes(p ^ v for p, v in zip(data[i : i + 16], prev)),
                rk, nr,
            )
            out += prev
        return bytes(out)
    for i in range(0, len(data), 16):
        block = data[i : i + 16]
        plain = _decrypt_block(block, w, nr)
        out += bytes(p ^ v for p, v in zip(plain, prev))
        prev = block
    return bytes(out)


def hash_r6(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B (revision 6 KDF; revision 5 is the
    plain SHA-256 first step): iterate AES-128-CBC over a 64x repeat of
    (password + K + udata), re-hash with SHA-256/384/512 selected by
    the ciphertext's first-16-byte sum mod 3, until round >= 64 and the
    last ciphertext byte <= round - 32."""
    K = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + K + udata) * 64
        e = aes_cbc_raw(K[:16], K[16:32], k1, encrypt=True)
        mod = sum(e[:16]) % 3
        K = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return K[:32]


def check_empty_user_password_r6(
    u_entry: bytes, ue_entry: bytes, revision: int
) -> bytes | None:
    """R5/R6 empty-user-password check + file-key recovery: /U is
    hash(32) + validation salt(8) + key salt(8); the file key is
    AES-256-CBC(no pad, zero IV) decrypt of /UE under the key-salt
    intermediate hash.  R5 uses the single-step SHA-256 hash."""
    if len(u_entry) < 48 or len(ue_entry) < 32:
        return None
    vsalt, ksalt = u_entry[32:40], u_entry[40:48]
    if revision == 5:
        h = hashlib.sha256(b"" + vsalt).digest()
        inter = hashlib.sha256(b"" + ksalt).digest()
    else:
        h = hash_r6(b"", vsalt)
        inter = hash_r6(b"", ksalt)
    if h != u_entry[:32]:
        return None
    return aes_cbc_raw(inter, bytes(16), ue_entry[:32], encrypt=False)


def aes_cbc_encrypt(key: bytes, data: bytes, iv: bytes) -> bytes:
    """Fixture-side AES-CBC encrypt (PKCS#7, IV prepended)."""
    if len(iv) != 16:
        raise ValueError("IV must be 16 bytes")
    w = _expand_key(key)
    nr = len(key) // 4 + 6
    padlen = 16 - len(data) % 16
    data = data + bytes([padlen]) * padlen
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(p ^ v for p, v in zip(data[i : i + 16], prev))
        prev = _encrypt_block(block, w, nr)
        out += prev
    return bytes(out)


# --------------------------------------------------------------------------
# Standard security handler (ISO 32000-1 §7.6.3)


def _pad_password(password: bytes) -> bytes:
    return (password + PAD)[:32]


def standard_key(
    password: bytes,
    o_entry: bytes,
    p: int,
    file_id: bytes,
    revision: int,
    key_bytes: int,
    encrypt_metadata: bool = True,
) -> bytes:
    """Algorithm 2: the file encryption key."""
    h = hashlib.md5()
    h.update(_pad_password(password))
    h.update(o_entry[:32])
    h.update(struct.pack("<i", p))
    h.update(file_id)
    if revision >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()
    if revision >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:key_bytes]).digest()
    return key[:key_bytes]


def compute_u(key: bytes, file_id: bytes, revision: int) -> bytes:
    """Algorithm 4 (R2) / 5 (R >= 3): the /U entry for a key."""
    if revision == 2:
        return rc4(key, PAD)
    digest = hashlib.md5(PAD + file_id).digest()
    x = rc4(key, digest)
    for i in range(1, 20):
        step = bytes(b ^ i for b in key)
        x = rc4(step, x)
    return x + b"\x00" * 16  # 16 bytes arbitrary padding per spec


def compute_o(
    owner_password: bytes, user_password: bytes, revision: int,
    key_bytes: int,
) -> bytes:
    """Algorithm 3: the /O entry (fixture side)."""
    key = hashlib.md5(_pad_password(owner_password)).digest()
    if revision >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()
    key = key[:key_bytes]
    x = rc4(key, _pad_password(user_password))
    if revision >= 3:
        for i in range(1, 20):
            step = bytes(b ^ i for b in key)
            x = rc4(step, x)
    return x


def check_empty_user_password(
    o_entry: bytes,
    u_entry: bytes,
    p: int,
    file_id: bytes,
    revision: int,
    key_bytes: int,
    encrypt_metadata: bool = True,
) -> bytes | None:
    """Algorithm 6 for the EMPTY user password: returns the file key if
    it validates against /U, else None (a real user password we cannot
    know — the caller raises)."""
    key = standard_key(
        b"", o_entry, p, file_id, revision, key_bytes, encrypt_metadata
    )
    u = compute_u(key, file_id, revision)
    ok = (
        u[:32] == u_entry[:32] if revision == 2 else u[:16] == u_entry[:16]
    )
    return key if ok else None


def object_key(
    file_key: bytes, num: int, gen: int, aes: bool = False
) -> bytes:
    """Algorithm 1: the per-object key (RC4 or AESV2)."""
    h = hashlib.md5()
    h.update(file_key)
    h.update(struct.pack("<I", num)[:3])
    h.update(struct.pack("<I", gen)[:2])
    if aes:
        h.update(b"sAlT")
    return h.digest()[: min(len(file_key) + 5, 16)]
