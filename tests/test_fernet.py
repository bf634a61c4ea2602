"""Fernet wire-format parity (round 7, "What's missing" #3).

The expected token is constructed INDEPENDENTLY: AES-128 is implemented
from scratch below (FIPS-197 tables — the same
don't-trust-the-implementation-under-test discipline as the
hand-assembled JPEG goldens), HMAC/base64 come from the stdlib. The
Spark column-expression path must produce byte-identical tokens, and
wherever the `cryptography` wheel exists the latent tests prove real
library interop both directions."""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import struct

import pytest

from smartdatapipeline_spark.functions import crypto as CR

# ---------------------------------------------------------------------------
# from-scratch AES-128 (encrypt direction only — enough for CBC)
# ---------------------------------------------------------------------------

_SBOX = [
    0x63, 0x7C, 0x77, 0x7B, 0xF2, 0x6B, 0x6F, 0xC5, 0x30, 0x01, 0x67, 0x2B,
    0xFE, 0xD7, 0xAB, 0x76, 0xCA, 0x82, 0xC9, 0x7D, 0xFA, 0x59, 0x47, 0xF0,
    0xAD, 0xD4, 0xA2, 0xAF, 0x9C, 0xA4, 0x72, 0xC0, 0xB7, 0xFD, 0x93, 0x26,
    0x36, 0x3F, 0xF7, 0xCC, 0x34, 0xA5, 0xE5, 0xF1, 0x71, 0xD8, 0x31, 0x15,
    0x04, 0xC7, 0x23, 0xC3, 0x18, 0x96, 0x05, 0x9A, 0x07, 0x12, 0x80, 0xE2,
    0xEB, 0x27, 0xB2, 0x75, 0x09, 0x83, 0x2C, 0x1A, 0x1B, 0x6E, 0x5A, 0xA0,
    0x52, 0x3B, 0xD6, 0xB3, 0x29, 0xE3, 0x2F, 0x84, 0x53, 0xD1, 0x00, 0xED,
    0x20, 0xFC, 0xB1, 0x5B, 0x6A, 0xCB, 0xBE, 0x39, 0x4A, 0x4C, 0x58, 0xCF,
    0xD0, 0xEF, 0xAA, 0xFB, 0x43, 0x4D, 0x33, 0x85, 0x45, 0xF9, 0x02, 0x7F,
    0x50, 0x3C, 0x9F, 0xA8, 0x51, 0xA3, 0x40, 0x8F, 0x92, 0x9D, 0x38, 0xF5,
    0xBC, 0xB6, 0xDA, 0x21, 0x10, 0xFF, 0xF3, 0xD2, 0xCD, 0x0C, 0x13, 0xEC,
    0x5F, 0x97, 0x44, 0x17, 0xC4, 0xA7, 0x7E, 0x3D, 0x64, 0x5D, 0x19, 0x73,
    0x60, 0x81, 0x4F, 0xDC, 0x22, 0x2A, 0x90, 0x88, 0x46, 0xEE, 0xB8, 0x14,
    0xDE, 0x5E, 0x0B, 0xDB, 0xE0, 0x32, 0x3A, 0x0A, 0x49, 0x06, 0x24, 0x5C,
    0xC2, 0xD3, 0xAC, 0x62, 0x91, 0x95, 0xE4, 0x79, 0xE7, 0xC8, 0x37, 0x6D,
    0x8D, 0xD5, 0x4E, 0xA9, 0x6C, 0x56, 0xF4, 0xEA, 0x65, 0x7A, 0xAE, 0x08,
    0xBA, 0x78, 0x25, 0x2E, 0x1C, 0xA6, 0xB4, 0xC6, 0xE8, 0xDD, 0x74, 0x1F,
    0x4B, 0xBD, 0x8B, 0x8A, 0x70, 0x3E, 0xB5, 0x66, 0x48, 0x03, 0xF6, 0x0E,
    0x61, 0x35, 0x57, 0xB9, 0x86, 0xC1, 0x1D, 0x9E, 0xE1, 0xF8, 0x98, 0x11,
    0x69, 0xD9, 0x8E, 0x94, 0x9B, 0x1E, 0x87, 0xE9, 0xCE, 0x55, 0x28, 0xDF,
    0x8C, 0xA1, 0x89, 0x0D, 0xBF, 0xE6, 0x42, 0x68, 0x41, 0x99, 0x2D, 0x0F,
    0xB0, 0x54, 0xBB, 0x16,
]
_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36]


def _xtime(a):
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _expand_key(key):
    w = [list(key[i : i + 4]) for i in range(0, 16, 4)]
    for i in range(4, 44):
        t = list(w[i - 1])
        if i % 4 == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // 4 - 1]
        w.append([a ^ b for a, b in zip(w[i - 4], t)])
    return [sum(w[4 * r : 4 * r + 4], []) for r in range(11)]


def _aes128_block(block, round_keys):
    s = [b ^ k for b, k in zip(block, round_keys[0])]
    for rnd in range(1, 11):
        s = [_SBOX[b] for b in s]
        # ShiftRows on column-major state: byte i is at (row i%4, col i//4)
        s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
        if rnd != 10:
            m = []
            for c in range(4):
                col = s[4 * c : 4 * c + 4]
                m += [
                    _xtime(col[0]) ^ _xtime(col[1]) ^ col[1] ^ col[2] ^ col[3],
                    col[0] ^ _xtime(col[1]) ^ _xtime(col[2]) ^ col[2] ^ col[3],
                    col[0] ^ col[1] ^ _xtime(col[2]) ^ _xtime(col[3]) ^ col[3],
                    _xtime(col[0]) ^ col[0] ^ col[1] ^ col[2] ^ _xtime(col[3]),
                ]
            s = m
        s = [b ^ k for b, k in zip(s, round_keys[rnd])]
    return bytes(s)


def _aes128_cbc_pkcs7(msg: bytes, key: bytes, iv: bytes) -> bytes:
    rk = _expand_key(key)
    pad = 16 - len(msg) % 16
    msg = msg + bytes([pad] * pad)
    out, prev = b"", iv
    for i in range(0, len(msg), 16):
        blk = bytes(a ^ b for a, b in zip(msg[i : i + 16], prev))
        prev = _aes128_block(list(blk), rk)
        out += prev
    return out


def test_from_scratch_aes_vs_fips197_vector():
    """FIPS-197 appendix C.1 AES-128 known-answer test."""
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = _aes128_block(list(pt), _expand_key(key))
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"


def _expected_token(payload: bytes, key: str, ts: int) -> bytes:
    raw = base64.urlsafe_b64decode(key)
    sk, ek = raw[:16], raw[16:]
    iv = hmac.new(sk, b"iv" + payload, hashlib.sha256).digest()[:16]
    ct = _aes128_cbc_pkcs7(payload, ek, iv)
    body = b"\x80" + struct.pack(">Q", ts) + iv + ct
    tag = hmac.new(sk, body, hashlib.sha256).digest()
    return base64.urlsafe_b64encode(body + tag)


# ---------------------------------------------------------------------------
# Spark path vs the independent construction
# ---------------------------------------------------------------------------

PAYLOADS = [
    b'{"a": 1}',
    b"",
    b"x" * 16,  # exact block: PKCS7 adds a full pad block
    json.dumps({"k": "v", "n": [1, 2, 3]}).encode(),
    "unicodé 中文".encode(),
]


def test_fernet_encrypt_tokens_byte_identical(spark):
    key = CR.fernet_dev_key()
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(PAYLOADS)], "i long, msg binary"
    )
    got = {
        r["i"]: r["tok"]
        for r in df.select(
            "i", CR.fernet_encrypt("msg", key, timestamp=1700000000).alias("tok")
        ).collect()
    }
    for i, p in enumerate(PAYLOADS):
        assert got[i].encode() == _expected_token(p, key, 1700000000), i


def test_fernet_decrypt_roundtrip_and_invalid_token(spark):
    from pyspark.sql import functions as F

    key = CR.fernet_dev_key()
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(PAYLOADS)], "i long, msg binary"
    )
    enc = df.select("i", "msg", CR.fernet_encrypt("msg", key).alias("tok"))
    rt = enc.select(
        "i",
        (CR.fernet_decrypt("tok", key).eqNullSafe(F.col("msg"))).alias("ok"),
    )
    assert all(r["ok"] for r in rt.collect())

    # corruption: flipped tag byte, wrong version byte -> NULL, not error
    def corrupt(tok: str, pos: int, ch: str) -> str:
        raw = bytearray(base64.urlsafe_b64decode(tok))
        raw[pos] = raw[pos] ^ 0x01 if ch == "^" else ord(ch)
        return base64.urlsafe_b64encode(bytes(raw)).decode()

    toks = [r["tok"] for r in enc.collect()]
    bad = [corrupt(toks[0], -1, "^"), corrupt(toks[0], 0, "\x81")]
    bdf = spark.createDataFrame([(t,) for t in bad], "tok string")
    got = bdf.select(CR.fernet_decrypt("tok", key).alias("p")).collect()
    assert all(r["p"] is None for r in got)

    # wrong key -> NULL (HMAC mismatch)
    other = base64.urlsafe_b64encode(hashlib.sha256(b"other").digest()).decode()
    got2 = (
        spark.createDataFrame([(toks[0],)], "tok string")
        .select(CR.fernet_decrypt("tok", other).alias("p"))
        .collect()
    )
    assert got2[0]["p"] is None


def test_fernet_key_validation():
    with pytest.raises(ValueError, match="32 bytes"):
        CR.fernet_encrypt("x", base64.urlsafe_b64encode(b"short").decode())


# ---------------------------------------------------------------------------
# latent library parity (cryptography wheel absent in this sandbox)
# ---------------------------------------------------------------------------


def test_cryptography_fernet_accepts_spark_tokens(spark):
    fernet = pytest.importorskip("cryptography.fernet")

    key = CR.fernet_dev_key()
    df = spark.createDataFrame([(bytearray(b'{"a": 1}'),)], "msg binary")
    tok = df.select(CR.fernet_encrypt("msg", key).alias("t")).first()["t"]
    f = fernet.Fernet(key.encode())
    assert f.decrypt(tok.encode()) == b'{"a": 1}'


def test_spark_decrypts_cryptography_tokens(spark):
    fernet = pytest.importorskip("cryptography.fernet")

    key = CR.fernet_dev_key()
    tok = fernet.Fernet(key.encode()).encrypt(b'{"b": 2}').decode()
    got = (
        spark.createDataFrame([(tok,)], "tok string")
        .select(CR.fernet_decrypt("tok", key).cast("string").alias("p"))
        .first()["p"]
    )
    assert got == '{"b": 2}'
