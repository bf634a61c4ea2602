"""Encrypted-payload parity ops (reference: backend/app/db/types.py:15-34
``EncryptedJSON`` + backend/app/security/crypto.py:38-63 Fernet wrap).

The reference stores raw ingest payloads Fernet-encrypted (AES-128-CBC +
HMAC under one key) and decrypts per read. The Spark-first equivalent is
the built-in ``aes_encrypt``/``aes_decrypt`` expressions — JVM-side,
whole-stage-codegen friendly, no Python in the loop — with AES-GCM
(authenticated, like Fernet) as the default mode.

Scale posture: encryption stays a pure column expression, so 100 TB of
bronze payloads encrypt/decrypt inside the scan/project stages with zero
extra shuffles; the key travels as a literal (in production, from a
secret manager via spark.conf, never a column).

Key handling: ``key`` is REQUIRED on every call — there is no default.
Callers resolve it from their secret manager / ``spark.conf`` (see
``key_from_conf``); ``TEST_KEY`` exists for tests and oracle queries
only and must never reach a production write path. ECB mode (the rare
deterministic-token need, e.g. encrypted join keys) is accepted only
with an explicit ``allow_ecb=True`` acknowledgement — it leaks equal
plaintexts and has no authentication.

Determinism note: GCM prepends a random IV (semantic security — same
plaintext, different ciphertext), exactly like Fernet. Oracle queries
therefore verify the ROUND-TRIP (decrypt∘encrypt = identity), not the
ciphertext bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: test/oracle fixture key (16/24/32-byte keys select AES-128/192/256).
#: Publicly known by construction — NEVER a production key.
TEST_KEY = "0123456789abcdef0123456789abcdef"

#: spark.conf key the deployment stores its payload key under.
CONF_KEY = "smartdatapipeline.crypto.key"


def key_from_conf(spark) -> str:
    """Resolve the payload key from ``spark.conf`` (set by the deployment
    from its secret manager at session build — the key never appears in
    code or in the plan's literals until expression build)."""
    key = spark.conf.get(CONF_KEY, None)
    if not key:
        raise ValueError(
            f"no encryption key configured: set spark.conf {CONF_KEY!r} "
            "from your secret manager (TEST_KEY is for tests only)"
        )
    return key


def _check_mode(mode: str, allow_ecb: bool) -> str:
    if mode.upper() == "ECB" and not allow_ecb:
        raise ValueError(
            "ECB mode leaks equal plaintexts and is unauthenticated; pass "
            "allow_ecb=True only for deterministic-token needs you accept"
        )
    return mode


def encrypt_payload(
    col: Column | str, key: str, mode: str = "GCM", *, allow_ecb: bool = False
) -> Column:
    """Encrypt a string/binary column → binary ciphertext (IV-prefixed
    for GCM, like Fernet tokens). Parity op for EncryptedJSON.process_bind_param."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aes_encrypt(c.cast("binary"), F.lit(key), F.lit(_check_mode(mode, allow_ecb)))


def decrypt_payload(
    col: Column | str, key: str, mode: str = "GCM", *, allow_ecb: bool = False
) -> Column:
    """Decrypt ciphertext back to the original bytes; cast to string for
    JSON payloads. Parity op for EncryptedJSON.process_result_value."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aes_decrypt(c, F.lit(key), F.lit(_check_mode(mode, allow_ecb)))


def try_decrypt_payload(
    col: Column | str, key: str, mode: str = "GCM", *, allow_ecb: bool = False
) -> Column:
    """NULL-on-failure decrypt (wrong key / corrupt token ⇒ NULL instead
    of job failure) — the fail-soft read path for mixed/bad bronze."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_aes_decrypt(c, F.lit(key), F.lit(_check_mode(mode, allow_ecb)))


def encrypt_column(df: DataFrame, col_name: str, key: str) -> DataFrame:
    """Replace ``col_name`` with its encrypted form (bronze write path)."""
    return df.withColumn(col_name, encrypt_payload(col_name, key))


def decrypt_column(df: DataFrame, col_name: str, key: str) -> DataFrame:
    """Replace ``col_name`` with its decrypted string form (read path)."""
    return df.withColumn(col_name, decrypt_payload(col_name, key).cast("string"))


def pseudonymize(col, salt: str = "pseud-v1"):
    """Deterministic keyed pseudonymization: a stable 60-bit token per
    identity (salted md5 — the repo's portable hash family). The same
    identity maps to the same token in EVERY table, so joins and
    group-bys still line up after PII is stripped — referential
    integrity is the property that distinguishes pseudonymization from
    redaction. Deterministic tokens are linkable by construction
    (GDPR pseudonymous data, not anonymous) — pair with ``k_anonymity``
    below for the release audit. Rotate ``salt`` per data-sharing
    agreement; brute-force resistance comes from the salt's secrecy,
    exactly like the reference's conf-resolved payload key."""
    from smartdatapipeline_spark.functions.dedup import h60

    c = col if not isinstance(col, str) else F.col(col)
    return h60(F.concat(F.lit(salt + ":"), c.cast("string")))


def k_anonymity(
    df,
    quasi_cols: tuple[str, ...],
    k: int = 5,
):
    """k-anonymity audit over a quasi-identifier combination: per
    equivalence class (unique quasi-identifier tuple), its size; a
    release satisfies k-anonymity iff every class has ≥ k rows. One
    hash aggregation + one summary row — the pre-release privacy check
    a 100 TB training-data export needs before shipping derived tables.

    Output: one row — (n_rows, n_classes, min_class_size,
    n_rows_below_k, frac_below_k, k_anonymous).
    """
    classes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_c"))
    return classes.agg(
        F.sum("_c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.min("_c").alias("min_class_size"),
        F.sum(F.when(F.col("_c") < k, F.col("_c")).otherwise(F.lit(0))).alias(
            "n_rows_below_k"
        ),
        (
            F.sum(F.when(F.col("_c") < k, F.col("_c")).otherwise(F.lit(0)))
            / F.sum("_c").cast("double")
        ).alias("frac_below_k"),
        (F.min("_c") >= k).alias("k_anonymous"),
    )


# ── Fernet wire format (round 7 — closes "What's missing" #3) ────────
# The reference stores payloads as REAL Fernet tokens
# (security/crypto.py:38-63, cryptography.fernet). Everything below
# builds byte-identical-format tokens with PURE COLUMN EXPRESSIONS —
# AES-128-CBC via aes_encrypt(..., iv), HMAC-SHA256 composed from two
# sha2() calls with the pad constants precomputed driver-side (the key
# is a literal, so K⊕ipad / K⊕opad are plan literals; zero Python in
# the loop). A user can hand these tokens to the reference service and
# cryptography.Fernet(key).decrypt() accepts them
# (tests/test_fernet.py pins the format from-scratch; the
# importorskip(cryptography) test proves library parity wherever that
# wheel exists).
#
#   token = urlsafe_b64( 0x80 ‖ ts(8B BE) ‖ IV(16) ‖ CT ‖ HMAC(32) )
#   key   = urlsafe_b64(signing_key(16) ‖ encryption_key(16))
#
# Determinism: the spec's random IV would break oracle checks and
# idempotent re-encryption, so the IV is SIV-style — the first 16
# bytes of HMAC(signing_key, b"iv" ‖ plaintext). Any IV decrypts and
# verifies identically under real Fernet; the tradeoff (equal
# plaintexts ⇒ equal tokens, like AES-SIV / convergent encryption) is
# documented and acceptable for payload-at-rest parity. ``timestamp``
# is an injectable clock (reference pattern M2) for the same reason.

import base64 as _b64
import hashlib as _hashlib
import struct as _struct


def fernet_dev_key() -> str:
    """The reference's dev-fallback key derivation
    (security/crypto.py:_normalize_key: sha256 of "smartdata-dev",
    urlsafe-b64) — test/demo parity only, never production."""
    return _b64.urlsafe_b64encode(
        _hashlib.sha256(b"smartdata-dev").digest()
    ).decode()


def _fernet_keys(key: str) -> tuple[bytes, bytes]:
    raw = _b64.urlsafe_b64decode(key)
    if len(raw) != 32:
        raise ValueError("Fernet key must decode to 32 bytes")
    return raw[:16], raw[16:]


def _hmac_sha256(key_bytes: bytes, msg: Column) -> Column:
    """HMAC-SHA256 as a column expression: the key is driver-side, so
    K⊕ipad / K⊕opad are 64-byte literals and each HMAC is exactly two
    JVM sha2() evaluations."""
    ipad = bytes(b ^ 0x36 for b in key_bytes.ljust(64, b"\0"))
    opad = bytes(b ^ 0x5C for b in key_bytes.ljust(64, b"\0"))
    inner = F.unhex(F.sha2(F.concat(F.lit(ipad), msg), 256))
    return F.unhex(F.sha2(F.concat(F.lit(opad), inner), 256))


def fernet_encrypt(
    col: Column | str, key: str, timestamp: int = 0
) -> Column:
    """String/binary column → Fernet token (string), wire-compatible
    with ``cryptography.fernet`` (see block comment: SIV-style IV,
    injectable timestamp)."""
    c = F.col(col) if isinstance(col, str) else col
    sign_k, enc_k = _fernet_keys(key)
    msg = c.cast("binary")
    iv = F.substring(
        _hmac_sha256(sign_k, F.concat(F.lit(b"iv"), msg)), 1, 16
    )
    # aes_encrypt(..., iv) returns IV-prefixed ciphertext: exactly the
    # IV ‖ CT span of the token body
    ivct = F.aes_encrypt(msg, F.lit(enc_k), F.lit("CBC"), F.lit("PKCS"), iv)
    body = F.concat(F.lit(b"\x80" + _struct.pack(">Q", timestamp)), ivct)
    tag = _hmac_sha256(sign_k, body)
    # translate maps +/ to -_ AND deletes the MIME line breaks Spark's
    # base64() inserts every 76 chars (unmapped chars are dropped)
    return F.translate(F.base64(F.concat(body, tag)), "+/\r\n", "-_")


def fernet_decrypt(col: Column | str, key: str) -> Column:
    """Fernet token (string) → plaintext binary; NULL when the version
    byte or HMAC does not verify (InvalidToken parity — the reference's
    ``try_decrypt``). Cast to string for JSON payloads."""
    c = F.col(col) if isinstance(col, str) else col
    sign_k, enc_k = _fernet_keys(key)
    b = F.unbase64(F.translate(c, "-_", "+/"))
    n = F.length(b)
    body = F.substring(b, F.lit(1), n - 32)
    tag = F.substring(b, n - 31, F.lit(32))
    ivct = F.substring(body, F.lit(10), n - 41)  # body minus 0x80+ts(8)
    ok = (
        (n >= 57)
        & (F.substring(b, 1, 1) == F.lit(b"\x80"))
        & (tag == _hmac_sha256(sign_k, body))
    )
    plain = F.try_aes_decrypt(ivct, F.lit(enc_k), F.lit("CBC"), F.lit("PKCS"))
    return F.when(ok, plain)
