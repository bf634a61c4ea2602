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
