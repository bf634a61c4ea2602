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

Determinism note: GCM prepends a random IV (semantic security — same
plaintext, different ciphertext), exactly like Fernet. Oracle queries
therefore verify the ROUND-TRIP (decrypt∘encrypt = identity), not the
ciphertext bytes; ECB mode exists for the rare deterministic-token need
(e.g. encrypted join keys) and is flagged as weaker.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: 16/24/32-byte keys select AES-128/192/256 (Fernet uses 128-bit AES;
#: default here is 256).
DEFAULT_KEY = "0123456789abcdef0123456789abcdef"


def encrypt_payload(col: Column | str, key: str = DEFAULT_KEY, mode: str = "GCM") -> Column:
    """Encrypt a string/binary column → binary ciphertext (IV-prefixed
    for GCM, like Fernet tokens). Parity op for EncryptedJSON.process_bind_param."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aes_encrypt(c.cast("binary"), F.lit(key), F.lit(mode))


def decrypt_payload(col: Column | str, key: str = DEFAULT_KEY, mode: str = "GCM") -> Column:
    """Decrypt ciphertext back to the original bytes; cast to string for
    JSON payloads. Parity op for EncryptedJSON.process_result_value."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aes_decrypt(c, F.lit(key), F.lit(mode))


def try_decrypt_payload(col: Column | str, key: str = DEFAULT_KEY, mode: str = "GCM") -> Column:
    """NULL-on-failure decrypt (wrong key / corrupt token ⇒ NULL instead
    of job failure) — the fail-soft read path for mixed/bad bronze."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_aes_decrypt(c, F.lit(key), F.lit(mode))


def encrypt_column(df: DataFrame, col_name: str, key: str = DEFAULT_KEY) -> DataFrame:
    """Replace ``col_name`` with its encrypted form (bronze write path)."""
    return df.withColumn(col_name, encrypt_payload(col_name, key))


def decrypt_column(df: DataFrame, col_name: str, key: str = DEFAULT_KEY) -> DataFrame:
    """Replace ``col_name`` with its decrypted string form (read path)."""
    return df.withColumn(col_name, decrypt_payload(col_name, key).cast("string"))
