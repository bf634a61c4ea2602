"""Encrypted-payload parity ops (reference backend/app/db/types.py:15-34
EncryptedJSON / security/crypto.py:38-63): decrypt∘encrypt = identity,
fail-soft decrypt, and silver/gold invariance under encrypted bronze."""

from __future__ import annotations

from pyspark.sql import functions as F

from smartdatapipeline_spark.functions import crypto as CR
from smartdatapipeline_spark.operators.kpi import run_daily_kpis
from smartdatapipeline_spark.session import read_events

SF_SMALL = "/root/testdata/sf0.001"


def test_roundtrip_identity_on_parquet(spark):
    """Every props payload in the real events file survives
    encrypt→decrypt bit-exactly (GCM, random IV)."""
    ev = read_events(spark, SF_SMALL)
    rt = CR.decrypt_payload(CR.encrypt_payload("props", CR.TEST_KEY), CR.TEST_KEY).cast("string")
    bad = ev.filter(~rt.eqNullSafe(F.col("props"))).count()
    assert bad == 0


def test_ciphertext_differs_from_plaintext(spark):
    df = spark.createDataFrame([('{"k": 1}',)], "props string")
    row = df.select(
        CR.encrypt_payload("props", CR.TEST_KEY).alias("ct"),
        F.col("props").cast("binary").alias("pt"),
    ).first()
    assert bytes(row["ct"]) != bytes(row["pt"])
    # GCM overhead: 12-byte IV + 16-byte auth tag
    assert len(bytes(row["ct"])) == len(bytes(row["pt"])) + 28


def test_wrong_key_fails_soft(spark):
    """try_decrypt yields NULL (not a job abort) on a wrong key — the
    mixed/corrupt-bronze read path."""
    df = spark.createDataFrame([("payload",)], "props string")
    enc = df.select(CR.encrypt_payload("props", CR.TEST_KEY).alias("ct"))
    out = enc.select(
        CR.try_decrypt_payload("ct", key="xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx")
        .cast("string")
        .alias("pt")
    ).first()
    assert out["pt"] is None


def test_gold_unchanged_under_encrypted_bronze(spark, tmp_path):
    """Writing bronze with an encrypted props column and decrypting on
    read leaves silver/gold KPI results identical to the plain path —
    the reference's EncryptedJSON is storage-transparent the same way."""
    ev = read_events(spark, SF_SMALL).withColumnRenamed("event_type", "metric")
    plain_gold = run_daily_kpis(ev, source_col=None).orderBy("metric_date", "metric")

    bronze_path = str(tmp_path / "bronze_enc")
    CR.encrypt_column(ev, "props", CR.TEST_KEY).write.mode("overwrite").parquet(bronze_path)
    dec = CR.decrypt_column(spark.read.parquet(bronze_path), "props", CR.TEST_KEY)
    enc_gold = run_daily_kpis(dec, source_col=None).orderBy("metric_date", "metric")

    assert [r.asDict() for r in plain_gold.collect()] == [
        r.asDict() for r in enc_gold.collect()
    ]


def test_key_required_and_ecb_gated(spark):
    """ADVICE: no default key — callers must supply one (tests use
    TEST_KEY); ECB needs an explicit allow_ecb acknowledgement."""
    import pytest

    with pytest.raises(TypeError):
        CR.encrypt_payload("props")  # key is positional-required now
    with pytest.raises(ValueError, match="ECB"):
        CR.encrypt_payload("props", CR.TEST_KEY, mode="ECB")
    # explicit acknowledgement builds the expression fine
    CR.encrypt_payload("props", CR.TEST_KEY, mode="ECB", allow_ecb=True)
    with pytest.raises(ValueError, match="secret manager"):
        CR.key_from_conf(spark)
    spark.conf.set(CR.CONF_KEY, CR.TEST_KEY)
    try:
        assert CR.key_from_conf(spark) == CR.TEST_KEY
    finally:
        spark.conf.unset(CR.CONF_KEY)
