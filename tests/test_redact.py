"""PII redaction: known-answer rewrites, count parity, idempotence."""

import duckdb
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


@pytest.fixture(scope="module")
def pii_df(spark):
    rows = [
        (0, "write to alice.smith+x@sub.example.co.uk today"),
        (1, "server 192.168.0.1 and 10.0.255.7 rebooted"),
        (2, "call 555-867-5309 or 555 123 4567 now"),
        (3, "mixed bob@ex.io at 1.2.3.4 tel 555-000-1111"),
        (4, "nothing to hide here 42 plain words"),
        (5, "not-an-ip 1234.5.6.7890 half@way"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows,
                                              columns=["doc_id", "text"]))


def test_redaction_known_answers(spark, pii_df):
    from grenier_spark.operators.redact import redact_pii

    out = {r.doc_id: r for r in redact_pii(pii_df).collect()}
    assert out[0].redacted == "write to <EMAIL> today"
    assert out[0].n_email == 1 and out[0].n_ip == 0
    assert out[1].redacted == "server <IP> and <IP> rebooted"
    assert out[1].n_ip == 2
    assert out[2].redacted == "call <PHONE> or <PHONE> now"
    assert out[2].n_phone == 2
    assert out[3].redacted == "mixed <EMAIL> at <IP> tel <PHONE>"
    assert (out[3].n_email, out[3].n_ip, out[3].n_phone) == (1, 1, 1)
    assert out[4].redacted == out[4].redacted == \
        "nothing to hide here 42 plain words"
    # \b guards: 4-digit runs around dots are not IPs; 'half@way' has no
    # TLD so it is not an email
    assert out[5].n_ip == 0 and out[5].n_email == 0
    assert "1234.5.6.7890" in out[5].redacted


def test_redaction_idempotent_and_duckdb_parity(spark, pii_df, duck):
    """Redacting twice changes nothing, and the DuckDB twin produces the
    SAME redacted strings and counts."""
    from grenier_spark.operators.redact import (redact_pii, redact_pii_sql,
                                                redact_text)
    from pyspark.sql import functions as F

    once = redact_pii(pii_df)
    twice = once.select("doc_id",
                        redact_text("redacted").alias("re2")).collect()
    firsts = {r.doc_id: r.redacted for r in once.collect()}
    for r in twice:
        assert r.re2 == firsts[r.doc_id], r.doc_id

    pdf = pii_df.toPandas()
    duck.register("pii_docs", pdf)
    got = duck.execute(redact_pii_sql("SELECT * FROM pii_docs")).df()
    duck.unregister("pii_docs")
    want = once.toPandas()
    m = want.merge(got, on="doc_id", suffixes=("_s", "_d"))
    assert len(m) == len(pdf)
    for c in ("n_email", "n_ip", "n_phone", "redacted"):
        assert (m[f"{c}_s"] == m[f"{c}_d"]).all(), c
