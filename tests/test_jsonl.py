"""JSONL ingest source: lossless round-trip, quarantine routing of
malformed and non-object lines, NULLs for missing fields, schema guard."""

import json
import os

import pandas as pd
import pytest

from grenier_spark.sources.jsonl import (DOCS_JSONL_SCHEMA, read_jsonl,
                                         write_jsonl)


@pytest.fixture()
def corpus_dir(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p = str(tmp_path / "corpus")
    write_jsonl(docs.withColumn("n_chars",
                                docs.n_chars.cast("long")), p, n_shards=3)
    return docs, p


def test_roundtrip_lossless(spark, corpus_dir):
    docs, p = corpus_dir
    clean, bad = read_jsonl(spark, p)
    assert bad.count() == 0
    a = (docs.toPandas().astype({"doc_id": "int64", "n_chars": "int64"})
         .sort_values("doc_id").reset_index(drop=True))
    b = (clean.toPandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(b[a.columns.tolist()], a,
                                  check_dtype=False)


def test_quarantine_routes_bad_lines(spark, corpus_dir):
    _, p = corpus_dir
    bad_path = os.path.join(p, "part-bad.json")
    with open(bad_path, "w") as f:
        f.write('{"doc_id": 999001, "text": "ok", "lang": "en", '
                '"source": "s", "n_chars": 2}\n')
        f.write('{"doc_id": broken\n')      # unparseable
        f.write("42\n")                      # parses, not an object
        f.write('{"doc_id": 999007}\n')      # valid, missing fields
    clean, bad = read_jsonl(spark, p)
    q = bad.toPandas()
    assert len(q) == 2
    assert (q.src_file.str.contains("part-bad.json")).all()
    assert any("broken" in r for r in q.raw_line)
    got = clean.where("doc_id = 999007").toPandas()
    assert len(got) == 1
    assert got.text.isna().all() and got.n_chars.isna().all()
    ok = clean.where("doc_id = 999001").toPandas()
    assert ok.text.tolist() == ["ok"]


def test_schema_must_not_carry_corrupt_column(spark, tmp_path):
    from pyspark.sql.types import StringType, StructField, StructType

    s = StructType(list(DOCS_JSONL_SCHEMA.fields)
                   + [StructField("_corrupt_record", StringType())])
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl(spark, str(tmp_path), schema=s)


def test_writer_shard_count(spark, corpus_dir, tmp_path):
    docs, _ = corpus_dir
    p = str(tmp_path / "out")
    write_jsonl(docs, p, n_shards=5)
    parts = [f for f in os.listdir(p) if f.startswith("part-")]
    assert len(parts) == 5
    n = sum(1 for f in parts for _ in open(os.path.join(p, f)))
    assert n == docs.count()
    # every written line is valid JSON with the expected keys
    with open(os.path.join(p, parts[0])) as fh:
        row = json.loads(next(iter(fh)))
    assert set(row) <= {"doc_id", "text", "lang", "source", "n_chars"}
