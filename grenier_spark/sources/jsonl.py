"""JSONL corpus ingest: schema-pinned reads with corrupt-row quarantine.

Raw web corpora arrive as sharded JSON-lines (Common Crawl derivatives,
dataset dumps) with a small but inevitable fraction of truncated or
mangled lines. Two disciplines matter at 100 TB:

* **Always pass the schema.** ``spark.read.json`` without one runs a full
  inference scan — an entire extra pass over the corpus before the real
  job starts. The schema here is pinned (documents-table shape by
  default) and the read is a single pass.
* **Quarantine, never drop silently.** PERMISSIVE mode routes every
  unparseable line into a corrupt-record column; :func:`read_jsonl`
  splits the frame into (clean, quarantined) so the pipeline can count,
  sample and audit the rejects instead of silently losing them
  (DROPMALFORMED) or failing the whole job on one bad shard (FAILFAST).

Both outputs are plain lazy DataFrames off the same scan — no extra pass
for the quarantine (Catalyst pushes each filter into its consumer).
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (LongType, StringType, StructField,
                               StructType)

__all__ = ["DOCS_JSONL_SCHEMA", "read_jsonl", "write_jsonl"]

DOCS_JSONL_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("n_chars", LongType()),
])

_CORRUPT = "_corrupt_record"


def read_jsonl(spark: SparkSession, path: str,
               schema: Optional[StructType] = None
               ) -> Tuple[DataFrame, DataFrame]:
    """Read JSONL shards under ``path`` with ``schema`` (default: the
    documents-table shape). Returns ``(clean, quarantined)``: clean rows
    with exactly the schema's columns; quarantined rows carrying the raw
    offending line in ``raw_line`` plus its source file.

    A line is quarantined if it fails to parse OR parses to something
    other than a JSON object (PERMISSIVE semantics); fields missing from
    a valid object are NULL in clean — enforce presence downstream with
    operators/profile.py checks (e.g. ``completeness('text')``)."""
    schema = schema or DOCS_JSONL_SCHEMA
    if _CORRUPT in schema.fieldNames():
        raise ValueError(f"schema must not already contain {_CORRUPT}")
    # text + from_json rather than spark.read.json: the json file source
    # forbids queries whose required schema is ONLY the corrupt-record
    # column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and
    # the documented workaround — cache the parsed frame — is exactly
    # what a 100 TB ingest must not do. Same Jackson parser, same single
    # pass, no restriction; blank lines are skipped like the json source
    # does. (JSONL contract: one object per line — no multiLine.)
    full = StructType(list(schema.fields)
                      + [StructField(_CORRUPT, StringType())])
    parsed = (spark.read.text(path)
              .where(F.trim(F.col("value")) != "")
              .select(F.col("value").alias("raw_line"),
                      F.input_file_name().alias("src_file"),
                      F.from_json(
                          "value", full,
                          {"mode": "PERMISSIVE",
                           "columnNameOfCorruptRecord": _CORRUPT})
                      .alias("__p")))
    bad = (F.col("__p").isNull()
           | F.col(f"__p.{_CORRUPT}").isNotNull())
    clean = parsed.where(~bad).select(
        *[F.col(f"__p.`{f.name}`").alias(f.name) for f in schema.fields])
    quarantined = parsed.where(bad).select("raw_line", "src_file")
    return clean, quarantined


def write_jsonl(df: DataFrame, path: str, n_shards: int = 1) -> None:
    """Write ``df`` as ``n_shards`` JSONL shards (one pass; shard count =
    output parallelism, pick ~128-512 MB per shard at scale)."""
    df.repartition(n_shards).write.mode("overwrite").json(path)
