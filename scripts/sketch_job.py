"""Flagship job for spark-submit: two-level sketch build over a tokenized
documents table; prints per-group estimates and per-partition metrics.

Usage: spark-submit --py-files grenier_spark.zip scripts/sketch_job.py \
           [docs_parquet_path]
"""

import sys

from pyspark.sql import SparkSession

from grenier_spark.functions import hll_card_col
from grenier_spark.operators.sketch_build import SketchSpec, build_sketches


def main() -> None:
    spark = SparkSession.builder.appName("grenier-sketch-job").getOrCreate()
    path = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.fixtures/docs_tiny_1000"
    docs = spark.read.parquet(path)
    if "tokens" not in docs.columns:
        # raw text table: tokenize on the fly (md5-low64 word ids, the
        # library's cross-engine token hash — __spark_entry__._tokenized_docs)
        from grenier_spark.functions.hashing import md5_tokens_col

        docs = docs.withColumn("tokens", md5_tokens_col("text"))
    specs = [SketchSpec.of("tok_hll", "hll", "tokens", p=14),
             SketchSpec.of("tok_cms", "cms", "tokens", depth=4, width=8192, seed=7)]
    res = build_sketches(docs, specs, group_cols=["source"]).cache()
    (res.where("sketch_name = 'tok_hll'")
        .select("source", hll_card_col("sketch").alias("est_distinct_tokens"),
                "n_rows", "n_values", "build_us")
        .orderBy("source").show(50, truncate=False))
    spark.stop()


if __name__ == "__main__":
    main()
