"""Bucketed co-located joins eliminate exchanges (sources/bucketing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from shacl_validator_spark.sources.bucketing import write_bucketed


def test_bucketed_join_and_agg_have_no_exchange(spark, tmp_path):
    docs = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("f")
    )
    scores = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2).alias("score")
    )
    write_bucketed(docs, "b_docs", 8, ["doc_id"], sort_cols=["doc_id"],
                   path=str(tmp_path / "b_docs"))
    write_bucketed(scores, "b_scores", 8, ["doc_id"], sort_cols=["doc_id"],
                   path=str(tmp_path / "b_scores"))
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("b_docs").join(spark.table("b_scores"), "doc_id")
            assert joined.count() == 10_000
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # both sides read bucketed: no shuffle anywhere in the join
            assert "Exchange" not in plan, plan
            # group-by on the bucket key also rides the on-disk distribution
            agg = spark.table("b_docs").groupBy("doc_id").agg(F.sum("f"))
            agg.count()
            aplan = agg._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in aplan, aplan
            # contrast: the same join on NON-bucketed data needs exchanges
            nplan = (
                docs.join(scores, "doc_id")._jdf.queryExecution().executedPlan().toString()
            )
            assert "Exchange" in nplan
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_scores")
