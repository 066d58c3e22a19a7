"""Bucketed co-located join: same result as the plain join, with NO
shuffle exchange in the physical plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from mvrs_dspa_spark.operators.bucketing import bucketed_join, write_bucketed
from mvrs_dspa_spark.tables import table


def _explain(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def test_bucketed_join_is_shuffle_free_and_correct(spark, sf_small, tmp_path):
    orders = table(spark, sf_small, "orders").withColumnRenamed(
        "o_orderkey", "orderkey"
    )
    li = table(spark, sf_small, "lineitem").withColumnRenamed(
        "l_orderkey", "orderkey"
    )
    write_bucketed(orders, "b_orders", "orderkey", 8, path=str(tmp_path / "bo"))
    write_bucketed(li, "b_lineitem", "orderkey", 8, path=str(tmp_path / "bl"))
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "orderkey").select(
            "orderkey", "o_totalprice", "l_quantity"
        )
        plan = _explain(joined)
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed join must not reshuffle:\n" + plan
        )

        plain = orders.join(li, "orderkey").select(
            "orderkey", "o_totalprice", "l_quantity"
        )
        a = joined.groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("s")
        ).first()
        b = plain.groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("s")
        ).first()
        assert (a.n, a.s) == (b.n, b.s)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
