"""GDPR erasure-audit pins (#124): cascade containment, and the
audit==delete contract — applying the deletion the audit describes and
re-auditing must find nothing left to erase."""

from __future__ import annotations

from pyspark.sql import functions as F

from mvrs_dspa_spark.operators.validation import (
    _erase_cohort_col,
    gdpr_erasure_audit,
)
from mvrs_dspa_spark.tables import table

SF = "/root/testdata/sf0.001"


def test_gdpr_audit_cascade_containment(spark):
    out = {r.table_name: r for r in gdpr_erasure_audit(spark, SF).collect()}
    assert set(out) == {"customer", "orders", "lineitem", "events"}
    assert out["customer"].rows_to_erase == out["customer"].keys_affected
    # every order to erase belongs to a customer in the cohort
    assert out["orders"].keys_affected <= out["customer"].rows_to_erase
    # every lineitem to erase belongs to an order to erase
    assert out["lineitem"].keys_affected <= out["orders"].rows_to_erase
    assert out["customer"].rows_to_erase > 0, "cohort must be non-empty"


def test_gdpr_audit_after_delete_is_clean(spark, tmp_path):
    cust = table(spark, SF, "customer")
    orders = table(spark, SF, "orders")
    li = table(spark, SF, "lineitem")
    ev = table(spark, SF, "events")

    keep_cust = cust.where(~_erase_cohort_col(F.col("c_custkey")))
    keep_orders = orders.join(
        keep_cust.select("c_custkey"),
        orders["o_custkey"] == F.col("c_custkey"),
        "left_semi",
    )
    keep_li = li.join(
        keep_orders.select("o_orderkey"),
        li["l_orderkey"] == F.col("o_orderkey"),
        "left_semi",
    )
    keep_ev = ev.where(~_erase_cohort_col(F.col("user_id")))
    for name, df in (
        ("customer", keep_cust),
        ("orders", keep_orders),
        ("lineitem", keep_li),
        ("events", keep_ev),
    ):
        df.write.mode("overwrite").parquet(f"{tmp_path}/{name}.parquet")

    out = gdpr_erasure_audit(spark, str(tmp_path)).collect()
    assert all(r.rows_to_erase == 0 and r.keys_affected == 0 for r in out)
