"""Count-min sketch heavy hitters (SURVEY §2f #75).

The frequency-sketch companion of the existing approx family
(`approx_count_distinct` #9, `approx_percentile` 10w-a): estimate
per-token frequencies from a fixed D x W counter grid instead of a
vocabulary-sized exact aggregation (Cormode & Muthukrishnan 2005).

Why this matters at 100 TB: the exact token-frequency aggregate
shuffles one key per vocabulary entry; the sketch shuffles at most
D*W = {4 x 512} keys REGARDLESS of corpus or vocabulary size — the
map-side combine collapses every partition to a bounded grid, so the
reduce stage is constant-state. That is the production shape when the
vocabulary itself is too large to aggregate exactly (web-scale
n-grams, URLs, user agents).

Cross-engine determinism: bucket hashes are the explicit affine family
from `functions/hashing.py` ((a*x+b) mod P over md5-prefix codes), so
Spark and DuckDB build bit-identical sketches and the query carries a
full oracle gate — rare for a sketch, possible here because CMS is a
deterministic function of the multiset. The report joins the estimate
back to the exact count (the CMS overestimate invariant est >= exact
is also pinned in tests/test_cms.py), mirroring how the other sketch
rows publish their exact twins.

No reference analog (the reference has no sketches); included as a
first-class LLM-pipeline/scale extension alongside HLL and KLL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mvrs_dspa_spark.functions import hashing as H
from mvrs_dspa_spark.functions import text as T
from mvrs_dspa_spark.plans.registry import register
from mvrs_dspa_spark.tables import table

CMS_D = 4  # hash rows
CMS_W = 512  # buckets per row
CMS_TOPK = 30
# distinct seed from the minhash (42) / LSH families so rows are
# independent of every other hash use in the repo
CMS_PARAMS = H.hash_params(CMS_D, seed=101)


def _bucket_cols(code: F.Column) -> list[F.Column]:
    return [
        (H.affine_col(code, a, b) % F.lit(CMS_W)).cast("int")
        for a, b in CMS_PARAMS
    ]


def _bucket_sql(code: str, j: int) -> str:
    a, b = CMS_PARAMS[j]
    return f"({H.affine_sql(code, a, b)} % {CMS_W})"


def cms_sketch(toks: DataFrame, col: str = "t") -> DataFrame:
    """(j, bucket, c) counter grid — at most D*W rows, any input size.

    The posexplode is map-side (xD narrow fan-out) and immediately
    collapsed by the partial aggregate into the D*W grid, so the one
    shuffle moves <= D*W rows per map partition.
    """
    code = H.str_code_col(F.col(col))
    return (
        toks.select(
            F.posexplode(F.array(*_bucket_cols(code))).alias("j", "bucket")
        )
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


_TOKS_SQL = f"SELECT unnest({T.tokens_sql('text')}) AS t FROM documents"
_CODE_SQL = H.str_code_sql("t")

_CELLS_SQL = "\nUNION ALL\n".join(
    f"SELECT {j} AS j, {_bucket_sql(_CODE_SQL, j)} AS bucket, COUNT(*) AS c"
    f" FROM toks GROUP BY 2"
    for j in range(CMS_D)
)
_PROBES_SQL = "\nUNION ALL\n".join(
    f"SELECT t, exact_count, {j} AS j,"
    f" {_bucket_sql(_CODE_SQL, j)} AS bucket FROM vocab"
    for j in range(CMS_D)
)


@register(
    "cms_heavy_hitters",
    oracle=f"""
        WITH toks AS ({_TOKS_SQL}),
        cells AS ({_CELLS_SQL}),
        vocab AS (SELECT t, COUNT(*) AS exact_count FROM toks GROUP BY t),
        probes AS ({_PROBES_SQL})
        SELECT p.t AS token,
               CAST(p.exact_count AS BIGINT) AS exact_count,
               CAST(MIN(c.c) AS BIGINT) AS est_count
        FROM probes p JOIN cells c ON p.j = c.j AND p.bucket = c.bucket
        GROUP BY p.t, p.exact_count
        ORDER BY est_count DESC, token
        LIMIT {CMS_TOPK}
    """,
    doc="Count-min-sketch heavy hitters over document tokens: "
    f"{CMS_D}x{CMS_W} deterministic affine counter grid, estimate = "
    "min over rows, top-30 tokens by estimate with the exact count "
    "published alongside. The sketch shuffle is bounded by the grid "
    "size (not the vocabulary), the overestimate invariant is "
    "pytest-pinned, and the affine hashes make the whole construction "
    "engine-portable (full oracle gate).",
    tags=("llm", "sketch"),
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = d.select(F.explode(T.tokens_col(F.col("text"))).alias("t"))
    cells = cms_sketch(toks)

    # candidate set for the report: the (vocabulary-bounded) distinct
    # tokens with exact counts — the published comparison twin. In the
    # vocabulary-too-big regime the candidate set would instead be an
    # external dictionary probed against the same broadcast grid.
    vocab = toks.groupBy("t").agg(F.count(F.lit(1)).alias("exact_count"))
    code = H.str_code_col(F.col("t"))
    probes = vocab.select(
        "t",
        "exact_count",
        F.posexplode(F.array(*_bucket_cols(code))).alias("j", "bucket"),
    )
    # the grid is structurally bounded (<= D*W rows) -> safe broadcast
    est = (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("t", "exact_count")
        .agg(F.min("c").alias("est_count"))
    )
    return (
        est.select(
            F.col("t").alias("token"),
            F.col("exact_count"),
            F.col("est_count"),
        )
        .orderBy(F.desc("est_count"), "token")
        .limit(CMS_TOPK)
    )
