"""Independent recomputation of the verdict-column oracles (ADVICE r2):
embedding_ivf_knn and approx_distinct_users compute their pass/fail
verdicts in-engine, so a bug in the engine-side recall/error arithmetic
itself (wrong denominator, inverted comparison) would still hash-match
the pinned TRUE. These tests rebuild the same verdicts OUTSIDE the
query functions — exact kNN via numpy on the driver, distinct counts
via plain Python sets — and assert they agree with what the catalog
rows claim.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from travelpulse_spark_stream_tourism_analytics_spark.operators import similarity
from travelpulse_spark_stream_tourism_analytics_spark.plans.catalog import (
    load_table,
)
from travelpulse_spark_stream_tourism_analytics_spark.plans.text_queries import (
    embedding_ivf_knn,
)
from travelpulse_spark_stream_tourism_analytics_spark.plans.window_queries import (
    approx_distinct_users,
)


def _numpy_exact_top5(vectors: dict[int, np.ndarray], query_ids: list[int]):
    """Driver-side brute-force cosine top-5 — shares NO code with
    operators/similarity.py (no rounded-cosine shortcut is needed for
    recall counting: ties beyond 1e-6 don't occur in the fixtures)."""
    ids = sorted(vectors)
    out = {}
    for q in query_ids:
        qv = vectors[q]
        qn = np.linalg.norm(qv)
        scored = []
        for i in ids:
            if i == q:
                continue
            cos = float(np.dot(qv, vectors[i]) / (qn * np.linalg.norm(vectors[i])))
            scored.append((round(cos, 6), -i))  # same tiebreak: cosine desc, id asc
        scored.sort(reverse=True)
        out[q] = {-neg_id for _, neg_id in scored[:5]}
    return out


def test_ivf_recall_verdict_recomputed_independently(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", similarity.as_double_vec(F.col("embedding")).alias("v")
    )
    vectors = {r["vec_id"]: np.array(r["v"]) for r in emb.collect()}
    query_ids = [i for i in sorted(vectors) if i < 5]
    exact = _numpy_exact_top5(vectors, query_ids)

    # The engine's IVF lists, produced by the same path the catalog
    # query uses (seeded KMeans -> n_probe cells -> in-cell top-5).
    n_cells = max(4, min(16, len(vectors) // 64))
    corpus, model = similarity.ivf_index(emb, "vec_id", "v", n_cells=n_cells)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    ivf_rows = similarity.ivf_knn(
        corpus, model, queries, "vec_id", "query_id", "v",
        k=5, n_probe=max(2, n_cells // 2),
    ).collect()
    ivf_lists: dict[int, set[int]] = {}
    for r in ivf_rows:
        ivf_lists.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    n_hits = sum(len(ivf_lists.get(q, set()) & exact[q]) for q in query_ids)
    mean_recall = n_hits / (5.0 * len(query_ids))

    # Independent arithmetic agrees with the catalog row's verdict and
    # clears the pinned floor with the documented margin.
    row = embedding_ivf_knn(spark, SF_SMOKE).collect()[0]
    assert row["n_queries"] == len(query_ids)
    assert row["recall_ok"] == (mean_recall >= row["mean_recall_floor"])
    assert mean_recall >= 0.6, mean_recall


def test_hll_error_verdict_recomputed_independently(spark):
    ev = load_table(spark, SF_SMOKE, "events").select("event_type", "user_id")
    # Exact distinct via plain Python sets — no Spark aggregation.
    seen: dict[str, set] = {}
    for r in ev.collect():
        seen.setdefault(r["event_type"], set()).add(r["user_id"])
    exact = {k: len(v) for k, v in seen.items()}

    approx = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id").alias("n"))
        .collect()
    }

    rows = {r["event_type"]: r for r in approx_distinct_users(spark, SF_SMOKE).collect()}
    assert set(rows) == set(exact)
    for etype, n_exact in exact.items():
        rel_err = abs(approx[etype] - n_exact) / n_exact
        assert rows[etype]["exact_users"] == n_exact
        assert rows[etype]["approx_ok"] == (rel_err <= 0.15), (etype, rel_err)
        assert rel_err <= 0.15, (etype, rel_err)
