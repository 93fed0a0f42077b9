"""Persistent IVF-PQ ANN index (operators/ann_index.py)."""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.operators.ann_index import (
    ann_search,
    build_ann_index,
    load_ann_meta,
)


def test_ann_index_build_search_recall_and_partition_pruning(spark, tmp_path):
    """Persisted IVF-PQ index: deterministic rebuild, partition-pruned
    probe scans, and recall@10 >= 0.8 vs exact L2 at the DOCUMENTED
    operating point — n_probe = half the cells, rerank = 10x k (round
    6, VERDICT r5 item 5: the r5 floor of 0.6 at rerank=5x k was
    ADC-shortlist-starved, not probe-limited; the soak records the
    full recall-vs-n_probe curve)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ann_idx")
    meta = build_ann_index(emb, idx, n_cells=8, m=8, k_codes=16)
    assert meta["n_vectors"] == 500 and meta["dim"] == 64
    assert load_ann_meta(idx) == meta

    queries = (
        emb.orderBy("vec_id")
        .limit(5)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
    )
    got = ann_search(spark, idx, queries, k=10, n_probe=4, rerank=100)

    # probed-cell restriction is a partition filter on the codes scan
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters:" in plan and "cell" in plan.split(
        "PartitionFilters:"
    )[1][:160]

    res = got.collect()
    by_q: dict[int, list[int]] = {}
    for r in res:
        by_q.setdefault(r["qid"], []).append(r["neighbor_id"])
    assert set(by_q) == {r["qid"] for r in queries.collect()}
    assert all(len(v) == 10 for v in by_q.values())

    # exact L2 ground truth over the (tiny) fixture corpus
    all_rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in all_rows])
    mat = np.array([r["embedding"] for r in all_rows], dtype=float)
    recalls = []
    for q in queries.collect():
        qv = np.array(q["qv"])
        d = ((mat - qv[None, :]) ** 2).sum(axis=1)
        mask = ids != q["qid"]
        order = np.lexsort((ids[mask], d[mask]))
        exact10 = set(ids[mask][order][:10].tolist())
        recalls.append(len(set(by_q[q["qid"]]) & exact10) / 10)
    assert sum(recalls) / len(recalls) >= 0.8, recalls

    # rebuild determinism: identical results from a fresh index dir
    idx2 = str(tmp_path / "ann_idx2")
    build_ann_index(emb, idx2, n_cells=8, m=8, k_codes=16)
    got2 = {
        (r["qid"], r["neighbor_id"], r["adc_dist"])
        for r in ann_search(
            spark, idx2, queries, k=10, n_probe=4, rerank=100
        ).collect()
    }
    assert got2 == {(r["qid"], r["neighbor_id"], r["adc_dist"]) for r in res}


def test_ann_auto_m_targets_4dim_subspaces_and_tightens_adc(spark, tmp_path):
    """Round 8 (VERDICT r7 item 3 — the sf1 full-probe recall
    plateau): m=None auto-sizes to ~4 dims per subspace (m=16 at dim
    64), which cuts per-subspace PQ quantization error ~3x vs the old
    m=8 (measured 0.307 -> 0.093 mse at the 20k-vector sf1 corpus —
    k-means init/iteration tuning moved nothing, the noise is
    intrinsic to 8-dim subspaces) so true neighbors stop sinking below
    the ADC shortlist. Pins: the auto choice, and that the auto index
    reaches FULL recall at full probe with a modest 10x-k rerank on
    the fixture corpus, where the old m=8 operating point needed the
    probe-limited 0.8 floor."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "auto_m_idx")
    meta = build_ann_index(emb, idx, n_cells=8)  # m auto, k_codes=256->500 ok
    assert meta["m"] == 16 and meta["sub_dim"] == 4

    queries = (
        emb.orderBy("vec_id")
        .limit(5)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
    )
    res = ann_search(spark, idx, queries, k=10, n_probe=8, rerank=100)
    by_q: dict[int, list[int]] = {}
    for r in res.collect():
        by_q.setdefault(r["qid"], []).append(r["neighbor_id"])

    all_rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in all_rows])
    mat = np.array([r["embedding"] for r in all_rows], dtype=float)
    recalls = []
    for q in queries.collect():
        qv = np.array(q["qv"])
        d = ((mat - qv[None, :]) ** 2).sum(axis=1)
        mask = ids != q["qid"]
        order = np.lexsort((ids[mask], d[mask]))
        exact10 = set(ids[mask][order][:10].tolist())
        recalls.append(len(set(by_q[q["qid"]]) & exact10) / 10)
    assert sum(recalls) / len(recalls) == 1.0, recalls


def test_ann_build_clamps_oversized_k_codes(spark, tmp_path):
    """ADVICE r6: the k_codes=256 production default on a corpus with
    fewer than 256 vectors must clamp (with a warning), not train a
    degenerate codebook or fail inside the k-means fit."""
    import warnings as _warnings

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(F.col("vec_id") < 40)
    )
    idx = str(tmp_path / "tiny_idx")
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        meta = build_ann_index(emb, idx, n_cells=8, m=8)  # k_codes=256 default
    assert meta["k_codes"] == 40 and meta["n_vectors"] == 40
    assert any("clamping" in str(w.message) for w in caught)
    # the clamped index still searches
    queries = emb.limit(2).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    res = ann_search(spark, idx, queries, k=5, n_probe=8).collect()
    assert {r["qid"] for r in res} == {r["qid"] for r in queries.collect()}

    # an explicit cell count above N clamps too
    with _warnings.catch_warnings(record=True) as caught2:
        _warnings.simplefilter("always")
        meta2 = build_ann_index(
            emb, str(tmp_path / "tiny2"), n_cells=64, m=8, k_codes=16
        )
    assert meta2["n_cells"] == 40
    assert any("n_cells" in str(w.message) for w in caught2)


def test_ann_search_probe_width_trades_recall(spark, tmp_path):
    """n_probe widens the candidate set monotonically: every neighbor
    found at n_probe=1 whose cell is probed again stays; full-width
    probing (n_probe=n_cells) scans every cell."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ann_idx")
    build_ann_index(emb, idx, n_cells=8, m=8, k_codes=16)
    queries = (
        emb.orderBy(F.desc("vec_id"))
        .limit(3)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").cast("array<double>").alias("qv"),
        )
    )
    narrow = ann_search(spark, idx, queries, k=50, n_probe=1).collect()
    wide = ann_search(spark, idx, queries, k=50, n_probe=8).collect()
    n_by_q: dict[int, set] = {}
    for r in narrow:
        n_by_q.setdefault(r["qid"], set()).add((r["neighbor_id"], r["adc_dist"]))
    w_by_q: dict[int, set] = {}
    for r in wide:
        w_by_q.setdefault(r["qid"], set()).add((r["neighbor_id"], r["adc_dist"]))
    for q, narrow_set in n_by_q.items():
        # wide search ranks over a superset; its top-50 can only
        # replace narrow results with strictly closer ones
        worst_wide = max(d for _, d in w_by_q[q])
        for nid, dist in narrow_set - w_by_q[q]:
            assert dist >= worst_wide


def test_ann_cli_build_and_search(spark, tmp_path, capsys, monkeypatch):
    """Production path: --mode build-ann-index then --mode ann-search."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import run_pipeline

    idx = str(tmp_path / "idx")
    qpath = str(tmp_path / "queries")
    out = str(tmp_path / "res")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb.limit(3).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qv"),
    ).write.parquet(qpath)

    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "build-ann-index",
         "--path", "/root/testdata/sf0.001", "--out", idx,
         "--cells", "8", "--pq-m", "8", "--pq-codes", "16"],
    )
    run_pipeline.main()
    assert ">>> ann index built; 500 vectors, 8 cells" in capsys.readouterr().out

    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "ann-search", "--path", qpath,
         "--index", idx, "--out", out, "--k", "5", "--n-probe", "4",
         "--rerank", "25"],
    )
    run_pipeline.main()
    assert ">>> ann search done; 15 (query, neighbor) rows" in capsys.readouterr().out
    res = spark.read.parquet(out)
    assert res.count() == 15
    assert set(res.columns) == {"qid", "neighbor_id", "adc_dist"}


def test_knn_graph_cli_uses_index_centroids(spark, tmp_path, capsys, monkeypatch):
    """Production path: --mode knn-graph composes the persisted ann
    index's IVF centroids (the already-fitted quantizer) with
    similarity.ivf_knn_graph — every corpus vector gets k edges, all
    ids covered, no query table needed."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import run_pipeline

    idx = str(tmp_path / "idx_g")
    out = str(tmp_path / "graph")
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "build-ann-index",
         "--path", "/root/testdata/sf0.001", "--out", idx,
         "--cells", "8", "--pq-m", "8", "--pq-codes", "16"],
    )
    run_pipeline.main()
    capsys.readouterr()

    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "knn-graph",
         "--path", "/root/testdata/sf0.001", "--index", idx,
         "--out", out, "--k", "5", "--n-probe", "8"],
    )
    run_pipeline.main()
    assert ">>> knn graph built; " in capsys.readouterr().out
    g = spark.read.parquet(out)
    assert set(g.columns) == {"vec_id", "neighbor_id", "cosine"}
    per_id = {
        r["vec_id"]: r["n"]
        for r in g.groupBy("vec_id").agg(F.count("*").alias("n")).collect()
    }
    assert len(per_id) == 500  # every vector has neighbors at full probe
    assert all(n == 5 for n in per_id.values())


def test_ann_incremental_add_equals_frozen_model_bulk(spark, tmp_path):
    """add_to_ann_index encodes under the FROZEN model: building on the
    first half then adding the second half yields exactly the search
    results of an index whose codes cover everything (model fixed),
    and the new vectors become findable."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.ann_index import (
        add_to_ann_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    first = emb.filter(F.col("vec_id") < 250)
    second = emb.filter(F.col("vec_id") >= 250)

    idx = str(tmp_path / "idx_inc")
    build_ann_index(first, idx, n_cells=8, m=8, k_codes=16)
    assert load_ann_meta(idx)["n_vectors"] == 250
    meta = add_to_ann_index(spark, idx, second)
    assert meta["n_vectors"] == 500
    assert load_ann_meta(idx)["n_vectors"] == 500

    # a query that IS one of the added vectors must find itself absent
    # (self-filtered) but its exact duplicate region: search must now
    # return added ids at all
    queries = second.limit(3).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    res = ann_search(spark, idx, queries, k=10, n_probe=8, rerank=50).collect()
    assert {r["qid"] for r in res} == {r["qid"] for r in queries.collect()}
    assert any(r["neighbor_id"] >= 250 for r in res)  # added ids findable

    # equivalence: an index with the same frozen model but codes built
    # in ONE pass — copy model artifacts, re-encode everything via add
    idx2 = str(tmp_path / "idx_bulk")
    build_ann_index(first, idx2, n_cells=8, m=8, k_codes=16)
    # wipe codes, re-add the FULL corpus under the frozen model
    import shutil

    shutil.rmtree(f"{idx2}/codes.parquet")
    m2 = load_ann_meta(idx2)
    m2["n_vectors"] = 0
    import json as _json

    with open(f"{idx2}/meta.json", "w") as fh:
        _json.dump(m2, fh)
    add_to_ann_index(spark, idx2, emb)
    a = {
        (r["qid"], r["neighbor_id"], r["adc_dist"])
        for r in ann_search(spark, idx, queries, k=10, n_probe=8,
                            rerank=50).collect()
    }
    b = {
        (r["qid"], r["neighbor_id"], r["adc_dist"])
        for r in ann_search(spark, idx2, queries, k=10, n_probe=8,
                            rerank=50).collect()
    }
    assert a == b


def test_knn_graph_cli_clamps_n_probe_to_cell_count(
    spark, tmp_path, capsys, monkeypatch
):
    """ADVICE r8: a small index that works with ann-search (which
    clamps probes implicitly) must not hard-fail in knn-graph mode
    when --n-probe exceeds the cell count — the CLI clamps to the
    quantizer width and reports the clamped value."""
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import run_pipeline

    idx = str(tmp_path / "idx_c")
    out = str(tmp_path / "graph_c")
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "build-ann-index",
         "--path", "/root/testdata/sf0.001", "--out", idx,
         "--cells", "4", "--pq-m", "8", "--pq-codes", "16"],
    )
    run_pipeline.main()
    capsys.readouterr()

    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "knn-graph",
         "--path", "/root/testdata/sf0.001", "--index", idx,
         "--out", out, "--k", "3", "--n-probe", "16"],
    )
    run_pipeline.main()
    got = capsys.readouterr().out
    assert ">>> knn graph built; " in got
    assert "n_probe=4" in got  # clamped from 16 to the 4-cell quantizer
    g = spark.read.parquet(out)
    assert g.groupBy("vec_id").count().count() == 500


def test_build_ann_index_empty_corpus_raises_without_cache_leak(
    spark, tmp_path
):
    """ADVICE r8: the build persists its projected embeddings before
    counting — an empty-corpus raise (or any mid-fit failure) must
    unpersist on the way out, not leak a session-wide cached
    DataFrame."""
    import pytest as _pytest

    from travelpulse_spark_stream_tourism_analytics_spark.operators.ann_index import (
        build_ann_index,
    )

    spark.catalog.clearCache()  # session-wide assertion needs a clean slate
    empty = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .filter(F.col("vec_id") < 0)
    )
    with _pytest.raises(ValueError, match="empty training set"):
        build_ann_index(empty, str(tmp_path / "idx_e"))
    assert len(spark.sparkContext._jsc.sc().getRDDStorageInfo()) == 0


def test_knn_graph_cli_assignment_broadcast(
    spark, tmp_path, capsys, monkeypatch
):
    """--assignment broadcast forces the pandas-UDF cell assignment
    through the CLI even on a small quantizer, and the graph matches
    the default (plan) path's edges exactly."""
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import run_pipeline

    idx = str(tmp_path / "idx_b")
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "build-ann-index",
         "--path", "/root/testdata/sf0.001", "--out", idx,
         "--cells", "8", "--pq-m", "8", "--pq-codes", "16"],
    )
    run_pipeline.main()
    capsys.readouterr()

    outs = {}
    for mode in ("plan", "broadcast"):
        out = str(tmp_path / f"graph_{mode}")
        monkeypatch.setattr(
            sys, "argv",
            ["run_pipeline.py", "--mode", "knn-graph",
             "--path", "/root/testdata/sf0.001", "--index", idx,
             "--out", out, "--k", "3", "--n-probe", "2",
             "--assignment", mode],
        )
        run_pipeline.main()
        assert f"assignment={mode}" in capsys.readouterr().out
        outs[mode] = {
            tuple(r) for r in spark.read.parquet(out).collect()
        }
    assert outs["plan"] == outs["broadcast"] and len(outs["plan"]) > 0


def test_knn_graph_cli_assignment_two_level(
    spark, tmp_path, capsys, monkeypatch
):
    """--assignment two-level routes the CLI through
    two_level_knn_graph (coarse-then-fine; the quantizer never
    collects as a flat matrix); with every coarse cell probed
    (--n-coarse-probe clamps to the coarse count) the graph equals
    the flat plan-constant path's edges exactly."""
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import run_pipeline

    idx = str(tmp_path / "idx_tl")
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "build-ann-index",
         "--path", "/root/testdata/sf0.001", "--out", idx,
         "--cells", "8", "--pq-m", "8", "--pq-codes", "16"],
    )
    run_pipeline.main()
    capsys.readouterr()

    outs = {}
    for mode, extra in (
        ("plan", []),
        ("two-level", ["--n-coarse-probe", "4096"]),
    ):
        out = str(tmp_path / f"graph_tl_{mode}")
        monkeypatch.setattr(
            sys, "argv",
            ["run_pipeline.py", "--mode", "knn-graph",
             "--path", "/root/testdata/sf0.001", "--index", idx,
             "--out", out, "--k", "3", "--n-probe", "2",
             "--assignment", mode, *extra],
        )
        run_pipeline.main()
        assert f"assignment={mode}" in capsys.readouterr().out
        outs[mode] = {
            tuple(r) for r in spark.read.parquet(out).collect()
        }
    assert outs["plan"] == outs["two-level"] and len(outs["plan"]) > 0


def test_decontam_cli_flags_planted_eval_copies(
    spark, tmp_path, capsys, monkeypatch
):
    """--mode decontam flags exactly the training vectors whose max
    cosine against the eval suite reaches --min-cosine; planted exact
    copies of eval vectors are the guaranteed flag set at 0.99."""
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import run_pipeline

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    eval_dir = str(tmp_path / "eval")
    train_dir = str(tmp_path / "train")
    out = str(tmp_path / "flagged")
    eval_df = emb.filter(F.col("vec_id") < 20)
    eval_df.write.parquet(eval_dir)
    emb.filter(F.col("vec_id") >= 20).select("vec_id", "embedding").unionByName(
        eval_df.filter(F.col("vec_id") < 5).select(
            (F.col("vec_id") + 2000000).alias("vec_id"), "embedding"
        )
    ).write.parquet(train_dir)

    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "decontam", "--path", train_dir,
         "--eval", eval_dir, "--out", out, "--min-cosine", "0.99"],
    )
    run_pipeline.main()
    assert ">>> decontam done; 5 training vectors flagged" in (
        capsys.readouterr().out
    )
    rows = {
        r["vec_id"]: (r["matched_eval_id"], r["cosine"])
        for r in spark.read.parquet(out).collect()
    }
    assert rows == {s + 2000000: (s, 1.0) for s in range(5)}


def test_ann_add_packed_argmin_matches_window_assignment(spark, tmp_path):
    """add_to_ann_index's packed-broadcast-row argmin (zero-shuffle
    cell assignment) must reproduce the crossJoin+window formulation
    EXACTLY — same d2 fold per (vector, center) pair, same
    (d2 ASC, cell ASC) tiebreak via struct ordering."""
    from pyspark.sql.window import Window

    from travelpulse_spark_stream_tourism_analytics_spark.operators.ann_index import (
        add_to_ann_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "idx_pk")
    build_ann_index(
        emb.filter(F.col("vec_id") < 100), idx, n_cells=8, m=8, k_codes=16
    )
    newbie = emb.filter(F.col("vec_id") >= 100)
    add_to_ann_index(spark, idx, newbie)

    codes = spark.read.parquet(f"{idx}/codes.parquet")
    got = {
        r["vec_id"]: r["cell"]
        for r in codes.filter(F.col("vec_id") >= 100).collect()
    }

    # reference: the old crossJoin + per-id window formulation over
    # the same frozen centers
    centers = spark.read.parquet(f"{idx}/centroids.parquet").select(
        "cell", F.col("center")
    )
    v = newbie.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("__v")
    )
    dist2 = F.aggregate(
        F.zip_with(
            F.col("__v"), F.col("center"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("__d2"), F.asc("cell"))
    want = {
        r["vec_id"]: r["cell"]
        for r in v.crossJoin(F.broadcast(centers))
        .select("vec_id", "cell", dist2.alias("__d2"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .collect()
    }
    assert got == want and len(got) == 400


def test_knn_graph_cli_update_equals_rebuild(
    spark, tmp_path, capsys, monkeypatch
):
    """--update-graph folds a new embedding batch into an existing
    edge parquet; with the same quantizer/k/n-probe the result equals
    the whole-corpus rebuild exactly, and --out == --update-graph is
    refused (Spark cannot overwrite a parquet dir it reads)."""
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import pytest as _pytest

    import run_pipeline

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    old_dir = str(tmp_path / "old_emb")
    new_dir = str(tmp_path / "new_emb")
    emb.filter(F.col("vec_id") < 300).write.parquet(old_dir)
    emb.filter(F.col("vec_id") >= 300).write.parquet(new_dir)

    idx = str(tmp_path / "idx_u")
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "build-ann-index",
         "--path", "/root/testdata/sf0.001", "--out", idx,
         "--cells", "8", "--pq-m", "8", "--pq-codes", "16"],
    )
    run_pipeline.main()
    capsys.readouterr()

    g_old = str(tmp_path / "g_old")
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "knn-graph", "--path", old_dir,
         "--index", idx, "--out", g_old, "--k", "3", "--n-probe", "2"],
    )
    run_pipeline.main()
    capsys.readouterr()

    g_new = str(tmp_path / "g_new")
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "knn-graph", "--path", new_dir,
         "--index", idx, "--out", g_new, "--k", "3", "--n-probe", "2",
         "--update-graph", g_old, "--old-path", old_dir],
    )
    run_pipeline.main()
    assert ">>> knn graph updated; " in capsys.readouterr().out

    g_full = str(tmp_path / "g_full")
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "knn-graph",
         "--path", "/root/testdata/sf0.001", "--index", idx,
         "--out", g_full, "--k", "3", "--n-probe", "2"],
    )
    run_pipeline.main()
    capsys.readouterr()
    got = {tuple(r) for r in spark.read.parquet(g_new).collect()}
    want = {tuple(r) for r in spark.read.parquet(g_full).collect()}
    assert got == want and len(got) > 0

    # self-overwrite refused
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "knn-graph", "--path", new_dir,
         "--index", idx, "--out", g_old, "--k", "3", "--n-probe", "2",
         "--update-graph", g_old, "--old-path", old_dir],
    )
    with _pytest.raises(SystemExit):
        run_pipeline.main()


def test_cli_out_overwrite_guard_covers_every_mode(
    spark, tmp_path, capsys, monkeypatch
):
    """The hoisted self-overwrite guard (round-10 review): EVERY mode
    that writes mode('overwrite') to --out must refuse --out equal to
    ANY of its input dirs — mode('overwrite') deletes the target
    before the read plan runs, so an unguarded job silently destroys
    its own input. Covers the plain knn-graph build, decontam,
    cluster-sample and ann-search (the --update-graph case is pinned
    in test_knn_graph_cli_update_equals_rebuild); plus the
    --update-graph id-disjointness validation: a re-delivered
    (overlapping) batch fails with the contract named instead of
    silently duplicating edge sets."""
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import pytest as _pytest

    import run_pipeline

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb_dir = str(tmp_path / "emb")
    emb.filter(F.col("vec_id") < 200).write.parquet(emb_dir)

    idx = str(tmp_path / "idx_g")
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "build-ann-index",
         "--path", emb_dir, "--out", idx,
         "--cells", "8", "--pq-m", "8", "--pq-codes", "16"],
    )
    run_pipeline.main()
    capsys.readouterr()

    cases = [
        # plain knn-graph build: --out == --path and --out == --index
        ["--mode", "knn-graph", "--path", emb_dir, "--index", idx,
         "--out", emb_dir],
        ["--mode", "knn-graph", "--path", emb_dir, "--index", idx,
         "--out", idx],
        # decontam: --out == --eval
        ["--mode", "decontam", "--path", emb_dir, "--eval", emb_dir,
         "--out", emb_dir],
        # cluster-sample: --out == --index
        ["--mode", "cluster-sample", "--path", emb_dir, "--index", idx,
         "--out", idx],
        # ann-search: --out == --index
        ["--mode", "ann-search", "--path", emb_dir, "--index", idx,
         "--out", idx],
        # search (round 10): --out == --path
        ["--mode", "search", "--path", emb_dir, "--query", "spark",
         "--out", emb_dir],
        # shard (round 10): --out == --path
        ["--mode", "shard", "--path", emb_dir, "--out", emb_dir],
    ]
    for extra in cases:
        monkeypatch.setattr(sys, "argv", ["run_pipeline.py"] + extra)
        with _pytest.raises(SystemExit):
            run_pipeline.main()
        assert "must differ from" in capsys.readouterr().err

    # overlapping redelivery through --update-graph: ValueError with
    # the disjointness contract named
    g_old = str(tmp_path / "g_old2")
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "knn-graph", "--path", emb_dir,
         "--index", idx, "--out", g_old, "--k", "3", "--n-probe", "2"],
    )
    run_pipeline.main()
    capsys.readouterr()
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "knn-graph", "--path", emb_dir,
         "--index", idx, "--out", str(tmp_path / "g_new2"),
         "--k", "3", "--n-probe", "2",
         "--update-graph", g_old, "--old-path", emb_dir],
    )
    with _pytest.raises(ValueError, match="disjoint"):
        run_pipeline.main()


def test_knn_graph_cli_delete_equals_rebuild(
    spark, tmp_path, capsys, monkeypatch
):
    """--update-graph + --delete-ids routes through
    delete_from_knn_graph: dropped vertices vanish, affected
    survivors re-rank, and the pruned parquet equals a from-scratch
    rebuild over the surviving embeddings exactly; --out equal to
    --delete-ids is refused by the hoisted overwrite guard."""
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import pytest as _pytest

    import run_pipeline

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    emb_dir = str(tmp_path / "emb_d")
    emb.filter(F.col("vec_id") < 300).write.parquet(emb_dir)
    del_dir = str(tmp_path / "del_ids")
    (
        emb.filter((F.col("vec_id") % 11 == 0) & (F.col("vec_id") < 300))
        .select("vec_id")
        .write.parquet(del_dir)
    )
    keep_dir = str(tmp_path / "emb_keep")
    (
        emb.filter((F.col("vec_id") % 11 != 0) & (F.col("vec_id") < 300))
        .write.parquet(keep_dir)
    )

    idx = str(tmp_path / "idx_d")
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "build-ann-index",
         "--path", emb_dir, "--out", idx,
         "--cells", "8", "--pq-m", "8", "--pq-codes", "16"],
    )
    run_pipeline.main()
    capsys.readouterr()

    g_full = str(tmp_path / "g_full_d")
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "knn-graph", "--path", emb_dir,
         "--index", idx, "--out", g_full, "--k", "3", "--n-probe", "2"],
    )
    run_pipeline.main()
    capsys.readouterr()

    g_pruned = str(tmp_path / "g_pruned")
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "knn-graph", "--path", emb_dir,
         "--index", idx, "--out", g_pruned, "--k", "3", "--n-probe", "2",
         "--update-graph", g_full, "--delete-ids", del_dir],
    )
    run_pipeline.main()
    assert ">>> knn graph pruned; " in capsys.readouterr().out

    g_rebuilt = str(tmp_path / "g_rebuilt")
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "knn-graph", "--path", keep_dir,
         "--index", idx, "--out", g_rebuilt, "--k", "3", "--n-probe", "2"],
    )
    run_pipeline.main()
    capsys.readouterr()
    got = {tuple(r) for r in spark.read.parquet(g_pruned).collect()}
    want = {tuple(r) for r in spark.read.parquet(g_rebuilt).collect()}
    assert got == want and len(got) > 0

    # --delete-ids without --update-graph refused; --out == --delete-ids
    # refused by the overwrite guard
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "knn-graph", "--path", emb_dir,
         "--index", idx, "--out", str(tmp_path / "x"),
         "--delete-ids", del_dir],
    )
    with _pytest.raises(SystemExit):
        run_pipeline.main()
    assert "requires --update-graph" in capsys.readouterr().err
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "knn-graph", "--path", emb_dir,
         "--index", idx, "--out", del_dir, "--k", "3", "--n-probe", "2",
         "--update-graph", g_full, "--delete-ids", del_dir],
    )
    with _pytest.raises(SystemExit):
        run_pipeline.main()
    assert "must differ from" in capsys.readouterr().err


def test_delete_from_ann_index_lifecycle(spark, tmp_path, capsys, monkeypatch):
    """Deletion repair for the persistent index: victim cells rewrite
    surgically (untouched cell dirs byte-for-byte), the pruned codes
    equal original-minus-victims exactly, delete-then-re-add of the
    same vectors reproduces the original codes (frozen-model
    re-encoding is deterministic), ghost deletions are idempotent
    no-ops, emptying is refused, search serves only survivors, and
    the CLI routes through the operator."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import pytest as _pytest
    import run_pipeline

    from travelpulse_spark_stream_tourism_analytics_spark.operators.ann_index import (
        add_to_ann_index,
        ann_search,
        build_ann_index,
        delete_from_ann_index,
        load_ann_meta,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter(F.col("vec_id") < 300)
    idx = str(tmp_path / "idx")
    build_ann_index(emb, idx, n_cells=8, m=8, k_codes=16)
    codes_dir = os.path.join(idx, "codes.parquet")

    def snapshot(d):
        out = {}
        for root, _, files in os.walk(d):
            for f in files:
                p = os.path.join(root, f)
                with open(p, "rb") as fh:
                    out[os.path.relpath(p, d)] = fh.read()
        return out

    before_codes = {
        r["vec_id"]: (r["cell"], tuple(r["codes"]))
        for r in spark.read.parquet(codes_dir).collect()
    }
    before_files = snapshot(codes_dir)
    victims = spark.createDataFrame(
        [(i,) for i in range(0, 300, 10)], "vec_id long"
    )
    victim_ids = set(range(0, 300, 10))
    victim_cells = {before_codes[v][0] for v in victim_ids}

    meta = delete_from_ann_index(spark, idx, victims)
    assert meta["n_vectors"] == 300 - 30
    assert load_ann_meta(idx)["n_vectors"] == 270

    after_codes = {
        r["vec_id"]: (r["cell"], tuple(r["codes"]))
        for r in spark.read.parquet(codes_dir).collect()
    }
    assert after_codes == {
        k: v for k, v in before_codes.items() if k not in victim_ids
    }
    # untouched cell directories keep their files byte-for-byte
    after_files = snapshot(codes_dir)
    for rel, blob in after_files.items():
        if "cell=" not in rel:
            continue  # _SUCCESS etc.
        cell = int(rel.split("cell=")[1].split(os.sep)[0])
        if cell not in victim_cells:
            assert before_files[rel] == blob

    # search never returns a victim
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").cast("array<double>").alias("qv"),
    )
    res = ann_search(spark, idx, q, k=10, n_probe=8)
    assert not {r["neighbor_id"] for r in res.collect()} & victim_ids

    # ghost replay: deleting the same ids again is a no-op
    meta2 = delete_from_ann_index(spark, idx, victims)
    assert meta2["n_vectors"] == 270
    assert snapshot(codes_dir) == after_files

    # delete-then-re-add the same vectors == the original codes
    add_to_ann_index(
        spark, idx, emb.filter(F.col("vec_id").isin(list(victim_ids)))
    )
    assert load_ann_meta(idx)["n_vectors"] == 300
    roundtrip = {
        r["vec_id"]: (r["cell"], tuple(r["codes"]))
        for r in spark.read.parquet(codes_dir).collect()
    }
    assert roundtrip == before_codes

    # emptying refused, index untouched
    allids = spark.createDataFrame(
        [(i,) for i in range(300)], "vec_id long"
    )
    with _pytest.raises(ValueError, match="empties"):
        delete_from_ann_index(spark, idx, allids)
    assert load_ann_meta(idx)["n_vectors"] == 300

    # CLI
    vict_p = str(tmp_path / "victims")
    victims.write.parquet(vict_p)
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "ann-delete",
         "--index", idx, "--delete-ids", vict_p],
    )
    run_pipeline.main()
    assert ">>> ann index pruned; now 270 vectors" in capsys.readouterr().out
