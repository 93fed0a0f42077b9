"""Sampling operators (operators/splits.py)."""


def test_weighted_sample_without_replacement_semantics(spark):
    """A-ES contract: k distinct rows per stratum, deterministic,
    inclusion frequency ordered by weight across many seeds."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.splits import (
        weighted_sample_without_replacement,
    )

    rows = [(i, "s", 100 if i < 5 else 1) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")

    got = weighted_sample_without_replacement(
        df, k=10, weight_col="w", stratify_col="source"
    ).collect()
    assert len(got) == 10
    assert len({r["doc_id"] for r in got}) == 10  # without replacement
    assert sorted(r["es_rank"] for r in got) == list(range(1, 11))

    again = weighted_sample_without_replacement(
        df, k=10, weight_col="w", stratify_col="source"
    ).collect()
    assert sorted(map(str, got)) == sorted(map(str, again))  # deterministic

    # heavy items (w=100, 5 of 50 docs) must be picked far more often
    # than their 10% population share across independent seeds
    heavy_hits = total = 0
    for s in range(20):
        sel = weighted_sample_without_replacement(
            df, k=10, weight_col="w", stratify_col="source", seed=f"s{s}"
        ).collect()
        heavy_hits += sum(1 for r in sel if r["doc_id"] < 5)
        total += len(sel)
    assert heavy_hits / total > 0.25  # ~0.4-0.5 expected; 5/50 baseline

    # zero/negative weights are excluded outright
    z = spark.createDataFrame(
        [(1, "s", 0), (2, "s", -3), (3, "s", 5)],
        "doc_id long, source string, w long",
    )
    only = weighted_sample_without_replacement(
        z, k=10, weight_col="w", stratify_col="source"
    ).collect()
    assert [r["doc_id"] for r in only] == [3]


def test_weighted_sample_equal_weights_is_seeded_shuffle(spark):
    """With equal weights the A-ES rank is a uniform seeded permutation
    — the deterministic training-order shuffle. Different seeds give
    different permutations; the same seed is stable."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.splits import (
        weighted_sample_without_replacement,
    )

    df = spark.createDataFrame(
        [(i, 1) for i in range(100)], "doc_id long, w long"
    )
    p1 = {
        r["doc_id"]: r["es_rank"]
        for r in weighted_sample_without_replacement(
            df, k=100, weight_col="w", seed="epoch1"
        ).collect()
    }
    p2 = {
        r["doc_id"]: r["es_rank"]
        for r in weighted_sample_without_replacement(
            df, k=100, weight_col="w", seed="epoch2"
        ).collect()
    }
    assert sorted(p1.values()) == list(range(1, 101))  # a permutation
    assert p1 != p2  # epoch reshuffle
    assert p1 == {
        r["doc_id"]: r["es_rank"]
        for r in weighted_sample_without_replacement(
            df, k=100, weight_col="w", seed="epoch1"
        ).collect()
    }


def test_weighted_sample_heavy_weights_keep_selectivity(spark):
    """Regression (review finding): key rounding must be finer than the
    heavy-weight key band 22/w, or huge-w rows collapse into rounded
    ties broken by doc_id — identical selections for every seed. With
    w ~ 2e5 the selection must still reshuffle across seeds."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.splits import (
        weighted_sample_without_replacement,
    )

    df = spark.createDataFrame(
        [(i, 200_000 + i) for i in range(400)], "doc_id long, w long"
    )
    picks = []
    for s in ("a", "b", "c"):
        sel = weighted_sample_without_replacement(
            df, k=20, weight_col="w", seed=s
        ).collect()
        keys = [r["es_key"] for r in sel]
        assert len(set(keys)) > 10, "rounded keys collapsed into ties"
        picks.append(frozenset(r["doc_id"] for r in sel))
    assert len(set(picks)) == 3, "seed did not reshuffle heavy docs"
    # and NOT simply the k lowest ids (the collapse symptom)
    assert picks[0] != frozenset(range(20))


def test_temperature_weights_semantics_and_budget_composition(spark):
    """temperature_weights (round 6): alpha=1 -> natural proportions,
    alpha=0 -> uniform, alpha in between strictly upweights the small
    source relative to natural; weights parity vs a straight-line
    reference at the 1e-9 rounding; composes with
    sample_to_token_budget."""
    import math

    import pytest
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.splits import (
        sample_to_token_budget,
        temperature_weights,
    )

    rows = []
    for i in range(900):
        rows.append((i, "web", 100))
    for i in range(90):
        rows.append((1000 + i, "books", 100))
    for i in range(10):
        rows.append((2000 + i, "code", 100))
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    tok = {"web": 90000.0, "books": 9000.0, "code": 1000.0}

    def ref(alpha):
        nums = {s: round(t ** alpha, 6) for s, t in tok.items()}
        z = sum(nums.values())
        return {s: round(n / z, 9) for s, n in nums.items()}

    for alpha in (0.0, 0.3, 0.5, 1.0):
        got = {
            r["source"]: r["weight"]
            for r in temperature_weights(docs, alpha=alpha).collect()
        }
        assert got == pytest.approx(ref(alpha), abs=2e-9), alpha
    w1 = {r["source"]: r["weight"]
          for r in temperature_weights(docs, alpha=1.0).collect()}
    w03 = {r["source"]: r["weight"]
           for r in temperature_weights(docs, alpha=0.3).collect()}
    assert w03["code"] > w1["code"] and w03["books"] > w1["books"]
    assert w03["web"] < w1["web"]
    assert abs(sum(w03.values()) - 1.0) < 1e-6

    with pytest.raises(ValueError, match="alpha"):
        temperature_weights(docs, alpha=-0.1)

    # composition: realize a 10k-token budget under the alpha=0.3 mix —
    # per-source kept tokens == floor(weight * B) exactly (uniform
    # 100-token docs divide every budget cleanly except rounding)
    kept = sample_to_token_budget(
        docs, temperature_weights(docs, alpha=0.3), budget_tokens=10_000
    )
    per = {
        r["source"]: r["kept_tokens"]
        for r in kept.groupBy("source")
        .agg(F.sum("n_tokens").alias("kept_tokens"))
        .collect()
    }
    for s in tok:
        budget = math.floor(w03[s] * 10_000)
        # greedy next-fit fills whole 100-token docs up to the budget,
        # capped by what the source actually has (code upsamples past
        # its own mass at alpha=0.3 — the sampler can't mint tokens)
        assert per[s] == min(budget - (budget % 100), int(tok[s])), s


def test_cluster_balanced_sample_caps_and_matches_window_assignment(spark):
    """Embedding-cluster-balanced subsampling: every kept vector's
    cell equals the crossJoin+window argmax-cosine reference, no cell
    exceeds the cap, the kept set per cell is exactly the md5-order
    prefix of the cell's members, and the whole thing is
    deterministic."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from travelpulse_spark_stream_tourism_analytics_spark.operators.similarity import (
        as_double_vec,
        cosine,
    )
    from travelpulse_spark_stream_tourism_analytics_spark.operators.splits import (
        cluster_balanced_sample,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", as_double_vec(F.col("embedding")).alias("v"))
    )
    seeds = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell_id"), F.col("v").alias("sv")
    )
    got = cluster_balanced_sample(
        emb, seeds, cap=20, id_col="vec_id", vec_col="v"
    )
    rows = got.collect()
    per_cell: dict = {}
    for r in rows:
        per_cell.setdefault(r["cell_id"], []).append(r)
    assert all(len(v) <= 20 for v in per_cell.values())
    assert sum(len(v) for v in per_cell.values()) < 500  # something capped

    # reference assignment: crossJoin + per-vector window argmax
    ref = (
        emb.crossJoin(
            seeds.select(
                F.col("cell_id").alias("rcell"), F.col("sv").alias("rsv")
            )
        )
        .select(
            "vec_id",
            "rcell",
            cosine(F.col("v"), F.col("rsv")).alias("c"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.desc("c"), F.asc("rcell")
                )
            ),
        )
        .filter(F.col("rn") == 1)
    )
    ref_cell = {r["vec_id"]: (r["rcell"], r["c"]) for r in ref.collect()}
    for r in rows:
        assert ref_cell[r["vec_id"]] == (r["cell_id"], r["own_cosine"])

    # kept set per cell == the md5-order prefix of that cell's members
    import hashlib

    members: dict = {}
    for vid, (cell, _c) in ref_cell.items():
        members.setdefault(cell, []).append(vid)
    for cell, vids in members.items():
        prefix = sorted(
            vids,
            key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
        )[:20]
        assert sorted(r["vec_id"] for r in per_cell[cell]) == sorted(prefix)

    again = {tuple(r) for r in got.collect()}
    assert again == {tuple(r) for r in rows}  # deterministic


def test_cluster_balanced_sample_guards(spark):
    """cap >= 1 enforced; zero/NaN-norm centroids refused by id;
    zero/NaN-norm vectors excluded from the sample, not fatal."""
    import pytest
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.similarity import (
        as_double_vec,
    )
    from travelpulse_spark_stream_tourism_analytics_spark.operators.splits import (
        cluster_balanced_sample,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", as_double_vec(F.col("embedding")).alias("v"))
        .filter(F.col("vec_id") < 50)
    )
    seeds = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cell_id"), F.col("v").alias("sv")
    )
    with pytest.raises(ValueError, match="cap must be >= 1"):
        cluster_balanced_sample(emb, seeds, cap=0, id_col="vec_id", vec_col="v")

    dim = len(emb.select("v").first()["v"])
    zero_seed = spark.createDataFrame(
        [(77, [0.0] * dim)], "cell_id long, sv array<double>"
    )
    with pytest.raises(ValueError, match=r"\[77\]"):
        cluster_balanced_sample(
            emb, seeds.unionByName(zero_seed), cap=5,
            id_col="vec_id", vec_col="v",
        )
    nan_seed = spark.createDataFrame(
        [(78, [float("nan")] * dim)], "cell_id long, sv array<double>"
    )
    with pytest.raises(ValueError, match=r"\[78\]"):
        cluster_balanced_sample(
            emb, seeds.unionByName(nan_seed), cap=5,
            id_col="vec_id", vec_col="v",
        )
    # Inf-norm centroid (round-10 review): passes both a NaN
    # self-compare and <=0, then every cosine against it is
    # Inf/Inf = NaN which ranks GREATEST — the cell would swallow
    # every vector. Must be refused by id like zero/NaN.
    inf_seed = spark.createDataFrame(
        [(79, [float("inf")] + [1.0] * (dim - 1))],
        "cell_id long, sv array<double>",
    )
    with pytest.raises(ValueError, match=r"\[79\]"):
        cluster_balanced_sample(
            emb, seeds.unionByName(inf_seed), cap=5,
            id_col="vec_id", vec_col="v",
        )
    with pytest.raises(ValueError, match="empty centroid set"):
        cluster_balanced_sample(
            emb, seeds.filter(F.col("cell_id") < 0), cap=5,
            id_col="vec_id", vec_col="v",
        )

    # degenerate corpus rows (zero / NaN / Inf norm) excluded, not fatal
    bad = spark.createDataFrame(
        [
            (999000, [0.0] * dim),
            (999001, [float("nan")] * dim),
            (999002, [float("inf")] + [1.0] * (dim - 1)),
        ],
        "vec_id long, v array<double>",
    )
    rows = cluster_balanced_sample(
        emb.unionByName(bad), seeds, cap=1000, id_col="vec_id", vec_col="v"
    ).collect()
    ids = {r["vec_id"] for r in rows}
    assert not ids & {999000, 999001, 999002} and len(ids) == 50


def test_cluster_sample_cli_caps_per_index_cell(
    spark, tmp_path, capsys, monkeypatch
):
    """--mode cluster-sample composes an ann index's IVF centroids
    with cluster_balanced_sample: no cell keeps more than --cap rows,
    every cell with members is represented, and ranks are 1..n."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    import run_pipeline

    idx = str(tmp_path / "idx_cs")
    out = str(tmp_path / "kept")
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
        ["run_pipeline.py", "--mode", "cluster-sample",
         "--path", "/root/testdata/sf0.001", "--index", idx,
         "--out", out, "--cap", "30"],
    )
    run_pipeline.main()
    got = capsys.readouterr().out
    assert ">>> cluster sample done; " in got and "cap=30 per cell" in got
    kept = spark.read.parquet(out)
    per = {
        r["cell_id"]: r["n"]
        for r in kept.groupBy("cell_id").agg(F.count("*").alias("n")).collect()
    }
    assert per and all(n <= 30 for n in per.values())
    assert kept.count() < 500  # something was capped
    ranks = kept.groupBy("cell_id").agg(F.max("cluster_rank").alias("m")).collect()
    assert all(r["m"] == per[r["cell_id"]] for r in ranks)


def test_shuffled_shards_semantics(spark):
    """Deterministic shuffle+shard contract: stable across runs and
    partitionings, positions contiguous per shard, n_shards=1 is one
    global permutation, different seeds permute differently, shard
    sizes roughly uniform, n_shards<1 refused."""
    import pytest
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.splits import (
        shuffled_shards,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(400)], "doc_id long, source string"
    )
    got = shuffled_shards(df, n_shards=4, seed="e1")
    rows = {r["doc_id"]: (r["shard"], r["pos"]) for r in got.collect()}
    assert len(rows) == 400

    # stable under a different physical partitioning
    again = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shuffled_shards(
            df.repartition(13, "source"), n_shards=4, seed="e1"
        ).collect()
    }
    assert rows == again

    # per-shard positions are exactly 1..len(shard)
    by_shard = {}
    for shard, pos in rows.values():
        by_shard.setdefault(shard, []).append(pos)
    assert set(by_shard) == {0, 1, 2, 3}
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # binomial concentration: no shard is empty or >2x the mean here
    sizes = [len(v) for v in by_shard.values()]
    assert min(sizes) > 0 and max(sizes) < 200

    # n_shards=1: a single global permutation of all rows
    one = shuffled_shards(df, n_shards=1, seed="e1").collect()
    assert {r["shard"] for r in one} == {0}
    assert sorted(r["pos"] for r in one) == list(range(1, 401))

    # a different seed gives a different permutation (same id sets)
    other = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shuffled_shards(df, n_shards=4, seed="e2").collect()
    }
    assert other != rows and set(other) == set(rows)

    with pytest.raises(ValueError, match="n_shards"):
        shuffled_shards(df, n_shards=0)


def test_shard_manifest_matches_recount(spark):
    """Manifest rows certify (count, token sum, id-set checksum,
    dense positions) per shard — and the checksum flips when an id
    set differs."""
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.splits import (
        shard_manifest,
        shuffled_shards,
    )

    df = spark.createDataFrame(
        [(i, 10 + i % 7) for i in range(300)], "doc_id long, n_tokens long"
    )
    assigned = shuffled_shards(df, n_shards=4, seed="m1")
    man = {
        r["shard"]: r
        for r in shard_manifest(assigned, tokens_col="n_tokens").collect()
    }
    assert set(man) == {0, 1, 2, 3}
    raw = assigned.groupBy("shard").agg(
        F.count("*").alias("n"), F.sum("n_tokens").alias("t")
    ).collect()
    for r in raw:
        m = man[r["shard"]]
        assert m["n_docs"] == r["n"]
        assert m["n_tokens"] == r["t"]
        assert m["positions_dense"] is True
    assert sum(m["n_docs"] for m in man.values()) == 300

    # dropping one row changes exactly that shard's checksum and count
    victim = assigned.filter("shard = 2").limit(1).collect()[0]["doc_id"]
    man2 = {
        r["shard"]: r
        for r in shard_manifest(
            assigned.filter(F.col("doc_id") != victim),
            tokens_col="n_tokens",
        ).collect()
    }
    assert man2[2]["id_checksum"] != man[2]["id_checksum"]
    assert man2[2]["n_docs"] == man[2]["n_docs"] - 1
    for s in (0, 1, 3):
        assert man2[s]["id_checksum"] == man[s]["id_checksum"]

    # tokens_col omitted -> n_tokens column present but NULL
    nul = shard_manifest(assigned).collect()
    assert all(r["n_tokens"] is None for r in nul)


def test_shard_cli_roundtrip(spark, tmp_path, capsys, monkeypatch):
    """--mode shard writes shards/ partitioned by shard plus a
    manifest that re-verifies against the written rows; the layout is
    bit-identical to the library operator and replays under the same
    (seed, n_shards)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import run_pipeline
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.splits import (
        shuffled_shards,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "source", "text")
    docs_dir = str(tmp_path / "docs")
    docs.write.parquet(docs_dir)

    out = str(tmp_path / "export")
    argv = ["run_pipeline.py", "--mode", "shard", "--path", docs_dir,
            "--out", out, "--n-shards", "4", "--shuffle-seed", "ep0"]
    monkeypatch.setattr(sys, "argv", argv)
    run_pipeline.main()
    assert ">>> shard export done" in capsys.readouterr().out

    written = spark.read.parquet(os.path.join(out, "shards"))
    lib = shuffled_shards(docs, n_shards=4, seed="ep0")
    got = {
        r["doc_id"]: (r["shard"], r["pos"]) for r in written.collect()
    }
    want = {r["doc_id"]: (r["shard"], r["pos"]) for r in lib.collect()}
    assert got == want

    man = spark.read.parquet(os.path.join(out, "manifest.parquet"))
    mrows = {r["shard"]: r for r in man.collect()}
    counts = {
        r["shard"]: r["n"]
        for r in written.groupBy("shard").agg(F.count("*").alias("n"))
        .collect()
    }
    assert {s: m["n_docs"] for s, m in mrows.items()} == counts
    assert all(m["positions_dense"] for m in mrows.values())
    assert all(m["n_tokens"] is not None for m in mrows.values())

    # replay: a second export under the same seed is identical
    out2 = str(tmp_path / "export2")
    monkeypatch.setattr(
        sys, "argv", argv[:argv.index(out)] + [out2] + argv[argv.index(out) + 1:]
    )
    run_pipeline.main()
    capsys.readouterr()
    again = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in spark.read.parquet(os.path.join(out2, "shards")).collect()
    }
    assert again == got


def test_verify_shards_detects_corruption(spark, tmp_path, capsys, monkeypatch):
    """verify_shards passes on an intact export; a dropped row, a
    manifest from a different seed, and a missing shard directory all
    surface as ok=false rows; the CLI exits 1 on mismatch."""
    import os
    import shutil
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import pytest as _pytest
    import run_pipeline
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.splits import (
        shard_manifest,
        shuffled_shards,
        verify_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1} tok{i + 2}") for i in range(300)],
        "doc_id long, text string",
    )
    out = str(tmp_path / "exp")
    assigned = shuffled_shards(docs, n_shards=4, seed="v1")
    (
        assigned.repartition(4, "shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(out, "shards"))
    )
    shard_manifest(
        spark.read.parquet(os.path.join(out, "shards"))
    ).write.mode("overwrite").parquet(os.path.join(out, "manifest.parquet"))

    ok = verify_shards(spark, out).collect()
    assert len(ok) == 4 and all(r["ok"] for r in ok)

    # CLI happy path
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "shard", "--verify", "--path", out],
    )
    run_pipeline.main()
    assert ">>> shard verify ok" in capsys.readouterr().out

    # corrupt one shard: rewrite it minus one row
    victim_dir = os.path.join(out, "shards", "shard=2")
    sub = spark.read.parquet(victim_dir)
    keep = sub.orderBy("pos").limit(sub.count() - 1)
    tmp_dir = str(tmp_path / "sub")
    keep.write.mode("overwrite").parquet(tmp_dir)
    shutil.rmtree(victim_dir)
    shutil.copytree(tmp_dir, victim_dir)
    rows = {r["shard"]: r for r in verify_shards(spark, out).collect()}
    assert not rows[2]["ok"] and not rows[2]["checksum_ok"]
    assert all(rows[s]["ok"] for s in (0, 1, 3))
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "shard", "--verify", "--path", out],
    )
    with _pytest.raises(SystemExit):
        run_pipeline.main()
    assert "FAILED" in capsys.readouterr().out

    # a shard directory missing entirely -> its manifest row fails
    shutil.rmtree(victim_dir)
    rows = {r["shard"]: r for r in verify_shards(spark, out).collect()}
    assert not rows[2]["ok"] and rows[2]["n_docs"] is None


def test_shuffled_shards_validate_rejects_duplicate_ids(spark):
    """validate=True refuses duplicate ids (their relative pos is
    partition-order luck, breaking replay); the default stays lazy."""
    import pytest

    from travelpulse_spark_stream_tourism_analytics_spark.operators.splits import (
        shuffled_shards,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, "c")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="duplicate ids"):
        shuffled_shards(df, n_shards=2, validate=True)
    # clean input validates through unchanged
    clean = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    )
    v = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shuffled_shards(clean, n_shards=2, validate=True).collect()
    }
    nv = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in shuffled_shards(clean, n_shards=2).collect()
    }
    assert v == nv
