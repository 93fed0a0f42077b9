"""Weighted PageRank operator semantics (operators/graph.py)."""

from __future__ import annotations

import os

import math

import pytest

from pyspark.sql import functions as F

from travelpulse_spark_stream_tourism_analytics_spark.operators.graph import (
    pagerank,
    undirect,
)


def _ref_pagerank(edges, iters=4, damping=0.85, teleport=0.15):
    """Straight-line reference with the SAME 1e-15 floor quantization of
    the contribution sum, so equality below is exact, not approximate."""
    outw: dict[str, int] = {}
    for s, _d, w in edges:
        outw[s] = outw.get(s, 0) + w
    nodes = sorted({s for s, _, _ in edges})
    n = len(nodes)
    r = {v: 1.0 / float(n) for v in nodes}
    for _ in range(iters):
        acc = {v: 0 for v in nodes}
        for s, d, w in edges:
            frac = float(w) / float(outw[s])
            acc[d] += math.floor(r[s] * frac * 1e15)
        r = {
            v: teleport / float(n) + damping * (float(acc[v]) / 1e15)
            for v in nodes
        }
    return r


def _edges_df(spark, triples):
    return spark.createDataFrame(triples, "src string, dst string, w long")


def test_pagerank_matches_pure_python_reference_exactly(spark):
    """Distributed ranks == the straight-line reference, bit-for-bit
    (the same contract the DuckDB oracle branch relies on)."""
    triples = [
        ("a", "b", 3), ("b", "a", 3),
        ("a", "c", 1), ("c", "a", 1),
        ("b", "c", 2), ("c", "b", 2),
        ("c", "d", 1), ("d", "c", 1),
        ("d", "e", 5), ("e", "d", 5),
    ]
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges_df(spark, triples), iterations=4).collect()
    }
    want = _ref_pagerank(triples, iters=4)
    assert got == want  # exact float equality by design


def _ref_pagerank_redistribute(
    edges, iters=4, damping=0.85, teleport=0.15, seeds=None
):
    """Straight-line reference for dangling='redistribute': node
    universe = src UNION dst, sink mass redistributed over the teleport
    distribution each iteration, with the SAME 1e-15 floor quantization
    of both the contribution sums and the dangling mass — equality
    below is exact."""
    outw: dict[str, int] = {}
    nodes = set()
    for s, d, w in edges:
        outw[s] = outw.get(s, 0) + w
        nodes.add(s)
        nodes.add(d)
    nodes = sorted(nodes)
    n = len(nodes)
    dang = [v for v in nodes if v not in outw]
    if seeds is None:
        dist = {v: 1.0 / float(n) for v in nodes}
        base = {v: teleport / float(n) for v in nodes}
        r = {v: 1.0 / float(n) for v in nodes}
    else:
        S = set(seeds) & set(nodes)
        ns = float(len(S))
        dist = {v: (1.0 / ns if v in S else 0.0) for v in nodes}
        base = {v: (teleport / ns if v in S else 0.0) for v in nodes}
        r = {v: (1.0 / ns if v in S else 0.0) for v in nodes}
    for _ in range(iters):
        acc = {v: 0 for v in nodes}
        for s, d, w in edges:
            frac = float(w) / float(outw[s])
            acc[d] += math.floor(r[s] * frac * 1e15)
        dm = sum(math.floor(r[v] * 1e15) for v in dang)
        r = {
            v: base[v]
            + damping
            * (float(acc[v]) / 1e15 + (float(dm) / 1e15) * dist[v])
            for v in nodes
        }
    return r


def test_pagerank_redistribute_matches_reference_on_sink_graph(spark):
    """dangling='redistribute' == the straight-line textbook reference,
    bit-for-bit, on a directed graph with two pure sinks — and total
    mass is conserved (the property the default contract mode cannot
    offer on sink graphs). Global and seeded variants both pinned
    through one fused run."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.graph import (
        pagerank_multi,
    )

    # d and e are pure sinks; b has out-degree 1 into a sink
    triples = [
        ("a", "b", 2),
        ("a", "d", 1),
        ("b", "d", 3),
        ("c", "a", 1),
        ("c", "e", 2),
    ]
    seeds = spark.createDataFrame([("a",), ("e",)], "node string")
    got = {
        r["node"]: (r["pr"], r["tr"])
        for r in pagerank_multi(
            _edges_df(spark, triples),
            {"pr": None, "tr": seeds},
            iterations=4,
            dangling="redistribute",
        ).collect()
    }
    want_pr = _ref_pagerank_redistribute(triples, iters=4)
    want_tr = _ref_pagerank_redistribute(triples, iters=4, seeds={"a", "e"})
    assert {v: g[0] for v, g in got.items()} == want_pr
    assert {v: g[1] for v, g in got.items()} == want_tr
    for idx in (0, 1):
        total = sum(g[idx] for g in got.values())
        assert abs(total - 1.0) < 1e-9  # mass conserved, sinks included


def test_pagerank_redistribute_equals_contract_when_no_sinks(spark):
    """On a graph where every node is a source, redistribute mode must
    be bit-identical to contract mode (the dangling term is zero)."""
    triples = [
        ("a", "b", 3), ("b", "a", 3),
        ("b", "c", 1), ("c", "b", 1),
        ("c", "a", 2), ("a", "c", 2),
    ]
    base = {
        r["node"]: r["rank"]
        for r in pagerank(_edges_df(spark, triples), iterations=4).collect()
    }
    red = {
        r["node"]: r["rank"]
        for r in pagerank(
            _edges_df(spark, triples), iterations=4, dangling="redistribute"
        ).collect()
    }
    assert base == red


def test_pagerank_rejects_unknown_dangling_mode(spark):
    with pytest.raises(ValueError, match="dangling"):
        pagerank(
            _edges_df(spark, [("a", "b", 1)]),
            iterations=1,
            dangling="selfloop",
        )


def test_pagerank_hub_outranks_spokes_and_mass_is_conserved(spark):
    """A star hub collects rank from every spoke; total mass stays ~1
    (each floor() loses < 1e-15 per edge per iteration, nothing more)."""
    spokes = [f"s{i}" for i in range(20)]
    triples = [("hub", s, 1) for s in spokes] + [(s, "hub", 1) for s in spokes]
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(_edges_df(spark, triples), iterations=6).collect()
    }
    assert all(ranks["hub"] > ranks[s] for s in spokes)
    total = sum(ranks.values())
    assert abs(total - 1.0) < 1e-9


def test_undirect_makes_every_endpoint_a_source(spark):
    """The no-dangling-mass contract: after undirect(), the src node
    set equals the full endpoint set."""
    e = _edges_df(spark, [("a", "b", 1), ("c", "b", 2)])
    u = undirect(e)
    srcs = {r["src"] for r in u.select("src").distinct().collect()}
    all_nodes = {"a", "b", "c"}
    assert srcs == all_nodes
    # weights preserved symmetrically
    w = {(r["src"], r["dst"]): r["w"] for r in u.collect()}
    assert w[("a", "b")] == w[("b", "a")] == 1
    assert w[("c", "b")] == w[("b", "c")] == 2


def test_pagerank_weight_sensitivity(spark):
    """Heavier inbound edges pull rank: with b's only inbound weight
    tripled vs c's, b outranks c in an otherwise symmetric graph."""
    triples = [
        ("a", "b", 3), ("b", "a", 1),
        ("a", "c", 1), ("c", "a", 1),
    ]
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(_edges_df(spark, triples), iterations=5).collect()
    }
    assert ranks["b"] > ranks["c"]


def test_pagerank_checkpoint_every_is_transparent(spark):
    """Lineage truncation must not change results (bit-for-bit)."""
    triples = [
        ("a", "b", 2), ("b", "a", 2),
        ("b", "c", 1), ("c", "b", 1),
        ("c", "a", 4), ("a", "c", 4),
    ]
    base = {
        r["node"]: r["rank"]
        for r in pagerank(_edges_df(spark, triples), iterations=6).collect()
    }
    chk = {
        r["node"]: r["rank"]
        for r in pagerank(
            _edges_df(spark, triples), iterations=6, checkpoint_every=2
        ).collect()
    }
    assert base == chk


def test_pagerank_deep_run_auto_checkpoint_is_transparent(spark):
    """iterations > 8 silently enables lineage truncation (round 6,
    VERDICT r5 nit 3) — results must stay bit-identical to the
    straight-line reference."""
    triples = [
        ("a", "b", 2), ("b", "a", 2),
        ("b", "c", 1), ("c", "b", 1),
        ("c", "a", 4), ("a", "c", 4),
    ]
    got = {
        r["node"]: r["rank"]
        for r in pagerank(_edges_df(spark, triples), iterations=12).collect()
    }
    assert got == _ref_pagerank(triples, iters=12)


def test_pagerank_multi_fused_equals_separate_runs(spark):
    """k variants advanced through ONE fused loop must be bit-identical
    to k independent pagerank calls (the per-column decimal sums are
    independent, so fusion is pure plumbing)."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.graph import (
        pagerank_multi,
    )

    triples = [
        ("a", "b", 2), ("b", "a", 2),
        ("b", "c", 1), ("c", "b", 1),
        ("c", "a", 4), ("a", "c", 4),
        ("c", "d", 3), ("d", "c", 3),
    ]
    edges = _edges_df(spark, triples)
    seeds = spark.createDataFrame([("a",), ("d",)], "node string")
    fused = {
        r["node"]: (r["g"], r["t"])
        for r in pagerank_multi(
            edges, {"g": None, "t": seeds}, iterations=5
        ).collect()
    }
    sep_g = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iterations=5).collect()
    }
    sep_t = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges, iterations=5, seeds=seeds,
            cache_site="graph.test.trust",
        ).collect()
    }
    assert {k: v[0] for k, v in fused.items()} == sep_g
    assert {k: v[1] for k, v in fused.items()} == sep_t


def _exact_harmonic(edge_list, max_t):
    """Textbook truncated harmonic in-centrality by per-source BFS."""
    from collections import defaultdict, deque

    fwd = defaultdict(set)
    nodes = set()
    for s, d in edge_list:
        fwd[s].add(d)
        nodes.update((s, d))
    harm = {v: 0.0 for v in nodes}
    reach = {v: 0 for v in nodes}
    for u in nodes:  # BFS outward from u; u contributes 1/d to each v
        dist = {u: 0}
        q = deque([u])
        while q:
            x = q.popleft()
            if dist[x] >= max_t:
                continue
            for y in fwd[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        for v, d in dist.items():
            if v != u:
                harm[v] += 1.0 / d
                reach[v] += 1
    return harm, reach


def test_hyperball_exact_on_small_graphs(spark):
    """DataSketches HLL is exact in coupon mode, so small graphs must
    reproduce textbook truncated harmonic centrality to the double."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.graph import (
        hyperball,
    )

    cases = [
        # directed chain: harmonic_in(d) = 1 + 1/2 + 1/3
        [("a", "b"), ("b", "c"), ("c", "d")],
        # star out of a: each leaf gets exactly 1, a gets 0
        [("a", "b"), ("a", "c"), ("a", "d")],
        # diamond with a shortcut (multiple shortest paths)
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d")],
        # cycle: every node reaches every other
        [("a", "b"), ("b", "c"), ("c", "a")],
    ]
    for edge_list in cases:
        exact_h, exact_r = _exact_harmonic(edge_list, max_t=6)
        got = {
            r["node"]: (r["harmonic"], r["reach"])
            for r in hyperball(
                spark.createDataFrame(edge_list, "src string, dst string"),
                max_t=6,
            ).collect()
        }
        assert set(got) == set(exact_h)
        for v in exact_h:
            assert got[v][0] == pytest.approx(exact_h[v], abs=1e-9), (
                edge_list, v)
            assert got[v][1] == pytest.approx(exact_r[v], abs=1e-9)


def test_hyperball_horizon_truncation_and_determinism(spark):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.graph import (
        hyperball,
    )

    chain = [(f"n{i}", f"n{i+1}") for i in range(8)]
    edges = spark.createDataFrame(chain, "src string, dst string")
    exact_h, _ = _exact_harmonic(chain, max_t=3)
    got = {
        r["node"]: r["harmonic"]
        for r in hyperball(edges, max_t=3).collect()
    }
    assert got == pytest.approx(exact_h)
    # deterministic: second run bit-identical
    again = {
        r["node"]: r["harmonic"]
        for r in hyperball(edges, max_t=3).collect()
    }
    assert got == again


def test_hyperball_estimates_within_sketch_error_on_dense_graph(spark):
    """A bipartite 60x40 complete-ish graph: in-reach of every right
    node is all left nodes at distance 1 -> harmonic == reach == 60.
    Cardinalities stay in coupon-exact range; tolerance is loose to
    stay honest about the sketch contract."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.graph import (
        hyperball,
    )

    edge_list = [
        (f"l{i}", f"r{j}") for i in range(60) for j in range(40)
    ]
    got = hyperball(
        spark.createDataFrame(edge_list, "src string, dst string"),
        max_t=2,
    ).collect()
    for r in got:
        if r["node"].startswith("r"):
            assert r["harmonic"] == pytest.approx(60.0, rel=0.05)
            assert r["reach"] == pytest.approx(60.0, rel=0.05)
        else:
            assert r["harmonic"] == pytest.approx(0.0, abs=1e-9)


def test_centrality_cli_writes_fused_node_signals(
    spark, tmp_path, capsys, monkeypatch
):
    """Production path: --mode centrality over an edge parquet emits
    (node, rank, trustrank, harmonic, reach) matching the operators
    run directly."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import run_pipeline
    from travelpulse_spark_stream_tourism_analytics_spark.operators.graph import (
        hyperball,
        pagerank,
    )

    triples = [
        ("a", "b", 2), ("b", "a", 2),
        ("b", "c", 1), ("c", "b", 1),
        ("c", "a", 4), ("a", "c", 4),
        ("c", "d", 3), ("d", "c", 3),
    ]
    edges_path = str(tmp_path / "edges")
    seeds_path = str(tmp_path / "seeds")
    out = str(tmp_path / "signals")
    edges = spark.createDataFrame(triples, "src string, dst string, w long")
    edges.write.parquet(edges_path)
    spark.createDataFrame([("a",)], "node string").write.parquet(seeds_path)

    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "centrality", "--path", edges_path,
         "--out", out, "--seeds", seeds_path, "--iterations", "3",
         "--max-t", "4"],
    )
    run_pipeline.main()
    assert ">>> centrality;" in capsys.readouterr().out

    got = {
        r["node"]: r for r in spark.read.parquet(out).collect()
    }
    assert set(got) == {"a", "b", "c", "d"}
    pr = {r["node"]: r["rank"] for r in pagerank(edges, iterations=3).collect()}
    tr = {
        r["node"]: r["rank"]
        for r in pagerank(
            edges, iterations=3,
            seeds=spark.createDataFrame([("a",)], "node string"),
            cache_site="test.cli.tr",
        ).collect()
    }
    hb = {
        r["node"]: (r["harmonic"], r["reach"])
        for r in hyperball(edges, max_t=4).collect()
    }
    for v in got:
        assert got[v]["rank"] == pr[v]
        assert got[v]["trustrank"] == tr[v]
        assert got[v]["harmonic"] == hb[v][0]
        assert got[v]["reach"] == hb[v][1]


def _py_lpa(edge_list, iterations, seeds=None):
    """Straight-line synchronous LPA reference (same tie-break)."""
    from collections import defaultdict

    nodes = set()
    inc = defaultdict(list)  # dst -> [(src, w)]
    for s, d, w in edge_list:
        nodes.update((s, d))
        inc[d].append((s, w))
    labels = {v: v for v in nodes}
    clamped = set()
    if seeds:
        for v, lab in seeds.items():
            labels[v] = lab
            clamped.add(v)
    for _ in range(iterations):
        nxt = dict(labels)
        for v in nodes:
            if v in clamped or not inc[v]:
                continue
            tally = defaultdict(int)
            for s, w in inc[v]:
                tally[labels[s]] += w
            top_w = max(tally.values())
            nxt[v] = min(l for l, w in tally.items() if w == top_w)
        labels = nxt
    return labels


def test_label_propagation_matches_reference_and_finds_communities(spark):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.graph import (
        label_propagation,
        undirect,
    )

    # two triangles bridged by one weak edge
    tri1 = [("a", "b", 2), ("b", "c", 2), ("a", "c", 2)]
    tri2 = [("x", "y", 2), ("y", "z", 2), ("x", "z", 2)]
    bridge = [("c", "x", 1)]
    edge_list = tri1 + tri2 + bridge
    edges = undirect(
        spark.createDataFrame(edge_list, "src string, dst string, w long")
    )
    undirected = [(s, d, w) for s, d, w in edge_list] + [
        (d, s, w) for s, d, w in edge_list
    ]
    for iters in (1, 3, 5):
        exact = _py_lpa(undirected, iters)
        got = {
            r["node"]: r["label"]
            for r in label_propagation(edges, iterations=iters).collect()
        }
        assert got == exact, iters
    # converged communities: each triangle shares one label
    final = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iterations=5).collect()
    }
    assert final["a"] == final["b"] == final["c"]
    assert final["x"] == final["y"] == final["z"]


def test_label_propagation_seeded_clamps_and_spreads(spark):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.graph import (
        label_propagation,
        undirect,
    )

    # path graph: good - n1 - n2 - n3 - spam
    path = [("good", "n1", 1), ("n1", "n2", 1), ("n2", "n3", 1),
            ("n3", "spam", 1)]
    edges = undirect(
        spark.createDataFrame(path, "src string, dst string, w long")
    )
    seeds = spark.createDataFrame(
        [("good", "L_GOOD"), ("spam", "L_SPAM")], "node string, label string"
    )
    undirected = path + [(d, s, w) for s, d, w in path]
    exact = _py_lpa(
        undirected, 4, seeds={"good": "L_GOOD", "spam": "L_SPAM"}
    )
    got = {
        r["node"]: r["label"]
        for r in label_propagation(edges, seeds=seeds, iterations=4).collect()
    }
    assert got == exact
    assert got["good"] == "L_GOOD" and got["spam"] == "L_SPAM"  # clamped
    # the propagated frontier reached the interior nodes
    assert got["n1"] in ("L_GOOD", "L_SPAM")
    # determinism across runs
    again = {
        r["node"]: r["label"]
        for r in label_propagation(edges, seeds=seeds, iterations=4).collect()
    }
    assert got == again


def test_pagerank_broadcast_and_shuffle_paths_are_bit_identical(spark):
    """The size-guarded join strategy (broadcast below the node
    threshold, shuffle above) must not change a single bit: per-dst
    sums are quantized-integer decimals, associative under any join
    order. Force both paths on the same graph and compare exactly."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.graph import (
        pagerank_multi,
    )

    triples = [
        ("a", "b", 2), ("b", "a", 2), ("b", "c", 1), ("c", "b", 1),
        ("c", "a", 4), ("a", "c", 4), ("c", "d", 3), ("d", "c", 3),
        ("d", "e", 7), ("e", "d", 7), ("e", "a", 1), ("a", "e", 1),
    ]
    edges = _edges_df(spark, triples)
    seeds = spark.createDataFrame([("a",), ("e",)], "node string")
    small = {
        r["node"]: (r["g"], r["t"])
        for r in pagerank_multi(
            edges, {"g": None, "t": seeds}, iterations=6,
            cache_site="strategy.small",  # default threshold: broadcast
        ).collect()
    }
    large = {
        r["node"]: (r["g"], r["t"])
        for r in pagerank_multi(
            edges, {"g": None, "t": seeds}, iterations=6,
            cache_site="strategy.large",
            broadcast_max_nodes=0,  # force the shuffle-join path
        ).collect()
    }
    assert small == large


def test_label_propagation_rejects_fractional_weights(spark):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.graph import (
        label_propagation,
    )

    edges = spark.createDataFrame(
        [("a", "b", 0.9), ("b", "a", 0.9)], "src string, dst string, w double"
    )
    with pytest.raises(ValueError, match="integral edge weights"):
        label_propagation(edges, iterations=1)


def test_centrality_cli_directed_sink_nodes_get_ranked(
    spark, tmp_path, capsys, monkeypatch
):
    """Regression (review finding): a directed edge file with sink
    nodes (dst never src) must still rank every node, and a seed list
    naming a sink must validate — round 6: via dangling='redistribute'
    (the textbook mass-conserving treatment), not self-loop patching."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import run_pipeline

    edges_path = str(tmp_path / "edges")
    seeds_path = str(tmp_path / "seeds")
    out = str(tmp_path / "sig")
    spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1)], "src string, dst string, w long"
    ).write.parquet(edges_path)  # c is a pure sink
    spark.createDataFrame([("c",)], "node string").write.parquet(seeds_path)

    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "centrality", "--path", edges_path,
         "--out", out, "--seeds", seeds_path, "--iterations", "2"],
    )
    run_pipeline.main()
    got = {r["node"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {"a", "b", "c"}
    for v in got.values():  # every node ranked, no NULL leakage
        assert v["rank"] is not None
        assert v["trustrank"] is not None
    assert got["c"]["trustrank"] > got["a"]["trustrank"]  # seed holds mass


def _brute_triangles(pairs):
    """Per-node triangle counts by brute-force enumeration."""
    from collections import defaultdict
    from itertools import combinations

    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    counts = defaultdict(int)
    nodes = sorted(adj)
    for p, q, r in combinations(nodes, 3):
        if q in adj[p] and r in adj[p] and r in adj[q]:
            counts[p] += 1
            counts[q] += 1
            counts[r] += 1
    return dict(counts)


def test_triangle_counts_exact_and_encoding_immune(spark):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.graph import (
        triangle_counts,
    )

    # K4: every node in 3 triangles; pendant node in none
    k4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
          ("c", "d"), ("d", "e")]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(
            spark.createDataFrame(k4, "src string, dst string")
        ).collect()
    }
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}  # e absent (0)

    # encoding immunity: duplicates, both directions, self-loops
    noisy = k4 + [("b", "a"), ("a", "b"), ("c", "c"), ("d", "c")]
    got2 = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(
            spark.createDataFrame(noisy, "src string, dst string")
        ).collect()
    }
    assert got2 == got

    # random graph vs brute force
    import random

    rng = random.Random(13)
    nodes = [f"n{i:02d}" for i in range(18)]
    pairs = [
        (a, b)
        for i, a in enumerate(nodes)
        for b in nodes[i + 1:]
        if rng.random() < 0.3
    ]
    exact = _brute_triangles(pairs)
    got3 = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(
            spark.createDataFrame(pairs, "src string, dst string")
        ).collect()
    }
    assert got3 == exact


def _brute_kcore(pairs, k):
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < k:
                for u in adj.pop(v):
                    adj[u].discard(v)
                changed = True
    return {v for v in adj if adj[v]}


def test_kcore_matches_reference_peeling(spark):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.graph import (
        kcore,
    )

    # K4 with a tail a-b-c hanging off: 3-core is exactly the K4
    k4 = [("p", "q"), ("p", "r"), ("p", "s"), ("q", "r"), ("q", "s"),
          ("r", "s"), ("s", "a"), ("a", "b"), ("b", "c")]
    got = {
        r["node"]
        for r in kcore(
            spark.createDataFrame(k4, "src string, dst string"), k=3
        ).collect()
    }
    assert got == {"p", "q", "r", "s"}

    # cascade: removing the tail drops a, then nothing else (2-core)
    got2 = {
        r["node"]
        for r in kcore(
            spark.createDataFrame(k4, "src string, dst string"), k=2
        ).collect()
    }
    assert got2 == _brute_kcore(k4, 2)

    # k above the max core: empty, schema intact
    empty = kcore(
        spark.createDataFrame(k4, "src string, dst string"), k=4
    )
    assert empty.columns == ["node"] and empty.count() == 0

    # self-loops must not keep a node alive
    loops = [("x", "x"), ("x", "y")]
    assert (
        kcore(
            spark.createDataFrame(loops, "src string, dst string"), k=2
        ).count()
        == 0
    )

    # random graph parity
    import random

    rng = random.Random(29)
    nodes = [f"v{i}" for i in range(24)]
    pairs = [
        (a, b)
        for i, a in enumerate(nodes)
        for b in nodes[i + 1:]
        if rng.random() < 0.18
    ]
    for k in (2, 3, 4):
        got = {
            r["node"]
            for r in kcore(
                spark.createDataFrame(pairs, "src string, dst string"), k=k
            ).collect()
        }
        assert got == _brute_kcore(pairs, k), k
