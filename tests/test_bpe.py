"""Distributed BPE tokenizer (round 5, operators/bpe.py): the
Spark-iterative trainer is pinned against an independent pure-Python
reference implementation, the merge-application fold against the
standard left-to-right convention, and the Arrow-batched encoder
against per-word reference encodes. The trainer's round-1 pair
aggregation additionally carries a full DuckDB oracle as the
docs_top_terms 'bpe_pair' branch."""

from __future__ import annotations

import os

import pytest


def ref_train_bpe(word_weights: dict, n_merges: int, min_count: int = 2):
    """Independent dict-based BPE trainer: max-count pair per round,
    ties to the lexicographically smallest (left, right), merges
    applied left-to-right non-overlapping."""
    syms = [(list(w), c) for w, c in word_weights.items()]
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for s, c in syms:
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + c
        if not counts:
            break
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best[1] < min_count:
            break
        (left, right), _c = best
        merges.append((left, right))
        new_syms = []
        for s, c in syms:
            out, i = [], 0
            while i < len(s):
                if i < len(s) - 1 and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            new_syms.append((out, c))
        syms = new_syms
    return merges


CORPUS = [
    (0, "low low low low low"),
    (1, "lower lower newer newer newer"),
    (2, "newest widest widest"),
    (3, "the new low and the newest of the lower"),
]


def _word_weights(rows):
    import re

    w: dict = {}
    for _i, t in rows:
        for word in re.split(r"[^a-z0-9]+", t.lower()):
            if word:
                w[word] = w.get(word, 0) + 1
    return w


def test_train_bpe_matches_reference_trainer(spark):
    from travelpulse_spark_stream_tourism_analytics_spark.operators.bpe import (
        train_bpe,
    )

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = train_bpe(docs, n_merges=12)
    want = ref_train_bpe(_word_weights(CORPUS), 12)
    assert got == want
    assert len(got) >= 8  # the corpus genuinely supports many merges
    # deterministic across runs
    assert train_bpe(docs, n_merges=12) == got


def test_apply_merge_fold_left_to_right_convention(spark):
    """'aaa' under merge (a, a) -> ['aa', 'a']: left-to-right
    NON-overlapping, the standard BPE behavior — a right-biased or
    overlapping fold would give ['a', 'aa'] or crash."""
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.bpe import (
        apply_merge,
        chars_of,
    )

    df = spark.createDataFrame(
        [("aaa",), ("aaaa",), ("baaab",), ("",)], "w string"
    )
    out = {
        r["w"]: list(r["m"])
        for r in df.select(
            "w", apply_merge(chars_of(F.col("w")), "a", "a").alias("m")
        ).collect()
    }
    assert out["aaa"] == ["aa", "a"]
    assert out["aaaa"] == ["aa", "aa"]
    assert out["baaab"] == ["b", "aa", "a", "b"]
    assert out[""] == []


def test_bpe_encode_matches_reference_and_roundtrips(spark):
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.bpe import (
        bpe_encode,
        encode_word,
        train_bpe,
    )

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = train_bpe(docs, n_merges=12)
    ranks = {p: i for i, p in enumerate(merges)}
    rows = {
        r["doc_id"]: r for r in bpe_encode(docs, merges).collect()
    }
    import re

    for doc_id, text in CORPUS:
        words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        want = [t for w in words for t in encode_word(w, ranks)]
        assert list(rows[doc_id]["tokens"]) == want
        # lossless: tokens concatenate back to the word stream
        assert "".join(rows[doc_id]["tokens"]) == "".join(words)
        assert rows[doc_id]["n_bpe_tokens"] == len(want)
    # a frequent word compresses to ONE token
    assert "low" in rows[0]["tokens"]


def test_bpe_trained_tokens_compress_vs_chars(spark):
    """The point of training: learned merges yield strictly fewer
    tokens than character splitting on the training corpus."""
    from pyspark.sql import functions as F

    from travelpulse_spark_stream_tourism_analytics_spark.operators.bpe import (
        bpe_encode,
        train_bpe,
    )

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = train_bpe(docs, n_merges=12)
    n_tok = (
        bpe_encode(docs, merges)
        .agg(F.sum("n_bpe_tokens"))
        .collect()[0][0]
    )
    n_chars = (
        bpe_encode(docs, [])
        .agg(F.sum("n_bpe_tokens"))
        .collect()[0][0]
    )
    assert n_tok < n_chars


def test_bpe_model_artifact_roundtrip_and_id_encoding(spark, tmp_path):
    """train_bpe_model -> save -> load -> bpe_encode_ids: ids decode
    back to the exact token stream of the string encoder; unseen
    symbols map to <unk> (id 0)."""
    from travelpulse_spark_stream_tourism_analytics_spark.operators.bpe import (
        bpe_encode,
        bpe_encode_ids,
        load_bpe_model,
        save_bpe_model,
        train_bpe_model,
    )

    docs = spark.createDataFrame(
        [(i, "the lowest lower newest newer widest wider " * 3)
         for i in range(4)]
        + [(9, "the newest lowest")],
        "doc_id long, text string",
    )
    model = train_bpe_model(docs, n_merges=30, min_count=2)
    assert model["vocab"][0] == "<unk>"
    assert len(model["vocab"]) > len(model["merges"])  # alphabet included

    p = str(tmp_path / "bpe.json")
    save_bpe_model(model, p)
    loaded = load_bpe_model(p)
    assert loaded["vocab"] == model["vocab"]
    assert [tuple(m) for m in model["merges"]] == loaded["merges"]

    ids_rows = {
        r["doc_id"]: r["input_ids"]
        for r in bpe_encode_ids(docs, loaded).collect()
    }
    tok_rows = {
        r["doc_id"]: r["tokens"]
        for r in bpe_encode(docs, loaded["merges"]).collect()
    }
    vocab = loaded["vocab"]
    for did, ids in ids_rows.items():
        assert [vocab[i] for i in ids] == tok_rows[did]
        assert 0 not in ids  # corpus-only text: no <unk>

    # unseen alphabet -> <unk>
    oov = spark.createDataFrame([(1, "zzz�zzz")], "doc_id long, text string")
    got = bpe_encode_ids(oov, loaded).collect()[0]["input_ids"]
    assert got and all(i == 0 or vocab[i] != "<unk>" for i in got)
    assert any(i == 0 for i in got) or "z" in vocab


def test_train_bpe_and_curate_emit_input_ids_cli(spark, tmp_path, capsys, monkeypatch):
    """Production path: --mode train-bpe then --mode curate --bpe-model
    gives packed samples carrying input_ids consistent with chunk_text."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import run_pipeline
    from travelpulse_spark_stream_tourism_analytics_spark.operators.bpe import (
        encode_word,
        load_bpe_model,
        _split_words,
    )

    model_path = str(tmp_path / "bpe.json")
    out_dir = str(tmp_path / "curated")
    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "train-bpe",
         "--path", "/root/testdata/sf0.001", "--out", model_path,
         "--n-merges", "50"],
    )
    run_pipeline.main()
    assert ">>> bpe trained; " in capsys.readouterr().out

    monkeypatch.setattr(
        sys, "argv",
        ["run_pipeline.py", "--mode", "curate",
         "--path", "/root/testdata/sf0.001", "--out", out_dir,
         "--bpe-model", model_path],
    )
    run_pipeline.main()
    assert ">>> curated; " in capsys.readouterr().out

    model = load_bpe_model(model_path)
    ranks = {tuple(m): i for i, m in enumerate(model["merges"])}
    ids = {t: i for i, t in enumerate(model["vocab"])}
    out = spark.read.parquet(out_dir)
    assert "input_ids" in out.columns
    sample = out.limit(20).collect()
    assert sample
    for r in sample:
        want = []
        for w in _split_words(r["chunk_text"]):
            want.extend(ids.get(s, 0) for s in encode_word(w, ranks))
        assert r["input_ids"] == want
