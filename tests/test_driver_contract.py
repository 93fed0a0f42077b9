"""Driver-contract invariants: the properties the grading driver
depends on, pinned so a refactor cannot silently break them."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_catalog_keys_and_size():
    """queries() and oracle_sql() expose the SAME keys, exactly the 51
    deliberate entries of the round-8 correctness gate (50 + the
    graph_rank_entities split-out, VERDICT r7 item 4) — a mismatch or
    accidental growth would silently change the gate."""
    import __spark_entry__ as E

    q, o = E.queries(), E.oracle_sql()
    assert set(q) == set(o)
    assert len(q) == 51
    assert "graph_rank_entities" in q


def test_branch_tagged_entries_expose_expected_branches(spark):
    """Every branch/variant tag that bench.py times (and COVERAGE.md
    documents) actually exists in the entry's output — renaming a
    branch would otherwise silently turn its bench timing into an
    empty-plan measurement."""
    from bench import BRANCHES

    import __spark_entry__ as E

    q = E.queries()
    for name, (col, tags) in BRANCHES.items():
        got = {
            r[col]
            for r in q[name](spark, SF_SMOKE).select(col).distinct().collect()
        }
        assert set(tags) <= got, (name, got)


def test_headline_entries_are_all_resolvable(spark):
    """Every bench HEADLINE name resolves to a catalog entry or an
    EXTRA surface and yields a non-degenerate DataFrame."""
    from bench import EXTRA, HEADLINE

    import __spark_entry__ as E

    q = E.queries()
    for name in HEADLINE:
        fn = EXTRA.get(name) or q[name]
        df = fn(spark, SF_SMOKE)
        assert len(df.columns) > 0
