"""jx-lite query surface tests (jx.run analog, vendor/jx_python/jx.py:54-115)."""

from __future__ import annotations

import pytest

from activedata_etl_spark.plans import jx


@pytest.fixture(scope="module")
def frames(spark):
    rows = [
        ("a", "x", 1, 10.0, None),
        ("a", "y", 2, 20.0, "p"),
        ("b", "x", 3, 30.0, "q"),
        ("b", "y", 4, None, "p"),
        (None, "z", 5, 50.0, "p"),
    ]
    df = spark.createDataFrame(rows, "k string, g string, i long, v double, tag string")
    return {"t": df}


def test_filter_eq_null_safe(frames):
    out = jx.run({"from": "t", "where": {"eq": {"k": "a"}}, "select": ["i"]}, frames)
    assert sorted(r["i"] for r in out.collect()) == [1, 2]
    # eq with missing value never matches, never errors (EqOp null-safe)
    out = jx.run({"from": "t", "where": {"eq": {"k": "zzz"}}}, frames)
    assert out.count() == 0


def test_eq_membership_and_in(frames):
    a = jx.run({"from": "t", "where": {"eq": {"i": [1, 3]}}, "select": ["i"]}, frames)
    b = jx.run({"from": "t", "where": {"in": {"i": [1, 3]}}, "select": ["i"]}, frames)
    assert sorted(r["i"] for r in a.collect()) == [1, 3]
    assert sorted(r["i"] for r in b.collect()) == [1, 3]


def test_missing_exists(frames):
    m = jx.run({"from": "t", "where": {"missing": "v"}, "select": ["i"]}, frames)
    assert [r["i"] for r in m.collect()] == [4]
    e = jx.run({"from": "t", "where": {"exists": "k"}, "select": ["i"]}, frames)
    assert sorted(r["i"] for r in e.collect()) == [1, 2, 3, 4]


def test_groupby_aggregates(frames):
    out = jx.run(
        {
            "from": "t",
            "groupby": ["g"],
            "select": [
                {"aggregate": "count", "name": "n"},
                {"value": "v", "aggregate": "sum", "name": "sv"},
                {"value": "i", "aggregate": "max", "name": "mi"},
            ],
            "sort": "g",
        },
        frames,
    )
    got = [(r["g"], r["n"], r["sv"], r["mi"]) for r in out.collect()]
    assert got == [("x", 2, 40.0, 3), ("y", 2, 20.0, 4), ("z", 1, 50.0, 5)]


def test_edges_range_domain(frames):
    out = jx.run(
        {
            "from": "t",
            "edges": [
                {"name": "vbin", "value": "v",
                 "domain": {"type": "range", "interval": 25}}
            ],
            "select": {"aggregate": "count", "name": "n"},
            "sort": "vbin",
        },
        frames,
    )
    got = [(r["vbin"], r["n"]) for r in out.collect()]
    # nulls-least sort: the null-v row groups under null bin, sorted first
    assert got == [(None, 1), (0.0, 2), (25.0, 1), (50.0, 1)]


def test_expression_ops(frames):
    out = jx.run(
        {
            "from": "t",
            "where": {"and": [{"gte": {"i": 2}}, {"not": {"eq": {"g": "z"}}}]},
            "select": [
                {"name": "calc", "value": {"add": ["i", {"literal": 10}]}},
                {"name": "flo", "value": {"floor": [{"mul": ["i", {"literal": 7}]}, 10]}},
                {"name": "best", "value": {"coalesce": ["v", {"literal": -1}]}},
            ],
            "sort": "calc",
        },
        frames,
    )
    got = [(r["calc"], r["flo"], r["best"]) for r in out.collect()]
    assert got == [(12, 10, 20.0), (13, 20, 30.0), (14, 20, -1.0)]


def test_when_case_strings(frames):
    out = jx.run(
        {
            "from": "t",
            "select": [
                "i",
                {"name": "cls",
                 "value": {"when": {"when": {"gt": {"i": 3}}, "then": {"literal": "big"},
                                    "else": {"literal": "small"}}}},
                {"name": "pfx", "value": {"prefix": {"g": "x"}}},
            ],
            "sort": "i",
        },
        frames,
    )
    got = [(r["cls"], r["pfx"]) for r in out.collect()]
    assert got == [("small", True), ("small", False), ("small", True),
                   ("big", False), ("big", False)]


def test_window_clause(frames):
    out = jx.run(
        {
            "from": "t",
            "window": {"name": "rn", "edges": ["g"], "sort": "i", "aggregate": "rownum"},
            "select": ["g", "i", "rn"],
            "sort": ["g", "i"],
        },
        frames,
    )
    got = [(r["g"], r["i"], r["rn"]) for r in out.collect()]
    assert got == [("x", 1, 1), ("x", 3, 2), ("y", 2, 1), ("y", 4, 2), ("z", 5, 1)]


def test_sort_nulls_least_and_limit(frames):
    out = jx.run({"from": "t", "select": ["k"], "sort": "k", "limit": 2}, frames)
    assert [r["k"] for r in out.collect()] == [None, "a"]


def test_subquery_from(frames):
    out = jx.run(
        {
            "from": {"from": "t", "where": {"gt": {"i": 1}}},
            "groupby": ["g"],
            "select": {"aggregate": "count", "name": "n"},
            "sort": "g",
        },
        frames,
    )
    assert [(r["g"], r["n"]) for r in out.collect()] == [("x", 1), ("y", 2), ("z", 1)]


def test_window_range_max_exclusive(frames):
    """jx window range max is EXCLUSIVE (jx.py:1003-1008): {"max": 0}
    excludes the current row — sum of strictly-preceding rows."""
    out = jx.run(
        {
            "from": "t",
            "window": {"name": "prev_sum", "edges": ["g"], "sort": "i",
                       "aggregate": "sum", "value": "i",
                       "range": {"min": -2, "max": 0}},
            "select": ["g", "i", "prev_sum"],
            "sort": ["g", "i"],
        },
        frames,
    )
    got = [(r["g"], r["i"], r["prev_sum"]) for r in out.collect()]
    # g=x rows i=1,3: prev of 1 -> None, prev of 3 -> 1
    assert got == [("x", 1, None), ("x", 3, 1),
                   ("y", 2, None), ("y", 4, 2), ("z", 5, None)]


def test_range_domain_one_sided_bound(frames):
    """min set, max omitted: bounded below only (a null literal bound used
    to NULL the whole predicate and bin everything to null)."""
    out = jx.run(
        {
            "from": "t",
            "edges": [{"name": "vbin", "value": "v",
                       "domain": {"type": "range", "interval": 25, "min": 20}}],
            "select": {"aggregate": "count", "name": "n"},
            "sort": "vbin",
        },
        frames,
    )
    got = [(r["vbin"], r["n"]) for r in out.collect()]
    # v=10 (below min) and v=None both bin to null; 20,30 -> 25 bin? no:
    # floor(20/25)*25=0, floor(30/25)*25=25, floor(50/25)*25=50
    assert got == [(None, 2), (0.0, 1), (25.0, 1), (50.0, 1)]
