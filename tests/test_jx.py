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


def test_scalar_groupby_and_edges_listwrap(frames):
    """reference _normalize_groupby/_normalize_edges listwrap a bare scalar
    clause (vendor/jx_base/query.py); without it "g" iterates char-by-char."""
    out = jx.run(
        {"from": "t", "groupby": "g",
         "select": {"aggregate": "count", "name": "n"}, "sort": "g"},
        frames,
    )
    assert [(r["g"], r["n"]) for r in out.collect()] == [
        ("x", 2), ("y", 2), ("z", 1)]
    e = jx.run(
        {"from": "t",
         "edges": {"name": "vbin", "value": "v",
                   "domain": {"type": "range", "interval": 100}},
         "select": {"aggregate": "count", "name": "n"}, "sort": "vbin"},
        frames,
    )
    assert [(r["vbin"], r["n"]) for r in e.collect()] == [(None, 1), (0, 4)]


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


def test_range_date_union_not_right_type_ops(frames):
    """RangeOp (expressions.py:2763), DateOp (:840), UnionOp (:2908),
    NotRightOp (:2498), type casts + Is* checks (:1529-1755)."""
    out = jx.run(
        {
            "from": "t",
            "where": {"range": {"i": {"gte": 2, "lt": 5}}},
            "select": [
                "i",
                {"name": "nr", "value": {"not_right": {"g": 0}}},
                {"name": "nr1", "value": {"not_right": {"g": 1}}},
                {"name": "u", "value": {"union": ["g", "tag", {"literal": "z"}]}},
                {"name": "num", "value": {"number": "i"}},
                {"name": "is_n", "value": {"is_number": {"string": "i"}}},
                {"name": "is_i", "value": {"is_integer": "v"}},
            ],
            "sort": "i",
        },
        frames,
    )
    rows = out.collect()
    assert [r["i"] for r in rows] == [2, 3, 4]
    assert [r["nr"] for r in rows] == ["y", "x", "y"]
    assert [r["nr1"] for r in rows] == ["", "", ""]
    assert rows[0]["u"] == ["y", "p", "z"]           # set-union, nulls dropped
    assert rows[2]["u"] == ["y", "p", "z"]
    assert rows[1]["u"] == ["x", "q", "z"]
    assert all(isinstance(r["num"], float) for r in rows)
    assert all(r["is_n"] for r in rows)               # "2" casts to number
    assert rows[0]["is_i"] is True                    # 20.0 is integral
    assert rows[2]["is_i"] is False                   # missing is not integer


def test_date_literal_filter(spark):
    df = spark.createDataFrame(
        [(1, 1704067200.0), (2, 1706745600.0)], "id long, t double"
    )  # 2024-01-01, 2024-02-01 as unix seconds
    out = jx.run(
        {"from": "x", "where": {"gte": {"t": {"date": "2024-02-01"}}},
         "select": ["id"]},
        {"x": df},
    )
    # DateOp literal compiles to unix seconds (expressions.py:840-855)
    assert [r["id"] for r in out.collect()] == [2]


def test_edges_dense_set_domain(frames):
    """Explicit SetDomain partitions -> dense output incl. EMPTY buckets and
    the allowNulls bucket (domains.py:366; Matrix fill aggs.py:49-55)."""
    out = jx.run(
        {
            "from": "t",
            "edges": [{"name": "g", "value": "g",
                       "domain": {"type": "set", "partitions": ["x", "y", "w"]}}],
            "select": [{"name": "n", "aggregate": "count"},
                       {"name": "sv", "value": "v", "aggregate": "sum"}],
            "sort": "g",
        },
        frames,
    )
    got = [(r["g"], r["n"], r["sv"]) for r in out.collect()]
    # null bucket = the z row (out of domain); w = empty bucket, count 0
    assert got == [(None, 1, 50.0), ("w", 0, None), ("x", 2, 40.0), ("y", 2, 20.0)]

    # allowNulls=False drops the null bucket
    out2 = jx.run(
        {
            "from": "t",
            "edges": [{"name": "g", "value": "g", "allowNulls": False,
                       "domain": {"type": "set", "partitions": ["x", "y", "w"]}}],
            "select": {"name": "n", "aggregate": "count"},
            "sort": "g",
        },
        frames,
    )
    assert [(r["g"], r["n"]) for r in out2.collect()] == [("w", 0), ("x", 2), ("y", 2)]


def test_edges_dense_range_domain(frames):
    out = jx.run(
        {
            "from": "t",
            "edges": [{"name": "vbin", "value": "v",
                       "domain": {"type": "range", "interval": 20,
                                  "min": 0, "max": 80}}],
            "select": {"name": "n", "aggregate": "count"},
            "sort": "vbin",
        },
        frames,
    )
    got = [(r["vbin"], r["n"]) for r in out.collect()]
    # 10,20 -> bins 0,20; 30 -> 20; 50 -> 40; None -> null bucket; 60 empty
    assert got == [(None, 1), (0.0, 1), (20.0, 2), (40.0, 1), (60.0, 0)]


def test_having_clause(frames):
    out = jx.run(
        {
            "from": "t",
            "groupby": ["g"],
            "select": [{"name": "n", "aggregate": "count"},
                       {"name": "mx", "value": "i", "aggregate": "max"}],
            "having": {"gte": {"n": 2}},
            "sort": "g",
        },
        frames,
    )
    assert [(r["g"], r["n"]) for r in out.collect()] == [("x", 2), ("y", 2)]


def test_window_list_and_where(frames):
    """list accumulator over a sorted prefix window + window where clause
    (windows.py:305 list; query.py:605 window where)."""
    out = jx.run(
        {
            "from": "t",
            "window": [
                {"name": "seen", "edges": [], "sort": "i", "aggregate": "list",
                 "value": "g", "range": {"max": 1}},
                {"name": "big_sum", "edges": [], "sort": "i", "aggregate": "sum",
                 "value": "i", "where": {"gte": {"i": 3}},
                 "range": {"max": 1}},
            ],
            "select": ["i", "seen", "big_sum"],
            "sort": "i",
        },
        frames,
    )
    rows = out.collect()
    assert rows[0]["seen"] == ["x"] and rows[2]["seen"] == ["x", "y", "x"]
    # only i >= 3 contribute: prefix sums 0,0,3,7,12 (null -> None for first)
    assert [r["big_sum"] for r in rows] == [None, None, 3, 7, 12]


def test_nested_array_dive(spark):
    """Dot path through array<struct> auto-explodes (drill_filter analog,
    vendor/jx_python/jx.py:640-912)."""
    df = spark.createDataFrame(
        [(1, [(10, "a"), (20, "b")]), (2, [(30, "c")]), (3, [])],
        "id long, items array<struct<qty:long, tag:string>>",
    )
    out = jx.run(
        {
            "from": "t",
            "where": {"gte": {"items.qty": 20}},
            "select": ["id", {"name": "qty", "value": "items.qty"},
                       {"name": "tag", "value": "items.tag"}],
            "sort": ["id", "qty"],
        },
        {"t": df},
    )
    got = [(r["id"], r["qty"], r["tag"]) for r in out.collect()]
    assert got == [(1, 20, "b"), (2, 30, "c")]

    # two-level dive: array<struct<...array<struct>>>
    df2 = spark.createDataFrame(
        [(1, [([ (5, ), (7,) ],)]), (2, [([ (9,) ],)])],
        "id long, outer array<struct<inner:array<struct<x:long>>>>",
    )
    out2 = jx.run(
        {"from": "t", "select": ["id", {"name": "x", "value": "outer.inner.x"}],
         "sort": ["id", "x"]},
        {"t": df2},
    )
    assert [(r["id"], r["x"]) for r in out2.collect()] == [(1, 5), (1, 7), (2, 9)]


def test_edges_dense_float_interval(spark):
    """Non-integer interval: bucket values must come from the SAME single
    multiply (k*interval) the binning expression uses — repeated float
    addition (0.1 added 8 times = 0.7999999999999999) silently dropped
    observed groups from the dense join."""
    df = spark.createDataFrame(
        [(0.05,), (0.85,), (0.85,), (0.31,)], "v double"
    )
    out = jx.run(
        {
            "from": "t",
            "edges": [{"name": "b", "value": "v",
                       "domain": {"type": "range", "interval": 0.1,
                                  "min": 0.0, "max": 1.0}}],
            "select": {"name": "n", "aggregate": "count"},
            "sort": "b",
        },
        {"t": df},
    )
    got = {r["b"]: r["n"] for r in out.collect()}
    assert got[0.8] == 2          # the drift victim: 8*0.1 bucket
    assert got[0.30000000000000004] == 1  # float64 3*0.1, same on both sides
    assert sum(got.values()) == 4
    assert len(got) == 11         # 10 buckets + null bucket, all present


def test_time_domain_one_sided_bound(spark):
    """Time edge with only min (or only max): the bound must still apply
    (out-of-domain rows -> null bucket), mirroring the numeric domain."""
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 5),), (dt.datetime(2024, 2, 7),),
         (dt.datetime(2023, 12, 30),)],
        "ts timestamp",
    )
    out = jx.run(
        {
            "from": "t",
            "edges": [{"name": "m", "value": "ts",
                       "domain": {"type": "time", "interval": "month",
                                  "min": "2024-01-01"}}],
            "select": {"name": "n", "aggregate": "count"},
            "sort": "m",
        },
        {"t": df},
    )
    got = [(r["m"], r["n"]) for r in out.collect()]
    assert got[0] == (None, 1)  # 2023-12-30 is below min -> null bucket
    assert len(got) == 3

    out2 = jx.run(
        {
            "from": "t",
            "edges": [{"name": "m", "value": "ts",
                       "domain": {"type": "time", "interval": "month",
                                  "max": "2024-02-01"}}],
            "select": {"name": "n", "aggregate": "count"},
            "sort": "m",
        },
        {"t": df},
    )
    got2 = [(r["m"], r["n"]) for r in out2.collect()]
    assert got2[0] == (None, 1)  # 2024-02-07 is past max -> null bucket
    assert len(got2) == 3


def test_date_literal_forms():
    """mo_times literal breadth (dates.py:272-434): numeric/milli unix,
    ISO with zone, now/today/eod relative expressions."""
    jx.NOW_UNIX = 1706750000.0  # 2024-02-01 01:13:20 UTC
    try:
        p = jx._parse_date_unix
        assert p(1704067200) == 1704067200.0
        assert p(1704067200000) == 1704067200.0          # ms heuristic
        assert p("1704067200") == 1704067200.0           # digit string
        assert p("2024-01-01T00:00:00Z") == 1704067200.0
        assert p("2024-01-01T02:00:00+02:00") == 1704067200.0
        assert p("2024-01-01T00:00:00.500Z") == 1704067200.5
        assert p("now") == 1706750000.0
        assert p("today") == 1706745600.0                # floor to day
        assert p("eod") == p("tomorrow") == 1706832000.0
        assert p("now-7day") == 1706750000.0 - 7 * 86400
        assert p("today+2week") == 1706745600.0 + 14 * 86400
        assert p("now-hour") == 1706750000.0 - 3600      # implicit count 1
        assert p("today-month") == 1704067200.0          # calendar month
        assert p("now - 1day + 2hour") == 1706750000.0 - 86400 + 7200
    finally:
        jx.NOW_UNIX = None


def test_date_month_arithmetic_clamps_month_end():
    """mo_times add_month clamps to the last valid day: Mar 31 - 1month is
    Feb 29 (2024 is a leap year), not a ValueError."""
    jx.NOW_UNIX = 1711843200.0  # 2024-03-31 00:00:00 UTC
    try:
        p = jx._parse_date_unix
        assert p("now-1month") == 1709164800.0   # 2024-02-29
        assert p("today-month") == 1709164800.0
        assert p("now+11month") == 1740700800.0  # 2025-02-28 (non-leap)
        assert p("now+1month") == 1714435200.0   # 2024-04-30 (31 -> 30)
    finally:
        jx.NOW_UNIX = None


def test_duration_seconds():
    assert jx._duration_seconds("6week") == 6 * 604800
    assert jx._duration_seconds("12hour") == 12 * 3600
    assert jx._duration_seconds("day") is None        # bare unit: calendar
    with pytest.raises(ValueError):
        jx._duration_seconds("3month")                # no fixed width


def test_counted_duration_time_domain(spark):
    """"2day" interval: numeric floor on the unix grid, dense output."""
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 5),), (dt.datetime(2024, 1, 2, 5),),
         (dt.datetime(2024, 1, 4, 1),)],
        "ts timestamp",
    )
    out = jx.run(
        {
            "from": "t",
            "edges": [{"name": "b", "value": "ts",
                       "domain": {"type": "time", "interval": "2day",
                                  "min": "2024-01-01", "max": "2024-01-07"}}],
            "select": {"name": "n", "aggregate": "count"},
            "sort": "b",
        },
        {"t": df},
    )
    got = [(r["b"], r["n"]) for r in out.collect()]
    # 2-day grid from epoch: 2023-12-31, 2024-01-02, 2024-01-04, 2024-01-06
    # all buckets intersecting [min, max) materialize; the 01-06 one is empty
    assert [n for _, n in got] == [0, 1, 1, 1, 0]
    assert got[0][0] is None


def test_counted_calendar_duration_time_domain(spark):
    """"2month" interval: months-since-year-0 grid (mo_times month algebra —
    no fixed second width), dense output with empty buckets materialized."""
    import datetime as dt

    df = spark.createDataFrame(
        [(dt.datetime(2023, 11, 15),), (dt.datetime(2024, 1, 2),),
         (dt.datetime(2024, 2, 28),), (dt.datetime(2024, 4, 30),)],
        "ts timestamp",
    )
    out = jx.run(
        {
            "from": "t",
            "edges": [{"name": "b", "value": "ts",
                       "domain": {"type": "time", "interval": "2month",
                                  "min": "2023-11-01", "max": "2024-07-01"}}],
            "select": {"name": "n", "aggregate": "count"},
            "sort": "b",
        },
        {"t": df},
    )
    got = [(r["b"], r["n"]) for r in out.collect()]
    # even-month grid: Nov'23, Jan'24, Mar'24, May'24 (empty but dense)
    assert got[0][0] is None and got[0][1] == 0
    assert [(b.strftime("%Y-%m"), n) for b, n in got[1:]] == [
        ("2023-11", 1), ("2024-01", 2), ("2024-03", 1), ("2024-05", 0),
    ]
    # quarters are 3-month calendar units
    assert jx._duration_months("6quarter") == 18
    assert jx._duration_months("2month") == 2
    assert jx._duration_months("6week") is None
    assert jx._duration_months("month") is None  # bare unit: date_trunc path


def test_range_domain_explicit_partitions(frames):
    """Explicit-partition RangeDomain (domains.py:655-689): labeled half-open
    intervals, holes bin to the null bucket, empty parts still materialize
    (dense), overlapping parts are rejected loudly."""
    out = jx.run(
        {"from": "t",
         "edges": [{"name": "band", "value": "i",
                    "domain": {"type": "range", "partitions": [
                        {"name": "low", "min": 0, "max": 3},
                        # hole at i=3..4
                        {"name": "high", "min": 5, "max": 10},
                        {"name": "huge", "min": 100, "max": 200},  # empty
                    ]}}],
         "select": {"name": "n", "aggregate": "count"}, "sort": "band"},
        frames,
    )
    got = {r["band"]: r["n"] for r in out.collect()}
    # i values 1..5: low={1,2}, hole={3,4}->null, high={5}, huge empty
    assert got == {None: 2, "low": 2, "high": 1, "huge": 0}
    with pytest.raises(ValueError, match="overlap"):
        jx.run(
            {"from": "t",
             "edges": [{"name": "b", "value": "i",
                        "domain": {"type": "range", "partitions": [
                            {"name": "a", "min": 0, "max": 5},
                            {"name": "b", "min": 4, "max": 8},
                        ]}}],
             "select": {"name": "n", "aggregate": "count"}},
            frames,
        )
    with pytest.raises(ValueError, match="key property"):
        jx.run(
            {"from": "t",
             "edges": [{"name": "b", "value": "i",
                        "domain": {"type": "range",
                                   "partitions": [{"min": 0, "max": 5}]}}],
             "select": {"name": "n", "aggregate": "count"}},
            frames,
        )


def test_multivalue_edge_groups_per_value(spark):
    """An edge on an array<scalar> value groups by each VALUE of the array
    (MultivalueDecoder, es52/decoders.py:452); rows with empty arrays land
    in the null bucket."""
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["b"]), (3, []), (4, ["a", "b", "b"])],
        "id long, tags array<string>",
    )
    out = jx.run(
        {"from": "t", "edges": ["tags"],
         "select": {"name": "n", "aggregate": "count"}, "sort": "tags"},
        {"t": df},
    )
    got = {r["tags"]: r["n"] for r in out.collect()}
    # every value occurrence counts (doc 4 contributes 2 to 'b')
    assert got == {None: 1, "a": 2, "b": 4}
    # ...and an aggregate over another column still sees the exploded rows
    out2 = jx.run(
        {"from": "t",
         "edges": [{"name": "tag", "value": "tags"}],
         "select": {"name": "s", "value": "id", "aggregate": "sum"},
         "sort": "tag"},
        {"t": df},
    )
    got2 = {r["tag"]: r["s"] for r in out2.collect()}
    assert got2 == {None: 3, "a": 5, "b": 11}
    # multivalue + explicit SetDomain: per-value binning composes with the
    # dense domain (out-of-domain values -> null bucket, empty parts kept)
    out3 = jx.run(
        {"from": "t",
         "edges": [{"name": "tag", "value": "tags",
                    "domain": {"type": "set", "partitions": ["a", "zz"]}}],
         "select": {"name": "n", "aggregate": "count"}},
        {"t": df},
    )
    got3 = {r["tag"]: r["n"] for r in out3.collect()}
    assert got3 == {"a": 2, "zz": 0, None: 5}  # 4 b-occurrences + 1 empty


def test_full_reference_registry_compiles(spark):
    """Completeness gate: every key of the reference's operator registry
    (vendor/jx_base/expressions.py:3239-3310, all 70 spellings incl.
    aliases) compiles through compile_expr — context-dependent ops (rows,
    offset) given their window/row context."""
    from pyspark.sql import Window as W

    samples = {
        "add": {"add": ["x", 1]}, "and": {"and": [True, True]},
        "basic.add": {"basic.add": ["x", 1]},
        "basic.mul": {"basic.mul": ["x", 2]},
        "between": {"between": {"x": [1, 2]}},
        "case": {"case": [{"when": True, "then": 1}, 0]},
        "coalesce": {"coalesce": ["x", 1]}, "concat": {"concat": ["x", "y"]},
        "count": {"count": ["x", "y"]}, "date": {"date": "2024-01-01"},
        "div": {"div": ["x", 2]}, "divide": {"divide": ["x", 2]},
        "eq": {"eq": {"x": 1}}, "exists": {"exists": "x"},
        "exp": {"exp": ["x", 2]}, "find": {"find": {"x": "a"}},
        "first": {"first": "x"}, "floor": {"floor": ["x", 2]},
        "from_unix": {"from_unix": "x"}, "get": {"get": ["x", 0]},
        "gt": {"gt": {"x": 1}}, "gte": {"gte": {"x": 1}},
        "in": {"in": {"x": [1, 2]}}, "instr": {"instr": {"x": "a"}},
        "is_number": {"is_number": "x"}, "is_string": {"is_string": "x"},
        "last": {"last": "x"}, "left": {"left": {"x": 2}},
        "length": {"length": "x"}, "literal": {"literal": 5},
        "lt": {"lt": {"x": 1}}, "lte": {"lte": {"x": 1}},
        "match_all": {"match_all": {}}, "max": {"max": ["x", "y"]},
        "minus": {"minus": ["x", 1]}, "missing": {"missing": "x"},
        "mod": {"mod": ["x", 2]}, "mul": {"mul": ["x", 2]},
        "mult": {"mult": ["x", 2]}, "multiply": {"multiply": ["x", 2]},
        "ne": {"ne": {"x": 1}}, "neq": {"neq": {"x": 1}},
        "not": {"not": {"eq": {"x": 1}}}, "not_left": {"not_left": {"x": 1}},
        "not_right": {"not_right": {"x": 1}}, "null": {"null": {}},
        "number": {"number": "x"}, "offset": {"offset": 0},
        "or": {"or": [True]}, "postfix": {"postfix": {"x": "a"}},
        "prefix": {"prefix": {"x": "a"}},
        "range": {"range": {"x": {"gte": 1, "lt": 2}}},
        "regex": {"regex": {"x": "a.*"}}, "regexp": {"regexp": {"x": "a.*"}},
        "right": {"right": {"x": 1}}, "rows": {"rows": ["x", -1]},
        "script": {"script": "1+1"},
        "select": {"select": [{"name": "a", "value": "x"}]},
        "split": {"split": {"x": ","}}, "string": {"string": "x"},
        "suffix": {"suffix": {"x": "a"}}, "sub": {"sub": ["x", 1]},
        "subtract": {"subtract": ["x", 1]}, "sum": {"sum": ["x", 1]},
        "term": {"term": {"x": 1}}, "terms": {"terms": {"x": [1]}},
        "tuple": {"tuple": ["x", "y"]}, "union": {"union": ["x", "y"]},
        "unix": {"unix": "x"},
        "when": {"when": {"eq": {"x": 1}}, "then": 1, "else": 0},
    }
    assert len(samples) == 70
    for op, expr in samples.items():
        env = None
        if op == "offset":
            env = {"__columns__": ["x", "y"]}
        elif op == "rows":
            env = {"__window__": W.orderBy("x")}
        jx.compile_expr(expr, env)  # must not raise


def test_object_edge_groups_by_whole_struct(spark):
    """An edge whose value is a whole OBJECT (struct) groups by the object's
    value — the ObjectDecoder semantics (es52/decoders.py:499); partitions
    are the distinct structs."""
    df = spark.createDataFrame(
        [(1, ("us", "web")), (2, ("us", "web")), (3, ("de", "app")),
         (4, (None, "web"))],
        "id long, ctx struct<country: string, channel: string>",
    )
    out = jx.run(
        {"from": "t", "edges": [{"name": "ctx", "value": "ctx"}],
         "select": {"name": "n", "aggregate": "count"}},
        {"t": df},
    )
    got = {tuple(r["ctx"]): r["n"] for r in out.collect()}
    assert got == {("us", "web"): 2, ("de", "app"): 1, (None, "web"): 1}
    # a struct BUILT by a select expression works as an edge value too
    out2 = jx.run(
        {"from": "t",
         "edges": [{"name": "k", "value": {"select": [
             {"name": "chan", "value": "ctx.channel"}]}}],
         "select": {"name": "n", "aggregate": "count"}},
        {"t": df},
    )
    got2 = {r["k"]["chan"]: r["n"] for r in out2.collect()}
    assert got2 == {"web": 3, "app": 1}


def test_select_expression_and_offset_op(frames):
    """SelectOp expression form (aliased struct literal, expressions.py:436)
    and OffsetOp positional row access (expressions.py:349)."""
    rows = jx.run({"from": "t", "select": [
        "i",
        {"name": "pair", "value": {"select": [
            {"name": "key", "value": "k"},
            {"name": "double_i", "value": {"mul": ["i", 2]}},
        ]}},
        # row columns are (k, g, i, v, tag): offset 2 = i, -1 = tag
        {"name": "third", "value": {"offset": 2}},
        {"name": "last", "value": {"offset": -1}},
        {"name": "oob", "value": {"offset": 99}},
    ], "sort": "i"}, frames).collect()
    r0 = rows[0]
    assert r0["pair"].asDict() == {"key": "a", "double_i": 2}
    assert [r["third"] for r in rows] == [1, 2, 3, 4, 5]
    assert rows[2]["last"] == "q"
    assert all(r["oob"] is None for r in rows)
    # offset outside run() has no row shape -> loud error
    with pytest.raises(ValueError, match="offset"):
        jx.compile_expr({"offset": 1})


def test_window_rows_op(frames):
    """RowsOp {"rows": [v, offset]} -> lag/lead inside a window clause
    (jx_base/expressions.py:384-409)."""
    out = jx.run(
        {
            "from": "t",
            "window": [
                {"name": "prev_i", "edges": ["g"], "sort": "i",
                 "value": {"rows": ["i", -1]}},
                {"name": "next_i", "edges": ["g"], "sort": "i",
                 "value": {"rows": {"i": 1}}},   # dict simple form
            ],
            "select": ["g", "i", "prev_i", "next_i"],
            "sort": ["g", "i"],
        },
        frames,
    )
    got = [(r["g"], r["i"], r["prev_i"], r["next_i"]) for r in out.collect()]
    assert got == [("x", 1, None, 3), ("x", 3, 1, None),
                   ("y", 2, None, 4), ("y", 4, 2, None), ("z", 5, None, None)]
    # rows outside a window clause is an error
    with pytest.raises(ValueError):
        jx.compile_expr({"rows": ["i", -1]})


def test_get_op(frames, spark):
    """GetOp (jx_base/expressions.py:412): successive derefs — int offsets
    index arrays Python-style (0-based, negative from the end), string
    offsets select struct fields; simple form {"get": {v: offset}}."""
    df = spark.createDataFrame(
        [(1, [10, 20, 30], {"a": 7, "b": [1, 2]})],
        "id long, arr array<long>, st struct<a: long, b: array<long>>",
    )
    fr = {"d": df}
    out = jx.run({"from": "d", "select": [
        {"name": "first", "value": {"get": ["arr", 0]}},
        {"name": "last", "value": {"get": ["arr", -1]}},
        {"name": "field", "value": {"get": ["st", "a"]}},
        {"name": "deep", "value": {"get": ["st", "b", 1]}},
        {"name": "simple", "value": {"get": {"arr": 1}}},
    ]}, fr).collect()[0]
    assert (out["first"], out["last"], out["field"], out["deep"],
            out["simple"]) == (10, 30, 7, 2, 20)
    with pytest.raises(ValueError):
        jx.compile_expr({"get": ["arr", 1.5]})

    # ragged arrays: out-of-range deref is MISSING (null), never an ANSI
    # error; dict simple form registers the variable for nested auto-dives
    ragged = spark.createDataFrame(
        [(1, [10, 20, 30]), (2, [5]), (3, [])], "id long, arr array<long>"
    )
    out2 = jx.run(
        {"from": "r", "select": [
            "id",
            {"name": "third", "value": {"get": ["arr", 2]}},
            {"name": "lastd", "value": {"get": {"arr": -1}}},
        ], "sort": "id"},
        {"r": ragged},
    ).collect()
    assert [(r["third"], r["lastd"]) for r in out2] == [
        (30, 30), (None, 5), (None, None)]

    nested = spark.createDataFrame(
        [(1, [{"tags": ["a", "b"]}, {"tags": ["c"]}])],
        "id long, items array<struct<tags: array<string>>>",
    )
    dive = jx.run(
        {"from": "n", "select": [
            {"name": "t0", "value": {"get": {"items.tags": 0}}}],
         "where": {"exists": "items.tags"}},
        {"n": nested},
    ).collect()
    assert sorted(r["t0"] for r in dive) == ["a", "c"]


def test_op_aliases_and_null_clauses(frames):
    """Registry aliases (jx_base/expressions.py:3239-3310) resolve to the
    same operators; add/mul honor the nulls/default clauses (BaseMultiOp:
    CONSERVATIVE any-missing->default vs DECISIVE all-missing->default)."""
    rows = jx.run({"from": "t", "select": [
        "i",
        {"name": "s", "value": {"sum": ["i", "i"]}},          # sum -> add
        {"name": "m", "value": {"mult": ["i", 3]}},           # mult -> mul
        {"name": "d", "value": {"divide": ["i", 2]}},         # divide -> div
        {"name": "z", "value": {"divide": ["i", 0]}},         # /0 -> null
        {"name": "cons", "value": {"add": ["v", 1], "default": -1}},
        {"name": "dec", "value": {"add": ["v", {"null": {}}], "nulls": True,
                                  "default": -1}},
    ], "sort": "i"}, frames).collect()
    by_i = {r["i"]: r for r in rows}
    assert by_i[1]["s"] == 2 and by_i[1]["m"] == 3 and by_i[2]["d"] == 1.0
    assert all(r["z"] is None for r in rows)
    # v is null on row i=4: conservative -> default; decisive ignores it
    assert by_i[4]["cons"] == -1 and by_i[1]["cons"] == 11.0
    assert by_i[4]["dec"] == -1 and by_i[1]["dec"] == 10.0

    a = jx.run({"from": "t", "where": {"term": {"g": "x"}}}, frames)
    b = jx.run({"from": "t", "where": {"terms": {"g": ["x", "y"]}}}, frames)
    c = jx.run({"from": "t", "where": {"match_all": {}}}, frames)
    assert a.count() == 2 and b.count() == 4 and c.count() == 5
    d = jx.run({"from": "t", "where": {"regexp": {"g": "x|z"}}}, frames)
    assert d.count() == 3


def test_first_last_empty_arrays_and_alias_drill(frames, spark):
    """first/last on an empty array are MISSING (null), not an ANSI index
    error; alias dict forms (term, binary math) register their variable for
    the nested auto-dive."""
    df = spark.createDataFrame(
        [(1, [10, 20]), (2, [])], "id long, arr array<long>"
    )
    out = jx.run({"from": "d", "select": [
        "id",
        {"name": "f", "value": {"first": "arr"}},
        {"name": "l", "value": {"last": "arr"}},
    ], "sort": "id"}, {"d": df}).collect()
    assert [(r["f"], r["l"]) for r in out] == [(10, 20), (None, None)]

    nested = spark.createDataFrame(
        [(1, [{"tag": "x"}, {"tag": "y"}])],
        "id long, items array<struct<tag: string>>",
    )
    hit = jx.run({"from": "n", "where": {"term": {"items.tag": "x"}}},
                 {"n": nested})
    assert hit.count() == 1
    with pytest.raises(ValueError, match="nulls"):
        jx.compile_expr({"sub": ["i", 1], "nulls": True})


def test_when_sibling_form_and_op_default_clauses(frames):
    """Canonical WhenOp serialization puts then/else as SIBLING keys
    (expressions.py:2795); default clauses on non-arithmetic ops replace a
    MISSING result (FindOp default); binary simple dict form {"div": {v: c}}
    carries BOTH operands; a zero divisor routes to the default."""
    rows = jx.run({"from": "t", "select": [
        "i",
        {"name": "w", "value": {"when": {"gt": {"i": 3}}, "then": 1,
                                "else": 0}},
        {"name": "f", "value": {"find": {"tag": "q"}, "default": -1}},
        {"name": "h", "value": {"div": {"i": 2}}},
        {"name": "z", "value": {"div": ["i", 0], "default": 99}},
    ], "sort": "i"}, frames).collect()
    by_i = {r["i"]: r for r in rows}
    assert [by_i[i]["w"] for i in (1, 2, 3, 4, 5)] == [0, 0, 0, 1, 1]
    assert by_i[3]["f"] == 0 and by_i[1]["f"] == -1  # tag=q found / missing
    assert by_i[4]["h"] == 2.0
    assert all(r["z"] == 99 for r in rows)  # /0 is missing -> default
    with pytest.raises(ValueError, match="nulls"):
        jx.compile_expr({"find": {"tag": "q"}, "nulls": True})
    # a FALSY nulls clause is the documented conservative default — accepted
    # as a no-op in the generic branch exactly as in the BaseMultiOp branch
    rows2 = jx.run({"from": "t", "select": [
        {"name": "f0", "value": {"find": {"tag": "q"}, "nulls": False,
                                 "default": -1}},
    ], "sort": "i"}, frames).collect()
    assert [r["f0"] for r in rows2] == [by_i[i]["f"] for i in sorted(by_i)]


def test_window_count_without_value(frames):
    """A value-less window aggregate counts rows per partition (a natural
    jx window) instead of crashing in F.count(None)."""
    out = jx.run({"from": "t", "window": {
        "name": "n", "edges": ["g"], "aggregate": "count"}}, frames).collect()
    got = {(r["g"], r["n"]) for r in out}
    assert got == {("x", 2), ("y", 2), ("z", 1)}


def test_time_domain_numeric_interval_string_bounds(spark):
    """Time domain with numeric-seconds interval and DATE-STRING bounds:
    _domain_parts must parse the bounds (it crashed in floor(str/int)); the
    dense output covers every hour bucket."""
    import datetime as dt

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 30)), (2, dt.datetime(2024, 1, 1, 2, 10))],
        "id long, ts timestamp",
    )
    out = jx.run({"from": "d", "edges": [
        {"name": "h", "value": "ts",
         "domain": {"type": "time", "interval": 3600,
                    "min": "2024-01-01", "max": "2024-01-01 03:00:00"}}],
        "select": {"name": "n", "aggregate": "count"}}, {"d": df}).collect()
    by_h = {r["h"]: r["n"] for r in out}
    base = jx._parse_date_unix("2024-01-01")
    # dense: all 3 hour buckets present, middle one zero-filled
    assert by_h[base] == 1 and by_h[base + 3600] == 0 and by_h[base + 7200] == 1


def test_zero_fill_unnamed_count_select(frames):
    """Zero-fill must key on the ACTUAL output column name (value/aggregate
    fallback), not only an explicit "name"."""
    out = jx.run({"from": "t", "edges": [
        {"name": "g", "value": "g",
         "domain": {"type": "set", "partitions": ["x", "y", "w"]}}],
        "select": {"value": "v", "aggregate": "count"}}, frames).collect()
    got = {r["g"]: r["v"] for r in out}
    assert got["w"] == 0  # empty bucket zero-fills though select is unnamed


def test_run_formatted_cube_with_groupby(frames):
    """format=cube with groupby keys: the keys become axes (leaving them as
    select matrices would last-write-wins-overwrite cells)."""
    cube = jx.run_formatted({
        "from": "t", "groupby": ["g"],
        "select": {"name": "n", "aggregate": "count"},
        "format": "cube",
    }, frames)
    assert [a["name"] for a in cube["edges"]] == ["g"]
    assert cube["edges"][0]["domain"]["partitions"] == ["x", "y", "z"]
    assert cube["data"]["n"] == [2, 2, 1, 0]  # null bucket last, zero-filled


def test_run_formatted_list_table_cube(frames):
    """Result shaping (jx_python/jx.py:106-115; es52/format.py): list is row
    dicts, table is header+rows, cube is per-select matrices indexed by edge
    partition with the null bucket LAST."""
    q = {
        "from": "t",
        "edges": [{"name": "g", "value": "g",
                   "domain": {"type": "set", "partitions": ["x", "y", "w"]}}],
        "select": [{"name": "n", "aggregate": "count"},
                   {"name": "sv", "value": "v", "aggregate": "sum"}],
        "sort": "g",
    }
    lst = jx.run_formatted(q, frames)
    assert lst["meta"]["format"] == "list" and len(lst["data"]) == 4
    assert all(set(r) == {"g", "n", "sv"} for r in lst["data"])

    tbl = jx.run_formatted({**q, "format": "table"}, frames)
    assert tbl["header"] == ["g", "n", "sv"]
    assert tbl["data"][-1] == ["y", 2, 20.0]  # sorted by g, nulls first

    cube = jx.run_formatted({**q, "format": "cube"}, frames)
    assert cube["meta"]["format"] == "cube"
    assert cube["edges"][0]["domain"]["partitions"] == ["x", "y", "w"]
    # matrices indexed by partition order, null bucket last, count zero-fill
    assert cube["data"]["n"] == [2, 2, 0, 1]
    assert cube["data"]["sv"] == [40.0, 20.0, None, 50.0]

    # two edges -> 2-D matrix; sparse second edge domain comes from the data
    q2 = {
        "from": "t",
        "edges": [{"name": "g", "value": "g", "allowNulls": False,
                   "domain": {"type": "set", "partitions": ["x", "y"]}},
                  {"name": "tag", "value": "tag"}],
        "select": {"name": "n", "aggregate": "count"},
    }
    cube2 = jx.run_formatted({**q2, "format": "cube"}, frames)
    assert cube2["edges"][1]["domain"]["partitions"] == ["p", "q"]
    # rows: (x,None)=1, (x,q)=1, (y,p)=2  ->  g-major, tag (p,q,null)-minor
    assert cube2["data"]["n"] == [[0, 1, 1], [2, 0, 0]]

    # run_formatted collect()s to the driver: an explicit limit=None (an
    # unbounded distributed result) must be refused, never OOM the driver
    with pytest.raises(ValueError, match="bounded limit"):
        jx.run_formatted({**q, "limit": None}, frames)
    # run() itself still honors limit=None (stays distributed)
    assert jx.run({"from": "t", "limit": None}, frames).count() == 5

    # no edges -> column-major (convert.list2cube on plain lists)
    flat = jx.run_formatted(
        {"from": "t", "select": ["g", "i"], "sort": "i", "format": "cube"},
        frames,
    )
    assert flat["data"]["i"] == [1, 2, 3, 4, 5]


def test_jx_query_over_converged_lake_table(spark, tmp_path):
    """End-to-end: journal -> CDC replay -> SnapshotTable -> jx-lite query,
    verified against a pandas aggregation of the same converged state."""
    from activedata_etl_spark.journal import write_journal
    from activedata_etl_spark.lake.table import SnapshotTable
    from activedata_etl_spark.streaming.replay import replay_journal

    jd, loc = str(tmp_path / "j"), str(tmp_path / "lake")
    write_journal(spark, 2048, jd)
    replay_journal(spark, jd, loc, chunk_events=1024)
    files = SnapshotTable(spark, loc).read()

    out = jx.run(
        {
            "from": "files",
            "where": {"exists": "content"},
            "groupby": ["repo"],
            "select": [
                {"name": "n_files", "aggregate": "count"},
                {"name": "n_langs", "value": "lang", "aggregate": "cardinality"},
                {"name": "max_seq", "value": "commit_seq", "aggregate": "max"},
            ],
            "sort": "repo",
        },
        {"files": files},
    )
    got = {r["repo"]: (r["n_files"], r["n_langs"], r["max_seq"])
           for r in out.collect()}

    pdf = files.toPandas()
    pdf = pdf[pdf["content"].notna()]
    expect = {
        repo: (
            len(g),
            g["lang"].dropna().nunique(),
            int(g["commit_seq"].max()),
        )
        for repo, g in pdf.groupby("repo")
    }
    assert got == expect
    assert "repo_hot" in got  # skewed hot repo survived the replay


def test_default_limit_reference_parity(spark, frames):
    """The SHIPPED default limit is the reference's DEFAULT_LIMIT=10
    (jx_base/query.py:29): a query with no limit clause returns 10 rows.
    run_formatted clamps any explicit numeric limit to MAX_LIMIT=10_000
    (QueryOp.wrap min(MAX_LIMIT, ...), query.py:213); run() honors explicit
    limits unclamped (engine extension — the result stays distributed)."""
    big = {"t": spark.range(25_000).toDF("i")}
    old = jx.DEFAULT_LIMIT
    jx.DEFAULT_LIMIT = 10  # the shipped value (conftest raises it suite-wide)
    try:
        assert jx.MAX_LIMIT == 10_000
        assert jx.run({"from": "t", "select": ["i"]}, big).count() == 10
        # explicit numeric limit: unclamped in the programmatic layer
        assert jx.run(
            {"from": "t", "select": ["i"], "limit": 12_000}, big
        ).count() == 12_000
        # explicit None: unbounded DataFrame (engine extension)
        assert jx.run(
            {"from": "t", "select": ["i"], "limit": None}, big
        ).count() == 25_000
        # presentation layer: no limit -> 10 rows; big limit -> clamped
        out = jx.run_formatted({"from": "t", "select": ["i"]}, big)
        assert len(out["data"]) == 10
        out = jx.run_formatted(
            {"from": "t", "select": ["i"], "limit": 12_000}, big
        )
        assert len(out["data"]) == 10_000
    finally:
        jx.DEFAULT_LIMIT = old


def test_unique_domain_edge(frames):
    """type:'unique' (UniqueDomain, vendor/jx_base/domains.py:636): every
    distinct value its own part, identity in/out, no dense fill — a sparse
    GROUP BY; declared partitions are irrelevant to it."""
    out = jx.run(
        {"from": "t",
         "edges": [{"name": "k", "value": "k", "domain": {"type": "unique"}}],
         "select": [{"name": "n", "aggregate": "count"}],
         "limit": None},
        frames,
    )
    got = {r["k"]: r["n"] for r in out.collect()}
    assert got == {"a": 2, "b": 2, None: 1}


def test_field_list_composite_edge(frames):
    """DimFieldListDecoder spelling (vendor/jx_elasticsearch/es52/
    decoders.py:672): an edge whose domain.dimension.fields lists several
    fields groups by the composite — one output column per field, named
    <edge>.<field>, null keys kept."""
    out = jx.run(
        {"from": "t",
         "edges": [{"name": "dim",
                    "domain": {"type": "set",
                               "dimension": {"fields": ["k", "g"]}}}],
         "select": [{"name": "n", "aggregate": "count"},
                    {"name": "sv", "value": "v", "aggregate": "sum"}],
         "limit": None},
        frames,
    )
    assert set(out.columns) == {"dim.k", "dim.g", "n", "sv"}
    got = {(r["dim.k"], r["dim.g"]): r["n"] for r in out.collect()}
    assert got == {("a", "x"): 1, ("a", "y"): 1, ("b", "x"): 1,
                   ("b", "y"): 1, (None, "z"): 1}
    # unnamed edge: plain field names as columns
    out2 = jx.run(
        {"from": "t",
         "edges": [{"domain": {"dimension": {"fields": ["k", "g"]}}}],
         "select": {"name": "n", "aggregate": "count"},
         "limit": None},
        frames,
    )
    assert {"k", "g", "n"} <= set(out2.columns)
    assert out2.count() == 5
