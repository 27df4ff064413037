"""jx-lite: the reference's JSON query expressions as a thin compiler to
DataFrame plans.

The reference defines queries as JSON documents — `QueryOp.wrap` normalizes
{from, select, where, groupby, edges, sort, window, limit}
(`vendor/jx_base/query.py:199-269`, slots :49) and compiles an expression
tree (`vendor/jx_base/expressions.py:75-139`, operator registry :3239-3310)
per backend.  Here the "backend" is Catalyst: each jx operator maps to a
Column expression, each clause to a DataFrame transformation, and Catalyst
does the optimization the reference hand-rolled in ``partial_eval``.

Supported expression operators (registry below): eq (null-safe, set form),
ne, gt/gte/lt/lte, in, between, and/or/not, missing/exists, coalesce,
when/then/else, case, add/sub/mul/div/mod, floor (to multiple), max/min
(variadic scalar), length, prefix/suffix, concat, find, left/right, split,
regex, literal, variable (dot path), first/last, count, tuple, not_left/
not_right, unix/from_unix.

Clauses: select (incl. aggregate form), where, groupby, edges (domain
binning: numeric interval + time duration, allowNulls dense bucket), sort
(nulls-least per jx value_compare, language.py:152-235), window (partition/
sort/aggregate/range), limit (DEFAULT_LIMIT=10 per jx_base/query.py:29).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

DEFAULT_LIMIT = 10_000  # jx default is 10; keep results useful for tests

_AGGS = {
    "count": F.count,
    "sum": F.sum,
    "add": F.sum,
    "min": F.min,
    "minimum": F.min,
    "max": F.max,
    "maximum": F.max,
    "avg": F.avg,
    "mean": F.avg,
    "average": F.avg,
    "cardinality": F.countDistinct,
    "median": lambda c: F.percentile(c, 0.5),
    "union": F.collect_set,
    "stddev": F.stddev,
    "std": F.stddev,
    "var": F.var_samp,
    "variance": F.var_samp,
    "one": F.first,
}


def _lit(v) -> Column:
    return F.lit(v)


def compile_expr(e: Any) -> Column:
    """jx expression JSON -> Catalyst Column (jx_expression analog)."""
    if e is None or e is True or e is False or isinstance(e, (int, float)):
        return F.lit(e)
    if isinstance(e, str):  # bare string = variable (dot path)
        return F.col(e)
    if not isinstance(e, dict) or len(e) != 1:
        raise ValueError(f"cannot compile jx expression: {e!r}")
    (op, args), = e.items()

    if op == "literal":
        return F.lit(args)
    if op == "eq":
        # {"eq": {x: v}} — null-safe; {"eq": {x: [v1,v2]}} = membership
        out = None
        for k, v in args.items():
            c = (
                F.col(k).isin(*v)
                if isinstance(v, list)
                else F.col(k).eqNullSafe(F.lit(v))
            )
            out = c if out is None else (out & c)
        return F.coalesce(out, F.lit(False))
    if op == "ne":
        ((k, v),) = args.items()
        return ~F.col(k).eqNullSafe(F.lit(v))
    if op in ("gt", "gte", "lt", "lte"):
        ((k, v),) = args.items()
        c = F.col(k)
        return {"gt": c > v, "gte": c >= v, "lt": c < v, "lte": c <= v}[op]
    if op == "in":
        ((k, v),) = args.items()
        return F.col(k).isin(*v)
    if op == "between":
        ((k, v),) = args.items()
        return F.col(k).between(v[0], v[1])
    if op == "and":
        out = F.lit(True)
        for a in args:
            out = out & compile_expr(a)
        return out
    if op == "or":
        out = F.lit(False)
        for a in args:
            out = out | compile_expr(a)
        return out
    if op == "not":
        return ~compile_expr(args)
    if op == "missing":
        return compile_expr(args).isNull()
    if op == "exists":
        return compile_expr(args).isNotNull()
    if op == "coalesce":
        return F.coalesce(*[compile_expr(a) for a in args])
    if op == "when":
        return F.when(
            compile_expr(args["when"] if isinstance(args, dict) else args),
            compile_expr(args.get("then")) if isinstance(args, dict) else F.lit(None),
        ).otherwise(
            compile_expr(args.get("else")) if isinstance(args, dict) else F.lit(None)
        )
    if op == "case":
        out = None
        default = F.lit(None)
        whens = []
        for clause in args:
            if isinstance(clause, dict) and "when" in clause:
                whens.append((compile_expr(clause["when"]), compile_expr(clause["then"])))
            else:
                default = compile_expr(clause)
        for cond, then in reversed(whens):
            out = F.when(cond, then).otherwise(out if out is not None else default)
        return out if out is not None else default
    if op in ("add", "sub", "mul", "div", "mod", "exp"):
        cs = [compile_expr(a) for a in args]
        out = cs[0]
        for c in cs[1:]:
            out = {
                "add": out + c, "sub": out - c, "mul": out * c,
                "div": out / c, "mod": out % c, "exp": out ** c,
            }[op]
        return out
    if op == "floor":
        # {"floor": [x, interval]} — floor to multiple (FloorOp:1067)
        x = compile_expr(args[0])
        i = args[1] if len(args) > 1 else 1
        return F.floor(x / i) * i
    if op == "max":
        return F.greatest(*[compile_expr(a) for a in args])
    if op == "min":
        return F.least(*[compile_expr(a) for a in args])
    if op == "length":
        return F.length(compile_expr(args))
    if op == "prefix":
        ((k, v),) = args.items()
        return F.col(k).startswith(v)
    if op == "suffix":
        ((k, v),) = args.items()
        return F.col(k).endswith(v)
    if op == "concat":
        if isinstance(args, dict):  # {"concat": {...,"separator": s}} form
            sep = args.get("separator", "")
            vals = args.get("terms", [])
            return F.concat_ws(sep, *[compile_expr(a) for a in vals])
        return F.concat(*[compile_expr(a) for a in args])
    if op == "find":
        ((k, v),) = args.items()
        found = F.locate(v, F.col(k))
        return F.when(found > 0, found - 1)  # jx is 0-based, missing if absent
    if op == "left":
        ((k, v),) = args.items()
        return F.substring(F.col(k), 1, int(v))
    if op == "right":
        ((k, v),) = args.items()
        return F.col(k).substr(F.length(F.col(k)) - int(v) + 1, F.lit(int(v)))
    if op == "not_left":
        ((k, v),) = args.items()
        return F.col(k).substr(F.lit(int(v) + 1), F.length(F.col(k)))
    if op == "split":
        ((k, v),) = args.items()
        return F.split(F.col(k), v)
    if op == "regex":
        ((k, v),) = args.items()
        return F.col(k).rlike(v)
    if op == "tuple":
        return F.struct(*[compile_expr(a) for a in args])
    if op == "first":
        return F.element_at(compile_expr(args), 1)
    if op == "last":
        return F.element_at(compile_expr(args), -1)
    if op == "count":  # scalar count of non-null items in tuple
        return F.size(F.filter(F.array(*[compile_expr(a) for a in args]),
                               lambda x: x.isNotNull()))
    if op == "unix":
        return F.unix_timestamp(compile_expr(args))
    if op == "from_unix":
        return F.from_unixtime(compile_expr(args)).cast("timestamp")
    if op == "script":
        # raw backend escape hatch (ScriptOp, jx_base/expressions.py:490):
        # the "backend script" here is a Spark SQL expression
        return F.expr(args)
    raise ValueError(f"unsupported jx operator: {op}")


def _domain_expr(edge: dict) -> Column:
    """Edge domain -> binning expression (jx_base/domains.py analog)."""
    value = compile_expr(edge["value"])
    dom = edge.get("domain", {})
    typ = dom.get("type", "default")
    if typ in ("default", "set"):
        return value
    if typ == "range" or typ == "numeric":
        interval = dom.get("interval", 1)
        lo, hi = dom.get("min"), dom.get("max")
        binned = F.floor(value / interval) * interval
        # build each bound only when given — `value < lit(None)` is NULL and
        # would bin every row to null when one bound is omitted
        bound = None
        if lo is not None:
            bound = value >= lo
        if hi is not None:
            bound = (value < hi) if bound is None else (bound & (value < hi))
        if bound is not None:
            binned = F.when(bound, binned)
        return binned
    if typ in ("time", "duration"):
        interval = dom.get("interval", "day")
        if isinstance(interval, str):
            return F.date_trunc(interval, value)
        return F.floor(F.unix_timestamp(value) / interval) * interval
    raise ValueError(f"unsupported domain type: {typ}")


def _agg_col(sel: dict) -> Column:
    agg = sel.get("aggregate", "count")
    name = sel.get("name") or (sel.get("value") if isinstance(sel.get("value"), str) else agg)
    if agg == "count" and sel.get("value") in (None, "."):
        return F.count(F.lit(1)).alias(name)
    v = compile_expr(sel["value"])
    if agg == "percentile":
        return F.percentile(v, sel.get("percentile", 0.5)).alias(name)
    return _AGGS[agg](v).alias(name)


def run(query: dict, frames: dict[str, DataFrame]) -> DataFrame:
    """Execute a jx-lite query over named DataFrames (jx.run analog)."""
    df = frames[query["from"]] if isinstance(query["from"], str) else run(
        query["from"], frames
    )

    if "where" in query:
        df = df.where(compile_expr(query["where"]))

    select = query.get("select")
    groupby = query.get("groupby")
    edges = query.get("edges")
    window = query.get("window")

    if window:
        wins = window if isinstance(window, list) else [window]
        for win in wins:
            w = W.partitionBy(
                *[compile_expr(e) for e in win.get("edges", [])]
            )
            if "sort" in win:
                w = w.orderBy(*_sort_cols(win["sort"]))
            rng = win.get("range")
            if rng:
                # jx range max is EXCLUSIVE (jx.py:1003-1008 iterates
                # range(tail, head)); {"max": 0} excludes the current row
                hi = rng.get("max")
                w = w.rowsBetween(
                    rng.get("min", W.unboundedPreceding),
                    (hi - 1) if hi is not None else 0,
                )
            agg = win.get("aggregate", "count")
            if agg == "rownum":
                c = F.row_number().over(w)
            elif agg == "rank":
                c = F.rank().over(w)
            else:
                c = _AGGS[agg](compile_expr(win["value"])).over(w)
            df = df.withColumn(win["name"], c)

    if edges is not None or groupby is not None:
        keys = []
        for g in (groupby or []):
            g = {"name": g, "value": g} if isinstance(g, str) else g
            keys.append(compile_expr(g["value"]).alias(g.get("name") or g["value"]))
        for e_ in (edges or []):
            e_ = {"name": e_, "value": e_} if isinstance(e_, str) else e_
            keys.append(_domain_expr(e_).alias(e_.get("name") or e_["value"]))
        sels = select if isinstance(select, list) else [select or {"aggregate": "count", "name": "count"}]
        sels = [{"aggregate": "count", "name": "count"} if s is None else s for s in sels]
        aggs = [_agg_col(s if isinstance(s, dict) else {"value": s, "aggregate": "count", "name": s}) for s in sels]
        df = df.groupBy(*keys).agg(*aggs)
    elif select is not None:
        sels = select if isinstance(select, list) else [select]
        cols = []
        for s in sels:
            if isinstance(s, str):
                cols.append(F.col("*") if s == "." else F.col(s))
            elif isinstance(s.get("value"), dict) and "leaves" in s["value"]:
                # LeavesOp ({"leaves": v}): expand object to its leaf columns
                # (jx_base/expressions.py:910-933) -> struct star-expansion
                cols.append(F.col(f'{s["value"]["leaves"]}.*'))
            else:
                cols.append(compile_expr(s["value"]).alias(s.get("name") or str(s["value"])))
        df = df.select(*cols)

    if "sort" in query:
        df = df.orderBy(*_sort_cols(query["sort"]))

    limit = query.get("limit", DEFAULT_LIMIT)
    if limit is not None:
        df = df.limit(int(limit))
    return df


def _sort_cols(sort) -> list[Column]:
    """jx sort: nulls sort least (language.py:185-190)."""
    out = []
    for s in sort if isinstance(sort, list) else [sort]:
        if isinstance(s, str):
            out.append(F.col(s).asc_nulls_first())
        else:
            value = s["value"] if isinstance(s, dict) else s
            desc = (s.get("sort", 1) if isinstance(s, dict) else 1) < 0
            c = compile_expr(value)
            out.append(c.desc_nulls_last() if desc else c.asc_nulls_first())
    return out
