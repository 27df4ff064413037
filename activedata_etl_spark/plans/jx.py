"""jx-lite: the reference's JSON query expressions as a thin compiler to
DataFrame plans.

The reference defines queries as JSON documents — `QueryOp.wrap` normalizes
{from, select, where, groupby, edges, sort, window, having, limit}
(`vendor/jx_base/query.py:199-269`, slots :49) and compiles an expression
tree (`vendor/jx_base/expressions.py:75-139`, operator registry :3239-3310)
per backend.  Here the "backend" is Catalyst: each jx operator maps to a
Column expression, each clause to a DataFrame transformation, and Catalyst
does the optimization the reference hand-rolled in ``partial_eval``.

Supported expression operators (registry below): eq (null-safe, set form),
ne, gt/gte/lt/lte, in, between, range (AND of comparisons, RangeOp :2763),
and/or/not, missing/exists, coalesce, when/then/else, case, add/sub/mul/div/
mod/exp, floor (to multiple), max/min (variadic scalar), length, prefix/
suffix, concat, find, left/right/not_left/not_right, split, regex, literal,
date literal (DateOp :840, unix seconds), variable (dot path), first/last,
count, tuple, union (set-union of scalar terms, UnionOp :2908), unix/
from_unix, type casts boolean/integer/number/string + is_* checks
(:1529-1755; value-based cast tests — jx is dynamically typed, SQL is
schema-typed), script, get (positional/field deref), null, match_all,
plus every registry alias (sum/minus/mult/divide/neq/instr/postfix/regexp/
term/terms/basic.*, registry :3239-3310).  add/mul honor the BaseMultiOp
``nulls``/``default`` clauses (:1915-2007): conservative (any operand
missing -> default) by default, decisive (nulls ignored via op identity,
default only when ALL missing) with ``"nulls": true``; div/mod use try_*
so a zero divisor is missing, not an ANSI error.

Clauses: select (incl. aggregate form + leaves), where, groupby, edges
(domain binning: set w/ explicit partitions, numeric interval, time duration
— domains with explicit partitions/bounds are MATERIALIZED and the output is
DENSE: every bucket appears even when empty, plus a null bucket when
allowNulls, matching `jx_base/domains.py:202,366` + the Matrix fill at
`jx_python/lists/aggs.py:49-55`), having, sort (nulls-least per jx
value_compare, language.py:152-235), window (partition/sort/aggregate/range/
where, incl. percentile + list accumulators, `jx_python/windows.py:277,305`),
limit (DEFAULT_LIMIT=10 per jx_base/query.py:29).

Window relative-row access: ``{"rows": [v, offset]}`` (RowsOp,
jx_base/expressions.py:384-409) compiles to lag/lead over the window's
partition+sort; aggregate-free windows assign the value directly.

Date literals (mo_times/dates.py:272-434 parity): numeric unix (ms when
>1e10), ISO-8601 with zone, now/today/eod/tomorrow and relative expressions
("now-7day"); time domains accept counted durations ("6week") via numeric
unix-grid binning.

Nested-array dives: a dot path that crosses an ``array<struct>`` boundary is
resolved by inserting ``explode_outer`` at each boundary — the snowflake
``nested_path`` auto-dive of `jx_python/jx.py:640-912` (drill_filter) and
:279-392 (_select_deep).

Result shaping: ``run_formatted`` packages results as list/table/cube
(`jx_python/jx.py:106-115`, `es52/format.py`) — presentation-only,
driver-side, post-limit.
"""

from __future__ import annotations

import calendar as _calendar
import datetime as _dt
import re as _re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql import Window as W

# Reference parity (jx_base/query.py:29-30): a query with NO limit clause
# returns 10 rows, exactly like the reference's query service.  MAX_LIMIT
# clamps the presentation layer (run_formatted / the CLI `query` command —
# the analog of the reference's HTTP service, where QueryOp.wrap applies
# min(MAX_LIMIT, ...)); the programmatic run() honors any explicit numeric
# limit unclamped and treats an explicit ``"limit": None`` as unbounded —
# an engine extension: run() returns a distributed DataFrame, so there is
# no driver-memory reason to cap a deliberate full-result request.
DEFAULT_LIMIT = 10
MAX_LIMIT = 10_000

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
    "list": F.collect_list,
    "stddev": F.stddev,
    "std": F.stddev,
    "var": F.var_samp,
    "variance": F.var_samp,
    "one": F.first,
    # moment sums (es52/util.py:97-124: N, s0, s1, s2=sum_of_squares)
    "N": F.count,
    "s0": F.count,
    "s1": F.sum,
    "s2": lambda c: F.sum(c * c),
}

# aggregates whose empty-bucket value is 0, not null (dense Matrix zero-fill,
# vendor/jx_python/lists/aggs.py:49-55 initializes count cells to 0)
_ZERO_FILL = {"count", "cardinality"}


def _var(name: str, env: dict | None) -> Column:
    """Variable reference — through the drill environment when present."""
    if env and name in env:
        return env[name]
    return F.col(name)


# duration seconds per unit (mo_times/durations.py:354-365 MILLI_VALUES;
# month/quarter/year are CALENDAR units — duration algebra on them adds
# calendar months, durations.py add_month)
_UNIT_SECONDS = {
    "second": 1.0, "minute": 60.0, "hour": 3600.0, "day": 86400.0,
    "week": 604800.0,
}
_CALENDAR_MONTHS = {"month": 1, "quarter": 3, "year": 12}

# injectable clock for deterministic tests of relative forms ("now-7day");
# None -> wall clock, exactly like mo_times' _utcnow
NOW_UNIX: float | None = None

_REL_RE = _re.compile(
    r"^(now|today|eod|tomorrow)((?:\s*[+-]\s*\d*[a-z]+)*)$"
)
_TERM_RE = _re.compile(r"([+-])\s*(\d*)([a-z]+)")


def _now_unix() -> float:
    import time as _time
    return NOW_UNIX if NOW_UNIX is not None else _time.time()


def _duration_seconds(s: str) -> float | None:
    """Counted duration string ("6week", "12hour") -> seconds; None when the
    string is a bare calendar unit (date_trunc handles those); error on
    counted calendar units (no fixed second width)."""
    m = _re.fullmatch(r"(\d*)([a-z]+)", s.strip().lower())
    if not m:
        return None
    n, unit = m.groups()
    if not n:
        return None  # bare unit: calendar path
    if unit in _CALENDAR_MONTHS:
        # no fixed second width — callers handle these via _duration_months
        raise ValueError(f"counted calendar duration not supported: {s!r}")
    if unit not in _UNIT_SECONDS:
        raise ValueError(f"unknown duration unit: {s!r}")
    return int(n) * _UNIT_SECONDS[unit]


def _duration_months(s: str) -> int | None:
    """Counted CALENDAR duration ("2month", "6quarter") -> total months;
    None for anything else (fixed-width and bare units take their own
    paths).  The mo_times Duration month algebra
    (`vendor/mo_times/durations.py` add_month) has no fixed second width,
    so these bin on the months-since-year-0 grid instead of the unix grid."""
    m = _re.fullmatch(r"(\d+)([a-z]+)", s.strip().lower())
    if not m:
        return None
    n, unit = m.groups()
    if unit not in _CALENDAR_MONTHS:
        return None
    return int(n) * _CALENDAR_MONTHS[unit]


def _parse_date_unix(s) -> float:
    """Date literal -> unix seconds (DateOp stores Date(...).unix).

    Forms per mo_times/dates.py:272-434: numeric unix (ms when >1e10),
    now/today/eod/tomorrow, relative expressions ("now-7day",
    "today+2week"), ISO-8601 with zone offset, and the plain formats."""
    if isinstance(s, (int, float)):
        # WAY TOO BIG for a unix timestamp -> it was milliseconds (dates.py:282)
        return float(s) / 1000.0 if s > 9999999999 else float(s)
    v = s.strip().lower()
    # digit strings of >= 9 chars are unix seconds/millis (value-based ms
    # heuristic, same as the numeric form — int and string spellings of one
    # literal must agree); shorter ones fall through to the date formats
    # (8 digits would be ambiguous with yyyymmdd)
    if v.replace(".", "", 1).isdigit() and len(v) >= 9:
        return _parse_date_unix(float(v))
    m = _REL_RE.match(v)
    if m:
        base, terms = m.groups()
        now = _now_unix()
        u = {
            "now": now,
            "today": (now // 86400) * 86400,
            "eod": (now // 86400) * 86400 + 86400,
            "tomorrow": (now // 86400) * 86400 + 86400,
        }[base]
        for sign, dig, unit in _TERM_RE.findall(terms or ""):
            n = int(dig) if dig else 1
            if sign == "-":
                n = -n
            if unit in _CALENDAR_MONTHS:
                d = _dt.datetime.fromtimestamp(u, _dt.timezone.utc)
                d = _month_add(d, n * _CALENDAR_MONTHS[unit])
                u = d.timestamp()
            elif unit in _UNIT_SECONDS:
                u += n * _UNIT_SECONDS[unit]
            else:
                raise ValueError(f"unknown duration unit in date: {s!r}")
        return u
    try:  # ISO-8601, incl. zone offsets and 'Z'
        d = _dt.datetime.fromisoformat(s.strip().replace("Z", "+00:00"))
        if d.tzinfo is None:
            d = d.replace(tzinfo=_dt.timezone.utc)
        return d.timestamp()
    except ValueError:
        pass
    for fmt in ("%Y-%m-%d %H:%M:%S", "%Y-%m-%d", "%Y-%m-%dT%H:%M:%S",
                "%Y-%m-%dT%H:%M:%S.%f", "%d%b%Y", "%d-%b-%Y"):
        try:
            d = _dt.datetime.strptime(s.strip(), fmt).replace(tzinfo=_dt.timezone.utc)
            return d.timestamp()
        except ValueError:
            continue
    raise ValueError(f"cannot parse date literal: {s!r}")


def _time_bound(b) -> _dt.datetime:
    """Bound literal -> naive-UTC datetime for a timestamp comparison."""
    return _dt.datetime.fromtimestamp(_parse_date_unix(b), _dt.timezone.utc).replace(
        tzinfo=None
    )


_CMP = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}


# registry aliases (jx_base/expressions.py:3239-3310): second names for the
# same operator class.  basic.add/basic.mul are the strict "CAN NOT DEAL
# WITH NULLS" variants (expressions.py:3071) — exactly the conservative
# no-clause fold below, so they collapse onto add/mul.
_OP_ALIASES = {
    "divide": "div", "minus": "sub", "subtract": "sub", "mult": "mul",
    "multiply": "mul", "sum": "add", "basic.add": "add", "basic.mul": "mul",
    "neq": "ne", "instr": "find", "postfix": "suffix", "regexp": "regex",
    "term": "eq", "terms": "in",
}
# clause keys that ride alongside the operator key in the same dict
_EXPR_CLAUSES = ("nulls", "default")

# ops whose {op: {var: literal}} dict form names a VARIABLE in the key —
# derived from _OP_ALIASES so a new alias cannot silently miss the
# nested-array auto-dive (get is handled separately: chained offsets)
_DICT_FORM_BASE = frozenset((
    "eq", "ne", "gt", "gte", "lt", "lte", "in", "between", "prefix",
    "suffix", "find", "left", "right", "not_left", "not_right", "split",
    "regex", "range", "rows", "add", "sub", "mul", "div", "mod", "exp",
))
_DICT_FORM_OPS = _DICT_FORM_BASE | {
    a for a, t in _OP_ALIASES.items() if t in _DICT_FORM_BASE
}


def compile_expr(e: Any, env: dict | None = None) -> Column:
    """jx expression JSON -> Catalyst Column (jx_expression analog)."""
    if e is None or e is True or e is False or isinstance(e, (int, float)):
        return F.lit(e)
    if isinstance(e, str):  # bare string = variable (dot path)
        return _var(e, env)
    if not isinstance(e, dict):
        raise ValueError(f"cannot compile jx expression: {e!r}")
    clauses = {}
    if len(e) != 1:
        if "when" in e and ("then" in e or "else" in e):
            # canonical WhenOp serialization: then/else as SIBLING keys
            # (jx_base/expressions.py:2795 __data__)
            return F.when(
                compile_expr(e["when"], env),
                compile_expr(e.get("then"), env),
            ).otherwise(compile_expr(e.get("else"), env))
        clauses = {k: v for k, v in e.items() if k in _EXPR_CLAUSES}
        body = {k: v for k, v in e.items() if k not in _EXPR_CLAUSES}
        if len(body) != 1:
            raise ValueError(f"cannot compile jx expression: {e!r}")
        (op, args), = body.items()
    else:
        (op, args), = e.items()
    op = _OP_ALIASES.get(op, op)
    if clauses and op not in ("add", "sub", "mul", "div", "mod", "exp"):
        # generic clause semantics for every other operator (FindOp etc.
        # carry a first-class `default`): default replaces a MISSING result.
        # Silently ignoring a clause would return wrong values with no
        # signal; a TRUTHY `nulls` is only defined for the multi ops —
        # reject it.  A falsy `nulls` is the documented conservative default
        # and therefore a no-op (matching the BaseMultiOp branch, which uses
        # clauses.get("nulls") and accepts falsy values).
        if clauses.get("nulls"):
            raise ValueError(f'"nulls" clause not supported for {op!r}')
        if "default" in clauses:
            return F.coalesce(
                compile_expr({op: args}, env),
                compile_expr(clauses["default"], env),
            )
        return compile_expr({op: args}, env)

    if op == "literal":
        return F.lit(args)
    if op == "null":
        return F.lit(None)
    if op == "match_all":
        return F.lit(True)
    if op == "date":
        return F.lit(_parse_date_unix(args))
    if op == "eq":
        # {"eq": {x: v}} — null-safe; {"eq": {x: [v1,v2]}} = membership
        out = None
        for k, v in args.items():
            c = (
                _var(k, env).isin(*v)
                if isinstance(v, list)
                else _var(k, env).eqNullSafe(F.lit(v))
            )
            out = c if out is None else (out & c)
        return F.coalesce(out, F.lit(False))
    if op == "ne":
        ((k, v),) = args.items()
        return ~_var(k, env).eqNullSafe(F.lit(v))
    if op in ("gt", "gte", "lt", "lte"):
        # simple form {var: value-or-expression} or pair form [expr, expr]
        if isinstance(args, dict):
            ((k, v),) = args.items()
            c = _var(k, env)
            v = compile_expr(v, env) if isinstance(v, dict) else v
        else:
            c, v = compile_expr(args[0], env), compile_expr(args[1], env)
        return {"gt": c > v, "gte": c >= v, "lt": c < v, "lte": c <= v}[op]
    if op == "range":
        # {"range": {x: {"gte": a, "lt": b}}} -> AND of comparisons
        # (RangeOp, jx_base/expressions.py:2763-2770)
        ((k, comparisons),) = args.items()
        out = F.lit(True)
        c = _var(k, env)
        for cmp_op, v in comparisons.items():
            out = out & {
                "gt": c > v, "gte": c >= v, "lt": c < v, "lte": c <= v
            }[cmp_op]
        return out
    if op == "in":
        ((k, v),) = args.items()
        return _var(k, env).isin(*v)
    if op == "between":
        ((k, v),) = args.items()
        return _var(k, env).between(v[0], v[1])
    if op == "and":
        out = F.lit(True)
        for a in args:
            out = out & compile_expr(a, env)
        return out
    if op == "or":
        out = F.lit(False)
        for a in args:
            out = out | compile_expr(a, env)
        return out
    if op == "not":
        return ~compile_expr(args, env)
    if op == "missing":
        return compile_expr(args, env).isNull()
    if op == "exists":
        return compile_expr(args, env).isNotNull()
    if op == "coalesce":
        return F.coalesce(*[compile_expr(a, env) for a in args])
    if op == "when":
        return F.when(
            compile_expr(args["when"] if isinstance(args, dict) else args, env),
            compile_expr(args.get("then"), env) if isinstance(args, dict) else F.lit(None),
        ).otherwise(
            compile_expr(args.get("else"), env) if isinstance(args, dict) else F.lit(None)
        )
    if op == "case":
        out = None
        default = F.lit(None)
        whens = []
        for clause in args:
            if isinstance(clause, dict) and "when" in clause:
                whens.append((compile_expr(clause["when"], env),
                              compile_expr(clause["then"], env)))
            else:
                default = compile_expr(clause, env)
        for cond, then in reversed(whens):
            out = F.when(cond, then).otherwise(out if out is not None else default)
        return out if out is not None else default
    if op in ("add", "sub", "mul", "div", "mod", "exp"):
        if isinstance(args, dict):
            # binary simple form {"div": {var: literal}}
            # (BaseBinaryOp has_simple_form, jx_base/expressions.py)
            ((k_, v_),) = args.items()
            args = [k_, v_]
        cs = [compile_expr(a, env) for a in args]

        def fold(cols):
            out = cols[0]
            for c in cols[1:]:
                out = {
                    "add": out + c, "sub": out - c, "mul": out * c,
                    # try_*: zero divisor is MISSING (-> default), not the
                    # ANSI DIVIDE_BY_ZERO error (DivOp default semantics)
                    "div": F.try_divide(out, c), "mod": F.try_mod(out, c),
                    "exp": out ** c,
                }[op]
            return out

        default = (
            compile_expr(clauses["default"], env)
            if "default" in clauses else F.lit(None)
        )
        if clauses.get("nulls") and op not in ("add", "mul"):
            # DECISIVE null handling is defined only for the multi ops
            # (BaseMultiOp = add/mul); silently falling back to conservative
            # on sub/div would return different values with no signal
            raise ValueError(f'"nulls" clause not supported for {op!r}')
        if clauses.get("nulls") and op in ("add", "mul"):
            # DECISIVE (BaseMultiOp nulls=true, expressions.py:1978-1991):
            # nulls are ignored via the op identity; result is `default`
            # only when ALL operands are null
            ident = F.lit(0 if op == "add" else 1)
            out = fold([F.coalesce(c, ident) for c in cs])
            all_missing = cs[0].isNull()
            for c in cs[1:]:
                all_missing = all_missing & c.isNull()
            return F.when(all_missing, default).otherwise(out)
        if "default" in clauses:
            # CONSERVATIVE with default: any operand missing -> default;
            # coalesce also routes a null RESULT (zero divisor under
            # try_divide/try_mod — DivOp.missing() includes rhs=0,
            # expressions.py:990-994) to the default
            any_missing = cs[0].isNull()
            for c in cs[1:]:
                any_missing = any_missing | c.isNull()
            return F.when(any_missing, default).otherwise(
                F.coalesce(fold(cs), default)
            )
        return fold(cs)
    if op == "floor":
        # {"floor": [x, interval]} — floor to multiple (FloorOp:1067)
        x = compile_expr(args[0], env)
        i = args[1] if len(args) > 1 else 1
        return F.floor(x / i) * i
    if op == "max":
        return F.greatest(*[compile_expr(a, env) for a in args])
    if op == "min":
        return F.least(*[compile_expr(a, env) for a in args])
    if op == "length":
        return F.length(compile_expr(args, env))
    if op == "prefix":
        ((k, v),) = args.items()
        return _var(k, env).startswith(v)
    if op == "suffix":
        ((k, v),) = args.items()
        return _var(k, env).endswith(v)
    if op == "concat":
        if isinstance(args, dict):  # {"concat": {...,"separator": s}} form
            sep = args.get("separator", "")
            vals = args.get("terms", [])
            return F.concat_ws(sep, *[compile_expr(a, env) for a in vals])
        return F.concat(*[compile_expr(a, env) for a in args])
    if op == "find":
        ((k, v),) = args.items()
        found = F.locate(v, _var(k, env))
        return F.when(found > 0, found - 1)  # jx is 0-based, missing if absent
    if op == "left":
        ((k, v),) = args.items()
        return F.substring(_var(k, env), 1, int(v))
    if op == "right":
        ((k, v),) = args.items()
        c = _var(k, env)
        return c.substr(F.length(c) - int(v) + 1, F.lit(int(v)))
    if op == "not_left":
        ((k, v),) = args.items()
        c = _var(k, env)
        return c.substr(F.lit(int(v) + 1), F.length(c))
    if op == "not_right":
        # all but the last v chars (NotRightOp, expressions.py:2498-2522)
        ((k, v),) = args.items()
        c = _var(k, env)
        return c.substr(F.lit(1), F.greatest(F.length(c) - int(v), F.lit(0)))
    if op == "split":
        ((k, v),) = args.items()
        return F.split(_var(k, env), v)
    if op == "regex":
        ((k, v),) = args.items()
        return _var(k, env).rlike(v)
    if op == "tuple":
        return F.struct(*[compile_expr(a, env) for a in args])
    if op == "select":
        # SelectOp expression form (jx_base/expressions.py:436-…): aliased
        # struct literal from {"name","value"} descriptors or bare paths
        terms = args if isinstance(args, list) else [args]
        cols = []
        for t in terms:
            if isinstance(t, str):
                cols.append(compile_expr(t, env).alias(t.replace(".", "_")))
            elif isinstance(t, dict) and "value" in t:
                cols.append(
                    compile_expr(t["value"], env)
                    .alias(t.get("name") or str(t["value"]))
                )
            else:
                raise ValueError(
                    f"select expression terms need name/value: {t!r}"
                )
        return F.struct(*cols)
    if op == "offset":
        # OffsetOp (jx_base/expressions.py:349-382): positional index into
        # the current row-as-tuple; out of range -> missing (its __call__
        # returns None on IndexError), negative indexes from the end
        n = int(args)
        cols = (env or {}).get("__columns__")
        if cols is None:
            raise ValueError(
                '{"offset": n} indexes the current row — only valid inside '
                "run() where the row shape is known"
            )
        try:
            return F.col(cols[n])
        except IndexError:
            return F.lit(None)
    if op == "get":
        # GetOp (jx_base/expressions.py:412-433): successive derefs of a
        # value — int offsets index arrays (Python semantics: 0-based,
        # negative from the end, to_python renders ``var[o]``), string
        # offsets select struct fields.
        if isinstance(args, dict):  # simple form {"get": {v: offset}}
            ((v, off),) = args.items()
            args = [v, off]
        col = compile_expr(args[0], env)
        for o in args[1:]:
            if isinstance(o, dict) and "literal" in o:
                o = o["literal"]
            if isinstance(o, bool) or not isinstance(o, (int, str)):
                raise ValueError(f"get offset must be int or string: {o!r}")
            if isinstance(o, int):
                # try_element_at: out-of-range deref is MISSING (null), not
                # an error — jx var[o] semantics; plain element_at throws
                # under ANSI mode (the Spark 4 session default)
                col = F.try_element_at(col, F.lit(o + 1 if o >= 0 else o))
            else:
                col = col.getField(o)
        return col
    if op == "first":
        # try_element_at: empty array -> null (jx missing), not the ANSI
        # INVALID_ARRAY_INDEX_IN_ELEMENT_AT error
        return F.try_element_at(compile_expr(args, env), F.lit(1))
    if op == "last":
        return F.try_element_at(compile_expr(args, env), F.lit(-1))
    if op == "count":  # scalar count of non-null items in tuple
        return F.size(F.filter(F.array(*[compile_expr(a, env) for a in args]),
                               lambda x: x.isNotNull()))
    if op == "union":
        # set-union of scalar terms' values (UnionOp, expressions.py:2908)
        return F.array_distinct(
            F.filter(F.array(*[compile_expr(a, env) for a in args]),
                     lambda x: x.isNotNull())
        )
    if op == "rows":
        # relative-row access rows[rownum + offset].v inside a window clause
        # (RowsOp, jx_base/expressions.py:384-409) -> lag/lead over the
        # window's partition+sort
        w = (env or {}).get("__window__")
        if w is None:
            raise ValueError('{"rows": ...} is only valid inside a window clause')
        if isinstance(args, dict):
            ((v, off),) = args.items()
        else:
            v, off = args[0], args[1]
        c = compile_expr(v, env)
        off = int(off)
        if off < 0:
            return F.lag(c, -off).over(w)
        if off > 0:
            return F.lead(c, off).over(w)
        return c
    if op == "unix":
        return F.unix_timestamp(compile_expr(args, env))
    if op == "from_unix":
        return F.from_unixtime(compile_expr(args, env)).cast("timestamp")
    # type ops (expressions.py:1529-1755).  jx is dynamically typed; in
    # SQL-land the casts are schema casts and the Is* checks are value-based
    # cast-success tests (null-preserving).
    if op == "boolean":
        return compile_expr(args, env).cast("boolean")
    if op == "integer":
        return compile_expr(args, env).cast("long")
    if op == "number":
        return compile_expr(args, env).cast("double")
    if op == "string":
        return compile_expr(args, env).cast("string")
    if op == "is_number":
        c = compile_expr(args, env)
        return c.isNotNull() & c.cast("double").isNotNull()
    if op == "is_integer":
        c = compile_expr(args, env)
        d = c.cast("double")
        return c.isNotNull() & d.isNotNull() & (d == F.floor(d))
    if op == "is_string":
        c = compile_expr(args, env)
        return c.isNotNull() & c.cast("string").isNotNull()
    if op == "is_boolean":
        c = compile_expr(args, env)
        return c.isNotNull() & c.cast("boolean").isNotNull()
    if op == "script":
        # raw backend escape hatch (ScriptOp, jx_base/expressions.py:490):
        # the "backend script" here is a Spark SQL expression
        return F.expr(args)
    raise ValueError(f"unsupported jx operator: {op}")


# ---------------------------------------------------------------------------
# nested-array dives (drill_filter / _select_deep analog)
# ---------------------------------------------------------------------------

def _collect_vars(node: Any, out: set) -> None:
    """Gather candidate variable dot-paths from a query/expression tree."""
    if isinstance(node, str):
        out.add(node)
    elif isinstance(node, dict):
        for k, v in node.items():
            if k in ("literal", "date", "script", "name", "aggregate",
                     "separator", "percentile"):
                continue
            if k in _DICT_FORM_OPS and isinstance(v, dict):
                out.update(v.keys())  # dict-form: keys are variables
            elif k == "get":
                # {"get": [v, o...]} / {"get": {v: o}}: only the FIRST term
                # is a variable; offsets are indexes/field names, not paths
                if isinstance(v, dict):
                    out.update(v.keys())
                elif isinstance(v, (list, tuple)) and v:
                    _collect_vars(v[0], out)
            else:
                _collect_vars(v, out)
    elif isinstance(node, (list, tuple)):
        for v in node:
            _collect_vars(v, out)


def drill(df: DataFrame, paths: set[str]) -> tuple[DataFrame, dict]:
    """Insert ``explode_outer`` for every referenced dot path that crosses an
    ``array<struct>`` boundary; returns (df', env) where env maps each such
    path to its resolved Column.  Paths that stay inside plain structs keep
    Spark's native resolution (no env entry needed)."""
    env: dict[str, Column] = {}
    aliased: dict[tuple, str] = {}  # exploded prefix -> alias column name
    n = 0
    for path in sorted(paths):
        segs = path.split(".")
        if len(segs) < 2:
            continue
        # resume from the deepest already-exploded prefix
        start, ref, cur = 0, "", df.schema
        for j in range(len(segs) - 1, 0, -1):
            if tuple(segs[:j]) in aliased:
                ref = aliased[tuple(segs[:j])]
                cur = _schema_of(df, ref)
                start = j
                break
        dived = start > 0
        for i in range(start, len(segs)):
            seg = segs[i]
            if not isinstance(cur, T.StructType) or seg not in cur.fieldNames():
                cur = None
                break
            ref = f"{ref}.{seg}" if ref else seg
            dt = cur[seg].dataType
            if (isinstance(dt, T.ArrayType)
                    and isinstance(dt.elementType, T.StructType)
                    and i < len(segs) - 1):
                alias = f"__dive{n}"
                n += 1
                df = df.withColumn(alias, F.explode_outer(F.col(ref)))
                aliased[tuple(segs[:i + 1])] = alias
                ref, cur, dived = alias, dt.elementType, True
            elif isinstance(dt, T.StructType):
                cur = dt
            else:
                cur = T.StructType([])
        if dived and cur is not None:
            env[path] = F.col(ref)
    return df, env


def _schema_of(df: DataFrame, name: str):
    f = df.schema[name].dataType
    return f.elementType if isinstance(f, T.ArrayType) else f


# ---------------------------------------------------------------------------
# edge domains — binning expression + dense materialization
# ---------------------------------------------------------------------------

def _domain_expr(edge: dict, env: dict | None = None) -> Column:
    """Edge domain -> binning expression (jx_base/domains.py analog).
    Out-of-domain values bin to null (the allowNulls bucket)."""
    value = compile_expr(edge["value"], env)
    dom = edge.get("domain", {})
    typ = dom.get("type", "default")
    if typ in ("default", "set", "unique"):
        # "unique" (UniqueDomain, vendor/jx_base/domains.py:636): every
        # distinct value is its own part, identity in/out — same grouping
        # expression as the data-derived default domain, never filtered
        # by declared partitions (UniqueDomain has none)
        parts = _set_partition_values(dom) if typ != "unique" else None
        if parts is not None:
            return F.when(value.isin(*parts), value)
        return value
    if typ == "range" or typ == "numeric":
        if dom.get("partitions"):
            # explicit-partition RangeDomain (jx_base/domains.py:655-689):
            # parts are [{min, max, <key>: label}] half-open intervals; the
            # min/max/interval are IGNORED, holes bin to null (allowNulls)
            labels, ivs = _range_partition_labels(dom)
            out = None
            for (p_lo, p_hi), label in zip(ivs, labels):
                cond = (value >= F.lit(p_lo)) & (value < F.lit(p_hi))
                out = F.when(cond, F.lit(label)) if out is None \
                    else out.when(cond, F.lit(label))
            return out
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
        lo, hi = dom.get("min"), dom.get("max")
        if isinstance(interval, str):
            n_months = _duration_months(interval)
            if n_months is not None:
                # counted calendar duration ("2month"): floor on the
                # months-since-year-0 grid (aligns with calendar years
                # whenever n divides 12), bucket = first day of the period
                tot = F.year(value) * 12 + F.month(value) - 1
                fl = tot - F.pmod(tot, F.lit(n_months))
                binned = F.to_timestamp(F.make_date(
                    F.floor(fl / 12).cast("int"),
                    F.pmod(fl, F.lit(12)).cast("int") + 1,
                    F.lit(1),
                ))
                secs = None
            else:
                secs = _duration_seconds(interval)
                if secs is None:  # bare calendar unit: date_trunc
                    binned = F.date_trunc(interval, value)
                else:  # counted fixed duration ("6week"): unix-grid floor
                    binned = F.from_unixtime(
                        F.floor(F.unix_timestamp(value) / secs) * secs
                    ).cast("timestamp")
            ts = value
            conv = lambda b: F.lit(_time_bound(b)).cast("timestamp")  # noqa: E731
        else:
            binned = F.floor(F.unix_timestamp(value) / interval) * interval
            ts = F.unix_timestamp(value)
            conv = lambda b: F.lit(_parse_date_unix(b))  # noqa: E731
        # each bound applies INDEPENDENTLY (mirrors the numeric domain; a
        # one-sided time edge must still null-bucket out-of-domain rows)
        bound = None
        if lo is not None:
            bound = ts >= conv(lo)
        if hi is not None:
            b = ts < conv(hi)
            bound = b if bound is None else (bound & b)
        if bound is not None:
            binned = F.when(bound, binned)
        return binned
    raise ValueError(f"unsupported domain type: {typ}")


def _range_partition_labels(dom: dict) -> tuple[list, list]:
    """Labels + (min, max) intervals of an explicit-partition RangeDomain.
    Mirrors the reference's validation (domains.py:663-684): every part must
    carry the key property; partitions must not overlap (holes are fine)."""
    key = dom.get("key", "name")
    parts = dom["partitions"]
    labels, ivs = [], []
    for p in parts:
        if key not in p:
            raise ValueError(
                f"range partition {p!r} lacks the key property {key!r}"
            )
        labels.append(p[key])
        ivs.append((p["min"], p["max"]))
    for i, (alo, ahi) in enumerate(ivs):
        for j, (blo, bhi) in enumerate(ivs):
            if i != j and alo <= blo < ahi:
                raise ValueError(
                    f"range partitions overlap: {parts[i]!r} and {parts[j]!r}"
                )
    return labels, ivs


def _set_partition_values(dom: dict):
    parts = dom.get("partitions")
    if not parts:
        return None
    return [p.get("value") if isinstance(p, dict) else p for p in parts]


def _month_add(d: _dt.datetime, n: int) -> _dt.datetime:
    m = d.month - 1 + n
    year, month = d.year + m // 12, m % 12 + 1
    # clamp to the last valid day (mo_times add_month semantics): Mar 31 -
    # 1month = Feb 28/29, not a ValueError
    last = _calendar.monthrange(year, month)[1]
    return d.replace(year=year, month=month, day=min(d.day, last))


def _interval_parts(lo, hi, interval) -> list:
    """Bucket values as the single multiply ``k * interval`` — the SAME
    float64 each bucket's rows produce via floor(value/interval)*interval.
    Repeated addition drifts (0.1 added 8 times = 0.7999999999999999 vs
    8*0.1 = 0.8) and silently breaks the eqNullSafe dense join."""
    import math

    k, out = math.floor(lo / interval), []
    while True:
        v = k * interval
        if v >= hi:
            return out
        out.append(v)
        k += 1


def _domain_parts(edge: dict):
    """Materialized domain partitions (python values) for DENSE output, or
    None when the domain is unbounded/sparse (SimpleSetDomain from data)."""
    dom = edge.get("domain", {})
    typ = dom.get("type", "default")
    if typ in ("default", "set"):
        return _set_partition_values(dom)
    if typ in ("range", "numeric") and dom.get("partitions"):
        return _range_partition_labels(dom)[0]  # dense: every labeled part
    lo, hi = dom.get("min"), dom.get("max")
    if lo is None or hi is None:
        return None
    if typ in ("range", "numeric"):
        return _interval_parts(lo, hi, dom.get("interval", 1))
    if typ in ("time", "duration"):
        interval = dom.get("interval", "day")
        if isinstance(interval, (int, float)):
            # numeric-seconds interval bins to floor(unix/interval)*interval
            # (a NUMBER): bounds may be date STRINGS — parse them to unix
            # first (math.floor("2024-01-01" / 3600) is a TypeError)
            return _interval_parts(
                _parse_date_unix(lo), _parse_date_unix(hi), interval
            )
        n_months = _duration_months(interval)
        if n_months is not None:
            # counted calendar duration: same months-since-year-0 grid as
            # the binning expression
            start, end = _time_bound(lo), _time_bound(hi)
            tot = start.year * 12 + start.month - 1
            tot -= tot % n_months
            out, v = [], _dt.datetime(tot // 12, tot % 12 + 1, 1)
            while v < end:
                out.append(v)
                v = _month_add(v, n_months)
            return out
        secs = _duration_seconds(interval)
        if secs is not None:
            # counted duration ("6week"): buckets on the numeric unix grid,
            # emitted as the timestamps the binning expression produces
            lo_u, hi_u = _parse_date_unix(lo), _parse_date_unix(hi)
            return [
                _dt.datetime.fromtimestamp(u, _dt.timezone.utc).replace(tzinfo=None)
                for u in _interval_parts(lo_u, hi_u, secs)
            ]
        start, end = _time_bound(lo), _time_bound(hi)
        step = {"day": _dt.timedelta(days=1), "hour": _dt.timedelta(hours=1),
                "minute": _dt.timedelta(minutes=1),
                "second": _dt.timedelta(seconds=1),
                "week": _dt.timedelta(weeks=1)}.get(interval)
        months = _CALENDAR_MONTHS.get(interval)
        out, v = [], start
        while v < end:
            out.append(v)
            v = _month_add(v, months) if months else v + step
        return out
    return None


def _coerce_part(p, dt):
    if p is None:
        return None
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        return float(p)
    if isinstance(dt, (T.LongType, T.IntegerType)):
        return int(p)
    return p


def _sel_name(sel: dict) -> str:
    """Output column name of an aggregate select: explicit name, else the
    value path, else the aggregate keyword — the SAME fallback everywhere
    (naming and zero-fill must agree or dense buckets lose their 0s)."""
    return sel.get("name") or (
        sel.get("value") if isinstance(sel.get("value"), str)
        else sel.get("aggregate", "count")
    )


def _agg_col(sel: dict, env: dict | None = None) -> Column:
    agg = sel.get("aggregate", "count")
    name = _sel_name(sel)
    if agg == "count" and sel.get("value") in (None, "."):
        return F.count(F.lit(1)).alias(name)
    v = compile_expr(sel["value"], env)
    if agg == "percentile":
        return F.percentile(v, sel.get("percentile", 0.5)).alias(name)
    return _AGGS[agg](v).alias(name)


_ZONE_OP = {"gt": ">", "gte": ">=", "lt": "<", "lte": "<="}


def _scalar(v) -> bool:
    return isinstance(v, (int, float, str)) and not isinstance(v, bool)


def _zone_filters(where) -> list[tuple]:
    """Conjunctive ``(col, op, literal)`` predicates implied by a jx
    ``where`` clause — the subset a lake zone map can act on
    (``SnapshotTable.prunable_buckets``).  Conservative by design: only
    AND-reachable branches, plain top-level column names (no dotted paths,
    which may drill into nested arrays), scalar literals.  Missing a
    predicate only costs pruning opportunity, never correctness — the full
    ``where`` still runs on the rows."""
    out: list[tuple] = []
    if not isinstance(where, dict) or len(where) != 1:
        return out
    ((op, args),) = where.items()
    if op == "and" and isinstance(args, list):
        for a in args:
            out.extend(_zone_filters(a))
    elif op == "eq" and isinstance(args, dict):
        for k, v in args.items():
            if "." not in k and _scalar(v):
                out.append((k, "==", v))
    elif op in _ZONE_OP and isinstance(args, dict) and len(args) == 1:
        ((k, v),) = args.items()
        if "." not in k and _scalar(v):
            out.append((k, _ZONE_OP[op], v))
    elif op == "range" and isinstance(args, dict) and len(args) == 1:
        ((k, comparisons),) = args.items()
        if "." not in k and isinstance(comparisons, dict):
            for cmp_op, v in comparisons.items():
                if cmp_op in _ZONE_OP and _scalar(v):
                    out.append((k, _ZONE_OP[cmp_op], v))
    elif op == "between" and isinstance(args, dict) and len(args) == 1:
        ((k, v),) = args.items()
        if ("." not in k and isinstance(v, (list, tuple)) and len(v) == 2
                and _scalar(v[0]) and _scalar(v[1])):
            out += [(k, ">=", v[0]), (k, "<=", v[1])]
    return out


def _resolve_from(
    src, frames: dict[str, DataFrame], where=None
) -> DataFrame:
    """``from`` resolution: a registered frame name, a nested sub-query, or
    ``lake:<path>`` — a SnapshotTable location read at its current snapshot
    (time travel via ``lake:<path>@<version>``), connecting the query layer
    to the CDC lake the replay pipeline maintains.
    ``lake:<path>@<v1>..<v2>`` (``..`` for "to current") resolves to the
    CHANGE DATA FEED between the versions instead of a snapshot — jx
    queries compose over ``_change_type`` like any other column, so "what
    got deleted this hour, by repo" is one groupby over a bucket-confined
    diff (`SnapshotTable.changes`).

    For lake sources the query's ``where`` clause (when given) is mined for
    simple conjunctive predicates and passed to ``read(filters=...)`` so the
    scan opens only the buckets the table's zone maps cannot exclude."""
    if not isinstance(src, str):
        return run(src, frames)
    if src in frames:
        return frames[src]
    if src.startswith("lake:"):
        from pyspark.sql import SparkSession

        from activedata_etl_spark.lake.table import SnapshotTable

        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError("no active SparkSession for a lake: source")
        loc, _, ver = src[5:].partition("@")
        if ".." in ver:
            lo, _, hi = ver.partition("..")
            return SnapshotTable(spark, loc).changes(
                int(lo), int(hi) if hi else None
            )
        return SnapshotTable(spark, loc).read(
            version=int(ver) if ver else None,
            filters=_zone_filters(where) or None,
        )
    raise KeyError(
        f"unknown from: {src!r} — not a registered frame "
        f"({sorted(frames)}); use 'lake:<path>[@version]' for a lake table"
    )


def run(query: dict, frames: dict[str, DataFrame]) -> DataFrame:
    """Execute a jx-lite query over named DataFrames (jx.run analog)."""
    df = _resolve_from(query["from"], frames, where=query.get("where"))

    # nested-array dives: auto-explode along referenced paths
    refs: set[str] = set()
    for clause in ("where", "select", "groupby", "edges", "window", "sort",
                   "having"):
        if clause in query:
            _collect_vars(query[clause], refs)
    df, env = drill(df, {r for r in refs if "." in r})
    # row shape for OffsetOp (positional row-as-tuple access)
    env = dict(env)
    env["__columns__"] = list(df.columns)

    if "where" in query:
        df = df.where(compile_expr(query["where"], env))

    select = query.get("select")
    groupby = query.get("groupby")
    edges = query.get("edges")
    window = query.get("window")
    # reference normalization listwraps a scalar groupby/edges clause
    # (`vendor/jx_base/query.py` _normalize_groupby/_normalize_edges);
    # without this a bare string iterates char-by-char below
    if isinstance(groupby, (str, dict)):
        groupby = [groupby]
    if isinstance(edges, (str, dict)):
        edges = [edges]

    if window:
        wins = window if isinstance(window, list) else [window]
        for win in wins:
            w = W.partitionBy(
                *[compile_expr(e, env) for e in win.get("edges", [])]
            )
            if "sort" in win:
                w = w.orderBy(*_sort_cols(win["sort"], env))
            # order-only spec for relative-row ops (lag/lead reject frames)
            env_w = dict(env or {})
            env_w["__window__"] = w
            rng = win.get("range")
            if rng:
                # jx range max is EXCLUSIVE (jx.py:1003-1008 iterates
                # range(tail, head)); {"max": 0} excludes the current row
                hi = rng.get("max")
                w = w.rowsBetween(
                    rng.get("min", W.unboundedPreceding),
                    (hi - 1) if hi is not None else 0,
                )
            val = compile_expr(win["value"], env_w) if "value" in win else None
            if "aggregate" not in win and val is not None:
                # no aggregate: the value IS the window output (RowsOp-style
                # relative-row expressions, jx_python/windows.py:40-76)
                df = df.withColumn(win["name"], val)
                continue
            agg = win.get("aggregate", "count")
            if val is None and agg not in ("rownum", "rank"):
                # value-less window agg (e.g. per-partition row count):
                # count every row — and the where clause must still gate
                # contribution, so it needs a real expression to null out
                val = F.lit(1)
            if "where" in win and val is not None:
                # window where: only matching rows CONTRIBUTE to the
                # accumulator (jx_base/query.py:605 window slot)
                val = F.when(compile_expr(win["where"], env), val)
            if agg == "rownum":
                c = F.row_number().over(w)
            elif agg == "rank":
                c = F.rank().over(w)
            elif agg == "percentile":
                c = F.percentile(val, win.get("percentile", 0.5)).over(w)
            else:
                c = _AGGS[agg](val).over(w)
            df = df.withColumn(win["name"], c)

    # a select carrying an aggregate with NO edges/groupby is a whole-table
    # scalar aggregate (jx: aggregates default over the full set) — route it
    # through the agg branch with an empty key list (global groupBy)
    if edges is None and groupby is None:
        _sl = select if isinstance(select, list) else ([select] if select else [])
        if any(isinstance(s, dict) and s.get("aggregate") not in (None, "none")
               for s in _sl):
            edges = []

    if edges is not None or groupby is not None:
        # multivalue edges (MultivalueDecoder, vendor/jx_elasticsearch/es52/
        # decoders.py:452): an edge whose value is an array<scalar> groups by
        # each VALUE of the array, not by the array itself — explode_outer so
        # rows with empty/null arrays still land in the null bucket
        if edges is not None:
            # field-list composite edges (DimFieldListDecoder,
            # vendor/jx_elasticsearch/es52/decoders.py:672): an edge whose
            # domain carries dimension.fields=[f1, f2, ...] groups by the
            # COMPOSITE of those fields — one grouping key per field, output
            # columns <edge-name>.<field> (leaf spelling), null keys kept
            # (Spark groupBy keeps them; the decoder's _missing branch)
            fl_edges = []
            for e_ in edges:
                e_d = {"name": e_, "value": e_} if isinstance(e_, str) else dict(e_)
                fields = ((e_d.get("domain") or {}).get("dimension") or {}) \
                    .get("fields")
                if fields:
                    base = e_d.get("name") if isinstance(e_d.get("name"), str) \
                        else None
                    for f_ in fields:
                        fl_edges.append({
                            "name": f"{base}.{f_}" if base else f_,
                            "value": f_,
                        })
                else:
                    fl_edges.append(e_d)
            edges = fl_edges
            mv_edges = []
            for i, e_ in enumerate(edges):
                e_d = dict(e_)
                v = e_d.get("value")
                if v is not None:
                    dt = df.select(compile_expr(v, env).alias("__t")) \
                        .schema[0].dataType
                    if isinstance(dt, T.ArrayType) and not isinstance(
                        dt.elementType, (T.ArrayType, T.MapType, T.StructType)
                    ):
                        col = f"__mv_{i}"
                        df = df.withColumn(
                            col, F.explode_outer(compile_expr(v, env))
                        )
                        e_d["name"] = e_d.get("name") or (
                            v if isinstance(v, str) else col
                        )
                        e_d["value"] = col
                mv_edges.append(e_d)
            edges = mv_edges
        keys, dense = [], []
        for g in (groupby or []):
            g = {"name": g, "value": g} if isinstance(g, str) else g
            keys.append(compile_expr(g["value"], env).alias(g.get("name") or g["value"]))
        for e_ in (edges or []):
            e_ = {"name": e_, "value": e_} if isinstance(e_, str) else e_
            name = e_.get("name") or e_["value"]
            keys.append(_domain_expr(e_, env).alias(name))
            parts = _domain_parts(e_)
            if parts is not None:
                dense.append((name, parts, e_.get("allowNulls", True)))
        sels = select if isinstance(select, list) else [select or {"aggregate": "count", "name": "count"}]
        sels = [{"aggregate": "count", "name": "count"} if s is None else s for s in sels]
        sels = [s if isinstance(s, dict) else {"value": s, "aggregate": "count", "name": s} for s in sels]
        aggs = [_agg_col(s, env) for s in sels]
        df = df.groupBy(*keys).agg(*aggs)
        if dense:
            df = _densify(df, dense, sels)
        if "having" in query:
            df = df.where(compile_expr(query["having"], env))
    elif select is not None:
        sels = select if isinstance(select, list) else [select]
        cols = []
        for s in sels:
            if isinstance(s, str):
                cols.append(F.col("*") if s == "." else _var(s, env))
            elif isinstance(s.get("value"), dict) and "leaves" in s["value"]:
                # LeavesOp ({"leaves": v}): expand object to its leaf columns
                # (jx_base/expressions.py:910-933) -> struct star-expansion
                cols.append(F.col(f'{s["value"]["leaves"]}.*'))
            else:
                cols.append(compile_expr(s["value"], env).alias(s.get("name") or str(s["value"])))
        df = df.select(*cols)

    if "sort" in query:
        df = df.orderBy(*_sort_cols(query["sort"], env))

    limit = query.get("limit", DEFAULT_LIMIT)
    if limit is not None:
        df = df.limit(int(limit))
    return df


def run_formatted(query: dict, frames: dict[str, DataFrame]) -> dict:
    """``run`` + result packaging per ``query["format"]`` — the reference's
    presentation layer (`jx_python/jx.py:106-115`, `es52/format.py`):

    - "list" (default): {"meta": {"format": "list"}, "data": [row dicts]}
    - "table": {"meta", "header": [cols], "data": [[values]]}
    - "cube": edge queries -> {"meta", "edges": [axis meta], "data":
      {select: N-dim nested lists indexed by edge partition}} (the Matrix
      shape, `es52/format.py:25-82`); no edges -> column-major {col: [vals]}
      (`convert.list2cube` on plain lists).

    Presentation-only and driver-side BY DESIGN: it renders the final
    (post-limit) result of a distributed query for a client, exactly like
    the reference returns JSON to its HTTP caller — never part of a plan.
    """
    fmt = query.get("format", "list")
    limit = query.get("limit", DEFAULT_LIMIT)
    if limit is None:
        # this function collect()s to the driver to render the payload; an
        # explicit limit=None would collect an unbounded distributed result.
        # run() itself honors limit=None (it returns a DataFrame); only the
        # driver-side presentation refuses it.
        raise ValueError(
            "run_formatted requires a bounded limit (got limit=None): "
            "set an explicit row limit, or use run() and keep the result "
            "distributed"
        )
    # service-layer clamp (QueryOp.wrap: min(MAX_LIMIT, ...),
    # jx_base/query.py:213) — the driver-side payload is bounded no matter
    # what the caller asks for, exactly like the reference's HTTP service
    df = run({**query, "limit": min(int(limit), MAX_LIMIT)}, frames)
    cols = df.columns
    rows = [r.asDict(recursive=True) for r in df.collect()]
    if fmt == "table":
        return {
            "meta": {"format": "table"},
            "header": cols,
            "data": [[r.get(c) for c in cols] for r in rows],
        }
    if fmt == "cube":
        edges = query.get("edges")
        # groupby keys become axes too (a key column left in sel_names would
        # share one edge coordinate across its rows and last-write-wins
        # would silently corrupt every matrix); their domain comes from data
        groupby = query.get("groupby") or []
        groupby = groupby if isinstance(groupby, list) else [groupby]
        edges = (list(edges) if edges else []) + [
            g if isinstance(g, str) else {
                "name": g.get("name") or g["value"], "value": g["value"],
            }
            for g in groupby
        ]
        if not edges:
            return {
                "meta": {"format": "cube"},
                "data": {c: [r.get(c) for r in rows] for c in cols},
            }
        axes, indexers = [], []
        for e_ in edges:
            e_ = {"name": e_, "value": e_} if isinstance(e_, str) else e_
            name = e_.get("name") or e_["value"]
            parts = _domain_parts(e_)
            if parts is None:  # SimpleSetDomain from the data itself
                parts = sorted({r[name] for r in rows if r[name] is not None})
            allow = e_.get("allowNulls", True)
            idx = {v: i for i, v in enumerate(parts)}
            if allow:
                idx[None] = len(parts)  # null bucket LAST (decoders.py)
            axes.append({
                "name": name,
                "allowNulls": allow,
                "domain": {"type": e_.get("domain", {}).get("type", "set"),
                           "partitions": list(parts)},
            })
            indexers.append((name, idx))
        dims = [len(ix) for _, ix in indexers]
        sel_names = [c for c in cols if c not in {n for n, _ in indexers}]
        sels = query.get("select") or {"name": "count", "aggregate": "count"}
        zero = set()
        for s in (sels if isinstance(sels, list) else [sels]):
            if isinstance(s, dict) and s.get("aggregate", "count") in _ZERO_FILL:
                zero.add(_sel_name(s))

        def matrix(dims, fill):
            if not dims:
                return fill
            return [matrix(dims[1:], fill) for _ in range(dims[0])]

        data = {s: matrix(dims, 0 if s in zero else None) for s in sel_names}
        for r in rows:
            coord = []
            for name, ix in indexers:
                if r[name] not in ix:
                    coord = None  # allowNulls=False dropped bucket
                    break
                coord.append(ix[r[name]])
            if coord is None:
                continue
            for s in sel_names:
                cell = data[s]
                for c in coord[:-1]:
                    cell = cell[c]
                cell[coord[-1]] = r.get(s)
        return {"meta": {"format": "cube"}, "edges": axes, "data": data}
    return {"meta": {"format": "list"}, "data": rows}


def _densify(grouped: DataFrame, dense: list, sels: list) -> DataFrame:
    """Left-join sparse groups onto the materialized domain cube so every
    domain bucket appears, empty or not (dense Matrix output; decoders at
    `vendor/jx_elasticsearch/es52/decoders.py:159-310` emit every dataIndex).

    Dense edges cross-join their partition lists (+ a null bucket when
    allowNulls); any remaining group keys keep their observed combinations.
    count-family aggregates zero-fill in empty buckets; others stay null.
    """
    spark = grouped.sparkSession
    dense_names = [name for name, _, _ in dense]
    dom = None
    for name, parts, allow_nulls in dense:
        dt = grouped.schema[name].dataType
        vals = [_coerce_part(p, dt) for p in parts]
        if allow_nulls:
            vals = vals + [None]
        pdf = spark.createDataFrame(
            [(v,) for v in vals], T.StructType([T.StructField(name, dt, True)])
        )
        dom = pdf if dom is None else dom.crossJoin(pdf)
    # group keys that are NOT dense edges: keep observed combos
    agg_names = [_sel_name(s) for s in sels]
    other_keys = [c for c in grouped.columns if c not in dense_names and c not in agg_names]
    if other_keys:
        dom = dom.crossJoin(grouped.select(*other_keys).distinct())
    g = grouped
    for name in dense_names + other_keys:
        g = g.withColumnRenamed(name, f"__g_{name}")
    cond = [dom[n].eqNullSafe(g[f"__g_{n}"]) for n in dense_names + other_keys]
    # the domain side is tiny by construction (explicit partitions) — a
    # broadcast would put the SMALL side on every executor but Spark
    # broadcasts the build side of the join; leave it to AQE, which sees the
    # actual sizes
    out = dom.join(g, cond, "left")
    zero = [_sel_name(s) for s in sels if s.get("aggregate", "count") in _ZERO_FILL]
    final = [dom[n] for n in dense_names + other_keys] + [
        F.coalesce(F.col(a), F.lit(0)).alias(a) if a in zero else F.col(a)
        for a in agg_names
    ]
    return out.select(*final)


def _sort_cols(sort, env: dict | None = None) -> list[Column]:
    """jx sort: nulls sort least (language.py:185-190)."""
    out = []
    for s in sort if isinstance(sort, list) else [sort]:
        if isinstance(s, str):
            out.append(_var(s, env).asc_nulls_first())
        else:
            value = s["value"] if isinstance(s, dict) else s
            desc = (s.get("sort", 1) if isinstance(s, dict) else 1) < 0
            c = compile_expr(value, env)
            out.append(c.desc_nulls_last() if desc else c.asc_nulls_first())
    return out
