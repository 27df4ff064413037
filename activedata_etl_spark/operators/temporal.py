"""Temporal join operators: as-of join (point-in-time lookup).

The reference resolves "state as of a moment" imperatively — e.g. pushes
look up the last-seen changeset per branch before a given push
(`vendor/mo_hg/hg_mozilla_org.py:179-236` walks revisions backward), and
ETL keys embed the source timestamp so consumers re-derive "latest before
X" per query.  A lake engine needs it as a FIRST-CLASS operator: for every
probe row, attach the most recent build-side row at-or-before its
timestamp, per key.

Spark has no ASOF JOIN builtin.  The classic workarounds are a range join
(explodes to O(probe x build) per key before filtering) or a windowed
union — this module implements the union form because it is the only one
whose cost is O((|L| + |R|) log) with exactly ONE shuffle:

    tag probe/build rows -> union -> hash-partition by key ->
    in-partition sort by (time, side, tiebreak) ->
    running last(build_payload, ignorenulls) -> keep probe rows.

The running ``last`` over ``rowsBetween(unboundedPreceding, currentRow)``
is a streaming frame (Spark keeps O(1) state per partition, no buffering),
so the whole operator is sort-merge shaped: it scales to 10^10 rows per
the same arithmetic as the LWW reduce, and skewed keys respond to the
same remedies (map-side pre-filter of probe-irrelevant builds, or salting
with per-salt build replication — not built in; hot-key note below).

Determinism: among build rows sharing the winning timestamp the LAST row
in sort order wins, so pass ``tiebreak`` (e.g. a sequence column) to pin
ties; with a unique (key, time, tiebreak) the result is exactly
reproducible and DuckDB-oracle-checkable (``ASOF LEFT JOIN`` exists there
natively, which is what the registry query compares against).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str | None = None,
    *,
    direction: str = "backward",
    tolerance: float | None = None,
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the matching right row nearest in time.

    - ``backward`` (default): the right row with the greatest
      ``right_time`` <= ``left_time`` (per equi-key).  ``forward``: the
      smallest ``right_time`` >= ``left_time``.  Non-strict on purpose
      (equal timestamps match) — DuckDB/pandas ``merge_asof`` default.
    - ``on``: equi-key column name(s), same names on both sides.
    - ``right_cols``: right payload to attach (default: everything except
      the key and time columns); each lands as ``<col><suffix>``, plus
      the matched time itself as ``<right_time><suffix>``.
    - ``tolerance``: maximum |time gap| in SECONDS (timestamps) or plain
      column units (numerics); matches farther away become nulls.
    - ``tiebreak``: right-side column breaking equal-time ties (greatest
      value wins in both directions).  Without it, ties are
      plan-nondeterministic — fine for analytics, not for oracles.
    - null times never match: a null-time probe row comes back with null
      payload, null-time build rows are dropped.

    Hot keys: one key's rows sort within one partition.  A key carrying
    billions of rows needs a coarser key (e.g. add a time bucket to ``on``
    and probe the previous bucket's tail separately) — the same playbook
    as the salted LWW reduce; not automated here.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    rt = right_time or left_time
    payload_cols = (
        list(right_cols)
        if right_cols is not None
        else [c for c in right.columns if c not in keys and c != rt]
    )
    out_time = f"{rt}{suffix}"
    out_names = [f"{c}{suffix}" for c in payload_cols]
    clash = ({out_time, *out_names} & set(left.columns)) | (
        set(out_names) & {out_time}
    )
    if clash:
        raise ValueError(f"suffixed output columns clash with left: {clash}")

    if tiebreak is not None:
        tb_dtype = dict(right.dtypes).get(tiebreak)
        if tb_dtype not in ("tinyint", "smallint", "int", "bigint"):
            # the tiebreak rides as cast('long'); a string/UUID sequence
            # column silently becomes null under non-ANSI casts (voiding
            # the deterministic-tie guarantee) or aborts under ANSI — fail
            # loudly instead (sampling._id_residue's dtype-guard discipline)
            raise TypeError(
                f"asof_join tiebreak column {tiebreak!r} must be an integer "
                f"type, got {tb_dtype!r}; derive an integer sequence (e.g. "
                "a monotonically increasing id) or drop the tiebreak"
            )
    payload = F.struct(
        F.col(rt).alias("__t"),
        *[F.col(c).alias(c) for c in payload_cols],
    )
    payload_type = right.select(payload.alias("p")).schema[0].dataType
    left_row = F.struct(*[F.col(c) for c in left.columns])
    left_type = left.select(left_row.alias("l")).schema[0].dataType

    tb_col = (
        F.col(tiebreak) if tiebreak is not None else F.lit(0)
    )
    probe = left.select(
        *[F.col(k) for k in keys],
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        left_row.alias("__l"),
        F.lit(None).cast(payload_type).alias("__r"),
    )
    build = right.where(F.col(rt).isNotNull()).select(
        *[F.col(k) for k in keys],
        F.col(rt).alias("__t"),
        F.lit(0).alias("__side"),
        tb_col.cast("long").alias("__tb"),
        F.lit(None).cast(left_type).alias("__l"),
        payload.alias("__r"),
    )
    u = probe.unionByName(build)

    # sort so every qualifying build row precedes its probes, with the
    # winner (greatest time backward / least time forward; then greatest
    # tiebreak) scanned LAST among qualifiers; nulls_first keeps null-time
    # probes ahead of every build in BOTH directions (=> no match)
    if direction == "backward":
        ordering = [F.col("__t").asc_nulls_first()]
    else:
        ordering = [F.col("__t").desc_nulls_first()]
    ordering += [F.col("__side").asc(), F.col("__tb").asc_nulls_first()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*ordering)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = F.last("__r", ignorenulls=True).over(w)

    if tolerance is not None:
        probe_t, match_t = F.col("__t"), m["__t"]
        gap = (
            probe_t.cast("double") - match_t.cast("double")
            if direction == "backward"
            else match_t.cast("double") - probe_t.cast("double")
        )
        m = F.when(gap <= F.lit(float(tolerance)), m)

    matched = u.withColumn("__m", m).where(F.col("__side") == 1)
    return matched.select(
        *[F.col("__l")[c].alias(c) for c in left.columns],
        F.col("__m")["__t"].alias(out_time),
        *[F.col("__m")[c].alias(n) for c, n in zip(payload_cols, out_names)],
    )


_TIME_DTYPES = {"timestamp", "timestamp_ntz", "date"}


def sessionize(
    df: DataFrame,
    key: str | list[str],
    time_col: str,
    gap: float,
    *,
    order_cols: list[str] | None = None,
    out_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids: per key, a new session starts when
    the time since the PREVIOUS row exceeds ``gap`` (seconds for
    timestamp columns, plain units for numerics).  Adds ``out_col`` —
    1-based per-key session index; every input column passes through.

    The batch analog of Structured Streaming's session window (the
    streaming side lives in `streaming/stateful.py`'s stateful counters):
    lag + running sum over ONE per-key sort — Catalyst computes both
    window functions over a single shuffle + sort, so this is exactly as
    scalable as the LWW reduce.  A strictly-greater comparison on
    purpose: a row landing exactly ``gap`` after its predecessor still
    extends the session (pandas/Flink convention).

    ``order_cols`` break equal-timestamp ordering ties (recommend the
    event id); null times sort first and extend nothing — they join the
    key's first session.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if out_col in df.columns:
        raise ValueError(f"{out_col!r} already exists")
    order = [F.col(time_col).asc_nulls_first()] + [
        F.col(c) for c in (order_cols or [])
    ]
    w_lag = Window.partitionBy(*keys).orderBy(*order)
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag(time_col).over(w_lag)
    dtype = dict(df.dtypes)[time_col]
    if dtype in _TIME_DTYPES:
        fresh = F.col(time_col) > prev + F.make_interval(
            secs=F.lit(float(gap))
        )
    else:
        fresh = (F.col(time_col) - prev) > F.lit(gap)
    # gate on row_number()==1, NOT prev.isNull(): lag() is also null when
    # the PREVIOUS ROW's time is null, so with null-time rows present every
    # such row (and the first real-time row after them) would start its own
    # session — contradicting the documented "null times join the key's
    # first session" and shifting every later session id.  ``fresh`` stays
    # null (-> false) whenever either side is null, so null-time rows and
    # the first real row extend session 1.
    new_session = (F.row_number().over(w_lag) == 1) | F.coalesce(
        fresh, F.lit(False)
    )
    return df.withColumn(
        out_col, F.sum(new_session.cast("int")).over(w_run)
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_start: str,
    right_end: str,
    *,
    bucket_width: float,
    right_cols: list[str] | None = None,
    suffix: str = "_rj",
) -> DataFrame:
    """Point-in-interval join: each left row pairs with EVERY right row
    whose ``[right_start, right_end]`` (inclusive both ends) contains its
    ``left_time``, per equi-key.  Inner semantics — non-matching left
    rows drop (wrap with a left join on a key if needed).

    Spark turns a plain non-equi condition into a per-key cross product
    (BroadcastNestedLoopJoin at worst).  This instead quantizes time into
    ``bucket_width`` cells: an interval explodes to the cells it covers,
    a point belongs to EXACTLY ONE cell, and the join becomes a hash
    equi-join on (key, cell) + exact containment filter — no duplicate
    elimination needed (one cell per point), no quadratic blowup.  Sized
    right, intervals span O(1) cells: pick ``bucket_width`` ~ the typical
    interval length (cells per interval = len/width + 1).

    Timestamps quantize via their epoch-microsecond value; numerics
    directly.  Null times / null interval endpoints never match.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = (
        list(right_cols)
        if right_cols is not None
        else [
            c for c in right.columns
            if c not in keys and c not in (right_start, right_end)
        ]
    )
    out_names = {c: f"{c}{suffix}" for c in (right_start, right_end, *payload_cols)}
    clash = set(out_names.values()) & set(left.columns)
    if clash:
        raise ValueError(f"suffixed output columns clash with left: {clash}")

    def cell(col: F.Column, dtype: str) -> F.Column:
        num = (
            col.cast("double")
            if dtype not in _TIME_DTYPES
            # NTZ has no unix_* accessor: microseconds via a long cast of
            # the seconds-precision cast is lossy, so go through string-
            # free arithmetic — cast to double epoch is exact to micros
            # for 21st-century timestamps (< 2^53 us)
            else col.cast("timestamp").cast("double")
        )
        return F.floor(num / F.lit(float(bucket_width))).cast("long")

    ldt = dict(left.dtypes)[left_time]
    rdt_s = dict(right.dtypes)[right_start]
    rdt_e = dict(right.dtypes)[right_end]

    l2 = left.withColumn("__cell", cell(F.col(left_time), ldt)).where(
        F.col(left_time).isNotNull()
    )
    r_cells = F.sequence(
        cell(F.col(right_start), rdt_s), cell(F.col(right_end), rdt_e)
    )
    # alias right's columns BEFORE the join so a left column sharing a
    # right column's name can never go ambiguous post-join
    r2 = (
        right.where(
            F.col(right_start).isNotNull()
            & F.col(right_end).isNotNull()
            & (F.col(right_start) <= F.col(right_end))
        )
        .select(
            *[F.col(k) for k in keys],
            F.col(right_start).alias(out_names[right_start]),
            F.col(right_end).alias(out_names[right_end]),
            *[F.col(c).alias(out_names[c]) for c in payload_cols],
            F.explode(r_cells).alias("__cell"),
        )
    )
    joined = l2.join(r2, [*keys, "__cell"]).where(
        (F.col(left_time) >= F.col(out_names[right_start]))
        & (F.col(left_time) <= F.col(out_names[right_end]))
    )
    # USING-join hoists key columns to the front: re-select explicitly
    return joined.select(
        *[F.col(c) for c in left.columns],
        *[
            F.col(out_names[c])
            for c in (right_start, right_end, *payload_cols)
        ],
    )


def resample(
    df: DataFrame,
    key: str | list[str],
    time_col: str,
    *,
    width: float,
    aggs: dict[str, F.Column],
    fill: dict[str, object] | None = None,
) -> DataFrame:
    """Fixed-width time-series resample with gap filling: aggregate into
    epoch-anchored buckets of ``width`` (seconds for timestamps, plain
    units for numerics), then DENSIFY — every key gets one row for every
    bucket between its first and last event, including empty ones.

    ``aggs``: output name -> aggregate expression over the raw rows
    (e.g. ``{"n": F.count(F.lit(1)), "total": F.sum("value")}``).
    ``fill`` decides what an EMPTY bucket shows per output column:
    ``"ffill"`` (carry the last seen value forward — gauge semantics),
    any literal (``0`` for counters), or absent -> null.  Output columns:
    keys, ``bucket`` (long epoch-quotient index), ``bucket_start``
    (``bucket * width``, the bucket's epoch start), then the aggregates.

    Scale shape: ONE groupBy(key, bucket) shuffle with map-side partial
    aggregation does all the heavy lifting; the dense spine is generated
    from a per-key (min, max) aggregate — an explode of sequence() whose
    size is bounded by the CALENDAR (periods per key), not the event
    count — and the grid left-joins the (already small) aggregate frame.
    ffill adds one per-key window sort over the grid.  Empty-bucket rows
    never touch the raw table.  Nulls in ``time_col`` are excluded (a
    null timestamp belongs to no bucket).

    The reference densifies query edges the same way (TimeDomain partitions
    emit empty parts, `vendor/jx_base/domains.py` time domain); this is the
    standing-operator form over a keyed stream.
    """
    if width <= 0:
        raise ValueError("width must be positive")
    if not aggs:
        raise ValueError("aggs must name at least one aggregate")
    keys = [key] if isinstance(key, str) else list(key)
    reserved = set(keys) | {"bucket", "bucket_start"}
    clash = reserved & set(aggs)
    if clash:
        raise ValueError(f"agg output names clash with grid columns: {clash}")
    dtype = dict(df.dtypes)[time_col]
    num = (
        F.col(time_col).cast("timestamp").cast("double")
        if dtype in _TIME_DTYPES
        else F.col(time_col).cast("double")
    )
    bucket = F.floor(num / F.lit(float(width))).cast("long")

    valid = df.where(F.col(time_col).isNotNull())
    agged = (
        valid.withColumn("bucket", bucket)
        .groupBy(*keys, "bucket")
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    spine = (
        valid.select(*keys, bucket.alias("__b"))
        .groupBy(*keys)
        .agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
        # sequence size is (periods per key); generated from an aggregate,
        # so the explode's inferred filters stay above the scan
        .select(*keys, F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"))).alias("bucket"))
    )
    grid = spine.join(agged, [*keys, "bucket"], "left")
    fill = fill or {}
    unknown = set(fill) - set(aggs)
    if unknown:
        raise ValueError(f"fill names unknown agg columns: {unknown}")
    cols = []
    for name in aggs:
        c = F.col(name)
        mode = fill.get(name)
        if mode == "ffill":
            w = (
                Window.partitionBy(*keys)
                .orderBy("bucket")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            c = F.last(name, ignorenulls=True).over(w)
        elif mode is not None:
            c = F.coalesce(c, F.lit(mode))
        cols.append(c.alias(name))
    return grid.select(
        *keys,
        "bucket",
        (F.col("bucket") * F.lit(float(width))).alias("bucket_start"),
        *cols,
    )
