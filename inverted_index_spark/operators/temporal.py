"""Temporal relational operators Spark lacks as built-ins, expressed
declaratively (no Python in the hot path):

- :func:`as_of_join` — for every left row, the latest right row of the
  same key with ``right_ts <= left_ts`` (backward; ``forward`` takes
  the earliest with ``right_ts >= left_ts``). The classic
  point-in-time join (kdb aj / pandas merge_asof / Flink temporal
  join), done as ONE union + ONE window pass: tag the two sides,
  sort within key by (ts, tag, tiebreak), and carry the right
  payload with last(ignorenulls) — a single shuffle on the join key,
  whole-stage-codegen'd, no per-row Python, no per-key UDF state, and
  no join-back (both sides' payloads ride the union as structs, so
  neither input is evaluated twice).
- :func:`sessionize` — gap-based session ids per key (a new session
  starts when the time since the previous event exceeds ``gap``):
  lag + cumulative sum over one (key, ts) window — the standard
  sessionization every clickstream/transcript pipeline runs.

Scale shape: both are one hash-exchange on the key column with
in-partition ordered scans; skewed keys fall to AQE. Ties are pinned
deterministically: equal timestamps order by (tag: right-before-left
for backward) then the ``tiebreak`` column, so results are
reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tolerance=None,
    tiebreak: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Left rows + the as-of matching right row's columns (suffixed on
    name clash; NULLs when no right row qualifies). ``tolerance``
    (seconds for timestamp columns, plain difference for numeric ts)
    drops matches farther than that from the left ts. ``tiebreak``
    names a right column that orders equal-timestamp right rows (the
    HIGHEST value wins, both directions); set it when (on, right_ts) is not unique and you
    need reproducible output."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    rcols = [c for c in right.columns if c != on]
    out_names = {c: (c + suffix if c in left.columns else c) for c in rcols}
    # tag orders the right row BEFORE the left at equal ts for
    # backward (so it is visible to the left row), AFTER for forward
    r_tag, l_tag = (0, 1) if direction == "backward" else (1, 0)
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(r_tag).alias("_tag"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).alias("_tb"),
        F.struct(*[F.col(c) for c in rcols]).alias("_p"),
        F.lit(None)
        .cast(left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType)
        .alias("_lp"),
    )
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(l_tag).alias("_tag"),
        # typed null, never consulted (tag separates the sides): a
        # bare lit(0) would make unionByName coerce a string/timestamp
        # tiebreak to BIGINT and abort under ANSI
        F.lit(None).cast(r.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        F.struct(*left.columns).alias("_lp"),
    )
    u = r.unionByName(lt)
    # the HIGHEST tiebreak wins in both directions: the winning right
    # row is the one last() sees nearest before the left row, so the
    # tiebreak sorts ascending under backward's asc scan and ALSO
    # ascending under forward's desc scan
    order = (
        [F.asc("_ts"), F.asc("_tag"), F.asc("_tb")]
        if direction == "backward"
        else [F.desc("_ts"), F.desc("_tag"), F.asc("_tb")]
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_right = F.col("_tag") == r_tag
    m = (
        u.withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .withColumn(
            "_mts",
            F.last(F.when(is_right, F.col("_ts")), ignorenulls=True).over(w),
        )
        .where(F.col("_lp").isNotNull())
    )
    if tolerance is not None:
        from pyspark.sql import types as T

        if isinstance(
            u.schema["_ts"].dataType, (T.TimestampType, T.TimestampNTZType)
        ):
            def _secs(c):
                return F.unix_micros(c.cast("timestamp")) / F.lit(1e6)
        else:
            def _secs(c):
                return c.cast("double")
        delta = (
            _secs(F.col("_ts")) - _secs(F.col("_mts"))
            if direction == "backward"
            else _secs(F.col("_mts")) - _secs(F.col("_ts"))
        )
        m = m.withColumn(
            "_m",
            F.when(
                F.col("_mts").isNotNull() & (delta <= F.lit(float(tolerance))),
                F.col("_m"),
            ),
        )
    return m.select(
        *[F.col(f"_lp.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{c}").alias(out_names[c]) for c in rcols],
    )


def sessionize(
    events: DataFrame,
    key: str,
    ts: str,
    gap_seconds: float,
    session_col: str = "session_id",
    seq_col: str = "session_seq",
) -> DataFrame:
    """Events + (session_id, session_seq): a new session starts when
    the time since the key's previous event exceeds ``gap_seconds``.
    ``session_id`` is ``<key>#<n>`` (n = 0-based session index within
    the key); ``session_seq`` is the 0-based position within the
    session. One window over (key, ts) — single shuffle, codegen."""
    from pyspark.sql import types as T

    dt = events.schema[ts].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # NTZ refuses a direct double cast under ANSI; microsecond
        # epoch differences are tz-invariant either way
        def _secs(c):
            return F.unix_micros(c.cast("timestamp")) / F.lit(1e6)
    else:

        def _secs(c):
            return c.cast("double")

    w = Window.partitionBy(key).orderBy(F.asc(ts))
    prev = F.lag(F.col(ts)).over(w)
    gap = _secs(F.col(ts)) - _secs(prev)
    is_new = (
        F.when(prev.isNull() | (gap > F.lit(float(gap_seconds))), 1).otherwise(0)
    )
    sess_n = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ) - F.lit(1)
    out = events.withColumn("_sn", sess_n)
    w2 = Window.partitionBy(key, "_sn").orderBy(F.asc(ts))
    return (
        out.withColumn(
            session_col,
            F.concat_ws(
                "#", F.col(key).cast("string"), F.col("_sn").cast("string")
            ),
        )
        .withColumn(seq_col, F.row_number().over(w2) - F.lit(1))
        .drop("_sn")
    )


def session_stats(
    events: DataFrame,
    key: str,
    ts: str,
    gap_seconds: float,
    value_col: str | None = None,
) -> DataFrame:
    """Session-level rollup via Spark's BUILT-IN ``session_window``
    (the same operator works on a stream with a watermark — bounded
    state, sessions merge as late events arrive): (key, session_start,
    session_end, n_events[, sum_value]). ``session_end`` is the last
    event's ts + gap (Spark's session_window convention). Boundaries
    equal :func:`sessionize`'s gap rule for strictly-increasing
    per-key timestamps, except events exactly ``gap`` apart: the
    window closes at ts+gap EXCLUSIVE here, while sessionize splits
    only when the gap is strictly exceeded — choose one op per
    pipeline."""
    aggs = [F.count("*").alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    out = events.groupBy(
        F.col(key),
        F.session_window(F.col(ts), f"{gap_seconds} seconds").alias("_w"),
    ).agg(*aggs)
    return out.select(
        key,
        F.col("_w.start").alias("session_start"),
        F.col("_w.end").alias("session_end"),
        *[c for c in ("n_events", "sum_value") if c in out.columns],
    ).orderBy(key, "session_start")
