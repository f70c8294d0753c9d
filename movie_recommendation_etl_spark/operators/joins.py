"""Join operators beyond Spark's built-in surface.

The reference implements no joins at all (SURVEY.md §2.4); equi/semi/anti/
broadcast joins are plain ``df.join`` and need no wrapper. What Spark lacks
natively (in the Scala/Python SQL API) is the as-of join, so we provide a
shuffle-efficient formulation here.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _contains_unorderable(dt) -> bool:
    """True if the type tree contains a MapType (not orderable in Spark —
    sorting on it fails analysis)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _contains_unorderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_contains_unorderable(f.dataType) for f in dt.fields)
    return False


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    tiebreak: str | None = None,
    bucket_width: float | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.right_ts <= left.left_ts`` sharing the join key(s).

    Scale-first formulation: instead of the naive range join + per-key
    row_number (which materializes |L|x|R| candidate pairs per key), union
    both sides tagged by origin, sort within key by time, and carry the last
    right row forward with ``F.last(ignorenulls=True)``. One shuffle on the
    key, no pair blowup, and the per-key work is a linear pass.

    Skew honesty (r15, the topk.py correction applied here too): AQE's
    skew handling covers JOINS only — a WINDOW partition cannot be split,
    so one pathologically hot key (a bot user, a NULL-ish default id) is
    one straggler task in the default plan. ``bucket_width`` (opt-in,
    same units as the timestamp: seconds for timestamps, raw units for
    numerics) splits every key's timeline into fixed-width time buckets
    and runs the window per (key, bucket), then stitches buckets with a
    carry-in pass whose window runs over PER-BUCKET rows (bounded by
    time-range/width, never by row count) — output-identical to the
    single-window plan, hot keys parallelize across their buckets.

    The whole right payload travels as ONE struct column, so a matched right
    row whose individual fields are NULL is carried intact (per-column
    ``last(ignorenulls)`` would stitch fields from different right rows).
    Right rows sort before left rows at equal timestamps, giving inclusive
    (<=) as-of semantics, matching DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``.

    Tiebreak among right rows sharing (key, ts): pass ``tiebreak`` (a right
    payload column, e.g. its id) to order by that single compact key —
    required when the payload contains non-orderable types (MapType) and
    preferable always, since the sort key stays narrow. Default (None)
    orders by the whole payload struct (lexicographic by field) and raises
    up front if the payload is not orderable.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    left_cols = [c for c in left.columns if c not in keys and c != left_ts]

    payload = F.struct(*[F.col(c).alias(c) for c in right_cols])
    r_struct_type = (
        right.select(payload.alias("__r")).schema["__r"].dataType
    )
    if tiebreak is None:
        if _contains_unorderable(r_struct_type):
            raise ValueError(
                "asof_join: right payload contains MapType and cannot be "
                "ordered for the equal-timestamp tiebreak; pass tiebreak="
                "'<right id column>' to order by a compact key instead"
            )
    elif tiebreak not in right_cols:
        raise ValueError(
            f"asof_join: tiebreak column {tiebreak!r} not in right payload "
            f"columns {list(right_cols)}"
        )

    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        payload.alias("__r"),
    )

    # Deterministic tiebreak among equal-(key, ts) right rows; left rows
    # have a NULL payload (nulls first) so the tiebreak never reorders a
    # left row past a right row at the same instant.
    tiebreak_col = (
        F.col("__r")[tiebreak] if tiebreak is not None else F.col("__r")
    )
    u = l_tagged.unionByName(r_tagged)
    if bucket_width is None:
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col("__t"), F.col("__is_left"), tiebreak_col)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        filled = u.select(
            *keys,
            "__t",
            "__is_left",
            *left_cols,
            F.last("__r", ignorenulls=True).over(w).alias("__r"),
        )
    else:
        if bucket_width <= 0:
            raise ValueError("asof_join: bucket_width must be > 0")
        # cast-to-double is monotone for timestamps (epoch seconds) and
        # numerics alike, so bucket order == time order
        u = u.withColumn(
            "__bkt",
            F.floor(F.col("__t").cast("double") / F.lit(float(bucket_width))),
        )
        wb = (
            W.partitionBy(*keys, "__bkt")
            .orderBy(F.col("__t"), F.col("__is_left"), tiebreak_col)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        within = u.select(
            *keys,
            "__bkt",
            "__t",
            "__is_left",
            *left_cols,
            F.last("__r", ignorenulls=True).over(wb).alias("__rb"),
        )
        # last right row of each bucket that HAS right rows (ordered the
        # same way the window sorts: ts, then tiebreak)
        rb = (
            u.filter(F.col("__is_left") == 0)
            .groupBy(*keys, "__bkt")
            .agg(
                F.max_by(
                    "__r", F.struct(F.col("__t"), tiebreak_col)
                ).alias("__last_r")
            )
        )
        # carry-in per (key, bucket): the last right row of ANY earlier
        # bucket — computed over the per-bucket frame (one row per
        # occupied bucket), so this window's partitions are bounded by
        # time-range/bucket_width regardless of key heat
        bkts = u.select(*keys, "__bkt").distinct()
        wc = (
            W.partitionBy(*keys)
            .orderBy("__bkt")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        carry = bkts.join(rb, [*keys, "__bkt"], "left").select(
            *keys,
            "__bkt",
            F.last("__last_r", ignorenulls=True).over(wc).alias("__carry"),
        )
        filled = within.join(carry, [*keys, "__bkt"]).select(
            *keys,
            "__t",
            "__is_left",
            *left_cols,
            F.coalesce(F.col("__rb"), F.col("__carry")).alias("__r"),
        )
    out = filled.filter(F.col("__is_left") == 1).select(
        *keys,
        *left_cols,
        F.col("__t").alias(left_ts),
        *[F.col("__r")[c].alias(c) for c in right_cols],
    )
    return out
