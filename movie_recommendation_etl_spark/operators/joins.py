"""Join operators beyond Spark's built-in surface.

The reference implements no joins at all (SURVEY.md §2.4); equi/semi/anti/
broadcast joins are plain ``df.join`` and need no wrapper. What Spark lacks
natively (in the Scala/Python SQL API) is the as-of join, so we provide a
shuffle-efficient formulation here.
"""

from __future__ import annotations

import logging
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

# Bucket id for NULL-timestamp rows in the bucketed as-of path: must sort
# below every real floor(ts/width) so the stitch reproduces the single
# window's nulls-first ordering.
_NULL_TS_BUCKET = -(1 << 63)


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


def _auto_bucket_width(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    target_bucket_rows: int,
) -> float | None:
    """Derive a time-bucket width for the skewed as-of path (r16, VERDICT
    r15 #8 — the knob was magic): ONE aggregate pre-pass over both sides'
    (key, ts) pairs computes each key's average inter-row gap
    (span / (rows-1)); the 10th percentile of those gaps (percentile_approx
    — the same counting-guided recipe as zorder's string ``q:N`` buckets)
    estimates the DENSE keys' row spacing, and width = that gap x
    ``target_bucket_rows`` puts roughly ``target_bucket_rows`` rows of a
    hot key into each bucket. Returns None (caller falls back to the
    single-window plan) when no key has 2+ timestamped rows or all rows
    share one instant — bucketing can't help those shapes.

    Any positive width is output-identical (the fuzz contract in
    tests/test_asof_property.py covers the auto path); the estimate only
    affects parallelism, so a cheap global percentile beats a per-key
    exact pass.
    """
    u = left.select(
        *keys, F.col(left_ts).cast("double").alias("__t")
    ).unionByName(
        right.select(*keys, F.col(right_ts).cast("double").alias("__t"))
    )
    row = (
        u.filter(F.col("__t").isNotNull())
        .groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            (F.max("__t") - F.min("__t")).alias("__span"),
            F.max(F.abs(F.col("__t"))).alias("__abs"),
        )
        .filter((F.col("__n") > 1) & (F.col("__span") > 0))
        .agg(
            F.percentile_approx(
                F.col("__span") / (F.col("__n") - 1), F.lit(0.1)
            ).alias("gap"),
            F.max("__abs").alias("abs_max"),
        )
        .first()
    )
    gap = row["gap"] if row is not None else None
    if gap is None or gap <= 0:
        return None
    # Clamp to a floor (r17, ADVICE fix): dense same-instant keys can drive
    # the 10th-percentile gap to ~1e-15, and floor(ts/width) with such a
    # width exceeds long range — Spark clamps the double->long cast, and
    # the negative clamp lands exactly on the NULL-ts sentinel bucket.
    # abs_max/2^40 keeps every |floor(ts/width)| <= 2^40, far inside long
    # range, while 2^40 buckets is parallelism beyond any cluster's needs.
    # (Any positive width is output-identical — see docstring.)
    width = float(gap) * target_bucket_rows
    abs_max = float(row["abs_max"] or 0.0)
    return max(width, abs_max / float(1 << 40))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] | None = None,
    tiebreak: str | None = None,
    bucket_width: float | str | None = None,
    target_bucket_rows: int = 100_000,
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
    ``bucket_width="auto"`` (r16) derives the width from the data with one
    aggregate pre-pass — see :func:`_auto_bucket_width`;
    ``target_bucket_rows`` tunes the rows-per-bucket it aims for. NULL
    timestamps and NULL join keys follow the single-window plan's
    semantics on the bucketed path too (sentinel bucket + null-safe
    stitch joins).

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
    if isinstance(bucket_width, str):
        if bucket_width != "auto":
            raise ValueError(
                f"asof_join: bucket_width must be a number, 'auto', or "
                f"None; got {bucket_width!r}"
            )
        bucket_width = _auto_bucket_width(
            left, right, keys, left_ts, right_ts, target_bucket_rows
        )
        log.info(
            "asof_join: auto-derived bucket_width=%s (target %d rows/bucket"
            "; None = single-window fallback)",
            bucket_width,
            target_bucket_rows,
        )
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
        # numerics alike, so bucket order == time order. NULL timestamps
        # (which the single-window plan orders FIRST, nulls-first asc) get
        # an EXPLICIT when()-branch to the Long.MIN_VALUE sentinel bucket,
        # strictly below every real one, so the bucketed plan keeps them
        # and stitches them identically (r16 ADVICE: they previously fell
        # out of the null-unsafe bucket joins; r18 ADVICE: the old
        # coalesce-after-greatest form was dead code — greatest() SKIPS
        # nulls, so NULL __t actually landed in sentinel+1, and the stated
        # invariant was false even though within-bucket nulls-first
        # ordering kept the output correct). greatest() guards the real
        # buckets BY CONSTRUCTION (r17 ADVICE fix): with an extreme
        # ts/width ratio floor()'s double->long cast clamps, and the
        # negative clamp IS Long.MIN_VALUE; clamping real buckets to
        # sentinel+1 is monotone non-decreasing in ts, which is all
        # bucketing needs (any monotone bucket map is output-identical —
        # the within-bucket window still sorts by ts).
        u = u.withColumn(
            "__bkt",
            F.when(
                F.col("__t").isNull(), F.lit(_NULL_TS_BUCKET)
            ).otherwise(
                F.greatest(
                    F.floor(
                        F.col("__t").cast("double")
                        / F.lit(float(bucket_width))
                    ),
                    F.lit(_NULL_TS_BUCKET + 1),
                )
            ),
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
        # Both stitch joins must be NULL-SAFE on the join keys: the
        # single-window plan partitions NULL keys into their own group, so
        # the bucketed plan has to match them too (a plain equi-join would
        # silently drop NULL-key rows, breaking output-identity). __bkt is
        # never null (sentinel above), so plain equality is fine there;
        # eqNullSafe stays an equi-join predicate for the planner.
        rb_j = rb.select(
            *[F.col(k).alias(f"__rbk{i}") for i, k in enumerate(keys)],
            F.col("__bkt").alias("__rbbkt"),
            "__last_r",
        )
        cond_rb = F.col("__bkt") == F.col("__rbbkt")
        for i, k in enumerate(keys):
            cond_rb = cond_rb & F.col(k).eqNullSafe(F.col(f"__rbk{i}"))
        carry = (
            bkts.join(rb_j, cond_rb, "left")
            .select(*keys, "__bkt", "__last_r")
            .select(
                *keys,
                "__bkt",
                F.last("__last_r", ignorenulls=True)
                .over(wc)
                .alias("__carry"),
            )
        )
        carry_j = carry.select(
            *[F.col(k).alias(f"__ck{i}") for i, k in enumerate(keys)],
            F.col("__bkt").alias("__cbkt"),
            "__carry",
        )
        cond_c = F.col("__bkt") == F.col("__cbkt")
        for i, k in enumerate(keys):
            cond_c = cond_c & F.col(k).eqNullSafe(F.col(f"__ck{i}"))
        filled = within.join(carry_j, cond_c).select(
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
