"""Frequency sketches: Misra–Gries heavy hitters with an exact confirm.

The reference engine has no sketch tier at all (its whole core is a linear
ETL — extract/transform/load, see SURVEY.md §2); this module is part of the
100 TB extension surface next to the HLL gate (q44) and the quantile-sketch
gate (q39's approx_percentile arm). The problem it solves: "every key with
frequency > φ·N, with its
exact count" over a keyspace far too large to group-by directly — n-gram
vocabularies, URL hosts, user agents. A plain ``groupBy(key).count()``
shuffles one partial row per distinct key per map task; at 100 TB with a
billion-key vocabulary that shuffle IS the job. Misra–Gries bounds the
per-partition state to ``k`` counters and the shuffle to the candidate set.

Shape:

1. **Candidate generation** (one scan, bounded state): each partition keeps
   a Misra–Gries summary of at most ``k`` counters, built batch-by-batch
   with the mergeable-summaries merge (Agarwal et al., PODS'12): add the
   Arrow batch's exact ``value_counts`` to the running counters, and if more
   than ``k`` survive, subtract the (k+1)-th largest count from all and drop
   the non-positive ones. The classic theorem: any key with true partition
   frequency f_i keeps a counter once f_i > n_i/(k+1); summing over
   partitions, any key with GLOBAL frequency > N/(k+1) survives in at least
   one partition summary — with ``k ≥ 1/φ`` the union of candidates is a
   superset of every φ-heavy hitter, deterministically, for ANY partition
   layout. This is the module's one Python stage, and it is Arrow-batched
   and vectorized (pandas ``value_counts`` + index arithmetic per batch,
   never a per-row loop).
2. **Exact confirm** (one scan, tiny shuffle): the candidate set broadcasts
   back onto the input; non-candidates collapse into a single NULL bucket
   map-side (``groupBy(when(is_candidate, key))`` — partial aggregation
   folds the long tail into one row per task), so the exchange carries at
   most |candidates|+1 rows per task. The final filter ``count > φ·N`` uses
   the EXACT recount, so the output is bit-identical to the naive group-by
   answer — the sketch only ever bounds WHERE the memory and shuffle go,
   never what the answer is.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _mg_merge(counters, batch, k: int):
    """One mergeable-summaries step: fold an exact batch count (or another
    MG summary) into ``counters`` and truncate back to ≤ k entries.

    The truncation MUST subtract the (k+1)-th largest count from every
    survivor, not merely drop the tail: without the subtraction, survivors
    coast on stale mass, inflate later cuts, and can evict a key whose
    true frequency exceeds N/(k+1) — a constructed three-batch stream
    where that happens is pinned in tests/test_sketches.py. With it, the
    total decrement ever charged to any key is ≤ N/(k+1) (Agarwal et al.,
    PODS'12), which is the superset guarantee heavy_hitters' exactness
    rests on."""
    merged = batch if counters is None else counters.add(batch, fill_value=0)
    if len(merged) > k:
        cut = merged.nlargest(k + 1).iloc[-1]
        merged = merged[merged > cut] - cut
    return merged


def mg_candidates(
    df: DataFrame, key_col: str, k: int, *, weight_col: str | None = None
) -> DataFrame:
    """Per-partition Misra–Gries summaries (at most ``k`` rows per
    partition): the key column plus its residual counter ``__mg_est``.
    NULL keys are ignored — a NULL never counts toward any key's
    frequency. The keys are a SUPERSET guarantee, not an estimate: every
    key with global frequency > N/(k+1) appears in at least one
    partition's summary; extra low-frequency keys may also appear and are
    expected to be filtered by an exact recount.

    ``weight_col`` switches the input from raw rows to pre-aggregated
    (key, weight) pairs — i.e. other MG summaries. MG summaries are
    mergeable under arbitrary trees with the SAME N/(k+1) error bound, so
    a second pass over the per-partition summaries re-merged into one
    partition tightens the candidate union from ≤ k·partitions keys to
    ≤ k total without touching the guarantee."""
    field = df.schema[key_col]
    out_schema = (
        f"`{field.name}` {field.dataType.simpleString()}, __mg_est double"
    )

    def summarize(batches: Iterator) -> Iterator:
        import pandas as pd

        counters = None
        for pdf in batches:
            if weight_col is None:
                bc = pdf[key_col].value_counts()  # exact, NULLs dropped
            else:
                bc = (
                    pdf.dropna(subset=[key_col])
                    .groupby(key_col, sort=False)[weight_col]
                    .sum()
                )
            counters = _mg_merge(counters, bc, k)
        if counters is None or counters.empty:
            yield pd.DataFrame(
                {
                    key_col: pd.Series([], dtype=object),
                    "__mg_est": pd.Series([], dtype="float64"),
                }
            )
        else:
            yield pd.DataFrame(
                {key_col: counters.index, "__mg_est": counters.values}
            )

    cols = [key_col] if weight_col is None else [key_col, weight_col]
    return df.select(*cols).mapInPandas(summarize, out_schema)


def _remerged_summaries(keyed: DataFrame, key_name: str, k: int) -> DataFrame:
    """Per-partition MG summaries re-merged into ONE ≤ k-row summary: the
    guarantee-bearing two-pass shape shared by heavy_hitters(remerge=True)
    and the persisted store. repartition, NOT coalesce — coalesce would
    collapse the parallel first pass into the single reducer; the shuffle
    moves only ≤ k·partitions summary rows."""
    return mg_candidates(
        mg_candidates(keyed, key_name, k).repartition(1),
        key_name,
        k,
        weight_col="__mg_est",
    )


def heavy_hitters(
    df: DataFrame,
    key: Column | str,
    *,
    phi: float,
    k: int | None = None,
    key_name: str = "key",
    remerge: bool = False,
) -> DataFrame:
    """Exact φ-heavy hitters: every key with ``count > phi * N`` plus its
    exact count and N, computed with Misra–Gries-bounded state (see the
    module docstring for the plan shape and the 100 TB argument).

    ``key`` may be any expression (e.g. an exploded n-gram column);
    ``k`` defaults to ``ceil(1/phi)``, the smallest value with the
    no-false-negative guarantee. Larger ``k`` trades executor memory for a
    smaller false-positive trickle into the confirm shuffle. The candidate
    union is one small broadcast (≤ k keys per partition before dedup);
    ``remerge=True`` adds one more MG pass over the per-partition
    summaries re-shuffled into a single task, shrinking the broadcast to
    ≤ k keys TOTAL however many partitions the scan had — MG summaries
    merge under arbitrary trees with the same N/(k+1) error bound, so the
    superset guarantee is untouched. Use it when partitions × k outgrows
    a comfortable broadcast (the 100 TB default).
    """
    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    k = math.ceil(1.0 / phi) if k is None else k
    if k < math.ceil(1.0 / phi):
        raise ValueError(
            f"k={k} breaks the Misra-Gries superset guarantee for "
            f"phi={phi} (need k >= {math.ceil(1.0 / phi)})"
        )
    keyed = df.select(
        (F.col(key) if isinstance(key, str) else key).alias(key_name)
    ).filter(F.col(key_name).isNotNull())
    summaries = (
        _remerged_summaries(keyed, key_name, k)
        if remerge
        else mg_candidates(keyed, key_name, k)
    )
    return confirm_heavy_hitters(
        df, key, summaries, phi=phi, key_name=key_name
    )


def confirm_heavy_hitters(
    df: DataFrame,
    key: Column | str,
    candidates: DataFrame,
    *,
    phi: float,
    key_name: str = "key",
) -> DataFrame:
    """The exact-confirm half of ``heavy_hitters``, reusable with an
    EXTERNALLY-produced candidate set — the streaming twin's drained
    per-bucket summaries (streaming/heavy_hitters.py), a persisted store's
    candidates, or any other superset source. Output is bit-identical to
    the naive group-by + threshold as long as ``candidates`` is a superset
    of the true φ-heavy keys (extra candidates only cost broadcast bytes;
    the exact recount filters them).

    Plan shape: ``candidates`` broadcasts onto one scan of ``df``;
    non-candidates fold into ONE null-keyed row per map task during
    partial aggregation — the exchange moves |candidates|+1 rows per task
    however large the keyspace is. N comes out of the same pass as the
    bucket sum, so the confirm costs exactly one scan of ``df``."""
    if not 0.0 < phi < 1.0:
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    keyed = df.select(
        (F.col(key) if isinstance(key, str) else key).alias(key_name)
    ).filter(F.col(key_name).isNotNull())
    cands = (
        candidates.select(key_name)
        .distinct()
        .withColumn("__cand", F.lit(1))
    )
    buckets = (
        keyed.join(F.broadcast(cands), key_name, "left")
        .groupBy(
            F.when(F.col("__cand") == 1, F.col(key_name)).alias(key_name)
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    total = buckets.agg(F.sum("cnt").cast("long").alias("n_total"))
    return (
        buckets.crossJoin(F.broadcast(total))
        .filter(
            F.col(key_name).isNotNull()
            & (F.col("cnt") > F.col("n_total") * F.lit(phi))
        )
        .select(key_name, "cnt", "n_total")
    )


def _latest_store_version(
    spark, store_dir: str
) -> tuple[str | None, int, int]:
    """(committed_path, committed_n, max_n_seen) for the ``v_<n>``
    subdirectories under the heavy-hitter store; (None, 0, 0) when none
    exist. "Committed" = Spark's own ``_SUCCESS`` marker is present, so a
    version half-written when the driver died is invisible to readers —
    that marker is the store's commit pointer (requires the default
    marksuccessfuljobs=true, which the repo never disables). max_n_seen
    counts UNCOMMITTED dirs too: the next write must number past crashed
    leftovers or a later admission would collide with them. Hadoop
    FileSystem API throughout, so the layout works unchanged on file:/,
    hdfs:/ and s3a:/ (same pattern as incremental_dedup._store_bytes)."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(store_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return None, 0, 0
    best_path, best_n, max_n = None, 0, 0
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith("v_")):
            continue
        try:
            n = int(name[2:])
        except ValueError:
            continue
        max_n = max(max_n, n)
        committed = fs.exists(
            jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
        )
        if committed and n > best_n:
            best_path, best_n = st.getPath().toString(), n
    return best_path, best_n, max_n


def _prune_store_versions(spark, store_dir: str, keep_n: int) -> None:
    """Best-effort cleanup AFTER a new version committed: drop every other
    ``v_<n>`` dir — superseded committed versions AND uncommitted crash
    leftovers (admissions are sequential by contract, so an uncommitted
    dir that isn't the one just written is garbage, never a concurrent
    writer) — plus any legacy flat-layout files sitting directly in the
    store root. A crash here only leaves extra bytes — readers always
    pick the highest committed version first."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(store_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v_"):
            try:
                if int(name[2:]) == keep_n:
                    continue
            except ValueError:
                # a v_<non-int> dir (v_backup, ...) is FOREIGN, not a
                # version: _latest_store_version never reads it, so prune
                # must not delete it either (r13 ADVICE — mirror the
                # unknown-file branch)
                continue
        elif not (
            name.startswith("part-")
            or name in ("_SUCCESS",)
            or name.endswith(".crc")
        ):
            continue  # unknown file: leave it alone
        try:
            fs.delete(st.getPath(), True)
        except Exception:
            pass  # cleanup only; next admission retries


def update_heavy_hitter_store(
    spark,
    store_dir: str,
    df: DataFrame,
    key: Column | str,
    *,
    k: int,
    key_name: str = "key",
) -> dict:
    """Admit a batch into a PERSISTED Misra–Gries summary — the
    heavy-hitter sibling of the incremental admission stores
    (operators/incremental_dedup.py): per-batch cost is O(batch), the
    store is ≤ k rows however much data has ever been admitted, and the
    candidate guarantee covers the WHOLE admitted history (every key with
    lifetime frequency > N_total/(k+1) is in the store — MG summaries
    merge under arbitrary trees, so batch-at-a-time folding loses
    nothing).

    Plan shape per batch: one scan for the per-partition summaries, one
    ≤ k·partitions-row shuffle to re-merge them, then a DRIVER-side fold
    of two ≤ k-entry summaries (bounded metadata, the repo's bounded-
    collect policy) and a CRASH-SAFE commit of the ≤ k-row store: each
    admission writes a fresh ``v_<n>`` subdirectory and readers take the
    highest one carrying Spark's ``_SUCCESS`` marker, so a crash mid-write
    leaves the previous version intact (an uncommitted dir is invisible)
    rather than a deleted-then-half-rewritten store; older versions are
    pruned best-effort after the commit. The batch is scanned twice in
    total (summary + count).

    Returns ``{"n_seen": lifetime rows, "n_candidates": store rows}``.
    Exact counts for the candidates still come from a confirm pass over
    the stored corpus — the store answers "who COULD be heavy", which is
    the expensive part at 100 TB.
    """
    import pandas as pd

    keyed = df.select(
        (F.col(key) if isinstance(key, str) else key).alias(key_name)
    ).filter(F.col(key_name).isNotNull())
    n_batch = keyed.count()
    merged = _remerged_summaries(keyed, key_name, k)
    batch_rows = merged.collect()  # bounded: <= k rows
    batch_counters = pd.Series(
        {r[key_name]: float(r["__mg_est"]) for r in batch_rows},
        dtype="float64",
    )

    # only the missing-path case maps to a fresh store; corruption/schema
    # drift must raise — _read_store IS that contract, reuse it
    from movie_recommendation_etl_spark.operators.incremental_dedup import (
        _read_store,
    )

    stored_counters, n_prev = None, 0
    vpath, _vn, max_n = _latest_store_version(spark, store_dir)
    # vpath=None + existing flat files = a legacy (pre-versioning) store:
    # _read_store on the root reads it; missing path still maps to fresh.
    # vpath=None with version dirs present = a FIRST admission that
    # crashed before committing: the retry bootstraps fresh (numbering
    # continues past the wreckage) instead of misreading the root.
    if vpath is None and max_n > 0:
        store = None
    else:
        store = _read_store(
            spark, vpath if vpath is not None else store_dir
        )
    prev = store.collect() if store is not None else []  # bounded: <= k+1
    if prev:
        # n_seen/k ride on EVERY row including the NULL-key meta row, so
        # the lifetime count survives a summary that cancels to empty (a
        # uniform batch with > k distinct keys zeroes every counter)
        stored_k = int(prev[0]["__mg_k"])
        if stored_k != k:
            raise ValueError(
                f"heavy-hitter store at {store_dir} was built with "
                f"k={stored_k}; admitting with k={k} would "
                f"{'truncate it and evict lifetime-heavy keys' if k < stored_k else 'claim a tighter guarantee than the history supports'}"
                " — use the store's k (phi <= "
                f"{1.0 / stored_k:.6g})"
            )
        n_prev = int(prev[0]["n_seen"])
        stored_counters = pd.Series(
            {
                r[key_name]: float(r["__mg_est"])
                for r in prev
                if r[key_name] is not None
            },
            dtype="float64",
        )
        if stored_counters.empty:
            stored_counters = None
    # _mg_merge handles the empty-batch and fresh-store cases itself
    final = _mg_merge(stored_counters, batch_counters, k)
    n_total = n_prev + n_batch

    key_field = merged.schema[key_name]
    # meta row keeps n_seen AND k through empty summaries; persisting k
    # lets the next admission reject a mismatched sketch width instead of
    # silently truncating lifetime-heavy keys (or claiming a tighter
    # guarantee than the history supports)
    rows = [(None, 0.0, n_total, k)]
    rows += [(i, float(v), n_total, k) for i, v in final.items()]
    # commit protocol: new version dir first (crash => uncommitted, old
    # version still wins), numbered past ANY existing dir (committed or
    # crashed — never a name collision), prune everything else only
    # after _SUCCESS. write_local_rows_parquet, not coalesce(1): the
    # summary is a driver-side list, and the coalesce spelling costs
    # ~4.5 s of pure task scheduling per admission (r14).
    from movie_recommendation_etl_spark.sources.writers import (
        write_local_rows_parquet,
    )

    write_local_rows_parquet(
        spark,
        rows,
        T.StructType(
            [
                T.StructField(
                    key_field.name, key_field.dataType, nullable=True
                ),
                T.StructField("__mg_est", T.DoubleType()),
                T.StructField("n_seen", T.LongType()),
                T.StructField("__mg_k", T.LongType()),
            ]
        ),
        f"{store_dir}/v_{max_n + 1}",
    )
    _prune_store_versions(spark, store_dir, keep_n=max_n + 1)
    return {"n_seen": n_total, "n_candidates": int(len(final))}


def read_heavy_hitter_candidates(spark, store_dir: str) -> DataFrame:
    """The store's current candidate summary: (key, __mg_est residual
    counter, n_seen lifetime rows). Keys are the superset guarantee; the
    residual counter is an undercount of the true lifetime frequency by
    at most n_seen/(k+1). The persisted NULL-key metadata row (the
    n_seen carrier) is filtered out here. Reads the highest committed
    ``v_<n>`` version (see update_heavy_hitter_store's commit protocol);
    legacy flat-layout stores read as-is."""
    df = spark.read.parquet(_store_read_path(spark, store_dir))
    return df.filter(F.col(df.columns[0]).isNotNull())


def _store_read_path(spark, store_dir: str) -> str:
    """Resolve which path a store READ should target: the highest
    committed version, the root for legacy flat stores, or a clear error
    when only uncommitted (crashed) version dirs exist — the root read
    would otherwise fail with an unhelpful schema-inference message."""
    vpath, _vn, max_n = _latest_store_version(spark, store_dir)
    if vpath is not None:
        return vpath
    if max_n > 0:
        raise ValueError(
            f"store at {store_dir} has no committed version — only "
            "uncommitted (crashed) writes; re-run the admission to "
            "rebuild it"
        )
    return store_dir


def update_distinct_store(
    spark,
    store_dir: str,
    df: DataFrame,
    key: Column | str,
    *,
    lg_k: int = 14,
) -> dict:
    """Admit a batch into a persisted DISTINCT-COUNT sketch — the
    cardinality sibling of the incremental admission stores (docs,
    embeddings, heavy hitters): per-batch cost is one scan + a 1-row
    aggregate, the store is ONE Datasketches HLL_4 sketch (~0.5·2^lg_k
    bytes, constant however much data has ever been admitted), and the
    lifetime estimate carries the standard HLL relative-error bound
    (~1.04/sqrt(2^lg_k) ≈ 0.8% at the default lg_k=14). Built entirely
    on Spark's native sketch expressions (hll_sketch_agg /
    hll_union_agg / hll_sketch_estimate — JVM-side, whole-stage
    codegen'd): HLL unions are register-wise max, so batch-at-a-time
    folding yields the SAME estimate as one aggregate over the union,
    for any batch split and order (pinned in tests/test_sketches.py).

    ``lg_k`` is persisted and a mismatched admission is rejected — a
    silent union across different lg_k would downgrade precision without
    the caller ever asking for it (same contract as the MG store's k).
    NULL keys are ignored (hll_sketch_agg skips them), matching
    approx_count_distinct's convention. Uses the same crash-safe
    versioned commit protocol as update_heavy_hitter_store.

    Returns ``{"n_seen": lifetime rows, "estimate": current distinct
    estimate (float)}``.
    """
    keyed = df.select(
        (F.col(key) if isinstance(key, str) else key).alias("key")
    ).filter(F.col("key").isNotNull())
    batch = keyed.agg(
        F.hll_sketch_agg("key", F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_seen"),
        F.lit(lg_k).cast("long").alias("lg_k"),
    )

    vpath, _vn, max_n = _latest_store_version(spark, store_dir)
    from movie_recommendation_etl_spark.operators.incremental_dedup import (
        _read_store,
    )

    # same crashed-first-admission bootstrap as the MG store above
    if vpath is None and max_n > 0:
        store = None
    else:
        store = _read_store(
            spark, vpath if vpath is not None else store_dir
        )
    if store is not None:
        prev = store.collect()  # bounded: exactly 1 row
        stored_lg_k = int(prev[0]["lg_k"])
        if stored_lg_k != lg_k:
            raise ValueError(
                f"distinct store at {store_dir} was built with "
                f"lg_k={stored_lg_k}; admitting with lg_k={lg_k} would "
                "silently change the precision the history was promised "
                f"— use the store's lg_k"
            )
        # fold: register-wise max of the two sketches + lifetime row sum;
        # a 2-row union into one 1-row aggregate, all JVM-side
        merged = store.unionByName(batch).agg(
            F.hll_union_agg("sketch").alias("sketch"),
            F.sum("n_seen").cast("long").alias("n_seen"),
            F.max("lg_k").cast("long").alias("lg_k"),
        )
    else:
        merged = batch
    out = merged.localCheckpoint(eager=True)  # bound re-execution: the
    # estimate read below and the store write must see ONE fold result
    out.coalesce(1).write.mode("errorifexists").parquet(
        f"{store_dir}/v_{max_n + 1}"
    )
    _prune_store_versions(spark, store_dir, keep_n=max_n + 1)
    row = out.select(
        F.hll_sketch_estimate("sketch").alias("est"), "n_seen"
    ).first()
    # a fresh store admitted an all-NULL/empty batch: the sketch (and so
    # the estimate) is NULL — that IS a distinct count of zero
    est = 0.0 if row["est"] is None else float(row["est"])
    return {"n_seen": int(row["n_seen"]), "estimate": est}


def read_distinct_estimate(spark, store_dir: str) -> dict:
    """The store's current lifetime estimate without admitting anything:
    ``{"n_seen", "estimate", "lg_k"}``. Reads the highest committed
    version (same protocol as the other stores)."""
    df = spark.read.parquet(_store_read_path(spark, store_dir))
    row = df.select(
        F.hll_sketch_estimate("sketch").alias("est"), "n_seen", "lg_k"
    ).first()
    return {
        "n_seen": int(row["n_seen"]),
        "estimate": 0.0 if row["est"] is None else float(row["est"]),
        "lg_k": int(row["lg_k"]),
    }
