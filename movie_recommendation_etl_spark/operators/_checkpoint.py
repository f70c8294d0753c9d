"""Scoped reliable checkpointing for iterative operators.

``SparkContext.setCheckpointDir`` is process-global and reliable checkpoint
files are never deleted by Spark itself (``cleanCheckpoints`` defaults to
false) — so an operator that just sets the dir and checkpoints every round
both hijacks later ``checkpoint()`` calls elsewhere in the session and
leaks one full frame copy per iteration onto HDFS/S3. This helper gives
operators a scope that (a) restores the previous checkpoint BASE dir on
exit and (b) deletes the run's own checkpoint subdirectory once the scope
closes. Durability is preserved where it matters: DURING the iteration
(executor loss mid-run recovers from reliable storage); the final result is
the caller's to persist.

Restore semantics (r5 ADVICE): ``SparkContext.setCheckpointDir(base)``
stores ``base/<uuid>`` as the context's checkpoint dir, so naively
restoring ``getCheckpointDir()`` re-bases onto the PREVIOUS RUN DIR and
every scope nests one uuid level deeper. This module therefore tracks the
last BASE dir it set per application itself; when no base is known (the
session never had a checkpoint dir, or one was set outside this module
before the first scope) the scope exit unsets the dir / falls back to the
observed run dir respectively. Cleanup runs in a ``finally``: on an
exception inside the scope the run's reliable files are deleted too (the
iteration failed; frames checkpointed into the scope are not reusable
after it exits — by contract callers detach results before returning).
"""

from __future__ import annotations

from contextlib import contextmanager

# Last checkpoint BASE dir set through this module, per Spark application.
# SparkContext only exposes the uuid-suffixed run dir, so the base must be
# tracked on the Python side to restore without nesting.
_LAST_BASE: dict[str, str | None] = {}

# Active scopes per application, innermost last. Each frame records the
# scope's base dir and EVERY uuid run dir minted under it: the entry-time
# one, plus one per nested-scope exit (restoring an outer base calls
# setCheckpointDir(base) again, which mints a fresh run dir that subsequent
# outer checkpoints land in). Without this ledger a scope containing two or
# more nested scopes leaks the intermediate run dirs — it could only see
# the entry-time and exit-time ones (r7 review finding).
#
# CONCURRENCY: scopes must be opened/closed from ONE thread at a time per
# application — the underlying SparkContext checkpoint dir is itself a
# process-global, so interleaved scopes from two threads are semantically
# broken regardless of this module's bookkeeping (each thread's reliable
# checkpoints would land under whichever base was set last). The guard
# below WARNS (RuntimeWarning) on detectable interleaving and still runs
# this frame's cleanup rather than silently skipping it; drained stacks
# are removed so the registry does not grow with application ids.
_SCOPE_STACK: dict[str, list[dict]] = {}


@contextmanager
def reliable_checkpoint_scope(spark, checkpoint_dir: str | None):
    """Context manager yielding a ``ckpt(df)`` function.

    With ``checkpoint_dir`` None: ``ckpt`` = localCheckpoint (no global
    state touched). Otherwise: sets the context checkpoint dir for the
    scope, ``ckpt`` = reliable checkpoint, and on exit restores the
    previous BASE dir (or unsets it) and deletes the run's checkpoint
    files. Callers MUST localCheckpoint (or write out) anything they
    return, because the reliable files are gone after the scope closes.
    """
    sc = spark.sparkContext
    if checkpoint_dir is None:
        yield lambda df: df.localCheckpoint(eager=True)
        return

    jsc = sc._jsc.sc()
    app_id = sc.applicationId
    if app_id in _LAST_BASE:
        prev_base = _LAST_BASE[app_id]
    else:
        # A dir set outside this module (or never): we can only observe the
        # uuid run dir. Best effort — restore that run dir as the new base
        # (checkpoints still land under the user's tree, one level deeper);
        # subsequent scopes restore from _LAST_BASE and no longer nest.
        prev = jsc.getCheckpointDir()
        prev_base = prev.get() if prev.isDefined() else None
    sc.setCheckpointDir(checkpoint_dir)
    _LAST_BASE[app_id] = checkpoint_dir
    run_dir = jsc.getCheckpointDir().get()
    stack = _SCOPE_STACK.setdefault(app_id, [])
    frame = {"base": checkpoint_dir, "dirs": [run_dir]}
    stack.append(frame)
    try:
        yield lambda df: df.checkpoint(eager=True)
    finally:
        jvm = spark._jvm
        # Safety net: the run dir current AT EXIT should be the last entry
        # in this frame's ledger, but an external setCheckpointDir(base)
        # inside the scope would mint one the ledger never saw.
        cur = jsc.getCheckpointDir()
        cur_dir = cur.get() if cur.isDefined() else None
        if cur_dir is not None and cur_dir not in frame["dirs"]:
            frame["dirs"].append(cur_dir)
        for i in range(len(stack) - 1, -1, -1):
            if stack[i] is frame:
                if i != len(stack) - 1:
                    import warnings

                    warnings.warn(
                        "reliable_checkpoint_scope frames exited out of "
                        "order — scopes interleaved (multi-threaded use?); "
                        "checkpoint-dir restore semantics are undefined",
                        RuntimeWarning,
                        stacklevel=3,
                    )
                del stack[i]
                break
        if not stack:
            _SCOPE_STACK.pop(app_id, None)
        # Restore session state BEFORE any FS delete so a transient delete
        # failure can never leave the session pointing at a half-deleted
        # run dir or the module's base tracking stale.
        if prev_base is not None:
            sc.setCheckpointDir(prev_base)
            # the restore minted a fresh run dir under prev_base; register
            # it with the enclosing scope so IT gets cleaned at that
            # scope's exit (this was the 2+-nested-scope leak)
            restored = jsc.getCheckpointDir()
            if stack and restored.isDefined():
                outer = stack[-1]
                if outer["base"] == prev_base:
                    outer["dirs"].append(restored.get())
        else:
            # no prior dir: unset rather than leave the session pointing at
            # the just-deleted run dir (checkpointDir is a plain scala var;
            # package-private compiles to a public accessor)
            getattr(jsc, "checkpointDir_$eq")(jvm.scala.Option.apply(None))
        _LAST_BASE[app_id] = prev_base
        hconf = sc._jsc.hadoopConfiguration()
        base_path = jvm.org.apache.hadoop.fs.Path(checkpoint_dir)
        fs = base_path.getFileSystem(hconf)
        base_q = fs.makeQualified(base_path)
        for d in frame["dirs"]:
            p = jvm.org.apache.hadoop.fs.Path(d)
            # only ever delete uuid run dirs directly under THIS scope's
            # base — never a dir some other owner could have minted
            if fs.makeQualified(p).getParent().equals(base_q):
                fs.delete(p, True)
