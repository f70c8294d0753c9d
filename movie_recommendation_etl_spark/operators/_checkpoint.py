"""Scoped reliable checkpointing for iterative operators.

``SparkContext.setCheckpointDir`` is process-global and reliable checkpoint
files are never deleted by Spark itself (``cleanCheckpoints`` defaults to
false) — so an operator that just sets the dir and checkpoints every round
both hijacks later ``checkpoint()`` calls elsewhere in the session and
leaks one full frame copy per iteration onto HDFS/S3. This helper gives
operators a scope that (a) restores the previous checkpoint dir on exit and
(b) deletes the run's own checkpoint subdirectory after the caller has
localCheckpoint'ed its final result off the reliable files. Durability is
preserved where it matters: DURING the iteration (executor loss mid-run
recovers from reliable storage); the final result is the caller's to
persist.
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def reliable_checkpoint_scope(spark, checkpoint_dir: str | None):
    """Context manager yielding a ``ckpt(df)`` function.

    With ``checkpoint_dir`` None: ``ckpt`` = localCheckpoint (no global
    state touched). Otherwise: sets the context checkpoint dir for the
    scope, ``ckpt`` = reliable checkpoint, and on successful exit restores
    the previous dir and deletes the run's checkpoint files. Callers MUST
    localCheckpoint (or write out) anything they return, because the
    reliable files are gone after the scope closes.
    """
    sc = spark.sparkContext
    if checkpoint_dir is None:
        yield lambda df: df.localCheckpoint(eager=True)
        return

    jsc = sc._jsc.sc()
    prev = jsc.getCheckpointDir()
    prev_dir = prev.get() if prev.isDefined() else None
    sc.setCheckpointDir(checkpoint_dir)
    # the actual run dir is <checkpoint_dir>/<uuid> — capture it for cleanup
    run_dir = jsc.getCheckpointDir().get()
    try:
        yield lambda df: df.checkpoint(eager=True)
        # success: the caller has detached its result; drop the run's files
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(run_dir)
        hpath.getFileSystem(sc._jsc.hadoopConfiguration()).delete(hpath, True)
    finally:
        if prev_dir is not None:
            sc.setCheckpointDir(prev_dir)
