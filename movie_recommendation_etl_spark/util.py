"""Run logging + stage timing: parity for the reference's utility module
(utility/utility.py:3-21 — file+console logging and an H:M:S formatter its
stages wrap around every phase).

Differences from the reference, on purpose:
- ``setup_logging`` configures a NAMED logger, not the root logger — the
  reference mutates the root logger and re-adds handlers on every call, so
  a long-lived driver duplicates every line once per stage invocation; a
  named logger with idempotent handler setup logs each line once.
- ``stage_timer`` is a context manager so timing can't drift from the code
  it measures (the reference hand-computes ``time.time()`` deltas at each
  call site, transform/execute.py:305-318).
"""

from __future__ import annotations

import logging
import time
from contextlib import contextmanager

_FMT = "%(asctime)s  [%(threadName)-12.12s]  [%(levelname)-5.5s]  %(message)s"


def setup_logging(
    log_file_name: str | None = None,
    *,
    name: str = "movie_recommendation_etl_spark",
    level: int = logging.INFO,
) -> logging.Logger:
    """File + console logging in the reference's line format. Idempotent:
    calling again with the same name replaces handlers instead of stacking
    duplicates."""
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.propagate = False
    for h in list(logger.handlers):
        logger.removeHandler(h)
    formatter = logging.Formatter(_FMT)
    console = logging.StreamHandler()
    console.setFormatter(formatter)
    logger.addHandler(console)
    if log_file_name:
        fh = logging.FileHandler(log_file_name)
        fh.setFormatter(formatter)
        logger.addHandler(fh)
    return logger


def format_time(seconds: float) -> str:
    """H/M/S string, reference format (utility/utility.py:18-21)."""
    hours, remainder = divmod(seconds, 3600)
    minutes, secs = divmod(remainder, 60)
    return (
        f"{int(hours)} hours, {int(minutes)} minutes, {int(secs)} seconds"
    )


@contextmanager
def stage_timer(logger: logging.Logger, stage: str):
    """Log a stage's start and its wall time on exit (success or failure —
    the reference only logged the success path, so failed stages left no
    timing record)."""
    logger.info("%s: started", stage)
    t0 = time.monotonic()
    try:
        yield
    except BaseException:
        logger.info(
            "%s: FAILED after %s",
            stage,
            format_time(time.monotonic() - t0),
        )
        raise
    logger.info(
        "%s: completed in %s", stage, format_time(time.monotonic() - t0)
    )
