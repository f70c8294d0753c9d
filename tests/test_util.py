"""util.py: reference-parity logging + timing helpers."""

from __future__ import annotations

import logging

import pytest

from movie_recommendation_etl_spark.util import (
    format_time,
    setup_logging,
    stage_timer,
)


def test_format_time_reference_format():
    assert format_time(0) == "0 hours, 0 minutes, 0 seconds"
    assert format_time(3723.9) == "1 hours, 2 minutes, 3 seconds"
    assert format_time(59) == "0 hours, 0 minutes, 59 seconds"


def test_setup_logging_idempotent(tmp_path):
    log_file = str(tmp_path / "run.log")
    a = setup_logging(log_file, name="t_util")
    b = setup_logging(log_file, name="t_util")
    assert a is b
    # the reference stacks handlers per call on the root logger; ours must
    # not duplicate
    assert len(b.handlers) == 2
    b.info("hello once")
    for h in b.handlers:
        h.flush()
    assert open(log_file).read().count("hello once") == 1


def test_stage_timer_logs_failure_too(tmp_path):
    log_file = str(tmp_path / "run2.log")
    logger = setup_logging(log_file, name="t_util2")
    with stage_timer(logger, "ok_stage"):
        pass
    with pytest.raises(RuntimeError):
        with stage_timer(logger, "bad_stage"):
            raise RuntimeError("boom")
    for h in logger.handlers:
        h.flush()
    content = open(log_file).read()
    assert "ok_stage: completed in" in content
    assert "bad_stage: FAILED after" in content
