"""Logging / error-recorder subsystem (reference: vendored TRT logger
demo/3rdparty/tensorrtbuffer/include/logging.h, error_recorder.h, and
checkMacrosPlugin's PLUGIN_ASSERT)."""

import logging as std_logging
import threading

import pytest

from lightglue_tpu.utils.logging import (
    ErrorRecorder,
    check,
    get_logger,
    set_level,
)


def test_logger_hierarchy_and_severity():
    root = get_logger()
    child = get_logger("session")
    assert child.name == "lightglue_tpu.session"
    set_level("ERROR")
    assert root.level == std_logging.ERROR
    assert not child.isEnabledFor(std_logging.WARNING)
    set_level("VERBOSE")
    assert child.isEnabledFor(std_logging.DEBUG)
    set_level("WARNING")  # restore default
    with pytest.raises(ValueError):
        set_level("LOUD")


def test_error_recorder_capacity_and_clear():
    rec = ErrorRecorder(capacity=2)
    assert rec.num_errors == 0
    rec.record("first")
    rec.record("second")
    rec.record("third")  # beyond capacity -> overflow flag, not growth
    assert rec.num_errors == 2
    assert rec.has_overflowed
    assert rec.error_desc(0) == "first"
    with pytest.raises(RuntimeError, match="first; second; ..."):
        rec.raise_if_any()
    rec.clear()
    assert rec.num_errors == 0 and not rec.has_overflowed
    rec.raise_if_any()  # no-op when empty


def test_error_recorder_thread_safety():
    rec = ErrorRecorder(capacity=10_000)

    def worker(i):
        for j in range(100):
            rec.record(f"{i}:{j}")

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert rec.num_errors == 800
    assert not rec.has_overflowed


def test_check_logs_and_raises(caplog):
    check(True, "fine")
    # the package root has propagate=False (it owns its stderr handler);
    # re-enable propagation so caplog's handler sees the record
    root = get_logger()
    root.propagate = True
    try:
        with caplog.at_level(std_logging.ERROR, logger="lightglue_tpu"):
            with pytest.raises(AssertionError, match="bad shape"):
                check(False, "bad shape")
    finally:
        root.propagate = False
    assert any("bad shape" in r.message for r in caplog.records)
