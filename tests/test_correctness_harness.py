"""Sensitivity tests for the oracle-gate harness itself
(tools/check_correctness.py): a gate is only as good as its ability to
FAIL, so pin that canon+value_match catch every drift class the driver's
t2 compare is meant to catch — value changes (exact vs close), row
drops, column renames, row-order shuffles (must NOT fail), NaN placement,
and integer-vs-string dtype confusion."""

from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import pandas as pd

_spec = importlib.util.spec_from_file_location(
    "check_correctness",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "tools", "check_correctness.py"),
)
cc = importlib.util.module_from_spec(_spec)
sys.modules["check_correctness"] = cc
_spec.loader.exec_module(cc)


def _pdf(rows, cols):
    return pd.DataFrame(rows, columns=cols)


def test_identical_frames_match():
    a = _pdf([(1, "x", 1.5), (2, "y", 2.5)], ["k", "s", "v"])
    exact, close, _ = cc.value_match(cc.canon(a), cc.canon(a.copy()))
    assert exact and close


def test_row_order_is_insensitive():
    a = _pdf([(1, 1.0), (2, 2.0)], ["k", "v"])
    b = _pdf([(2, 2.0), (1, 1.0)], ["k", "v"])
    exact, close, _ = cc.value_match(cc.canon(a), cc.canon(b))
    assert exact


def test_value_drift_detected_exact_vs_close():
    a = _pdf([(1, 1.0)], ["k", "v"])
    tiny = _pdf([(1, 1.0 + 1e-9)], ["k", "v"])   # inside rtol: close only
    big = _pdf([(1, 1.1)], ["k", "v"])           # outside rtol: hard fail
    exact, close, _ = cc.value_match(cc.canon(a), cc.canon(tiny))
    assert not exact and close
    exact, close, detail = cc.value_match(cc.canon(a), cc.canon(big))
    assert not exact and not close and "v" in detail


def test_row_count_drift_detected():
    a = _pdf([(1, 1.0), (2, 2.0)], ["k", "v"])
    b = _pdf([(1, 1.0)], ["k", "v"])
    exact, close, detail = cc.value_match(cc.canon(a), cc.canon(b))
    assert not exact and not close and "rows" in detail


def test_column_rename_detected():
    a = _pdf([(1,)], ["total"])
    b = _pdf([(1,)], ["sum_total"])
    exact, close, detail = cc.value_match(cc.canon(a), cc.canon(b))
    assert not exact and "columns" in detail


def test_nan_placement_matters():
    a = _pdf([(1, np.nan), (2, 2.0)], ["k", "v"])
    same = _pdf([(2, 2.0), (1, np.nan)], ["k", "v"])
    moved = _pdf([(1, 2.0), (2, np.nan)], ["k", "v"])
    exact, _, _ = cc.value_match(cc.canon(a), cc.canon(same))
    assert exact
    exact, close, _ = cc.value_match(cc.canon(a), cc.canon(moved))
    assert not exact and not close


def test_int_float_representation_not_conflated():
    # 1 (int) vs 1.0 (float) compare as floats -> equal is CORRECT here
    # (engines legitimately differ in BIGINT vs DOUBLE only when the
    # schema says so; schema drift is caught by the dtype column set),
    # but a true value difference through the float path must still fail
    a = _pdf([(1,)], ["v"]).astype(float)
    b = _pdf([(2,)], ["v"]).astype(int)
    exact, close, _ = cc.value_match(cc.canon(a), cc.canon(b))
    assert not exact and not close
