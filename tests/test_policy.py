"""Decision-policy branch coverage (reference: src/main/classify.hpp:58-111,
src/main/adaptive_sampling.hpp:35-113)."""

import numpy as np
import pytest

from readbouncer_tpu.classify.policy import (
    DECISION_NONE,
    DECISION_STOP_RECEIVING,
    DECISION_UNBLOCK,
    best_filter_index,
    classify_decisions,
    live_decisions,
)


def col(*vals):
    return np.array(vals).reshape(len(vals), 1)


def test_best_filter_index_first_max_wins():
    counts = np.array([[5, 9, 9], [0, 0, 0], [3, 0, 0]])
    np.testing.assert_array_equal(best_filter_index(counts), [1, -1, 0])


def test_classify_both_kinds_all_branches():
    # rows: (t, d, t2, d2)
    t = col(10, 10, 10, 0, 0, 10, 10)
    d = col(0, 5, 5, 5, 0, 5, 5)
    t2 = col(9, 8, 0, 0, 0, 8, 0)
    d2 = col(0, 0, 4, 4, 0, 4, 4)
    ok, best = classify_decisions(t, d, t2, d2)
    #      t>0,d=0 -> classified
    #      t>0,d>0, retry t2>0,d2=0 -> classified
    #      t>0,d>0, retry t2=0 -> not
    #      t=0 -> not (even though d>0)
    #      nothing -> not
    #      t>0,d>0, retry both>0 -> not
    #      t>0,d>0, retry only d2 -> not
    np.testing.assert_array_equal(ok, [True, True, False, False, False, False, False])
    np.testing.assert_array_equal(best, [0, 0, -1, -1, -1, -1, -1])


def test_classify_deplete_only():
    d = col(3, 0)
    ok, best = classify_decisions(None, d, None, d)
    np.testing.assert_array_equal(ok, [True, False])
    np.testing.assert_array_equal(best, [-1, -1])


def test_classify_target_only_best_index():
    t = np.array([[0, 7], [0, 0]])
    ok, best = classify_decisions(t, None, t, None)
    np.testing.assert_array_equal(ok, [True, False])
    np.testing.assert_array_equal(best, [1, -1])


def test_live_both_kinds():
    d = col(5, 5, 5, 0, 0, 5)
    t = col(0, 5, 5, 5, 0, 5)
    d2 = col(4, 4, 0, 0, 0, 4)
    t2 = col(0, 0, 0, 4, 0, 4)
    out = live_decisions(d, t, d2, t2)
    np.testing.assert_array_equal(
        out,
        [
            DECISION_UNBLOCK,  # deplete only
            DECISION_UNBLOCK,  # both -> retry deplete-only
            DECISION_NONE,  # both -> retry neither... (d2>0,t2=0)? no: d2=0 here
            DECISION_STOP_RECEIVING,  # target only
            DECISION_NONE,  # nothing
            DECISION_NONE,  # both -> retry both
        ],
    )


def test_live_both_retry_matrix():
    # both matched at base rate; the retry decides
    d = col(5, 5, 5, 5)
    t = col(5, 5, 5, 5)
    d2 = col(4, 4, 0, 0)
    t2 = col(0, 4, 4, 0)
    out = live_decisions(d, t, d2, t2)
    np.testing.assert_array_equal(
        out, [DECISION_UNBLOCK, DECISION_NONE, DECISION_NONE, DECISION_NONE]
    )


def test_live_deplete_only_mode():
    d = col(1, 0)
    out = live_decisions(d, None, d, None)
    np.testing.assert_array_equal(out, [DECISION_UNBLOCK, DECISION_NONE])


def test_live_target_only_mode_unblocks_off_target():
    t = col(1, 0)
    out = live_decisions(None, t, None, t)
    np.testing.assert_array_equal(out, [DECISION_STOP_RECEIVING, DECISION_UNBLOCK])


def test_no_filters_raises():
    with pytest.raises(ValueError):
        classify_decisions(None, None, None, None)
    with pytest.raises(ValueError):
        live_decisions(None, None, None, None)
