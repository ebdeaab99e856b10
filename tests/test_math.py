"""Decision-math goldens from the reference's unit tests.

Golden sources:
* CI(r=0.1, k=13, len=35, conf=0.95) = [5, 30]
  (reference: src/test/libIBFTests/read.hpp:148-151)
* threshold for that read = 35 - 13 + 1 - 30 = -7, which through the
  int16 -> uint16 parameter chain becomes 65529 (matches nothing)
  (reference: src/IBF/IBFClassify.cpp:109 + :51)
"""

import numpy as np
import pytest

from readbouncer_tpu.classify.math import (
    calculate_ci,
    ci_and_threshold_batch,
    match_threshold,
    normal_cdf_inverse,
)


def test_normal_cdf_inverse_95():
    # Abramowitz-Stegun approximation: |err| < 4.5e-4 vs the true 1.959964
    assert abs(normal_cdf_inverse(0.975) - 1.959964) < 4.5e-4
    assert abs(normal_cdf_inverse(0.025) + 1.959964) < 4.5e-4


def test_normal_cdf_inverse_domain():
    with pytest.raises(ValueError):
        normal_cdf_inverse(0.0)
    with pytest.raises(ValueError):
        normal_cdf_inverse(1.0)


def test_ci_golden_35bp():
    assert calculate_ci(0.1, 13, 35, 0.95) == (5, 30)


def test_threshold_golden_35bp_wraps():
    # raw threshold -7 wraps to 65529: the read can never match any bin
    assert match_threshold(35, 13, 0.1, 0.95) == (-7) & 0xFFFF == 65529


def test_threshold_positive_longer_read():
    # 250bp at r=0.1 gives a usable positive threshold
    thr = match_threshold(250, 13, 0.1, 0.95)
    assert 0 < thr < 250 - 13 + 1


def test_batch_matches_scalar():
    lens = np.array([13, 14, 20, 35, 100, 250, 360, 719, 1500, 65535, 70000])
    for r, sig in [(0.1, 0.95), (0.08, 0.95), (0.12, 0.9)]:
        batch = ci_and_threshold_batch(lens, 13, r, sig)
        for i, L in enumerate(lens):
            assert batch[i] == match_threshold(int(L), 13, r, sig), (L, r, sig)


def test_batch_short_reads_never_match():
    thr = ci_and_threshold_batch(np.array([0, 1, 5, 12]), 13, 0.1, 0.95)
    assert (thr == 0xFFFF).all()


def test_ci_monotone_in_length():
    # upper CI bound grows with read length (sanity on the variance model)
    highs = [calculate_ci(0.1, 13, L, 0.95)[1] for L in (50, 100, 200, 400, 800)]
    assert highs == sorted(highs)
