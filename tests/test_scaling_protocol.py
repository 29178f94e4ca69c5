"""Pure-python pins for the scaling-gate protocol (scripts/scaling_bench.py).

The r5 amendments exist because one measured session read a physically
implausible 1.247 "efficiency" (a contention burst degraded the local[2] leg
between the bracketing probes) and the median-of-two picked it as the
headline.  These tests pin the honest behavior: true medians, and
superlinear pairs disqualified from the quiet set.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)


def _median_eff(pairs):
    # mirror of scaling_bench.main's inner median_eff (kept in sync by the
    # synthetic-session test below importing the real module constants)
    effs = sorted(p["efficiency"] for p in pairs)
    mid = len(effs) // 2
    if len(effs) % 2 == 0:
        return round((effs[mid - 1] + effs[mid]) / 2.0, 4)
    return effs[mid]


def test_true_median_even_count_averages_middle_two():
    pairs = [{"efficiency": 0.675}, {"efficiency": 1.247}]
    # the buggy effs[len//2] read 1.247; the true median is 0.961
    assert _median_eff(pairs) == 0.961


def test_true_median_odd_count_is_middle():
    pairs = [{"efficiency": e} for e in (0.7, 0.8, 0.9)]
    assert _median_eff(pairs) == 0.8


def test_superlinear_pair_is_disqualified():
    from scaling_bench import (
        MEMBW_QUIET_CEILING,
        MEMBW_QUIET_THRESHOLD,
        QUIET_THRESHOLD,
    )

    # replicate measured_pair's quiet predicate on a synthetic superlinear
    # pair whose probes all read idle: the efficiency guard must reject it
    probe_before = probe_after = QUIET_THRESHOLD + 0.05
    membw = (MEMBW_QUIET_THRESHOLD + MEMBW_QUIET_CEILING) / 2.0
    n_fps, n4_fps = 8854.11, 44166.31  # the observed contaminated pair
    eff = n4_fps / n_fps / 4.0
    assert eff > 1.05  # this pair reads superlinear
    quiet = (
        min(probe_before, probe_after) >= QUIET_THRESHOLD
        and membw >= MEMBW_QUIET_THRESHOLD
        and membw <= MEMBW_QUIET_CEILING
        and eff <= 1.05
    )
    assert not quiet


def test_measured_pair_source_contains_guard():
    # the guard must live in the REAL measured_pair, not just this mirror
    import inspect

    import scaling_bench

    src = inspect.getsource(scaling_bench.measured_pair)
    assert "1.05" in src
    src_main = inspect.getsource(scaling_bench.main)
    assert "mid - 1" in src_main  # true-median branch present
