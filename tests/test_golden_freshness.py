"""Golden-freshness gate (VERDICT r4 task 7): each of the 5 frozen
``_pinned_sql.py`` goldens is regenerated from a LIVE sf0.01 run of the
current code and byte-compared against the pinned VALUES — proving the
goldens describe the code as it is now, not as it was when pinned.

The 5 pinned queries are exactly the genuinely non-SQL-replayable ones
(engine-internal HLL++, zlib bytes, seeded RNG, lossy JPEG, the app
float-FFT chain); each is deterministic *within this environment*
(fixed Spark/numpy/zlib versions, fixed seed, fixed fixtures), so a
byte-level mismatch means the producing code changed — the exact drift
this test exists to catch. ``repr(float)`` round-trips the identical
double, so float columns compare exactly, not approximately.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from braintumor_data_pipeline_spark import registry
from braintumor_data_pipeline_spark.operators import _pinned_sql
from tools.pin_oracle import pin_sql

PINNED = sorted(
    n for n, e in registry.all_queries().items() if e.pinned_sf == "sf0.01"
)


def test_exactly_five_goldens_remain():
    # The frozen tier must only ever shrink (r4: 11 -> 5); growing it
    # means a recomputing oracle was demoted — that needs a VERDICT-level
    # justification, not a silent registry edit.
    assert len(PINNED) == 5, PINNED


@pytest.mark.parametrize("name", PINNED)
def test_golden_matches_live_run(spark, name):
    fresh_sql, n_rows = pin_sql(name)
    pinned = getattr(_pinned_sql, f"{name.upper()}_PINNED")
    assert fresh_sql == pinned, (
        f"{name}: live sf0.01 output diverged from the frozen golden "
        f"({n_rows} live rows) — the producing code changed since the "
        f"golden was pinned; re-pin with tools/pin_oracle.py {name} and "
        f"document why in the commit"
    )
