"""Semantic tests for event-sequence analytics (behavioral.py) beyond
the oracle-equality gate."""

from __future__ import annotations

from datetime import datetime

import aws_iceberg_automation_spark.operators.behavioral as beh
from aws_iceberg_automation_spark.registry import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()

_SCHEMA = (
    "event_id long, ts timestamp, user_id long, "
    "event_type string, value double, props string"
)


def test_sequence_pattern_counts_known_journey(spark):
    """A hand-built stream must count exactly its non-overlapping
    view(click)*purchase runs: v c c p | v p = 2 matches; a purchase
    reached through an error must not match; an event stream with no
    views matches nothing."""
    rows = [
        (i, datetime(2024, 1, 1, 0, 0, i), 1, et, 0.0, "{}")
        for i, et in enumerate(
            ["view", "click", "click", "purchase", "view", "purchase",
             "view", "error", "purchase"]
        )
    ]
    rows.append((100, datetime(2024, 1, 1), 2, "signup", 0.0, "{}"))
    df = spark.createDataFrame(rows, _SCHEMA)
    orig = beh.load_table
    try:
        beh.load_table = lambda s, d, t: df if t == "events" else orig(s, d, t)
        out = {
            r.user_id: r
            for r in SPECS["q177_sequence_pattern"].fn(spark, SF_DIR).collect()
        }
    finally:
        beh.load_table = orig
    assert out[1].n_matches == 2 and out[1].matched
    assert out[1].n_events == 9
    assert out[2].n_matches == 0 and not out[2].matched
