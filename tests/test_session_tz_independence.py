"""The driver's harness runs queries in ITS session (timezone unknown).
Sessionization must produce identical output under any session timezone —
naive-timestamp arithmetic only, no zone-dependent casts."""

import pytest

from pagerank_optimization_spark.operators.sessions import session_stats, sessionize


def test_sessionize_session_tz_independent(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").cache()
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = sorted(map(tuple, sessionize(ev, gap_seconds=1800).collect()))
        utc_stats = sorted(map(tuple, session_stats(ev, gap_seconds=1800).collect()))
        # a zone with DST and large offset — zone-dependent epoch math
        # would shift gaps across DST transitions
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = sorted(map(tuple, sessionize(ev, gap_seconds=1800).collect()))
        ny_stats = sorted(map(tuple, session_stats(ev, gap_seconds=1800).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert utc == ny
    assert utc_stats == ny_stats
