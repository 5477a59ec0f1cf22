"""Ground-truth tests for the statistical-QC models (z-score outliers,
bounded moving-average window) on tiny hand-computed corpora — the oracle
differential proves engine agreement; these prove the math itself."""

from __future__ import annotations

import datetime
import statistics

from bread_spark.models import daily_value_moving_avg, value_zscore_outliers


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    df.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_zscore_flags_exactly_the_planted_outlier(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    # one planted spike; baseline must be large enough that a single
    # outlier CAN exceed z=3 (max attainable z is (n-1)/sqrt(n))
    vals = [10.0 + 0.1 * (i % 7) for i in range(29)] + [1000.0]
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 1, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = value_zscore_outliers(spark, sf).collect()
    assert [r["event_id"] for r in out] == [29]
    mu, sigma = statistics.mean(vals), statistics.stdev(vals)
    assert abs(out[0]["z"] - round((1000.0 - mu) / sigma, 4)) < 1e-9


def test_moving_avg_frame_shrinks_at_partition_start(spark, tmp_path):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (d, t0 + datetime.timedelta(days=d), 1, "click", float(d + 1), "{}")
        for d in range(10)
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r["day"].day: r["ma7"]
        for r in daily_value_moving_avg(spark, sf).collect()
    }
    # day k (0-based value k+1): avg of last min(k+1, 7) daily values
    for d in range(10):
        window = [v + 1 for v in range(max(0, d - 6), d + 1)]
        assert abs(got[d + 1] - round(sum(window) / len(window), 4)) < 1e-9
