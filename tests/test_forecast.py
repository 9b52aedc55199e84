"""Forecast operator unit tests: reference guard/clamp semantics
(reference api/main.py:862-915) beyond the oracle-parity checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from intellect_bi_spark.operators.forecast import (
    _clamp,
    daily_series,
    forecast_payload,
)


def test_clamps():
    assert _clamp(1000, 7, 100) == (365, 7)
    assert _clamp(0, 0, 100) == (1, 1)
    assert _clamp(30, 99, 10) == (30, 10)


def test_payload_shape(spark, sf_dir):
    df = forecast_payload(spark, sf_dir, h=5, algo="ma7_baseline", window=7)
    assert df.columns == ["series", "date", "value"]
    counts = {
        r["series"]: r["n"]
        for r in df.groupBy("series").agg(F.count("*").alias("n")).collect()
    }
    n_hist = daily_series(spark, sf_dir).count()
    assert counts == {"history": n_hist, "forecast": 5}


def test_ma_forecast_is_flat(spark, sf_dir):
    df = forecast_payload(spark, sf_dir, h=10, algo="ma7_baseline", window=7)
    vals = [
        r["value"]
        for r in df.filter(F.col("series") == "forecast").collect()
    ]
    assert len(set(vals)) == 1


def test_seasonal7_cycles(spark, sf_dir):
    df = forecast_payload(spark, sf_dir, h=14, algo="seasonal7", window=7)
    fc = (
        df.filter(F.col("series") == "forecast").orderBy("date").collect()
    )
    first_week = [r["value"] for r in fc[:7]]
    second_week = [r["value"] for r in fc[7:14]]
    assert first_week == second_week
    # cycle equals the last 7 history values in date order
    hist = (
        df.filter(F.col("series") == "history").orderBy("date").collect()
    )
    assert first_week == [r["value"] for r in hist[-7:]]


def test_drift_is_linear(spark, sf_dir):
    df = forecast_payload(spark, sf_dir, h=6, algo="drift", window=14)
    fc = [
        r["value"]
        for r in df.filter(F.col("series") == "forecast")
        .orderBy("date")
        .collect()
    ]
    diffs = {round(b - a, 6) for a, b in zip(fc, fc[1:])}
    assert len(diffs) == 1  # constant slope


def test_pandas_twin_matches_closed_form(spark, sf_dir):
    from intellect_bi_spark.operators.forecast import (
        drift_by_region,
        drift_by_region_pandas,
    )

    a = {
        (r["region"], r["date"]): r["value"]
        for r in drift_by_region(spark, sf_dir).collect()
    }
    b = {
        (r["region"], r["date"]): r["value"]
        for r in drift_by_region_pandas(spark, sf_dir).collect()
    }
    assert a == b  # bit-identical: same IEEE ops on the same decimal sums


def test_mllib_linreg_matches_closed_form_ols(spark, sf_dir):
    import numpy as np

    from intellect_bi_spark.operators.forecast import (
        daily_series,
        forecast_linreg_ols,
        forecast_mllib_linreg,
    )

    rows = daily_series(spark, sf_dir).orderBy("date").collect()
    d0 = rows[0]["date"]
    t = np.array([(r["date"] - d0).days for r in rows], dtype=float)
    y = np.array([r["value"] for r in rows])
    slope, intercept = np.polyfit(t, y, 1)
    fc = forecast_mllib_linreg(spark, sf_dir, h=5).orderBy("date").collect()
    t1 = t[-1]
    for i, r in enumerate(fc, start=1):
        want = intercept + slope * (t1 + i)
        assert abs(r["value"] - want) <= 1e-6 * max(1.0, abs(want))
    assert len(fc) == 5
    # the exact-decimal registry query agrees with the MLlib fit to 1e-9
    # relative — the contract for swapping richer MLlib models behind the
    # oracle-verified closed form
    ols = forecast_linreg_ols(spark, sf_dir, h=5).orderBy("date").collect()
    assert len(ols) == 5
    for a, b in zip(fc, ols):
        assert a["date"] == b["date"]
        assert abs(a["value"] - b["value"]) <= 1e-9 * max(1.0, abs(b["value"]))
