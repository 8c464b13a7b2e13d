"""Pin the driver-side rounding replicas (functions/driver_exact.py)
against Spark's own ROUND — the exactness contract the round-12
driver-loop rewrites of qv18/qe33 rest on.

Spark's Round on DoubleType is BigDecimal.valueOf(x).setScale(scale,
HALF_UP); the helpers replicate it in Python's decimal domain from
repr(x) (the same shortest round-trip string Double.toString emits).
The value grid deliberately includes decimal-tie values (x.5 exactly
representable), near-tie neighbors one ulp either side, negatives,
subnormal-ish magnitudes and scientific-notation reprs — the cases
where the common floor(x*10^s + 0.5) shortcut diverges.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ml_data_wrangler_spark.functions.driver_exact import (
    ieee_div,
    round_half_up,
    round_long,
)

TIES = [0.5, 1.5, 2.5, -0.5, -1.5, -2.5, 1234567.5, -1234567.5]
NEAR = [
    2.4999999999999996,
    2.5000000000000004,
    -2.4999999999999996,
    0.49999999999999994,
]
SCALED = [
    0.1234565,
    0.12345650000000001,
    -0.1234565,
    0.1234575,
    1e-7,
    -1e-7,
    3.0000000000000004e-06,
    123456789.987654321,
    -0.0,
    0.0,
    math.pi,
    -math.e * 1e6,
]


@pytest.mark.parametrize("scale", [0, 6, 9, 12])
def test_round_half_up_matches_spark(spark, scale):
    vals = TIES + NEAR + SCALED
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r["r"]
        for r in df.select(F.round(F.col("x"), scale).alias("r")).collect()
    ]
    want = [round_half_up(v, scale) for v in vals]
    assert got == want


def test_round_long_matches_spark(spark):
    vals = TIES + NEAR + SCALED
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [
        r["r"]
        for r in df.select(
            F.round(F.col("x")).cast("long").alias("r")
        ).collect()
    ]
    want = [round_long(v) for v in vals]
    assert got == want


def test_round_helpers_nonfinite():
    assert math.isnan(round_half_up(math.nan, 6))
    assert round_half_up(math.inf, 6) == math.inf
    assert round_long(math.nan) == 0  # Java NaN→long cast
    assert round_long(math.inf) == (1 << 63) - 1
    assert round_long(-math.inf) == -(1 << 63)


def test_ieee_div_zero_denominator():
    assert math.isnan(ieee_div(0.0, 0.0))
    assert ieee_div(1.0, 0.0) == math.inf
    assert ieee_div(-1.0, 0.0) == -math.inf
    assert ieee_div(1.0, 2.0) == 0.5
