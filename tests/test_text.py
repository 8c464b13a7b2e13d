"""Property/metamorphic tests for the text functions (SURVEY.md §5.4):
cleanse idempotence, PII-scrub completeness, junk-line intent (defect
D2 resolution)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ml_data_wrangler_spark.functions.text import (
    PII_RES,
    cleanse_lines,
    cleanse_text,
    pii_scrub,
    tokenize,
)

DIRTY = [
    "Hello &amp; welcome to the team!",
    "contact me at bob@example.com please",
    "line with url http://example.com/x?q=1 inside",
    "550e8400-e29b-41d4-a716-446655440000",
    "d41d8cd98f00b204e9800998ecf8427e",
    "192.168.0.1",
    "½ cup of sugar\r\nsecond line",
    "!!!",
    "",
    "Visit https://spark.apache.org for docs",
]


@pytest.fixture(scope="module")
def dirty_df(spark):
    return spark.createDataFrame([Row(id=i, text=t) for i, t in enumerate(DIRTY)])


def test_cleanse_drops_pure_pii_and_junk_lines(spark, dirty_df):
    out = {r["id"]: r["lines"] for r in dirty_df.select(
        "id", cleanse_lines(F.col("text")).alias("lines")).collect()}
    # natural-language lines SURVIVE (defect D2: literal isalnum would kill them)
    assert out[0] == ["Hello & welcome to the team!"]
    # pure-PII lines are dropped
    assert out[3] == [] and out[4] == [] and out[5] == []
    # junk-only and empty lines are dropped
    assert out[7] == [] and out[8] == []
    # NFKC normalization: ½ → "1⁄2" contains alnum, line survives normalized
    assert any("1" in ln for ln in out[6])
    # CR/LF handling: two lines preserved separately
    assert len(out[6]) == 2


def test_cleanse_idempotent(spark, dirty_df):
    once = dirty_df.select("id", cleanse_text(F.col("text")).alias("t"))
    twice = once.select("id", cleanse_text(F.col("t")).alias("t"))
    assert [r["t"] for r in once.orderBy("id").collect()] == [
        r["t"] for r in twice.orderBy("id").collect()
    ]


def test_pii_scrub_removes_every_validator_match(spark, dirty_df):
    scrubbed = dirty_df.select(pii_scrub(F.col("text")).alias("t")).collect()
    pats = [re.compile(p) for p in PII_RES]
    for r in scrubbed:
        for word in r["t"].split():
            assert not any(p.match(word) for p in pats), word
    # non-PII words survive (defect D4: char-iteration scrubbed nothing/everything)
    joined = " ".join(r["t"] for r in scrubbed)
    assert "contact me at" in joined and "please" in joined
    assert "bob@example.com" not in joined


def test_tokenize(spark):
    df = spark.createDataFrame([Row(text="The quick-brown FOX, jumps 42 times!")])
    toks = df.select(tokenize(F.col("text")).alias("t")).collect()[0]["t"]
    assert toks == ["the", "quick", "brown", "fox", "jumps", "times"]


def test_max_multiplicity_fold(spark):
    from pyspark.sql import functions as F

    from ml_data_wrangler_spark.functions.textstats import max_multiplicity

    rows = spark.createDataFrame(
        [
            (1, ["a", "b", "a", "c", "a"]),
            (2, ["x"]),
            (3, []),
            (4, ["t", "t", "s", "s", "s", "t"]),
        ],
        "id int, l array<string>",
    ).select("id", max_multiplicity(F.col("l")).alias("m"))
    got = {r["id"]: r["m"] for r in rows.collect()}
    assert got == {1: 3, 2: 1, 3: 0, 4: 3}
