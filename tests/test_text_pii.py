"""PII redaction semantics on strings that actually contain PII
(the synthetic corpus is word-soup, so the oracle sweep alone would
pass with a regex that never matches).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from go_integ_spark.operators.text import PII_DIGIT_RUN, PII_EMAIL, _PII_ANY


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "contact alice.smith+spam@example.co.uk or bob@x.io today"),
            (2, "card 1234567890123456 pin 99 acct 000111"),
            (3, "clean text with no identifiers at all"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL), 0)).alias("emails"),
            F.size(F.regexp_extract_all("text", F.lit(PII_DIGIT_RUN), 0)).alias("runs"),
            F.regexp_replace("text", _PII_ANY, "<PII>").alias("redacted"),
        ).collect()
    }
    assert out[1]["emails"] == 2 and out[1]["runs"] == 0
    assert out[1]["redacted"] == "contact <PII> or <PII> today"
    assert out[2]["emails"] == 0 and out[2]["runs"] == 2
    assert out[2]["redacted"] == "card <PII> pin 99 acct <PII>"
    assert out[3]["redacted"] == out[3]["text"] if "text" in out[3] else True
    assert out[3]["emails"] == 0 and out[3]["runs"] == 0
