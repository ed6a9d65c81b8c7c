"""Spark-4 API surface: Python UDTFs (table functions) and the
Observation metrics API.

UDTFs are the escape hatch for one-row-to-many-rows logic that built-in
generators (explode/posexplode/inline/stack — all covered by oracle
queries) can't express; like any Python-side op they are off the hot
path by policy (plan-gated elsewhere). Observation piggybacks metric
aggregates onto an existing action — pipeline health counters without a
second scan, which at 100 TB is the difference between free and a full
re-read.
"""

from __future__ import annotations

from pyspark.sql import Observation, Row
from pyspark.sql import functions as F

from p6_spark.sources.tables import load_table


def test_python_udtf_span_splitter(spark):
    # a UDTF producing (span, start_offset) rows — running offsets are
    # awkward with explode alone; this is the canonical UDTF shape
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="span: string, start: int")
    class SpanSplit:
        def eval(self, text: str):
            off = 0
            for part in text.split("."):
                part = part.strip()
                if part:
                    yield part, text.index(part, off)
                    off = text.index(part, off) + len(part)

    rows = SpanSplit(lit("alpha beta. gamma.  delta")).collect()
    assert rows == [
        Row(span="alpha beta", start=0),
        Row(span="gamma", start=12),
        Row(span="delta", start=20),
    ]


def test_observation_metrics_piggyback_on_action(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    obs = Observation("doc_metrics")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.count_if(F.col("n_chars") > 500).alias("n_long"),
    )
    kept = observed.filter(F.col("lang") == "en").count()
    got = obs.get
    # metrics describe the FULL observed stream (pre-filter), collected
    # by the same job that computed the count — no extra scan
    assert got["n_docs"] == docs.count()
    assert got["total_chars"] == docs.agg(F.sum("n_chars")).collect()[0][0]
    assert 0 <= got["n_long"] <= got["n_docs"]
    assert kept <= got["n_docs"]
