"""Direct unit tests of the beyond-reference operator APIs on tiny
hand-built frames — edge cases the fixture-driven oracle corpus can't
reach (NULL payload fields, unconverged components, empty buckets).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_asof_join_null_payload_fields_stay_row_atomic(spark):
    """A right row whose payload is NULL in one column must NOT donate
    its other column to the carried result: all asof_* values come from
    the same (latest) right row."""
    from http_datafusion_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100, "e1")], "k int, t int, name string")
    right = spark.createDataFrame(
        [
            # older row: both fields present
            (1, 10, 7, 1.5),
            # latest row: price is NULL — per-column carry would pair
            # orderkey=9 with price=1.5 (from the older row); row-atomic
            # carry must return (9, NULL).
            (1, 20, 9, None),
        ],
        "k int, rt int, okey bigint, price double",
    )
    out = asof_join(
        left, right, on="k", left_time="t", right_time="rt",
        payload_cols=["okey", "price"],
    ).collect()
    assert len(out) == 1
    assert out[0].asof_okey == 9
    assert out[0].asof_price is None


def test_asof_join_no_preceding_right_row_yields_nulls(spark):
    from http_datafusion_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 5, "early")], "k int, t int, name string")
    right = spark.createDataFrame([(1, 10, 3)], "k int, rt int, okey bigint")
    out = asof_join(
        left, right, on="k", left_time="t", right_time="rt", payload_cols=["okey"]
    ).collect()
    assert len(out) == 1 and out[0].asof_okey is None
