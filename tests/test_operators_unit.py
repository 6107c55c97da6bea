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


def test_connected_components_chain_and_isolated_pairs(spark):
    """A 10-node chain (diameter 9) plus a separate 2-cycle: star
    contraction must label every chain node with the chain min in
    far fewer rounds than the diameter."""
    from http_datafusion_spark.operators.components import connected_components

    chain = [(i, i + 1) for i in range(1, 10)]  # 1-2-...-10
    extra = [(100, 200), (200, 100), (7, 7)]  # dup direction + self loop
    edges = spark.createDataFrame(chain + extra, "src bigint, dst bigint")
    got = {r.node: r.component for r in connected_components(edges).collect()}
    assert got == {**{i: 1 for i in range(1, 11)}, 100: 100, 200: 100}


def test_connected_components_driver_materialization_is_o1(spark, monkeypatch):
    """The fixpoint loop must never pull node labels to the driver:
    every collect() inside connected_components is a 1-row digest."""
    import pyspark.sql.classic.dataframe as df_mod  # concrete class in Spark 4

    from http_datafusion_spark.operators.components import connected_components

    sizes: list[int] = []
    real_collect = df_mod.DataFrame.collect

    def counting_collect(self):
        out = real_collect(self)
        sizes.append(len(out))
        return out

    monkeypatch.setattr(df_mod.DataFrame, "collect", counting_collect)
    # 300-node random-ish graph: plenty of labels to tempt a collect.
    edges = spark.createDataFrame(
        [(i, (i * 7) % 300) for i in range(300)], "src bigint, dst bigint"
    )
    result = connected_components(edges)
    assert max(sizes) <= 1  # digest rows only; labels stayed distributed
    assert result.count() == 300


def test_connected_components_raises_on_exhaustion(spark):
    from http_datafusion_spark.operators.components import connected_components

    import pytest

    edges = spark.createDataFrame([(i, i + 1) for i in range(1, 40)], "src bigint, dst bigint")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=1)


def test_asof_join_no_preceding_right_row_yields_nulls(spark):
    from http_datafusion_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 5, "early")], "k int, t int, name string")
    right = spark.createDataFrame([(1, 10, 3)], "k int, rt int, okey bigint")
    out = asof_join(
        left, right, on="k", left_time="t", right_time="rt", payload_cols=["okey"]
    ).collect()
    assert len(out) == 1 and out[0].asof_okey is None
