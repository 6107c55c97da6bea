"""Property-based tests (hypothesis) for the pure-Python layers:
config parsing and pagination URL construction.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from http_datafusion_spark.config import Config, Pagination
from http_datafusion_spark.sources.http_json import build_page_url

names = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="_"),
    min_size=1,
    max_size=20,
)


@settings(max_examples=200, deadline=None)
@given(
    name=names,
    url=st.text(min_size=1, max_size=50).map(lambda s: "http://h/" + s.replace(" ", "")),
    method=st.sampled_from(["GET", "POST", "get", "post"]),
    sql=st.none() | st.text(max_size=100),
)
def test_config_roundtrip_never_crashes(name, url, method, sql):
    cfg = Config.from_dict(
        {"sources": [{"name": name, "url": url, "method": method, "sql": sql}]}
    )
    src = cfg.sources[0]
    assert src.method in ("GET", "POST")  # normalized upper
    assert src.name == name


@settings(max_examples=200, deadline=None)
@given(
    page=st.integers(min_value=0, max_value=10**6),
    size=st.integers(min_value=1, max_value=10**4),
    page_param=names,
    size_param=names,
    has_query=st.booleans(),
)
def test_page_url_composition(page, size, page_param, size_param, has_query):
    base = "http://api/items" + ("?fixed=1" if has_query else "")
    pag = Pagination(page_size=size, page_param=page_param, page_size_param=size_param)
    url = build_page_url(base, pag, page)
    sep = "&" if has_query else "?"
    assert url == f"{base}{sep}{page_param}={page}&{size_param}={size}"
    assert url.count("?") == 1  # never doubles the query separator


def test_train_val_split_partitions_every_doc(spark, sf_dir):
    # The three splits must cover documents exactly (complete + disjoint)
    # and be stable across invocations (hash-gated, not rand()).
    from http_datafusion_spark.plans.registry import all_queries
    from http_datafusion_spark.plans.tables import load_tables

    q = all_queries()["train_val_split"]
    total_docs = load_tables(spark, sf_dir, "documents")["documents"].count()
    out1 = {tuple(r) for r in q.spark(spark, sf_dir).collect()}
    out2 = {tuple(r) for r in q.spark(spark, sf_dir).collect()}
    assert out1 == out2  # deterministic
    assert sum(r[2] for r in out1) == total_docs  # complete + disjoint
    assert {r[1] for r in out1} <= {"train", "val", "test"}


def test_balance_sources_respects_cap(spark, sf_dir):
    from http_datafusion_spark.operators.pipeline import BALANCE_CAP
    from http_datafusion_spark.plans.registry import all_queries

    out = all_queries()["balance_sources"].spark(spark, sf_dir).collect()
    per_source: dict[str, int] = {}
    for r in out:
        per_source[r.source] = per_source.get(r.source, 0) + 1
    assert per_source and max(per_source.values()) <= BALANCE_CAP
