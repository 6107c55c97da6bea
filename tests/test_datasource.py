"""Spark 4 Python DataSource ("httpjson") tests — the scale-out ingest
path: page-per-partition parallelism, schema inference, filter
behavior, open-ended fallback.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

ROWS = [{"id": i, "tag": f"t{i % 3}", "score": i * 0.5} for i in range(1, 101)]


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):
        pass

    def do_GET(self):  # noqa: N802
        q = parse_qs(urlparse(self.path).query)
        page = int(q.get("page", ["1"])[0])
        size = int(q.get("limit", ["10"])[0])
        body = json.dumps(ROWS[(page - 1) * size : page * size]).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def url(spark):
    from http_datafusion_spark.sources.datasource import register

    register(spark)
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}/items"
    srv.shutdown()


def _read(spark, url, **opts):
    r = spark.read.format("httpjson").option("url", url)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_page_per_partition(spark, url):
    df = _read(spark, url, startPage=1, endPage=10, pageSize=10)
    assert df.rdd.getNumPartitions() == 10  # one partition per page
    assert df.count() == 100


def test_schema_inference_from_first_page(spark, url):
    df = _read(spark, url, startPage=1, endPage=2, pageSize=10)
    assert df.schema.simpleString() == "struct<id:bigint,tag:string,score:double>"


def test_aggregation_over_parallel_pages(spark, url):
    df = _read(spark, url, startPage=1, endPage=10, pageSize=10)
    got = {(r.tag, r["count"]) for r in df.groupBy("tag").count().collect()}
    assert got == {("t0", 33), ("t1", 34), ("t2", 33)}


def test_filters_applied_post_scan(spark, url):
    df = _read(spark, url, startPage=1, endPage=10, pageSize=10)
    assert df.filter("score > 40").count() == sum(1 for r in ROWS if r["score"] > 40)


def test_open_ended_pagination_sequential(spark, url):
    df = _read(spark, url, startPage=1, pageSize=25)
    assert df.rdd.getNumPartitions() == 1  # termination unknown => sequential
    assert df.count() == 100


def test_user_schema_skips_inference(spark, url):
    df = (
        spark.read.format("httpjson")
        .schema("id bigint, score double")
        .option("url", url)
        .option("startPage", 1)
        .option("endPage", 4)
        .option("pageSize", 25)
        .load()
    )
    assert df.columns == ["id", "score"]
    assert df.count() == 100
