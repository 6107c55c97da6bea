"""DDL / utility statements through the ``sql:`` surface.

The reference forwards arbitrary ``sql:`` strings to DataFusion's
``SessionContext::sql`` (src/main.rs:43), which executes DDL and
utility statements — CREATE [TEMP] VIEW, CREATE TABLE AS, INSERT INTO,
EXPLAIN, SHOW TABLES — not just SELECT. The Spark engine inherits the
same breadth via ``spark.sql``; these tests pin it, including the
config-driven engine path where one source's ``sql:`` defines a view a
later source's query consumes (sources execute in declaration order,
reference src/main.rs:34-46).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from http_datafusion_spark.config import Config, Source
from http_datafusion_spark.engine import run

USERS = [{"id": i, "country": "us" if i % 2 else "de"} for i in range(1, 11)]


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *args):  # noqa: D102
        pass

    def do_GET(self):  # noqa: N802
        body = json.dumps(USERS).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def base_url():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_engine_ddl_view_feeds_later_source(base_url, spark):
    cfg = Config(
        sources=[
            Source(
                name="users",
                url=f"{base_url}/users",
                sql="CREATE OR REPLACE TEMPORARY VIEW us_users AS "
                "SELECT * FROM users WHERE country = 'us'",
            ),
            Source(
                name="users_again",
                url=f"{base_url}/users",
                sql="SELECT count(*) AS n FROM us_users",
            ),
        ]
    )
    results = run(cfg, spark=spark, show=False)
    assert results[1].result.collect()[0].n == 5


def test_ctas_insert_roundtrip(spark, sf_dir, tmp_path):
    from http_datafusion_spark.plans.tables import load_tables

    load_tables(spark, sf_dir, "nation")
    spark.sql(
        f"CREATE TABLE ddl_nations USING parquet LOCATION '{tmp_path}/ddl_nations' "
        "AS SELECT n_nationkey, n_name FROM nation"
    )
    try:
        before = spark.table("ddl_nations").count()
        assert before == 25
        spark.sql("INSERT INTO ddl_nations VALUES (97, 'ATLANTIS'), (98, 'LEMURIA')")
        assert spark.table("ddl_nations").count() == before + 2
        top = spark.sql(
            "SELECT n_name FROM ddl_nations WHERE n_nationkey >= 97 ORDER BY n_nationkey"
        ).collect()
        assert [r.n_name for r in top] == ["ATLANTIS", "LEMURIA"]
    finally:
        spark.sql("DROP TABLE IF EXISTS ddl_nations")


def test_explain_statement_returns_plan(spark, sf_dir):
    from http_datafusion_spark.plans.tables import load_tables

    load_tables(spark, sf_dir, "nation")
    out = spark.sql("EXPLAIN SELECT count(*) FROM nation").collect()[0][0]
    assert "Physical Plan" in out


def test_show_tables_lists_registered_views(spark, sf_dir):
    from http_datafusion_spark.plans.tables import load_tables

    load_tables(spark, sf_dir, "nation", "region")
    names = {r.tableName for r in spark.sql("SHOW TABLES").collect()}
    assert {"nation", "region"} <= names
