"""HTTP-in-UDF (A22 fetch analogue) against a loopback http.server."""

import http.server
import threading

import pyspark.sql.functions as F
import pytest

from arrow_udf_spark.functions.net import make_http_get
from arrow_udf_spark.plans.registry import Registry


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802
        if self.path.startswith("/echo/"):
            body = f"pong:{self.path.rsplit('/', 1)[1]}".encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        else:
            self.send_error(404)

    def log_message(self, *a):  # keep test output quiet
        pass


@pytest.fixture(scope="module")
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_get_over_spark(spark, server):
    # Spark executors (local-mode worker processes) fetch from the loopback
    # server with per-batch concurrency; errors are row-isolated.
    fn = make_http_get(name="t_http_get", io_threads=16, timeout=5.0,
                       registry=Registry())
    df = spark.range(20).select(
        F.col("id"),
        F.when(F.col("id") % 5 == 0, F.concat(F.lit(server + "/missing/"), "id"))
        .otherwise(F.concat(F.lit(server + "/echo/"), "id"))
        .alias("url"),
    )
    v, e = fn.value_and_error("url")
    rows = df.select("id", v.alias("body"), e).collect()
    assert len(rows) == 20
    for r in rows:
        if r.id % 5 == 0:
            assert r.body is None and "404" in r.error
        else:
            assert r.body == f"pong:{r.id}" and r.error is None


def test_http_get_driver_eval(server):
    import pandas as pd

    fn = make_http_get(name="t_http_get2", io_threads=8, registry=Registry())
    out = fn._eval(pd.Series([f"{server}/echo/7", None, f"{server}/nope"]))
    assert out.loc[0, "value"] == "pong:7"
    assert out.loc[1, "value"] is None and out.loc[1, "error"] is None
    assert "404" in out.loc[2, "error"]
