"""HTTP access inside UDFs (reference A22 ``fetch()``).

The reference enables a ``fetch()`` HTTP API for JS UDFs
(arrow-udf-runtime/src/javascript/fetch/mod.rs:35-119, tests
javascript_fetch.rs:58-533).  In our model UDFs are plain Python, so HTTP
needs no special runtime hook — any UDF body may call ``urllib``.  This
module packages the pattern with the right *scale* defaults:

- ``io_threads`` concurrency per batch (thread pool) or an async coroutine
  fn (event loop) — without it, a 1024-row batch of 100 ms requests takes
  102 s; with 64-way concurrency ~1.6 s;
- a per-call ``timeout`` so one stuck endpoint cannot wedge an executor
  task (the reference's per-call deadline, A21);
- ``fallible=True`` so HTTP errors land in the error column row-by-row
  instead of failing the Spark task (and triggering task retry storms at
  100 TB scale).

Only stdlib ``urllib`` is used; no extra dependencies.
"""

from __future__ import annotations

import threading
from typing import Optional

from ..operators.scalar import ScalarFunction, udf
from ..plans.registry import GLOBAL, Registry

__all__ = ["make_http_get", "serve_echo_fixture"]

_echo_server = None
_echo_base: Optional[str] = None
_echo_lock = threading.Lock()


def serve_echo_fixture() -> str:
    """Start (once) a loopback HTTP fixture: ``/echo/<x>`` answers 200 with
    body ``payload-<x>``; anything else 404.  Returns the base URL.

    This is the analogue of the reference's axum mock server for its
    fetch() tests (javascript_fetch.rs:58-533) — deterministic bodies so a
    DuckDB oracle can state the expected text analytically.  Loopback only;
    executors in local mode share the host.
    """
    global _echo_server, _echo_base
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Echo(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 (stdlib contract)
            if self.path.startswith("/echo/"):
                body = f"payload-{self.path[len('/echo/'):]}".encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_error(404)

        def log_message(self, *a):  # silence per-request stderr lines
            pass

    with _echo_lock:
        if _echo_base is None:
            _echo_server = ThreadingHTTPServer(("127.0.0.1", 0), Echo)
            threading.Thread(
                target=_echo_server.serve_forever, daemon=True
            ).start()
            _echo_base = f"http://127.0.0.1:{_echo_server.server_address[1]}"
    return _echo_base


def make_http_get(
    name: str = "http_get",
    io_threads: int = 64,
    timeout: Optional[float] = 10.0,
    max_bytes: int = 1 << 20,
    registry: Registry = GLOBAL,
) -> ScalarFunction:
    """Build + register ``name(string) -> string``: GET the URL, return the
    body text (reference fetch().text(), javascript_fetch.rs:58-100).

    Per-row failures (connection refused, HTTP >= 400, timeout) become
    error-column entries.  The UDF is registered fallible, so call
    ``fn.value_and_error(col)`` for the (body, error) pair.
    """

    def http_get(url: str):
        if url is None:
            return None
        from urllib.request import urlopen

        # per-request timeout is a second guard under the batch watchdog
        with urlopen(url, timeout=timeout) as resp:  # noqa: S310 (caller's URL)
            return resp.read(max_bytes).decode("utf-8", errors="replace")

    http_get.__name__ = name
    return udf(
        input_types=["string"],
        result_type="string",
        name=name,
        fallible=True,
        io_threads=io_threads,
        timeout=timeout,
        registry=registry,
    )(http_get)
