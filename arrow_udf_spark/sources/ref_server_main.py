"""Entry point that serves UDFs through the REFERENCE server implementation.

Run as a subprocess:  python -m arrow_udf_spark.sources.ref_server_main <port>

This imports the reference's pip-distributable ``arrow_udf`` package
(arrow-udf-remote/python/arrow_udf/__init__.py) straight from the read-only
reference tree — nothing is vendored or copied — and hosts a few
example-style functions on its ``UdfServer`` (reference example.py:24-75).
The point is live wire-level interop: our Spark-side Flight client
(sources/flight.py) must discover and call functions served by the
reference's own ``do_exchange``/``get_flight_info`` implementation, not by
our re-implementation of it.
"""

from __future__ import annotations

import os
import sys

#: where the reference's python server package lives (read-only)
REFERENCE_PKG_DIR = "/root/reference/arrow-udf-remote/python"


def main() -> None:
    port = int(sys.argv[1])
    if not os.path.isdir(REFERENCE_PKG_DIR):
        raise SystemExit(f"reference package not found: {REFERENCE_PKG_DIR}")
    sys.path.insert(0, REFERENCE_PKG_DIR)
    from arrow_udf import UdfServer, udf, udtf  # the REFERENCE package

    @udf(input_types=["BIGINT", "BIGINT"], result_type="BIGINT")
    def gcd(x: int, y: int) -> int:
        # the reference server calls row-wise with raw as_py() values and
        # aborts the exchange on an uncaught exception — NULL-safe by hand
        if x is None or y is None:
            return None
        while y != 0:
            (x, y) = (y, x % y)
        return x

    @udf(input_types=["BIGINT"], result_type="VARCHAR")
    def to_hex(x: int) -> str:
        return format(x, "x")

    @udtf(input_types="BIGINT", result_types="BIGINT")
    def series(n: int):
        for i in range(n):
            yield i

    @udf(input_types=["DECIMAL", "DECIMAL"], result_type="DECIMAL")
    def decimal_add(a, b):
        # reference example.py:99-101 — exercises the arrowudf.decimal
        # EXTENSION type on the wire in both directions
        if a is None or b is None:
            return None
        return a + b

    @udf(input_types=["JSON", "INT"], result_type="JSON")
    def json_array_access(v, i):
        # reference example.py:111-115 — arrowudf.json ext type on the wire
        if v is None or i is None:
            return None
        return v[i]

    @udf(
        input_types=["BINARY"],
        result_type=(
            "STRUCT<src_addr: STRING, dst_addr: STRING, "
            "src_port: INT32, dst_port: INT32>"
        ),
    )
    def extract_tcp_info(tcp_packet: bytes):
        # Same CONTRACT as reference example.py:47-61 (IPv4 header address
        # pair at bytes 12..20, TCP port pair at 20..24), independently
        # written: ports widened to INT32 because the unsigned values
        # (0..65535) overflow the reference's declared INT16.
        if tcp_packet is None or len(tcp_packet) < 24:
            return None
        addrs = tcp_packet[12:20]
        dotted = [
            ".".join(str(b) for b in addrs[off : off + 4]) for off in (0, 4)
        ]
        ports = [
            int.from_bytes(tcp_packet[p : p + 2], "big") for p in (20, 22)
        ]
        return {
            "src_addr": dotted[0],
            "dst_addr": dotted[1],
            "src_port": ports[0],
            "dst_port": ports[1],
        }

    server = UdfServer(location=f"127.0.0.1:{port}")
    server.add_function(gcd)
    server.add_function(to_hex)
    server.add_function(series)
    server.add_function(decimal_add)
    server.add_function(json_array_access)
    server.add_function(extract_tcp_info)
    server.serve()


if __name__ == "__main__":
    main()
