"""Utf8View/BinaryView coverage (reference converters pyarrow.rs:188-197,
jsarrow.rs:259-266; tests python.rs:1141, javascript.rs:1337).

Spark's own Arrow exchange never produces view arrays, but view-backed
batches can enter through IPC sources, Flight peers, or mapInArrow user
code — the eval core and the Flight server must treat them as plain
string/binary values."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from arrow_udf_spark.functions import corpus as C


def test_eval_core_accepts_view_backed_series():
    sv = pa.array(["ab", None, "cdé"], type=pa.string_view())
    out = C.length._eval(sv.to_pandas())
    got = [None if pd.isna(v) else int(v) for v in out.tolist()]
    assert got == [2, None, 4]  # bytes, not chars

    bv = pa.array([b"x", b"", None], type=pa.binary_view())
    out = C.length_bin._eval(bv.to_pandas())
    got = [None if pd.isna(v) else int(v) for v in out.tolist()]
    assert got == [1, 0, None]


def test_identity_roundtrip_preserves_view_values():
    vals = ["", "a" * 40, None, "short"]  # >12 bytes exercises out-of-line views
    sv = pa.array(vals, type=pa.string_view())
    rt = pa.Array.from_pandas(sv.to_pandas(), type=pa.string())
    assert rt.to_pylist() == vals
    assert rt.type == pa.string()


def test_flight_server_handles_view_typed_input():
    flight = pytest.importorskip("pyarrow.flight")
    from arrow_udf_spark import GLOBAL
    from arrow_udf_spark.sources.flight import FlightUdfClient, serve_registry

    uri = serve_registry(GLOBAL)
    c = FlightUdfClient(uri)
    batch = pa.RecordBatch.from_arrays(
        [pa.array(["hello", None, "wörld"], type=pa.string_view())],
        names=["arg0"],
    )
    out = c.call("length__string", batch)
    assert out.column("length").to_pylist() == [5, None, 6]
    c.close()
