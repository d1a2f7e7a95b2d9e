"""Configurable extension-type metadata keys (reference
set_arrow_extension_key / per-type value setters,
arrow-udf-runtime/src/python/pyarrow.rs:120-133, README.md:43-55)."""

from __future__ import annotations

import pytest

from arrow_udf_spark.plans import types as PT


@pytest.fixture(autouse=True)
def restore_defaults():
    yield
    PT.set_extension_metadata_key("ARROW:extension:name")
    PT.set_extension_value("json", PT.EXT_JSON)
    PT.set_extension_value("decimal", PT.EXT_DECIMAL)
    PT.set_extension_value("pickle", PT.EXT_PICKLE)


def test_default_metadata_for_ext_fields():
    assert PT.ext_field_metadata("json") == {"ARROW:extension:name": "arrowudf.json"}
    assert PT.ext_field_metadata(PT.EXT_DECIMAL) == {
        "ARROW:extension:name": "arrowudf.decimal"
    }
    assert PT.ext_field_metadata(None) is None


def test_configurable_key_and_value():
    PT.set_extension_metadata_key("udf.ext")
    PT.set_extension_value("json", "myhost.json")
    assert PT.ext_field_metadata("json") == {"udf.ext": "myhost.json"}
    with pytest.raises(KeyError):
        PT.set_extension_value("nope", "x")


def test_flight_schema_advertises_ext_tags():
    pytest.importorskip("pyarrow.flight")
    from arrow_udf_spark import GLOBAL
    from arrow_udf_spark.sources.flight import FlightUdfClient, serve_registry

    uri = serve_registry(GLOBAL)
    c = FlightUdfClient(uri)
    schema, n_args = c.function_info("decimal_add__decimal_decimal")
    # both decimal args and the decimal result carry the ext tag
    for i in (0, 1, n_args):
        md = schema.field(i).metadata or {}
        assert md.get(b"ARROW:extension:name") == b"arrowudf.decimal", schema.field(i)
    c.close()
