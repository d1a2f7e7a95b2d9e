"""Round-5 ADVICE regression tests.

Five fixes from round-4 review:
1. flight._wrap_for_server honours a re-pointed extension metadata key
   (set_extension_metadata_key) instead of hardcoding ARROW:extension:name.
2. _eval_memcapped pickles DataFrame results as-is (struct-returning batch
   fns) — list(DataFrame) would have shipped column labels as row values.
3. _eval_memcapped keeps the environment's finite RLIMIT_AS hard limit
   (setting hard=RLIM_INFINITY under a ulimit'd container is EPERM and
   turned every capped batch into error rows).
4. decimal_add refuses exponent-notation batches on the Arrow fast path
   (scale is not derivable from chars-after-dot) and falls back exact.
5. KMV aggregate: NULL-bearing int64 batches arrive as exact masked Int64
   through the DataFrame agg bridge (mapInArrow), not corrupting float64.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pandas as pd
import pyarrow as pa
import pytest

from arrow_udf_spark.operators.scalar import udf
from arrow_udf_spark.plans.registry import Registry

CAP = 128 << 20


# -- 1. configurable ext metadata key on the wire-facing decode ------------


def test_wrap_for_server_honours_repointed_metadata_key():
    from arrow_udf_spark.plans import types as pt
    from arrow_udf_spark.sources.flight import _wrap_for_server

    try:
        pt.set_extension_metadata_key("my:ext:key")
        field = pa.field(
            "a", pa.string(), metadata={b"my:ext:key": b"arrowudf.decimal"}
        )
        arr = pa.array(["1.5", "2.5"])
        wrapped = _wrap_for_server(arr, field)
        assert isinstance(wrapped, pa.ExtensionArray)
        assert wrapped.type.extension_name == "arrowudf.decimal"
        # a peer still tagging under the Arrow-standard key also interops
        field_std = pa.field(
            "a", pa.string(), metadata={b"ARROW:extension:name": b"arrowudf.json"}
        )
        wrapped_std = _wrap_for_server(arr, field_std)
        assert isinstance(wrapped_std, pa.ExtensionArray)
        assert wrapped_std.type.extension_name == "arrowudf.json"
    finally:
        pt.set_extension_metadata_key("ARROW:extension:name")


# -- 2. memcapped struct-returning batch fn --------------------------------


def test_memcapped_batch_dataframe_result_not_column_labels():
    reg = Registry()

    @udf(
        input_types=["bigint"],
        result_type="struct<a:bigint,b:bigint>",
        name="capped_struct",
        batch=True,
        memory_limit=CAP,
        registry=reg,
    )
    def capped_struct(x: pd.Series):
        return pd.DataFrame({"a": x * 2, "b": x * 3})

    out = capped_struct._eval(pd.Series([1, 2, 3]))
    # the bug shipped ['a', 'b'] (column labels) as the whole batch
    assert isinstance(out, pd.DataFrame)
    assert out["a"].tolist() == [2, 4, 6]
    assert out["b"].tolist() == [3, 6, 9]


def test_memcapped_series_result_roundtrips():
    reg = Registry()

    @udf(
        input_types=["bigint"],
        result_type="bigint",
        name="capped_batch",
        batch=True,
        memory_limit=CAP,
        registry=reg,
    )
    def capped_batch(x: pd.Series):
        return x * 10

    out = capped_batch._eval(pd.Series([1, 2, None]))
    assert out.tolist()[:2] == [10, 20]


# -- 3. finite hard RLIMIT_AS environments ---------------------------------


def test_memcap_under_finite_hard_rlimit():
    """Simulate a ulimit'd container: finite RLIMIT_AS *hard* limit in the
    parent.  The capped eval must still return real values (pre-fix it
    EPERM'd in the child and every row became 'memory limit exceeded')."""
    script = textwrap.dedent(
        """
        import resource, sys
        import pandas as pd
        from arrow_udf_spark.operators.scalar import udf
        from arrow_udf_spark.plans.registry import Registry

        def vm_now():
            with open("/proc/self/statm") as f:
                pages = int(f.read().split()[0])
            import os
            return pages * os.sysconf("SC_PAGE_SIZE")

        hard = vm_now() + (4 << 30)  # 4 GiB headroom, but FINITE
        resource.setrlimit(resource.RLIMIT_AS, (hard, hard))

        @udf(input_types=["bigint"], result_type="bigint", name="ok",
             memory_limit=(128 << 20), registry=Registry())
        def ok(x):
            return None if x is None else x * 2

        out = ok._eval(pd.Series([1, 2, 3]))
        vals = out.tolist() if not hasattr(out, "columns") else out["value"].tolist()
        assert vals == [2, 4, 6], vals
        print("OK")
        """
    )
    r = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert "OK" in r.stdout


# -- 4. exponent-notation decimals fall back to the exact loop -------------


def test_decimal_add_exponent_notation_exact():
    from arrow_udf_spark.functions.corpus import decimal_add

    out = decimal_add._eval(
        pd.Series(["1.5E+1", "2E-2", "1.5e1"]), pd.Series(["1", "0.01", "0.5"])
    )
    vals = out.tolist() if not hasattr(out, "columns") else out["value"].tolist()
    # Decimal('1.5E+1') + 1 = 16 (not '16.0000' from a bogus scale-4 parse)
    assert vals == ["16", "0.03", "15.5"]


def test_decimal_add_plain_batches_still_fast_path_exact():
    from arrow_udf_spark.functions.corpus import decimal_add

    out = decimal_add._eval(pd.Series(["1.25", "2.50"]), pd.Series(["0.25", "0.50"]))
    vals = out.tolist() if not hasattr(out, "columns") else out["value"].tolist()
    assert vals == ["1.50", "3.00"]


# -- 5. KMV with NULL keys stays exact through the agg bridge --------------


def test_kmv_accumulate_batch_nullable_int64_exact():
    from arrow_udf_spark.operators.sketch import KmvAgg

    big = (1 << 62) + 1
    hs = pd.Series([big, big + 1, None, big + 2], dtype="Int64")
    st = KmvAgg.accumulate_batch(KmvAgg.create_state(), hs)
    # float64 coercion would have collapsed the three consecutive values
    assert st == (big, big + 1, big + 2)


def test_kmv_accumulate_batch_float_still_refused():
    from arrow_udf_spark.operators.sketch import KmvAgg

    with pytest.raises(ValueError, match="float"):
        KmvAgg.accumulate_batch(KmvAgg.create_state(), pd.Series([1.0, None]))


def test_kmv_agg_with_null_keys_exact_through_spark(spark):
    from arrow_udf_spark.operators.sketch import KmvAgg

    big = (1 << 62) + 7
    rows = [("a", big), ("a", big + 1), ("a", None), ("a", big + 2), ("b", None)]
    df = spark.createDataFrame(rows, "g string, h bigint")
    out = {
        r["g"]: r["kmv_udaf"]
        for r in KmvAgg.agg(df, by=["g"], args=["h"]).collect()
    }
    # below-K cardinality -> the sketch is exact; nulls drop out
    assert out == {"a": 3, "b": 0}


def test_sum_udaf_nullable_batch_through_spark(spark):
    """The mapInArrow bridge change covers every accumulate_batch UDAF."""
    from arrow_udf_spark.functions.corpus import SumAgg

    big = (1 << 60) + 3
    rows = [(1, big), (1, None), (1, big + 1), (2, 5)]
    df = spark.createDataFrame(rows, "g int, x bigint")
    out = {r["g"]: r["sum_udaf"] for r in SumAgg.agg(df, by=["g"], args=["x"]).collect()}
    assert out == {1: 2 * big + 1, 2: 5}


def test_udaf_group_keys_exact_with_nulls_above_2_53(spark):
    """Group-KEY columns must take the masked-Int64 path too: a 63-bit key
    in a NULL-bearing batch must not round-trip through float64 (2^53 and
    2^53+1 would merge into one corrupted group)."""
    from arrow_udf_spark.functions.corpus import SumAgg

    k0, k1 = 2**53, 2**53 + 1
    df = spark.createDataFrame(
        [(k0, 1), (k1, 10), (None, 100), (k0, 2), (k1, 20), (None, 200)],
        "h long, x long",
    ).repartition(2)
    out = {r["h"]: r["sum_udaf"] for r in SumAgg.agg(df, by=["h"], args=["x"]).collect()}
    assert out == {k0: 3, k1: 30, None: 300}


def test_udaf_multi_key_groups_with_nulls(spark):
    """Two grouping keys, one of them NULL-bearing int64 above 2^53 —
    the masked-key path must keep composite groups distinct too."""
    from arrow_udf_spark.functions.corpus import SumAgg

    k = 2**53
    df = spark.createDataFrame(
        [("a", k, 1), ("a", k + 1, 10), ("a", None, 100),
         ("b", k, 1000), ("a", k, 2)],
        "g string, h long, x long",
    ).repartition(2)
    out = {
        (r["g"], r["h"]): r["sum_udaf"]
        for r in SumAgg.agg(df, by=["g", "h"], args=["x"]).collect()
    }
    assert out == {("a", k): 3, ("a", k + 1): 10, ("a", None): 100, ("b", k): 1000}
