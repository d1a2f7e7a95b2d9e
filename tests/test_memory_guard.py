"""A21 second half: per-call memory limit (reference QuickJS
set_memory_limit, arrow-udf-runtime/src/javascript/mod.rs:229-260; wasm
StoreLimits wasm/mod.rs:358-371).

An allocation bomb inside a capped UDF must produce an ERROR ROW (fallible)
or a clean Python exception (non-fallible) — never an executor OOM."""

from __future__ import annotations

import pandas as pd
import pytest

from arrow_udf_spark.operators.scalar import udf
from arrow_udf_spark.plans.registry import Registry

CAP = 128 << 20  # 128 MiB over the worker's baseline


def _bomb_fn(reg):
    @udf(
        input_types=["bigint"],
        result_type="bigint",
        name="alloc_bomb",
        fallible=True,
        memory_limit=CAP,
        registry=reg,
    )
    def alloc_bomb(x: int):
        if x and x > 0:
            # ~8 GiB of int objects — far over the cap
            buf = list(range(1 << 30))
            return len(buf)
        return 0

    return alloc_bomb


def test_allocation_bomb_yields_error_row_not_oom():
    fn = _bomb_fn(Registry())
    out = fn._eval(pd.Series([0, 1, 0, None]))
    assert isinstance(out, pd.DataFrame)
    assert out["value"].tolist()[0] == 0
    assert out["value"].tolist()[2] == 0
    assert out["error"].tolist()[1] == "memory limit exceeded"
    assert out["error"].tolist()[0] is None
    # null input row: called (default CallMode), returns 0
    assert out["error"].tolist()[3] is None


def test_normal_rows_unaffected_by_cap():
    reg = Registry()

    @udf(
        input_types=["bigint"],
        result_type="bigint",
        name="capped_ok",
        memory_limit=CAP,
        registry=reg,
    )
    def capped_ok(x: int):
        return None if x is None else x * 2

    out = capped_ok._eval(pd.Series([1, 2, 3]))
    assert out.tolist() == [2, 4, 6]


def test_non_fallible_bomb_raises_memoryerror_cleanly():
    reg = Registry()

    @udf(
        input_types=["bigint"],
        result_type="bigint",
        name="bomb_nf",
        memory_limit=CAP,
        registry=reg,
    )
    def bomb_nf(x: int):
        buf = list(range(1 << 30))
        return len(buf)

    # non-fallible semantics: loud failure of the batch, but as a Python
    # error (RuntimeError from the row loop or MemoryError from a dead
    # child) — the parent process survives to raise it
    with pytest.raises((RuntimeError, MemoryError)):
        bomb_nf._eval(pd.Series([1]))


def test_capped_bomb_through_spark(spark, sf_dir):
    from pyspark.sql import functions as F

    reg = Registry()
    fn = _bomb_fn(reg)
    # bomb on exactly one row
    src = spark.range(8).select((F.col("id") == 3).cast("bigint").alias("x"))
    out = fn.apply(src, cols=["x"], value_alias="v")
    rows = out.collect()
    assert len(rows) == 8
    for r in rows:
        if r["error"] is not None:
            assert r["error"] == "memory limit exceeded"
            assert r["v"] is None
    assert any(r["error"] == "memory limit exceeded" for r in rows)


def test_segfault_in_child_is_contained():
    """The fork boundary is also a crash sandbox (reference wasm
    fault-injection probes, tests/wasm.rs:33-70): a C-level segfault in a
    capped UDF kills only the forked child — the batch comes back as error
    rows and the worker process survives to run the next batch."""
    reg = Registry()

    @udf(
        input_types=["bigint"],
        result_type="bigint",
        name="segv_probe",
        fallible=True,
        memory_limit=CAP,
        registry=reg,
    )
    def segv_probe(x: int):
        if x and x > 0:
            import ctypes

            ctypes.string_at(0)  # NULL deref -> SIGSEGV
        return 0

    out = segv_probe._eval(pd.Series([1, 2]))
    assert out["value"].isna().all()
    assert set(out["error"]) == {"worker crashed: signal 11"}
    # the parent survived; a clean batch still evaluates
    ok = segv_probe._eval(pd.Series([0, 0]))
    assert ok["value"].tolist() == [0, 0]
    assert ok["error"].isna().all()


def test_large_result_pickles_after_cap_restore():
    """A result that FITS under the cap must not be misreported as
    over-limit just because pickling it needs a second copy: the child
    restores the soft limit before serialization (computation and any
    user-generator consumption still run capped)."""
    reg = Registry()
    big = 100 * 1024 * 1024  # ~100 MB payload under a 150 MB cap

    @udf(
        input_types=["bigint"],
        result_type="binary",
        name="capped_big_result",
        memory_limit=150 * 1024 * 1024,
        batch=True,
        registry=reg,
    )
    def capped_big_result(xs: pd.Series):
        return pd.Series([b"x" * big] * len(xs))

    out = capped_big_result._eval(pd.Series([1]))
    assert isinstance(out.iloc[0], bytes) and len(out.iloc[0]) == big
