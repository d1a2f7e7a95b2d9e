"""Aggregate functions with the reference's 5-phase protocol.

Reference protocol (SURVEY.md §2.A A6-A10; python runtime
arrow-udf-runtime/src/python/mod.rs:456-656):

    create_state() -> state
    accumulate(state, *args) -> state
    retract(state, *args) -> state          (optional; enables retraction)
    merge(state, other) -> state            (enables distributed agg)
    finish(state) -> output                 (optional; default: state)

Spark realization — a genuinely distributed two-phase plan:

  phase 1 (map side):  ``mapInPandas`` over input partitions; each partition
      locally groups by key and folds its rows into one partial state per
      key.  Partial states are pickled to a binary column, so only
      ``O(groups)`` bytes shuffle — the same reason Spark's own hash
      aggregate does map-side combine.  At 100 TB this is the difference
      between shuffling the table and shuffling a few KB per key.
  phase 2 (reduce side): ``groupBy(keys).applyInPandas`` merges partial
      states with ``merge`` and applies ``finish``.

This exercises the reference's ``merge`` exactly the way its distributed
hosts do (partial + final agg).  Pickle-typed opaque state
(reference arrowudf.pickle, python/pyarrow.rs:296-313) is the native state
carrier here.

Retraction (A8): exposed as ``accumulate_or_retract(df, by, args, ops_col)``
— the reference host protocol's mixed-ops bitmap
(python/mod.rs:537-582): rows with ops=True are retracted instead of
accumulated.  The same callback is reused by the streaming layer for
sliding-window retraction.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from typing import Any, Callable, Iterator, Optional, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..plans.registry import GLOBAL, Registry, Signature
from ..plans.types import ExtField, parse_type

__all__ = ["AggregateFunction", "udaf", "build_multi_fold"]


def build_multi_fold(
    udafs: Sequence["AggregateFunction"],
    by_n: int,
    arg_ns: Sequence[int],
    bp_kinds: Sequence[tuple],
):
    """Map-side fold for the two-phase SQL rewrite (r11 perf, guide §2.3).

    Returns a ``mapInArrow`` function over a projection laid out as
    ``[group keys (by_n)] + [udaf-0 args] + ... + [one col per non-star
    built-in partial]`` that emits ONE row per (group, input partition):
    ``[keys] + [pickled state per udaf] + [built-in partial per bp]``.

    This replaces the ``collect_list(named_struct(...)) -> __pfold``
    phase-1 pipeline: the fold happens BEFORE any exchange, so only
    O(groups x partitions) small state rows cross the shuffle instead of
    every raw value re-packed as collected arrays — the scale-correct
    shape — and the per-row JVM struct boxing + Python dict unpacking of
    the pfold path disappears (measured ~0.6 s per 600k-row arm at
    sf0.1).

    ``bp_kinds`` entries are ``(kind, col_idx_or_None)`` with kind one of
    ``count_star | count | sum_int | min | max``.  Built-in partials are
    restricted by the caller to shapes that are EXACT under this fold:
    COUNT is a row count; SUM over integral types wraps in int64 exactly
    like Spark's long partial sum (merge order is irrelevant modulo
    2^64); MIN/MAX are order-free.  Order-sensitive partials (float/
    decimal SUM, AVG) never reach this path.
    """
    import numpy as np
    import pyarrow as pa

    n_udafs = len(udafs)
    creates = [f.create_state for f in udafs]
    accs = [f.accumulate for f in udafs]
    acc_bs = [f.accumulate_batch for f in udafs]
    arg_offs = []
    off = by_n
    for n in arg_ns:
        arg_offs.append(off)
        off += n
    bp_base = off

    def fold(batches):
        states: dict[tuple, list] = {}
        # per-bp accumulators: count -> int, sum_int -> int64, min/max -> value
        bps: dict[tuple, list] = {}
        out_schema = None
        for rb in batches:
            if out_schema is None:
                fields = [
                    pa.field(rb.schema.field(i).name, rb.schema.field(i).type)
                    for i in range(by_n)
                ] + [pa.field(f"__st{i}", pa.binary()) for i in range(n_udafs)]
                for j, (kind, ci) in enumerate(bp_kinds):
                    if kind in ("count_star", "count", "sum_int"):
                        t = pa.int64()
                    else:  # min / max keep the input type
                        t = rb.schema.field(ci).type
                    fields.append(pa.field(f"__bp{j}", t))
                out_schema = pa.schema(fields)
            if rb.num_rows == 0:
                continue
            if by_n:
                keys_pdf = pd.DataFrame(
                    {f"c{i}": _exact_series(rb.column(i)) for i in range(by_n)}
                )
                groups = keys_pdf.groupby(
                    [f"c{i}" for i in range(by_n)], dropna=False, sort=False
                ).indices
            else:
                groups = {(): np.arange(rb.num_rows)}
            # one vectorized gather per column per BATCH, then contiguous
            # positional slices per group: per-group fancy indexing
            # (.iloc[idx], ~400 µs a call) made high-cardinality keys
            # pathological (~10k groups per 10k-row batch on the
            # decorrelated per-partkey fold); a slice is ~5 µs
            gkeys = list(groups)
            idx_list = [groups[key] for key in gkeys]
            order = np.concatenate(idx_list)
            bounds = np.cumsum([0] + [len(ix) for ix in idx_list])
            args_sorted = [
                _exact_series(rb.column(i))
                .take(order)
                .reset_index(drop=True)
                for i in range(by_n, bp_base)
            ]
            # python-value views for the tiny-group fast path: a pandas
            # slice + accumulate_batch costs ~50-100 µs even on 1 row, so
            # groups of a few rows fold through plain accumulate over
            # pre-extracted python values (~2 µs/row) — the UDAF contract
            # makes accumulate_batch ≡ repeated accumulate (pfold itself
            # picks between them by availability)
            args_lists = [s.tolist() for s in args_sorted]
            order_pa = pa.array(order, pa.int64())
            bp_sorted = {
                j: rb.column(ci).take(order_pa)
                for j, (kind, ci) in enumerate(bp_kinds)
                if ci is not None
            }
            for gi, key in enumerate(gkeys):
                k = key if isinstance(key, tuple) else (key,)
                a0, a1 = int(bounds[gi]), int(bounds[gi + 1])
                sts = states.get(k)
                if sts is None:
                    sts = [c() for c in creates]
                    states[k] = sts
                    bps[k] = [None] * len(bp_kinds)
                for u in range(n_udafs):
                    if acc_bs[u] is not None and a1 - a0 > 8:
                        sts[u] = acc_bs[u](
                            sts[u],
                            *[
                                args_sorted[arg_offs[u] - by_n + a].iloc[
                                    a0:a1
                                ]
                                for a in range(arg_ns[u])
                            ],
                        )
                    else:
                        st = sts[u]
                        for row in zip(
                            *[
                                args_lists[arg_offs[u] - by_n + a][a0:a1]
                                for a in range(arg_ns[u])
                            ]
                        ):
                            st = accs[u](
                                st,
                                *[None if _is_null(v) else v for v in row],
                            )
                        sts[u] = st
                bacc = bps[k]
                for j, (kind, ci) in enumerate(bp_kinds):
                    if kind == "count_star":
                        bacc[j] = (bacc[j] or 0) + (a1 - a0)
                        continue
                    valid = bp_sorted[j].slice(a0, a1 - a0).drop_null()
                    if kind == "count":
                        bacc[j] = (bacc[j] or 0) + len(valid)
                    elif len(valid) == 0:
                        continue  # all-NULL slice leaves the partial as is
                    elif kind == "sum_int":
                        s = np.add.reduce(
                            valid.to_numpy(zero_copy_only=False).astype(
                                np.int64, copy=False
                            )
                        )
                        prev = bacc[j]
                        bacc[j] = int(
                            np.int64(s)
                            if prev is None
                            else np.int64(prev) + np.int64(s)
                        )
                    else:
                        import pyarrow.compute as pc

                        mm = pc.min_max(valid)
                        v = mm["min" if kind == "min" else "max"].as_py()
                        prev = bacc[j]
                        if prev is None:
                            bacc[j] = v
                        elif kind == "min":
                            bacc[j] = v if v < prev else prev
                        else:
                            bacc[j] = v if v > prev else prev
        if out_schema is None:  # empty partition, schema unknown
            return
        keys = list(states)
        cols = [
            pa.array(
                [_np_unbox(k[i]) for k in keys],
                type=out_schema.field(i).type,
            )
            for i in range(by_n)
        ]
        for u in range(n_udafs):
            cols.append(
                pa.array(
                    [pickle.dumps(states[k][u]) for k in keys], pa.binary()
                )
            )
        for j in range(len(bp_kinds)):
            cols.append(
                pa.array(
                    [bps[k][j] for k in keys],
                    type=out_schema.field(by_n + n_udafs + j).type,
                )
            )
        yield pa.RecordBatch.from_arrays(cols, schema=out_schema)

    return fold


def _is_null(v) -> bool:
    # ``v is pd.NA`` must precede ``v != v``: pd.NA != pd.NA is pd.NA,
    # whose truthiness RAISES — the except branch then mis-reported NA as
    # non-null (masked-int .tolist() yields pd.NA, found by the r11 fold)
    try:
        return v is None or v is pd.NA or v != v
    except Exception:
        return False


#: Arrow int type id -> pandas masked dtype, for exact null-bearing batches
def _nullable_int_dtype(t):
    import pyarrow as pa

    return {
        pa.int8(): pd.Int8Dtype(),
        pa.int16(): pd.Int16Dtype(),
        pa.int32(): pd.Int32Dtype(),
        pa.int64(): pd.Int64Dtype(),
        pa.uint8(): pd.UInt8Dtype(),
        pa.uint16(): pd.UInt16Dtype(),
        pa.uint32(): pd.UInt32Dtype(),
        pa.uint64(): pd.UInt64Dtype(),
    }.get(t)


def _exact_series(col) -> pd.Series:
    """Arrow column -> pandas Series without lossy null coercion.

    int64-with-NULLs becomes masked ``Int64`` (all 64 bits intact) rather
    than float64, whose 53-bit mantissa silently corrupts large values
    (e.g. KMV hashes) before the aggregate ever sees them (ADVICE r4)."""
    import pyarrow as pa

    if col.null_count and pa.types.is_integer(col.type):
        return col.to_pandas(types_mapper=_nullable_int_dtype)
    return col.to_pandas()


def _np_unbox(v):
    """numpy/pandas scalar group key -> plain python (or None) for pa.array."""
    if v is None:
        return None
    try:
        if pd.isna(v):
            return None
    except (TypeError, ValueError):
        pass
    return v.item() if hasattr(v, "item") else v


@dataclass
class AggregateFunction:
    sig: Signature
    input_fields: tuple[ExtField, ...]
    result_field: ExtField
    create_state: Callable[[], Any]
    accumulate: Callable[..., Any]
    merge: Callable[[Any, Any], Any]
    retract: Optional[Callable[..., Any]] = None
    finish: Optional[Callable[[Any], Any]] = None
    #: optional vectorized fold: (state, *pandas.Series) -> state.  When
    #: present, phase 1 groups each Arrow batch with pandas and folds whole
    #: column slices instead of Python rows (~50x on numeric aggregates).
    accumulate_batch: Optional[Callable[..., Any]] = None

    # ------------------------------------------------------------------
    def as_spark_grouped_agg(self):
        """SQL surface: wrap the 5-phase protocol as a pandas GROUPED_AGG
        UDF so ``SELECT f(x) ... GROUP BY`` works after ``register_sql``
        (the reference's hosts call aggregates from SQL the same way).

        The whole group arrives as Series; accumulate_batch (or the row
        fold) runs once, then finish.  Spark does not split GROUPED_AGG
        into partials — for the distributed two-phase plan use
        :meth:`agg`; this path is the SQL-compatibility surface.

        SCALE WARNING (emitted once per aggregate at wrap time): Spark
        ships every row of a group to a single Python worker for
        GROUPED_AGG — there is no map-side combine, so a hot key at large
        scale concentrates the whole group's rows on one task.  The
        DataFrame :meth:`agg` path shuffles only O(groups) pickled partial
        states and is the one to use in pipelines.

        The wrapped UDF is memoized per instance, so the warning really
        does fire once per aggregate — not once per ``register_sql``
        call (the suite calls it from many tests/queries).
        """
        cached = getattr(self, "_grouped_agg_cache", None)
        if cached is not None:
            return cached
        import warnings

        warnings.warn(
            f"aggregate '{self.sig.name}' registered for SQL via GROUPED_AGG: "
            "a raw spark.sql() call evaluates this without partial "
            "aggregation (every row of a group moves to one worker). Run SQL "
            "through Registry.sql(spark, query) — it rewrites bare aggregate "
            "calls to the salted two-phase __partial/__merge plan — or use "
            "the DataFrame AggregateFunction.agg(df, by=..., args=...) path.",
            RuntimeWarning,
            stacklevel=2,
        )
        from pyspark.sql.functions import pandas_udf

        try:
            from pyspark.sql.pandas.functions import PandasUDFType

            _GROUPED = PandasUDFType.GROUPED_AGG
        except ImportError:  # pragma: no cover
            _GROUPED = 201

        create, acc, acc_b, finish = (
            self.create_state,
            self.accumulate,
            self.accumulate_batch,
            self.finish,
        )

        def agg_fn(*series):
            st = create()
            if acc_b is not None:
                st = acc_b(st, *series)
            else:
                for row in zip(*[s.tolist() for s in series]):
                    st = acc(st, *[None if _is_null(v) else v for v in row])
            return finish(st) if finish is not None else st

        agg_fn.__name__ = self.sig.name
        udf = pandas_udf(
            agg_fn, returnType=self.result_field.dtype, functionType=_GROUPED
        )
        self._grouped_agg_cache = udf
        return udf

    # ------------------------------------------------------------------
    def as_spark_grouped_agg_partial(self):
        """SQL two-phase surface, phase 1: fold a group slice into ONE
        pickled state (BinaryType).  Pair with
        :meth:`as_spark_grouped_agg_merge` in a salted two-level GROUP BY::

            SELECT k, f__merge(p) FROM (
                SELECT k, f__partial(x) AS p
                FROM t GROUP BY k, pmod(hash(x), 32)
            ) GROUP BY k

        Scale posture vs the single-phase GROUPED_AGG surface: a hot key's
        rows split across the 32 salt buckets (no single Python worker
        receives the whole group), and the outer aggregation moves only
        O(groups x 32) pickled states.  The one inherent cost SQL can't
        avoid — Python aggregates get no JVM map-side combine, so rows
        shuffle once either way — is shared with every GROUP BY surface;
        the DataFrame :meth:`agg` path (mapInPandas partials, zero row
        shuffle) remains the pipeline-grade option.
        """
        from pyspark.sql.functions import pandas_udf

        try:
            from pyspark.sql.pandas.functions import PandasUDFType

            _GROUPED = PandasUDFType.GROUPED_AGG
        except ImportError:  # pragma: no cover
            _GROUPED = 201

        create, acc, acc_b = self.create_state, self.accumulate, self.accumulate_batch

        def partial_fn(*series):
            st = create()
            if acc_b is not None:
                st = acc_b(st, *series)
            else:
                for row in zip(*[s.tolist() for s in series]):
                    st = acc(st, *[None if _is_null(v) else v for v in row])
            return pickle.dumps(st)

        partial_fn.__name__ = f"{self.sig.name}__partial"
        return pandas_udf(partial_fn, returnType=T.BinaryType(), functionType=_GROUPED)

    def as_spark_grouped_agg_merge(self):
        """SQL two-phase surface, phase 2: merge pickled partial states and
        finish (see :meth:`as_spark_grouped_agg_partial`)."""
        from pyspark.sql.functions import pandas_udf

        try:
            from pyspark.sql.pandas.functions import PandasUDFType

            _GROUPED = PandasUDFType.GROUPED_AGG
        except ImportError:  # pragma: no cover
            _GROUPED = 201

        merge, finish = self.merge, self.finish

        def merge_fn(blobs):
            state = None
            for blob in blobs:
                if blob is None:
                    continue
                s = pickle.loads(blob)
                state = s if state is None else merge(state, s)
            return finish(state) if finish is not None else state

        merge_fn.__name__ = f"{self.sig.name}__merge"
        return pandas_udf(
            merge_fn, returnType=self.result_field.dtype, functionType=_GROUPED
        )

    # ------------------------------------------------------------------
    def as_spark_pfold(self):
        """SQL two-phase surface, phase-1 VECTORIZED form (r10 perf): a
        scalar pandas UDF over ``collect_list(named_struct(...))`` rows.

        The GROUPED_AGG ``__partial`` surface costs one Python UDF
        invocation per (group, salt) — on a high-cardinality key that is
        O(K·S) calls of ~1 row each, pure per-call overhead (measured:
        sql_agg_correlated_two_phase's inner per-partkey agg, see
        OPTIMIZATION_r10.md).  Here the grouping itself runs as a NATIVE
        ``collect_list`` aggregate (map-side partial_collect_list, whole
        stage codegen) and Python sees whole Arrow batches of groups —
        one invocation per ~10k groups instead of one per group.  The
        fold inside is the same accumulate/accumulate_batch the
        ``__partial`` path runs, so the state stream is semantically
        identical; struct-wrapping the args preserves NULLs
        (``collect_list`` drops bare NULL elements, never structs).

        NOT memoized on the instance: a used pandas_udf wrapper holds a
        JVM handle, and streaming closures (streaming_running_agg)
        pickle the AggregateFunction — a cached wrapper attribute makes
        the instance unpicklable (found by the r10 replica sweep).
        """
        from pyspark.sql.functions import pandas_udf

        create, acc, acc_b = self.create_state, self.accumulate, self.accumulate_batch

        def pfold_fn(vals: pd.Series) -> pd.Series:
            out = []
            for arr in vals:
                st = create()
                if arr is not None and len(arr) > 0:
                    ks = [f"a{i}" for i in range(len(arr[0]))]
                    if acc_b is not None:
                        st = acc_b(
                            st, *[pd.Series([r[k] for r in arr]) for k in ks]
                        )
                    else:
                        for r in arr:
                            st = acc(
                                st,
                                *[
                                    None if _is_null(r[k]) else r[k]
                                    for k in ks
                                ],
                            )
                out.append(pickle.dumps(st))
            return pd.Series(out, dtype=object)

        pfold_fn.__name__ = f"{self.sig.name}__pfold"
        return pandas_udf(pfold_fn, returnType=T.BinaryType())

    def as_spark_mergevec(self):
        """Phase-2 VECTORIZED form (r10 perf): scalar pandas UDF over
        ``collect_list(<pickled state>)`` rows — merge + finish for a whole
        Arrow batch of groups per Python invocation, replacing the
        per-group GROUPED_AGG ``__merge`` call (and the per-group
        ``applyInPandas`` call of the DataFrame :meth:`agg` path).  Merge
        order over the collected states is arbitrary exactly as it is for
        the GROUPED_AGG/applyInPandas surfaces — the UDAF contract makes
        merge commutative+associative, so the result is unchanged.

        NOT memoized on the instance (see :meth:`as_spark_pfold`)."""
        from pyspark.sql.functions import pandas_udf

        merge, finish = self.merge, self.finish

        def mergevec_fn(blob_lists: pd.Series) -> pd.Series:
            out = []
            for blobs in blob_lists:
                state = None
                if blobs is not None:
                    for blob in blobs:
                        if blob is None:
                            continue
                        s = pickle.loads(blob)
                        state = s if state is None else merge(state, s)
                out.append(finish(state) if finish is not None else state)
            return pd.Series(out, dtype=object)

        mergevec_fn.__name__ = f"{self.sig.name}__mergevec"
        return pandas_udf(mergevec_fn, returnType=self.result_field.dtype)

    # ------------------------------------------------------------------
    def _fold_partition(
        self, by_n: int, arg_n: int, ops_col: bool
    ) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
        """Phase-1 worker: partition -> one pickled partial state per key."""
        create, acc, ret = self.create_state, self.accumulate, self.retract
        acc_batch = self.accumulate_batch

        if acc_batch is not None and not ops_col:

            def fold_vec(batches):
                """Arrow-native phase 1 (fed by ``mapInArrow``): int columns
                with NULLs convert to pandas masked ``Int64`` — exact to all
                64 bits — instead of mapInPandas' lossy float64 coercion
                (which silently destroys hash/int bits above 2^53)."""
                import numpy as np
                import pyarrow as pa

                states: dict[tuple, Any] = {}
                out_schema = None
                for rb in batches:
                    if out_schema is None:
                        out_schema = pa.schema(
                            [
                                pa.field(f"k{i}", rb.schema.field(i).type)
                                for i in range(by_n)
                            ]
                            + [pa.field("state", pa.binary())]
                        )
                    if rb.num_rows == 0:
                        continue
                    arg_series = [
                        _exact_series(rb.column(by_n + i)) for i in range(arg_n)
                    ]
                    if by_n:
                        # _exact_series for KEYS too: int64 keys in a
                        # NULL-bearing batch must not round-trip through
                        # float64 (2^53+1 and 2^53 would merge into one
                        # group under a silently-corrupted key)
                        keys_pdf = pd.DataFrame(
                            {f"c{i}": _exact_series(rb.column(i)) for i in range(by_n)}
                        )
                        groups = keys_pdf.groupby(
                            [f"c{i}" for i in range(by_n)], dropna=False, sort=False
                        ).indices
                    else:
                        groups = {(): np.arange(rb.num_rows)}
                    for key, idx in groups.items():
                        k = key if isinstance(key, tuple) else (key,)
                        st = states.get(k)
                        if st is None and k not in states:
                            st = create()
                        states[k] = acc_batch(
                            st,
                            *[
                                s.iloc[idx].reset_index(drop=True)
                                for s in arg_series
                            ],
                        )
                if out_schema is None:  # empty partition, schema unknown
                    return
                cols = [
                    pa.array(
                        [_np_unbox(k[i]) for k in states],
                        type=out_schema.field(i).type,
                    )
                    for i in range(by_n)
                ] + [pa.array([pickle.dumps(s) for s in states.values()], pa.binary())]
                yield pa.RecordBatch.from_arrays(cols, schema=out_schema)

            return fold_vec

        def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            states: dict[tuple, Any] = {}
            key_rows: dict[tuple, tuple] = {}
            for pdf in batches:
                cols = [pdf.iloc[:, i].tolist() for i in range(pdf.shape[1])]
                n = len(pdf)
                for r in range(n):
                    key = tuple(cols[i][r] for i in range(by_n))
                    args = [
                        None if _is_null(v) else v
                        for v in (cols[by_n + i][r] for i in range(arg_n))
                    ]
                    st = states.get(key)
                    if st is None and key not in states:
                        st = create()
                        key_rows[key] = key
                    if ops_col:
                        is_retract = bool(cols[by_n + arg_n][r])
                        st = ret(st, *args) if is_retract else acc(st, *args)
                    else:
                        st = acc(st, *args)
                    states[key] = st
            out = [key_rows[k] + (pickle.dumps(s),) for k, s in states.items()]
            names = [f"k{i}" for i in range(by_n)] + ["state"]
            yield pd.DataFrame(out, columns=names) if out else pd.DataFrame(
                columns=names
            )

        return fold

    # ------------------------------------------------------------------
    def agg(
        self,
        df: DataFrame,
        by: Sequence[str],
        args: Sequence[str],
        _ops_col: Optional[str] = None,
    ) -> DataFrame:
        """Distributed grouped aggregation: ``by`` key cols, ``args`` inputs."""
        by = list(by)
        args = list(args)
        sel = by + args + ([_ops_col] if _ops_col else [])
        proj = df.select(*sel)

        phase1_schema = T.StructType(
            [T.StructField(f"k{i}", df.schema[c].dataType) for i, c in enumerate(by)]
            + [T.StructField("state", T.BinaryType())]
        )
        fold = self._fold_partition(len(by), len(args), _ops_col is not None)
        if self.accumulate_batch is not None and _ops_col is None:
            # Arrow-native phase 1: exact nullable-int batches (no float64
            # coercion of NULL-bearing int columns) and one less conversion
            partials = proj.mapInArrow(fold, schema=phase1_schema)
        else:
            partials = proj.mapInPandas(fold, schema=phase1_schema)

        knames = [f"k{i}" for i in range(len(by))]
        # merge+finish VECTORIZED (r10 perf): a native collect_list of the
        # O(partitions)-bounded pickled states per key (map-side partial,
        # codegen) and ONE scalar pandas UDF invocation per Arrow batch of
        # groups — applyInPandas called Python once per group, which at
        # high key cardinality is pure per-call overhead.  State merge
        # order stays arbitrary (UDAF contract: commutative+associative).
        result = (
            partials.groupBy(*knames)
            .agg(F.collect_list("state").alias("__aus_states"))
            .select(
                *knames,
                self.as_spark_mergevec()(F.col("__aus_states")).alias(
                    self.sig.name
                ),
            )
        )
        # restore user-facing key column names
        renames = dict(zip(knames, by))
        return result.select(
            *[F.col(k).alias(renames[k]) for k in knames], F.col(self.sig.name)
        )

    def agg_all(self, df: DataFrame, args: Sequence[str]) -> DataFrame:
        """Global (ungrouped) aggregate -> single-row DataFrame."""
        with_key = df.withColumn("__g", F.lit(0))
        out = self.agg(with_key, ["__g"], args)
        return out.drop("__g")

    def accumulate_or_retract(
        self, df: DataFrame, by: Sequence[str], args: Sequence[str], ops_col: str
    ) -> DataFrame:
        """Mixed accumulate/retract batch (reference ops bitmap, A8).

        Rows where ``ops_col`` is true are retracted (inverse-folded).
        """
        if self.retract is None:
            raise ValueError(f"aggregate {self.sig.name} does not define retract")
        return self.agg(df, by, args, _ops_col=ops_col)


def udaf(
    input_types: Sequence[str] | str = (),
    result_type: str = "null",
    state_type: str = "pickle",
    name: Optional[str] = None,
    registry: Registry = GLOBAL,
) -> Callable[[type], AggregateFunction]:
    """Declare an aggregate from a class with the 5-phase protocol::

        @udaf(input_types=["int"], result_type="int", name="sum_udaf")
        class Sum:
            def create_state(self): return 0
            def accumulate(self, s, x): return s + (x or 0)
            def retract(self, s, x): return s - (x or 0)
            def merge(self, a, b): return a + b
            # finish optional
    """
    if isinstance(input_types, str):
        input_types = [input_types]

    def deco(cls: type) -> AggregateFunction:
        inst = cls()
        # registration-time validation from the reference runtime
        # (python/mod.rs:305): with no finish(), the state IS the output,
        # so a declared Arrow state type must equal the result type.  The
        # default "pickle" state is opaque and exempt (the reference's
        # pickled-state mode, pyarrow.rs:296-313).
        if getattr(inst, "finish", None) is None and state_type != "pickle":
            # compare NORMALIZED types, not raw strings: alias pairs like
            # 'time'/'time64' or 'date'/'date32' are logically equal and
            # must not raise, while textual equality of unnormalized
            # spellings is not the contract (ADVICE r3)
            st, rt = parse_type(state_type), parse_type(result_type)
            if st.dtype != rt.dtype or st.ext != rt.ext:
                raise ValueError(
                    "`output_type` must be the same as `state_type` "
                    "when `finish` is not defined"
                )
        af = AggregateFunction(
            sig=Signature(
                name=name or cls.__name__.lower(),
                arg_types=tuple(input_types),
                return_type=result_type,
                kind="aggregate",
            ),
            input_fields=tuple(parse_type(t) for t in input_types),
            result_field=parse_type(result_type),
            create_state=inst.create_state,
            accumulate=inst.accumulate,
            merge=inst.merge,
            retract=getattr(inst, "retract", None),
            finish=getattr(inst, "finish", None),
            accumulate_batch=getattr(inst, "accumulate_batch", None),
        )
        registry.add(af)
        return af

    return deco
