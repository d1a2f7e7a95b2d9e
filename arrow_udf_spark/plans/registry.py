"""Function registry with overload resolution.

Mirrors the reference's global signature registry and lookup rules
(reference: arrow-udf/src/sig.rs:92-151 — name + argument types + return
type, with a variadic prefix rule), re-expressed as a plain Python
registry.  SQL visibility is provided by registering each concrete
overload with ``spark.udf.register`` under a mangled name
(``name`` for the first/only overload, ``name__t1_t2`` for the rest).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Any, Optional

if TYPE_CHECKING:
    from pyspark.sql import SparkSession


@dataclass
class Signature:
    name: str
    arg_types: tuple[str, ...]
    return_type: str
    variadic: bool = False
    kind: str = "scalar"  # scalar | table | aggregate

    def mangled(self) -> str:
        if not self.arg_types:
            return self.name
        return self.name + "__" + "_".join(t.replace(" ", "") for t in self.arg_types)

    def matches(self, arg_types: tuple[str, ...]) -> bool:
        if self.variadic:
            # variadic prefix rule (sig.rs:106-110): fixed prefix must match,
            # trailing args all take the last declared type
            if len(arg_types) < len(self.arg_types) - 1:
                return False
            fixed = self.arg_types[:-1]
            if arg_types[: len(fixed)] != fixed:
                return False
            tail = self.arg_types[-1]
            return all(t == tail for t in arg_types[len(fixed) :])
        return arg_types == self.arg_types


@dataclass
class Registry:
    """name -> list of registered functions (overloads)."""

    _fns: dict[str, list[Any]] = field(default_factory=dict)
    # names this registry has itself SQL-registered (so re-registration in
    # the same session is recognized as ours, not as a builtin collision)
    _sql_names: set[str] = field(default_factory=set)

    def add(self, fn: Any) -> None:
        self._fns.setdefault(fn.sig.name, []).append(fn)

    def get(
        self,
        name: str,
        arg_types: Optional[tuple[str, ...]] = None,
        kind: Optional[str] = None,
    ) -> Any:
        """Resolve ``name`` (+ optional normalized arg types) to a function."""
        cands = self._fns.get(name, [])
        if kind is not None:
            cands = [f for f in cands if f.sig.kind == kind]
        if not cands:
            raise KeyError(f"function not found: {name}")
        if arg_types is None:
            return cands[0]
        for f in cands:
            if f.sig.matches(tuple(arg_types)):
                return f
        raise KeyError(f"no overload of {name} matches argument types {arg_types}")

    def names(self) -> list[str]:
        return sorted(self._fns)

    def all(self) -> list[Any]:
        return [f for fns in self._fns.values() for f in fns]

    def register_sql(self, spark: "SparkSession") -> list[str]:
        """Expose overloads to ``spark.sql`` under mangled names.

        Scalars register via ``spark.udf.register``; table functions via
        ``spark.udtf.register`` (usable as ``SELECT * FROM f(...)`` and in
        ``LATERAL``).  The first overload of each name is also registered
        under the bare name, so ``SELECT gcd(a, b)`` works for the common
        case.
        """
        registered = []
        for name, fns in self._fns.items():
            # never shadow a Spark builtin under its bare name: a session
            # where `substring`/`length` silently became Python UDFs would
            # break unrelated queries (builtins resolve by name at analysis)
            if name in self._sql_names:
                bare_ok = True
            else:
                try:
                    bare_ok = not spark.catalog.functionExists(name)
                except Exception:
                    bare_ok = False
            scalar_i = table_i = 0
            for f in fns:
                if f.sig.kind == "scalar":
                    use_bare = bare_ok and scalar_i == 0
                    sql_name = name if use_bare else f.sig.mangled()
                    spark.udf.register(sql_name, f.as_spark_udf())
                    scalar_i += 1
                elif f.sig.kind == "table":
                    use_bare = bare_ok and table_i == 0
                    sql_name = name if use_bare else f.sig.mangled()
                    spark.udtf.register(sql_name, f.as_spark_udtf())
                    table_i += 1
                elif f.sig.kind == "aggregate":
                    # aggregates own their name space: first overload bare
                    sql_name = name if bare_ok else f.sig.mangled()
                    spark.udf.register(sql_name, f.as_spark_grouped_agg())
                    # two-phase SQL pair: the salted GROUP BY pattern
                    # (partial -> pickled state, merge -> finish) splits
                    # hot keys across workers; see
                    # AggregateFunction.as_spark_grouped_agg_partial
                    spark.udf.register(
                        f"{sql_name}__partial", f.as_spark_grouped_agg_partial()
                    )
                    spark.udf.register(
                        f"{sql_name}__merge", f.as_spark_grouped_agg_merge()
                    )
                    registered.append(f"{sql_name}__partial")
                    registered.append(f"{sql_name}__merge")
                    bare_ok = False
                else:
                    continue
                if sql_name == name:
                    self._sql_names.add(name)
                registered.append(sql_name)
        return registered


#: the default global registry (analogue of the reference's linkme slice,
#: arrow-udf/src/sig.rs:114-127)
GLOBAL = Registry()
