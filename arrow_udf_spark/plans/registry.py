"""Function registry with overload resolution.

Mirrors the reference's global signature registry and lookup rules
(reference: arrow-udf/src/sig.rs:92-151 — name + argument types + return
type, with a variadic prefix rule), re-expressed as a plain Python
registry.  SQL visibility is provided by registering each concrete
overload with ``spark.udf.register`` under a mangled name
(``name`` for the first/only overload, ``name__t1_t2`` for the rest).
"""

from __future__ import annotations

import re
import warnings
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Any, Optional

if TYPE_CHECKING:
    from pyspark.sql import DataFrame, SparkSession


def _split_top_level(text: str) -> list[str]:
    """Split on commas not nested inside parentheses / quotes."""
    parts, depth, buf, quote = [], 0, [], None
    for ch in text:
        if quote:
            buf.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append("".join(buf).strip())
            buf = []
            continue
        buf.append(ch)
    if buf:
        parts.append("".join(buf).strip())
    return parts


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
    # aggregate name -> sql name its first overload registered under (bare
    # or mangled); used by the two-phase SQL rewrite in :meth:`sql`
    _agg_sql_names: dict[str, str] = field(default_factory=dict)

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
                    self._agg_sql_names.setdefault(name, sql_name)
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

    # ------------------------------------------------------------------
    # Scale-safe SQL front door for aggregates
    # ------------------------------------------------------------------
    #: GROUP BY is optional: a GLOBAL aggregate (SELECT agg(x) FROM t) is
    #: the worst single-phase case — EVERY row moves to one worker — so it
    #: needs the salted two-phase rewrite most of all
    _GROUPBY_SHAPE = re.compile(
        r"(?is)^\s*SELECT\s+(?P<sel>.*?)\s+FROM\s+(?P<frm>.*?)"
        r"(?:\s+WHERE\s+(?P<where>.*?))?"
        r"(?:\s+GROUP\s+BY\s+(?P<grp>.*?))?"
        r"(?P<tail>\s+(?:HAVING|ORDER\s+BY|LIMIT)\b.*)?\s*;?\s*$"
    )
    _AGG_ITEM = re.compile(
        r"(?is)^(?:CAST\s*\(\s*)?(?P<fn>[A-Za-z_]\w*)\s*\((?P<args>.*?)\)"
        r"(?:\s+AS\s+(?P<cast>[\w()<>, ]+?)\s*\))?"
        r"(?:\s+AS\s+(?P<alias>[A-Za-z_]\w*))?$"
    )
    _PLAIN_COL = re.compile(r"(?i)^[A-Za-z_][\w.]*$")
    #: tail clauses that survive the two-phase rewrite: plain ORDER BY
    #: column/alias lists (ASC/DESC/NULLS FIRST|LAST are \w words) and
    #: LIMIT — no parentheses means no aggregate calls; HAVING never
    #: matches and falls back to single-phase
    _SAFE_TAIL = re.compile(
        r"(?i)^\s*(ORDER\s+BY\s+[\w\s,.]+?)?\s*(LIMIT\s+\d+)?\s*;?\s*$"
    )

    def sql(self, spark: "SparkSession", query: str) -> "DataFrame":
        """Run SQL with bare aggregate names made scale-safe by default.

        Spark plans a GROUPED_AGG pandas UDF without partial aggregation:
        every row of a group moves to ONE worker — a scale trap on hot keys
        (the reference's hosts always run partial+final agg,
        arrow-udf-runtime/src/python/mod.rs:456-656).  This front door
        rewrites ``agg(args)`` calls over a single-block ``GROUP BY`` into
        the salted two-phase ``agg__partial`` / ``agg__merge`` composition:
        each group's rows fold into one pickled state per input partition
        (``spark_partition_id()`` salt), and only O(groups x partitions)
        states reach the final merge — the same plan shape as
        ``AggregateFunction.agg``.

        Queries that don't call a registered aggregate run unchanged.
        Shapes the rewriter can't prove safe (expression group keys,
        aggregates nested in arithmetic, sub-selects in the select list)
        fall back to the single-phase form with the registration warning.
        """
        agg_names = {
            n
            for n, fns in self._fns.items()
            if any(f.sig.kind == "aggregate" for f in fns)
        }
        used = {
            n
            for n in agg_names
            if re.search(rf"(?i)\b{re.escape(n)}\s*\(", query)
        }
        if not used:
            return spark.sql(query)
        self.register_sql(spark)
        rewritten = self._rewrite_two_phase(query, used)
        if rewritten is None:
            warnings.warn(
                "query shape not rewritable to two-phase aggregation; "
                "running single-phase GROUPED_AGG (every row of a group "
                "moves to one worker)",
                RuntimeWarning,
                stacklevel=2,
            )
            return spark.sql(query)
        return spark.sql(rewritten)

    def _rewrite_two_phase(self, query: str, used: set[str]) -> Optional[str]:
        m = self._GROUPBY_SHAPE.match(query)
        if not m:
            return None
        grp_items = _split_top_level(m.group("grp")) if m.group("grp") else []
        if not all(self._PLAIN_COL.match(g) for g in grp_items):
            return None
        sel_items = _split_top_level(m.group("sel"))
        inner_aggs: list[str] = []
        outer_items: list[str] = []
        grp_set = {g.lower() for g in grp_items}
        for item in sel_items:
            if self._PLAIN_COL.match(item) and item.lower() in grp_set:
                outer_items.append(item)
                continue
            am = self._AGG_ITEM.match(item)
            fn = am.group("fn").lower() if am else None
            if am is None or fn not in used or fn not in self._agg_sql_names:
                return None
            sql_name = self._agg_sql_names[fn]
            # DISTINCT inside the call cannot be split: per-partition
            # DISTINCT before the merge would miss cross-partition dupes
            if re.match(r"(?is)^\s*DISTINCT\b", am.group("args") or ""):
                return None
            i = len(inner_aggs)
            inner_aggs.append(f"{sql_name}__partial({am.group('args')}) AS __st{i}")
            merged = f"{sql_name}__merge(__st{i})"
            if am.group("cast"):
                merged = f"CAST({merged} AS {am.group('cast').strip()})"
            alias = am.group("alias") or fn
            outer_items.append(f"{merged} AS {alias}")
        if not inner_aggs:
            return None
        where = f" WHERE {m.group('where')}" if m.group("where") else ""
        tail = m.group("tail") or ""
        # The tail is appended to the OUTER merge query: any aggregate in
        # it (HAVING COUNT(*) > 5, ORDER BY SUM(x)) would evaluate over
        # partial states — groups × partitions — not input rows.  Only a
        # plain ORDER BY on column names / aliases and LIMIT are
        # semantics-preserving; anything else falls back to single-phase.
        if tail and not self._SAFE_TAIL.match(tail):
            return None
        grp = ", ".join(grp_items)
        inner = (
            f"SELECT {grp}{', ' if grp else ''}{', '.join(inner_aggs)} "
            f"FROM (SELECT *, spark_partition_id() AS __aus_salt "
            f"FROM {m.group('frm')}{where}) __aus_salted "
            f"GROUP BY {grp}{', ' if grp else ''}__aus_salt"
        )
        outer_grp = f"GROUP BY {grp}" if grp else ""
        return (
            f"SELECT {', '.join(outer_items)} FROM ({inner}) __aus_partials "
            f"{outer_grp}{tail}"
        )


#: the default global registry (analogue of the reference's linkme slice,
#: arrow-udf/src/sig.rs:114-127)
GLOBAL = Registry()
