import pytest

from arrow_udf_spark import Registry, udf


def test_overloads_and_mangling():
    reg = Registry()

    @udf(input_types=["int", "int"], result_type="int", name="f", registry=reg)
    def f_int(a, b):
        return a

    @udf(input_types=["bigint", "bigint"], result_type="bigint", name="f", registry=reg)
    def f_big(a, b):
        return a

    assert reg.get("f").sig.arg_types == ("int", "int")
    assert reg.get("f", ("bigint", "bigint")).sig.mangled() == "f__bigint_bigint"
    with pytest.raises(KeyError):
        reg.get("f", ("string",))
    with pytest.raises(KeyError):
        reg.get("nope")


def test_variadic_match():
    reg = Registry()

    @udf(
        input_types=["string", "int"],
        result_type="string",
        name="v",
        variadic=True,
        registry=reg,
    )
    def v(s, *xs):
        return s

    assert reg.get("v", ("string", "int", "int", "int")).sig.name == "v"
    with pytest.raises(KeyError):
        reg.get("v", ("string", "int", "string"))


def test_global_corpus_registered():
    from arrow_udf_spark import GLOBAL
    import arrow_udf_spark.functions  # noqa: F401

    names = GLOBAL.names()
    for expected in ["gcd", "div", "series", "key_values", "sum_udaf", "weighted_avg"]:
        assert expected in names, expected


def test_udtf_sql_registration(spark):
    from arrow_udf_spark.functions import corpus as C  # noqa: F401 (registers)
    from arrow_udf_spark.plans.registry import GLOBAL

    GLOBAL.register_sql(spark)
    # table function as a SQL relation
    out = spark.sql("SELECT * FROM series(4)").collect()
    assert [r.series for r in out] == [0, 1, 2, 3]
    # lateral over a real table, struct output flattened to columns
    p = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    p.createOrReplaceTempView("part_sqludtf")
    rows = spark.sql(
        """
        SELECT p.p_partkey, s.word, s.length
        FROM part_sqludtf p, LATERAL split_words(p.p_name) s
        LIMIT 20
        """
    ).collect()
    assert len(rows) == 20 and all(r.length == len(r.word) for r in rows)


def test_udtf_sql_fallible_error_row(spark):
    from arrow_udf_spark.plans.registry import GLOBAL

    GLOBAL.register_sql(spark)
    rows = spark.sql(
        """SELECT * FROM json_array_elements('{"not": "array"}')"""
    ).collect()
    assert len(rows) == 1
    assert rows[0].json_array_elements is None and "not an array" in rows[0].error


def test_udaf_sql_registration(spark):
    from arrow_udf_spark.plans.registry import GLOBAL

    GLOBAL.register_sql(spark)
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.createOrReplaceTempView("li_udaf")
    got = spark.sql(
        """
        SELECT l_returnflag, sum_udaf(l_orderkey) AS s,
               weighted_avg(l_extendedprice, l_quantity) AS w
        FROM li_udaf GROUP BY l_returnflag
        """
    ).collect()
    exp = {
        r.l_returnflag: (r.s, r.w)
        for r in spark.sql(
            """
            SELECT l_returnflag, SUM(l_orderkey) AS s,
                   SUM(l_extendedprice * l_quantity) / SUM(l_quantity) AS w
            FROM li_udaf GROUP BY l_returnflag
            """
        ).collect()
    }
    assert len(got) == len(exp)
    for r in got:
        s, w = exp[r.l_returnflag]
        assert r.s == s and abs(r.w - w) < 1e-6


def test_udaf_sql_two_phase_pair(spark):
    """The __partial/__merge GROUPED_AGG pair gives SQL the salted
    two-level plan: partial folds per (key, salt) bucket, merge+finish per
    key.  weighted_avg carries a struct state, so a wrong merge (e.g.
    averaging averages) diverges immediately."""
    from arrow_udf_spark.plans.registry import GLOBAL

    GLOBAL.register_sql(spark)
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    li.createOrReplaceTempView("li_2p")
    got = spark.sql(
        """
        SELECT l_returnflag,
               sum_udaf__merge(ps) AS s,
               weighted_avg__merge(pw) AS w
        FROM (
            SELECT l_returnflag,
                   sum_udaf__partial(l_orderkey) AS ps,
                   weighted_avg__partial(l_extendedprice, l_quantity) AS pw
            FROM li_2p
            GROUP BY l_returnflag, pmod(hash(l_orderkey), 16)
        )
        GROUP BY l_returnflag
        """
    ).collect()
    exp = {
        r.l_returnflag: (r.s, r.w)
        for r in spark.sql(
            """
            SELECT l_returnflag, SUM(l_orderkey) AS s,
                   SUM(l_extendedprice * l_quantity) / SUM(l_quantity) AS w
            FROM li_2p GROUP BY l_returnflag
            """
        ).collect()
    }
    assert len(got) == len(exp)
    for r in got:
        s, w = exp[r.l_returnflag]
        assert r.s == s and abs(r.w - w) < 1e-6


def test_udaf_sql_surface_warns_no_partial_agg(spark):
    """The SQL GROUPED_AGG surface cannot do map-side combine (Spark ships
    the whole group to one worker); wrapping must warn loudly so pipelines
    reach for the two-phase AggregateFunction.agg path on hot keys."""
    import warnings

    from arrow_udf_spark.functions import corpus as C

    C.SumAgg._grouped_agg_cache = None  # reset the once-per-aggregate memo
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        C.SumAgg.as_spark_grouped_agg()
    msgs = [str(w.message) for w in caught if w.category is RuntimeWarning]
    assert any("without partial" in m for m in msgs), msgs
    assert any("Registry.sql" in m for m in msgs), msgs
    assert any("agg(df, by=" in m for m in msgs), msgs


def test_udaf_overloads_all_get_two_phase_pair(spark):
    """EVERY aggregate overload must register its __partial/__merge pair —
    the second (mangled-name) overload included, not just the bare-named
    first one (ADVICE r3)."""
    from arrow_udf_spark.operators.aggregate import udaf
    from arrow_udf_spark.plans.registry import Registry

    reg = Registry()

    @udaf(input_types=["bigint"], result_type="bigint", name="ovl_sum", registry=reg)
    class OvlSumInt:
        def create_state(self):
            return 0

        def accumulate(self, s, x):
            return s + (0 if x is None else int(x))

        def merge(self, a, b):
            return a + b

    @udaf(input_types=["double"], result_type="double", name="ovl_sum", registry=reg)
    class OvlSumDouble:
        def create_state(self):
            return 0.0

        def accumulate(self, s, x):
            return s + (0.0 if x is None else float(x))

        def merge(self, a, b):
            return a + b

    registered = set(reg.register_sql(spark))
    # first overload owns the bare name; the second registers mangled —
    # and BOTH must expose partial/merge
    assert {"ovl_sum__partial", "ovl_sum__merge"} <= registered
    assert {"ovl_sum__double__partial", "ovl_sum__double__merge"} <= registered
    got = spark.sql(
        """
        SELECT ovl_sum__double__merge(p) AS s FROM (
            SELECT ovl_sum__double__partial(CAST(id AS DOUBLE)) AS p
            FROM range(10) GROUP BY pmod(id, 3)
        )
        """
    ).collect()
    assert got[0].s == 45.0


def test_two_phase_rewrite_handles_aggregate_tail(spark):
    """HAVING / aggregate ORDER BY tails ride the two-phase rewrite (r6,
    closing the r5 silent-fallback gap): UDAF calls become __u columns of
    the salted U subquery; built-in aggregates must NEVER evaluate over
    partial states — they run natively in the B subquery, joined
    null-safely on the group keys, and HAVING becomes a WHERE over the
    join."""
    from arrow_udf_spark.plans.registry import GLOBAL

    r = GLOBAL
    r._agg_sql_names.setdefault("sum_udaf", "sum_udaf")
    used = {"sum_udaf"}
    ok = r._rewrite_two_phase(
        "SELECT g, sum_udaf(x) AS s FROM t GROUP BY g ORDER BY s DESC LIMIT 5",
        used,
    )
    assert ok is not None and ok.rstrip().endswith("ORDER BY s DESC LIMIT 5")
    # built-in agg in HAVING -> folded through the salted pass: a native
    # per-(group, salt) COUNT partial merged by SUM in U (exact — the
    # same partial/merge arithmetic Spark's Aggregate does), WHERE over
    # U; the COUNT must aggregate source rows, never partial states
    ok = r._rewrite_two_phase(
        "SELECT g, sum_udaf(x) AS s FROM t GROUP BY g HAVING COUNT(*) > 5",
        used,
    )
    assert ok is not None
    assert "COUNT(*) AS __bp0" in ok and "WHERE __b0 > 5" in ok
    assert "COALESCE(SUM(__bp0), 0) AS __b0" in ok
    assert "__aus_b" not in ok  # B subquery folded away — no second scan
    assert "COUNT(__st" not in ok  # never counts partial states
    # plain grouped-column HAVING stays a WHERE on U alone (no B join)
    ok = r._rewrite_two_phase(
        "SELECT g, sum_udaf(x) AS s FROM t GROUP BY g HAVING g > 5", used
    )
    assert ok is not None and "WHERE g > 5" in ok and "JOIN" not in ok
    # aggregate ORDER BY rides the same path
    ok = r._rewrite_two_phase(
        "SELECT g, sum_udaf(x) AS s FROM t GROUP BY g ORDER BY SUM(x)", used
    )
    assert ok is not None and "ORDER BY __b0" in ok
    # UDAF calls in the tail memoize onto the SELECT's partial state
    ok = r._rewrite_two_phase(
        "SELECT g, sum_udaf(x) AS s FROM t GROUP BY g HAVING sum_udaf(x) > 5",
        used,
    )
    assert ok is not None and ok.count("sum_udaf__pfold(") == 1
    assert "WHERE __u0 > 5" in ok
    # unknown (potentially aggregate) calls in the tail must fall back
    assert (
        r._rewrite_two_phase(
            "SELECT g, sum_udaf(x) AS s FROM t GROUP BY g "
            "HAVING percentile_approx(x, 0.5) > 1",
            used,
        )
        is None
    )


def test_two_phase_rewrite_rejects_distinct_args(spark):
    """agg(DISTINCT x) cannot be split into partials (per-partition
    DISTINCT misses cross-partition dupes) — must fall back."""
    from arrow_udf_spark.plans.registry import GLOBAL

    GLOBAL._agg_sql_names.setdefault("sum_udaf", "sum_udaf")
    assert (
        GLOBAL._rewrite_two_phase(
            "SELECT g, sum_udaf(DISTINCT x) AS s FROM t GROUP BY g",
            {"sum_udaf"},
        )
        is None
    )


def test_two_phase_having_resolves_select_aliases(spark):
    """Spark lets HAVING reference a select alias (HAVING sum_qty > N);
    the rewritten WHERE runs over the U/B join BELOW the projection that
    creates the alias, so the rewriter must substitute the alias's
    expression."""
    from arrow_udf_spark.plans.registry import GLOBAL

    GLOBAL._agg_sql_names.setdefault("sum_udaf", "sum_udaf")
    ok = GLOBAL._rewrite_two_phase(
        "SELECT g, CAST(sum_udaf(x) AS BIGINT) AS sum_qty FROM t "
        "GROUP BY g HAVING sum_qty > 100",
        {"sum_udaf"},
    )
    assert ok is not None
    assert "WHERE (CAST(__u0 AS BIGINT)) > 100" in ok


def test_register_sql_strict_refuses_single_phase(spark):
    """VERDICT r6 ask #5: ``register_sql(strict=True)`` never registers
    the single-phase GROUPED_AGG surface — the bare aggregate name fails
    analysis instead of silently planning the whole-group-on-one-worker
    shape — while the __partial/__merge pair still works, and
    ``Registry.sql`` raises (with the DataFrame-path pointer) on shapes
    it cannot rewrite instead of falling back."""
    import warnings

    from arrow_udf_spark.operators.aggregate import udaf
    from arrow_udf_spark.plans.registry import Registry

    reg = Registry()

    @udaf(
        input_types=["bigint"], result_type="bigint", name="strict_sum",
        registry=reg,
    )
    class StrictSum:
        def create_state(self):
            return 0

        def accumulate(self, s, x):
            return s + (0 if x is None else int(x))

        def merge(self, a, b):
            return a + b

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        registered = set(reg.register_sql(spark, strict=True))
    # no single-phase registration -> no GROUPED_AGG scale warning
    assert not any(
        "without partial" in str(w.message) for w in caught
    ), [str(w.message) for w in caught]
    assert "strict_sum" not in registered
    assert {"strict_sum__partial", "strict_sum__merge"} <= registered
    # the pair is the only SQL surface: bare name fails analysis
    spark.range(10).selectExpr(
        "id AS x", "pmod(id, 3) AS g"
    ).createOrReplaceTempView("strict_t")
    with pytest.raises(Exception, match="(?i)unresolved|cannot resolve"):
        spark.sql("SELECT g, strict_sum(x) FROM strict_t GROUP BY g").collect()
    got = spark.sql(
        """
        SELECT strict_sum__merge(p) AS s FROM (
            SELECT strict_sum__partial(x) AS p FROM strict_t
            GROUP BY pmod(x, 4)
        )
        """
    ).collect()
    assert got[0]["s"] == 45
    # provable shapes still rewrite and run through the front door
    df = reg.sql(
        spark, "SELECT g, strict_sum(x) AS s FROM strict_t GROUP BY g"
    )
    assert sorted((r["g"], r["s"]) for r in df.collect()) == [
        (0, 18), (1, 12), (2, 15),
    ]
    # unprovable shapes raise in strict mode (no single-phase fallback)
    with pytest.raises(ValueError, match="strict SQL mode"):
        reg.sql(
            spark,
            "SELECT g, strict_sum(x) AS s FROM strict_t GROUP BY g "
            "HAVING s > (SELECT max(id) FROM range(1))",
        )


def test_two_phase_expression_group_keys(spark):
    """GROUP BY expressions (pmod, date_trunc, arithmetic over columns)
    now ride the salted two-phase rewrite: each key is aliased __g{i}
    through the U/B split and select items matching the key expression
    resolve to the alias.  Unknown functions in a key still fall back."""
    r = Registry()
    r._agg_sql_names.setdefault("sum_udaf", "sum_udaf")
    used = {"sum_udaf"}
    ok = r._rewrite_two_phase(
        "SELECT pmod(x, 7) AS b, sum_udaf(y) AS s, COUNT(*) AS c "
        "FROM t GROUP BY pmod(x, 7)",
        used,
    )
    assert ok is not None
    assert "pmod(x, 7) AS __g0" in ok
    assert "COUNT(*) AS __bp0" in ok and "__aus_b" not in ok  # B folded
    assert "__g0 AS b" in ok
    # quoted literal inside the key expression
    ok2 = r._rewrite_two_phase(
        "SELECT date_trunc('DAY', ts) AS d, sum_udaf(v) AS s "
        "FROM t GROUP BY date_trunc('DAY', ts)",
        used,
    )
    assert ok2 is not None and "__g0 AS d" in ok2
    # expression key without a select alias is unprovable
    assert r._rewrite_two_phase(
        "SELECT pmod(x, 7), sum_udaf(y) AS s FROM t GROUP BY pmod(x, 7)",
        used,
    ) is None
    # unknown function in the key -> fallback
    assert r._rewrite_two_phase(
        "SELECT hash(x) AS b, sum_udaf(y) AS s FROM t GROUP BY hash(x)",
        used,
    ) is None
    # subquery smuggled into a key -> fallback
    assert r._rewrite_two_phase(
        "SELECT cast((SELECT max(z) FROM u) AS INT) AS b, sum_udaf(y) AS s "
        "FROM t GROUP BY cast((SELECT max(z) FROM u) AS INT)",
        used,
    ) is None
    # plain-column keys keep their existing (un-aliased) rewrite shape
    ok3 = r._rewrite_two_phase(
        "SELECT g, sum_udaf(y) AS s FROM t GROUP BY g", used
    )
    assert ok3 is not None and "__g0" not in ok3


def test_pivot_expansion_rewrite():
    """r8: PIVOT with a UDAF head expands to the GROUP BY + CASE form
    (Spark's own ResolvePivot expansion for null-ignoring aggregates)
    and then rides the salted two-phase rewrite.  Native Spark refuses
    pandas UDAFs in PIVOT outright (UNSUPPORTED_FEATURE.
    PANDAS_UDAF_IN_PIVOT), so the front door is the ONLY way to run
    one — and it runs scale-safe."""
    r = Registry()
    r._agg_sql_names.setdefault("sum_udaf", "sum_udaf")
    used = {"sum_udaf"}
    q = (
        "SELECT * FROM (SELECT g, k, v FROM t) "
        "PIVOT (sum_udaf(v) FOR k IN ('a' AS ca, 'b' AS cb)) ORDER BY g"
    )
    ok = r._rewrite_two_phase(q, used)
    assert ok is not None
    assert "sum_udaf__pfold" in ok and "sum_udaf__mergevec" in ok
    assert "CASE WHEN k = 'a' THEN v END AS __pv0" in ok
    assert "AS ca" in ok and "AS cb" in ok
    # unaliased values name the column after the literal text
    ok2 = r._rewrite_two_phase(
        "SELECT * FROM (SELECT g, k, v FROM t) "
        "PIVOT (sum_udaf(v) FOR k IN ('a', 'b'))",
        used,
    )
    assert ok2 is not None and "AS a" in ok2 and "AS b" in ok2
    # numeric literal values get backticked output names
    ok3 = r._rewrite_two_phase(
        "SELECT * FROM (SELECT g, k, v FROM t) "
        "PIVOT (sum_udaf(v) FOR k IN (1, 2))",
        used,
    )
    assert ok3 is not None and "AS `1`" in ok3 and "AS `2`" in ok3


def test_pivot_refusal_shapes():
    """PIVOT shapes outside the provable grammar refuse (None) rather
    than mangle: non-star outer select, non-literal values, expression
    agg args, no remaining group keys, WHERE after the pivot."""
    r = Registry()
    r._agg_sql_names.setdefault("sum_udaf", "sum_udaf")
    used = {"sum_udaf"}
    bad = [
        # outer select not *
        "SELECT g FROM (SELECT g, k, v FROM t) "
        "PIVOT (sum_udaf(v) FOR k IN ('a'))",
        # non-literal pivot value
        "SELECT * FROM (SELECT g, k, v FROM t) "
        "PIVOT (sum_udaf(v) FOR k IN (upper('a') AS ca))",
        # expression agg arg
        "SELECT * FROM (SELECT g, k, v FROM t) "
        "PIVOT (sum_udaf(v + 1) FOR k IN ('a' AS ca))",
        # all columns consumed -> no group keys
        "SELECT * FROM (SELECT k, v FROM t) "
        "PIVOT (sum_udaf(v) FOR k IN ('a' AS ca))",
        # WHERE after the pivot clause
        "SELECT * FROM (SELECT g, k, v FROM t) "
        "PIVOT (sum_udaf(v) FOR k IN ('a' AS ca)) WHERE g > 1",
        # inner select with star: implicit keys undecidable
        "SELECT * FROM (SELECT * FROM t) "
        "PIVOT (sum_udaf(v) FOR k IN ('a' AS ca))",
    ]
    for q in bad:
        assert r._rewrite_two_phase(q, used) is None, q
    # PIVOT buried in a FROM subquery (no UDAF inside) must not trip the
    # top-level expansion: the k-in-subquery shape is not top level
    assert not r._has_top_level_kw(
        "x FROM (SELECT * FROM t PIVOT (SUM(v) FOR k IN ('a'))) GROUP BY x",
        "PIVOT",
    )


def test_pivot_matches_native_builtin(spark):
    """Referee: the expanded two-phase UDAF pivot must be row-identical
    to NATIVE Spark PIVOT with the built-in SUM (sum_udaf == SUM on
    bigint) — column names, order, and values."""
    from arrow_udf_spark import GLOBAL

    GLOBAL.register_sql(spark)
    df = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "a", 5), (2, "c", 7), (1, "a", 3)],
        ["g", "k", "v"],
    )
    df.createOrReplaceTempView("pvt_ref")
    tpl = (
        "SELECT * FROM (SELECT g, k, CAST(v AS BIGINT) AS v FROM pvt_ref) "
        "PIVOT ({AGG}(v) FOR k IN ('a' AS ka, 'b' AS kb, 'z' AS kz)) "
        "ORDER BY g"
    )
    ours = GLOBAL.sql(spark, tpl.format(AGG="sum_udaf"))
    native = spark.sql(tpl.format(AGG="SUM"))
    assert ours.columns == native.columns
    # the 'z' slice is empty for every group: ANSI SUM yields NULL there,
    # sum_udaf yields 0 by the reference's contract (create_state()=0,
    # python.rs:670-745) — normalize that one documented difference
    assert [tuple(r) for r in ours.collect()] == [
        tuple(0 if v is None else v for v in r) for r in native.collect()
    ]
    # and the plan really is two-phase: merge stage present, and phase 1
    # is either the map-side MapInArrow fold (r11 preferred shape) or the
    # collect_list -> __pfold SQL pipeline (fallback)
    plan = ours._jdf.queryExecution().executedPlan().toString()
    assert "sum_udaf__mergevec" in plan
    assert "MapInArrow" in plan or "sum_udaf__pfold" in plan
