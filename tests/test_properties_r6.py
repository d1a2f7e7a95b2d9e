"""Property tests for the round-6 registry tail rewrite: for
hypothesis-generated data and HAVING/ORDER-BY tails, the salted
two-phase U/B rewrite must return exactly the rows plain single-phase
SQL returns (computed by a Python referee — not by Spark — so an
analyzer quirk can't mask a rewrite bug)."""

from __future__ import annotations

from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # group g
        st.integers(min_value=-5, max_value=9),  # value x
    ),
    min_size=1,
    max_size=30,
)


def _referee(rows, having_min_count, having_min_sum):
    agg = defaultdict(lambda: [0, 0])
    for g, x in rows:
        agg[g][0] += x
        agg[g][1] += 1
    return sorted(
        (g, s, c)
        for g, (s, c) in agg.items()
        if c > having_min_count and s > having_min_sum
    )


docs_strategy = st.lists(
    st.text(
        alphabet=st.sampled_from("ab cdef the and of to"),
        min_size=0,
        max_size=40,
    ),
    min_size=2,
    max_size=12,
)


@settings(max_examples=6, deadline=None)
@given(texts=docs_strategy)
def test_simhash_hamming_pairs_matches_bruteforce(spark, texts):
    """Pigeonhole banding must find EVERY pair within max_dist — compare
    against an all-pairs referee that recomputes the simhash through the
    same Spark column (so the property under test is the banding's
    completeness, not the hash function)."""
    from itertools import combinations

    from arrow_udf_spark.operators.dedup import (
        simhash_hamming_pairs,
        with_simhash,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    sh = {
        r["doc_id"]: r["sh"]
        for r in with_simhash(df, "text", out="sh").collect()
    }
    expected = sorted(
        (a, b, bin(sh[a] ^ sh[b]).count("1"))
        for a, b in combinations(sorted(sh), 2)
        if bin(sh[a] ^ sh[b]).count("1") <= 3
    )
    got = sorted(
        (r["a"], r["b"], r["dist"])
        for r in simhash_hamming_pairs(df).collect()
    )
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    rows=rows_strategy,
    min_count=st.integers(min_value=0, max_value=3),
    min_sum=st.integers(min_value=-20, max_value=20),
)
def test_having_tail_two_phase_matches_referee(
    spark, rows, min_count, min_sum
):
    import warnings

    import arrow_udf_spark.functions.corpus  # noqa: F401 — registers fns
    from arrow_udf_spark.plans.registry import GLOBAL

    df = spark.createDataFrame(rows, "g: long, x: long").repartition(4)
    df.createOrReplaceTempView("prop_tail")
    GLOBAL.register_sql(spark)
    q = f"""
        SELECT g, CAST(sum_udaf(x) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM prop_tail GROUP BY g
        HAVING COUNT(*) > {min_count} AND sum_udaf(x) > {min_sum}
        ORDER BY g
    """
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        got = sorted(tuple(r) for r in GLOBAL.sql(spark, q).collect())
        assert not any(
            "single-phase" in str(w.message) for w in rec
        ), "tail shape unexpectedly fell back to single-phase"
    assert got == _referee(rows, min_count, min_sum)


cms_docs_strategy = st.lists(
    st.lists(
        st.sampled_from(["tok%d" % i for i in range(30)] + ["the", "data"]),
        min_size=0,
        max_size=30,
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=6, deadline=None)
@given(docs=cms_docs_strategy)
def test_count_min_matches_referee(spark, docs):
    """The Spark CMS must agree cell-for-cell with a pure-Python referee
    that re-derives the md5 cells — and its point estimates must never
    underestimate the true counts."""
    import hashlib
    from collections import Counter

    from arrow_udf_spark.operators.sketch import count_min_estimate

    texts = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(texts, "doc_id: long, text: string")
    probe = ["tok0", "tok1", "the", "data", "absent_tok"]
    got = {
        r["token"]: (r["true_cnt"], r["cms_est"])
        for r in count_min_estimate(df, probe, d=4, w=64).collect()
    }

    stream = [t for toks in docs for t in toks]
    true = Counter(stream)
    cells = Counter()
    for t in stream:
        for r in range(4):
            h = int(hashlib.md5(f"{r}:{t}".encode()).hexdigest()[:8], 16)
            cells[(r, h % 64)] += 1
    for t in probe:
        est = min(
            cells.get(
                (r, int(hashlib.md5(f"{r}:{t}".encode()).hexdigest()[:8], 16) % 64),
                0,
            )
            for r in range(4)
        )
        assert got[t] == (true.get(t, 0), est), (t, got[t], (true.get(t, 0), est))
        assert est >= true.get(t, 0)


transitions_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user
        st.sampled_from(["a", "b", "c"]),  # type
        st.integers(min_value=0, max_value=50),  # ts (collisions likely)
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=8, deadline=None)
@given(rows=transitions_strategy)
def test_event_transitions_matches_referee(spark, rows):
    """Per-user streams ordered by (ts, event_id) — the id tie-break must
    make transition counts deterministic under timestamp collisions."""
    from collections import Counter, defaultdict
    from datetime import datetime, timezone

    from arrow_udf_spark.operators.temporal import event_transitions

    data = [
        (i, datetime.fromtimestamp(ts, tz=timezone.utc).replace(tzinfo=None), u, ty)
        for i, (u, ty, ts) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data, "event_id: long, ts: timestamp, user_id: long, event_type: string"
    )
    by_user = defaultdict(list)
    for eid, ts, u, ty in data:
        by_user[u].append((ts, eid, ty))
    ref = Counter()
    for evs in by_user.values():
        evs.sort()
        for (_, _, p), (_, _, n) in zip(evs, evs[1:]):
            ref[(p, n)] += 1
    got = Counter(
        {(r["prev_type"], r["next_type"]): r["n"]
         for r in event_transitions(df).collect()}
    )
    assert got == ref


graph_strategy = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)),
    min_size=0,
    max_size=20,
)


@settings(max_examples=6, deadline=None)
@given(raw=graph_strategy)
def test_pagerank_matches_integer_referee(spark, raw):
    """The int64 fixed-point trajectory must be reproducible by a plain
    Python referee doing the same DIV arithmetic — no float drift, no
    shuffle-order dependence."""
    from collections import defaultdict

    from arrow_udf_spark.operators.graph import pagerank

    edges = sorted({(a, b) for a, b in raw if a != b})
    nodes = sorted({n for e in edges for n in e} | {0, 1})
    ndf = spark.createDataFrame([(n,) for n in nodes], "node: long")
    edf = spark.createDataFrame(
        edges or [(0, 1)], "src: long, dst: long"
    ).limit(len(edges))  # empty-edges case: limit(0)
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edf, ndf, iters=3).collect()
    }

    deg = defaultdict(int)
    for a, _ in edges:
        deg[a] += 1
    rank = {n: 1_000_000_000 for n in nodes}
    base = 15 * 1_000_000_000 // 100
    for _ in range(3):
        inc = defaultdict(int)
        for a, b in edges:
            inc[b] += rank[a] // deg[a]
        rank = {n: base + (85 * inc.get(n, 0)) // 100 for n in nodes}
    assert got == rank


@settings(max_examples=6, deadline=None)
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["sA", "sB"]),
            st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=0, max_size=12),
        ),
        min_size=1,
        max_size=10,
    )
)
def test_corpus_divergence_matches_referee(spark, docs):
    """Exact-integer TV numerators vs a Counter-based referee."""
    from collections import Counter

    from arrow_udf_spark.operators.text import source_token_tv

    rows = [(s, " ".join(toks)) for s, toks in docs]
    df = spark.createDataFrame(rows, "source: string, text: string")
    out = source_token_tv(df, ["sA", "sB"]).collect()
    assert len(out) == 1
    r = out[0]

    ca = Counter(t for s, toks in docs if s == "sA" for t in toks)
    cb = Counter(t for s, toks in docs if s == "sB" for t in toks)
    na, nb = sum(ca.values()), sum(cb.values())
    tv = sum(
        abs(ca.get(t, 0) * nb - cb.get(t, 0) * na)
        for t in set(ca) | set(cb)
    )
    assert (r["src_a"], r["src_b"]) == ("sA", "sB")
    assert (r["tv_num"], r["n_a"], r["n_b"]) == (tv, na, nb)
