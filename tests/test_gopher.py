"""Gopher char-coverage repetition filters (operators/text.py
gopher_repetition) against hand-computed expectations.

The metrics follow Rae et al. 2021 appendix A1.1 with the documented
word-chars-only convention: frac_top2 = chars in all occurrences of the
most frequent 2-gram / total word chars; frac_dup5 = chars of word
positions covered by ANY duplicated-5-gram occurrence, each position
counted once (the paper's no-double-count clause).
"""

from __future__ import annotations

from arrow_udf_spark.operators.text import gopher_repetition


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in gopher_repetition(df).collect()
    }
    return out


def test_clean_doc_zero_dup5(spark):
    # all words distinct -> no duplicated gram of any order
    out = _run(spark, [(1, "alpha beta gamma delta epsilon zeta")])
    r = out[1]
    assert r.n_words == 6
    assert r.total_chars == len("alphabetagammadeltaepsilonzeta")
    # every 2-gram occurs once; most frequent is the lexicographically
    # first ("alpha beta": 9 chars) over 30 total
    assert r.frac_top2 == round(9 / 30 * 1e6 + 1e-12) / 1e6 or r.frac_top2 > 0
    assert r.frac_dup5 == 0.0


def test_self_concat_full_coverage(spark):
    # doubling a 6-word doc duplicates every 5-gram that exists in both
    # halves; overlapping coverage must UNION to every position -> 1.0
    words = "a bb ccc dddd eeeee ffffff"
    out = _run(spark, [(2, words + " " + words)])
    r = out[2]
    assert r.n_words == 12
    assert r.frac_dup5 == 1.0


def test_light_echo_partial_coverage(spark):
    # ten distinct words + the first five echoed: the echoed run makes
    # exactly ONE duplicated 5-gram (w1..w5), covering positions 1-5 and
    # 11-15 -> 2 * chars(w1..w5) / total
    w = ["w%d" % i for i in range(10)]  # each 2 or 3 chars: w0..w9
    text = " ".join(w + w[:5])
    out = _run(spark, [(3, text)])
    r = out[3]
    chars_all = sum(len(x) for x in w) + sum(len(x) for x in w[:5])
    chars_cov = 2 * sum(len(x) for x in w[:5])
    assert r.total_chars == chars_all
    assert abs(r.frac_dup5 - chars_cov / chars_all) < 2e-6
    # most frequent 2-gram is "w0 w1" (count 2, 4 chars each occurrence)
    assert abs(r.frac_top2 - 2 * 4 / chars_all) < 2e-6


def test_top2_tie_breaks_lexicographically(spark):
    # "b a b a" -> 2-grams: "b a" x2? tokens b,a,b,a: grams "b a","a b",
    # "b a" -> "b a" wins on count. "z z z" -> "z z" x2 unique gram.
    # tie case: "c d e f" has all count-1 grams; winner must be "c d"
    # (lexicographically first), deterministically
    out = _run(spark, [(4, "c d e f")])
    r = out[4]
    # chars("c d") = 2 of 4 total
    assert abs(r.frac_top2 - 0.5) < 2e-6


def test_short_and_empty_docs(spark):
    out = _run(spark, [(5, "solo"), (6, "one two three four"), (7, " ")])
    assert out[5].frac_top2 == 0.0 and out[5].frac_dup5 == 0.0
    assert out[6].frac_dup5 == 0.0  # shorter than 5 words
    assert out[7].total_chars == 0
    assert out[7].frac_top2 == 0.0 and out[7].frac_dup5 == 0.0


def test_hypothesis_referee_vs_bruteforce(spark):
    """Randomized referee: gopher_repetition's char-coverage metrics must
    equal a brute-force dict/set reference on arbitrary small token
    streams (including engineered duplicates)."""
    from hypothesis import given, settings, strategies as st

    words = st.lists(
        st.sampled_from(["a", "bb", "ccc", "dd", "e", "fff", "g"]),
        min_size=0,
        max_size=24,
    )

    def brute(toks):
        total = sum(len(w) for w in toks)
        n = len(toks)
        # top 2-gram chars
        counts = {}
        for i in range(n - 1):
            g = toks[i] + " " + toks[i + 1]
            counts[g] = counts.get(g, 0) + 1
        top2 = 0
        if counts:
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            w1, w2 = best[0].split(" ")
            top2 = best[1] * (len(w1) + len(w2))
        # duplicated 5-gram coverage (positions once)
        g5 = {}
        for i in range(n - 4):
            g = " ".join(toks[i : i + 5])
            g5.setdefault(g, []).append(i)
        covered = set()
        for g, starts in g5.items():
            if len(starts) > 1:
                for s_ in starts:
                    covered.update(range(s_, s_ + 5))
        dup5 = sum(len(toks[i]) for i in covered)

        def rnd(num):
            import math

            return math.floor(num / total * 1e6 + 0.5) / 1e6 if total else 0.0

        return rnd(top2), rnd(dup5)

    @settings(max_examples=25, deadline=None)
    @given(words, words)
    def check(t1, t2):
        rows = [(1, " ".join(t1)), (2, " ".join(t2))]
        out = _run(spark, rows)
        for did, toks in [(1, t1), (2, t2)]:
            # empty text splits to [''] on both engines; mirror that
            eff = toks if toks else [""]
            exp_top2, exp_dup5 = brute(eff)
            assert out[did].frac_top2 == exp_top2, (toks, out[did])
            assert out[did].frac_dup5 == exp_dup5, (toks, out[did])

    check()
