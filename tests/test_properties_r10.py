"""Round-10 property referees: the batched BPE trainer
(operators/text.py::bpe_batch_train_encode) against pure-Python
formulations — batch=1 must reduce EXACTLY to the sequential trainer,
and the general batched path must match an independent list-of-symbols
replay of the pool/greedy/commuting-merge contract."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_properties_r9 import _referee_bpe


def _render(pair) -> str:
    return f"·{pair[0]}··{pair[1]}·"


def _merge_word(syms, pair):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _referee_bpe_batch(texts, n_rounds, batch):
    """Independent replay of the batched contract: per round, a
    top-4·batch candidate pool by (count DESC, marker-rendered pair
    ASC), a greedy walk skipping symbol-sharing pairs, then the whole
    batch applied by commuting list merges."""
    words = Counter()
    per_doc_words = []
    for t in texts:
        ws = [w for w in t.split() if w]
        per_doc_words.append(ws)
        words.update(ws)
    vocab = {w: [c for c in w] for w in words}
    merges = []
    for _ in range(n_rounds):
        pairs = Counter()
        for w, syms in vocab.items():
            f = words[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        pool = sorted(
            pairs.items(), key=lambda kv: (-kv[1], _render(kv[0]))
        )[: 4 * batch]
        selected, used = [], set()
        for pair, _cnt in pool:
            if len(selected) >= batch:
                break
            if pair[0] in used or pair[1] in used:
                continue
            selected.append(pair)
            used.update(pair)
        if not selected:
            break
        for w in vocab:
            for pair in selected:
                vocab[w] = _merge_word(vocab[w], pair)
        merges.extend(selected)
    counts = [
        (sum(len(vocab[w]) for w in ws), len(ws)) for ws in per_doc_words
    ]
    return counts, merges


_CORPORA = st.lists(
    st.text(alphabet="abcd ", min_size=0, max_size=40),
    min_size=1,
    max_size=6,
)


@settings(max_examples=40, deadline=None)
@given(_CORPORA, st.integers(1, 6))
def test_batch_one_reduces_to_sequential_python(texts, n_rounds):
    # the pure-Python formulations first: batch=1 IS sequential BPE
    got_counts, got_merges = _referee_bpe_batch(texts, n_rounds, 1)
    ref_counts, ref_merges = _referee_bpe(texts, n_rounds)
    assert got_merges == ref_merges
    assert got_counts == ref_counts


@settings(max_examples=4, deadline=None)
@given(_CORPORA, st.integers(1, 3), st.integers(1, 4))
def test_spark_batched_matches_python_referee(spark, texts, n_rounds, batch):
    from arrow_udf_spark.operators.text import bpe_batch_train_encode

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out, merges = bpe_batch_train_encode(df, n_rounds=n_rounds, batch=batch)
    got = {r.id: (r.n_tokens, r.n_words) for r in out.collect()}
    out.bpe_model_cache.unpersist()
    ref_counts, ref_merges = _referee_bpe_batch(texts, n_rounds, batch)
    assert merges == [_render(p) for p in ref_merges]
    exp = {
        i: rc
        for i, rc in enumerate(ref_counts)
        if rc[1] > 0  # all-whitespace docs produce no joinable words
    }
    assert got == exp


def test_spark_batch_one_equals_sequential_trainer(spark):
    from arrow_udf_spark.operators.text import (
        bpe_batch_train_encode,
        bpe_train_encode,
    )

    df = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest wide")],
        "doc_id long, text string",
    )
    out_b, m_b = bpe_batch_train_encode(df, n_rounds=5, batch=1)
    out_s, m_s = bpe_train_encode(df, n_merges=5)
    assert m_b == m_s
    rb = sorted((r.id, r.n_tokens, r.n_words) for r in out_b.collect())
    rs = sorted((r.id, r.n_tokens, r.n_words) for r in out_s.collect())
    assert rb == rs
    out_b.bpe_model_cache.unpersist()
    out_s.bpe_model_cache.unpersist()


# -- unigram-LM trainer vs a pure-Python referee -----------------------------


def _referee_unigram(texts, n_rounds=2, max_len=16, max_piece=4, vocab_size=512):
    """Independent dict/list replay of unigram_lm_fit's contract."""
    words = Counter()
    per_doc = []
    for t in texts:
        ws = [w.replace("·", "") for w in t.split()]
        ws = [w for w in ws if w]
        per_doc.append(ws)
        words.update(ws)
    train = {w: f for w, f in words.items() if len(w) <= max_len}
    sub = Counter()
    for w, f in train.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece, len(w) - i) + 1):
                sub[w[i : i + l]] += f
    top = sorted(sub.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    vocab = dict(top)
    for p, c in sub.items():
        if len(p) == 1:
            vocab[p] = c
    total = sum(vocab.values())
    probs = {p: c / float(total) for p, c in vocab.items()}

    def viterbi(w):
        n = len(w)
        dp = [0.0] * (n + 1)
        dp[0] = 1.0
        back = [0] * (n + 1)
        for j in range(1, n + 1):
            best, bl = -1.0, 0
            for l in range(min(max_piece, j), 0, -1):
                p = probs.get(w[j - l : j])
                if p is None:
                    continue
                sc = dp[j - l] * p
                if sc > best:
                    best, bl = sc, l
            dp[j] = best
            back[j] = bl
        out, j = [], n
        while j > 0:
            out.append(w[j - back[j] : j])
            j -= back[j]
        return out[::-1]

    for _ in range(n_rounds):
        counted = Counter()
        for w, f in train.items():
            for piece in viterbi(w):
                counted[piece] += f
        new_vocab = {}
        for piece in vocab:
            c = counted.get(piece, 0)
            if len(piece) == 1:
                c = max(c, 1)
            if c > 0:
                new_vocab[piece] = c
        vocab = new_vocab
        total = sum(vocab.values())
        probs = {p: c / float(total) for p, c in vocab.items()}

    np_of = {
        w: (len(w) if len(w) > max_len else len(viterbi(w))) for w in words
    }
    return [
        (sum(np_of[w] for w in ws), len(ws)) for ws in per_doc
    ]


@settings(max_examples=4, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcde ", min_size=0, max_size=60),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 3),
)
def test_spark_unigram_matches_python_referee(spark, texts, n_rounds):
    from arrow_udf_spark.operators.text import unigram_lm_fit

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out, probs = unigram_lm_fit(df, n_rounds=n_rounds, vocab_size=64)
    got = {r.id: (r.n_pieces, r.n_words) for r in out.collect()}
    out.unigram_model_cache.unpersist()
    ref = _referee_unigram(texts, n_rounds=n_rounds, vocab_size=64)
    exp = {i: rc for i, rc in enumerate(ref) if rc[1] > 0}
    assert got == exp


def test_unigram_long_word_char_fallback(spark):
    from arrow_udf_spark.operators.text import unigram_lm_fit

    long_word = "x" * 40  # > max_len: counts as 40 char pieces
    df = spark.createDataFrame(
        [(1, f"ab {long_word} ab")], "doc_id long, text string"
    )
    out, _ = unigram_lm_fit(df, n_rounds=1)
    r = out.collect()[0]
    out.unigram_model_cache.unpersist()
    assert r.n_words == 3
    assert r.n_pieces == 40 + 2  # 'ab' is a vocab piece (1) x2... or 2x1
