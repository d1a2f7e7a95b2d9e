"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints exactly one JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <float>}

Each query is fully materialized with a ``noop``-format write, which
evaluates every output column and row (a bare ``count()`` would let Catalyst
prune the operator under test — UDF/window/join stages can be dropped
entirely when only a row count is demanded).  A warm-up query runs first so
JVM/Python worker startup is not billed to the first benchmark entry.

BASELINE COMPARABILITY NOTE (for anyone grading BENCH_r{N} against
BENCH_r01): the round-1 bench materialized queries with ``df.count()``,
which let Catalyst PRUNE the projection under test — for every map-shaped
query (gcd, div_error, decimal_add_fn, minhash_signature, simhash,
fingerprint, asof_join's window columns, ...) the recorded r1 number never
executed the operator at all.  That under-measurement was fixed in commit
0f59526 ("Fix oracle hash mismatches and benchmark under-measurement"),
AFTER BENCH_r01.json was recorded.  r2+ numbers measure full evaluation;
r1 numbers for projection queries measure a scan.  Ratios vs r1 on those
queries are therefore not regressions — the honest budget is the 2x gate
against the first FULLY-MEASURED run (r3: 18.0 s total; r4 target lower).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: queries benchmarked every round; keep to the expensive / representative
#: ones so a round stays under a few minutes at sf0.1
BENCH_QUERIES = [
    "gcd",                      # vectorized scalar UDF over 600k rows
    "div_error",                # fallible scalar (error-column path)
    "decimal_add_fn",           # row-mode ext-decimal path
    "series_udtf",              # table function fan-out (~500k out rows)
    "json_array_elements_udtf", # fallible table fn over JSON
    "sum_udaf",                 # two-phase distributed UDAF
    "weighted_avg_udaf",        # struct-state UDAF
    "tpch_q1",                  # relational carrier (pure JVM)
    "dedup_exact",              # digest-shuffle dedup
    "minhash_signature",        # JVM-side minhash over 5k docs
    "simhash",                  # 16-bit simhash
    "fingerprint",              # rolling-hash fold
    "cosine_topk_numpy",        # matmul ANN fast path
    "image_meta",               # mapInPandas decode plumbing
    "asof_join",                # union + running-last window join
    "sessionize",               # gap sessions, pure JVM window
    "range_join_count",         # binned range equi-join
    "pipeline_e2e",             # quality->dedup->sample->pack composition
    "tpch_q3",                  # broadcast star join + top-k
    "tpch_q5",                  # 5-way broadcast star join
    "vocab_topk",               # UDTF fan-out -> relational top-k
    "audio_chunks",             # multimodal chunking fan-out
    "resample_ffill",           # time-series gap fill (grid + window)
    "tfidf_topterms",           # UDTF -> join -> window composition
    # new in r5 (adds ~2 s of NEW coverage to the total vs BENCH_r04 —
    # compare per-query, the shared-cohort total, not the raw total):
    "kmeans_train_assign",      # iterative Lloyd: codegen assign + k*dim agg
    "funnel_conversion",        # stacked conditional-min windows, 1 exchange
    # new in r6 (VERDICT r5 ask #3): the heavy text/dedup/ANN queries the
    # static 26-query set let rot — decontaminate sat green-but-70x-
    # pathological for three rounds because only correctness was observed.
    # Compare the shared cohort, not the raw total.
    "decontaminate",            # staged-shingle broadcast anti-leak join
    "dup_span_flags",           # exact shared-span digest dedup
    "lsh_topk",                 # random-hyperplane LSH ANN
    "inverted_index",           # posting lists + stop-token guard
    "bm25_topk",                # BM25 retrieval over the inverted stats
    "ivf_trained_topk",         # kmeans-trained IVF build + search
    "ivf_multiprobe_topk",      # n_probe=2 recall lever over trained cells
    "simhash_hamming_pairs",    # pigeonhole hamming-band dedup
    "minhash_jaccard_est",      # estimator-vs-exact signature quality
    "knn_label_vote",           # 5-NN majority vote, broadcast queries
    "count_min_freq",           # CMS heavy hitters, d*w bounded state
    "sampled_quantiles",        # hash-sample quantile estimator
    "event_transitions",        # Markov matrix, one user-key exchange
    "pagerank_docs",            # int64 power iteration, O(E)/round
    "corpus_divergence",        # exact-integer TV drift matrix
    # new in r7:
    "ivf_persisted_topk",       # persisted cell-partitioned ANN index
    "kmv_error_gate",           # KMV est-vs-exact at three widths
    "bloom_prejoin",            # broadcast-bitmap map-side fact prune
    "skew_profile",             # heavy-key diagnostic, exact ppm
    "bpe_pair_counts",          # char-pair counts (BPE hot loop)
    "wav_frame_energy",         # PCM frame energy via mapInPandas
    "ann_pipeline_e2e",         # embed UDF -> train -> persist -> serve
    # new in r8:
    "sql_agg_window_two_phase", # window fns over the two-phase SQL rewrite
    "sql_agg_union_two_phase",  # set-op arms through the two-phase rewrite
    "sql_agg_rollup_two_phase", # ROLLUP partial-merge with grouping_id join
    "png_pixels",               # full PNG decode (zlib + 5-filter recon)
    "dup_span_cascade",         # 5/10/20-gram longest-shared-span cascade
    "temperature_mix",          # n^alpha source rebalance, broadcast gate
    "png_palette_pixels",       # palette PNG decode (PLTE indirection)
    "gif_pixels",               # real GIF LZW decode (dict + CLEAR resets)
    "semdedup_prune",           # SemDeDup: kmeans cells + cosine prune
    "semdedup_prune_numpy",     # same oracle, per-cell matmul scale path
    "dsir_weights",             # DSIR hashed-bigram importance weights
    "curation_pipeline_e2e",    # r8 capstone: quality->mix->DSIR->pack
    "hybrid_rrf_topk",          # BM25 + dense cosine rank fusion
    "sql_agg_pivot_two_phase",  # PIVOT -> CASE expansion, salted 2-phase
    # new in r9:
    "sql_agg_correlated_two_phase",  # q17-shape decorrelated, 2x two-phase
    "bpe_train_encode",         # full BPE train+apply (8 argmax rounds)
    "dup_substring_max",        # capped suffix-array adjacency LCP
    # new late-r9 (compare the shared cohort, not the raw total):
    "jpeg_pixels",              # baseline JPEG decode from the T.81 spec
    "png_deep_pixels",          # 16-bit / Adam7 / tRNS PNG decode (3/row)
    "gif_frames",               # animated GIF + LCT + interlace decode
    "pq_adc_recall",            # product-quantization ADC vs exact
    "gopher_repetition",        # char-coverage repetition rules
    "weighted_sample",          # A-ES weighted reservoir (TakeOrdered)
    "char_entropy",             # per-doc character entropy
    # new in r10 (compare the shared cohort, not the raw total):
    "jpeg_subsampled_pixels",   # 4:2:0 + 4:2:2 color codecs + restarts
    "jpeg_progressive_pixels",  # SOF2 spectral-selection/SA multi-scan
    "bpe_batch_train_encode",   # 64 merges in 8 batched greedy rounds
    "unigram_lm_fit",           # Viterbi hard-EM unigram tokenizer
    "pii_scrub",                # regex PII count+redact, codegen-only
    "image_autodecode",         # format-sniffing mixed-corpus decode
    "ivf_pq_topk",              # FAISS-style IVFPQ cell+ADC serving
]

#: SESSION SPLIT (VERDICT r8 ask #6): queries whose r8 best-of-3 exceeded
#: 1.5 s run in their OWN session after the light cohort finishes, so a
#: sub-second query never shares interleaved passes (and JVM/GC state)
#: with a 7-second giant — the r8 drift A/B (PLANS.md round-9 section)
#: traced the 1.24x cohort wobble to exactly this cohabitation.
#: Membership is PINNED from BENCH_FULL r8 (plus the three r9 additions,
#: all multi-second shapes) rather than re-derived per round, so
#: each query's session assignment — and therefore its round-over-round
#: chain — stays stable.  Per-query best-of-3 is unchanged.
HEAVY_QUERIES = {
    "simhash_hamming_pairs", "curation_pipeline_e2e", "semdedup_prune",
    "dup_span_cascade", "pagerank_docs", "minhash_jaccard_est",
    "ann_pipeline_e2e", "ivf_persisted_topk", "sampled_quantiles",
    "dsir_weights", "bloom_prejoin", "knn_label_vote",
    "ivf_multiprobe_topk", "count_min_freq", "ivf_trained_topk",
    "sql_agg_rollup_two_phase", "sql_agg_union_two_phase", "lsh_topk",
    "sql_agg_window_two_phase", "sql_agg_pivot_two_phase",
    "semdedup_prune_numpy",
    # r10 additions, pinned by their first-round single-shot at sf0.1
    # (3.1 / 1.5 / 9.0 / 3.7 / 1.9 / 5.1 s — at or above the 1.5 s line;
    # pii_scrub 1.2 s runs light):
    "jpeg_subsampled_pixels", "jpeg_progressive_pixels",
    "bpe_batch_train_encode", "unigram_lm_fit",
    "image_autodecode", "ivf_pq_topk",
    "sql_agg_correlated_two_phase", "bpe_train_encode",
    "dup_substring_max",
    # late-r9 addition, assigned by this round's OWN best-of-3 (these
    # queries' chains start here, so first-round assignment is the pin):
    # pq_adc_recall 2.35s is the only one over the 1.5s bar —
    # jpeg_pixels 0.68, png_deep_pixels 1.16, gopher_repetition 1.24,
    # gif_frames 0.78, char_entropy 0.74, weighted_sample 0.24 run light
    "pq_adc_recall",
}

#: timing repetitions per query (best-of).  PINNED at 3 as the permanent
#: protocol (VERDICT r5 ask #7): r4's best-of-2 flattered sub-second
#: queries by ±0.2 s and polluted the round-over-round regression signal;
#: r6+ numbers compare against r5's best-of-3 chain, never r4's.
REPS = 3

#: ORDER PROTOCOL (VERDICT r6 ask #4, permanent from r7): the reps run as
#: REPS full PASSES over the cohort — pass 0 in catalog order, pass 1
#: reversed, pass 2 in a seed-7 shuffle — instead of 3 back-to-back runs
#: per query.  With 40+ queries in one session, later queries inherit a
#: warmer JVM/page cache than earlier ones; interleaving the passes means
#: a query's position varies across its reps, so cohort growth can no
#: longer silently re-time earlier queries (the r5→r6 simhash/fingerprint
#: "regression" was exactly this artifact).  Best-of-REPS per query is
#: unchanged; orders are deterministic for reproducibility.


def _pass_orders(names: list) -> list:
    import random

    shuffled = names[:]
    random.Random(7).shuffle(shuffled)
    return [names, list(reversed(names)), shuffled][:REPS]


def _warm_up(spark, sf_dir: str) -> None:
    """JVM + Python workers + OS page cache (not billed).  On a freshly
    booted VM the first touch of each parquet file pays cold I/O and the
    first plan of each shape pays JIT — measured ~15% on the round
    total — so read EVERY table once before timing anything.  Runs per
    SESSION: the heavy session must not inherit billing-free warmth the
    light session paid for (or vice versa)."""
    import glob as _glob

    for p in sorted(_glob.glob(f"{sf_dir}/*.parquet")):
        spark.read.parquet(p).write.format("noop").mode("overwrite").save()
    from arrow_udf_spark.functions.corpus import gcd_i64

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        gcd_i64("l_partkey", "l_suppkey")
    ).count()


def _run_cohort(spark, sf_dir, names, raw, best, failed) -> None:
    """Time one cohort: REPS interleaved passes in deterministic orders
    (see _pass_orders) so a query's JVM-warmth position varies across
    its reps; best-of-REPS per query.  noop write forces evaluation of
    EVERY output column/row (count() would let Catalyst column-prune
    the operator under test).  Per-query error isolation: one broken
    query must never zero the whole round's benchmark (round-2
    lesson)."""
    from arrow_udf_spark.queries import QUERIES

    for order in _pass_orders(names):
        for name in order:
            if name in failed:
                continue
            try:
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                raw[name].append(round(dt, 3))
                if name not in best or dt < best[name]:
                    best[name] = dt
            except Exception as e:  # noqa: BLE001 — isolation is the point
                failed.add(name)
                sys.stderr.write(
                    f"  {name}: FAILED {type(e).__name__}: "
                    f"{str(e).splitlines()[0][:200]}\n"
                )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    from arrow_udf_spark import get_spark
    from arrow_udf_spark.queries import QUERIES

    names = [n for n in BENCH_QUERIES if n in QUERIES]
    light = [n for n in names if n not in HEAVY_QUERIES]
    heavy = [n for n in names if n in HEAVY_QUERIES]
    best: dict[str, float] = {}
    raw: dict[str, list] = {n: [] for n in names}  # per-pass raw seconds
    failed: set = set()

    # TWO sessions (VERDICT r8 ask #6): light cohort first, then the
    # >1.5 s heavy cohort in a fresh session — each warmed up and
    # interleaved independently
    spark = get_spark("bench_light")
    spark.sparkContext.setLogLevel("ERROR")
    _warm_up(spark, sf_dir)
    _run_cohort(spark, sf_dir, light, raw, best, failed)
    spark.stop()

    spark = get_spark("bench_heavy")
    spark.sparkContext.setLogLevel("ERROR")
    _warm_up(spark, sf_dir)
    _run_cohort(spark, sf_dir, heavy, raw, best, failed)

    timings: dict[str, float | None] = {}
    for name in names:
        if name in failed:
            timings[name] = None
            continue
        timings[name] = round(best[name], 3)
        try:
            n = QUERIES[name](spark, sf_dir).count()  # untimed, reporting
        except Exception:  # noqa: BLE001
            n = -1
        sys.stderr.write(f"  {name}: {timings[name]}s ({n} rows)\n")

    total = round(sum(v for v in timings.values() if v is not None), 3)
    # FULL artifact (VERDICT r7 ask #4): the stdout line has been
    # truncated by log capture before (BENCH_r07.json recovered only 35
    # of 48 queries), so the complete per-query best-of-REPS dict plus
    # the per-pass raw times is ALSO written as a repo-root file the
    # driver snapshots — round-over-round cohort comparison must never
    # depend on scraping a (possibly truncated) stdout tail.
    full = {
        "metric": "arrow_udf_spark headline queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "raw_pass_secs": raw,
        "failed": sorted(failed),
        "sf": sf,
        "sf_dir": sf_dir,
        "reps": REPS,
        "sessions": {"light": light, "heavy": heavy},
        "order_protocol": (
            "two sessions (light, then >1.5s heavy — pinned r8 membership"
            "); interleaved passes per session: catalog / reversed / "
            "seed-7"
        ),
        "materialization": "noop write (full evaluation of every column)",
        "baseline_note": (
            "BENCH_r01 used count()-materialization (pruned the operator "
            "under test for projection queries); r2+ use noop writes. "
            "r5 changed warm-up to noop-writing every table (~15% faster "
            "totals). Cohort grew r5/r6/r7/r8/r9 — always compare the "
            "shared-query cohort, not the raw total. From r7 reps run as "
            "interleaved passes in deterministic orders; best-of-3 per "
            "query unchanged. From r9 the >1.5s heavy queries run in "
            "their own second session (pinned HEAVY_QUERIES membership) "
            "so sub-second queries stop sharing a JVM with 7s giants. "
            "See docstring."
        ),
    }
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"
    )
    with open(out_path, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    # ONE compact stdout line (the driver contract); the heavyweight
    # fields live in BENCH_FULL.json so this line stays short enough to
    # survive any log truncation
    print(
        json.dumps(
            {
                "metric": "arrow_udf_spark headline queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": REPS,
                "full_artifact": "BENCH_FULL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
