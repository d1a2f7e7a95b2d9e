"""Duplicate-heavy / scale stress harness (round-6 findings, PLANS.md
"duplicate-heavy stress matrix" + "ANN stress").

Replicates the driver's sf0.1 tables 10x with shifted ids — every
document gains 10 exact copies, the adversarial shape for pair-emitting
dedup — and drives the dedup + ANN families end-to-end.  This is the
run that surfaced the 1g local-JVM heap default (OOM in a hash
aggregate) and moved simhash's hamming predicate into the join
condition; keep it runnable so the next scale regression is a command,
not an archaeology project.

Usage:  python tools/stress.py [replication=10]
        python tools/stress.py 100 heavy3   # round-9 decade tier: only
        # the three heaviest operators (simhash pipeline, curation
        # capstone, semdedup numpy) at 100x — ~500k docs / 500k vectors
"""

from __future__ import annotations

import sys
import time
from functools import reduce


def _replicate(df, id_col, rep, extra_cols):
    from pyspark.sql import functions as F

    return reduce(
        lambda a, b: a.unionByName(b),
        [
            df.select(
                (F.col(id_col) + F.lit(i * 10_000_000)).alias(id_col),
                *extra_cols,
            )
            for i in range(rep)
        ],
    )


def heavy3(rep: int) -> int:
    """Round-9 decade tier (VERDICT r8 ask #7): the three heaviest bench
    operators at ``rep``x replication, with the scale KNOBS moved the
    way the documented cost models say they must move — k for SemDeDup
    tracks N (paper posture k ~ N/1000) so sum(|cell|^2) stays linear
    in N; simhash runs behind exact dedup (the pipeline posture: the
    canonical set is size-invariant under replication, so the cost is
    the O(N) digest shuffle in front); the curation capstone is scan +
    broadcast + two windows, linear by construction.  Per-op wall times
    land in PLANS.md next to the 10x rows."""
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from arrow_udf_spark import get_spark

    spark = get_spark("stress_heavy3", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    failures = 0

    def run(name, thunk):
        nonlocal failures
        t0 = time.perf_counter()
        try:
            c = thunk().count()
            print(
                f"  {name:44s} {c:>10} rows  "
                f"{time.perf_counter() - t0:6.1f}s"
            )
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"  {name:44s} FAILED {type(e).__name__}: {str(e)[:120]}")

    d0 = spark.read.parquet(f"{sf}/documents.parquet")
    docs = (
        _replicate(d0, "doc_id", rep, ["text", "n_chars", "lang"])
        .repartition(64)
        .localCheckpoint(eager=True)
    )
    print(f"documents x{rep}: {docs.count()}")

    from arrow_udf_spark.operators.dedup import (
        exact_dedup,
        semdedup_keep_numpy,
        simhash_hamming_pairs,
    )

    canonical = docs.join(
        exact_dedup(docs, "text", "doc_id").select(
            F.col("keep_id").alias("doc_id")
        ),
        "doc_id",
    ).localCheckpoint(eager=True)
    run(
        f"exact-dedup -> simhash_hamming ({rep}x)",
        lambda: simhash_hamming_pairs(canonical, max_bucket=10_000),
    )

    # curation capstone over the replicated corpus (same stages as the
    # gated q_curation_pipeline_e2e, inlined against `docs`)
    from pyspark.sql import Window

    from arrow_udf_spark.operators.dedup import content_hash
    from arrow_udf_spark.operators.sampling import (
        dsir_logweights,
        pack_sequences,
        temperature_mix,
    )
    from arrow_udf_spark.operators.text import quality_score, tokens

    def curation():
        d = docs.withColumn("__toks", tokens(F.col("text")))
        kept = d.where(
            quality_score(
                F.col("text"), F.col("n_chars"), toks=F.col("__toks")
            )
            >= 0.5
        )
        mixed = temperature_mix(kept, source_col="lang", alpha=0.5)
        w = dsir_logweights(
            mixed, mixed.where(F.col("lang") == "en"), toks_col="__toks"
        )
        sel = mixed.join(
            w.where(F.col("logw") >= 0.0), mixed.doc_id == F.col("id")
        ).drop("id", "n_bigrams", "__toks")
        keep = F.min("doc_id").over(
            Window.partitionBy(content_hash("text"))
        )
        ded = (
            sel.withColumn("__keep", keep)
            .where(F.col("doc_id") == F.col("__keep"))
            .drop("__keep")
        )
        return pack_sequences(
            ded, shard="lang", order="doc_id", tokens="n_chars",
            budget=16384,
        )

    run(f"curation_pipeline ({rep}x)", curation)

    e0 = spark.read.parquet(f"{sf}/embeddings.parquet")
    bigemb = (
        _replicate(e0, "vec_id", rep, ["embedding", "label"])
        .repartition(64)
        .localCheckpoint(eager=True)
    )
    n_vec = bigemb.count()
    print(f"embeddings x{rep}: {n_vec}")
    # k tracks N (paper: k ~ N/1000): cells stay ~1000 vectors, so the
    # per-cell |cell|^2 matmul stays bounded and total cost is linear
    k = max(32, n_vec // 1000)

    from arrow_udf_spark.operators.clustering import kmeans_assign

    def semdd():
        assigned = kmeans_assign(bigemb, k=k, iters=1)
        items = bigemb.select("vec_id", "embedding").join(
            assigned, "vec_id"
        )
        return semdedup_keep_numpy(
            items, "vec_id", "embedding", "cluster", threshold=0.999999
        ).groupBy("kept").count()

    run(f"semdedup_prune_numpy ({rep}x, k={k})", semdd)

    spark.stop()
    print(f"\n{'ALL OK' if not failures else f'{failures} FAILURES'}")
    return 1 if failures else 0


def corr2p(rep: int) -> int:
    """Round-10 stress for ``sql_agg_correlated_two_phase`` (VERDICT r9
    ask #5 — the bench's most expensive query): replicate lineitem
    ``rep``x WITHOUT shifting l_partkey, so the row count grows by
    ``rep`` while the distinct-key count K stays FIXED — the documented
    cost model says the pandas-UDAF merge stage is O(K) calls and the
    partials parallelize, so wall time must grow SUBLINEARLY in rows.
    Runs 1x then ``rep``x in the same session (1x first: any JVM warmth
    bias favors the BIG run being measured warm, i.e. against the
    sublinearity claim being cheap)."""
    sys.path.insert(0, "/root/repo")
    from functools import reduce as _reduce

    from arrow_udf_spark import get_spark
    from arrow_udf_spark.plans.registry import GLOBAL

    spark = get_spark("stress_corr2p", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"
    GLOBAL.register_sql(spark)
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    pt = spark.read.parquet(f"{sf}/part.parquet")
    pt.createOrReplaceTempView("pt_corrsql")
    q = """
        SELECT p_brand AS brand,
               CAST(sum_udaf(CAST(FLOOR(l_extendedprice) AS BIGINT))
                    AS BIGINT) AS revenue,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM li_corrsql l, pt_corrsql p
        WHERE p.p_partkey = l.l_partkey
          AND CAST(l.l_quantity AS BIGINT) * 5 <
              (SELECT sum_udaf(CAST(l2.l_quantity AS BIGINT))
               FROM li_corrsql l2 WHERE l2.l_partkey = p.p_partkey)
        GROUP BY p_brand
        ORDER BY brand
    """
    results = {}
    for tag, r in [("1x", 1), (f"{rep}x", rep)]:
        big = (
            _reduce(
                lambda a, b: a.unionByName(b), [li for _ in range(r)]
            )
            .repartition(64)
            .localCheckpoint(eager=True)
        )
        n = big.count()
        big.createOrReplaceTempView("li_corrsql")
        t0 = time.perf_counter()
        rows = GLOBAL.sql(spark, q).collect()
        dt = time.perf_counter() - t0
        results[tag] = (n, dt, len(rows))
        print(f"  corr2p {tag}: rows={n} brands={len(rows)} wall={dt:.1f}s")
        big.unpersist()
    n1, t1, _ = results["1x"]
    nr, tr, _ = results[f"{rep}x"]
    print(
        f"  {rep}x rows -> {tr / t1:.2f}x wall "
        f"({'SUBLINEAR' if tr / t1 < rep else 'NOT sublinear'}; "
        f"fixed K = distinct partkeys)"
    )
    return 0


def main() -> int:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    if len(sys.argv) > 2 and sys.argv[2] == "heavy3":
        return heavy3(rep)
    if len(sys.argv) > 2 and sys.argv[2] == "corr2p":
        return corr2p(rep)
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from arrow_udf_spark import get_spark

    spark = get_spark("stress", master="local[16]")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.1"

    d0 = spark.read.parquet(f"{sf}/documents.parquet")
    docs = reduce(
        lambda a, b: a.unionByName(b),
        [
            d0.select(
                (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
                "text",
                "n_chars",
                "source",
            )
            for i in range(rep)
        ],
    ).repartition(32).localCheckpoint(eager=True)
    n = docs.count()
    print(f"documents x{rep}: {n}")

    e0 = spark.read.parquet(f"{sf}/embeddings.parquet")
    emb = reduce(
        lambda a, b: a.unionByName(b),
        [
            e0.select(
                (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
                "embedding",
                "label",
            )
            for i in range(rep)
        ],
    ).repartition(16).localCheckpoint(eager=True)
    print(f"embeddings x{rep}: {emb.count()}")

    from arrow_udf_spark.operators.clustering import kmeans_fit
    from arrow_udf_spark.operators.dedup import (
        decontaminate,
        dup_clusters,
        exact_dedup,
        keep_best,
        lsh_candidate_pairs,
        shared_shingle_flags,
        simhash_hamming_pairs,
    )
    from arrow_udf_spark.operators.similarity import (
        brute_force_topk,
        ivf_multiprobe_topk,
        lsh_topk,
    )
    from arrow_udf_spark.operators.text import with_quality_score

    failures = 0

    def run(name, thunk):
        nonlocal failures
        t0 = time.perf_counter()
        try:
            c = thunk().count()
            print(f"  {name:36s} {c:>10} rows  {time.perf_counter() - t0:6.1f}s")
        except Exception as e:  # noqa: BLE001 — report, keep going
            failures += 1
            print(f"  {name:36s} FAILED {type(e).__name__}: {str(e)[:120]}")

    print("dedup family:")
    run("exact_dedup", lambda: exact_dedup(docs, "text", "doc_id"))
    canonical = docs.join(
        exact_dedup(docs, "text", "doc_id").select(
            F.col("keep_id").alias("doc_id")
        ),
        "doc_id",
    ).localCheckpoint(eager=True)
    run(
        "lsh_candidate_pairs(cap1000)",
        lambda: lsh_candidate_pairs(docs, "doc_id", "text", max_bucket=1000),
    )
    run(
        "exact-dedup -> simhash_hamming",
        lambda: simhash_hamming_pairs(canonical, max_bucket=10_000),
    )
    run("dup_span_flags", lambda: shared_shingle_flags(docs, n=5))
    run(
        "decontaminate",
        lambda: decontaminate(
            docs.where(F.col("doc_id") % 97 != 0),
            docs.where(F.col("doc_id") % 97 == 0),
        ),
    )

    print("dedup policy pipeline:")
    pairs = lsh_candidate_pairs(
        docs, "doc_id", "text", max_bucket=1000
    ).localCheckpoint(eager=True)
    run("dup_clusters(pairs)", lambda: dup_clusters(pairs))
    run(
        "keep_best",
        lambda: keep_best(
            with_quality_score(docs, "text", "n_chars").select("doc_id", "q"),
            dup_clusters(pairs),
            "q",
        ),
    )

    print("ANN family:")
    q = emb.where(F.col("vec_id") < 5)
    run("brute_force_topk", lambda: brute_force_topk(emb, q, k=5))
    run("lsh_topk", lambda: lsh_topk(emb, q, k=5))
    cents = kmeans_fit(emb, k=8, iters=2)
    run(
        "ivf_multiprobe_topk",
        lambda: ivf_multiprobe_topk(emb, q, cents, k=5, n_probe=2),
    )

    print("round-7 additions:")
    import tempfile

    from arrow_udf_spark.operators.similarity import (
        ivf_build_index,
        ivf_persisted_topk,
    )
    from arrow_udf_spark.operators.sketch import (
        bloom_tuning_gate,
        join_size_gate,
        kmv_error_gate,
    )
    from arrow_udf_spark.operators.text import bpe_pair_counts

    idx = tempfile.mkdtemp(prefix="stress_ivf_") + "/index"

    def persisted():
        ivf_build_index(emb, cents, idx)
        return ivf_persisted_topk(spark, idx, q, cents, k=5, n_probe=2)

    run("ivf_build+persisted_topk", persisted)
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    big = reduce(
        lambda a, b: a.unionByName(b), [li for _ in range(rep)]
    ).repartition(32)
    pt = spark.read.parquet(f"{sf}/part.parquet").where("p_size <= 5")
    run(
        f"bloom_tuning_gate({rep}x lineitem)",
        lambda: bloom_tuning_gate(big, pt, "l_partkey", "p_partkey",
                                  m_list=(512, 65536)),
    )
    run(f"kmv_error_gate({rep}x lineitem)",
        lambda: kmv_error_gate(big, "l_partkey"))
    run(f"bpe_pair_counts({rep}x docs)", lambda: bpe_pair_counts(docs))
    ev = spark.read.parquet(f"{sf}/events.parquet")
    bigev = reduce(
        lambda a, b: a.unionByName(b), [ev for _ in range(rep)]
    ).repartition(32)
    run(f"join_size_gate({rep}x events self)",
        lambda: join_size_gate(bigev, "user_id", bigev, "user_id"))

    print("round-8 additions:")
    from arrow_udf_spark.operators.dedup import dup_span_cascade
    from arrow_udf_spark.operators.multimodal import png_pipeline

    # every doc has 10 exact copies — the adversarial shape for the
    # cascade: EVERYTHING is flagged at tier 5, so the 10/20-gram tiers
    # get zero pruning benefit and run over the whole corpus (worst case)
    run(f"dup_span_cascade({rep}x docs)", lambda: dup_span_cascade(docs))
    run(f"png_pipeline({rep}x docs)", lambda: png_pipeline(docs))

    from arrow_udf_spark.operators.multimodal import decode_gif, synth_gif

    run(
        f"gif_pipeline({rep}x docs)",
        lambda: png_pipeline(docs, synth=synth_gif, decode=decode_gif),
    )

    print("round-9 codec additions:")
    from arrow_udf_spark.operators.jpeg import decode_jpeg, synth_jpeg_flat
    from arrow_udf_spark.operators.multimodal import (
        gif_frames_pipeline,
        png_deep_pipeline,
    )

    run(f"jpeg_pipeline({rep}x docs)",
        lambda: png_pipeline(docs, synth=synth_jpeg_flat, decode=decode_jpeg))

    from arrow_udf_spark.operators.multimodal import jpeg_subsampled_pipeline

    run(f"jpeg_subsampled_pipeline({rep}x docs, 4:2:0 + 4:2:2/row)",
        lambda: jpeg_subsampled_pipeline(docs))

    from arrow_udf_spark.operators.jpeg import synth_jpeg_progressive

    run(f"jpeg_progressive_pipeline({rep}x docs, SOF2 multi-scan/row)",
        lambda: png_pipeline(
            docs, synth=synth_jpeg_progressive, decode=decode_jpeg
        ))
    run(f"png_deep_pipeline({rep}x docs, 3 decodes/row)",
        lambda: png_deep_pipeline(docs))
    run(f"gif_frames_pipeline({rep}x docs, 2-4 frames/row)",
        lambda: gif_frames_pipeline(docs))

    # SemDeDup over replicated embeddings: every vector has `rep` exact
    # copies, so every cell is maximally dup-heavy — the k knob (here
    # k=32 for rep*5000 vectors) is what keeps the cell-confined pair
    # space bounded; kept-count must be ~N/rep
    from pyspark.sql import functions as SF

    from arrow_udf_spark.operators.clustering import kmeans_assign
    from arrow_udf_spark.operators.dedup import (
        semdedup_keep,
        semdedup_keep_numpy,
    )

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    bigemb = reduce(
        lambda a, b: a.unionByName(b),
        [
            emb.withColumn("vec_id", SF.col("vec_id") + SF.lit(i * 1_000_000))
            for i in range(rep)
        ],
    ).repartition(32)

    def semdedup_stress(impl):
        def thunk():
            assigned = kmeans_assign(bigemb, k=32, iters=1)
            items = bigemb.select("vec_id", "embedding").join(
                assigned, "vec_id"
            )
            return impl(
                items, "vec_id", "embedding", "cluster", threshold=0.999999
            ).groupBy("kept").count()

        return thunk

    run(
        f"semdedup_prune({rep}x embeddings, k=32)",
        semdedup_stress(semdedup_keep),
    )
    run(
        f"semdedup_prune_numpy({rep}x embeddings, k=32)",
        semdedup_stress(semdedup_keep_numpy),
    )

    spark.stop()
    print(f"\n{'ALL OK' if not failures else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
