"""Deterministic sampling & sequence packing for training-data pipelines.

Two operators a 100 TB corpus pipeline runs constantly, both built on
cross-engine-deterministic primitives (md5, integral DIV) so they are
oracle-checkable and — more importantly — *reproducible across runs and
engines*, which random sampling is not:

- :func:`hash_sample` — keep a row iff ``md5(key) mod 10000 < rate_bp``.
  Per-row, no shuffle, no RNG state; the sample is stable under re-runs,
  retries, and repartitioning (Bernoulli sampling keyed on content, the
  standard web-corpus technique).
- :func:`pack_sequences` — assign documents to fixed-token-budget training
  sequences: per shard, order documents deterministically, running-total
  their token counts, and bucket by ``cumsum DIV budget``.  One window per
  shard partition — the shuffle is by shard, so packing parallelizes across
  shards and never funnels through the driver.  (Greedy first-fit packing
  is sequential by nature; per-shard cumsum is the scalable relaxation
  every large training stack uses.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_sample",
    "pack_sequences",
    "negative_pairs",
    "split_assign",
    "temperature_mix",
    "dsir_logweights",
    "weighted_sample",
]


def hash_sample(
    df: DataFrame, key: str, rate_bp: int, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose md5-derived hash
    falls under ``rate_bp`` basis points (1/10000 units).

    ``conv(substr(md5(x),1,8),16,10)`` is bit-identical in DuckDB
    (``('0x'||substr(md5(x),1,8))::BIGINT``), making samples verifiable
    across engines.
    """
    # Column.substr (method, not name-resolved F.substring) so a session
    # where user UDFs share builtin names still binds the real expression
    h = F.conv(
        F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))).substr(1, 8),
        16,
        10,
    ).cast("long")
    return df.where(h % 10000 < rate_bp)


def weighted_sample(
    df: DataFrame,
    key: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted reservoir sample WITHOUT replacement
    (Efraimidis & Spirakis 2006, "A-ES"): keep the ``k`` rows with the
    largest ``u^(1/w)`` — equivalently the largest ``ln(u)/w`` — where
    ``u`` is a uniform in (0, 1].  Inclusion probability is proportional
    to weight, and the no-replacement guarantee is the algorithm's whole
    point (naive independent Bernoulli thinning over-samples heavy rows).

    The uniform is md5-derived (``(md5_32(salt||key)+1) / 2^32``), NOT an
    RNG — :func:`hash_sample`'s principle generalized to weights: the
    sample is bit-stable across runs, retries, repartitioning, and
    engines, which is what makes a corpus subsample auditable.  The
    priority is rounded half-up at 9 dp before ranking so a last-ulp
    ``ln`` difference between libm and ``java.lang.Math.log`` cannot flip
    the rounded key; ties (same rounded priority) break on ``key`` — a
    total order, so the selected SET and its ranks are cross-engine
    deterministic.

    Scale shape: per-row hash + log, then ONE global
    ``TakeOrderedAndProject(k)`` — per-partition top-k heaps and a k-row
    reduce, never a full sort shuffle.  Rows with non-positive weight are
    excluded (ln(u)/w flips sign); ``u > 0`` by construction so ln is
    finite.
    """
    h = F.conv(
        F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))).substr(1, 8),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(4294967296.0)
    pr = F.floor(
        F.log(u) / F.col(weight_col) * 1e9 + F.lit(0.5)
    ) / 1e9
    picked = (
        df.where(F.col(weight_col) > 0)
        .select(
            F.col(key),
            F.col(weight_col).cast("long").alias("weight"),
            pr.alias("priority"),
        )
        .orderBy(F.col("priority").desc(), F.col(key).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("priority").desc(), F.col(key).asc())
    return picked.withColumn(
        "rnk", F.row_number().over(w).cast("long")
    )


def pack_sequences(
    df: DataFrame,
    shard: str,
    order: str,
    tokens: str,
    budget: int,
    seq_col: str = "seq_id",
) -> DataFrame:
    """Assign each row a sequence id so every sequence holds ~``budget``
    tokens: ``seq_id = (running token total) DIV budget`` per shard,
    ordering rows by ``order`` (must be unique per shard for
    reproducibility).

    Documents larger than the budget get sequences to themselves; the
    cumulative-sum formulation never splits a document.
    """
    w = (
        Window.partitionBy(shard)
        .orderBy(F.col(order).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens).cast("long")).over(w)
    # DIV (integral) — not floor(double /) — for exactness at any magnitude
    return (
        df.withColumn("__cum", cum)
        .withColumn(seq_col, F.expr(f"(__cum - 1) DIV {budget}"))
        .drop("__cum")
    )


def negative_pairs(
    df: DataFrame,
    key: str,
    k: int,
    n_rows: int,
    salt: str = "",
) -> DataFrame:
    """Contrastive-training negative sampling: pair each row with ``k``
    pseudo-random partners, deterministically.

    Partner ids come from ``md5(key:j)`` mod ``n_rows`` — reproducible
    across runs, engines, and retries (a random sample is not), and the
    pairing is a plain equi-join on the derived id: one shuffle, no
    cartesian anything.  ``n_rows`` is the table's row count with
    contiguous 0-based keys (the layout ``pack_sequences``-style pipelines
    produce); self-pairs are kept — filter afterwards if undesired.
    """
    pairs = df.select(F.col(key)).withColumn(
        "j", F.explode(F.array(*[F.lit(i) for i in range(k)]))
    )
    h = F.conv(
        F.md5(
            F.concat(
                F.lit(salt),
                F.col(key).cast("string"),
                F.lit(":"),
                F.col("j").cast("string"),
            )
        ).substr(1, 8),
        16,
        10,
    ).cast("long")
    return pairs.withColumn("partner", h % n_rows)


def stratified_sample(
    df: DataFrame,
    stratum: str,
    key: str,
    rates_bp: dict[str, int],
    default_bp: int = 0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic Bernoulli sampling — the corpus-mixture
    primitive of a training-data pipeline (each source kept at its own
    rate, e.g. upweight books / downweight crawl).

    The (stratum → rate) table is tiny and broadcast-joined onto the fact,
    so the plan is scan → BroadcastHashJoin → filter: no shuffle of the
    corpus at any scale, and the md5 keep-decision is reproducible row-wise
    across engines and re-runs (same family as ``hash_sample``).  Strata
    missing from ``rates_bp`` fall back to ``default_bp``.
    """
    from pyspark.sql.functions import broadcast

    spark = df.sparkSession
    weights = spark.createDataFrame(
        [(k, int(v)) for k, v in rates_bp.items()],
        f"{stratum} string, rate_bp int",
    )
    h = F.conv(
        F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))).substr(1, 8),
        16,
        10,
    ).cast("long")
    return (
        df.join(broadcast(weights), stratum, "left")
        .where(h % 10000 < F.coalesce(F.col("rate_bp"), F.lit(int(default_bp))))
        .drop("rate_bp")
    )


def split_assign(
    df: DataFrame,
    key: str,
    splits: tuple[tuple[str, int], ...] = (
        ("train", 9000),
        ("val", 500),
        ("test", 500),
    ),
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket each row by
    ``md5(key) mod 10000`` (basis points) and map cumulative ranges to split
    names.  Pure integer compares on the same md5 primitive as
    :func:`hash_sample` — no RNG, stable under re-runs/repartitioning, and
    bit-identical across engines.  Per-row map-side work: no shuffle, so it
    composes with any downstream write at 100 TB.

    ``splits`` is ``(name, weight_bp)`` pairs; weights must sum to 10000.
    """
    total = sum(w for _, w in splits)
    if total != 10000:
        raise ValueError(f"split weights must sum to 10000 bp, got {total}")
    h = F.conv(
        F.md5(F.concat(F.lit(salt), F.col(key).cast("string"))).substr(1, 8),
        16,
        10,
    ).cast("long") % 10000
    expr = None
    hi = 0
    for name, w in splits[:-1]:
        hi += w
        cond = h < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(splits[-1][0]) if expr is None else expr.otherwise(splits[-1][0])
    )
    return df.withColumn(out, expr)


def temperature_mix(
    df: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-based source rebalancing — the multilingual-LM
    sampling step (sample sources proportional to ``n_s^alpha`` instead
    of ``n_s``, so high-resource sources stop drowning the tail):
    each doc of source ``s`` survives iff its md5 fraction falls under

        ``q_s = (n_min / n_s) ** (1 - alpha)``

    where ``n_min`` is the smallest source's size — the rarest source
    keeps everything (q = 1) and larger sources downsample toward
    ``n_s^alpha``-proportional volumes.  ``alpha = 1`` is a no-op
    (natural proportions); ``alpha = 0`` equalizes every source to
    ``n_min`` in expectation.

    Cross-engine bit-exactness (the whole point of doing this by hash
    instead of RNG): counts are exact integers, ``n_min / n_s`` is one
    correctly-rounded IEEE division, and the md5 fraction is a dyadic
    rational ``md5int32 / 2^32``.  For the default ``alpha = 0.5`` the
    predicate ``frac < sqrt(r)`` is evaluated as ``frac * frac < r`` —
    one correctly-rounded multiply, NO sqrt/pow at all, so the survivor
    set is provably identical in every IEEE-754 engine (general ``pow``
    can differ by an ulp across libms; that path is kept for other
    alphas and documented as ulp-sensitive at the threshold boundary).
    SUM(doc_id) checksums the survivor set in integers.

    Scale: one map-side-combined count aggregate (|sources| rows), a
    broadcast join of the per-source thresholds, and one scan-side
    filter — no shuffle of the documents themselves, no RNG state, and
    re-runs/retries/repartitioning cannot change the sample.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__ns"))
    n_min = counts.agg(F.min("__ns").alias("__nmin"))
    ratio = F.col("__nmin").cast("double") / F.col("__ns").cast("double")
    q = counts.crossJoin(F.broadcast(n_min)).select(source_col, ratio.alias("__q"))
    frac = (
        F.conv(
            F.md5(
                F.concat(
                    F.lit(f"{salt}:"), F.col(id_col).cast("string")
                )
            ).substr(1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    if abs(alpha - 0.5) < 1e-12:
        pred = (frac * frac) < F.col("__q")  # frac < sqrt(q), sqrt-free
    else:
        pred = frac < F.pow(F.col("__q"), F.lit(1.0 - alpha))
    return df.join(F.broadcast(q), source_col).where(pred).drop("__q")


def _bigram_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    buckets: int,
    toks_col: str | None = None,
) -> DataFrame:
    """(id, b): one row per word bigram, hashed into ``buckets`` feature
    buckets — ONE tokenization per scan (posexplode feeds a per-doc lag
    window, the bigram_surprisal shape; nothing re-inlines under the
    Generate).  ``toks_col`` lets pipeline callers share an
    already-staged token array (the curation capstone tokenizes once for
    quality AND bigrams — the plan-lint retokenize rule).

    MEASURED ALTERNATIVE (rejected): building the bigram-bucket array
    per row with ``transform(sequence(...), element_at ...)`` and one
    explode removes this function's only Exchange — and ran 12x SLOWER
    at sf0.1 (28.7 s vs 2.3 s): Spark's higher-order array functions
    are CodegenFallback (an interpreter visit per element), while the
    post-explode md5/concat here is plain codegen'd column work, and
    the lag window's exchange incidentally spreads the fixture's
    single-row-group scan.  Same lesson as semdedup's fold-vs-numpy:
    keep per-element work OUT of interpreted HOFs."""
    from .text import token_hash, tokens

    toks = F.col(toks_col) if toks_col else tokens(F.col(text_col))
    tokp = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(toks).alias("pos", "t"),
    )
    wl = Window.partitionBy("id").orderBy("pos")
    return (
        tokp.withColumn("prev", F.lag("t").over(wl))
        .where(F.col("prev").isNotNull())
        .select(
            "id",
            (
                token_hash(F.concat(F.col("prev"), F.lit(" "), F.col("t")))
                % buckets
            ).alias("b"),
        )
    )


def dsir_logweights(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
    toks_col: str | None = None,
) -> DataFrame:
    """DSIR (Xie et al. 2023) — data selection via importance resampling
    over HASHED n-gram features: score every raw document by how much
    more likely its word bigrams are under the target corpus's bucket
    distribution than under the raw corpus's own,

        ``logw(doc) = sum over bigrams g of
            ln( p_target[h(g)] / p_raw[h(g)] )``

    with add-1-smoothed bucket probabilities ``p[b] = (cnt_b + 1) /
    (total + buckets)``.  High-weight docs look like the target (the
    quality corpus); resampling by these weights is the DSIR selection
    step.  Returns ``(id, n_bigrams, logw)``, docs with ≥1 bigram.

    Cross-engine determinism: each term is ONE ln of ONE double ratio
    whose numerator/denominator are products of exact-integer-valued
    doubles (counts < 2^26 keep the products < 2^53, exact — and beyond
    that double multiply degrades gracefully instead of wrapping like
    BIGINT would, the ADVICE-r7 overflow class); the per-doc sum rounds
    half-up to 6 dp, the bigram_surprisal discipline the gate has proven
    at three scales.

    Scale: both bucket tables are ``buckets`` rows (broadcast); corpus
    totals are two O(1) driver scalars; the only data-sized shuffles are
    the bucket count aggregates (map-side combined to ≤``buckets`` rows
    per partition) and the per-doc weight sum.  Production would raise
    ``buckets`` to 10k+ (the paper's setting) — still broadcast-sized."""
    # toks_col applies per-DataFrame only where the column actually
    # exists: a pipeline that staged tokens on the raw side only must not
    # get an AnalysisException on the (usually smaller, un-staged) target
    # branch (ADVICE r8)
    # materialize the (id, bucket) bigram rows once per side (r10 perf):
    # each side is consumed by its bucket-count aggregate, the corpus
    # total count, and (raw) the final per-doc weight join — three full
    # re-tokenizations of the caller's upstream otherwise (in
    # curation_pipeline_e2e that upstream is the whole quality+mix
    # pipeline).  The rows are the narrow proxy — (id, int32) — exactly
    # what should pin instead of the text pipeline.
    raw_b = _bigram_buckets(
        df, text_col, id_col, buckets,
        toks_col if toks_col and toks_col in df.columns else None,
    ).localCheckpoint(eager=True)
    tgt_b = _bigram_buckets(
        target, text_col, id_col, buckets,
        toks_col if toks_col and toks_col in target.columns else None,
    ).localCheckpoint(eager=True)
    cr = raw_b.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    ct = tgt_b.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    t_raw = raw_b.count()  # O(1) driver scalars, data-size independent
    t_tgt = tgt_b.count()
    term = F.log(
        (
            (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1)).cast("double")
            * F.lit(float(t_raw + buckets))
        )
        / (
            (F.col("cr") + F.lit(1)).cast("double")
            * F.lit(float(t_tgt + buckets))
        )
    )
    probs = cr.join(ct, "b", "left").select("b", term.alias("term"))
    return (
        raw_b.join(F.broadcast(probs), "b")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (F.floor(F.sum("term") * 1e6 + F.lit(0.5)) / 1e6).alias("logw"),
        )
    )


def dsir_term_table(
    df: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> dict[int, float]:
    """Train the DSIR bucket model and return it as a plain
    ``{bucket: ln-likelihood-ratio-term}`` dict — O(buckets) driver
    state, the "trained curation model" a stateless STREAMING filter
    applies per row (each incoming doc's weight is a fold over its
    bigrams through this table; no aggregation state, append-mode
    safe).  Buckets absent from the raw corpus get the fully-smoothed
    term so unseen bigrams in later stream batches still score.

    Term arithmetic is identical to :func:`dsir_logweights` (one ln of
    one double ratio of exact-integer products)."""
    import math

    raw_b = _bigram_buckets(df, text_col, id_col, buckets)
    tgt_b = _bigram_buckets(target, text_col, id_col, buckets)
    cr = {
        r["b"]: r["c"]
        for r in raw_b.groupBy("b").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    ct = {
        r["b"]: r["c"]
        for r in tgt_b.groupBy("b").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    t_raw = sum(cr.values())
    t_tgt = sum(ct.values())
    return {
        b: math.log(
            (float(ct.get(b, 0) + 1) * float(t_raw + buckets))
            / (float(cr.get(b, 0) + 1) * float(t_tgt + buckets))
        )
        for b in range(buckets)
    }
