"""Iterative k-means (Lloyd) training over an embedding column.

This is the training half of the IVF similarity-search path
(``operators/similarity.py::ivf_topk`` consumes a cell assignment; this
module *learns* the cells).  The reference engine has no clustering
operator — this is part of the training-data-pipeline surface the repo
adds on top of the reference's corpus (SURVEY.md §2 "beyond the
reference").

Scale design (the same shape Spark MLlib's KMeans uses):

- centroids live on the DRIVER as a ``k × dim`` double list — O(k·dim),
  independent of data size, broadcast into the assignment expression as
  array literals.  At 100 TB the per-iteration driver traffic is still
  just ``k·dim`` aggregated means (k=256, dim=1024 → 2 MB);
- each iteration is ONE map-side-combinable aggregation: assignment is a
  pure Catalyst expression (``zip_with`` + ``aggregate`` over the
  broadcast centroid literals — whole-stage-codegen, no Python), and the
  per-dimension mean shuffles only ``k·dim`` partial (sum, count) pairs
  after map-side combine;
- determinism: initial centroids are the ``k`` vectors with the smallest
  ids (no RNG — the repo-wide rule), distance ties break on the lower
  centroid id, so any engine reproduces the same trajectory bit-for-bit
  up to float-sum associativity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sq_dist(vec_col, cent_col):
    """Squared L2 distance between two array<double> columns — sequential
    left-fold over the per-dimension squared diffs, the same quantity and
    op order the DuckDB oracle folds (argmin is sqrt-free on both sides)."""
    diffs = F.zip_with(vec_col, cent_col, lambda a, b: (a - b) * (a - b))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def _assign(v: DataFrame, cents: list) -> DataFrame:
    """(vec_id, cid): nearest centroid per vector, ties to the lower cid.

    ``array_min`` over (distance, cid) structs compares lexicographically —
    one expression per row, no join, no shuffle.  The centroid matrix
    enters the plan as ONE parsed SQL literal and the per-centroid
    distances as a higher-order transform over it: the unrolled form
    (k structs x dim F.lit coefficients, rebuilt every Lloyd round) cost
    ~1500 py4j round-trips per round in driver-side plan construction
    (the lsh_bands lesson).  Float literals render via repr() — shortest
    round-trip — and CAST(... AS DOUBLE) parses back to the identical
    double, so the trajectory is unchanged bit-for-bit."""
    pairs = _dist_pairs(F.col("e"), cents)
    return v.select("vec_id", "e", F.array_min(pairs)["cid"].alias("cid"))


def cents_expr(cents: list):
    """The trained centroid list as ONE parsed SQL literal column:
    array<struct<cid:int, c:array<double>>>."""
    cents_sql = "array({})".format(
        ",".join(
            "named_struct('cid', {}, 'c', array({}))".format(
                int(cid),
                ",".join(f"CAST('{float(c)!r}' AS DOUBLE)" for c in vec),
            )
            for cid, vec in cents
        )
    )
    return F.expr(cents_sql)


def _dist_pairs(vec_col, cents: list):
    """array<struct<d, cid>> of (squared distance, cid) per centroid —
    array_min gives the Lloyd assignment, array_sort + slice gives the
    n_probe nearest cells for multi-probe IVF search.

    r10 perf note (measured NEGATIVE result, kept as the fold on
    purpose): unrolling the k·dim distance sum to a codegen bracket
    chain (``0.0 + (v[0]-c0)² + ...``) was A/B-measured 2-3x SLOWER at
    bench scale — every Lloyd round carries fresh centroid literals, so
    Janino recompiles a ~512-term expression per round and compile time
    dominates the interpreted-fold savings on fixture-sized data
    (kmeans_train_assign 1.33s -> 3.58s, ivf_trained 2.2s -> 5.3s;
    OPTIMIZATION_r10.md).  The interpreted HOF fold stays."""
    return F.transform(
        cents_expr(cents),
        lambda s: F.struct(
            _sq_dist(vec_col, s["c"]).alias("d"), s["cid"].alias("cid")
        ),
    )


def probe_cells(
    df: DataFrame,
    cents: list,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell) rows: each vector's ``n_probe`` nearest trained cells
    (ties to the lower cid, same ordering as the assignment argmin).

    Multi-probe is THE standard IVF recall lever: the query's neighbour
    often sits just across a cell boundary, so searching the p nearest
    cells instead of 1 trades p× candidate work for recall — still
    O(p·N/k) per query vs brute force's O(N)."""
    pairs = _dist_pairs(F.col(vec_col).cast("array<double>"), cents)
    nearest = F.slice(F.array_sort(pairs), 1, n_probe)
    return df.select(
        F.col(id_col).alias("id"), F.explode(nearest).alias("__p")
    ).select("id", F.col("__p.cid").alias("cell"))


def kmeans_fit(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Train ``k`` centroids for ``iters`` Lloyd rounds; return the final
    centroid list ``[(cid, vector), ...]`` (driver-side, O(k·dim)).

    Per round: assign (one expression over the broadcast centroid
    literal, zero shuffle) → per-dimension mean (posexplode +
    groupBy(cid, pos) — ONE shuffle of k·dim partial aggregates after
    map-side combine) → collect the k·dim means to the driver and
    rebuild the centroid literal.  An emptied cluster simply drops out
    of the next round (same as the SQL oracle's GROUP BY)."""
    v = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("e"),
    )
    seed = v.orderBy("vec_id").limit(k).collect()  # k rows — O(k·dim)
    cents = [(i, list(r["e"])) for i, r in enumerate(seed)]
    for _ in range(iters):
        assigned = _assign(v, cents)
        rows = (
            assigned.select("cid", F.posexplode("e").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()  # k·dim rows — O(k·dim), data-size independent
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(r["cid"], {})[r["pos"]] = r["m"]
        cents = [
            (cid, [dims[p] for p in sorted(dims)])
            for cid, dims in sorted(by_cid.items())
        ]
    return cents


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache: bool = False,
) -> DataFrame:
    """Train ``k`` centroids for ``iters`` Lloyd rounds (see
    :func:`kmeans_fit`); return the final (vec_id, cluster) assignment."""
    v = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("e"),
    )
    if cache and iters > 0:
        # iterative training re-scans the vectors once per round — caching
        # them is what Spark MLlib does for its training loops
        # (MEMORY_AND_DISK: spills instead of OOMing).  Opt-in: measured
        # at small SF the persist/unpersist churn COSTS ~40% (the scan is
        # cheaper than the materialization barrier); it pays off when the
        # scan itself is expensive (wide tables, object storage).
        from pyspark import StorageLevel

        v = v.persist(StorageLevel.MEMORY_AND_DISK)
    cents = kmeans_fit(v, k, iters, id_col="vec_id", vec_col="e")
    out = _assign(v, cents).select(
        "vec_id", F.col("cid").cast("int").alias("cluster")
    )
    if cache and iters > 0:
        # materialize the (narrow) final assignment WHILE the vector
        # cache is hot, then release it — unpersisting first would make
        # the most expensive remaining pass rescan the raw source, the
        # exact cost the opt-in cache exists to avoid
        out = out.localCheckpoint(eager=True)
        v.unpersist(blocking=False)
    return out


def kmeans_fit_multi(
    emb: DataFrame,
    slices: list,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Train ONE k-means per vector slice — ``slices`` is a list of
    1-based ``(start, length)`` pairs (:func:`pyspark.sql.functions.slice`
    convention) — in the job count of a SINGLE fit: one seed collect of
    the first ``k`` full vectors serves every slice, and each Lloyd round
    computes every slice's assignment and per-dimension means in ONE
    aggregation keyed ``(slice, cid, pos)``.  Returns one centroid list
    per slice, in order.

    Bit-exactness vs. per-slice :func:`kmeans_fit` calls: the seeds are
    the same rows sliced locally, and each ``(slice, cid, pos)`` group
    receives exactly the values the per-slice fit's ``(cid, pos)`` group
    received, in the same row order within each partition — the hash
    aggregate's partial sums are therefore identical, so the trajectory
    is identical (r10 opt round; ``pq_codebooks`` went from
    ``m·(1+iters)`` sequential driver jobs to ``1+iters``)."""
    v = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("e"),
    )
    seed = v.orderBy("vec_id").limit(k).collect()  # k rows — O(k·dim)
    books = [
        [(i, list(r["e"])[lo - 1 : lo - 1 + ln]) for i, r in enumerate(seed)]
        for lo, ln in slices
    ]
    for _ in range(iters):
        # STAGE each slice's assignment in its own projection first: the
        # argmin fold is the expensive per-row expression, and inlined
        # into the per-element struct below it would re-evaluate once PER
        # SLICE ELEMENT (first cut of this function: the round job
        # measured 4.45 cpu-s vs ~0.8 staged — the with_simhash staging
        # rule).  CollapseProject refuses to duplicate the non-cheap
        # fold, so the two projections survive planning.
        staged = v.select(
            "e",
            *[
                F.array_min(
                    _dist_pairs(F.slice(F.col("e"), lo, ln), books[j])
                )["cid"].alias(f"__c{j}")
                for j, (lo, ln) in enumerate(slices)
            ],
        )

        def slice_rows(j: int, lo: int, ln: int):
            # closure factory, NOT a defaulted lambda: PySpark derives the
            # lambda's arity from its FULL parameter list, so `_j=j`
            # defaults would make this a 4-arg callable (the
            # minhash_signature / repetition_ratio trap)
            def entry(x, i):
                return F.struct(
                    F.lit(j).alias("j"),
                    F.col(f"__c{j}").alias("cid"),
                    i.alias("pos"),
                    x.alias("val"),
                )

            return F.transform(F.slice(F.col("e"), lo, ln), entry)

        per_slice = [
            slice_rows(j, lo, ln) for j, (lo, ln) in enumerate(slices)
        ]
        rows = (
            staged.select(F.explode(F.flatten(F.array(*per_slice))).alias("r"))
            .select("r.j", "r.cid", "r.pos", "r.val")
            .groupBy("j", "cid", "pos")
            .agg(F.avg("val").alias("m"))
            .collect()  # slices·k·dim rows — data-size independent
        )
        by_slice: dict = {}
        for r in rows:
            by_slice.setdefault(r["j"], {}).setdefault(r["cid"], {})[
                r["pos"]
            ] = r["m"]
        books = [
            [
                (cid, [dims[p] for p in sorted(dims)])
                for cid, dims in sorted(by_slice.get(j, {}).items())
            ]
            for j in range(len(slices))
        ]
    return books


def kmeans_assigned(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "cluster",
) -> DataFrame:
    """Train ``k`` centroids (see :func:`kmeans_fit`) and return the
    input rows WITH their ``out`` cluster column appended — no
    (id → cluster) join.

    The assignment is a pure expression over the broadcast centroid
    literal, so :func:`kmeans_assign`'s separate (vec_id, cluster) table
    only forces consumers that need the vectors back into a self-join of
    the source on ``id_col`` (scan + broadcast build + join per
    consumer).  Emitting the cluster column in place removes that join
    from every plan that reads it; the cluster VALUES are identical
    (same fold, same centroids, same cast).  (r10 opt round.)"""
    cents = kmeans_fit(emb, k, iters, id_col=id_col, vec_col=vec_col)
    pairs = _dist_pairs(F.col(vec_col).cast("array<double>"), cents)
    return emb.withColumn(
        out, F.array_min(pairs)["cid"].cast("int")
    )


def kmeans_centroid_stats(assigned: DataFrame) -> DataFrame:
    """(cluster, n_members) summary over a kmeans_assign result — the
    sanity view an IVF builder checks for empty/skewed cells."""
    return assigned.groupBy("cluster").agg(
        F.count("*").cast("bigint").alias("n_members")
    )


def logreg_fit(
    df: DataFrame,
    feature_cols: list,
    label_col: str,
    iters: int = 3,
    lr: float = 1.0,
) -> list:
    """Train a logistic-regression quality classifier IN-ENGINE with
    full-batch gradient descent — the fastText-style quality-filter
    training step of a data-curation pipeline (score docs against a
    trusted-source label), expressed in the :func:`kmeans_fit` shape:

    - per iteration, the score ``z = w·x`` is ONE codegen'd expression
      over broadcast weight literals (zero shuffle), and the gradient
      ``g_j = Σ x_j·(y - σ(z)) / n`` is ONE map-side-combined aggregate
      of ``len(features)+1`` sums;
    - driver state is O(features) — data-size independent;
    - deterministic: no RNG (w₀ = 0), full-batch (no sampling), fixed
      iteration count — the trajectory is replayable as unrolled SQL
      (the kmeans oracle pattern), with 6dp rounding absorbing
      engine-level float-sum ordering drift.

    Returns ``[(name, weight), ...]`` with a leading ``bias`` term.
    """
    names = ["bias"] + list(feature_cols)
    w = [0.0] * len(names)
    feats = [F.lit(1.0)] + [F.col(c).cast("double") for c in feature_cols]
    y = F.col(label_col).cast("double")
    n = df.count()
    for _ in range(iters):
        z = feats[0] * F.lit(w[0])
        for wi, xi in zip(w[1:], feats[1:]):
            z = z + xi * F.lit(wi)
        resid = y - F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        row = df.agg(
            *[F.sum(xi * resid).alias(f"g{j}") for j, xi in enumerate(feats)]
        ).collect()[0]
        w = [wj + lr * row[f"g{j}"] / n for j, wj in enumerate(w)]
    return list(zip(names, w))
