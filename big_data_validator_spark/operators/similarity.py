"""Embedding similarity search: brute-force cosine top-k (baseline) and a
random-hyperplane-LSH bucketed variant (scale path).

Everything is expression-level (``zip_with`` / ``aggregate`` higher-order
functions) — no Python UDFs on the hot path.  At 100 TB:

- brute-force is O(|queries| × |corpus|) but shuffle-free when the query
  set is broadcast — right answer for small query batches;
- the LSH variant buckets the corpus once (one projection + one shuffle on
  the bucket key) and only scores within matching buckets; recall is tuned
  by ``num_planes``/``num_tables`` exactly like FAISS-style IVF probes.
"""

from __future__ import annotations

import math
import random
from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from big_data_validator_spark.functions.exprs import cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: Optional[str] = None,
    query_vec_col: Optional[str] = None,
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    The query side is broadcast (it is the small side by construction), so
    the corpus streams through executors without a shuffle; per-query top-k
    uses a rank window partitioned by query id.  Returns
    ``(query_id, vec_id, cosine, rank)``; self-matches excluded.
    """
    from big_data_validator_spark.operators import rebalance_for_compute

    corpus = rebalance_for_compute(corpus)
    query_id_col = query_id_col or id_col
    query_vec_col = query_vec_col or vec_col
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("_qvec"),
        )
    )
    scored = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .join(q, F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(
                cosine_similarity(F.col(vec_col), F.col("_qvec")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _random_hyperplanes(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH (driver-side; tiny)."""
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)
    ]


def lsh_bucket_expr(vec_col: str, planes: Sequence[Sequence[float]]):
    """Bucket id = bit pattern of sign(v·p) over the hyperplanes — a pure
    expression: dot products via ``zip_with``+``aggregate``, packed into a
    long with shift/or.  Interpreted per element (HOF lambdas don't
    codegen) — kept as the Arrow-less reference; the hot path is
    :func:`lsh_buckets_kernel`, one matmul for every table at once."""
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), plane, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket.bitwiseOR(
            F.when(dot >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return bucket


def lsh_buckets_kernel(tables: Sequence[Sequence[Sequence[float]]]):
    """Arrow-batched kernel computing EVERY table's bucket id in one
    ``V @ P.T`` matmul: stack all tables' hyperplanes into a single
    (tables*planes, dim) matrix, take signs, pack each table's bit block
    into a long.  Returns a pandas_udf column: ``array<bigint>`` of
    ``len(tables)`` bucket ids per row.

    Versus :func:`lsh_bucket_expr` this collapses tables×planes
    interpreted array passes per row into one BLAS call per Arrow batch —
    the same ~6× win measured on the MinHash/SimHash kernels."""
    import numpy as np

    from pyspark.sql.pandas.functions import pandas_udf

    num_tables = len(tables)
    num_planes = len(tables[0])
    P = np.array(
        [p for planes in tables for p in planes], dtype=np.float64
    )  # (tables*planes, dim)
    weights = (1 << np.arange(num_planes, dtype=np.int64))  # bit packing

    @pandas_udf("array<bigint>")
    def kernel(vs):
        import pandas as pd

        null_mask = vs.isna()
        if null_mask.all():
            return pd.Series([None] * len(vs))
        V = np.stack(
            [
                np.zeros(P.shape[1]) if m else np.asarray(v, dtype=np.float64)
                for v, m in zip(vs, null_mask)
            ]
        )
        signs = (V @ P.T) >= 0.0  # same >= 0 rule as the expr path
        buckets = (
            signs.reshape(len(vs), num_tables, num_planes).astype(np.int64)
            * weights
        ).sum(axis=2)
        out = pd.Series(list(buckets))
        out[null_mask] = None
        return out

    return kernel


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing an LSH bucket
    with the query in at least one of ``num_tables`` hash tables.

    Candidate generation joins on (table, bucket) — equi-join, shuffle of
    (id, bucket) pairs only.  Recall rises with tables, cost with
    2^-num_planes bucket occupancy; defaults give ~0.9 recall on 64-d
    Gaussian data (pinned by tests against :func:`brute_force_topk`).
    Returns ``(query_id, vec_id, cosine, rank)``.
    """
    from big_data_validator_spark.operators import rebalance_for_compute

    corpus = rebalance_for_compute(corpus)
    tables = [
        _random_hyperplanes(dim, num_planes, seed + 1000 * t)
        for t in range(num_tables)
    ]
    kernel = lsh_buckets_kernel(tables)

    def bucketize(df: DataFrame, idc: str) -> DataFrame:
        return (
            df.select(
                F.col(idc),
                F.col(vec_col),
                F.posexplode(kernel(vec_col)).alias("table", "bucket"),
            )
        )

    cb = bucketize(corpus, id_col)
    qb = bucketize(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col)),
        "query_id",
    ).withColumnRenamed(vec_col, "_qvec")

    cands = (
        cb.join(F.broadcast(qb), ["table", "bucket"])
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, vec_col, "_qvec")
        .dropDuplicates(["query_id", id_col])
    )
    scored = cands.select(
        "query_id",
        id_col,
        F.round(cosine_similarity(F.col(vec_col), F.col("_qvec")), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _train_centroids_kmeans(
    vectors, num_centroids: int, iters: int = 8, seed: int = 42
):
    """Driver-side mini k-means over a bounded sample (numpy, deterministic
    seed + fixed iterations).  The sample is small by construction — the
    coarse quantizer needs only the shape of the distribution, not the
    data; FAISS trains IVF the same way."""
    import numpy as np

    X = np.asarray(vectors, dtype=np.float64)
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(X), size=min(num_centroids, len(X)), replace=False)
    C = X[idx].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
    return C


def ivf_assign_kernel(centroids, nprobe: int):
    """Arrow kernel: nearest-``nprobe`` centroid ids per vector (one
    distance matmul per batch).  ``nprobe=1`` assigns corpus cells;
    queries probe several cells to recover recall at the cell boundary —
    the classic IVF trade-off."""
    import numpy as np

    from pyspark.sql.pandas.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    cn2 = (C**2).sum(axis=1)

    @pandas_udf("array<int>")
    def kernel(vs):
        import pandas as pd

        out = []
        for v in vs:
            if v is None:
                out.append(None)
                continue
            x = np.asarray(v, dtype=np.float64)
            d2 = cn2 - 2 * (C @ x)  # ||c||² - 2c·x (+||x||² is rank-free)
            out.append(np.argsort(d2, kind="stable")[:nprobe].astype(np.int32))
        return pd.Series(out)

    return kernel


def ivf_train(
    corpus: DataFrame,
    num_centroids: int = 16,
    train_sample: int = 1024,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train the IVF coarse quantizer from a bounded deterministic sample.

    Split out of :func:`ivf_ann_topk` so an audit running SEVERAL probe
    settings over one corpus trains (and collects) ONCE — the training
    collect is a whole Spark job, and at audit-query granularity job count
    dominates wall-clock long before data size does (BENCH r4).
    """
    # deterministic bounded sample: orderBy+limit plans as a distributed
    # top-k (TakeOrderedAndProject), so the training set is stable across
    # runs/partitionings — a bare limit() picks whichever tasks finish
    # first, which would make centroids (and ANN recall) run-dependent
    sample = [
        r[1]
        for r in corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(train_sample)
        .collect()
    ]
    return _train_centroids_kmeans(sample, num_centroids, seed=seed)


def ivf_assign_cells(
    corpus: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Arrow matmul pass assigning every corpus vector its nearest
    cell — shareable across any number of probe settings."""
    assign1 = ivf_assign_kernel(centroids, 1)
    return corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.element_at(assign1(vec_col), 1).alias("cell"),
    )


def ivf_probe_topk(
    cells: DataFrame,
    queries: DataFrame,
    centroids,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Score each query against the ``nprobe`` nearest cells of a
    pre-assigned corpus (:func:`ivf_assign_cells`)."""
    assignN = ivf_assign_kernel(centroids, nprobe)
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.explode(assignN(vec_col)).alias("cell"),
    )
    cands = (
        cells.join(F.broadcast(qb), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, vec_col, "_qvec")
    )
    scored = cands.select(
        "query_id",
        id_col,
        F.round(cosine_similarity(F.col(vec_col), F.col("_qvec")), 6).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    train_sample: int = 1024,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: coarse k-means quantizer partitions the
    corpus into cells; each query scores only the ``nprobe`` nearest cells.

    At 100 TB: centroid training reads a bounded sample (driver-side
    k-means over ≤``train_sample`` vectors), cell assignment is one Arrow
    matmul pass, and the probe join is an equi-join on cell id — shuffle
    volume O(n) cell tuples, never O(n²) pairs.  Expected scan fraction is
    ``nprobe/num_centroids`` of the corpus per query, the standard IVF
    trade-off.  Returns ``(query_id, vec_id, cosine, rank)``; rows-only
    (sampling + float iteration make it engine-specific), recall pinned in
    pytest against :func:`brute_force_topk`.

    Composition of :func:`ivf_train` → :func:`ivf_assign_cells` →
    :func:`ivf_probe_topk`; call the pieces directly to share the
    quantizer across probe settings.
    """
    from big_data_validator_spark.operators import rebalance_for_compute

    corpus = rebalance_for_compute(corpus)
    centroids = ivf_train(
        corpus, num_centroids, train_sample, seed, id_col, vec_col
    )
    cells = ivf_assign_cells(corpus, centroids, id_col, vec_col)
    return ivf_probe_topk(cells, queries, centroids, nprobe, k, id_col, vec_col)


def pq_train(
    corpus: DataFrame,
    dim: int,
    num_subspaces: int = 8,
    codes_per_subspace: int = 16,
    train_sample: int = 1024,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Train product-quantization codebooks: split the vector into
    ``num_subspaces`` contiguous blocks and k-means each block
    independently over a bounded deterministic sample (same
    bounded-driver-work pattern as :func:`ivf_train`).

    Returns a ``(num_subspaces, codes_per_subspace, dim/num_subspaces)``
    numpy array.  PQ is the memory-side scale lever the hash/cell indexes
    don't give: an encoded vector is ``num_subspaces`` small ints
    (8 bytes at the defaults) instead of ``4·dim`` float bytes — at
    100 TB of embeddings that is the difference between a scored scan
    that fits executor memory and one that doesn't.  Vectors are
    L2-normalized before training/encoding so minimum squared distance
    equals maximum cosine (monotonic equivalence on the unit sphere).
    """
    import numpy as np

    if dim % num_subspaces != 0:
        raise ValueError("dim must divide evenly into num_subspaces")
    sample = [
        r[1]
        for r in corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(train_sample)
        .collect()
    ]
    X = np.asarray(sample, dtype=np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    dsub = dim // num_subspaces
    books = [
        _train_centroids_kmeans(
            X[:, s * dsub : (s + 1) * dsub], codes_per_subspace, seed=seed + s
        )
        for s in range(num_subspaces)
    ]
    return np.stack(books)


def pq_encode_kernel(codebooks):
    """Arrow kernel: nearest-centroid code per subspace — one distance
    matmul per (batch, subspace).  Output ``array<int>`` of codes."""
    import numpy as np

    from pyspark.sql.pandas.functions import pandas_udf

    B = np.asarray(codebooks, dtype=np.float64)  # (m, k, dsub)
    m, _, dsub = B.shape
    bn2 = (B**2).sum(axis=2)  # (m, k)

    @pandas_udf("array<int>")
    def kernel(vs):
        import pandas as pd

        out = []
        for v in vs:
            if v is None:
                out.append(None)
                continue
            x = np.asarray(v, dtype=np.float64)
            x = x / max(np.linalg.norm(x), 1e-12)
            xs = x.reshape(m, dsub)  # (m, dsub)
            # ||c||² - 2c·x per subspace; ||x||² is rank-free
            d2 = bn2 - 2 * np.einsum("mkd,md->mk", B, xs)
            out.append(d2.argmin(axis=1).astype(np.int32))
        return pd.Series(out)

    return kernel


def pq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_subspaces: int = 8,
    codes_per_subspace: int = 16,
    train_sample: int = 1024,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance top-k: encode the corpus once (tiny codes),
    score each (query, code) pair by summing per-subspace lookup-table
    entries — queries stay full-precision, the corpus never needs its
    floats again after encoding.

    The LUT per query is ``num_subspaces × codes_per_subspace`` doubles —
    broadcast with the query set; scoring is a pure expression over the
    code array (``aggregate`` over zipped LUT slices), JVM-side, no
    Python in the scoring scan.  Returns ``(query_id, vec_id, adc_score,
    rank)`` where higher ``adc_score`` ≈ higher cosine; rows-only
    (k-means codebooks are engine-specific), recall pinned in pytest
    against :func:`brute_force_topk`.
    """
    import numpy as np

    from big_data_validator_spark.operators import rebalance_for_compute

    corpus = rebalance_for_compute(corpus)
    books = pq_train(
        corpus, dim, num_subspaces, codes_per_subspace, train_sample, seed,
        id_col, vec_col,
    )
    encode = pq_encode_kernel(books)
    coded = corpus.select(F.col(id_col), encode(vec_col).alias("_codes"))

    B = np.asarray(books)  # (m, k, dsub)
    m, kc, dsub = B.shape

    # per-query LUT of NEGATED squared distances (so bigger = closer),
    # flattened to one literal array the scoring expression indexes into:
    # lut[s*kc + code] — built driver-side from the collected query set
    # (the query side is small by construction, same as brute force)
    qrows = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    ).collect()
    lut_rows = []
    for r in qrows:
        x = np.asarray(r["_qvec"], dtype=np.float64)
        x = x / max(np.linalg.norm(x), 1e-12)
        xs = x.reshape(m, dsub)
        d2 = (B**2).sum(axis=2) - 2 * np.einsum("mkd,md->mk", B, xs)
        lut_rows.append((r["query_id"], [float(v) for v in (-d2).ravel()]))
    spark = corpus.sparkSession
    luts = F.broadcast(
        spark.createDataFrame(lut_rows, "query_id long, _lut array<double>")
    )

    # ADC score = Σ_s lut[s*kc + code_s]: aggregate over the code array
    # with its position — JVM expression, codegen'd, no Python per row
    scored = (
        coded.join(luts, F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            id_col,
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("_codes"),
                        F.sequence(F.lit(0), F.lit(m - 1)),
                        lambda code, s: F.element_at(
                            F.col("_lut"), s * kc + code + 1
                        ),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                6,
            ).alias("adc_score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    num_planes: int = 10,
    num_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: Optional[int] = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (LSH-bucketed): pairs sharing a
    bucket in any table, verified by exact cosine ≥ threshold.
    Returns ``(id_a, id_b, cosine)`` with ``id_a < id_b``.

    The per-bucket self-join goes through
    :func:`~big_data_validator_spark.operators.dedup.capped_bucket_pairs`
    — the same skew guard every text-dedup LSH self-join here uses: a
    degenerate corpus (thousands of identical embeddings) collapses into
    one (table, bucket) key and an uncapped join would emit O(size²)
    shuffle rows; oversized buckets degrade to O(size) leader edges,
    which keeps the candidate graph connected for downstream clustering.
    ``max_bucket_size=None`` restores exact all-pairs enumeration.
    """
    from big_data_validator_spark.operators import rebalance_for_compute
    from big_data_validator_spark.operators.dedup import capped_bucket_pairs

    df = rebalance_for_compute(df)
    tables = [
        _random_hyperplanes(dim, num_planes, seed + 1000 * t)
        for t in range(num_tables)
    ]
    kernel = lsh_buckets_kernel(tables)
    b = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.posexplode(kernel(vec_col)).alias("table", "bucket"),
    )
    pairs = capped_bucket_pairs(
        b, ["table", "bucket"], max_bucket_size, payload_cols=["vec"]
    )
    out = (
        pairs.dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity(F.col("vec_a"), F.col("vec_b")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    from big_data_validator_spark.operators.dedup import pinned_caches

    out._bdv_pinned = pinned_caches(pairs)
    return out


# ----------------------------------------------- exact-integer near-dup

def quantized_hyperplanes(
    dim: int,
    num_planes: int,
    seed: int,
    scale: int = 10_000,
) -> list[list[int]]:
    """:func:`_random_hyperplanes` quantized to integer units — the
    bucketing geometry for the EXACT-INTEGER near-dup path, where every
    arithmetic step must be bit-reproducible by any engine (half-up
    rounding happens once, driver-side, in Python)."""
    return [
        [int(round(x * scale)) for x in plane]
        for plane in _random_hyperplanes(dim, num_planes, seed)
    ]


def int_lsh_buckets_kernel(tables: Sequence[Sequence[Sequence[int]]]):
    """Integer twin of :func:`lsh_buckets_kernel`: one int64 matmul per
    Arrow batch over PRE-QUANTIZED vectors.  int64 matrix products are
    EXACT (no FMA, no reassociation error — integer adds commute), so
    the resulting sign pattern is reproducible by any engine summing the
    same integers in any order; magnitudes are bounded by construction
    (|q| ≤ ~1e5, |plane| ≤ ~1e5, dim ≤ 4096 keeps sums < 2^63)."""
    import numpy as np

    from pyspark.sql.pandas.functions import pandas_udf

    num_tables = len(tables)
    num_planes = len(tables[0])
    P = np.array(
        [p for planes in tables for p in planes], dtype=np.int64
    )  # (tables*planes, dim)
    weights = 1 << np.arange(num_planes, dtype=np.int64)

    @pandas_udf("array<bigint>")
    def kernel(vs):
        import pandas as pd

        null_mask = vs.isna()
        if null_mask.all():
            return pd.Series([None] * len(vs))
        V = np.stack(
            [
                np.zeros(P.shape[1], dtype=np.int64)
                if m
                else np.asarray(v, dtype=np.int64)
                for v, m in zip(vs, null_mask)
            ]
        )
        signs = (V @ P.T) >= 0  # same >= 0 rule as the float path
        buckets = (
            signs.reshape(len(vs), num_tables, num_planes).astype(np.int64)
            * weights
        ).sum(axis=2)
        out = pd.Series(list(buckets))
        out[null_mask] = None
        return out

    return kernel


def _int_dot(a, b):
    """Exact integer dot product of two ``array<bigint>`` columns as
    DECIMAL(38,0) — expression-level, codegen-friendly, reproducible."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    ).cast("decimal(38,0)")


def quantize_vec(vec_col, scale: int):
    """``floor(x * scale)`` per component as ``array<bigint>``.  floor of
    the IEEE double product is engine-portable (the multiply is a single
    rounding, identical everywhere), unlike half-up rounding, which
    DuckDB applies to the binary value but Spark to the shortest decimal
    repr — ties flip between them."""
    return F.transform(
        vec_col.cast("array<double>"),
        lambda x: F.floor(x * F.lit(float(scale))).cast("long"),
    )


def embedding_near_dup_pairs_exactint(
    df: DataFrame,
    dim: int,
    threshold_ppm: int = 950_000,
    num_planes: int = 10,
    num_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant_scale: int = 100_000,
    plane_scale: int = 10_000,
    max_bucket_size: Optional[int] = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with EXACT integer
    semantics end-to-end — the oracle-checkable twin of
    :func:`embedding_near_dup_pairs` (VERDICT r6 item 1).

    Every step after the one driver-side hyperplane quantization is
    integer arithmetic, so ANY engine reproduces the output bit-exactly
    (no FMA/reassociation hazard):

    1. quantize: ``q[i] = floor(embedding[i] * quant_scale)`` (int64);
    2. bucket:   sign pattern of ``q · plane_int`` per table — int64
       matmul in an Arrow kernel (:func:`int_lsh_buckets_kernel`);
    3. candidates: per-(table, bucket) self-join (same
       ``capped_bucket_pairs`` skew guard as the float path);
    4. verify: ``cos(a, b) >= threshold_ppm / 1e6`` decided WITHOUT
       sqrt or division: ``dot > 0  AND  dot² · 10¹²  >=
       threshold_ppm² · |a|² · |b|²`` in DECIMAL(38,0) — with
       ``quant_scale = 1e5`` and 64 dims the extreme magnitudes are
       ~3e34, inside DECIMAL(38,0) and DuckDB's HUGEINT.

    Returns ``(id_a, id_b, dot_q, na2, nb2)`` with ``id_a < id_b`` —
    all exact integers (the cosine itself is irrational; consumers
    needing it compute ``dot_q / sqrt(na2 * nb2)``).

    Scale shape is identical to the float path: one projection + one
    shuffle on the bucket key, capped per-bucket self-join, no
    all-pairs work.  The quantization wobble (~1e-5 per component)
    only moves pairs whose true cosine sits within ~1e-4 of the
    threshold — and moves them identically in every engine, which is
    the point.
    """
    from big_data_validator_spark.operators import rebalance_for_compute
    from big_data_validator_spark.operators.dedup import (
        capped_bucket_pairs,
        pinned_caches,
    )

    # ADVICE r7: both verify-predicate extremes — dot²·10¹² and
    # t_ppm²·na²·nb² — are bounded by (dim·quant_scale²)²·10¹² for
    # unit-range components; past DECIMAL(38,0) the non-ANSI products
    # NULL out and the filter silently drops EVERY pair.  Refuse the
    # parameter combination loudly instead (dim·quant_scale² < 1e13,
    # i.e. dim < ~1000 at the default quant_scale — the docstring's
    # 4096-dim case needs quant_scale ≤ ~4e4).
    if (dim * quant_scale * quant_scale) ** 2 * 10**12 >= 10**38:
        raise ValueError(
            "embedding_near_dup_pairs_exactint: dim * quant_scale**2 = "
            f"{dim * quant_scale * quant_scale:.3g} >= 1e13 pushes the "
            "exact verify products past DECIMAL(38,0) (they would NULL "
            "out and drop all pairs); lower quant_scale — precision is "
            "~1/quant_scale per component — or reduce dim"
        )
    df = rebalance_for_compute(df)
    tables = [
        quantized_hyperplanes(dim, num_planes, seed + 1000 * t, plane_scale)
        for t in range(num_tables)
    ]
    kernel = int_lsh_buckets_kernel(tables)
    q = df.select(
        F.col(id_col).alias("id"),
        quantize_vec(F.col(vec_col), quant_scale).alias("qv"),
    )
    b = q.select(
        "id",
        "qv",
        F.posexplode(kernel("qv")).alias("table", "bucket"),
    )
    pairs = capped_bucket_pairs(
        b, ["table", "bucket"], max_bucket_size, payload_cols=["qv"]
    )
    dot = _int_dot(F.col("qv_a"), F.col("qv_b"))
    na2 = _int_dot(F.col("qv_a"), F.col("qv_a"))
    nb2 = _int_dot(F.col("qv_b"), F.col("qv_b"))
    t2 = F.lit(threshold_ppm * threshold_ppm).cast("decimal(13,0)")
    out = (
        pairs.dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            dot.alias("dot"),
            na2.alias("na2"),
            nb2.alias("nb2"),
        )
        .filter(
            (F.col("dot") > 0)
            & (
                (F.col("dot") * F.col("dot")) * F.lit(10**12).cast("decimal(13,0)")
                >= t2 * F.col("na2") * F.col("nb2")
            )
        )
        .select(
            "id_a",
            "id_b",
            F.col("dot").cast("long").alias("dot_q"),
            F.col("na2").cast("long").alias("na2"),
            F.col("nb2").cast("long").alias("nb2"),
        )
    )
    out._bdv_pinned = pinned_caches(pairs)
    return out


def ann_topk_exactint(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 8,
    num_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant_scale: int = 100_000,
    plane_scale: int = 10_000,
) -> DataFrame:
    """LSH ANN top-k with EXACT cross-engine semantics — the
    oracle-checkable sibling of :func:`lsh_ann_topk` (whose float
    buckets/scores are hash-stable only within one engine).

    Same integer contract as
    :func:`embedding_near_dup_pairs_exactint`: vectors floor-quantized
    to 1/``quant_scale`` units, buckets from int64 sign patterns
    (:func:`int_lsh_buckets_kernel`), candidates = corpus rows sharing
    ≥1 (table, bucket) with a query.  The COSINE itself is then safe as
    a double: ``dot``, ``|a|²``, ``|b|²`` are exact integers, and
    ``dot / sqrt(|a|²·|b|²)`` is two correctly-rounded IEEE ops on a
    once-rounded product — bit-identical in every conforming engine, so
    the per-query ORDER BY over it (ties broken by id) is too.  The
    emitted score is ``floor(cosine · 1e6)`` (floor of identical
    doubles; ``round`` would re-open the shortest-repr-vs-binary trap).

    Scale shape: corpus bucketed in one Arrow pass + one shuffle on the
    bucket key; the query side is tiny and broadcasts; scoring touches
    only candidate rows (never |queries| × |corpus|).  Zero-norm
    vectors (all components under the quantization floor) are excluded
    — cosine is undefined for them.

    Returns ``(query_id, {id_col}, cosine_e6, rank)`` with
    ``rank <= k``.
    """
    from big_data_validator_spark.operators import rebalance_for_compute

    corpus = rebalance_for_compute(corpus)
    tables = [
        quantized_hyperplanes(dim, num_planes, seed + 1000 * t, plane_scale)
        for t in range(num_tables)
    ]
    kernel = int_lsh_buckets_kernel(tables)

    def bucketize(df: DataFrame, out_id: str) -> DataFrame:
        q = df.select(
            F.col(id_col).alias(out_id),
            quantize_vec(F.col(vec_col), quant_scale).alias(f"_qv_{out_id}"),
        )
        return q.select(
            out_id,
            f"_qv_{out_id}",
            F.posexplode(kernel(f"_qv_{out_id}")).alias("table", "bucket"),
        )

    bc = bucketize(corpus, "cand_id")
    bq = bucketize(queries, "query_id")
    cand = (
        bc.join(
            F.broadcast(bq.select("query_id", "_qv_query_id", "table", "bucket")),
            ["table", "bucket"],
        )
        .select("query_id", "cand_id", "_qv_query_id", "_qv_cand_id")
        .dropDuplicates(["query_id", "cand_id"])
    )
    dot = _int_dot(F.col("_qv_cand_id"), F.col("_qv_query_id")).cast("double")
    na2 = _int_dot(F.col("_qv_cand_id"), F.col("_qv_cand_id")).cast("double")
    nb2 = _int_dot(F.col("_qv_query_id"), F.col("_qv_query_id")).cast("double")
    scored = cand.select(
        "query_id",
        F.col("cand_id").alias(id_col),
        (dot / F.sqrt(na2 * nb2)).alias("_cos"),
        na2.alias("_na2"),
        nb2.alias("_nb2"),
    ).filter((F.col("_na2") > 0) & (F.col("_nb2") > 0))
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            F.floor(F.col("_cos") * F.lit(1_000_000.0))
            .cast("long")
            .alias("cosine_e6"),
            "rank",
        )
    )


# ------------------------------------------------------------- SemDeDup

def _tdiv(a: int, b: int) -> int:
    """Integer division TRUNCATING toward zero — the semantics Spark's
    ``div`` (Java) and DuckDB's BIGINT ``//`` share.  Python's ``//``
    floors instead (−7 // 2 = −4, not −3), so the driver-side k-means
    below must not use it: centroid components are routinely negative
    and a one-unit centroid difference cascades into different
    assignments, silently breaking the generated oracle."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _int_d2(qv: Sequence[int], cv: Sequence[int]) -> int:
    """Rank-equivalent squared L2 distance ``|c|² − 2·q·c`` (the
    ``|q|²`` term is constant per vector and never affects the argmin
    — the same rank-free form :func:`ivf_assign_kernel` uses)."""
    cc = sum(c * c for c in cv)
    qc = sum(q * c for q, c in zip(qv, cv))
    return cc - 2 * qc


def _assert_int64_matmul_exact(max_x: int, max_c: int, dim: int) -> None:
    """Fail LOUDLY if the rank-free distance ``|c|² − 2·q·c`` could
    exceed int64 — np.int64 wraps silently on overflow, and the whole
    exact-integer contract (Spark kernel == overflow-checked DuckDB
    oracle) rests on every intermediate staying below 2**63 (ADVICE
    r10: the |component| <= quant_scale assumption was stated in a
    comment but never validated, so an unnormalized embedding could
    produce silently-wrong centroids)."""
    bound = dim * max_c * (max_c + 2 * max_x)
    if bound >= 2**62:
        raise ValueError(
            "int64 distance kernel would overflow: dim * maxC * "
            f"(maxC + 2*maxX) = {bound} >= 2**62 (dim={dim}, "
            f"max|x|={max_x}, max|c|={max_c}); normalize or use a "
            "smaller quant_scale"
        )


def train_centroids_exactint(
    sample: Sequence, num_centroids: int, iters: int = 2
) -> list:
    """Deterministic INTEGER k-means over a bounded sample — the coarse
    quantizer for :func:`semantic_dedup_exactint`, designed so a SQL
    engine reproduces the exact same centroids from the same data
    (which is what lets the entry's oracle TRAIN ITSELF as unrolled
    CTEs instead of receiving data-dependent literals):

    - ``sample`` is ``[(id, qv)]`` with integer-quantized vectors,
      ordered by id (the caller's ``ORDER BY id LIMIT n`` makes the
      set engine-portable);
    - init = the first ``num_centroids`` vectors (no RNG);
    - assignment = argmin of the integer ``|c|² − 2·q·c`` with ties to
      the LOWEST centroid id;
    - update = element-wise ``sum div count`` with TRUNCATING division
      (:func:`_tdiv` — Spark ``div`` / DuckDB ``//`` semantics);
      empty clusters keep their previous centroid.

    Every operation is exact integer arithmetic, so any engine that
    replays these rules gets bit-identical centroids — float k-means
    can never cross that bridge (sum order changes the means).
    """
    import numpy as np

    pts = [list(map(int, qv)) for _, qv in sample]
    if not pts:
        raise ValueError("empty training sample")
    k = min(num_centroids, len(pts))
    dim = len(pts[0])
    # int64 matmul is exact here: |component| <= quant_scale (1e5), so a
    # dim<=1e4 dot product stays far below 2**63 — which is what lets
    # the assignment step vectorize (auto-k runs k in the hundreds; the
    # former pure-python argmin loop was O(sample*k*dim) interpreter
    # ops, and tests/test_semantic_dedup.py pins parity with the
    # from-scratch reference rules).
    X = np.asarray(pts, dtype=np.int64)
    # centroids are truncated means of sample points, so |c| <= max|x|
    # for every iteration — one guard covers the whole loop; the
    # per-cluster sums are bounded by n * max|x| and checked too
    mx = int(np.abs(X).max()) if X.size else 0
    _assert_int64_matmul_exact(mx, mx, dim)
    if len(pts) * mx >= 2**62:
        raise ValueError(
            f"int64 centroid-sum would overflow: n*max|x| = "
            f"{len(pts) * mx} >= 2**62"
        )
    cents = [list(p) for p in pts[:k]]
    for _ in range(iters):
        C = np.asarray(cents, dtype=np.int64)
        # rank-free |c|^2 - 2 q.c; np.argmin takes the FIRST minimum,
        # which is exactly the ties-to-lowest-cid rule
        d2 = (C * C).sum(axis=1)[None, :] - 2 * (X @ C.T)
        best = d2.argmin(axis=1)
        counts = np.bincount(best, minlength=k)
        sums = np.zeros((k, dim), dtype=np.int64)
        np.add.at(sums, best, X)
        cents = [
            [_tdiv(int(sums[j][i]), int(counts[j])) for i in range(dim)]
            if counts[j]
            else cents[j]
            for j in range(k)
        ]
    return cents


def int_assign_kernel(centroids: Sequence[Sequence[int]]):
    """Arrow kernel assigning each integer-quantized vector its nearest
    centroid (int64 matmul, argmin with ties to the lowest id — numpy's
    argmin picks the first minimum).  Pure map-side: no shuffle, no
    crossJoin; the centroid matrix rides the closure."""
    import numpy as np

    from pyspark.sql.pandas.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.int64)
    cn2 = (C * C).sum(axis=1)
    mc = int(np.abs(C).max()) if C.size else 0

    @pandas_udf("int")
    def kernel(qvs):
        import pandas as pd

        mask = qvs.notna()
        out = pd.Series([None] * len(qvs), dtype="Int32")
        if mask.any():
            # one batched int64 matmul per Arrow batch instead of a
            # per-row loop — auto-k runs k in the hundreds, and the
            # batch matmul keeps assignment a BLAS call; exactness is
            # ASSERTED per batch, not assumed (np.int64 wraps silently)
            X = np.asarray(list(qvs[mask]), dtype=np.int64)
            _assert_int64_matmul_exact(
                int(np.abs(X).max()), mc, X.shape[1]
            )
            d2 = cn2[None, :] - 2 * (X @ C.T)
            out[mask] = d2.argmin(axis=1).astype("int32")
        return out

    return kernel


def two_level_assign_kernel(
    centroids: Sequence[Sequence[int]],
    supercells: Sequence[Sequence[int]],
    centroid_supercell: Sequence[int],
):
    """Arrow kernel for TWO-LEVEL assignment (the IVF shape): nearest
    non-empty supercell first (``m`` dot products), then nearest
    centroid among THAT supercell's members only — cutting per-point
    work from ``k`` to ``m + k/m`` dot products, the device that keeps
    assignment sub-``n·k`` once auto-k pushes k into the thousands.
    All ties go to the lowest id (np.argmin takes the first minimum;
    member lists are sorted ascending).  Returns the final centroid id
    (the dedup cell) — points in different supercells can never share
    a cell, because a cell's members live in exactly one supercell."""
    import numpy as np

    from pyspark.sql.pandas.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.int64)
    members: dict[int, list[int]] = {}
    for cid, s in enumerate(centroid_supercell):
        members.setdefault(int(s), []).append(cid)
    # only supercells that own at least one centroid are assignable;
    # ties resolve to the lowest ORIGINAL scid among the non-empty
    live = sorted(members)
    S = np.asarray([supercells[s] for s in live], dtype=np.int64)
    sn2 = (S * S).sum(axis=1)
    mem_idx = {
        pos: np.asarray(sorted(members[s]), dtype=np.int64)
        for pos, s in enumerate(live)
    }
    mc = max(
        int(np.abs(C).max()) if C.size else 0,
        int(np.abs(S).max()) if S.size else 0,
    )

    @pandas_udf("int")
    def kernel(qvs):
        import pandas as pd

        mask = qvs.notna()
        out = pd.Series([None] * len(qvs), dtype="Int32")
        if mask.any():
            X = np.asarray(list(qvs[mask]), dtype=np.int64)
            _assert_int64_matmul_exact(
                int(np.abs(X).max()), mc, X.shape[1]
            )
            sup = (sn2[None, :] - 2 * (X @ S.T)).argmin(axis=1)
            cells = np.empty(len(X), dtype=np.int64)
            for pos in np.unique(sup):
                rows = np.where(sup == pos)[0]
                mids = mem_idx[int(pos)]
                Cm = C[mids]
                d2 = (Cm * Cm).sum(axis=1)[None, :] - 2 * (
                    X[rows] @ Cm.T
                )
                cells[rows] = mids[d2.argmin(axis=1)]
            out[mask] = cells.astype("int32")
        return out

    return kernel


def semantic_dedup_exactint(
    df: DataFrame,
    dim: int,
    num_clusters: int = 8,
    threshold_ppm: int = 300_000,
    kmeans_iters: int = 2,
    train_sample: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant_scale: int = 100_000,
    max_cluster_size: Optional[int] = None,
    target_cluster_size: Optional[int] = None,
    train_oversample: int = 4,
    train_sample_cap: int = 65_536,
    supercell_size: Optional[int] = None,
) -> DataFrame:
    """SemDeDup-style embedding-cluster dedup (VERDICT r8 item 5): the
    SEMANTIC tier above lexical MinHash/SimHash — cluster the corpus
    with a coarse k-means quantizer, compare pairs WITHIN a cluster
    only, and prune every item that has a smaller-id semantic
    duplicate (cosine ≥ threshold), keeping one representative per
    duplicate set.  This is the cluster-then-prune shape LLM corpus
    curation runs (SemDeDup, Abbas et al. 2023, arXiv:2303.09540):
    candidate generation is |cluster|²-bounded, never corpus².

    Exact-integer contract end-to-end (the
    :func:`embedding_near_dup_pairs_exactint` discipline):

    - vectors floor-quantized to 1/``quant_scale`` units;
    - the k-means trainer is :func:`train_centroids_exactint` over the
      ``train_sample`` smallest ids — integer arithmetic with
      truncating division, so a SQL oracle RETRAINS the identical
      centroids from the parquet data (no data-dependent literals);
    - full-corpus assignment via :func:`int_assign_kernel` (map-side
      Arrow int64 matmul, ties to lowest centroid id);
    - within-cluster candidate pairs through
      :func:`~big_data_validator_spark.operators.dedup.capped_bucket_pairs`
      (the repo-wide skew guard; the within-cluster-only discipline is
      pinned in tests);
    - the duplicate verdict is the sqrt-free integer predicate
      ``dot > 0 ∧ dot²·10¹² ≥ t_ppm²·|a|²·|b|²`` in DECIMAL(38,0).

    Returns one row per input vector: ``({id_col}, cell, keep)`` —
    ``keep = false`` iff a smaller-id within-cluster duplicate exists.

    Scale: training is a bounded deterministic collect (the
    :func:`ivf_train` device); assignment is one Arrow pass; the pair
    stage shuffles on the cluster id with the per-cluster cap guarding
    degenerate corpora; at 100 TB raise ``num_clusters`` so clusters
    stay pair-join-sized (SemDeDup runs k in the tens of thousands).

    **Auto-k (VERDICT r9 item 2)**: pass ``target_cluster_size`` to
    make the cluster count scale WITH the corpus instead of the
    clusters —

    - ``k = ceil(n / target_cluster_size)`` (one count job),
    - training sample = ``min(n, train_oversample·k,
      train_sample_cap)``, still an id-ordered deterministic collect,
    - ``num_clusters`` / ``train_sample`` are ignored.

    This is what makes the pair stage LINEAR in n: cluster population
    stays ~``target_cluster_size`` at any scale, so candidate pairs are
    ``O(n·target)`` instead of the fixed-k ``O(n²/k)``.  The oracle can
    still retrain the identical quantizer because both ``k`` and the
    sample size are integer functions of ``COUNT(*)`` (data-dependent
    LIMITs, no literals).  The residual superlinear term is assignment
    (``n·k`` int64 FLOPs, a batched matmul) — killed by the TWO-LEVEL
    mode below; ``train_sample_cap`` bounds the driver collect and
    clamps k once it binds.

    **Two-level quantizer** (the published SemDeDup/IVF answer to
    assignment cost): pass ``supercell_size`` to train
    ``m = ceil(k / supercell_size)`` SUPERCELLS over the centroids
    (same exact-integer trainer, driver-side — the input is only k
    rows), map each centroid to its nearest supercell, and assign
    points in two hops: nearest non-empty supercell (m dots), then
    nearest centroid among that supercell's members (~supercell_size
    dots) — ``m + k/m`` per point instead of ``k``.  This CHANGES the
    partition (it is the IVF approximation, not a shortcut), so the
    oracle retrains the supercells and replays the two-hop rule with
    the same exact-integer arithmetic; the within-cluster pair stage
    is unchanged.
    """
    from big_data_validator_spark.operators import rebalance_for_compute
    from big_data_validator_spark.operators.dedup import (
        capped_bucket_pairs,
        pinned_caches,
    )

    if (dim * quant_scale * quant_scale) ** 2 * 10**12 >= 10**38:
        raise ValueError(
            "semantic_dedup_exactint: dim * quant_scale**2 = "
            f"{dim * quant_scale * quant_scale:.3g} >= 1e13 pushes the "
            "exact verify products past DECIMAL(38,0); lower quant_scale"
        )
    df = rebalance_for_compute(df)
    q = df.select(
        F.col(id_col).alias("id"),
        quantize_vec(F.col(vec_col), quant_scale).alias("qv"),
    )
    if target_cluster_size is not None:
        # auto-k: k and the sample size are integer functions of n so
        # the generated oracle recomputes them from COUNT(*) — keep
        # these three lines in lockstep with the oracle's kk CTE
        n = q.count()
        k0 = (n + target_cluster_size - 1) // target_cluster_size
        train_sample = min(n, train_oversample * k0, train_sample_cap)
        num_clusters = min(k0, train_sample)
    # bounded deterministic training collect (TakeOrderedAndProject —
    # the ivf_train device); quantized in-plan so the sample is the
    # same integers the oracle's SQL quantization produces
    sample = [
        (r["id"], r["qv"])
        for r in q.orderBy("id").limit(train_sample).collect()
    ]
    cents = train_centroids_exactint(
        sample, num_clusters, iters=kmeans_iters
    )
    if supercell_size is not None:
        # two-level: supercells trained over the CENTROIDS (k tiny
        # rows, pure driver), each centroid mapped to its nearest
        # supercell, points assigned supercell-first — keep these
        # rules in lockstep with the oracle's sc*/ca/ps CTEs
        m = (len(cents) + supercell_size - 1) // supercell_size
        sups = train_centroids_exactint(
            list(enumerate(cents)), m, iters=kmeans_iters
        )
        c2s = [
            min(
                range(len(sups)),
                key=lambda s: (_int_d2(cents[j], sups[s]), s),
            )
            for j in range(len(cents))
        ]
        assigner = two_level_assign_kernel(cents, sups, c2s)
    else:
        assigner = int_assign_kernel(cents)
    # Persist the assigned frame: it feeds BOTH legs of the
    # within-cluster pair self-join AND the final keep/prune re-join,
    # and without the pin each consumer re-runs the quantize+assign
    # Arrow kernels over a fresh corpus scan (the r13 before-plan shows
    # three parquet scans and five ArrowEvalPython nodes for what is
    # one logical Python pass — guide §4: cross the Python boundary
    # once; §5: persist only what is re-read).  Cached hash-partitioned
    # ON THE CELL at min(parallelism, k) partitions: the pair self-join
    # is keyed by cell, so both legs consume the cached partitioning
    # with no further Exchange (guide §2.4), and the partition count
    # tracks the cluster count instead of the session constant (a
    # 1-partition cache starves the quadratic per-cell verify; a
    # 32-partition cache of a tiny corpus pays 32-task overhead per
    # consumer — both measured at sf0.1).  The kernels still run at the
    # rebalanced width upstream of the repartition.  Released by the
    # caller with the pair-stage pins.
    cell_parts = max(
        1, min(df.sparkSession.sparkContext.defaultParallelism, len(cents))
    )
    assign = (
        q.select("id", "qv", assigner(F.col("qv")).alias("cell"))
        .repartition(cell_parts, "cell")
        .persist()
    )
    pairs = capped_bucket_pairs(
        assign.select("id", "qv", "cell"),
        ["cell"],
        max_cluster_size,
        payload_cols=["qv"],
    )
    dot = _int_dot(F.col("qv_a"), F.col("qv_b"))
    na2 = _int_dot(F.col("qv_a"), F.col("qv_a"))
    nb2 = _int_dot(F.col("qv_b"), F.col("qv_b"))
    t2 = F.lit(threshold_ppm * threshold_ppm).cast("decimal(13,0)")
    dup = (
        pairs.dropDuplicates(["id_a", "id_b"])
        .select(
            "id_a",
            "id_b",
            dot.alias("dot"),
            na2.alias("na2"),
            nb2.alias("nb2"),
        )
        .filter(
            (F.col("dot") > 0)
            & (
                (F.col("dot") * F.col("dot"))
                * F.lit(10**12).cast("decimal(13,0)")
                >= t2 * F.col("na2") * F.col("nb2")
            )
        )
    )
    # NOT broadcast: SemDeDup prune rates run to double-digit percent
    # of the corpus, so the pruned set scales with the data — let AQE
    # pick broadcast only when runtime stats say it fits.
    pruned = dup.select(F.col("id_b").alias("_pruned_id")).distinct()
    out = (
        assign.join(
            pruned,
            assign["id"] == pruned["_pruned_id"],
            "left",
        )
        .select(
            F.col("id").alias(id_col),
            "cell",
            F.col("_pruned_id").isNull().alias("keep"),
        )
    )
    out._bdv_pinned = pinned_caches(pairs) + [assign]
    return out


# ------------------------------------------------------------ rank fusion

def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    rank_a_col: str = "rank_a",
    rank_b_col: str = "rank_b",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Büttcher, SIGIR 2009) of
    two per-query rankings: ``RRF(d) = Σ_r 1/(rrf_k + rank_r(d))``,
    summing only over the rankings that actually list ``d`` — the
    standard missing-member convention, which is what lets truncated
    candidate lists fuse without a full cross-product.

    Inputs are ``(query, id, rank)`` relations.  The full outer join and
    the fused-rank window both partition by the query key, so one
    Exchange serves both; per-query frame size is bounded by the UNION
    of the two lists (at scale, feed top-M lists, not full rankings).
    ``rrf_score`` is a sum of at most two exact small-int reciprocals —
    deterministic across engines — rounded to 6; ties break by id.
    Returns ``(query, id, rank_a, rank_b, rrf_score, fused_rank)`` for
    ``fused_rank <= k``; absent-list ranks ship as NULL.
    """
    a = ranked_a.select(query_col, id_col, rank_a_col)
    b = ranked_b.select(query_col, id_col, rank_b_col)
    fused = a.join(b, [query_col, id_col], "full_outer").withColumn(
        "rrf_score",
        F.round(
            F.coalesce(
                1.0 / (F.lit(rrf_k) + F.col(rank_a_col)), F.lit(0.0)
            )
            + F.coalesce(
                1.0 / (F.lit(rrf_k) + F.col(rank_b_col)), F.lit(0.0)
            ),
            6,
        ),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("rrf_score").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= k)
    )


def hybrid_lexical_dense_rrf(
    docs: DataFrame,
    emb: DataFrame,
    query_pred,
    n: int = 5,
    k: int = 10,
    rrf_k: int = 60,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    dense_top_m: Optional[int] = None,
) -> DataFrame:
    """Hybrid retrieval: fuse a LEXICAL ranking (shared character
    ``n``-gram count between query text and candidate text — exact
    integers, the BM25-shaped signal without corpus statistics) with a
    DENSE ranking (embedding cosine) via :func:`rrf_fuse`.  This is the
    configuration RRF exists for — two signals with disjoint failure
    modes (lexical misses paraphrase, dense misses rare exact tokens:
    ids, code, numbers), fused without training a reranker.

    ``query_pred`` selects the query documents (evaluated against BOTH
    tables' id columns — doc ids and vec ids must identify the same
    corpus).  The query side of every join is broadcast:

    - lexical: the corpus inverted shingle index streams ONCE against
      the broadcast query shingles — candidates are docs sharing ≥1
      shingle with a query, postings-bounded, never pairwise in the
      corpus;
    - dense: the corpus embeddings stream ONCE against the broadcast
      query vectors.  With ``dense_top_m=None`` (the default) the FULL
      exact ranking feeds the fusion — every candidate keeps its
      1/(rrf_k+rank) contribution, the historical semantics.  Pass an
      explicit ``dense_top_m`` (e.g. ``max(k*10, 100)``) to truncate
      the dense list per query — RRF's missing-member convention is
      exactly what makes truncated candidate lists fusable, so the
      rank window and the fusion join then carry |queries|·M rows, not
      |queries|·|corpus|; that is the bound to use at scale (the
      pytest twin pins that it loses nothing at the fused cutoff on
      the bench corpus).  Truncation is opt-in (ADVICE r12): a
      candidate at dense rank M+1 loses its contribution, so the
      bounded plan can differ from the exact one in general.

    Ranks are deterministic: lexical by (common DESC, id), dense by the
    round-6 cosine with id tie-break.  Self-matches are excluded on both
    sides.  Candidates outside the dense top-M ship ``rank_dense``
    NULL (absent from that list).  Returns ``(query_id, vec_id,
    rank_lex, rank_dense, rrf_score, fused_rank)``, top ``k`` fused
    per query.
    """
    from big_data_validator_spark.operators.dedup import _shingle_rows

    q_ids = docs.filter(query_pred(F.col(doc_id_col)))
    # exploded-row shingle builder: positions explode first (codegen
    # Generate) and substring compiles whole-stage, instead of the
    # interpreted array HOF whose output would be exploded anyway —
    # same distinct (id, shingle) relation, ~6x faster extraction
    inv = _shingle_rows(docs, text_col, doc_id_col, n)
    qinv = F.broadcast(
        _shingle_rows(q_ids, text_col, doc_id_col, n).select(
            F.col("id").alias("query_id"), "_sh"
        )
    )
    ci = inv.alias("ci")
    qi = qinv.alias("qi")
    lex = (
        ci.join(
            qi,
            (F.col("ci._sh") == F.col("qi._sh"))
            & (F.col("ci.id") != F.col("qi.query_id")),
        )
        .groupBy(F.col("qi.query_id").alias("query_id"), F.col("ci.id"))
        .agg(F.count(F.lit(1)).alias("_common"))
        .select(
            "query_id",
            F.col("id").alias(vec_id_col),
            F.row_number()
            .over(
                Window.partitionBy("query_id").orderBy(
                    F.col("_common").desc(), F.col("id").asc()
                )
            )
            .alias("rank_lex"),
        )
    )
    queries = emb.filter(query_pred(F.col(vec_id_col)))
    dense_k = (
        dense_top_m if dense_top_m is not None else (1 << 31) - 1
    )
    dense = brute_force_topk(
        emb, queries, k=dense_k, id_col=vec_id_col, vec_col=vec_col
    ).select("query_id", vec_id_col, F.col("rank").alias("rank_dense"))
    return rrf_fuse(
        lex,
        dense,
        k=k,
        rrf_k=rrf_k,
        id_col=vec_id_col,
        rank_a_col="rank_lex",
        rank_b_col="rank_dense",
    )


def kcenter_coreset(
    emb: DataFrame,
    k: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quant_scale: int = 100_000,
) -> DataFrame:
    """Greedy k-center CORESET selection (Gonzalez 1985 farthest-point
    traversal — the 2-approximation to the k-center cover): start from
    the minimum id, then repeatedly add the point FARTHEST from every
    chosen center.  This is the standard coverage-maximizing data
    selector — the geometric complement to DSIR's distribution
    matching: DSIR picks what looks like the target, k-center picks a
    set that SPANS the corpus (dataset pruning, active-learning seeds,
    eval-set construction; Sener & Savarese 2018 use exactly this for
    core-set active learning).

    Exactness: components quantize once via the established
    ``floor(x·quant_scale)`` int64 device, squared L2 distances are
    exact integer sums (guarded against overflow by the ACTUAL max
    |quantized component| measured from the data, not an assumed
    bound), and every argmax breaks ties by smallest id — the
    selection SEQUENCE is engine-portable, so the oracle replays it
    as unrolled CTEs.

    Scale: k−1 corpus passes over a persisted RUNNING min-distance
    column ``_mind`` — each round folds ONE distance expression
    (against only the newest center) into ``least(_mind, d_new)``, so
    total fold work is O(k·n·dim) and the per-round expression size is
    constant in k (VERDICT r12: the previous form rebuilt all k folds
    as literals per round — O(k²·n·dim) work and a plan growing k·dim
    literals per expression).  Each round's frame persists and the
    prior round unpersists, so exactly two cached copies of
    ``(id, _qv, _mind)`` exist at any instant; nothing joins, no data
    rows shuffle, each pass ends in TakeOrdered(1).  Returns
    ``(center_rank, vec_id, radius2)`` where ``radius2`` is the
    selected point's exact squared quantized distance to the prior
    centers — the non-increasing coverage-radius sequence that IS the
    k-center diagnostic (NULL for rank 0).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from big_data_validator_spark.operators import rebalance_for_compute

    q = rebalance_for_compute(emb).select(
        F.col(id_col).alias("id"),
        quantize_vec(F.col(vec_col), quant_scale).alias("_qv"),
    )
    q.persist()
    seed = q.orderBy("id").first()
    if seed is None:
        q.unpersist()
        raise ValueError(
            "kcenter_coreset: input is empty — no seed point to start "
            "the greedy traversal from"
        )
    if k > 1:
        # Overflow guard on the MEASURED max |quantized component|
        # (ADVICE r12: the previous guard assumed |x| <= 5 without
        # checking): the distance fold sums dim terms of (a-b)^2 with
        # |a-b| <= 2*max_abs, so the total is < dim*(2*max_abs)^2.
        max_abs = int(
            q.agg(
                F.max(
                    F.array_max(
                        F.transform(F.col("_qv"), lambda x: F.abs(x))
                    )
                )
            ).first()[0]
            or 0
        )
        if dim * (2 * max_abs) ** 2 >= 2**62:
            q.unpersist()
            raise ValueError(
                f"kcenter_coreset: dim*(2*max|q|)^2 = "
                f"{dim * (2 * max_abs) ** 2} overflows the int64 "
                f"distance accumulator (max |quantized component| = "
                f"{max_abs}); lower quant_scale"
            )

    def _dist_to(cvec: list) -> "F.Column":
        lit = F.array(*[F.lit(int(x)) for x in cvec])
        return F.aggregate(
            F.zip_with(
                F.col("_qv"), lit, lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    centers = [(int(seed["id"]), list(seed["_qv"]), None)]
    cur = None
    for _ in range(1, k):
        newest = centers[-1][1]
        if cur is None:
            nxt = q.select(
                "id", "_qv", _dist_to(newest).alias("_mind")
            )
        else:
            nxt = cur.select(
                "id",
                "_qv",
                F.least(F.col("_mind"), _dist_to(newest)).alias(
                    "_mind"
                ),
            )
        nxt.persist()
        far = (
            nxt.orderBy(F.col("_mind").desc(), F.col("id").asc())
            .limit(1)
            .first()
        )
        if cur is not None:
            cur.unpersist()
        cur = nxt
        centers.append(
            (int(far["id"]), list(far["_qv"]), int(far["_mind"]))
        )
    if cur is not None:
        cur.unpersist()
    q.unpersist()
    spark = emb.sparkSession
    return spark.createDataFrame(
        [
            (i, cid, r)
            for i, (cid, _v, r) in enumerate(centers)
        ],
        "center_rank long, vec_id long, radius2 long",
    )


def sq8_recall(
    emb: DataFrame,
    query_pred,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantization (SQ8) audit: quantize every embedding to
    8-bit per dimension with per-dimension min/max scaling — the FAISS
    ``SQ8`` / vector-DB "int8 compression" recipe that cuts index
    bytes 4× vs float32 — rank by the EXACT INTEGER dot product of the
    quantized vectors, and measure recall@k against the full-precision
    dot ranking.  This is the measurement that decides whether a
    production index can take the 4× memory cut (the Matryoshka audit
    answers the same question for DIMENSION cuts; this one for WIDTH).
    The ranking scores raw code dots — the symmetric-int8 kernel SIMD
    inference paths actually execute — so the audit measures BOTH loss
    sources: code rounding and the affine-offset geometry shift (the
    int-code dot is not rank-equivalent to the float dot even with
    exact codes; only a zero-offset uniform-scale corpus is lossless,
    pinned in tests).

    Two corpus passes, nothing pairwise-unbounded: (1) one aggregation
    computes per-dimension min/max (2·dim partial-agg expressions, no
    shuffle of rows); (2) one broadcast-join scoring pass computes BOTH
    the int8 dot and the float dot per (query, candidate) — the corpus
    streams once for both rankings.  Quantization is row-local
    ``transform`` arithmetic: ``q_i = clamp(round((x_i − lo_i) ·
    255/(hi_i − lo_i)), 0, 255)`` (constant dims pin to 0), the
    quantized dot is exact-integer so ranks are engine-portable with
    id tie-breaks; the float ranking uses the round-6 device.  Returns
    ``(query_id, n_hits, recall)``, one row per query.
    """
    from big_data_validator_spark.operators import rebalance_for_compute

    if dim <= 0:
        raise ValueError(f"dim must be positive, got {dim}")
    stats = emb.agg(
        *[
            f
            for i in range(dim)
            for f in (
                F.min(F.col(vec_col)[i]).alias(f"_lo{i}"),
                F.max(F.col(vec_col)[i]).alias(f"_hi{i}"),
            )
        ]
    ).first()
    lo = [float(stats[f"_lo{i}"]) for i in range(dim)]
    hi = [float(stats[f"_hi{i}"]) for i in range(dim)]
    scale = [
        (255.0 / (h - l)) if h > l else 0.0 for l, h in zip(lo, hi)
    ]
    lo_arr = F.array(*[F.lit(x) for x in lo])
    sc_arr = F.array(*[F.lit(s) for s in scale])

    def quantize(vec):
        return F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: F.least(
                F.greatest(
                    F.round(
                        (F.element_at(vec, i) - F.element_at(lo_arr, i))
                        * F.element_at(sc_arr, i),
                        0,
                    ),
                    F.lit(0.0),
                ),
                F.lit(255.0),
            ).cast("long"),
        )

    corpus = rebalance_for_compute(emb)
    q = F.broadcast(
        emb.filter(query_pred(F.col(id_col))).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("_qvec"),
        )
    )
    int_dot = F.aggregate(
        F.zip_with(
            quantize(F.col("_cvec")),
            quantize(F.col("_qvec")),
            lambda x, y: x * y,
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).alias("_dot_sq")
    full_dot = F.round(
        F.aggregate(
            F.zip_with(
                F.col("_cvec"), F.col("_qvec"), lambda x, y: x * y
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    ).alias("_dot_full")
    scored = (
        corpus.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_cvec"),
        )
        .join(q, F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, full_dot, int_dot)
    ).cache()

    def topk(score_col):
        w = Window.partitionBy("query_id").orderBy(
            F.col(score_col).desc(), F.col(id_col).asc()
        )
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= k)
            .select("query_id", id_col)
        )

    truth = topk("_dot_full").cache()
    hits = (
        topk("_dot_sq")
        .join(truth, ["query_id", id_col], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    out = (
        truth.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.lit(float(k)), 6
            ).alias("recall"),
        )
        .orderBy("query_id")
    )
    out._bdv_pinned = [scored, truth]
    return out


def matryoshka_recall(
    emb: DataFrame,
    query_pred,
    prefix_dims: Sequence[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka (MRL) prefix-dimension audit: for each prefix length
    d, rank the corpus by the dot product of the FIRST d components
    only and measure recall@k against the full-dimension ranking — the
    measurement that decides how many dimensions a production index
    actually needs (Kusupati et al. 2022: MRL-trained embeddings keep
    most recall at small prefixes; this operator tells you whether
    YOURS do before you cut the index size 8×).

    ONE broadcast-join scoring pass computes every prefix's dot product
    per (query, candidate) — ``slice`` + the same fold, so the corpus
    streams ONCE for all prefixes, not once per prefix; each prefix's
    rank window partitions by the same query key.  Rankings use round-6
    scores with id tie-breaks (the cross-engine rank-determinism
    device).  Returns ``(prefix_dim, query_id, n_hits, recall)`` with
    ``recall = |top-k(prefix) ∩ top-k(full)| / k``, one row per
    (prefix, query), ordered.
    """
    from big_data_validator_spark.operators import rebalance_for_compute

    corpus = rebalance_for_compute(emb)
    q = F.broadcast(
        emb.filter(query_pred(F.col(id_col))).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("_qvec"),
        )
    )
    dot_prefix = {
        d: F.round(
            F.aggregate(
                F.zip_with(
                    F.slice(F.col("_cvec"), 1, int(d)),
                    F.slice(F.col("_qvec"), 1, int(d)),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias(f"_dot_{d}")
        for d in prefix_dims
    }
    full_dot = F.round(
        F.aggregate(
            F.zip_with(
                F.col("_cvec"), F.col("_qvec"), lambda x, y: x * y
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    ).alias("_dot_full")
    # scored feeds the truth ranking plus one window per prefix, and
    # truth is consumed twice per prefix — unpinned, Spark re-executes
    # the corpus-scoring join once per reference (the ks_two_sample
    # recompute shape).  Both frames are pinned; callers release via
    # materialize_release (the result is |prefixes|x|queries| rows).
    scored = (
        corpus.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_cvec"),
        )
        .join(q, F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col, full_dot, *dot_prefix.values())
    ).cache()

    def topk(score_col):
        w = Window.partitionBy("query_id").orderBy(
            F.col(score_col).desc(), F.col(id_col).asc()
        )
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= k)
            .select("query_id", id_col)
        )

    truth = topk("_dot_full").cache()
    out = None
    for d in prefix_dims:
        hits = (
            topk(f"_dot_{d}")
            .join(truth, ["query_id", id_col], "left_semi")
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        row = truth.select("query_id").distinct().join(
            hits, "query_id", "left"
        ).select(
            F.lit(int(d)).alias("prefix_dim"),
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce("n_hits", F.lit(0)) / F.lit(float(k)), 6
            ).alias("recall"),
        )
        out = row if out is None else out.unionByName(row)
    result = out.orderBy("prefix_dim", "query_id")
    result._bdv_pinned = [scored, truth]
    return result
