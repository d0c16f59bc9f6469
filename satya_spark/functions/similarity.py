"""Similarity search over embedding columns (array<float>).

Two paths:

* **Brute-force cosine top-k** — exact baseline. The query set is
  broadcast (it's small by definition); similarity is a codegen'd
  fold over the zipped arrays; top-k via window row_number with a
  deterministic tie-break. At 100 TB the corpus side streams through
  executors with NO shuffle — only the broadcast and the final
  per-query top-k (tiny) move.
* **LSH-bucketed ANN** — sign-of-hyperplane sketches with
  deterministic pseudo-random planes (md5-derived, seedable). Each
  vector maps to a bucket; queries probe their own bucket only,
  turning the scan into a bucket-pruned join. Recall/cost trades via
  n_planes. This is the scale path; brute force is its oracle.

A vectorized pandas-UDF dot product is deliberately NOT the default:
the arithmetic fold stays in the JVM and avoids Arrow transfer; for
very wide vectors (≥1k dims) switch to mapInPandas + numpy
(multimodal.py shows the pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import portable_hash64


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as an ordered left fold (deterministic FP order —
    reproducible and engine-portable)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _rank_topk(
    scored: DataFrame,
    query_id_col: str,
    id_col: str,
    k: int,
    salt_buckets: int = 32,
) -> DataFrame:
    """Exact, deterministic per-query top-k over (query_id, id,
    cos_sim) candidate rows — with a BOUNDED reduce task: phase 1
    ranks within (query, salt-of-candidate-id), so a query whose
    probe set is 10^10 candidates fans out over ``salt_buckets``
    tasks each emitting ≤ k survivors; phase 2 re-ranks the
    ≤ k × salt_buckets rows per query. Lossless (any global top-k row
    is a per-salt top-k row) — identical output to the single-window
    rank, same two-phase trick as crossrow.violations_sample. Ties
    break on ascending id so the result is total-order deterministic
    (and matches the SQL oracles' ORDER BY)."""
    order = [F.desc("cos_sim"), F.asc(id_col)]
    w1 = Window.partitionBy(query_id_col, "__salt").orderBy(*order)
    w2 = Window.partitionBy(query_id_col).orderBy(*order)
    return (
        scored.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
        )
        .withColumn("__r1", F.row_number().over(w1))
        .filter(F.col("__r1") <= k)
        .drop("__salt", "__r1")
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cos_sim")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. Returns
    (query_id, rank, vec_id, cos_sim). Ties broken by vec_id so the
    result is total-order deterministic."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col), F.col(vec_col).alias("__qvec")
        )
    )
    j = corpus.crossJoin(q).filter(F.col(query_id_col) != F.col(id_col))
    sim = F.round(cosine(F.col(vec_col), F.col("__qvec")), 6)
    return _rank_topk(
        j.select(F.col(query_id_col), F.col(id_col), sim.alias("cos_sim")),
        query_id_col,
        id_col,
        k,
    )


# --- LSH scale path --------------------------------------------------------


def _plane_component(seed: str, plane: int, dim: int) -> float:
    """Deterministic pseudo-random plane component in [-1, 1)."""
    import hashlib

    h = hashlib.md5(f"{seed}:p{plane}:d{dim}".encode()).digest()
    v = int.from_bytes(h[:8], "big")
    return (v / 2**63) - 1.0


def lsh_bucket(
    vec: Column, n_planes: int, dims: int, seed: str = "ann"
) -> Column:
    """Sign sketch: bit_p = [vec · plane_p > 0]; bucket = Σ bit·2^p.

    The dot product is a ``zip_with`` + ``aggregate`` left fold over a
    plane ARRAY literal, not ``dims`` inlined ``element_at``-multiply
    terms: the inlined form built an n_planes×dims-term expression
    tree whose Catalyst analysis/optimization alone cost ~3.7 s per
    query build at dims=64×4 planes (measured r6 — more than 3× the
    execution), re-paid on every plan because literals defeat plan
    caching. The fold keeps the tree ~5× smaller at identical values:
    the HOF evaluates left-to-right exactly like the old ``+`` chain
    (0.0 + t₁ ≡ t₁ for every float, and a −0.0 sum still fails
    ``> 0``), so bucket bits — and the SQL-oracle parity the expr
    path exists for — are unchanged. Per-row cost is CodegenFallback
    HOF eval; this path is the ORACLE TWIN for small corpora — the
    scale path is the numpy sketch (``sketch_buckets_np`` /
    ``lsh_topk(impl='arrow')``)."""
    bucket = F.lit(0)
    vd = _to_double(vec)
    for p in range(n_planes):
        plane = F.array(
            *[F.lit(_plane_component(seed, p, d)) for d in range(dims)]
        )
        s = F.aggregate(
            F.zip_with(vd, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(s > 0, F.lit(2**p)).otherwise(F.lit(0))
    return bucket


def sketch_buckets_np(
    df: DataFrame,
    n_planes: int,
    dims: int,
    seeds: list[str],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow-batched sign-sketch: one numpy float64 matmul per batch
    against the stacked (len(seeds)·n_planes, dims) plane matrix,
    emitting one (id, band, bucket) row per band. This is the
    wide-vector / many-plane SCALE path: the pure-expression
    ``lsh_bucket`` inlines n_planes×dims multiply-adds into the plan
    and past ~500 terms the fused stage blows Janino's 64 KB method
    limit and silently drops to interpreted eval — a matmul over Arrow
    batches is both smaller and far faster there. Sign parity with the
    expression path holds except when a dot product sits within
    float-summation noise of 0 (tested equal on the synthetic corpus);
    use the expression path when bit-exact SQL-oracle parity matters.
    (Measured footnote: if you must run the big-expr path, disabling
    ``spark.sql.codegen.wholeStage`` lets the projection compile as
    split per-operator methods instead of falling back to fully
    interpreted eval — 1.75x faster at dims=64 x 24 planes, sf0.01.
    Still far behind the matmul; kept as a negative result.)"""
    import numpy as np
    import pyarrow as pa
    from typing import Iterator

    planes = np.array(
        [
            [
                [_plane_component(seed, p, d) for d in range(dims)]
                for p in range(n_planes)
            ]
            for seed in seeds
        ]
    )  # (bands, n_planes, dims)
    pow2 = 2 ** np.arange(n_planes)
    bands = len(seeds)

    # mapInArrow (r6): flat values buffer → one reshape, no pandas
    def run(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for b in batches:
            n = b.num_rows
            if not n:
                continue
            x = _vec_matrix_np(b.column(1), n)  # (n, dims)
            ids = b.column(0)
            for bi in range(bands):
                s = x @ planes[bi].T  # (n, n_planes)
                bucket = ((s > 0) * pow2).sum(axis=1).astype(np.int32)
                yield pa.RecordBatch.from_arrays(
                    [
                        ids,
                        pa.array(
                            np.full(n, bi, dtype=np.int32), type=pa.int32()
                        ),
                        pa.array(bucket, type=pa.int32()),
                    ],
                    names=[id_col, "band", "bucket"],
                )

    return df.select(id_col, vec_col).mapInArrow(
        run, schema=f"{id_col} long, band int, bucket int"
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    multiprobe: int = 0,
    impl: str = "expr",
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket, then exact cosine rank within the bucket. With 2^p
    buckets the scanned fraction is ~2^-p of the corpus.

    ``multiprobe=1`` additionally probes every bucket at hamming
    distance 1 from the query's (one sign-bit flip) — the standard
    multi-probe LSH recall knob: a near neighbor lost to a single
    straddled hyperplane is recovered at (n_planes+1)× probe cost,
    still a tiny fraction of the corpus. Only the QUERY side fans out;
    the corpus keeps one bucket per vector.

    ``impl='expr'`` builds the bucket as constant-folded Catalyst
    expressions and ranks via join + cosine fold (bit-exact SQL-oracle
    parity). ``impl='arrow'`` is the 100 TB configuration: the same
    single numpy Arrow pass as IVF (``_ivf_score_np`` with the
    sign-sketch bucketing as the assigner) — bucket, probe-filter,
    score, and per-batch local top-k in one scan, no pair set, no
    interpreted fold. Sign parity caveat as sketch_buckets_np (differs
    only within float noise of a zero plane dot product)."""
    if impl == "arrow":
        if multiprobe not in (0, 1):
            raise ValueError("multiprobe supports 0 or 1 bit flips")
        import numpy as np

        planes = np.array(
            [
                [_plane_component("ann", p, d) for d in range(dims)]
                for p in range(n_planes)
            ]
        )
        pow2 = 2 ** np.arange(n_planes)

        def assign(x, xn):
            return ((x @ planes.T > 0) * pow2).sum(axis=1)

        qinfo = []
        for row in queries.select(F.col(query_id_col), F.col(vec_col)).collect():
            v = np.asarray(row[vec_col], dtype=np.float64)
            b0 = int(((v @ planes.T > 0) * pow2).sum())
            probes = {b0} | (
                {b0 ^ (1 << p) for p in range(n_planes)} if multiprobe else set()
            )
            qinfo.append((row[0], v, np.array(sorted(probes), dtype=np.int64)))
        return _ivf_score_np(
            corpus, qinfo, k, id_col, vec_col, query_id_col, assign=assign
        )
    c = corpus.withColumn("__bucket", lsh_bucket(F.col(vec_col), n_planes, dims))
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        lsh_bucket(F.col(vec_col), n_planes, dims).alias("__b0"),
    )
    if multiprobe == 0:
        q = q.select(query_id_col, "__qvec", F.col("__b0").alias("__bucket"))
    elif multiprobe == 1:
        # bucket column is projected BEFORE the explode (Generate can't
        # split big expressions across codegen methods)
        flips = F.array(F.lit(0), *[F.lit(2**p) for p in range(n_planes)])
        q = q.select(
            query_id_col,
            "__qvec",
            "__b0",
            F.explode(flips).alias("__flip"),
        ).select(
            query_id_col,
            "__qvec",
            F.col("__b0").bitwiseXOR(F.col("__flip")).alias("__bucket"),
        )
    else:
        raise ValueError("multiprobe supports 0 or 1 bit flips")
    j = c.join(F.broadcast(q), "__bucket").filter(
        F.col(query_id_col) != F.col(id_col)
    )
    sim = F.round(cosine(F.col(vec_col), F.col("__qvec")), 6)
    return _rank_topk(
        j.select(F.col(query_id_col), F.col(id_col), sim.alias("cos_sim")),
        query_id_col,
        id_col,
        k,
    )


# --- IVF (inverted-file) index ---------------------------------------------


def _vec_matrix_np(col, n_rows: int):
    """pyarrow list<float> column → (n_rows, dims) float64 matrix.

    Zero-copy shape: the Arrow list column is ONE contiguous values
    buffer plus offsets (guide §4.2's re-slice property) — when every
    row has the same length and no nulls, the matrix is a single
    ``reshape`` over the flattened values, no per-row boxing. Ragged /
    null rows fall back to the row-by-row path (same behavior the
    previous ``np.stack(pandas)`` conversion had)."""
    import numpy as np

    try:
        if col.null_count == 0 and n_rows > 0:
            lengths = col.value_lengths().to_numpy(zero_copy_only=False)
            if (lengths == lengths[0]).all() and lengths[0] > 0:
                dims = int(lengths[0])
                vals = col.flatten().to_numpy(zero_copy_only=False)
                return vals.astype(np.float64).reshape(n_rows, dims)
    except (AttributeError, ValueError):  # exotic layout → row path
        pass
    return np.stack([np.asarray(v, dtype=np.float64) for v in col.to_pylist()])


def _assign_lists_np(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "__list",
) -> DataFrame:
    """Arrow-batched IVF centroid assignment: ONE numpy float64 matmul
    per Arrow batch against the (k, dims) centroid matrix. This is the
    production-dims scale path — the pure-expression
    ``_nearest_centroid`` inlines k×dims multiply-adds into the plan,
    and past ~500 terms (e.g. dims=512 × k=256) the fused stage blows
    Janino's 64 KB method limit and silently drops to interpreted eval
    (measured, BENCH.md), while a matmul is both smaller and faster.

    Parity with the expression path: cosines are rounded to 6 decimals
    before the argmax and ties break to the SMALLEST centroid index
    (numpy argmax returns the first occurrence of the max — the same
    order ``_nearest_centroid``'s when-chain scans).

    ``mapInArrow``, not ``mapInPandas`` (r6, guide §4.1/4.2): the
    embedding column stays a flat Arrow values buffer end to end —
    matrix via one reshape (``_vec_matrix_np``), pass-through without
    per-row list boxing, and the worker imports numpy+pyarrow only
    (no pandas), which also shrinks the cold-start this build pays as
    the session's first Python stage. Assignments are bit-identical:
    same float64 matmul over the same values."""
    import numpy as np
    import pyarrow as pa
    from typing import Iterator

    C = np.asarray(centroids, dtype=np.float64)  # (k, dims)
    cn = np.sqrt((C * C).sum(axis=1))
    cn[cn == 0] = 1.0

    def run(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for b in batches:
            n = b.num_rows
            if not n:
                continue
            x = _vec_matrix_np(b.column(1), n)
            xn = np.sqrt((x * x).sum(axis=1))
            xn[xn == 0] = 1.0
            sims = np.round(x @ C.T / (xn[:, None] * cn[None, :]), 6)
            lists = pa.array(sims.argmax(axis=1).astype(np.int32))
            yield pa.RecordBatch.from_arrays(
                [b.column(0), b.column(1), lists],
                names=[id_col, vec_col, out_col],
            )

    return df.select(id_col, vec_col).mapInArrow(
        run, schema=f"{id_col} long, {vec_col} array<float>, {out_col} int"
    )


def _probes_driver_np(
    qpdf, centroids: list[list[float]], nprobe: int, vec_key: str
) -> list[tuple]:
    """Driver-side probe selection for a collected query batch
    (queries are driver-small by definition — the broadcast side; if
    a query batch ever outgrew the driver, probe selection would move
    into the same Arrow pass that scores). Parity with the expression
    path's ``reverse(array_sort(struct))``: 6-decimal cosine, ties to
    the LARGEST centroid index."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    cn = np.sqrt((C * C).sum(axis=1))
    cn[cn == 0] = 1.0
    idx = np.arange(C.shape[0])
    out = []
    for row in qpdf:
        v = np.asarray(row[vec_key], dtype=np.float64)
        vn = np.sqrt((v * v).sum()) or 1.0
        sims = np.round(C @ v / (cn * vn), 6)
        order = np.lexsort((-idx, -sims))[:nprobe]
        out.append((row[0], v, np.sort(order).astype(np.int64)))
    return out


def _ivf_score_np(
    corpus: DataFrame,
    qinfo: list[tuple],
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    centroids: list[list[float]] | None = None,
    list_col: str = "__list",
    assign: "object" = None,
) -> DataFrame:
    """ONE Arrow pass over the corpus: (optionally) assign each row's
    IVF list via the centroid matmul, then score every query against
    the rows of its probed lists with a numpy matmul and emit only the
    per-batch LOCAL top-k per query. The global exact top-k is the
    window over that union (≤ batches × queries × k candidate rows —
    tiny), so no (corpus × query) pair set ever materializes and no
    interpreted per-pair cosine fold runs. This replaced a
    join + F.aggregate-fold ranking measured at ~9 µs/pair
    (CodegenFallback HOF) — the fold was the bottleneck of every
    arrow ANN query (BENCH.md r4).

    ``qinfo``: [(query_id, np.ndarray vec, np.ndarray probe_lists)]
    collected driver-side — bounded by the query batch (the broadcast
    side), same driver-small class as the centroid matrix.

    List membership per corpus row comes from (in precedence order):
    ``assign(x, xn) -> int array`` (an arbitrary numpy bucketing —
    the LSH sign sketch uses this), else the nearest-``centroids``
    argmax, else a pre-existing ``list_col`` column (the persisted
    index layout)."""
    import numpy as np
    import pyarrow as pa
    from typing import Iterator

    if assign is None and centroids is not None:
        C = np.asarray(centroids, dtype=np.float64)
        cn = np.sqrt((C * C).sum(axis=1))
        cn[cn == 0] = 1.0

        def assign(x, xn):  # noqa: F811 — the IVF default assigner
            return np.round(
                x @ C.T / (xn[:, None] * cn[None, :]), 6
            ).argmax(axis=1)

    has_list = assign is None

    # mapInArrow (r6): the embedding column reaches numpy via one
    # flatten+reshape instead of per-row pandas list boxing, and the
    # worker needs no pandas import — same scores, same tie-breaks.
    def run(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for b in batches:
            n = b.num_rows
            if not n:
                continue
            x = _vec_matrix_np(b.column(1), n)
            xn = np.sqrt((x * x).sum(axis=1))
            xn[xn == 0] = 1.0
            ids = b.column(0).to_numpy(zero_copy_only=False)
            if has_list:
                lists = b.column(2).to_numpy(zero_copy_only=False)
            else:
                lists = assign(x, xn)
            out_q, out_i, out_s = [], [], []
            for qid, qv, probes in qinfo:
                mask = np.isin(lists, probes) & (ids != qid)
                if not mask.any():
                    continue
                sel = np.nonzero(mask)[0]
                qn = np.sqrt((qv * qv).sum()) or 1.0
                sims = np.round(x[sel] @ qv / (xn[sel] * qn), 6)
                order = np.lexsort((ids[sel], -sims))[:k]
                out_q.append(np.full(len(order), qid, dtype=np.int64))
                out_i.append(ids[sel][order])
                out_s.append(sims[order])
            if out_q:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(np.concatenate(out_q), type=pa.int64()),
                        pa.array(
                            np.concatenate(out_i).astype(np.int64),
                            type=pa.int64(),
                        ),
                        pa.array(np.concatenate(out_s), type=pa.float64()),
                    ],
                    names=[query_id_col, id_col, "cos_sim"],
                )

    cols = [id_col, vec_col] + ([list_col] if has_list else [])
    local = corpus.select(*cols).mapInArrow(
        run, schema=f"{query_id_col} long, {id_col} long, cos_sim double"
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cos_sim"), F.asc(id_col))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "cos_sim")
    )


def train_centroids(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "expr",
) -> list[list[float]]:
    """Deterministic mini k-means, DataFrame-native: initial
    centroids are the k id-stride vectors; each iteration assigns by
    max cosine and recomputes means via posexplode +
    groupBy(centroid, dim) — the per-dimension mean is one
    map-side-combinable aggregation, so training scales to any corpus
    size while centroids (k×dims floats) stay driver-side.

    ``impl='expr'`` assigns with K broadcast Catalyst expressions
    (bit-exact SQL-oracle parity); ``impl='arrow'`` with the numpy
    matmul (``_assign_lists_np``) — the production-dims config."""
    n = corpus.count()
    stride = max(1, n // k)
    cents = [
        [float(x) for x in r[0]]
        for r in corpus.filter(F.pmod(F.col(id_col), F.lit(stride)) == 0)
        .orderBy(id_col)
        .limit(k)
        .select(vec_col)
        .collect()
    ]
    for _ in range(iters):
        if impl == "arrow":
            assigned = _assign_lists_np(
                corpus, cents, id_col=id_col, vec_col=vec_col, out_col="__c"
            )
        else:
            assigned = corpus.withColumn(
                "__c", _nearest_centroid(F.col(vec_col), cents)
            )
        means = (
            assigned.select(
                "__c", F.posexplode(F.col(vec_col)).alias("dim", "val")
            )
            .groupBy("__c", "dim")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        new = {}
        for r in means:
            new.setdefault(r["__c"], {})[r["dim"]] = r["m"]
        cents = [
            [new.get(c, {}).get(d, cents[c][d]) for d in range(len(cents[c]))]
            for c in range(len(cents))
        ]
    return cents


def _cos_to_const(vec: Column, cent: list[float]) -> Column:
    """cosine(vec, constant centroid). Same zip_with+aggregate fold
    shape as :func:`lsh_bucket` (see its planning note): the fold
    adds terms left-to-right exactly like the previous inlined
    ``+``-chain (0.0 + t₁ ≡ t₁), so values — and SQL-oracle parity —
    are unchanged while the k×dims expression tree shrinks ~5×."""
    import math

    c = F.array(*[F.lit(float(w)) for w in cent])
    num = F.aggregate(
        F.zip_with(_to_double(vec), c, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cn = math.sqrt(sum(w * w for w in cent)) or 1.0
    return num / (norm(vec) * F.lit(cn))


def _nearest_centroid(vec: Column, cents: list[list[float]]) -> Column:
    """argmax_i cosine(vec, cent_i); ties → smallest i. Cosines are
    rounded to 6 decimals so the comparison is engine-portable (raw
    doubles can differ in the last ulp between Spark's fold and
    DuckDB's list_dot_product, flipping near-ties)."""
    sims = [F.round(_cos_to_const(vec, c), 6) for c in cents]
    best = F.greatest(*sims) if len(sims) > 1 else sims[0]
    out = F.lit(None).cast("int")
    expr = None
    for i, s in enumerate(sims):
        cond = s == best
        expr = F.when(cond, F.lit(i)) if expr is None else expr.when(cond, F.lit(i))
    return expr.cast("int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    impl: str = "expr",
) -> DataFrame:
    """IVF search: corpus rows carry their nearest-centroid list id;
    each query probes its ``nprobe`` closest lists. The probed
    fraction is ~nprobe/k of the corpus; within-list ranking is exact
    cosine. At scale the list id is a partition column and probing is
    partition pruning.

    ``impl='expr'`` inlines assignment/probe as constant-folded
    Catalyst expressions (bit-exact SQL-oracle parity; k×dims terms —
    past ~500 the fused stage drops to interpreted eval).
    ``impl='arrow'`` runs assignment, probe-filtered scoring, and
    per-batch local top-k in ONE numpy mapInPandas pass over the
    corpus (``_ivf_score_np``) — the 100 TB configuration: no
    corpus×query pair set, no interpreted cosine fold, one scan; same
    6-decimal rounding and tie-breaks, parity-tested in
    tests/test_functions.py."""
    if impl == "arrow":
        qpdf = queries.select(F.col(query_id_col), F.col(vec_col)).collect()
        qinfo = _probes_driver_np(qpdf, centroids, nprobe, vec_col)
        return _ivf_score_np(
            corpus, qinfo, k, id_col, vec_col, query_id_col,
            centroids=centroids,
        )
    else:
        c = corpus.withColumn(
            "__list", _nearest_centroid(F.col(vec_col), centroids)
        )
        # rounded for engine portability; struct sort ties break on the
        # centroid index DESCENDING (reverse of ascending array_sort)
        sims = [
            F.round(_cos_to_const(F.col(vec_col), cent), 6) for cent in centroids
        ]
        probe_struct = F.array(
            *[
                F.struct(sims[i].alias("s"), F.lit(i).alias("c"))
                for i in range(len(centroids))
            ]
        )
        probes = F.slice(F.reverse(F.array_sort(probe_struct)), 1, nprobe)
        q = queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("__qvec"),
            F.explode(F.transform(probes, lambda x: x["c"])).alias("__list"),
        )
    j = c.join(F.broadcast(q), "__list").filter(
        F.col(query_id_col) != F.col(id_col)
    )
    sim = F.round(cosine(F.col(vec_col), F.col("__qvec")), 6)
    return _rank_topk(
        j.select(F.col(query_id_col), F.col(id_col), sim.alias("cos_sim")),
        query_id_col,
        id_col,
        k,
    )


def build_ivf_index(
    corpus: DataFrame,
    centroids: list[list[float]],
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
    mode: str = "overwrite",
) -> None:
    """Persist the corpus PHYSICALLY PARTITIONED by its IVF list id —
    the 100 TB serving layout (the sandbox parquet stand-in for an
    Iceberg identity-partition on ``__list``). Each inverted list is
    its own partition directory, so probing ``nprobe`` lists becomes
    PARTITION PRUNING at the scan: a query batch touches ~nprobe/k of
    the bytes and the assignment matmul runs ONCE at build time, not
    per query batch (``ivf_topk`` recomputes it per job). Pruning is
    pinned at plan level in tests/test_plans.py."""
    if impl == "arrow":
        assigned = _assign_lists_np(corpus, centroids, id_col=id_col, vec_col=vec_col)
    else:
        assigned = corpus.select(
            id_col,
            vec_col,
            _nearest_centroid(F.col(vec_col), centroids).alias("__list"),
        )
    # cluster rows by list BEFORE the partitioned write: without it
    # every input task writes a sliver into every list directory
    # (tasks × k small files — a probe then pays k× the file-open
    # cost it should). A deterministic per-row salt widens the write
    # when there are fewer lists than cores (k=16 lists on 32 cores
    # left half the writers idle): each list becomes ≤ `w` compact
    # files, with w derived from the session's parallelism so it
    # degrades to 1 as k outgrows the cluster — at production k
    # (thousands of lists) the layout is one-file-per-list again.
    # Deterministic (xxhash64 of the id), never rand() — guide §2.5.
    k_lists = max(len(centroids), 1)
    dp = corpus.sparkSession.sparkContext.defaultParallelism
    w = max(1, dp // k_lists)
    assigned.repartition(
        F.col("__list"), F.pmod(F.xxhash64(F.col(id_col)), F.lit(w))
    ).write.mode(mode).partitionBy("__list").parquet(path)


def ivf_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    impl: str = "arrow",
) -> DataFrame:
    """IVF search over a :func:`build_ivf_index` layout. The probed
    list ids are applied as a LITERAL partition filter on the scan —
    static partition pruning, visible as ``PartitionFilters`` in the
    physical plan. The driver-side collect behind that literal is
    bounded by the number of CENTROIDS (distinct probed lists ≤ k_ivf
    regardless of query-batch size — same driver-small class as the
    centroid matrix itself), never by data volume. Within the pruned
    scan, the arrow impl scores queries in one numpy Arrow pass with
    per-batch local top-k (``_ivf_score_np`` — no pair set, no
    interpreted cosine fold); the expr impl keeps the broadcast
    equi-join on ``__list`` (SQL-oracle twin shape)."""
    if impl == "arrow":
        qpdf = queries.select(F.col(query_id_col), F.col(vec_col)).collect()
        qinfo = _probes_driver_np(qpdf, centroids, nprobe, vec_col)
        probed = sorted({int(li) for _, _, pr in qinfo for li in pr})
        c = spark.read.parquet(index_path).filter(F.col("__list").isin(probed))
        return _ivf_score_np(c, qinfo, k, id_col, vec_col, query_id_col)
    else:
        sims = [
            F.round(_cos_to_const(F.col("__qvec"), cent), 6) for cent in centroids
        ]
        probe_struct = F.array(
            *[
                F.struct(sims[i].alias("s"), F.lit(i).alias("c"))
                for i in range(len(centroids))
            ]
        )
        probes = F.slice(F.reverse(F.array_sort(probe_struct)), 1, nprobe)
        q = queries.select(
            F.col(query_id_col), F.col(vec_col).alias("__qvec")
        ).select(
            query_id_col,
            "__qvec",
            F.explode(F.transform(probes, lambda x: x["c"])).alias("__list"),
        )
    # ≤ len(centroids) ints by construction — the pruning literal
    probed = sorted(
        r["__list"] for r in q.select("__list").distinct().collect()
    )
    c = spark.read.parquet(index_path).filter(F.col("__list").isin(probed))
    j = c.join(F.broadcast(q), "__list").filter(
        F.col(query_id_col) != F.col(id_col)
    )
    sim = F.round(cosine(F.col(vec_col), F.col("__qvec")), 6)
    return _rank_topk(
        j.select(F.col(query_id_col), F.col(id_col), sim.alias("cos_sim")),
        query_id_col,
        id_col,
        k,
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.98,
    n_planes: int = 6,
    dims: int = 64,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "nd",
    impl: str = "expr",
) -> DataFrame:
    """Embedding-cosine near-duplicates via MULTI-BAND sign-sketch
    LSH: each vector is emitted into ``bands`` independent sketches
    (distinct plane seeds); candidates collide in ≥1 band (union of
    per-band equi-joins), fixing the single-band recall hole where a
    near-identical pair straddles one hyperplane. More planes per band
    shrink buckets (cost); more bands recover recall — the standard
    banding trade also used by the MinHash path. Candidate dedup
    shuffles only (id_a, id_b); vectors are joined back by id for the
    exact-cosine verify. Returns (id_a, id_b, cos_sim), id_a < id_b.

    ``impl='expr'`` builds the sketch as Catalyst expressions
    (bit-exact SQL-oracle parity; interpreted past ~500 terms);
    ``impl='arrow'`` uses the numpy matmul path (sketch_buckets_np) —
    the 100 TB configuration for wide vectors / many planes."""
    if impl == "arrow":
        b = sketch_buckets_np(
            df, n_planes, dims, [f"{seed}{bi}" for bi in range(bands)],
            id_col=id_col, vec_col=vec_col,
        )
    else:
        # compute the bucket COLUMNS in a Project (whole-stage codegen
        # splits big expression trees across methods there) and explode
        # only attribute references: inlining the plane dot products
        # into the Generate operator itself blows Janino's 64 KB method
        # limit (Generate.doConsume is not split-aware).
        with_buckets = df.select(
            F.col(id_col),
            *[
                lsh_bucket(F.col(vec_col), n_planes, dims, seed=f"{seed}{bi}").alias(
                    f"__b{bi}"
                )
                for bi in range(bands)
            ],
        )
        buckets = F.array(
            *[
                F.struct(
                    F.lit(bi).alias("band"), F.col(f"__b{bi}").alias("bucket")
                )
                for bi in range(bands)
            ]
        )
        b = with_buckets.select(F.col(id_col), F.explode(buckets).alias("bb")).select(
            id_col, "bb.band", "bb.bucket"
        )
    r = b.select(F.col(id_col).alias("id_b"), "band", "bucket")
    cand = (
        b.join(r, ["band", "bucket"])
        .filter(F.col(id_col) < F.col("id_b"))
        .select(F.col(id_col).alias("id_a"), "id_b")
        .distinct()
    )
    vecs = df.select(F.col(id_col), F.col(vec_col))
    j = (
        cand.join(
            vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a")),
            "id_a",
        )
        .join(
            vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b")),
            "id_b",
        )
    )
    return _pair_cosine_verify(j, threshold, impl)


def _pair_cosine_verify(j: DataFrame, threshold: float, impl: str) -> DataFrame:
    """Exact-cosine verify of candidate pairs carrying (id_a, id_b,
    vec_a, vec_b): returns (id_a, id_b, cos_sim) for pairs with
    rounded cosine ≥ threshold. ``impl='arrow'`` runs ONE numpy batch
    op per Arrow batch; the expression twin evaluates the interpreted
    F.aggregate HOF per pair (~9 µs/pair, BENCH.md r4) — same
    6-decimal rounding on both paths."""
    if impl == "arrow":
        import numpy as np
        import pyarrow as pa
        from typing import Iterator

        # mapInArrow (r6): both vector columns land as flat buffers →
        # two reshapes, no per-row pandas boxing; same values out.
        def verify(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
            for rb in batches:
                n = rb.num_rows
                if not n:
                    continue
                a = _vec_matrix_np(rb.column(2), n)
                b = _vec_matrix_np(rb.column(3), n)
                an = np.sqrt((a * a).sum(axis=1))
                bn = np.sqrt((b * b).sum(axis=1))
                an[an == 0] = 1.0
                bn[bn == 0] = 1.0
                sims = np.round(
                    np.einsum("ij,ij->i", a, b) / (an * bn), 6
                )
                m = sims >= threshold
                if m.any():
                    idx = np.nonzero(m)[0]
                    yield pa.RecordBatch.from_arrays(
                        [
                            rb.column(0).take(pa.array(idx)),
                            rb.column(1).take(pa.array(idx)),
                            pa.array(sims[m], type=pa.float64()),
                        ],
                        names=["id_a", "id_b", "cos_sim"],
                    )

        return j.select("id_a", "id_b", "vec_a", "vec_b").mapInArrow(
            verify, schema="id_a long, id_b long, cos_sim double"
        )
    sim = F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6)
    return j.select("id_a", "id_b", sim.alias("cos_sim")).filter(
        F.col("cos_sim") >= threshold
    )


def semantic_dedup(
    df: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "expr",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    deduplication by k-means clustering + within-cluster exact cosine:
    an item is DROPPED when its cosine to some LOWER-ID item in the
    SAME cluster is ≥ threshold (the published implementations' upper-
    triangular max rule, with id order as the index order, so the
    survivor set is deterministic and engine-portable). Returns one
    row per dropped item: (``id_col``, kept_id, max_cos) where
    kept_id is the smallest colliding lower id and max_cos the
    largest qualifying cosine.

    100 TB plan shape: centroid assignment is NARROW (broadcast k×dims
    constants in the expression impl; one numpy matmul per Arrow batch
    in ``impl='arrow'`` — the production-dims config, see
    ``_assign_lists_np``). The within-cluster self-join is equi on the
    cluster id — the quadratic blowup is bounded by the cluster size,
    which is the method's own contract: k MUST scale with the corpus
    (SemDeDup uses ~100k clusters at web scale) so N/k stays ~10³–10⁴;
    AQE skew-join splits residual hot clusters. The only corpus-wide
    shuffles are that equi-join and the final 8-byte groupBy(id).
    """
    if impl == "arrow":
        assigned = _assign_lists_np(
            df, centroids, id_col=id_col, vec_col=vec_col, out_col="__c"
        )
    else:
        assigned = df.select(id_col, vec_col).withColumn(
            "__c", _nearest_centroid(F.col(vec_col), centroids)
        )
    # materialize the assignment ONCE before the in-cluster self-join:
    # its two sides plan as independent subtrees, so the centroid-
    # assignment pass (a Python mapInArrow stage on the arrow path)
    # would otherwise run twice — same self-join recompute defect
    # fixed across the dedup tier this round (r6).
    assigned = assigned.localCheckpoint()
    a = assigned.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"), "__c"
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"), "__c"
    )
    j = a.join(b, "__c").filter(F.col("id_a") < F.col("id_b"))
    pairs = _pair_cosine_verify(j, threshold, impl)
    return pairs.groupBy("id_b").agg(
        F.min("id_a").alias("kept_id"), F.max("cos_sim").alias("max_cos")
    ).select(F.col("id_b").alias(id_col), "kept_id", "max_cos")
