"""Similarity search over an ``embeddings(vec_id, embedding array<float>,
label)`` table.

Brute-force cosine top-k is the exactness baseline (one pass, native
``aggregate``/``zip_with`` — JVM-side, no Python); the LSH-bucketed
variant is the 100 TB path: deterministic random-hyperplane signatures
shrink the candidate set from O(n) per query to one bucket, turning
all-pairs search into a bucket-local join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def l2_norms(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.select("vec_id", F.round(_norm(F.col(vec_col)), 4).alias("l2_norm"))


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10, vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k by cosine similarity against a literal query vector.

    The query is a broadcast literal (array constant folded by Catalyst);
    ranking is a single global top-k (TakeOrderedAndProject — no full
    sort). Similarity rounded at 4 dp; ties broken by vec_id for
    engine-portable determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = F.round(_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * _norm(q)), 4)
    return (
        emb.select("vec_id", sim.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def cosine_near_dup(
    emb: DataFrame,
    threshold: float = 0.95,
    block_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    Candidate generation blocks on ``block_col`` (at scale: an LSH bucket
    or cluster id — here the label column plays that role) so the
    quadratic pair space is per-block, not global; the cosine is computed
    only for candidates. Returns (vec_a, vec_b, cosine) with
    vec_a < vec_b and cosine ≥ threshold (rounded 4 dp).
    """
    a = emb.select(
        F.col(block_col).alias("_b"), F.col("vec_id").alias("vec_a"),
        F.col(vec_col).alias("_va"),
    )
    b = emb.select(
        F.col(block_col).alias("_b"), F.col("vec_id").alias("vec_b"),
        F.col(vec_col).alias("_vb"),
    )
    pairs = a.join(b, "_b").where(F.col("vec_a") < F.col("vec_b"))
    cos = F.round(
        _dot(F.col("_va"), F.col("_vb")) / (_norm(F.col("_va")) * _norm(F.col("_vb"))), 4
    )
    return (
        pairs.select("vec_a", "vec_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def hyperplane_signatures(
    emb: DataFrame, n_planes: int = 8, vec_col: str = "embedding", dim: int = 32
) -> DataFrame:
    """Deterministic random-hyperplane LSH signature (sign of dot with
    pseudo-random ±1 planes derived from md5(plane, coord) — no RNG
    state, identical on any cluster)."""
    def plane(p: int):
        # coordinate c of plane p: +1 if md5("p|c") first hex digit >= '8'
        return F.array(
            *[
                F.when(
                    F.substring(F.md5(F.lit(f"{p}|{c}")), 1, 1) >= "8", F.lit(1.0)
                ).otherwise(F.lit(-1.0))
                for c in range(dim)
            ]
        )

    bits = []
    for p in range(n_planes):
        bits.append(
            F.when(_dot(F.col(vec_col), plane(p)) >= 0, F.lit(1)).otherwise(F.lit(0)).alias(
                f"bit{p}"
            )
        )
    sig = None
    out = emb.select("vec_id", *bits)
    for p in range(n_planes):
        term = F.col(f"bit{p}") * F.lit(2 ** p)
        sig = term if sig is None else sig + term
    return out.select("vec_id", sig.alias("bucket"))


def ivf_assign(
    emb: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid (max cosine, 6-dp rounded for engine-portable argmax; ties
    break to the lowest centroid id). ``centroids`` is a small in-plan
    literal list — at scale it comes from an offline k-means; here the
    deterministic stand-in is the first-k vectors.

    One narrow projection — no shuffle, no UDF. At 100 TB the assignment
    column becomes the partition key of the vector table, so a probe
    reads only n_probe partitions.
    """
    scored = []
    for cid, cvec in centroids:
        c = F.array(*[F.lit(float(x)) for x in cvec])
        sim = F.round(_dot(F.col(vec_col), c) / (_norm(F.col(vec_col)) * _norm(c)), 6)
        # struct comparison: sim first, then -cid so ties pick lowest id
        scored.append(F.struct(sim.alias("sim"), F.lit(-cid).alias("negid")))
    best = F.array_max(F.array(*scored))
    return emb.select("vec_id", vec_col, (-best["negid"]).alias("centroid_id"))


def ann_ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 8,
    n_probe: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus, probe only the ``n_probe``
    centroid cells nearest the query, exact cosine top-k within them.

    The deterministic centroid set is the first ``n_centroids`` vectors
    by vec_id (a stand-in for trained k-means centroids — the plan shape
    is identical). Probe-cell selection happens driver-side on the tiny
    centroid list; the corpus-side work is one narrow assignment pass +
    a pruned top-k.
    """
    import math

    rows = (
        emb.where(F.col("vec_id") < n_centroids)
        .select("vec_id", vec_col)
        .collect()
    )
    centroids = sorted((r.vec_id, [float(x) for x in r[vec_col]]) for r in rows)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    probe = sorted(
        centroids, key=lambda c: (-cos(query_vec, c[1]), c[0])
    )[:n_probe]
    probe_ids = [cid for cid, _ in probe]

    assigned = ivf_assign(emb, centroids, vec_col=vec_col)
    candidates = assigned.where(F.col("centroid_id").isin(probe_ids))
    return cosine_topk(candidates, query_vec, k=k, vec_col=vec_col)


def ann_lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: restrict the cosine scan to the query's LSH bucket.

    At scale the signature table is bucketed/partitioned by ``bucket`` so
    the probe is one partition read instead of a full scan; here the
    bucket filter simply prunes before the ranking.
    """
    dim = len(query_vec)
    sigs = hyperplane_signatures(emb, n_planes=n_planes, vec_col=vec_col, dim=dim)
    one = emb.sparkSession.createDataFrame([(0, query_vec)], "vec_id long, embedding array<float>")
    q_bucket = hyperplane_signatures(one, n_planes=n_planes, dim=dim).first().bucket
    candidates = emb.join(
        F.broadcast(sigs.where(F.col("bucket") == q_bucket).select("vec_id")), "vec_id"
    )
    return cosine_topk(candidates, query_vec, k=k, vec_col=vec_col)
