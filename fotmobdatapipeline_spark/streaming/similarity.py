"""Streaming twin of the SEMANTIC dedup tier (VERDICT r5 #7): score an
embedding ingest stream against a batch-trained k-means index and drop
semantic near-duplicates of the historical corpus AT INGEST — the
train-batch / score-stream split of ``operators/similarity.py::
semantic_dedup`` (the ``anomaly_flag_stream`` pattern applied to the
SemDeDup tier).

Why the split: SemDeDup's trainer (``kmeans_lloyd``) needs global
passes and cannot stream; its verdict ("does this vector have a
cluster-mate at cosine >= tau?") needs only (a) a cell assignment and
(b) a lookup against the at-rest corpus — both stateless per row.  So
the batch side trains centroids and materializes the cell-keyed corpus
index, and the stream pays:

1. a STATELESS cell assignment — the k trained centroids are collected
   driver-side (k x d floats, the "centroids live on the driver" bound
   of kmeans_lloyd) and embedded as array literals; per-row cosine to
   each is the same sequential-fold ``dot`` as the batch path, and the
   argmax-with-lowest-cell-tie is ``F.least`` over (neg_sim, cell)
   structs — bit-identical to ivf_assign's ``min(struct(neg, cell))``
   aggregate without its (stateful-on-a-stream) groupBy;
2. a stream-static LEFT ANTI join against the index on (same cell AND
   cosine >= tau) — stateless, re-reads the static side per micro-batch
   so a refreshed index is picked up between batches.

Semantics note (matches batch SemDeDup's per-pair rule): the stream
compares against the HISTORICAL corpus only, not against other streamed
rows — two near-identical vectors arriving in the same micro-batch both
survive if neither has a corpus mate.  Cross-batch self-dedup is the
(signature-keyed) ``neardup_stream`` tier's job; the semantic tier's
state is the index, maintained in batch.

At 100 TB: the index is cell-partitioned storage (one parquet partition
per cell — the same layout ``ivf_topk`` queries), the anti join is
cell-keyed so each micro-batch row probes one cell's list, and k grows
with the corpus to keep cells bounded (SemDeDup used 50k cells for
LAION).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from fotmobdatapipeline_spark.operators.similarity import dot, ivf_assign, l2_norm


def semantic_index(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cell-keyed corpus index for streaming semantic dedup: one row per
    historical vector, (cell, p_vid, p_vec, p_nrm).  Built with the
    batch broadcast-IVF pass; write it partitioned by cell for
    partition-pruned probes."""
    return ivf_assign(corpus, centroids, id_col, vec_col).select(
        "cell",
        F.col("vid").alias("p_vid"),
        F.col("vec").alias("p_vec"),
        F.col("nrm").alias("p_nrm"),
    )


def _dot_literal(vec: Column, comps: list[float]) -> Column:
    """Dot product against a LITERAL vector as an explicit left-to-left
    addition chain: 0.0 + v[1]*c1 + v[2]*c2 + ... — the exact same
    operand order and casts as the batch ``dot``'s sequential
    ``F.aggregate`` fold (acc + x*y from index 1), so the result is
    bit-identical, but as straight-line whole-stage-codegen arithmetic
    instead of k*d HOF lambda dispatches per row.  Measured on the
    sf0.1 semantic stream bench (50k rows, 2k-vector index): k=8
    1,638 rows/s (vs 1,413 with the HOF form), k=16 1,536, k=32 1,096
    — the k*d expression cost grows linearly with k and overtakes the
    per-probe join savings at this toy corpus size, so k stays a
    CORPUS-size lever (mates-per-cell ~N/k dominates when N is large),
    not a free knob; past k*d ≈ 1-2k terms the generated method also
    outgrows whole-stage codegen's split threshold."""
    acc: Column = F.lit(0.0)
    for i, c in enumerate(comps):
        acc = acc + F.element_at(vec, i + 1).cast("double") * F.lit(float(c))
    return acc


def assign_cell_stateless(
    vec: Column, centroid_rows: list[tuple[int, list[float]]],
    nrm: Column | None = None,
) -> Column:
    """Nearest-centroid cell id as ONE stateless projection — the
    streaming form of ``ivf_assign``'s n_probes=1 argmax (highest
    cosine, ties -> lowest cell id), for use where a groupBy would make
    the query stateful.  ``centroid_rows`` = [(cell_id, components)];
    each per-cell cosine is the same sequential-fold arithmetic as the
    batch broadcast join computes (see :func:`_dot_literal`), and
    ``F.least`` over (neg_sim, cell) structs is exactly
    ``min(struct(neg, cell))`` — so stream and batch assignments agree
    bit-for-bit.  Pass a precomputed ``nrm`` column to evaluate the
    row norm once instead of once per cell."""
    import math

    if nrm is None:
        nrm = l2_norm(vec)
    scored = []
    for cell_id, comps in sorted(centroid_rows, key=lambda r: r[0]):
        # Centroid norm is a Python-side constant — but it must equal
        # the JVM's own sqrt(fold) bit-for-bit, so compute the fold in
        # the same sequence here (Python float ops are the same IEEE
        # doubles).
        cn = 0.0
        for c in comps:
            cn = cn + float(c) * float(c)
        cnorm = math.sqrt(cn)
        sim = _dot_literal(vec, comps) / (nrm * F.lit(cnorm))
        scored.append(
            F.struct(
                (-sim).alias("neg"), F.lit(int(cell_id)).alias("cell")
            )
        )
    return F.least(*scored)["cell"]


def semantic_dedup_stream(
    vectors: DataFrame,
    centroids: DataFrame,
    index: DataFrame,
    tau: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
) -> DataFrame:
    """Emit only the streamed vectors with NO semantic near-duplicate in
    the historical corpus: assign each arriving vector to its trained
    cell statelessly, then LEFT ANTI join the cell-keyed ``index``
    (from :func:`semantic_index`) on (same cell AND cosine >= tau).

    Works identically on a batch frame — the twin the contract test
    pins (stream == batch exactly: the whole pipeline is a pure per-row
    filter against static state, no arrival-order dependence).

    Output: the input columns plus ``cell``.
    """
    rows = [
        (r[centroid_id_col], list(r[vec_col]))
        for r in centroids.select(centroid_id_col, vec_col).collect()
    ]
    # Row norm computed ONCE per row (it feeds all k assignment cosines
    # and every anti-join probe), then dropped from the output.
    assigned = vectors.withColumn("__nrm", l2_norm(F.col(vec_col)))
    assigned = assigned.withColumn(
        "cell",
        assign_cell_stateless(F.col(vec_col), rows, nrm=F.col("__nrm")),
    )
    is_dup = (
        dot(F.col(vec_col), F.col("p_vec"))
        / (F.col("__nrm") * F.col("p_nrm"))
        >= F.lit(float(tau))
    )
    return assigned.join(
        index, on=(assigned["cell"] == index["cell"]) & is_dup, how="left_anti"
    ).drop("__nrm")


def semantic_ingest_sink(
    stream: DataFrame,
    centroids: DataFrame,
    path: str,
    checkpoint: str,
    tau: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    seed_index: DataFrame | None = None,
    keep_versions: int = 1,
):
    """SELF-MAINTAINING semantic dedup at ingest: each micro-batch is
    scored against the stored index (``semantic_dedup_stream``'s anti
    join), and the batch's SURVIVORS are appended to the index so later
    batches dedup against them too — the production form, where the
    index is not a frozen snapshot but the set of everything admitted
    so far.

    Within one micro-batch rows are scored against the PRIOR index
    only (two near-identical vectors arriving in the same batch are
    both admitted — the same per-pair, non-transitive contract as batch
    SemDeDup); across batches the first admitted copy suppresses the
    rest.  For exact-duplicate relations this makes the admitted
    QUANTIZED-KEY set independent of batch boundaries — the contract
    the test pins.

    Exactly-once: the stored index carries ``last_batch``; a replayed
    batch id is skipped (the CMS/HLL sink pattern — state lives in the
    table).  Versioned-immutable layout behind an atomic CURRENT
    pointer; ``path`` must be driver-local filesystem (see
    ``hll_maintenance_sink`` for the object-store porting note).  At
    100 TB each version append is survivor-sized and the stored table
    is cell-partitioned for pruned probes.
    """
    import os
    import shutil

    from fotmobdatapipeline_spark.streaming.sketches import _current_version

    rows = [
        (r[centroid_id_col], list(r[vec_col]))
        for r in centroids.select(centroid_id_col, vec_col).collect()
    ]

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev_v = _current_version(path)
        if prev_v is not None:
            prev = spark.read.parquet(os.path.join(path, prev_v))
            applied = prev.agg(F.max("last_batch")).first()[0]
            if applied is not None and batch_id <= applied:
                return  # replayed batch: already admitted
            index = prev.select("cell", "p_vid", "p_vec", "p_nrm")
        elif seed_index is not None:
            index = seed_index
        else:
            index = None
        assigned = batch_df.withColumn("__nrm", l2_norm(F.col(vec_col)))
        assigned = assigned.withColumn(
            "cell", assign_cell_stateless(F.col(vec_col), rows, nrm=F.col("__nrm"))
        )
        if index is not None:
            is_dup = (
                dot(F.col(vec_col), F.col("p_vec"))
                / (F.col("__nrm") * F.col("p_nrm"))
                >= F.lit(float(tau))
            )
            survivors = assigned.join(
                index, on=(assigned["cell"] == index["cell"]) & is_dup,
                how="left_anti",
            )
        else:
            survivors = assigned
        admitted = survivors.select(
            "cell",
            F.col(id_col).alias("p_vid"),
            F.col(vec_col).alias("p_vec"),
            F.col("__nrm").alias("p_nrm"),
        )
        out = (
            index.unionByName(admitted) if index is not None else admitted
        ).withColumn("last_batch", F.lit(batch_id))
        new_v = f"v{batch_id}"
        out.write.mode("overwrite").parquet(os.path.join(path, new_v))
        tmp = os.path.join(path, "CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(new_v)
        os.replace(tmp, os.path.join(path, "CURRENT"))
        versions = sorted(
            (
                d
                for d in os.listdir(path)
                if d.startswith("v")
                and d != new_v
                and os.path.isdir(os.path.join(path, d))
            ),
            key=lambda d: int(d[1:]),
            reverse=True,
        )
        for d in versions[keep_versions:]:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)

    os.makedirs(path, exist_ok=True)
    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def read_semantic_index(spark, path: str) -> DataFrame | None:
    """CURRENT version of the admitted-vector index, or None before the
    first batch commits."""
    import os

    from fotmobdatapipeline_spark.streaming.sketches import _current_version

    v = _current_version(path)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(path, v))
