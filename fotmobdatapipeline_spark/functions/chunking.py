"""Context-window chunking: split documents into overlapping token
windows — the step that turns a cleaned corpus into training examples.

Two implementations of the same semantics:

* :func:`chunk_windows` — native column expression (split + sequence +
  slice inside whole-stage codegen's Arrow-free JVM path).  This is the
  100 TB path: no Python workers, and the per-doc work is proportional
  to the OUTPUT size (tokens x overlap factor), so the nested HOF does
  not hit the O(n*k) interpreted-lambda blowup that rolling hashes did
  (operators/dedup.py::winnowing_fingerprints).
* :class:`ChunkDocument` — a Spark 4 Python UDTF (one input row ->
  N output rows via SQL LATERAL join), the extension-point form for
  chunkers that need real tokenizers; tests pin it row-identical to the
  native expression.

Chunk semantics (mirrored exactly by the DuckDB oracle in
plans/llmdata.py): tokens = whitespace split; window starts at every
multiple of ``step`` below n_tokens; each chunk takes up to ``size``
tokens.  The final windows may be shorter; every token appears in at
least one chunk; consecutive chunks overlap by ``size - step`` tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

from fotmobdatapipeline_spark.functions.hof import bind_once

DEFAULT_CHUNK_SIZE = 64
DEFAULT_CHUNK_STEP = 48


def chunk_windows(
    text: Column, size: int = DEFAULT_CHUNK_SIZE, step: int = DEFAULT_CHUNK_STEP
) -> Column:
    """Array of chunk structs (chunk_idx, n_tokens, chunk_text) for one
    document — explode to get the training-example rows."""
    if size <= 0 or step <= 0:
        raise ValueError("size and step must be positive")

    # token split bound once per row (hof.bind_once — the per-chunk
    # lambda would otherwise re-split per window)
    def body(t):
        n = F.size(t)
        # n >= 1 always (split('') -> ['']), so the sequence never
        # descends.
        starts = F.sequence(F.lit(0), n - 1, F.lit(step))
        return F.transform(
            starts,
            lambda s: F.struct(
                (s / step).cast("int").alias("chunk_idx"),
                F.least(F.lit(size), n - s).cast("int").alias("n_tokens"),
                F.concat_ws(
                    " ", F.slice(t, s + 1, F.least(F.lit(size), n - s))
                ).alias("chunk_text"),
            ),
        )

    return bind_once(F.split(text, " "), body)


try:  # pyspark >= 4: Python UDTF support
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, n_tokens int, chunk_text string")
    class ChunkDocument:
        """LATERAL-join chunker: one document row in, one row per
        context window out.  Same semantics as chunk_windows."""

        def eval(self, text: str, size: int, step: int):
            toks = (text if text is not None else "").split(" ")
            n = len(toks)
            s = 0
            while s < n:
                chunk = toks[s : s + size]
                yield s // step, len(chunk), " ".join(chunk)
                s += step

except ImportError:  # pragma: no cover
    ChunkDocument = None


def register_chunk_udtf(spark: SparkSession, name: str = "chunk_document") -> None:
    """Register the UDTF for SQL LATERAL use; ships the package so
    Python workers can unpickle the class under an external driver."""
    if ChunkDocument is None:  # pragma: no cover
        raise RuntimeError("Python UDTFs need pyspark >= 4")
    from fotmobdatapipeline_spark.session import ship_package

    ship_package(spark)
    spark.udtf.register(name, ChunkDocument)
