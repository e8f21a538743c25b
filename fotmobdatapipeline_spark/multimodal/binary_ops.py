"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with Arrow-batched feature extraction via ``mapInPandas``.

Design: media (image/audio/video) travels as a ``binary`` column next to
a metadata struct — Spark never interprets the bytes; decode happens
only inside vectorized Pandas UDF stages at the edge of the plan.  At
100 TB the payload column dominates I/O, so:
* feature extraction reads ONLY (id, payload) — column pruning keeps
  metadata-only queries off the heavy bytes;
* ``mapInPandas`` streams Arrow record batches (bounded memory per
  task), never materializing a partition of blobs at once;
* partitioning stays whatever the upstream table had — no shuffle is
  introduced by a per-row decode.

``extract_features`` takes a ``decoder`` callable.  A REAL pure-Python
BMP codec ships in ``multimodal/bmp.py`` (``bmp_feature_decoder``
parses headers, un-flips bottom-up rows, un-swaps B,G,R — genuine byte
decoding, oracle-verified by the ``multimodal_bmp_decode`` catalog
entry).  Compressed formats (JPEG/PNG/audio/video) still require
libraries not present in this container: for those the default decoder
raises NotImplementedError (clearly-marked stub) and ``fake_decoder``
is a deterministic stand-in exercising the same plumbing.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("n_bytes", IntegerType()),
                    StructField("source", StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("header_hex", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def attach_binary_payload(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id", mime: str = "text/plain"
) -> DataFrame:
    """Turn a content column into the canonical (id, payload, meta)
    multimodal layout.  In production the payload comes from
    ``spark.read.format("binaryFile")`` or an object-store manifest —
    same downstream shape."""
    payload = F.encode(F.col(content_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.lit("inline").alias("source"),
        ).alias("meta"),
    )


def stub_decoder(payload: bytes) -> list[float]:
    """Placeholder for a real media decoder (PIL/librosa/ffmpeg), which
    are not installed in this environment."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "container; pass decoder=fake_decoder (tests) or a real decoder"
    )


def fake_decoder(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in 'feature extractor': a byte-histogram-ish
    projection.  Exercises the exact plumbing a real decoder would."""
    acc = [0] * dim
    for i, b in enumerate(payload):
        acc[i % dim] = (acc[i % dim] + b) % 997
    return [float(v) for v in acc]


def _ship_for_workers(df: DataFrame, *callables) -> None:
    """Make mapInPandas closures importable on Python workers: ship the
    package zip and register the defining modules for pickle-by-value
    (workers spawned by a driver that only sys.path-inserted the repo
    have no import path to this package).  Best effort — no-op if the
    workers already have the package installed."""
    try:
        import sys

        from pyspark import cloudpickle

        from fotmobdatapipeline_spark.session import ship_package

        ship_package(df.sparkSession)
        mods = {__name__} | {c.__module__ for c in callables if c is not None}
        for mod_name in mods:
            if mod_name in sys.modules and not mod_name.startswith("pyspark"):
                cloudpickle.register_pickle_by_value(sys.modules[mod_name])
    except Exception:
        pass


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("n_bytes", IntegerType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                ]
            ),
        ),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
        StructField("n_bytes", IntegerType()),
    ]
)

FRAME_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_bytes", IntegerType()),
        StructField("header_hex", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def fake_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize (real path: PIL/opencv
    inside the same mapInPandas stage): truncate/zero-pad to width*height
    bytes.  Shape-correct so downstream code sees real resized sizes."""
    target = width * height
    return payload[:target].ljust(target, b"\0")


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] = fake_resizer,
) -> DataFrame:
    """Per-row media resize: (id, payload, meta) -> same layout with the
    payload transformed and meta carrying the new dimensions.  1-in-1-out
    Arrow batches; no shuffle; payload column pruned to what's needed.
    Swap ``resizer`` for a real decoder+scaler in production — the plan
    shape, schema, and batching are identical."""
    import pandas as pd

    _ship_for_workers(media, resizer)
    mime = "image/raw"

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            resized = pdf["payload"].map(lambda b: resizer(bytes(b), width, height))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "meta": [
                        {
                            "mime": mime,
                            "n_bytes": len(b),
                            "width": width,
                            "height": height,
                        }
                        for b in resized
                    ],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema=RESIZED_SCHEMA)


def fake_frame_splitter(payload: bytes, frame_bytes: int = 64) -> list[bytes]:
    """Deterministic stand-in for a video demuxer (real path: ffmpeg):
    fixed-size byte chunks as 'frames'."""
    return [payload[i : i + frame_bytes] for i in range(0, len(payload), frame_bytes)]


def sample_frames(
    media: DataFrame,
    every_n: int = 4,
    max_frames: int = 8,
    splitter: Callable[[bytes], list[bytes]] = fake_frame_splitter,
) -> DataFrame:
    """Frame sampling: one video row fans out to <= max_frames rows of
    (doc_id, frame_idx, frame).  The 1-to-N expansion happens inside the
    Arrow batch (a pandas explode), so Spark sees an ordinary mapInPandas
    — no join, no shuffle; downstream per-frame feature extraction is
    another map stage.  ``frame_idx`` is the index in the ORIGINAL frame
    sequence (stride every_n), so provenance survives sampling."""
    import pandas as pd

    _ship_for_workers(media, splitter)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids: list = []
            idxs: list = []
            frames: list = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                sampled = splitter(bytes(payload))[::every_n][:max_frames]
                for k, fr in enumerate(sampled):
                    ids.append(did)
                    idxs.append(k * every_n)
                    frames.append(fr)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": pd.array(idxs, dtype="int32"),
                    "frame": frames,
                    "n_bytes": pd.array([len(f) for f in frames], dtype="int32"),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)


def encode_media_as_bmp_stream(
    media: DataFrame, width: int, height: int, n_frames: int
) -> DataFrame:
    """Re-encode each payload as a ``n_frames``-frame VIDEO container of
    complete BMP files (``multimodal/bmp.py`` ``encode_bmp_stream``):
    frame k's pixel material is the payload's byte window starting at
    ``k * width*height*3`` (zero-padded), so successive frames pan
    through the document — every frame differs and a splitter that
    mis-slices boundaries becomes observable downstream."""
    import pandas as pd

    from fotmobdatapipeline_spark.multimodal.bmp import (
        encode_bmp_stream,
        text_pixels,
    )

    _ship_for_workers(media, encode_bmp_stream, text_pixels)
    frame_px = width * height * 3

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            encoded = pdf["payload"].map(
                lambda b: encode_bmp_stream(
                    [
                        (
                            width,
                            height,
                            text_pixels(bytes(b)[k * frame_px :], width, height),
                        )
                        for k in range(n_frames)
                    ]
                )
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": encoded,
                    "meta": [
                        {
                            "mime": "video/x-bmp-stream",
                            "n_bytes": len(b),
                            "width": width,
                            "height": height,
                        }
                        for b in encoded
                    ],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema=RESIZED_SCHEMA)


def extract_frame_features(
    frames: DataFrame, decoder: Callable[[bytes], list[float]]
) -> DataFrame:
    """Per-frame feature extraction over ``sample_frames`` output: same
    Arrow-batched shape as :func:`extract_features` but provenance
    (``frame_idx``) rides along, so downstream per-frame work never has
    to re-split the container."""
    import pandas as pd

    _ship_for_workers(frames, decoder)
    pruned = frames.select("doc_id", "frame_idx", "frame")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            fr = pdf["frame"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "frame_idx": pdf["frame_idx"],
                    "n_bytes": fr.map(len).astype("int32"),
                    "header_hex": fr.map(lambda b: bytes(b[:4]).hex().upper()),
                    "feature": fr.map(lambda b: decoder(bytes(b))),
                }
            )

    return pruned.mapInPandas(run, schema=FRAME_FEATURE_SCHEMA)


def encode_media_as_bmp(media: DataFrame, width: int, height: int) -> DataFrame:
    """Re-encode each payload as a REAL 24-bit BMP container (pure
    Python codec, ``multimodal/bmp.py``): payload bytes become the
    pixel material (truncate/zero-pad to ``width*height*3``), then the
    full container — file+info headers, bottom-up rows, B,G,R channel
    order, 4-byte stride padding — is written by ``encode_bmp``.  Same
    1-in-1-out Arrow-batched shape as :func:`resize_media`; downstream
    :func:`extract_features` with ``bmp_feature_decoder`` then performs
    a genuine byte decode (headers parsed, rows un-flipped, channels
    un-swapped) rather than a stand-in."""
    import pandas as pd

    from fotmobdatapipeline_spark.multimodal.bmp import encode_bmp, text_pixels

    _ship_for_workers(media, encode_bmp, text_pixels)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            encoded = pdf["payload"].map(
                lambda b: encode_bmp(width, height, text_pixels(bytes(b), width, height))
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": encoded,
                    "meta": [
                        {
                            "mime": "image/bmp",
                            "n_bytes": len(b),
                            "width": width,
                            "height": height,
                        }
                        for b in encoded
                    ],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema=RESIZED_SCHEMA)


def encode_media_as_png(media: DataFrame, width: int, height: int) -> DataFrame:
    """Re-encode each payload as a REAL PNG (pure stdlib codec,
    ``multimodal/png.py``): payload bytes become the pixel material
    (truncate/zero-pad to ``width*height*3``), then the full container
    — signature, IHDR/IDAT/IEND with CRC32, zlib-deflated scanlines
    cycling None/Sub/Up/Paeth filters — is written by ``encode_png``.
    The compressed-codec sibling of :func:`encode_media_as_bmp`; a
    downstream ``png_feature_decoder`` decode therefore exercises
    inflate + all-filter reconstruction, not a header skip."""
    import pandas as pd

    from fotmobdatapipeline_spark.multimodal.bmp import text_pixels
    from fotmobdatapipeline_spark.multimodal.png import encode_png

    _ship_for_workers(media, encode_png, text_pixels)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            encoded = pdf["payload"].map(
                lambda b: encode_png(width, height, text_pixels(bytes(b), width, height))
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": encoded,
                    "meta": [
                        {
                            "mime": "image/png",
                            "n_bytes": len(b),
                            "width": width,
                            "height": height,
                        }
                        for b in encoded
                    ],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema=RESIZED_SCHEMA)


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("n_bytes", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_samples", IntegerType()),
                ]
            ),
        ),
    ]
)


def encode_media_as_wav(
    media: DataFrame, sample_rate: int, n_samples: int
) -> DataFrame:
    """Re-encode each payload as a REAL RIFF/PCM WAV container (pure
    Python codec, ``multimodal/wav.py``): payload byte pairs become
    signed int16 sample material (zero-padded to ``n_samples``), then
    the full container — RIFF header, ``fmt `` chunk, ``data`` chunk —
    is written by ``encode_wav``.  Same 1-in-1-out Arrow-batched shape
    as :func:`encode_media_as_bmp`; downstream :func:`extract_features`
    with ``wav_feature_decoder`` then performs a genuine chunk-walking,
    sign-aware byte decode — the audio modality twin of the BMP path."""
    import pandas as pd

    from fotmobdatapipeline_spark.multimodal.wav import encode_wav, text_samples

    _ship_for_workers(media, encode_wav, text_samples)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            encoded = pdf["payload"].map(
                lambda b: encode_wav(sample_rate, text_samples(bytes(b), n_samples))
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": encoded,
                    "meta": [
                        {
                            "mime": "audio/wav",
                            "n_bytes": len(b),
                            "sample_rate": sample_rate,
                            "n_samples": n_samples,
                        }
                        for b in encoded
                    ],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(run, schema=AUDIO_SCHEMA)


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] = stub_decoder,
    batch_hint: int | None = None,
) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``mapInPandas`` yields one output row per input row; only
    (doc_id, payload) are read (column pruning drops meta)."""
    import pandas as pd

    _ship_for_workers(media, decoder)
    pruned = media.select("doc_id", "payload")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "header_hex": payloads.map(lambda b: bytes(b[:4]).hex().upper()),
                    "feature": payloads.map(lambda b: decoder(bytes(b))),
                }
            )

    return pruned.mapInPandas(run, schema=FEATURE_SCHEMA)


SIGNAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("energy", LongType()),
        StructField("zero_crossings", LongType()),
        StructField("peak_abs", LongType()),
    ]
)


def extract_wav_signal_stats(media: DataFrame) -> DataFrame:
    """Integer audio signal stats over WAV payloads: energy (sum of
    squared samples), zero crossings, peak amplitude — via a REAL
    decode per payload.  A dedicated LONG schema because energy
    (~n * 32768^2) exceeds float32's 2^24 exact-integer range, so it
    cannot ride the generic FloatType feature array (the float-
    exactness bound the r7 guard documents)."""
    import pandas as pd

    from fotmobdatapipeline_spark.multimodal.wav import wav_signal_features

    _ship_for_workers(media, wav_signal_features)
    pruned = media.select("doc_id", "payload")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            stats = [wav_signal_features(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_samples": [int(s[0]) for s in stats],
                    "energy": [int(s[1]) for s in stats],
                    "zero_crossings": [int(s[2]) for s in stats],
                    "peak_abs": [int(s[3]) for s in stats],
                }
            )

    return pruned.mapInPandas(run, schema=SIGNAL_SCHEMA)


def extract_features_arrow(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] = stub_decoder,
) -> DataFrame:
    """:func:`extract_features` on ``mapInArrow``: RecordBatches flow
    straight from the JVM into pyarrow with no pandas materialization —
    no object-dtype Series for the binary column, no index bookkeeping.
    For wide binary payloads the pandas hop is pure overhead, which is
    why this is the preferred form at scale; tests pin it row-identical
    to the pandas path."""
    import pyarrow as pa

    _ship_for_workers(media, decoder)
    pruned = media.select("doc_id", "payload")

    def run(batches):
        for batch in batches:
            payloads = [b.as_py() for b in batch.column("payload")]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pa.array([len(p) for p in payloads], pa.int32()),
                    pa.array([p[:4].hex().upper() for p in payloads], pa.string()),
                    pa.array([decoder(p) for p in payloads], pa.list_(pa.float32())),
                ],
                names=["doc_id", "n_bytes", "header_hex", "feature"],
            )

    return pruned.mapInArrow(run, schema=FEATURE_SCHEMA)


DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("dhash_hi", LongType()),
        StructField("dhash_lo", LongType()),
    ]
)


def extract_png_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash per PNG payload via the REAL decode —
    a dedicated LONG schema (the extract_wav_signal_stats precedent:
    the 32-bit halves exceed float32's 2^24 exact-integer range, so
    they cannot ride the generic FloatType feature array).  Map-only
    Arrow stage over (doc_id, payload); shuffle-free."""
    import pandas as pd

    from fotmobdatapipeline_spark.multimodal.png import png_dhash

    _ship_for_workers(media, png_dhash)
    pruned = media.select("doc_id", "payload")

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            hashes = [png_dhash(bytes(b)) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "dhash_hi": [int(h[0]) for h in hashes],
                    "dhash_lo": [int(h[1]) for h in hashes],
                }
            )

    return pruned.mapInPandas(run, schema=DHASH_SCHEMA)
