"""Multimodal-column queries: binary payload + metadata projection,
frame sampling (both oracle-checked), and the Arrow-batched feature
extraction (rows-only — byte-level Python semantics aren't ANSI SQL)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    AUDIO_FRAME,
    FORMATS,
    THUMB_STRIDE,
    attach_payload,
    audio_frame_energy,
    byte_histogram_features,
    frame_sample,
    thumbnail_plan,
)
from ..sources.batch import load_table
from .catalog import query

_FMT_CASE = "CASE doc_id % 3 " + " ".join(
    f"WHEN {i} THEN '{f}'" for i, f in enumerate(FORMATS)
) + " END"

_METADATA_ORACLE = f"""
SELECT doc_id,
       {_FMT_CASE} AS format,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST((doc_id % 64 + 1) * 16 AS INT) AS width,
       CAST((doc_id % 48 + 1) * 16 AS INT) AS height
FROM documents
"""


@query("multimodal_metadata", oracle=_METADATA_ORACLE, tags=("multimodal", "binary"))
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload attach + typed-metadata projection (format,
    byte length, dimensions). The payload column itself is never
    collected — only its metadata, the 100 TB access pattern."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = attach_payload(d)
    return with_payload.select(
        "doc_id",
        F.col("meta.format").alias("format"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


_FRAME_ORACLE = """
SELECT doc_id,
       CAST(n_frames AS BIGINT) AS n_frames,
       CAST(unnest(range(0, n_frames, 10)) AS BIGINT) AS frame_idx
FROM (SELECT doc_id, n_chars % 100 + 1 AS n_frames FROM documents)
"""


@query("multimodal_frame_sample", oracle=_FRAME_ORACLE, tags=("multimodal", "video"))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for synthetic clips (every 10th frame index,
    exploded so per-frame work parallelizes across executors)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("n_chars") % 100 + 1).cast("long").alias("n_frames")
    )
    return frame_sample(d, stride=10)


# The payload is UTF-8 text and the corpus is pure ASCII (verified: zero
# rows match [^\x00-\x7F] at sf0.1), so byte == ord(char) and the 8-bin
# histogram (bin = byte >> 5) IS SQL-expressible: explode char positions,
# bucket by ord()//32, pivot to scalar bins via FILTER.
_HIST_ORACLE = """
WITH b AS (
    SELECT doc_id,
           ord(substring(text, unnest(range(1, length(text) + 1)), 1)) // 32 AS bin
    FROM documents
)
SELECT doc_id,
       """ + ",\n       ".join(
    f"CAST(count(*) FILTER (WHERE bin = {i}) AS BIGINT) AS bin_{i}" for i in range(8)
) + """
FROM b
GROUP BY doc_id
"""


# Strided byte downsample is SQL-expressible on the ASCII payload:
# sampled positions are range(1, n+1, stride) (1-based == numpy [::stride]).
_THUMB_ORACLE = f"""
WITH s AS (
    SELECT doc_id,
           (doc_id % 64 + 1) * 16 AS width,
           (doc_id % 48 + 1) * 16 AS height,
           ord(substring(text, unnest(range(1, length(text) + 1, {THUMB_STRIDE})), 1)) AS b
    FROM documents
)
SELECT doc_id,
       CAST(width AS INT) AS width,
       CAST(height AS INT) AS height,
       CAST(width // {THUMB_STRIDE} AS INT) AS thumb_w,
       CAST(height // {THUMB_STRIDE} AS INT) AS thumb_h,
       CAST(count(*) AS BIGINT) AS thumb_n_bytes,
       CAST(sum(b) AS BIGINT) AS thumb_checksum
FROM s
GROUP BY doc_id, width, height
"""


@query("multimodal_thumbnail_plan", oracle=_THUMB_ORACLE, tags=("multimodal", "resize"))
def multimodal_thumbnail_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize/thumbnail stage: strided byte downsample of every payload
    (real Arrow-batched data movement — the deterministic stand-in for a
    PIL resize) with the metadata update (dims ÷ stride, new byte
    count) and a content checksum proving WHICH bytes were kept."""
    d = load_table(spark, sf_dir, "documents")
    return thumbnail_plan(attach_payload(d))


# The payload is pure-ASCII UTF-8 (see _HIST_ORACLE note), so the
# "PCM samples" are ord(char) and per-frame integer energy is
# SQL-expressible: bucket 1-based positions by (pos-1)//frame.
_AUDIO_ORACLE = f"""
WITH s AS (
    SELECT doc_id,
           (p.pos - 1) // {AUDIO_FRAME} AS frame_idx,
           ord(substring(text, p.pos, 1)) AS b
    FROM documents, LATERAL (SELECT unnest(range(1, length(text) + 1)) AS pos) p
)
SELECT doc_id,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(count(*) AS BIGINT) AS frame_len,
       CAST(sum((b - 128) * (b - 128)) AS BIGINT) AS energy
FROM s
GROUP BY doc_id, frame_idx
"""


@query("multimodal_audio_energy", oracle=_AUDIO_ORACLE, tags=("multimodal", "audio", "pandas-udf"))
def multimodal_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame audio energy (256-sample frames over the byte payload
    read as 8-bit PCM): Arrow-batched ``mapInPandas`` exploding each
    clip into (frame_idx, frame_len, energy) rows — the VAD/feature
    stage of an audio curation pipeline, with exact-integer energies so
    the whole stage hash-matches the SQL oracle."""
    d = load_table(spark, sf_dir, "documents")
    return audio_frame_energy(attach_payload(d))


@query("multimodal_byte_histogram", oracle=_HIST_ORACLE, tags=("multimodal", "pandas-udf"))
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary payloads
    (8-bin byte histogram — the deterministic decoder stand-in), emitted
    as scalar ``bin_0…bin_7`` columns so the result canonicalizes like
    any relational table."""
    d = load_table(spark, sf_dir, "documents")
    return byte_histogram_features(attach_payload(d))


# The encode->decode round trip is the identity on pixels, so the
# oracle computes the SAME stats directly from the deterministic pixel
# formula — a real decode bug (filter math, channel order, dimension
# swap) breaks the checksum. Corrupt payloads (every 10th doc gets its
# PNG magic clobbered) must degrade per-row.
_DECODE_W, _DECODE_H = 16, 12
_DECODE_ORACLE = f"""
SELECT doc_id,
       (doc_id % 10 <> 0) AS decode_ok,
       CASE WHEN doc_id % 10 <> 0 THEN {_DECODE_W} END AS width,
       CASE WHEN doc_id % 10 <> 0 THEN {_DECODE_H} END AS height,
       CASE WHEN doc_id % 10 <> 0 THEN 1 END AS channels,
       CASE WHEN doc_id % 10 <> 0 THEN (
           SELECT CAST(sum((doc_id * 31 + i * 7) % 256) AS BIGINT)
           FROM range({_DECODE_W * _DECODE_H}) t(i)
       ) END AS pixel_checksum
FROM documents
"""


# binaryFile-source ingest: the one mandated file format the scan family
# didn't exercise yet. The fixture generator writes PNGs (same
# deterministic pixel formula as multimodal_image_decode) as REAL FILES
# once per (sf_dir, count) into an atomically-published stage — at
# 100 TB the images already exist as files and only the scan+decode below
# is the operator; the generator stands in for the upstream crawler.
_BINFILE_COUNT = 200


def _staged_png_dir(spark: SparkSession, sf_dir: str) -> str:
    import hashlib
    import os
    import tempfile
    import uuid

    import numpy as np

    from ..operators.multimodal import encode_png
    from .streaming_queries import _publish_stage_dir

    src = os.path.realpath(f"{sf_dir}/documents.parquet")
    st = os.stat(src)
    # the key covers the pixel-formula inputs too (ADVICE r7): a stage
    # built under old _DECODE_W/_DECODE_H (or an older pixel/encode
    # formula — bump the version token when it changes) must not be
    # reused, or the query fails its oracle confusingly instead of
    # rebuilding
    key = hashlib.md5(
        f"{src}|{st.st_mtime_ns}|{st.st_size}|{_BINFILE_COUNT}"
        f"|{_DECODE_W}x{_DECODE_H}|pxv1".encode()
    ).hexdigest()[:16]
    stage = os.path.join(tempfile.gettempdir(), f"png_binfile_{key}")
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        ids = [
            r[0]
            for r in load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < _BINFILE_COUNT)
            .select("doc_id")
            .collect()
        ]
        build = f"{stage}.build-{os.getpid()}-{uuid.uuid4().hex[:8]}"
        os.makedirs(build)
        for doc_id in ids:
            px = (
                ((int(doc_id) * 31 + np.arange(_DECODE_W * _DECODE_H) * 7) % 256)
                .astype(np.uint8)
                .reshape(_DECODE_H, _DECODE_W)
            )
            with open(os.path.join(build, f"{int(doc_id):06d}.png"), "wb") as f:
                f.write(encode_png(px))
        with open(os.path.join(build, "_SUCCESS"), "w") as f:
            f.write("ok")
        _publish_stage_dir(build, stage, "_SUCCESS")
    return stage


_BINFILE_ORACLE = f"""
SELECT doc_id,
       CAST(TRUE AS BOOLEAN) AS decode_ok,
       CAST({_DECODE_W} AS INT) AS width,
       CAST({_DECODE_H} AS INT) AS height,
       CAST(1 AS INT) AS channels,
       (SELECT CAST(sum((doc_id * 31 + i * 7) % 256) AS BIGINT)
        FROM range({_DECODE_W * _DECODE_H}) t(i)) AS pixel_checksum
FROM documents
WHERE doc_id < {_BINFILE_COUNT}
"""


@query(
    "multimodal_binaryfile_scan",
    oracle=_BINFILE_ORACLE,
    tags=("multimodal", "source", "binaryfile", "image", "decode"),
)
def multimodal_binaryfile_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-directory ingest through Spark's ``binaryFile`` source —
    the real entry point of a multimodal pipeline (a crawler's output is
    FILES, not parquet): ``spark.read.format("binaryFile")`` with a
    ``pathGlobFilter`` yields (path, length, content) rows, the doc id
    is parsed from the file name, and the payloads flow through the same
    Arrow-batched ``decode_image`` as the parquet-sourced decode query.
    The oracle recomputes every feature from the deterministic pixel
    formula, so the whole scan→parse→decode chain is value-checked. At
    100 TB: binaryFile parallelizes across files (one row per file,
    splittable=false), so a million-image directory scans wide; keep
    ``maxPartitionBytes``-sized Arrow batches and the decode stays the
    irreducible per-row cost."""
    stage = _staged_png_dir(spark, sf_dir)
    from ..operators.multimodal import decode_image

    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.png")
        .load(stage)
    )
    with_id = bf.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.png$", 1).cast("long").alias(
            "doc_id"
        ),
        F.col("content").alias("payload"),
    )
    return decode_image(with_id)


@query(
    "multimodal_image_decode",
    oracle=_DECODE_ORACLE,
    tags=("multimodal", "image", "decode", "pandas-udf"),
)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end (closes the r1-r4 stub): each doc
    gets a deterministic 16×12 grayscale image (pixel i = (doc_id·31 +
    i·7) mod 256) ENCODED to actual PNG bytes and DECODED back through
    ``decode_image`` — PIL when installed, else the built-in
    pure-stdlib PNG reader — inside Arrow-batched ``mapInPandas``.
    Every 10th payload is corrupted (magic clobbered) and must emit
    ``decode_ok = false`` with NULL features rather than failing the
    batch. The oracle recomputes dimensions/channels/checksum from the
    pixel formula: encode→decode is the identity, so any codec defect
    hash-mismatches."""
    from collections.abc import Iterator

    import pandas as pd

    from ..operators.multimodal import decode_image, encode_png

    w, h = _DECODE_W, _DECODE_H

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                px = ((int(doc_id) * 31 + np.arange(w * h) * 7) % 256).astype(
                    np.uint8
                ).reshape(h, w)
                png = encode_png(px)
                if int(doc_id) % 10 == 0:
                    png = b"\x00" * 8 + png[8:]  # clobber the magic
                payloads.append(png)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    with_png = d.mapInPandas(synth, schema="doc_id long, payload binary")
    return decode_image(with_png)
