"""Multimodal columns (driver-mandated surface, BASELINE.json:6):
image/audio/video as opaque ``binary`` payloads + typed metadata
structs, with decode / feature-extract / frame-sample operators.

The Spark-side plumbing is real — BinaryType columns, metadata structs,
Arrow-batched ``mapInPandas`` with explicit output schemas, partition
shape — while the actual codec step is STUBBED: image/audio libraries
are not in this container, so ``decode_image`` raises
NotImplementedError and feature extraction uses a deterministic
byte-histogram stand-in. Swapping a real decoder into
``byte_histogram_features``'s inner loop changes nothing structurally.

At 100 TB: payloads dominate row size → keep them in their own parquet
column (columnar pruning skips them unless selected), size
``maxPartitionBytes`` so an Arrow batch of payloads fits executor
memory, and never collect payload columns to the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.batch import scatter

FORMATS = ("png", "jpeg", "wav")
N_HIST_BINS = 8


def attach_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Synthesize an opaque binary payload (UTF-8 bytes of the text —
    the deterministic stand-in for real image/audio bytes) plus a typed
    metadata struct, the schema a real multimodal table would carry."""
    payload = F.encode(F.col(text_col), "UTF-8")
    fmt = F.element_at(
        F.array(*[F.lit(x) for x in FORMATS]),
        (F.col(id_col) % len(FORMATS) + 1).cast("int"),
    )
    meta = F.struct(
        fmt.alias("format"),
        F.length(payload).cast("long").alias("n_bytes"),
        ((F.col(id_col) % 64 + 1) * 16).cast("int").alias("width"),
        ((F.col(id_col) % 48 + 1) * 16).cast("int").alias("height"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB: pixel decode requires an image library not present in this
    container. The signature and schema are the real contract."""
    raise NotImplementedError(
        "image decode requires PIL/opencv (not in this environment); "
        "plug a decoder into byte_histogram_features's mapInPandas loop"
    )


def byte_histogram_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Deterministic fake 'feature extraction': 8-bin byte histogram per
    payload via Arrow-batched ``mapInPandas`` — the exact plumbing
    (batch iterator, binary cells, explicit output schema) a real
    embed/decode UDF uses. The bins come back as scalar ``bin_0…bin_7``
    columns (one histogram bucket each) rather than one array column:
    scalar outputs sort/compare/downstream-aggregate without exploding,
    which is what a feature table at 100 TB wants anyway."""
    n_bins = N_HIST_BINS
    bin_cols = [f"bin_{i}" for i in range(n_bins)]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        shift = 8 - n_bins.bit_length() + 1  # bin = byte >> shift (256/n_bins)
        for pdf in batches:
            feats = np.stack(
                [
                    np.bincount(
                        np.frombuffer(payload, dtype=np.uint8) >> shift,
                        minlength=n_bins,
                    )
                    for payload in pdf[payload_col]
                ]
            ) if len(pdf) else np.zeros((0, n_bins), dtype=np.int64)
            out = {id_col: pdf[id_col]}
            for i, c in enumerate(bin_cols):
                out[c] = feats[:, i].astype("int64")
            yield pd.DataFrame(out)

    schema = f"{id_col} long, " + ", ".join(f"{c} long" for c in bin_cols)
    return scatter(df).mapInPandas(extract, schema=schema)


THUMB_STRIDE = 8


def thumbnail_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    stride: int = THUMB_STRIDE,
) -> DataFrame:
    """'Resize' stand-in with REAL data movement: strided byte
    downsample of the payload (every ``stride``-th byte) plus the
    metadata update a real thumbnailer performs (width/height ÷ stride,
    new byte count, content checksum). The Arrow ``mapInPandas``
    plumbing — binary in, scalar feature columns out, per-batch numpy —
    is exactly what a PIL/opencv ``resize`` drops into; only the inner
    two lines change.

    Emits the checksum rather than the thumb bytes so the result
    canonicalizes as a relational table; the bytes themselves are
    ``arr.tobytes()`` away."""

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            thumb_n, checksum = [], []
            for payload in pdf[payload_col]:
                arr = np.frombuffer(payload, dtype=np.uint8)[::stride]
                thumb_n.append(len(arr))
                checksum.append(int(arr.sum(dtype=np.int64)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "thumb_w": pdf["width"] // stride,
                    "thumb_h": pdf["height"] // stride,
                    "thumb_n_bytes": pd.Series(thumb_n, dtype="int64"),
                    "thumb_checksum": pd.Series(checksum, dtype="int64"),
                }
            )

    staged = scatter(df).select(
        F.col(id_col),
        F.col(payload_col),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    schema = (
        f"{id_col} long, width int, height int, thumb_w int, thumb_h int, "
        "thumb_n_bytes long, thumb_checksum long"
    )
    return staged.mapInPandas(shrink, schema=schema)


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    n_frames_col: str = "n_frames",
    stride: int = 10,
) -> DataFrame:
    """Video frame sampling: every ``stride``-th frame index per clip —
    an explode, so downstream per-frame operators parallelize over
    frames, not clips (the skew fix for long videos)."""
    idx = F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(stride))
    return df.select(
        F.col(id_col),
        F.col(n_frames_col),
        F.explode(idx).alias("frame_idx"),
    )


AUDIO_FRAME = 256


def audio_frame_energy(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame: int = AUDIO_FRAME,
) -> DataFrame:
    """Audio feature extraction stand-in with REAL per-frame math: the
    payload bytes are read as unsigned 8-bit PCM samples, split into
    ``frame``-sample frames (last frame ragged), and each frame emits
    its length and energy — sum of squared deviation from the 128
    midpoint, the integer core of an RMS/VAD stage. A real codec
    (librosa/soundfile decode, mel filterbank) drops into the same
    ``mapInPandas`` loop without touching the plumbing: binary in,
    exploded (clip, frame) rows out, so downstream work parallelizes
    over frames rather than clips — the skew fix for hour-long audio.

    Exact integer energies make the stage oracle-checkable and
    engine-portable (no float accumulation order to disagree on)."""

    def energies(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, idxs, lens, engs = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n = len(arr)
                if n == 0:
                    continue
                d2 = (arr - 128) ** 2
                starts = np.arange(0, n, frame)
                per_frame = np.add.reduceat(d2, starts)
                n_frames = len(starts)
                ids.extend([doc_id] * n_frames)
                idxs.extend(range(n_frames))
                full, rem = divmod(n, frame)
                lens.extend([frame] * full + ([rem] if rem else []))
                engs.extend(int(x) for x in per_frame)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_len": pd.Series(lens, dtype="int64"),
                    "energy": pd.Series(engs, dtype="int64"),
                }
            )

    schema = f"{id_col} long, frame_idx long, frame_len long, energy long"
    return scatter(df).mapInPandas(energies, schema=schema)
