"""Multimodal columns (driver-mandated surface, BASELINE.json:6):
image/audio/video as opaque ``binary`` payloads + typed metadata
structs, with decode / feature-extract / frame-sample operators.

The Spark-side plumbing is real — BinaryType columns, metadata structs,
Arrow-batched ``mapInPandas`` with explicit output schemas, partition
shape — and so is the image codec: ``decode_image`` decodes PNG via a
pure-stdlib zlib/filter codec (``decode_png``) and prefers PIL when it
is importable (gated import-try), degrading PER ROW — an undecodable
payload yields ``decode_ok = false`` with NULL features, never a task
failure. Audio/video stay deterministic stand-ins (byte histogram /
fixed-stride frame sampling) because those libs aren't in this
container; swapping a real decoder into the inner loop changes nothing
structurally.

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


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png(arr) -> bytes:
    """Minimal PNG writer (pure stdlib zlib + the public PNG spec):
    8-bit grayscale/RGB/RGBA, non-interlaced, filter 0 scanlines. The
    fixture generator for the decode path — synthetic image payloads in
    tests and catalog queries come from here."""
    import binascii
    import struct
    import zlib

    h, w = arr.shape[:2]
    if arr.ndim == 2:
        color_type = 0
    elif arr.shape[2] == 3:
        color_type = 2
    elif arr.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported channel count {arr.shape[2]}")

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", binascii.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes):
    """Minimal PNG reader (pure stdlib, public spec): 8-bit
    grayscale/RGB/RGBA, non-interlaced, all five scanline filters
    (None/Sub/Up/Average/Paeth), CRC-verified chunks. Returns a numpy
    uint8 array (h, w) or (h, w, channels). Raises ValueError on
    anything outside that envelope — callers degrade the row, not the
    batch."""
    import binascii
    import struct
    import zlib

    import numpy as np

    if bytes(data[:8]) != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat = 8, b""
    w = h = color_type = None
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        if pos + 12 + length > len(data):
            # the documented contract is ValueError on any malformed
            # input — without this, a declared length overrunning the
            # buffer surfaces as struct.error from the short CRC slice
            raise ValueError("truncated chunk")
        tag = bytes(data[pos + 4 : pos + 8])
        body = bytes(data[pos + 8 : pos + 8 + length])
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if binascii.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            try:
                w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
            except struct.error as ex:
                # wrong-length IHDR body (CRC can still be valid on
                # crafted input): documented contract is ValueError
                raise ValueError(f"malformed IHDR: {ex}") from ex
            if depth != 8 or interlace != 0 or color_type not in (0, 2, 6):
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("truncated PNG")
    channels = {0: 1, 2: 3, 6: 4}[color_type]
    stride = w * channels
    try:
        raw = zlib.decompress(idat)
    except zlib.error as ex:
        # CRC-valid chunks can still carry a non-zlib payload on
        # crafted input: documented contract is ValueError
        raise ValueError(f"bad IDAT stream: {ex}") from ex
    if len(raw) != h * (stride + 1):
        raise ValueError("scanline data size mismatch")
    img = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if f == 0:
            pass
        elif f == 2:  # Up
            line = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth need the left pixel
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if f == 1:
                    line[i] = (line[i] + a) & 0xFF
                elif f == 3:
                    line[i] = (line[i] + (a + b) // 2) & 0xFF
                else:  # Paeth predictor, per the spec
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[i] = (line[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter {f}")
        prev = line
        img[y] = line.astype(np.uint8)
    return img.reshape(h, w, channels) if channels > 1 else img.reshape(h, w)


def _decode_payload_bytes(payload: bytes):
    """One payload → pixel array. Prefers PIL when installed (any
    format it knows); falls back to the built-in PNG reader, so the
    decode path is REAL in environments without image libraries. Raises
    on undecodable payloads — the mapInPandas wrapper degrades the row."""
    try:
        from io import BytesIO

        from PIL import Image  # optional dependency, absent in CI

        import numpy as np

        with Image.open(BytesIO(bytes(payload))) as im:
            return np.asarray(im)
    except ImportError:
        return decode_png(bytes(payload))


def decode_image(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL image decode over a binary payload column (completes the
    multimodal story the r1-r4 stub documented): Arrow-batched
    ``mapInPandas``, one decoded row per payload with dimensions,
    channel count, and an exact pixel checksum (sum of all channel
    values — the deterministic, engine-portable stand-in for a feature
    vector). A payload that fails to decode (wrong format, corrupt
    bytes, unsupported variant) emits ``decode_ok = false`` with NULL
    features instead of failing the micro-batch — per-record
    degradation, the same posture as the sink's rejection repair.

    Decoder selection is feature-gated per executor: PIL when
    installed, else the built-in pure-stdlib PNG reader — so the path
    executes (not just type-checks) in this container. At 100 TB the
    payload column stays unprojected until this operator, Arrow batch
    size bounds executor memory, and the per-row python work is the
    codec itself — the irreducible cost of a decode stage."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ok, ws, hs, cs, sums = [], [], [], [], []
            for payload in pdf[payload_col]:
                try:
                    arr = _decode_payload_bytes(payload)
                    h, w = arr.shape[:2]
                    c = 1 if arr.ndim == 2 else arr.shape[2]
                    ok.append(True)
                    ws.append(w)
                    hs.append(h)
                    cs.append(c)
                    sums.append(int(arr.sum(dtype="int64")))
                except Exception:
                    ok.append(False)
                    ws.append(None)
                    hs.append(None)
                    cs.append(None)
                    sums.append(None)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "decode_ok": pd.Series(ok, dtype="bool"),
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "channels": pd.Series(cs, dtype="Int32"),
                    "pixel_checksum": pd.Series(sums, dtype="Int64"),
                }
            )

    schema = (
        f"{id_col} long, decode_ok boolean, width int, height int, "
        "channels int, pixel_checksum long"
    )
    return scatter(df).mapInPandas(run, schema=schema)


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
