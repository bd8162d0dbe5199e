"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side contract is real and tested — binary content column,
metadata struct, Arrow-batched ``mapInPandas`` decode/feature plumbing
with explicit output schemas.  ``decode_images`` uses PIL when it is
importable (guarded import — no hard dependency); without PIL it
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder derives dimensions from the bytes (stable
for tests).  Video frame sampling mirrors the same pattern: imageio
(+pyav/ffmpeg) when importable, else the deterministic byte-offset
stub behind ``fake=True`` / ``NotImplementedError``.

Scale notes (100 TB):
- binary payloads ride in parquet as BYTE_ARRAY; metadata-only queries
  (size, hash, mime) never deserialize the payload thanks to column
  pruning — keep metadata in separate columns, not inside the blob.
- decode is a map-side Arrow batch pipeline: no shuffle, batch size
  bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — size it
  so batch_rows × avg_blob_bytes fits the executor Arrow buffer.
- frame sampling EXPANDS rows (1 video → n frames); the output schema
  carries (id, frame_idx) so downstream repartition can spread frames.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_META_SCHEMA = "id long, width int, height int, channels int, ok boolean"
FRAME_SCHEMA = "id long, frame_idx int, frame_bytes binary"


def attach_text_blob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Demo blob builder: UTF-8 bytes of a text column as the binary
    payload plus a typed metadata struct — the same shape a real
    image/audio table would use."""
    blob = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("id"),
        blob.alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(blob).alias("n_bytes"),
        ).alias("meta"),
    )


def blob_metadata(df: DataFrame, content_col: str = "content", id_col: str = "id") -> DataFrame:
    """Metadata-only projection: size + sha256 — all built-ins, no
    Python, and the blob column is the only payload read."""
    c = F.col(content_col)
    return df.select(
        F.col(id_col),
        F.length(c).alias("n_bytes"),
        F.sha2(c, 256).alias("sha256_hex"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake: dimensions derived from a stable digest of
    the payload.  Replace with PIL.Image.open in production."""
    d = hashlib.sha256(payload).digest()
    return 16 + d[0] % 240, 16 + d[1] % 240, 1 + d[2] % 4


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        return False
    return True


def _pil_decode(payload: bytes) -> tuple[int, int, int, bool]:
    """Real decode path: PIL header read (``Image.open`` is lazy — it
    parses the header only, no full pixel decode for metadata)."""
    import io

    import PIL.Image

    try:
        with PIL.Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height, len(im.getbands()), True
    except Exception:  # noqa: BLE001 — corrupt blob → ok=False row
        return 0, 0, 0, False


def decode_images(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "id",
    fake: bool = False,
) -> DataFrame:
    """Arrow-batched image decode returning (id, width, height,
    channels, ok).

    Backend choice, in order: ``fake=True`` forces the deterministic
    stub (stable for tests, any container); otherwise PIL is used if
    importable (corrupt payloads yield ``ok=False`` rows, not task
    failures); otherwise ``NotImplementedError``.  Plumbing, schema and
    Arrow batching are identical on every branch — swapping the decoder
    never changes the plan."""
    use_pil = not fake and _pil_available()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake and not use_pil:
                raise NotImplementedError(
                    "image decoding requires PIL/opencv (not installed); "
                    "pass fake=True for the deterministic stub"
                )
            rows = []
            for i, payload in zip(pdf[id_col], pdf[content_col]):
                if payload is None:
                    rows.append((i, 0, 0, 0, False))
                    continue
                if use_pil:
                    w, h, ch, ok = _pil_decode(bytes(payload))
                else:
                    w, h, ch = _fake_decode(bytes(payload))
                    ok = True
                rows.append((i, w, h, ch, ok))
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "channels", "ok"]
            )

    return df.select(F.col(id_col).alias(id_col), content_col).mapInPandas(
        run, BLOB_META_SCHEMA
    )


def _video_backend_available() -> bool:
    """imageio v3 with any decodable plugin (pyav/ffmpeg) — guarded
    import, mirroring ``_pil_available``."""
    try:
        import imageio.v3  # noqa: F401
    except ImportError:
        return False
    return True


def _imageio_frames(
    payload: bytes, max_frames: int
) -> list[tuple[int, bytes]]:
    """Real frame sampling: decode the container with imageio
    (pyav/ffmpeg underneath), sample up to ``max_frames`` frames with
    an even stride over the available frames, and re-encode each
    sampled frame as PNG bytes for the binary output column.  A
    corrupt/undecodable payload yields ZERO frames (the row-expanding
    analogue of ``_pil_decode``'s ok=False — bad blobs never fail the
    task)."""
    import io

    import imageio.v3 as iio

    try:
        frames = iio.imread(io.BytesIO(payload), index=None)
    except Exception:  # noqa: BLE001 — undecodable blob → no frames
        return []
    if frames.ndim == 3:  # single image decodes as (h, w, c)
        frames = frames[None, ...]
    n_avail = frames.shape[0]
    if n_avail == 0:
        return []
    n = min(max_frames, n_avail)
    step = max(1, n_avail // n)
    out = []
    for k in range(n):
        buf = io.BytesIO()
        iio.imwrite(buf, frames[k * step], extension=".png")
        out.append((k, buf.getvalue()))
    return out


def sample_frames(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "id",
    max_frames: int = 4,
    fake: bool = False,
) -> DataFrame:
    """Row-expanding frame sampler (1 blob → n frames).

    Backend choice mirrors ``decode_images``: ``fake=True`` forces the
    deterministic byte-arithmetic stub (stable for tests and the exact
    byte-offset oracle — registry ``multimodal_frame_sample_check``);
    otherwise imageio(+pyav/ffmpeg) is used when importable (sampled
    frames re-encoded as PNG bytes, undecodable blobs yield zero
    frames); otherwise ``NotImplementedError``.  Plumbing, output
    schema and Arrow batching are identical on every branch."""
    use_video = not fake and _video_backend_available()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake and not use_video:
                raise NotImplementedError(
                    "video decoding requires imageio/pyav/ffmpeg (not "
                    "installed); pass fake=True for the deterministic stub"
                )
            rows = []
            for i, payload in zip(pdf[id_col], pdf[content_col]):
                if payload is None:
                    # null blob → zero frames, matching the null-tolerant
                    # semantics of the other blob operators
                    continue
                b = bytes(payload)
                if use_video:
                    rows.extend(
                        (i, f_idx, fb) for f_idx, fb in _imageio_frames(b, max_frames)
                    )
                    continue
                n = 1 + (len(b) % max_frames)
                step = max(1, len(b) // n)
                for f_idx in range(n):
                    rows.append((i, f_idx, b[f_idx * step : f_idx * step + 16]))
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "frame_bytes"])

    return df.select(F.col(id_col).alias(id_col), content_col).mapInPandas(
        run, FRAME_SCHEMA
    )
