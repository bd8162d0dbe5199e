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
import struct
import zlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_META_SCHEMA = "id long, width int, height int, channels int, ok boolean"
FRAME_SCHEMA = "id long, frame_idx int, frame_bytes binary"
HEADER_META_SCHEMA = (
    "id long, mime string, width int, height int, channels int, "
    "sample_rate int, ok boolean"
)


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
    backend: str = "auto",
) -> DataFrame:
    """Arrow-batched image decode returning (id, width, height,
    channels, ok).

    ``backend`` picks the decoder explicitly: ``"pil"`` (full decode —
    corrupt payloads yield ``ok=False`` rows, not task failures;
    raises ImportError up front if PIL is absent), ``"header"`` (the
    codec-free pure-byte parser ``parse_media_header`` — real
    dimensions for PNG/JPEG/GIF/BMP, runs in any container, but
    validates HEADERS ONLY: a valid header over a truncated/corrupt
    body still reads ``ok=True``), or ``"fake"`` (deterministic test
    stub; ``fake=True`` is a back-compat alias).  Non-image payloads
    (e.g. WAV audio) are ``ok=False`` on every backend — this is an
    IMAGE decoder.

    The default ``"auto"`` = PIL if importable else header — handy
    interactively, but ``ok`` semantics then depend on which container
    ran the job; pin ``backend`` explicitly in any pipeline whose
    downstream gates key on ``ok``.  Plumbing, schema and Arrow
    batching are identical on every branch — swapping the decoder
    never changes the plan."""
    if backend not in ("auto", "pil", "header", "fake"):
        raise ValueError(f"unknown decode backend {backend!r}")
    if fake:
        backend = "fake"
    elif backend == "pil" and not _pil_available():
        raise ImportError(
            "decode_images(backend='pil') requires PIL; install it or "
            "pin backend='header' (header-only validation)"
        )
    elif backend == "auto":
        backend = "pil" if _pil_available() else "header"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf[content_col]):
                if payload is None:
                    rows.append((i, 0, 0, 0, False))
                    continue
                if backend == "pil":
                    w, h, ch, ok = _pil_decode(bytes(payload))
                elif backend == "fake":
                    w, h, ch = _fake_decode(bytes(payload))
                    ok = True
                else:
                    mime, w, h, ch, _, ok = parse_media_header(
                        bytes(payload)
                    )
                    # header backend: only image payloads decode ok —
                    # a parseable WAV is still not an image
                    ok = bool(ok) and (mime or "").startswith("image/")
                    if not ok:
                        w, h, ch = 0, 0, 0
                rows.append((i, w, h, ch, ok))
            yield pd.DataFrame(
                rows, columns=["id", "width", "height", "channels", "ok"]
            )

    return df.select(F.col(id_col).alias(id_col), content_col).mapInPandas(
        run, BLOB_META_SCHEMA
    )


# --------------------------------------------------------------------------
# codec-free REAL decode: pure-byte media header parsing
# --------------------------------------------------------------------------
#
# Image/audio *header* metadata needs no codec — PNG IHDR, JPEG SOFn,
# GIF logical screen, BMP BITMAPINFOHEADER and WAV fmt are all plain
# byte layouts.  This is the real (non-stub) multimodal decode path:
# it runs in any container and at any scale, and reads only the first
# few hundred bytes of each blob.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type → sample channels (spec §11.2.2); palette indexes as 1
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG SOF markers carry frame dimensions: C0–CF minus DHT (C4),
# JPGext (C8) and DAC (CC)
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}

_BAD = (None, None, None, None, None, False)


def _parse_png(b: bytes):
    # signature, then the IHDR chunk MUST come first: length + "IHDR"
    # + width(u32 BE) + height(u32 BE) + bit depth + color type
    if len(b) < 26 or b[12:16] != b"IHDR":
        return _BAD
    w, h = struct.unpack(">II", b[16:24])
    color_type = b[25]
    ch = _PNG_CHANNELS.get(color_type)
    if ch is None or w == 0 or h == 0:
        return _BAD
    return "image/png", w, h, ch, None, True


def _parse_jpeg(b: bytes):
    # segment walk: FF <marker> [u16 BE length incl. itself]; stop at
    # the first SOFn frame header (precision, height, width, ncomp)
    i, n = 2, len(b)
    while i + 3 < n:
        if b[i] != 0xFF:
            return _BAD
        marker = b[i + 1]
        if marker == 0xFF:          # fill bytes before a marker
            i += 1
            continue
        if marker == 0xD9 or marker == 0xDA:
            return _BAD             # EOI / start-of-scan before any SOF
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2                  # standalone markers have no payload
            continue
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        if seg_len < 2:
            return _BAD
        if marker in _JPEG_SOF:
            if i + 9 > n:
                return _BAD
            h, w = struct.unpack(">HH", b[i + 5 : i + 9])
            ncomp = b[i + 9] if i + 9 < n else 0
            if w == 0 or h == 0 or ncomp == 0:
                return _BAD
            return "image/jpeg", w, h, ncomp, None, True
        i += 2 + seg_len
    return _BAD


def _parse_gif(b: bytes):
    # logical screen descriptor: width/height as u16 LE at offset 6/8
    if len(b) < 10:
        return _BAD
    w, h = struct.unpack("<HH", b[6:10])
    if w == 0 or h == 0:
        return _BAD
    return "image/gif", w, h, 3, None, True


def _parse_bmp(b: bytes):
    # BITMAPINFOHEADER (or any later 40+ byte DIB): signed width at
    # 18, signed height at 22 (negative = top-down), bit count at 28
    if len(b) < 30:
        return _BAD
    dib_size = struct.unpack("<I", b[14:18])[0]
    if dib_size < 40:
        return _BAD                 # BITMAPCOREHEADER not supported
    w, h = struct.unpack("<ii", b[18:26])
    bitcount = struct.unpack("<H", b[28:30])[0]
    if w <= 0 or h == 0 or bitcount == 0:
        return _BAD
    return "image/bmp", w, abs(h), max(1, bitcount // 8), None, True


def _parse_wav(b: bytes):
    # RIFF/WAVE chunk walk to "fmt ": channels u16 LE at +2,
    # sample rate u32 LE at +4 within the chunk body
    if len(b) < 12 or b[8:12] != b"WAVE":
        return _BAD
    i, n = 12, len(b)
    while i + 8 <= n:
        cid = b[i : i + 4]
        size = struct.unpack("<I", b[i + 4 : i + 8])[0]
        if cid == b"fmt ":
            if i + 16 > n:
                return _BAD
            channels = struct.unpack("<H", b[i + 10 : i + 12])[0]
            rate = struct.unpack("<I", b[i + 12 : i + 16])[0]
            if channels == 0 or rate == 0:
                return _BAD
            return "audio/wav", None, None, channels, rate, True
        i += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    return _BAD


def parse_media_header(payload: bytes | None):
    """(mime, width, height, channels, sample_rate, ok) from the first
    bytes of a media blob — pure byte parsing, no codec library.
    Formats: PNG (IHDR), JPEG (SOFn scan), GIF (logical screen), BMP
    (BITMAPINFOHEADER), WAV (RIFF fmt chunk).  Any unrecognized,
    truncated or malformed payload yields all-null fields with
    ``ok=False`` — never an exception, so one corrupt blob cannot fail
    a 100 TB scan task."""
    if payload is None or len(payload) < 12:
        return _BAD
    try:
        if payload[:8] == _PNG_SIG:
            return _parse_png(payload)
        if payload[:2] == b"\xff\xd8":
            return _parse_jpeg(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return _parse_gif(payload)
        if payload[:2] == b"BM":
            return _parse_bmp(payload)
        if payload[:4] == b"RIFF":
            return _parse_wav(payload)
    except Exception:  # noqa: BLE001 — malformed blob → ok=False row
        return _BAD
    return _BAD


def decode_media_headers(
    df: DataFrame, content_col: str = "content", id_col: str = "id"
) -> DataFrame:
    """REAL multimodal decode (no stub, no codec dependency):
    Arrow-batched header parse of each binary blob returning
    (id, mime, width, height, channels, sample_rate, ok).

    Scale shape: map-side only — no shuffle; each blob contributes an
    O(1) header scan (JPEG segment walk is bounded by the header
    segments, not the payload), and the parquet reader only
    materializes the two selected columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (i, *parse_media_header(None if p is None else bytes(p)))
                for i, p in zip(pdf[id_col], pdf[content_col])
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "mime", "width", "height", "channels",
                    "sample_rate", "ok",
                ],
            ).astype(
                {
                    "width": "Int32", "height": "Int32",
                    "channels": "Int32", "sample_rate": "Int32",
                }
            )

    return df.select(F.col(id_col).alias("id"), content_col).mapInPandas(
        run, HEADER_META_SCHEMA
    )


# deterministic parameter derivations shared by the builder and the
# SQL oracle (registry ``multimodal_header_meta``): every field of the
# planted header is a pure function of the integer id
_PNG_COLOR_TYPES = [0, 2, 4, 6]       # gray, RGB, gray+alpha, RGBA
_BMP_BITCOUNTS = [8, 24, 32]


def build_media_blob(doc_id: int) -> bytes | None:
    """REAL media bytes for the given id — a valid PNG / JPEG / GIF /
    BMP / WAV header (format cycles with ``doc_id % 5``) whose planted
    dimensions are pure arithmetic in ``doc_id``, so an engine-portable
    oracle can state the expected parse without parsing.  Ids
    divisible by 17 yield a 6-byte truncation of the real header —
    the malformed-blob case (``ok=False``)."""
    fmt = doc_id % 5
    w = 16 + doc_id % 300
    h = 16 + (doc_id // 7) % 300
    if fmt == 0:  # PNG: sig + IHDR chunk with a correct CRC
        color_type = _PNG_COLOR_TYPES[doc_id % 4]
        ihdr = struct.pack(">II5B", w, h, 8, color_type, 0, 0, 0)
        chunk = b"IHDR" + ihdr
        blob = (
            _PNG_SIG
            + struct.pack(">I", len(ihdr))
            + chunk
            + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
        )
    elif fmt == 1:  # JPEG: SOI + APP0(JFIF) + DHT + SOF0 + EOI —
        # the DHT (FFC4) segment sits BEFORE the SOF so the parser's
        # marker walk is genuinely exercised (C4 must not match SOFn)
        ncomp = 1 + (doc_id % 2) * 2
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 72, 72) + b"\x00\x00"
        dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x01\x02"
        sof = (
            b"\xff\xc0"
            + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
            + b"".join(
                struct.pack("3B", c + 1, 0x11, 0) for c in range(ncomp)
            )
        )
        blob = b"\xff\xd8" + app0 + dht + sof + b"\xff\xd9"
    elif fmt == 2:  # GIF89a logical screen descriptor + trailer
        blob = b"GIF89a" + struct.pack("<HH3B", w, h, 0, 0, 0) + b"\x3b"
    elif fmt == 3:  # BMP: file header + BITMAPINFOHEADER
        bitcount = _BMP_BITCOUNTS[doc_id % 3]
        dib = struct.pack("<IiiHH6I", 40, w, h, 1, bitcount, 0, 0, 0, 0, 0, 0)
        blob = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + dib
    else:  # WAV: RIFF/WAVE + fmt chunk + empty data chunk
        channels = 1 + doc_id % 2
        rate = 8000 * (1 + doc_id % 4)
        fmt_body = struct.pack(
            "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
        )
        blob = (
            b"RIFF"
            + struct.pack("<I", 4 + 8 + len(fmt_body) + 8)
            + b"WAVE"
            + b"fmt "
            + struct.pack("<I", len(fmt_body))
            + fmt_body
            + b"data"
            + struct.pack("<I", 0)
        )
    if doc_id % 17 == 0:
        return blob[:6]  # truncated header — the malformed case
    return blob


def attach_media_blob(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, content) with REAL deterministic media bytes per id —
    the fixture generator for the codec-free decode path (production
    blobs come straight off a parquet binary column instead)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "content": [build_media_blob(int(i)) for i in pdf[id_col]],
                }
            )

    return df.select(F.col(id_col).alias(id_col)).mapInPandas(
        run, "id long, content binary"
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
