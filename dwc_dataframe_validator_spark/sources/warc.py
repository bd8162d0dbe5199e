"""WARC (Web ARChive, ISO 28500) source — the file format the web
arrives in.

Common Crawl and every serious crawl pipeline ship WARC: a
concatenation of records, each a ``WARC/1.x`` header block
(``Name: value`` lines, CRLF-terminated, ending with a blank line)
followed by ``Content-Length`` payload bytes and a ``\\r\\n\\r\\n``
record separator.  Production archives are usually
gzip-PER-RECORD (each record its own gzip member, so members can be
decompressed independently); plain-text WARCs also exist.

Reference parity: none — sources extend the LLM-pipeline family
(SURVEY.md "beyond the reference" brief; the reference reads only
DwC-A/CSV archives).

Scale design: WARC files are NOT line-splittable, so the unit of
parallelism is the FILE (Common Crawl ships ~1 GB segments — tens of
thousands of files per dump, far more than any executor count).
``read_warc`` uses ``spark.read.format("binaryFile")`` (one row per
file, streamed through Arrow batches) and parses records per file in
``mapInPandas`` — pure byte walking, no Python-per-row UDF, no
driver-side work, and a malformed record yields an ``ok=false`` row
rather than a task failure (one bad record in a 100 TB crawl must
never kill the job).  Payload truncation is available at parse time
(``max_payload``) so the scan never materializes bodies larger than
the pipeline wants.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_RECORD_SCHEMA = (
    "path string, record_index long, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length long, payload binary, ok boolean"
)

# headers the schema surfaces; everything else in the block is ignored
_H_TYPE = b"warc-type"
_H_URI = b"warc-target-uri"
_H_DATE = b"warc-date"
_H_CTYPE = b"content-type"
_H_CLEN = b"content-length"

_GZIP_MAGIC = b"\x1f\x8b"


def _parse_header_block(block: bytes) -> dict | None:
    """Parse one CRLF header block (first line ``WARC/x.y``).  Returns
    the lowercased-name header dict or None if malformed.  Folded
    continuation lines (leading space/tab — legal WARC/1.0 grammar)
    append to the previous value; other junk lines are skipped
    leniently (a stray line must not discard a record whose
    Content-Length IS present and valid)."""
    lines = block.split(b"\r\n")
    if not lines or not lines[0].startswith(b"WARC/"):
        return None
    out = {}
    last = None
    for ln in lines[1:]:
        if not ln:
            continue
        if ln[:1] in (b" ", b"\t") and last is not None:
            out[last] = out[last] + b" " + ln.strip()
            continue
        name, sep, val = ln.partition(b":")
        if not sep:
            last = None          # junk line: skip, stay lenient
            continue
        last = name.strip().lower()
        out[last] = val.strip()
    return out


#: parse_warc_member_at verdicts
_MALFORMED, _INCOMPLETE = 0, 1


def parse_warc_member_at(buf, pos: int, eof: bool):
    """Parse ONE record starting at offset ``pos`` of ``buf`` WITHOUT
    copying the remaining tail (a tail copy per record is quadratic in
    file size).  Returns ``(headers, payload, new_pos)`` on success,
    ``(None, _INCOMPLETE, pos)`` when more bytes could complete the
    record (only possible while ``eof`` is False), and ``(None,
    _MALFORMED, pos)`` on bytes no suffix can repair.  Never raises."""
    end = buf.find(b"\r\n\r\n", pos)
    if end < 0:
        return (None, _MALFORMED if eof else _INCOMPLETE, pos)
    headers = _parse_header_block(bytes(buf[pos:end]))
    if headers is None:
        return None, _MALFORMED, pos
    try:
        clen = int(headers.get(_H_CLEN, b"").decode("ascii"))
    except (ValueError, UnicodeDecodeError):
        return None, _MALFORMED, pos
    start = end + 4
    if clen < 0:
        return None, _MALFORMED, pos
    if start + clen > len(buf):
        return (None, _MALFORMED if eof else _INCOMPLETE, pos)
    payload = bytes(buf[start : start + clen])
    consumed = start + clen
    # the two CRLFs closing the record (tolerate their absence at EOF)
    if buf[consumed : consumed + 4] == b"\r\n\r\n":
        consumed += 4
    return headers, payload, consumed


def parse_warc_member(b: bytes):
    """Parse ONE record from the head of ``b`` (already decompressed).
    Returns ``(headers, payload, bytes_consumed)`` or ``(None, None,
    0)`` on malformed input.  Never raises on bad bytes."""
    headers, payload, new_pos = parse_warc_member_at(b, 0, eof=True)
    if headers is None:
        return None, None, 0
    return headers, payload, new_pos


_CHUNK = 1 << 20


def iter_warc_records(raw: bytes):
    """Yield ``(headers, payload, ok)`` for every record in a WARC
    file's bytes.  Gzip input (single-stream or per-record members) is
    decompressed INCREMENTALLY — peak memory is the compressed input
    plus one record plus one chunk, never the whole decompressed file.
    Records are walked by Content-Length at offsets (no tail copies).
    A record no further bytes can repair yields one ``(None, None,
    False)`` row and scanning stops — without a valid Content-Length
    the next boundary is unknowable."""
    if raw[:2] == _GZIP_MAGIC:
        gz = gzip.GzipFile(fileobj=io.BytesIO(raw))
        buf = bytearray()
        pos = 0
        eof = False
        while True:
            if not eof:
                try:
                    chunk = gz.read(_CHUNK)
                except OSError:
                    yield None, None, False
                    return
                if chunk:
                    buf += chunk
                else:
                    eof = True
            while pos < len(buf):
                headers, payload, new_pos = parse_warc_member_at(
                    buf, pos, eof
                )
                if headers is None:
                    if payload == _INCOMPLETE:
                        break        # need more decompressed bytes
                    yield None, None, False
                    return
                yield headers, payload, True
                pos = new_pos
            if eof:
                return
            if pos:
                del buf[:pos]        # drop consumed prefix, stay O(record)
                pos = 0
        return
    pos = 0
    while pos < len(raw):
        headers, payload, new_pos = parse_warc_member_at(raw, pos, True)
        if headers is None:
            yield None, None, False
            return
        yield headers, payload, True
        pos = new_pos


def _parse_warc_files(
    files: DataFrame,
    warc_types: tuple = ("response",),
    max_payload: int | None = None,
) -> DataFrame:
    """Shared per-file parse used by ``read_warc`` (batch) and
    ``stream_warc`` (streaming) — one parser, so stream ≡ batch by
    construction."""
    keep = None if warc_types is None else {t.lower() for t in warc_types}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for i, (h, payload, ok) in enumerate(
                    iter_warc_records(bytes(content))
                ):
                    if not ok:
                        rows.append(
                            (p, i, None, None, None, None, None, None,
                             False)
                        )
                        continue
                    wtype = h.get(_H_TYPE, b"").decode(
                        "utf-8", "replace"
                    )
                    if keep is not None and wtype.lower() not in keep:
                        continue
                    # content_length reports the record's DECLARED
                    # payload size even when max_payload truncates the
                    # bytes we keep — truncation must not silently
                    # shrink the reported length
                    declared_len = len(payload)
                    if max_payload is not None:
                        payload = payload[: int(max_payload)]
                    rows.append(
                        (
                            p,
                            i,
                            wtype,
                            h.get(_H_URI, b"").decode("utf-8", "replace")
                            or None,
                            h.get(_H_DATE, b"").decode("utf-8", "replace")
                            or None,
                            h.get(_H_CTYPE, b"").decode(
                                "utf-8", "replace"
                            )
                            or None,
                            declared_len,
                            payload,
                            True,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "record_index", "warc_type", "target_uri",
                    "warc_date", "content_type", "content_length",
                    "payload", "ok",
                ],
            )

    return files.select("path", "content").mapInPandas(
        run, WARC_RECORD_SCHEMA
    )


def read_warc(
    spark: SparkSession,
    path: str | list[str],
    warc_types: tuple = ("response",),
    max_payload: int | None = None,
) -> DataFrame:
    """Read WARC file(s) into ``WARC_RECORD_SCHEMA`` rows.

    ``warc_types`` filters records by ``WARC-Type`` (crawl pipelines
    want ``response``; pass ``None`` for everything).  ``max_payload``
    truncates payload bytes AT PARSE TIME so oversized bodies never
    cross the Arrow boundary; ``content_length`` still reports the
    record's declared (pre-truncation) payload size, so
    ``content_length > length(payload)`` marks truncated rows.  One
    row per record; a malformed record produces ``ok=false`` with NULL
    fields."""
    files = spark.read.format("binaryFile").load(path)
    return _parse_warc_files(files, warc_types, max_payload)


def decode_warc_records(
    df: DataFrame, content_col: str = "record", id_col: str = "id"
) -> DataFrame:
    """Parse a BINARY COLUMN of single WARC records — the
    record-per-row shape a Kafka/stream feed or an exploded archive
    delivers (``read_warc`` is the whole-file face; this is the
    columnar one, same parser core).  Arrow-batched ``mapInPandas``,
    one ``parse_warc_member`` call per blob; NULL or malformed blobs
    yield ``ok=false`` rows with NULL fields, never task failures.
    The id column keeps its name AND type (string keys from a Kafka
    feed work as-is — the output schema is derived, not hardcoded)."""
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"`{id_col}` {id_type}, warc_type string, target_uri string, "
        "warc_date string, content_type string, content_length long, "
        "payload binary, ok boolean"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bad = (None, None, None, None, None, None, False)
        for pdf in batches:
            rows = []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                if blob is None:
                    rows.append((i, *bad))
                    continue
                b = bytes(blob)
                if b[:2] == _GZIP_MAGIC:
                    try:
                        b = gzip.decompress(b)
                    except OSError:
                        rows.append((i, *bad))
                        continue
                h, payload, _ = parse_warc_member(b)
                if h is None:
                    rows.append((i, *bad))
                    continue
                dec = lambda k: (  # noqa: E731
                    h.get(k, b"").decode("utf-8", "replace") or None
                )
                rows.append(
                    (i, dec(_H_TYPE), dec(_H_URI), dec(_H_DATE),
                     dec(_H_CTYPE), len(payload), payload, True)
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "warc_type", "target_uri", "warc_date",
                         "content_type", "content_length", "payload",
                         "ok"],
            )

    return df.select(
        df[id_col].alias(id_col), df[content_col].alias(content_col)
    ).mapInPandas(run, out_schema)


def build_warc_record(
    uri: str,
    payload: bytes,
    warc_type: str = "response",
    date: str = "2026-01-01T00:00:00Z",
    content_type: str = "text/plain",
) -> bytes:
    """Serialize one plain (uncompressed) WARC record — the writer
    half used by tests and the round-trip oracle; gzip-per-record
    writing is ``gzip.compress`` of this."""
    head = (
        b"WARC/1.0\r\n"
        + f"WARC-Type: {warc_type}\r\n".encode()
        + f"WARC-Target-URI: {uri}\r\n".encode()
        + f"WARC-Date: {date}\r\n".encode()
        + f"Content-Type: {content_type}\r\n".encode()
        + f"Content-Length: {len(payload)}\r\n".encode()
    )
    return head + b"\r\n" + payload + b"\r\n\r\n"


_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, "
    "content binary"
)


def stream_warc(
    spark: SparkSession,
    path: str,
    warc_types: tuple = ("response",),
    max_payload: int | None = None,
) -> DataFrame:
    """STREAMING face of ``read_warc``: WARC files LANDING in ``path``
    become a live record stream (same ``WARC_RECORD_SCHEMA`` rows,
    same per-file Arrow parse — ``mapInPandas`` applies to streaming
    frames unchanged).  Feed it straight into
    ``streaming.ingest.corpus_ingest_sink`` for continuous
    crawl→corpus construction; the file source's checkpoint tracks
    which archives are consumed, and the sink's commit markers make
    each batch replay-safe.  The streaming binaryFile source requires
    an explicit schema — pinned here to the format's fixed columns.

    Unlike the batch face, the STREAMING file source takes ONE path
    (a directory or glob) — a list raises in
    ``DataStreamReader.load``; attach one sink per landing directory.

    Stream ≡ batch by construction (one shared parser); pinned in
    pytest by draining a directory and comparing to ``read_warc``."""
    files = spark.readStream.format("binaryFile").schema(
        _BINARYFILE_SCHEMA
    ).load(path)
    return _parse_warc_files(files, warc_types, max_payload)
