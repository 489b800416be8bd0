"""WARC / WET source connector — the native Common-Crawl formats.

The north star targets "Common-Crawl-style web pages"; at 100 TB the
raw inputs are WARC archives (ISO 28500: headered records with binary
HTTP payloads) and their WET text conversions.  This connector parses
both into the repo's pages shape with no third-party warc library:

- ``read_warc``  -> one row per record: ``(url, warc_ts, record_type,
  content_type, payload binary)``
- ``read_wet``   -> conversion records decoded to ``(url, warc_ts,
  text)``
- ``pages_from_warc`` -> north-rule pages schema ``(url, warc_ts,
  html, text, lang)``: response records with the HTTP envelope
  stripped, ``text`` extracted by the deterministic extractor
  (operators/derived.extract_text_from_html) so the per-row
  byte-identity invariant carries over from the pages table.

Scale contract (same as read_zst_lines): ``binaryFile`` ships each
archive to one task and records are parsed in a single streamed pass,
so parallelism == file count.  That matches how Common Crawl is laid
out (a crawl is ~64k-90k archives of ~1 GiB) and how production Spark
WARC jobs (e.g. the public sparkcc pattern) schedule: many medium
shards, never one giant file.  Member-gzip archives (.warc.gz — each
record its own gzip member, the CC on-disk format) are decompressed
incrementally member-by-member; plain ``.warc`` parses as-is.

Malformed records (bad header block, short payload) are SKIPPED and
counted per task in the ``n_bad`` accumulator column of
``read_warc_with_stats`` — never silently absorbed into neighbouring
records, because resynchronization happens on the next ``WARC/``
version line.
"""
from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "read_warc", "read_warc_stream", "read_warc_with_stats", "read_wet",
    "pages_from_warc", "parse_warc_bytes", "write_warc_bytes",
    "IncrementalWarcParser",
]

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"
_MAX_HEADER_BYTES = 1 << 20  # a WARC header block is KBs; 1 MiB = junk


def _gunzip_members(raw: bytes, chunk: int = 1 << 20) -> bytes:
    """Decompress concatenated gzip members (the .warc.gz layout);
    plain (non-gzip) input is returned unchanged.  Single
    implementation: delegates to :func:`_iter_decompressed`, so batch
    and streaming readers share one member-loop semantics (truncated
    trailing member = clean stop; corrupt member = ``zlib.error``)."""
    import io

    return b"".join(_iter_decompressed(io.BytesIO(raw), chunk))


class IncrementalWarcParser:
    """Push-based WARC parser with bounded memory.

    ``feed(chunk)`` returns the records completed by that chunk;
    ``finish()`` flushes the tail and accounts for truncation.  The
    internal buffer never holds more than one in-flight record plus
    one fed chunk, so a task can stream a multi-GiB archive while
    resident memory stays at O(min(largest record, max_record_bytes)).
    Semantics (resync on the ``WARC/`` magic, one ``n_bad`` per junk
    gap, truncated header/payload counted) are identical to
    ``parse_warc_bytes`` for every chunking of the same bytes — pinned
    by a hypothesis property.

    ``max_record_bytes`` (default 1 GiB) bounds the in-flight record:
    a corrupt header claiming a larger Content-Length is counted bad
    and resynced past, instead of buffering the rest of the archive
    waiting for a payload that never completes (its payload bytes then
    count as one junk gap — two ``n_bad`` for that record, never a
    silent swallow of everything after it).  Negative or non-numeric
    lengths are likewise counted bad and skipped — an unvalidated
    negative length would loop the parser forever."""

    def __init__(self, max_record_bytes: int = 1 << 30) -> None:
        self._buf = bytearray()
        self._gap_junk = False   # current inter-record gap held junk
        self._max_record = int(max_record_bytes)
        self.n_bad = 0

    def feed(self, chunk: bytes) -> list[dict]:
        self._buf += chunk
        return self._drain(final=False)

    def finish(self) -> list[dict]:
        return self._drain(final=True)

    def _drain(self, final: bool) -> list[dict]:
        buf = self._buf
        records: list[dict] = []
        pos = 0
        while True:
            start = buf.find(b"WARC/", pos)
            if start < 0:
                if final:
                    if self._gap_junk or bytes(buf[pos:]).strip(b"\r\n"):
                        self.n_bad += 1  # trailing junk, no record
                        self._gap_junk = False
                    pos = len(buf)
                else:
                    # drop the unusable prefix, keep 4 bytes that could
                    # be a split "WARC" magic; remember junk for the
                    # one-per-gap count when the next magic arrives
                    keep = max(pos, len(buf) - 4)
                    if bytes(buf[pos:keep]).strip(b"\r\n"):
                        self._gap_junk = True
                    pos = keep
                break
            if self._gap_junk or (
                    start > pos and bytes(buf[pos:start]).strip(b"\r\n")):
                self.n_bad += 1  # junk between records: once per gap
                self._gap_junk = False
            head_end = buf.find(_SEP, start)
            if head_end < 0:
                if final:
                    self.n_bad += 1  # truncated header block
                    pos = len(buf)
                elif len(buf) - start > _MAX_HEADER_BYTES:
                    # a "header" that never terminates is junk, not a
                    # record — resync past the magic instead of
                    # buffering without bound
                    self.n_bad += 1
                    pos = start + len(b"WARC/")
                    continue
                else:
                    pos = start      # wait for the rest of the header
                break
            headers: dict[str, str] = {}
            for ln in bytes(buf[start:head_end]).split(_CRLF)[1:]:
                k, _, v = ln.partition(b":")
                if _:
                    headers[k.strip().lower().decode("iso-8859-1")] = (
                        v.strip().decode("iso-8859-1", errors="replace"))
            try:
                length = int(headers["content-length"])
                if length < 0 or length > self._max_record:
                    raise ValueError(length)
            except (KeyError, ValueError):
                self.n_bad += 1
                pos = head_end + len(_SEP)
                continue
            body_start = head_end + len(_SEP)
            if body_start + length > len(buf):
                if final:
                    self.n_bad += 1  # truncated payload
                    pos = len(buf)
                else:
                    pos = start      # wait for the full payload
                break
            records.append({
                "headers": headers,
                "payload": bytes(buf[body_start:body_start + length]),
            })
            pos = body_start + length
        del buf[:pos]
        return records


def parse_warc_bytes(raw: bytes) -> tuple[list[dict], int]:
    """Parse one (possibly member-gzipped) WARC archive in memory.

    Returns ``(records, n_bad)``; each record dict carries
    ``headers`` (dict, original case-insensitive keys lowered) and
    ``payload`` (bytes).  Bad blocks are skipped and counted; resync
    is on the next ``WARC/`` magic.  Delegates to
    :class:`IncrementalWarcParser` (single parsing implementation)."""
    p = IncrementalWarcParser()
    records = p.feed(_gunzip_members(raw))
    records += p.finish()
    return records, p.n_bad


def _iter_decompressed(fileobj, chunk: int = 1 << 20):
    """Yield decompressed chunks from a file object that is either a
    plain byte stream or concatenated gzip members (.warc.gz); bounded
    memory (one chunk window).  A truncated trailing member ends the
    stream cleanly (the record parser's ``finish()`` accounts for any
    partial record); a CORRUPT member raises ``zlib.error`` — loud, so
    silently dropped archive tails can't masquerade as short archives
    (both readers share this semantics via ``_gunzip_members``)."""
    first = fileobj.read(2)
    if first != b"\x1f\x8b":
        if first:
            yield first
        while True:
            b = fileobj.read(chunk)
            if not b:
                return
            yield b
    carry = first
    while True:
        d = zlib.decompressobj(wbits=16 + zlib.MAX_WBITS)
        while not d.eof:
            data = carry or fileobj.read(chunk)
            carry = b""
            if not data:
                return  # truncated trailing member
            out = d.decompress(data)  # zlib.error on corruption
            if out:
                yield out
        carry = d.unused_data
        if not carry:
            carry = fileobj.read(chunk)
            if not carry:
                return


def _strip_http_envelope(payload: bytes) -> tuple[bytes, str]:
    """(body, http content-type) from an HTTP response payload; a
    payload without an HTTP status line is returned unchanged."""
    if not payload.startswith(b"HTTP/"):
        return payload, ""
    sep = payload.find(_SEP)
    if sep < 0:
        return payload, ""
    ctype = ""
    for ln in payload[:sep].split(_CRLF)[1:]:
        k, _, v = ln.partition(b":")
        if _ and k.strip().lower() == b"content-type":
            ctype = v.strip().decode("iso-8859-1", errors="replace")
    return payload[sep + len(_SEP):], ctype


_RECORD_SCHEMA = ("url string, warc_ts timestamp, record_type string, "
                  "content_type string, payload binary")
_RECORD_COLUMNS = ["url", "warc_ts", "record_type", "content_type",
                   "payload"]


def _record_row(r: dict, kinds: set[str]) -> dict | None:
    h = r["headers"]
    rtype = h.get("warc-type", "")
    if kinds and rtype not in kinds:
        return None
    payload, http_ct = _strip_http_envelope(r["payload"])
    return {
        "url": h.get("warc-target-uri"),
        "warc_ts": h.get("warc-date"),
        "record_type": rtype,
        "content_type": http_ct or h.get("content-type", ""),
        "payload": payload,
    }


def _rows_frame(rows: list[dict]) -> pd.DataFrame:
    out = pd.DataFrame(rows, columns=_RECORD_COLUMNS)
    out["warc_ts"] = pd.to_datetime(
        out["warc_ts"], errors="coerce", utc=True, format="mixed",
    ).dt.tz_localize(None)
    return out


def _record_frames(batches: Iterator[pd.DataFrame], kinds: set[str],
                   with_stats: bool) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        for content, path in zip(pdf["content"], pdf["path"]):
            records, n_bad = parse_warc_bytes(bytes(content))
            rows = [row for r in records
                    if (row := _record_row(r, kinds)) is not None]
            out = _rows_frame(rows)
            if with_stats:
                out["source_file"] = path
                out["n_bad_in_file"] = np.int64(n_bad)
            yield out


def read_warc(spark: SparkSession, path: str,
              kinds: tuple[str, ...] = ("response",)) -> DataFrame:
    """Records of the given WARC-Type(s) from ``.warc`` /
    ``.warc.gz`` archives under ``path``; HTTP envelopes stripped from
    response payloads.  ``kinds=()`` keeps every record type."""
    bf = spark.read.format("binaryFile") \
        .option("pathGlobFilter", "*.warc*").load(path)
    kind_set = set(kinds)
    return bf.select("content", "path").mapInPandas(
        lambda it: _record_frames(it, kind_set, False),
        schema=_RECORD_SCHEMA,
    )


def read_warc_with_stats(spark: SparkSession, path: str,
                         kinds: tuple[str, ...] = ("response",),
                         ) -> DataFrame:
    """``read_warc`` plus per-file provenance: ``source_file`` and
    ``n_bad_in_file`` (malformed blocks skipped in that archive) —
    the no-silent-drops variant for audit pipelines."""
    bf = spark.read.format("binaryFile") \
        .option("pathGlobFilter", "*.warc*").load(path)
    kind_set = set(kinds)
    return bf.select("content", "path").mapInPandas(
        lambda it: _record_frames(it, kind_set, True),
        schema=_RECORD_SCHEMA + ", source_file string, n_bad_in_file long",
    )


def read_warc_stream(spark: SparkSession, path: str,
                     kinds: tuple[str, ...] = ("response",),
                     chunk_bytes: int = 8 << 20,
                     batch_records: int = 512) -> DataFrame:
    """Bounded-memory variant of :func:`read_warc`: distributes file
    PATHS (not contents) and stream-parses each archive incrementally
    inside the task — resident memory is O(one record + one chunk)
    per task, so multi-GiB archives never materialize, where
    ``binaryFile`` ships the whole compressed archive as one Arrow
    cell (hard 2 GiB cell limit, full decompressed archive resident).

    Requires executor-visible filesystem paths (local / NFS — true in
    local mode and on shared-storage clusters); use :func:`read_warc`
    for object stores that only the Hadoop reader can open.
    Parallelism == file count, like every reader in this module."""
    import glob as _glob
    import os as _os

    # escape the directory component: a dir named "crawl[2024]" must
    # not be read as a glob character class
    pattern = (_os.path.join(_glob.escape(path), "*.warc*")
               if _os.path.isdir(path) else path)
    files = sorted(_glob.glob(pattern))
    if not files:
        raise FileNotFoundError(f"no .warc archives match {pattern!r}")
    # parallelize with one slice per file: a guaranteed 1:1
    # file-to-partition layout (DataFrame.repartition is round-robin
    # from a random offset and can stack two archives on one task)
    paths_df = spark.sparkContext.parallelize(
        files, len(files)).map(lambda p: (p,)).toDF(["path"])
    kind_set = set(kinds)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                parser = IncrementalWarcParser()
                rows: list[dict] = []
                with open(p, "rb") as f:
                    for chunk in _iter_decompressed(f, chunk_bytes):
                        for r in parser.feed(chunk):
                            row = _record_row(r, kind_set)
                            if row is not None:
                                rows.append(row)
                            if len(rows) >= batch_records:
                                yield _rows_frame(rows)
                                rows = []
                    for r in parser.finish():
                        row = _record_row(r, kind_set)
                        if row is not None:
                            rows.append(row)
                if rows:
                    yield _rows_frame(rows)

    return paths_df.mapInPandas(fn, schema=_RECORD_SCHEMA)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """WET text conversions: ``(url, warc_ts, text)`` from
    ``conversion`` records, payload decoded as UTF-8 (the WET
    contract) with invalid bytes REPLACED — Spark's builtin
    ``decode`` raises MALFORMED_CHARACTER_CODING on the broken
    encodings a real crawl always contains, so the decode runs
    lenient in an Arrow-batched pandas UDF instead."""

    @F.pandas_udf("string")
    def utf8_lenient(payloads: pd.Series) -> pd.Series:
        return payloads.map(
            lambda b: None if b is None
            else bytes(b).decode("utf-8", errors="replace"))

    recs = read_warc(spark, path, kinds=("conversion",))
    return recs.select(
        "url", "warc_ts", utf8_lenient(F.col("payload")).alias("text"),
    )


def pages_from_warc(spark: SparkSession, path: str,
                    reader: str = "binaryfile") -> DataFrame:
    """North-rule pages shape from raw WARC archives: response
    payloads as ``html``, ``text`` via the deterministic extractor
    (byte-identity invariant preserved), ``lang`` null (downstream
    langid fills it — operators/text.py).  ``reader='stream'`` routes
    through :func:`read_warc_stream` (bounded memory, local/NFS
    paths); ``'binaryfile'`` through :func:`read_warc` (object
    stores)."""
    from outrank_spark.operators.derived import extract_text_from_html

    if reader == "stream":
        recs = read_warc_stream(spark, path, kinds=("response",))
    elif reader == "binaryfile":
        recs = read_warc(spark, path, kinds=("response",))
    else:
        raise ValueError(f"unknown reader {reader!r}: "
                         "use 'stream' or 'binaryfile'")
    pages = recs.select(
        "url", "warc_ts",
        F.col("payload").alias("html"),
        F.lit(None).cast("string").alias("lang"),
    )
    return extract_text_from_html(pages, out="text").select(
        "url", "warc_ts", "html", "text", "lang",
    )


def write_warc_bytes(records: list[dict], member_gzip: bool = False,
                     ) -> bytes:
    """Serialize records (dicts of ``headers``/``payload``) to WARC
    bytes — the deterministic fixture-side inverse of
    ``parse_warc_bytes`` used by tests and the synthetic generators.
    ``member_gzip=True`` emits the Common-Crawl .warc.gz layout (one
    gzip member per record, mtime pinned to 0 for determinism)."""
    import gzip

    out = []
    for r in records:
        head = [b"WARC/1.0"]
        for k, v in r["headers"].items():
            head.append(f"{k}: {v}".encode("iso-8859-1"))
        head.append(f"Content-Length: {len(r['payload'])}"
                    .encode("iso-8859-1"))
        block = (_CRLF.join(head) + _SEP + r["payload"] + _CRLF + _CRLF)
        if member_gzip:
            block = gzip.compress(block, mtime=0)
        out.append(block)
    return b"".join(out)
