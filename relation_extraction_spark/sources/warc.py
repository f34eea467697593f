"""WARC source — the real Common-Crawl front door (BASELINE.json
input_hint: an Iceberg table of web pages with (url, warc_ts, html, …);
Common Crawl distributes those pages as WARC/1.0 archives, so a pipeline
that claims the CC run shape needs the WARC→table ingestion step).

Format parsed (public spec, ISO 28500): a WARC file is a sequence of
records — ``WARC/1.0\\r\\n`` header block (``Name: value`` lines) ended by
a blank line, ``Content-Length`` bytes of payload, then ``\\r\\n\\r\\n``.
``response`` records carry an HTTP response as payload; the html body
starts after the HTTP header block. Common Crawl gzips each record as its
own member, so a ``.warc.gz`` is a multi-member gzip stream —
``gzip.decompress`` handles member concatenation natively.

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


def parse_warc_bytes(data: bytes) -> list[dict]:
    """All ``response`` records of one WARC file (plain or .gz) as dicts
    ``{url, warc_ts, html}``. Malformed trailing garbage ends the scan
    (records are length-delimited, so one bad record cannot corrupt the
    previous ones); a response record missing mandatory headers or with an
    unparseable date is skipped — and COUNTED (a warning per file makes the
    loss observable instead of silent)."""
    if data[:2] == _GZIP_MAGIC:
        data = gzip.decompress(data)  # multi-member per CC convention
    out: list[dict] = []
    skipped = 0
    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(b"WARC/", pos):
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[pos:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body = data[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length + 4  # payload + record separator CRLFCRLF
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
        html = body[http_end + 4:] if http_end >= 0 else body
        out.append({"url": url, "warc_ts": ts, "html": html})
    if skipped:
        import logging

        logging.getLogger(__name__).warning(
            "parse_warc_bytes: skipped %d response record(s) with missing "
            "URL or unparseable WARC-Date (%d kept)", skipped, len(out))
    return out


WARC_DOCS_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                    "text string, lang string")


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC archive files (glob ok, .warc or .warc.gz) → the pipeline's
    documents table shape. One task per archive file; text/lang are NULL
    (extract_text_df / lang_id fill them downstream).

    Memory envelope: binaryFile materializes the whole shard in the task
    (that is its contract) and decompression roughly quadruples a CC
    ~1 GB gzip shard — size executor memory for ~5-6 GB per concurrent
    ingest task, or re-shard archives smaller. Parse cost is linear and
    paid once per crawl ingest, never per query."""
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(parse_warc_bytes(bytes(content)))
            yield pd.DataFrame({
                "url": [r["url"] for r in rows],
                "warc_ts": [r["warc_ts"] for r in rows],
                "html": [r["html"] for r in rows],
                "text": [None] * len(rows),
                "lang": [None] * len(rows),
            })

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
