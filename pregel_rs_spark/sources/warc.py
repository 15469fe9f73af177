"""WARC source + sink — ISO 28500 / WARC 1.0, the format web crawls ship
in (Common Crawl's raw layer; Heritrix's native output; public standard).

Spark-first shape:
  * **read**: ``spark.read.format("binaryFile")`` → one task per .warc
    file → ``mapInPandas`` running the pure streaming parser per file.
    WARC's gzip-per-record / record-framed layout makes the FILE the
    natural split unit (crawlers cap files at ~1 GB exactly so that a
    file is one task's worth of work); a 100 TB crawl is ~100k files →
    ~100k tasks, plenty of parallelism for 1000 executors with no custom
    InputFormat.  ``binaryFile`` holds one file's bytes in memory per
    task — size executors for max-file-size, the same rule every
    WARC-on-Hadoop pipeline documents.
  * **write**: ``applyInPandas`` over a deterministic group key — each
    group becomes exactly one ``part-{gid}.warc`` written by the executor
    that holds the group (distributed sink, no driver funnel); the
    returned manifest frame is the commit record.

Record framing (WARC/1.0): ``WARC/1.0\\r\\n`` + named header lines +
``\\r\\n\\r\\n`` + exactly ``Content-Length`` payload bytes + ``\\r\\n\\r\\n``.
HTTP ``response`` records carry the full HTTP message as payload; the
reader splits status line / headers / body so downstream sees the html
bytes directly.

Determinism: record ids are UUIDv5-style md5 digests of the target URI —
re-running a write produces byte-identical files, which is what lets the
driver gate hash-compare a distributed roundtrip against a pure-Python
oracle (no reference counterpart — the reference ships no source formats
beyond its in-memory frames).
"""

from __future__ import annotations

import hashlib
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"

WARC_READ_SCHEMA = (
    "warc_type string, record_id string, target_uri string, "
    "warc_date string, content_type string, http_status int, "
    "payload binary, warc_file string"
)

MANIFEST_SCHEMA = "gid long, path string, n_records long, n_bytes long"


# ---------------------------------------------------------------------------
# pure functions — used by executors AND as the local oracle
# ---------------------------------------------------------------------------

def record_id_for(uri: str) -> str:
    """Deterministic WARC-Record-ID (md5-of-URI in urn:uuid form)."""
    h = hashlib.md5(uri.encode("utf-8")).hexdigest()
    return (
        f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"
    )


def build_response_record(
    uri: str, date_iso: str, html: bytes, status: int = 200
) -> bytes:
    """One WARC/1.0 ``response`` record with an HTTP/1.1 message payload."""
    http = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: text/html; charset=utf-8\r\n"
        f"Content-Length: {len(html)}\r\n\r\n"
    ).encode("ascii") + html
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: {record_id_for(uri)}\r\n"
        f"WARC-Date: {date_iso}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n"
    ).encode("utf-8")
    return headers + _CRLF + http + _SEP


def build_warcinfo_record(filename: str, date_iso: str) -> bytes:
    """The leading ``warcinfo`` record every conformant file starts with."""
    body = b"software: pregel-rs-spark warc sink\r\nformat: WARC 1.0\r\n"
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: warcinfo\r\n"
        f"WARC-Record-ID: {record_id_for('warcinfo:' + filename)}\r\n"
        f"WARC-Date: {date_iso}\r\n"
        f"WARC-Filename: {filename}\r\n"
        f"Content-Type: application/warc-fields\r\n"
        f"Content-Length: {len(body)}\r\n"
    ).encode("utf-8")
    return headers + _CRLF + body + _SEP


def parse_warc_bytes(data: bytes, strict: bool = True) -> list[dict]:
    """Streaming parse of one WARC file's bytes into record dicts.

    Each dict: warc_type, record_id, target_uri, warc_date, content_type,
    http_status (for response payloads, else None), payload (http body
    for responses, raw payload otherwise).  ``strict=False`` stops at the
    first malformed framing instead of raising (salvage mode for
    truncated crawl files).
    """
    out: list[dict] = []
    pos, n = 0, len(data)
    while pos < n:
        while data[pos:pos + 2] == _CRLF:  # inter-record separators
            pos += 2
        if pos >= n:
            break
        hdr_end = data.find(_SEP, pos)
        if hdr_end < 0 or not data.startswith(b"WARC/", pos):
            if strict:
                raise ValueError(
                    f"malformed WARC framing at byte {pos}"
                )
            break
        lines = data[pos:hdr_end].decode("utf-8", "replace").split("\r\n")
        hdrs = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            hdrs[k.strip().lower()] = v.strip()
        try:
            clen = int(hdrs["content-length"])
        except (KeyError, ValueError):
            if strict:
                raise ValueError(
                    f"missing/invalid Content-Length at byte {pos}"
                )
            break
        body_start = hdr_end + len(_SEP)
        payload = data[body_start:body_start + clen]
        if len(payload) < clen:
            if strict:
                raise ValueError(f"truncated payload at byte {pos}")
            break
        pos = body_start + clen
        status = None
        if payload.startswith(b"HTTP/"):
            http_end = payload.find(_SEP)
            status_line = payload.split(_CRLF, 1)[0].decode(
                "ascii", "replace"
            )
            parts = status_line.split(" ")
            status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else None
            payload = payload[http_end + len(_SEP):] if http_end >= 0 else b""
        out.append(
            {
                "warc_type": hdrs.get("warc-type", ""),
                "record_id": hdrs.get("warc-record-id", ""),
                "target_uri": hdrs.get("warc-target-uri", ""),
                "warc_date": hdrs.get("warc-date", ""),
                "content_type": hdrs.get("content-type", ""),
                "http_status": status,
                "payload": payload,
            }
        )
    return out


# ---------------------------------------------------------------------------
# distributed sink / source
# ---------------------------------------------------------------------------

def write_warc_files(
    pages: DataFrame,
    out_dir: str,
    pages_per_file: int = 100,
) -> DataFrame:
    """Distributed WARC sink: pages ``(url, warc_ts, html)`` → one
    ``part-{gid:05d}.warc`` per deterministic group (``xxhash64(url)``
    buckets into files of ~``pages_per_file``), records sorted by url
    within a file so output bytes are reproducible run-over-run.

    Returns the manifest ``(gid, path, n_records, n_bytes)`` — an ACTION
    on it performs the write (one file per group, written by the executor
    holding the group; no driver funnel).
    """
    os.makedirs(out_dir, exist_ok=True)
    n_files = max(
        1, -(-pages.count() // pages_per_file)
    )  # ceil; one count action to size the layout

    keyed = pages.select(
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts"),
        "html",
        (F.abs(F.xxhash64("url")) % n_files).alias("gid"),
    )

    def emit(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        gid = int(key[0])
        path = os.path.join(out_dir, f"part-{gid:05d}.warc")
        pdf = pdf.sort_values("url")
        blobs = [build_warcinfo_record(os.path.basename(path),
                                       "2024-01-01T00:00:00Z")]
        blobs += [
            build_response_record(u, t, bytes(h))
            for u, t, h in zip(pdf["url"], pdf["ts"], pdf["html"])
        ]
        data = b"".join(blobs)
        with open(path, "wb") as f:
            f.write(data)
        return pd.DataFrame(
            [{"gid": gid, "path": path, "n_records": len(pdf) + 1,
              "n_bytes": len(data)}]
        )

    return keyed.groupBy("gid").applyInPandas(emit, MANIFEST_SCHEMA)


def read_warc(
    spark: SparkSession, path_glob: str, strict: bool = True
) -> DataFrame:
    """WARC source: one task per file, streaming parse, no driver bytes."""
    files = spark.read.format("binaryFile").load(path_glob)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content), strict=strict):
                    rec["warc_file"] = os.path.basename(str(path))
                    rows.append(rec)
            out = pd.DataFrame(
                rows,
                columns=[
                    "warc_type", "record_id", "target_uri", "warc_date",
                    "content_type", "http_status", "payload", "warc_file",
                ],
            )
            # nullable int (warcinfo/metadata records carry no status) —
            # plain float64-with-NaN would fail the Arrow int cast
            out["http_status"] = out["http_status"].astype("Int32")
            yield out

    return files.select("path", "content").mapInPandas(
        parse, WARC_READ_SCHEMA
    )
