"""WET-style (WARC conversion-record) text-shard source.

Web-scale corpora arrive as concatenated record files (Common Crawl's
WET format: a per-record header block, a blank line, then exactly
``Content-Length`` bytes of extracted text), not as parquet — the
ingest front end a 100 TB crawl pipeline actually starts from. This
module writes deterministic WET-like shards and reads them back as a
``ray.data.Dataset``:

* one shard file = one read task (``read_binary_files`` keeps the
  file→task mapping; shards are the parallelism unit, like CC's 1 GiB
  segment files);
* parsing is Content-Length framed — a payload may contain ANY bytes,
  including lines that look like WARC headers, and round-trips exactly
  (the reference's HTML fetcher trusts charset sniffing instead,
  /root/reference/src/secbot/fetchers/news.py:91; length framing is
  what the archive formats use);
* the per-record scan inside a file task is a Python loop over string
  offsets — O(records) pointer arithmetic per task, the same trade as
  the md5 key loops; rows leave the task as one Arrow table.

Reference parity: the reference has no archive ingestion (it fetches
live pages one by one); this is the SURVEY §2.1 source family extended
to the archive shape a training-data pipeline consumes.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data

_HDR = "WARC/1.0"


def wet_record_bytes(rec_id: int, url: str, text: str) -> bytes:
    """One WET conversion record, Content-Length framed."""
    payload = text.encode("utf-8")
    head = (
        f"{_HDR}\r\n"
        f"WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + payload + b"\r\n\r\n"


def write_wet_shards(
    tbl: pa.Table,
    out_dir: str,
    num_shards: int = 4,
    id_col: str = "rec_id",
    url_col: str = "url",
    text_col: str = "text",
) -> str:
    """Write a table as ``num_shards`` WET files (row i → shard
    i % num_shards, atomic tmp+rename, idempotent)."""
    os.makedirs(out_dir, exist_ok=True)
    ids = tbl[id_col].to_pylist()
    urls = tbl[url_col].to_pylist()
    texts = tbl[text_col].to_pylist()
    bufs: list[list[bytes]] = [[] for _ in range(num_shards)]
    for i, (rid, url, text) in enumerate(zip(ids, urls, texts)):
        bufs[i % num_shards].append(wet_record_bytes(rid, url, text or ""))
    for s, recs in enumerate(bufs):
        path = os.path.join(out_dir, f"shard-{s:04d}.warc.wet")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(b"".join(recs))
        os.replace(tmp, path)
    return out_dir


def parse_wet_bytes(data: bytes) -> pa.Table:
    """Parse one WET file's bytes into (rec_id, url, text, n_bytes).

    Content-Length framing: header fields are read up to the first
    blank line, then exactly n payload bytes are taken — header-looking
    payload text cannot break a record boundary."""
    rec_ids: list[int] = []
    urls: list[str] = []
    texts: list[str] = []
    sizes: list[int] = []
    pos, n = 0, len(data)
    while pos < n:
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        header = data[pos:hdr_end].decode("utf-8")
        fields = {}
        for line in header.split("\r\n")[1:]:
            k, _, v = line.partition(":")
            fields[k.strip()] = v.strip()
        length = int(fields["Content-Length"])
        body_start = hdr_end + 4
        payload = data[body_start : body_start + length]
        rid = fields["WARC-Record-ID"]
        rec_ids.append(int(rid[rid.rfind(":") + 1 : -1]))
        urls.append(fields["WARC-Target-URI"])
        texts.append(payload.decode("utf-8"))
        sizes.append(length)
        pos = body_start + length + 4  # skip the record's trailing CRLFCRLF
    return pa.table(
        {
            "rec_id": pa.array(rec_ids, pa.int64()),
            "url": pa.array(urls, pa.string()),
            "text": pa.array(texts, pa.string()),
            "n_bytes": pa.array(sizes, pa.int64()),
        }
    )


def read_wet(path: str, **kwargs) -> "ray.data.Dataset":
    """WET shards → Dataset(rec_id, url, text, n_bytes); one file per
    read task, parse fused into the read."""
    files = ray.data.read_binary_files(path, file_extensions=["wet"], **kwargs)

    def parse(batch: pa.Table) -> pa.Table:
        outs = [parse_wet_bytes(b.as_py()) for b in batch["bytes"]]
        return pa.concat_tables(outs) if outs else parse_wet_bytes(b"")

    return files.map_batches(parse, batch_format="pyarrow", zero_copy_batch=True)
