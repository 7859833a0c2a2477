"""Simplified WARC container encode + strict byte-level parse.

Web-scale pretraining corpora ship as WARC containers (ISO 28500: CRLF-
framed headers, ``Content-Length``-driven payloads, records concatenated
back to back) — the one ingest container this repo did not cover. The
fixture flow is the multimodal playbook (multimodal.py:265's WAV
encode → parse-back): containers are built FROM the documents table with
JVM-side string concatenation (no Python on the encode path), then
walked back by a REAL byte-level parser (Arrow-batched ``mapInPandas``)
that must reproduce every record's offset, length, and payload byte sum
— all of which the DuckDB oracle derives independently from the
documents table with window arithmetic, so value parity certifies the
parser actually walked the container framing, not that two copies of the
same code agree.

Payload arithmetic uses character counts/sums; ``documents.text`` is
ASCII at every scale factor (pinned by
tests/test_multimodal.py::test_documents_text_is_ascii_at_all_scale_factors),
so chars == bytes on both engines.

Scale shape: one container per (source, doc_id % WARC_BUCKETS) — the
sharded-WARC layout CommonCrawl actually uses; containers are the unit
of parallelism, records never shuffle individually on the build side
(one groupBy of record strings), and the parse side is map-only over
containers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WARC_BUCKETS = 8

# record layout (all literals ASCII):
#   WARC/1.0\r\n
#   WARC-Type: response\r\n
#   WARC-Record-ID: <urn:doc:{doc_id}>\r\n
#   Content-Length: {n}\r\n
#   \r\n
#   {payload}\r\n\r\n
# fixed framing cost = 83 chars + digits(doc_id) + digits(n) + n
WARC_FIXED_OVERHEAD = 83


def warc_containers(documents: DataFrame) -> DataFrame:
    """(source, bucket, container): sharded containers built JVM-side —
    per-record strings concatenated in doc_id order via
    array_sort(collect_list(struct)), then UTF-8 encoded once."""
    d = documents.withColumn("text", F.coalesce("text", F.lit("")))
    rec = d.select(
        "source",
        (F.col("doc_id") % WARC_BUCKETS).alias("bucket"),
        "doc_id",
        F.concat(
            F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:doc:"),
            F.col("doc_id").cast("string"),
            F.lit(">\r\nContent-Length: "),
            F.length("text").cast("string"),
            F.lit("\r\n\r\n"),
            F.col("text"),
            F.lit("\r\n\r\n"),
        ).alias("rec"),
    )
    return (
        rec.groupBy("source", "bucket")
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("doc_id", "rec"))),
                    lambda x: x["rec"],
                ),
            ).alias("container_str")
        )
        .select(
            "source", "bucket", F.encode("container_str", "UTF-8").alias("container")
        )
    )


def _parse_record(buf: bytes, pos: int, ctx: str) -> tuple[int, int, int, int]:
    """Parse ONE CRLF-framed record starting at ``pos``: magic check,
    header block, Content-Length payload, CRLFCRLF trailer. Returns
    (doc_id, content_length, payload_sum, end_pos). Shared by the plain
    container walk and the gzip member walk — the record grammar is
    defined once."""
    if buf[pos : pos + 10] != b"WARC/1.0\r\n":
        raise ValueError(f"bad magic at offset {pos} in {ctx}")
    pos += 10
    hdrs: dict[bytes, bytes] = {}
    while True:
        eol = buf.index(b"\r\n", pos)
        if eol == pos:  # blank line ends the header block
            pos += 2
            break
        k, _, v = buf[pos:eol].partition(b": ")
        hdrs[k] = v
        pos = eol + 2
    n = int(hdrs[b"Content-Length"])
    rid = hdrs[b"WARC-Record-ID"]
    if not (rid.startswith(b"<urn:doc:") and rid.endswith(b">")):
        raise ValueError(f"bad record id {rid!r} in {ctx}")
    payload = buf[pos : pos + n]
    if len(payload) != n:
        raise ValueError(f"truncated payload at offset {pos} in {ctx}")
    pos += n
    if buf[pos : pos + 4] != b"\r\n\r\n":
        raise ValueError(f"bad record trailer at offset {pos} in {ctx}")
    return int(rid[9:-1]), n, int(sum(payload)), pos + 4


def parse_warc(containers: DataFrame) -> DataFrame:
    """Strict byte-level container walk (mapInPandas): magic check, CRLF
    header framing, Content-Length-driven payload read, trailing CRLFCRLF
    check. Emits per record: (source, bucket, rec_index, offset, doc_id,
    content_length, payload_sum). Malformed bytes raise with the offset —
    a container parser that guesses is worse than one that fails."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "source": [], "bucket": [], "rec_index": [], "offset": [],
                "doc_id": [], "content_length": [], "payload_sum": [],
            }
            for src, bucket, blob in zip(
                pdf["source"], pdf["bucket"], pdf["container"]
            ):
                buf = bytes(blob)
                pos = 0
                idx = 0
                while pos < len(buf):
                    start = pos
                    doc_id, n, psum, pos = _parse_record(
                        buf, pos, f"{src}/{bucket}"
                    )
                    out["source"].append(src)
                    out["bucket"].append(int(bucket))
                    out["rec_index"].append(idx)
                    out["offset"].append(start)
                    out["doc_id"].append(doc_id)
                    out["content_length"].append(n)
                    out["payload_sum"].append(psum)
                    idx += 1
            yield pd.DataFrame(out)

    schema = (
        "source string, bucket long, rec_index long, offset long, "
        "doc_id long, content_length long, payload_sum long"
    )
    return containers.mapInPandas(fn, schema)


# --- warc.gz: per-record gzip members (the Common Crawl convention) ----------
#
# CommonCrawl ships .warc.gz files where EVERY record is an independent
# gzip member; the members are concatenated back to back, which is what
# makes record-level random access possible (seek to a member offset,
# inflate one member, get one record). The build side compresses each
# CRLF-framed record as a deterministic member (mtime=0, no filename,
# fixed level — stdlib gzip) in an Arrow-batched pandas UDF, then the
# binary members join linearly (one b"".join per group, Arrow-batched)
# in doc_id order. The parse side
# walks member boundaries STRICTLY with zlib.decompressobj(wbits=31):
# each member must inflate to exactly one well-formed record (the
# one-record-per-member contract readers rely on), a truncated or
# corrupt member raises with its compressed offset, and trailing
# garbage after the last member is an error. Compressed offsets and
# sizes depend on the zlib build, so the value oracle certifies the
# DECODED stream (doc_id / content_length / payload_sum per member
# index — the same closed-form arithmetic as the plain container,
# minus the byte offset); member framing itself is pinned by unit
# tests (offsets monotone, sizes partition the container, per-member
# round trip).

WARC_GZIP_LEVEL = 6


def warc_gzip_containers(documents: DataFrame) -> DataFrame:
    """(source, bucket, container): sharded .warc.gz containers — one
    deterministic gzip member per record, members concatenated in
    doc_id order."""
    import gzip

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def gzip_member(rec: pd.Series) -> pd.Series:
        return pd.Series(
            [
                gzip.compress(r.encode("utf-8"), WARC_GZIP_LEVEL, mtime=0)
                for r in rec
            ]
        )

    # Linear member assembly: ``b"".join`` over the sorted member array
    # in one Arrow batch. The earlier F.aggregate(concat(acc, x)) fold
    # rebuilt the accumulator per element — quadratic bytes copied per
    # (source, bucket) group. (base64 + concat_ws + unbase64 would stay
    # JVM-side but mis-decodes on embedded '=' padding, since member
    # lengths are arbitrary.)
    @pandas_udf("binary")
    def join_members(members: pd.Series) -> pd.Series:
        return pd.Series([b"".join(m) for m in members])

    d = documents.withColumn("text", F.coalesce("text", F.lit("")))
    rec = d.select(
        "source",
        (F.col("doc_id") % WARC_BUCKETS).alias("bucket"),
        "doc_id",
        gzip_member(
            F.concat(
                F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:doc:"),
                F.col("doc_id").cast("string"),
                F.lit(">\r\nContent-Length: "),
                F.length("text").cast("string"),
                F.lit("\r\n\r\n"),
                F.col("text"),
                F.lit("\r\n\r\n"),
            )
        ).alias("member"),
    )
    grouped = rec.groupBy("source", "bucket").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "member"))),
            lambda x: x["member"],
        ).alias("members")
    )
    return grouped.select(
        "source", "bucket", join_members("members").alias("container")
    )


def parse_warc_gzip(containers: DataFrame) -> DataFrame:
    """Strict member-by-member .warc.gz walk (mapInPandas). Emits per
    member: (source, bucket, rec_index, doc_id, content_length,
    payload_sum). One record per member enforced; malformed compressed
    bytes raise with the member's compressed offset."""
    import zlib

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "source": [], "bucket": [], "rec_index": [],
                "doc_id": [], "content_length": [], "payload_sum": [],
            }
            for src, bucket, blob in zip(
                pdf["source"], pdf["bucket"], pdf["container"]
            ):
                buf = bytes(blob)
                # zero-copy view: slicing a memoryview per member keeps
                # the walk O(total bytes); slicing bytes would copy the
                # whole remaining buffer once per member (O(M²)/container)
                mv = memoryview(buf)
                pos = 0
                idx = 0
                while pos < len(buf):
                    ctx = f"{src}/{bucket} member at compressed offset {pos}"
                    d = zlib.decompressobj(wbits=31)  # gzip framing only
                    try:
                        rec = d.decompress(mv[pos:])
                    except zlib.error as e:
                        raise ValueError(f"corrupt gzip {ctx}: {e}") from e
                    if not d.eof:
                        raise ValueError(f"truncated gzip {ctx}")
                    consumed = len(buf) - pos - len(d.unused_data)
                    doc_id, n, psum, end = _parse_record(rec, 0, ctx)
                    if end != len(rec):
                        raise ValueError(
                            f"{ctx}: member holds {len(rec) - end} bytes "
                            "beyond one record (one-record-per-member "
                            "contract violated)"
                        )
                    out["source"].append(src)
                    out["bucket"].append(int(bucket))
                    out["rec_index"].append(idx)
                    out["doc_id"].append(doc_id)
                    out["content_length"].append(n)
                    out["payload_sum"].append(psum)
                    pos += consumed
                    idx += 1
            yield pd.DataFrame(out)

    schema = (
        "source string, bucket long, rec_index long, "
        "doc_id long, content_length long, payload_sum long"
    )
    return containers.mapInPandas(fn, schema)
