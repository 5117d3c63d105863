"""Common-Crawl-style WARC source → the engine's canonical input table.

The reference acquires pages by live HTTP fetch
(``search_engine/crawler/crawler.py:266``, ``query_crawler.py:149``); at
10^12-document scale the same content arrives at rest as WARC/1.0
(ISO 28500) container files — the format Common Crawl publishes. This
module reads those containers into the ``input_hint`` table shape
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``
so everything downstream (extraction T2, tokenize T6, index build A1-A6)
is source-agnostic. WET containers (Common Crawl's extracted-text
sidecar: ``conversion`` records, ``text/plain`` payloads) are read by the
same reader — rows carry ``text`` directly with ``html`` NULL, feeding
the index build's precomputed-text path without any extraction pass.

Scale design
------------
``spark.read.format("binaryFile")`` yields ONE row per WARC file and never
splits a file, so the task grain is the file — exactly how Common Crawl is
sharded (~1 GB segments, ~64k files per crawl), and the natural unit for a
1000-executor scan. The parse is a single ``mapInPandas`` Arrow pass: no
shuffle anywhere (asserted in tests/test_warc.py). Memory per task is
bounded by (compressed file bytes) + O(largest single record): the
Common-Crawl layout gzips each record as its own gzip member, and the
reader decompresses member-by-member, yielding each record as soon as its
bytes are complete and discarding consumed buffer — it never materializes
the whole decompressed file.

Text extraction (the ``text`` column) reuses the engine's own T2 kernel
(``functions/textproc.extract_text_from_html``) inside the same Arrow
pass, preserving the per-row byte-identity invariant; pass
``extract_text=False`` to defer it (column comes back NULL) when a
downstream stage owns extraction. ``read_warc`` emits output frames in
bounded row batches, so a task never materializes a whole decoded
container — memory is (compressed file) + O(largest record) +
O(batch_rows pages), honoring the contract above end to end.

HTTP semantics: ``application/http`` record bodies (keyed on the record's
Content-Type, ISO 28500 §6.2 — never guessed from body bytes, so a
resource document that happens to begin with ``HTTP/`` is untouched) have
their envelope stripped, ``Transfer-Encoding: chunked`` framing removed
(CC records preserve wire bytes), and only 2xx statuses surface as pages
— mirroring the reference keeping only successful fetches
(``crawler.py:266-290``).

Fail-loud contract: a malformed container (bad version line, missing or
non-numeric Content-Length, truncated body, corrupt gzip member, bad
chunked framing) raises with the parse offset — a silent skip would
undercount the corpus invisibly. Records that are well-formed but not
page-bearing (warcinfo / request / metadata / revisit, non-2xx responses)
are skipped by design.
"""

from __future__ import annotations

import datetime as dt
import gzip
import hashlib
import io
import zlib
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"
# WARC record types that carry a page payload we surface. `resource` is the
# no-HTTP-envelope variant (payload is the document itself); `conversion`
# is the WET layout (Common Crawl's extracted-text sidecar: payload is the
# already-extracted text, so rows carry text directly and html NULL).
_PAGE_TYPES = {b"response", b"resource", b"conversion"}


class WarcFormatError(ValueError):
    """Malformed WARC container — parse position included for triage."""


# --------------------------------------------------------------------- parse
def _parse_headers(block: bytes, pos: int) -> dict[bytes, bytes]:
    """Parse a WARC (or HTTP) header block — the bytes BETWEEN the first
    line and the blank line. Names lower-cased (field names are
    case-insensitive per RFC 9110 §5.1, which ISO 28500 §4 adopts);
    continuation lines (obsolete folding) are appended with one space."""
    headers: dict[bytes, bytes] = {}
    last: bytes | None = None
    for line in block.split(_CRLF):
        if not line:
            continue
        if line[:1] in (b" ", b"\t"):
            if last is None:
                raise WarcFormatError(f"header continuation before any header at byte {pos}")
            headers[last] += b" " + line.strip()
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            raise WarcFormatError(f"malformed header line {line[:60]!r} at byte {pos}")
        last = name.strip().lower()
        headers[last] = value.strip()
    return headers


def _content_length(headers: dict[bytes, bytes], pos: int) -> int:
    """Content-Length, fail-loud with the parse offset: absent, non-numeric
    and negative (would rewind the cursor) all raise WarcFormatError."""
    raw = headers.get(b"content-length")
    if raw is None:
        raise WarcFormatError(f"record at byte {pos} has no Content-Length")
    try:
        clen = int(raw)
    except ValueError:
        raise WarcFormatError(
            f"record at byte {pos} has non-numeric Content-Length {raw[:20]!r}"
        ) from None
    if clen < 0:
        raise WarcFormatError(f"record at byte {pos} has negative Content-Length {clen}")
    return clen


def _iter_plain_records(buf: bytes, base_pos: int = 0) -> Iterator[tuple[dict, bytes]]:
    """Yield (warc_headers, body_bytes) from an UNCOMPRESSED WARC byte
    buffer. Raises WarcFormatError on truncation or a bad magic line."""
    pos = 0
    n = len(buf)
    while pos < n:
        # tolerate inter-record padding newlines
        while pos < n and buf[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if not buf.startswith(b"WARC/", pos):
            raise WarcFormatError(
                f"expected WARC/ version line at byte {base_pos + pos}, "
                f"got {buf[pos : pos + 20]!r}"
            )
        hdr_end = buf.find(_HDR_END, pos)
        if hdr_end < 0:
            raise WarcFormatError(f"unterminated WARC header block at byte {base_pos + pos}")
        first_nl = buf.index(_CRLF, pos)
        headers = _parse_headers(buf[first_nl + 2 : hdr_end], base_pos + pos)
        clen = _content_length(headers, base_pos + pos)
        body_start = hdr_end + len(_HDR_END)
        if body_start + clen > n:
            raise WarcFormatError(
                f"record at byte {base_pos + pos} truncated: Content-Length {clen} "
                f"but only {n - body_start} bytes remain"
            )
        yield headers, buf[body_start : body_start + clen]
        pos = body_start + clen


_GZ_CHUNK = 1 << 20  # compressed bytes fed to zlib per call


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (warc_headers, body) from WARC container bytes — plain or
    gzipped. The Common-Crawl layout (one gzip member per record) is
    decompressed member-by-member with bounded memory: each member's
    plaintext is parsed and released before the next member is inflated.
    Compressed input is sliced through ONE memoryview in _GZ_CHUNK pieces
    (``d.decompress(data[pos:])`` per member would copy the whole remaining
    buffer into every member's ``unused_data`` — O(members × file) memcpy,
    tens of TB at the ~1 GB / ~50k-member CC grain)."""
    if data[:2] != b"\x1f\x8b":
        yield from _iter_plain_records(data)
        return
    mv = memoryview(data)
    n = len(data)
    pos = 0
    # plaintext bytes not yet forming a complete record; bytearray so the
    # per-piece append is amortized O(1) and the drain trim is in-place
    pending = bytearray()
    while pos < n:
        member_start = pos
        d = zlib.decompressobj(wbits=47)  # 32+15: gzip wrapper, one member
        while True:
            if pos >= n:
                raise WarcFormatError(
                    f"gzip member at byte {member_start} is truncated"
                )
            piece = mv[pos : pos + _GZ_CHUNK]
            try:
                chunk = d.decompress(piece)
            except zlib.error as e:
                raise WarcFormatError(
                    f"gzip member at byte {member_start} is corrupt: {e}"
                ) from e
            if chunk:
                pending += chunk
                # drain complete records PER PIECE, not per member: a
                # single-member gzip of a whole 1 GB container (legal,
                # non-CC layout, tested) must not inflate entirely into
                # `pending` before the first record is released — this
                # keeps the documented O(largest record) plaintext bound
                # for every layout. (In the CC per-record layout a member
                # boundary is also a record boundary, so this drains at
                # least once per member either way.)
                drained = 0
                for headers, body, consumed in _drain_complete(pending):
                    yield headers, body
                    drained = consumed
                if drained:
                    del pending[:drained]
            if d.eof:  # unused_data is bounded by the piece size, not the file
                pos += len(piece) - len(d.unused_data)
                break
            pos += len(piece)
    if bytes(pending).strip(b"\r\n"):
        raise WarcFormatError(
            f"{len(pending)} plaintext bytes of an incomplete record at end of container"
        )


def _drain_complete(buf) -> Iterator[tuple[dict, bytes, int]]:
    """Like _iter_plain_records but stops SILENTLY at an incomplete tail
    record (more members may complete it); yields (headers, body,
    buffer offset consumed through this record). ``buf`` may be a
    bytearray (the gzip path's append buffer) — headers and body are
    materialized to bytes before they escape."""
    pos = 0
    n = len(buf)
    while pos < n:
        while pos < n and buf[pos : pos + 2] == _CRLF:
            pos += 2
        if n - pos < 5:
            # too short to judge: could be a padding fragment (b"\r") or a
            # split magic (b"WA") — a member boundary may fall ANYWHERE,
            # so wait for more members (garbage is still caught by the
            # incomplete-tail check at end of container)
            return
        if not buf.startswith(b"WARC/", pos):
            raise WarcFormatError(
                f"expected WARC/ version line at plaintext byte {pos}, "
                f"got {bytes(buf[pos : pos + 20])!r}"
            )
        hdr_end = buf.find(_HDR_END, pos)
        if hdr_end < 0:
            return  # header itself incomplete — wait for more members
        first_nl = buf.index(_CRLF, pos)
        headers = _parse_headers(bytes(buf[first_nl + 2 : hdr_end]), pos)
        clen = _content_length(headers, pos)
        body_start = hdr_end + len(_HDR_END)
        if body_start + clen > n:
            return  # body incomplete — wait for more members
        yield headers, bytes(buf[body_start : body_start + clen]), body_start + clen
        pos = body_start + clen


def _dechunk(payload: bytes) -> bytes:
    """Decode ``Transfer-Encoding: chunked`` framing (RFC 9112 §7.1).
    Common-Crawl response records preserve the wire bytes, so chunk-size
    lines must be removed before the payload is page content; trailers
    after the terminal 0-chunk are ignored."""
    out = []
    pos = 0
    n = len(payload)
    while True:
        nl = payload.find(_CRLF, pos)
        if nl < 0:
            raise WarcFormatError("chunked body: missing chunk-size line")
        size_tok = payload[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise WarcFormatError(
                f"chunked body: bad chunk size {size_tok[:20]!r}"
            ) from None
        pos = nl + 2
        if size == 0:
            return b"".join(out)
        if pos + size > n:
            raise WarcFormatError("chunked body: chunk data truncated")
        out.append(payload[pos : pos + size])
        pos += size
        if payload[pos : pos + 2] != _CRLF:
            raise WarcFormatError("chunked body: missing CRLF after chunk data")
        pos += 2


def _http_payload(headers: dict[bytes, bytes], body: bytes) -> tuple[int | None, bytes]:
    """(status, payload) for a page record body. Envelope handling is keyed
    on the RECORD's Content-Type (ISO 28500 §6.2): ``application/http``
    bodies are HTTP messages (envelope stripped, chunked framing decoded,
    status returned); everything else — resource records, non-HTTP schemes
    — passes through whole with status None, even if the document bytes
    happen to begin with ``HTTP/``."""
    ctype = headers.get(b"content-type", b"")
    if not ctype.lower().startswith(b"application/http"):
        return None, body
    if not body.startswith(b"HTTP/"):
        raise WarcFormatError(
            f"application/http record body does not start with HTTP/: {body[:20]!r}"
        )
    sep = body.find(_HDR_END)
    if sep < 0:
        raise WarcFormatError("HTTP response block has headers but no blank-line terminator")
    head = body[:sep]
    status_line, _, hdr_block = head.partition(_CRLF)
    parts = status_line.split()
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        raise WarcFormatError(
            f"malformed HTTP status line {status_line[:40]!r}"
        ) from None
    payload = body[sep + len(_HDR_END) :]
    http_headers = _parse_headers(hdr_block, 0) if hdr_block else {}
    if b"chunked" in http_headers.get(b"transfer-encoding", b"").lower():
        payload = _dechunk(payload)
    return status, payload


def _parse_warc_date(raw: bytes) -> dt.datetime:
    """WARC-Date is ISO 8601 UTC (`2026-08-20T12:00:00Z`); returned naive
    because the engine pins spark.sql.session.timeZone=UTC (session.py).
    An offset-less date (malformed but parseable) is taken AS UTC — never
    host-local, which would make the same container parse differently on
    different executors. An unparseable date raises WarcFormatError (the
    one documented malformed-container signal), not a bare ValueError."""
    try:
        s = raw.decode("ascii").strip()
        if s.endswith("Z"):
            s = s[:-1] + "+00:00"
        d = dt.datetime.fromisoformat(s)
    except (UnicodeDecodeError, ValueError) as e:
        raise WarcFormatError(f"unparseable WARC-Date {raw[:40]!r}: {e}") from e
    if d.tzinfo is None:
        return d
    return d.astimezone(dt.timezone.utc).replace(tzinfo=None)


_COLS = ["url", "warc_ts", "html", "text", "lang"]


def _iter_page_rows(data: bytes, extract_text: bool) -> Iterator[dict]:
    """Lazy page rows from container bytes. Only page-bearing records
    (response with 2xx status / resource / WET conversion) produce rows.
    `lang` comes from WARC-Identified-Content-Language (present in Common
    Crawl since CC-MAIN-2018-39; first tag wins when multi-valued), else
    NULL."""
    from searchengine_spark.functions.textproc import extract_text_from_html

    for headers, body in iter_warc_records(data):
        if headers.get(b"warc-type", b"") not in _PAGE_TYPES:
            continue
        uri = headers.get(b"warc-target-uri")
        date = headers.get(b"warc-date")
        if uri is None or date is None:
            raise WarcFormatError(
                "page record missing WARC-Target-URI or WARC-Date "
                f"(headers: {sorted(headers)[:8]})"
            )
        wtype = headers[b"warc-type"]
        if wtype == b"conversion":
            # WET: the payload IS the extracted text; no html bytes exist
            html, text = None, body.decode("utf-8", "replace")
        else:
            if wtype == b"response" and not (
                headers.get(b"content-type", b"").lower().startswith(b"application/http")
            ):
                # a response record MUST carry an HTTP message (ISO 28500
                # §6.3.2); passing its body through whole would index raw
                # envelope bytes AND bypass the 2xx filter — fail, don't
                # corrupt (resource records are the pass-through form)
                raise WarcFormatError(
                    "response record without application/http Content-Type "
                    f"(got {headers.get(b'content-type', b'')[:40]!r}) for "
                    f"{uri.decode('utf-8', 'replace')}"
                )
            status, payload = _http_payload(headers, body)
            if status is not None and not (200 <= status < 300):
                continue  # 404 pages / redirect stubs / 5xx are not corpus pages
            html = payload
            text = (
                extract_text_from_html(payload.decode("utf-8", "replace"))
                if extract_text
                else None
            )
        url = uri.decode("utf-8", "replace")
        if url.startswith("<") and url.endswith(">"):
            url = url[1:-1]  # exactly ONE bracket pair (WARC 1.0 uri form)
        lang_raw = headers.get(b"warc-identified-content-language")
        yield {
            "url": url,
            "warc_ts": _parse_warc_date(date),
            "html": html,
            "text": text,
            "lang": (
                lang_raw.decode("ascii", "replace").split(",")[0].strip()
                if lang_raw
                else None
            ),
        }


def parse_warc_pages(data: bytes, extract_text: bool = True) -> pd.DataFrame:
    """WARC container bytes → ONE pandas frame in PAGES_SCHEMA order
    (convenience for tests/small containers; the distributed path,
    read_warc, streams bounded batches instead)."""
    rows = list(_iter_page_rows(data, extract_text))
    return pd.DataFrame(rows, columns=_COLS)


def read_warc(
    spark: SparkSession,
    path: str,
    extract_text: bool = True,
    batch_rows: int = 1000,
) -> DataFrame:
    """Directory/glob of ``.warc`` / ``.warc.gz`` files → input table.
    One binaryFile row per container, one Arrow parse pass, zero shuffle.
    Output frames are emitted every ``batch_rows`` pages so a task holds
    O(batch) decoded pages, never the whole decoded container (a ~1 GB CC
    segment decodes to several GB of html+text)."""
    files = spark.read.format("binaryFile").load(path).select("content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                buf: list[dict] = []
                for row in _iter_page_rows(bytes(blob), extract_text):
                    buf.append(row)
                    if len(buf) >= batch_rows:
                        yield pd.DataFrame(buf, columns=_COLS)
                        buf = []
                if buf:
                    yield pd.DataFrame(buf, columns=_COLS)

    return files.mapInPandas(run, PAGES_SCHEMA)


# --------------------------------------------------------------------- write
def _record_bytes(
    wtype: bytes, url: str, ts: dt.datetime, body: bytes, ctype: bytes,
    lang: str | None = None,
) -> bytes:
    """One WARC/1.0 record (deterministic: the record id is urn:md5 of
    type+url+date, no UUIDs — test fixtures must be byte-stable). Naive
    ``ts`` is taken as UTC (the engine's session timezone); aware ``ts``
    is converted before the Z-suffixed format is stamped. A CR/LF in url
    or lang would inject header lines (the WARC analog of HTTP response
    splitting) — rejected loudly."""
    for name, val in (("url", url), ("lang", lang)):
        if val is not None and ("\r" in val or "\n" in val):
            raise ValueError(f"{name} contains CR/LF (header injection): {val!r}")
    if ts.tzinfo is not None:
        ts = ts.astimezone(dt.timezone.utc).replace(tzinfo=None)
    date = ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode()
    rid = hashlib.md5(wtype + b":" + url.encode() + date).hexdigest()
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + wtype,
        b"WARC-Record-ID: <urn:md5:" + rid.encode() + b">",
        b"WARC-Date: " + date,
        b"WARC-Target-URI: " + url.encode(),
        b"Content-Type: " + ctype,
        b"Content-Length: " + str(len(body)).encode(),
    ]
    if lang is not None:
        headers.insert(5, b"WARC-Identified-Content-Language: " + lang.encode())
    return _CRLF.join(headers) + _HDR_END + body + _HDR_END


def warc_record_bytes(
    url: str,
    ts: dt.datetime,
    html: bytes,
    lang: str | None = None,
    http_envelope: bool = True,
) -> bytes:
    """One response (HTTP-enveloped) or resource (bare-document) record."""
    if http_envelope:
        body = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=UTF-8\r\n"
            + b"Content-Length: " + str(len(html)).encode() + _HDR_END
            + html
        )
        return _record_bytes(
            b"response", url, ts, body, b"application/http; msgtype=response", lang
        )
    return _record_bytes(b"resource", url, ts, html, b"text/html", lang)


def wet_record_bytes(
    url: str, ts: dt.datetime, text: str, lang: str | None = None
) -> bytes:
    """One WET ``conversion`` record (Common Crawl's extracted-text
    sidecar): the body is the already-extracted utf-8 text."""
    return _record_bytes(b"conversion", url, ts, text.encode("utf-8"), b"text/plain", lang)


def _write_container(pages, rec_fn, gzip_per_record: bool, mtime: int) -> bytes:
    """Shared container framing: one record per page row, optionally one
    gzip member per record (the Common-Crawl layout); mtime pinned so
    output is byte-deterministic."""
    out = io.BytesIO()
    for page in pages:
        rec = rec_fn(page)
        if gzip_per_record:
            out.write(gzip.compress(rec, mtime=mtime))
        else:
            out.write(rec)
    return out.getvalue()


def write_warc_bytes(
    pages: Iterable[dict], gzip_per_record: bool = True, mtime: int = 0
) -> bytes:
    """Rows (dicts with url/warc_ts/html/lang) → one WARC container."""
    return _write_container(
        pages,
        lambda p: warc_record_bytes(p["url"], p["warc_ts"], bytes(p["html"]), p.get("lang")),
        gzip_per_record, mtime,
    )


def write_wet_bytes(
    pages: Iterable[dict], gzip_per_record: bool = True, mtime: int = 0
) -> bytes:
    """Rows (dicts with url/warc_ts/text/lang) → one WET container of
    ``conversion`` records — the layout LLM-data pipelines consume when
    they want Common Crawl's extracted text without the html bytes."""
    return _write_container(
        pages,
        lambda p: wet_record_bytes(p["url"], p["warc_ts"], p["text"], p.get("lang")),
        gzip_per_record, mtime,
    )
