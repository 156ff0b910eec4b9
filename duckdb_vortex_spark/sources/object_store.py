"""S3-protocol object-store filesystem for the vortex source (A3).

Upgrades SURVEY.md §2A row A3 from a local-FS routing shim to a REAL
object-store client: AWS Signature Version 4 request signing, ranged
GETs (the footer-first `.vortex` read pattern never downloads a whole
file to read a trailer), STREAMING multipart uploads (only one part
buffers in memory; single-PUT fast path for small files), ListObjectsV2-backed
glob, HEAD-backed exists — implemented with stdlib only
(urllib/hashlib/hmac/xml), no boto, no new dependencies.

Reference parity: the reference reads `s3://` URIs through DuckDB's
httpfs + the vortex crates' object-store layer (README.md:63-79 usage;
Cargo.lock `object_store`); this module is the Spark-side equivalent
behind the same `register_filesystem` seam `sources/vortex_format.py`
routes every non-local URI through.

Verification without external network (the sandbox has none): the
test suite (tests/test_object_store.py) runs an in-process
S3-compatible HTTP server that RECOMPUTES the SigV4 signature
server-side and rejects mismatches — so signing is validated against
an independent implementation of the spec's canonical-request / HMAC
chain, not round-tripped through itself. Against real AWS/MinIO/GCS
(interop mode), point `endpoint_url` at the store; the wire format is
identical.

At 100 TB: executors open ranged readers per task (no whole-object
buffering; `read()` issues one ranged GET per call and the vortex
reader already reads per-chunk-column slices), listings are paginated
server-side, and credentials come from the environment exactly once
per process. This client is the single-node/dev path — on a real
cluster the same URIs go through Hadoop S3A via Spark itself; both
routes hang off the same scheme registry.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import hmac
import io
import os
import re
import time
import urllib.error
import urllib.parse
import urllib.request
import xml.etree.ElementTree as ET

__all__ = ["S3FS", "SigV4Signer", "register_s3", "parse_s3_uri"]

_EMPTY_SHA256 = hashlib.sha256(b"").hexdigest()


def _glob_regex(pat: str) -> re.Pattern:
    """Compile a glob to a regex with LOCAL-GLOB semantics: ``*`` and
    ``?`` match within one path segment (never ``/``); ``**`` matches
    across segments; ``[...]`` character classes pass through. fnmatch
    is wrong here — its ``*`` crosses ``/``, so ``dir/*.vortex`` would
    also match ``dir/sub/x.vortex`` (ADVICE r4)."""
    out = []
    i = 0
    while i < len(pat):
        c = pat[i]
        if c == "*":
            if pat[i : i + 2] == "**":
                out.append(".*")
                i += 2
                if pat[i : i + 1] == "/":
                    i += 1  # '**/' already covered by '.*'
                continue
            out.append("[^/]*")
        elif c == "?":
            out.append("[^/]")
        elif c == "[":
            j = pat.find("]", i + 1)
            if j == -1:
                out.append(re.escape(c))
            else:
                cls = pat[i + 1 : j]
                neg = cls.startswith("!")
                if neg:
                    cls = cls[1:]
                # class bodies pass through to the regex engine: a raw
                # backslash would escape the next member, and an empty
                # or otherwise untranslatable body ('[]]') is invalid
                # regex — escape backslashes, validate the snippet, and
                # fall back to a literal '[' when it cannot be embedded
                # safely (ADVICE r5)
                candidate = "[" + ("^" if neg else "") + cls.replace("\\", "\\\\") + "]"
                try:
                    re.compile(candidate)
                except re.error:
                    out.append(re.escape(c))
                else:
                    out.append(candidate)
                    i = j
        else:
            out.append(re.escape(c))
        i += 1
    return re.compile("".join(out))


def parse_s3_uri(path: str) -> tuple[str, str]:
    """``s3://bucket/key/parts`` → (bucket, key). Accepts s3/s3a/s3n.

    Split manually, NOT with urlparse: object keys are raw strings in
    which '?' (also a glob wildcard the vortex source supports) and
    '#' are legal characters, but urlparse would truncate them into
    query/fragment and silently address the wrong object."""
    scheme, sep, rest = path.partition("://")
    if not sep or scheme not in ("s3", "s3a", "s3n"):
        raise ValueError(f"not an s3 URI: {path!r}")
    bucket, _, key = rest.partition("/")
    return bucket, key


class SigV4Signer:
    """AWS Signature Version 4 (the published algorithm: canonical
    request → string-to-sign → HMAC key chain → authorization header).
    Pure stdlib; deterministic given (key, secret, region, time)."""

    def __init__(self, access_key: str, secret_key: str, region: str = "us-east-1",
                 service: str = "s3"):
        self.access_key = access_key
        self.secret_key = secret_key
        self.region = region
        self.service = service

    @staticmethod
    def _canonical_query(query: dict[str, str]) -> str:
        return "&".join(
            f"{urllib.parse.quote(k, safe='-_.~')}={urllib.parse.quote(v, safe='-_.~')}"
            for k, v in sorted(query.items())
        )

    def sign(self, method: str, host: str, canonical_uri: str,
             query: dict[str, str], headers: dict[str, str],
             payload_sha256: str, now: _dt.datetime | None = None) -> dict[str, str]:
        """Returns the headers to add (Authorization, x-amz-date,
        x-amz-content-sha256, host). ``canonical_uri`` must already be
        URI-encoded per the S3 variant of the spec (each path segment
        quoted, '/' preserved)."""
        t = now or _dt.datetime.now(_dt.timezone.utc)
        amz_date = t.strftime("%Y%m%dT%H%M%SZ")
        datestamp = t.strftime("%Y%m%d")
        hdrs = dict(headers)
        hdrs["host"] = host
        hdrs["x-amz-date"] = amz_date
        if self.service == "s3":
            # S3 requires the payload hash as a signed header; other
            # services (and AWS's published sigv4 test vectors, which
            # this signer is pinned against) omit it
            hdrs["x-amz-content-sha256"] = payload_sha256
        signed_names = sorted(k.lower() for k in hdrs)
        canonical_headers = "".join(
            f"{k}:{str(hdrs[next(h for h in hdrs if h.lower() == k)]).strip()}\n"
            for k in signed_names
        )
        signed_headers = ";".join(signed_names)
        canonical_request = "\n".join(
            [
                method,
                canonical_uri,
                self._canonical_query(query),
                canonical_headers,
                signed_headers,
                payload_sha256,
            ]
        )
        scope = f"{datestamp}/{self.region}/{self.service}/aws4_request"
        string_to_sign = "\n".join(
            [
                "AWS4-HMAC-SHA256",
                amz_date,
                scope,
                hashlib.sha256(canonical_request.encode()).hexdigest(),
            ]
        )

        def _hmac(key: bytes, msg: str) -> bytes:
            return hmac.new(key, msg.encode(), hashlib.sha256).digest()

        k_date = _hmac(("AWS4" + self.secret_key).encode(), datestamp)
        k_region = _hmac(k_date, self.region)
        k_service = _hmac(k_region, self.service)
        k_signing = _hmac(k_service, "aws4_request")
        signature = hmac.new(
            k_signing, string_to_sign.encode(), hashlib.sha256
        ).hexdigest()
        auth = (
            f"AWS4-HMAC-SHA256 Credential={self.access_key}/{scope}, "
            f"SignedHeaders={signed_headers}, Signature={signature}"
        )
        out = {k: v for k, v in hdrs.items() if k != "host"}
        out["Authorization"] = auth
        return out


class _S3ReadableFile(io.RawIOBase):
    """Seekable read-only file over ranged GETs. ``read(n)`` issues ONE
    ranged GET for exactly the requested slice (the vortex reader asks
    for footer then per-chunk-column slices — no whole-object
    download); ``read()`` with no size fetches the tail in one GET.

    The object size is fetched LAZILY (ADVICE r9): opening used to
    cost one HEAD up front, which doubled the per-pointer request
    count on the `fetch_media_ranges` hot path — a caller that only
    ever seek(SET)s and read(n)s known-valid (offset, length) ranges
    now costs exactly one GET per read and ZERO HEADs. The size is
    resolved on first need: read-all, SEEK_END, or clamping a sized
    read once known. While the size is unknown a sized read trusts the
    caller's range — a range crossing the object tail is clamped by
    the server itself (RFC 7233); a range starting AT the tail
    (pos == size) is the io.RawIOBase EOF probe every sequential
    consumer (io.BufferedReader, shutil.copyfileobj) makes, so the
    server's 416 is caught, the true size parsed from its
    ``Content-Range: bytes */<len>`` header, and b'' returned
    (ADVICE r10); a range starting PAST the tail still fails loudly
    with the 416 (a pointer past EOF is corrupt metadata, not
    end-of-stream)."""

    def __init__(self, fs: "S3FS", bucket: str, key: str):
        self._fs = fs
        self._bucket = bucket
        self._key = key
        self._size: int | None = None  # lazy — see class docstring
        self._pos = 0

    def _known_size(self) -> int:
        if self._size is None:
            self._size = self._fs._head_size(self._bucket, self._key)
        return self._size

    def seekable(self) -> bool:
        return True

    def readable(self) -> bool:
        return True

    def seek(self, offset: int, whence: int = os.SEEK_SET) -> int:
        if whence == os.SEEK_SET:
            self._pos = offset
        elif whence == os.SEEK_CUR:
            self._pos += offset
        elif whence == os.SEEK_END:
            self._pos = self._known_size() + offset
        else:
            raise ValueError(f"bad whence {whence}")
        return self._pos

    def tell(self) -> int:
        return self._pos

    def read(self, n: int = -1) -> bytes:
        if n == 0:
            # zero-length slices are real (constant/RLE columns encode
            # to 0-byte buffers): 'bytes=pos-(pos-1)' is an INVALID
            # byte-range-spec that real S3 ignores per RFC 7233,
            # returning the whole object — never send it
            return b""
        if n is None or n < 0:
            end = self._known_size() - 1
        elif self._size is not None:
            end = min(self._pos + n, self._size) - 1
        else:
            end = self._pos + n - 1  # size unknown: server clamps the tail
        if self._size is not None and self._pos >= self._size:
            return b""
        try:
            data = self._fs._request(
                "GET", self._bucket, self._key,
                headers={"range": f"bytes={self._pos}-{end}"},
            )
        except urllib.error.HTTPError as e:
            if e.code == 416 and self._size is None:
                # RFC 7233: the unsatisfiable-range response names the
                # complete length (Content-Range: bytes */<len>). If
                # pos == size this was a legitimate sequential EOF
                # probe — return b'' per the io.RawIOBase contract;
                # anything further past the tail stays loud.
                m = re.fullmatch(
                    r"bytes \*/(\d+)", e.headers.get("Content-Range") or ""
                )
                if m:
                    self._size = int(m.group(1))
                    if self._pos == self._size:
                        return b""
            raise
        self._pos += len(data)
        return data


class _S3WritableFile(io.RawIOBase):
    """Streaming writer with multipart upload: bytes buffer locally
    only up to ``part_size``; each full part is shipped immediately
    (UploadPart), so writing a multi-GB vortex file holds ONE part in
    memory, not the file. Files smaller than one part take the single
    PUT fast path on close. This is the memory contract a 100 TB
    writer task actually needs — and the single-PUT 5 GB object cap on
    real S3 makes multipart mandatory there anyway."""

    def __init__(self, fs: "S3FS", bucket: str, key: str,
                 part_size: int = 64 * 1024 * 1024):
        super().__init__()
        self._fs = fs
        self._bucket = bucket
        self._key = key
        self._part_size = part_size
        self._buf = bytearray()
        self._upload_id: str | None = None
        self._etags: list[str] = []
        self._done = False

    def writable(self) -> bool:
        return True

    def write(self, b) -> int:
        self._buf.extend(b)
        while len(self._buf) >= self._part_size:
            self._ship(bytes(self._buf[: self._part_size]))
            del self._buf[: self._part_size]
        return len(b)

    def _ship(self, part: bytes) -> None:
        if self._upload_id is None:
            self._upload_id = self._fs._initiate_multipart(self._bucket, self._key)
        self._etags.append(
            self._fs._upload_part(
                self._bucket, self._key, self._upload_id, len(self._etags) + 1, part
            )
        )

    def abort(self) -> None:
        """Discard the write: abort any initiated multipart upload
        (real S3 retains un-aborted parts indefinitely — and bills
        them) and never PUT the partial buffer. After abort, close()
        is a no-op, so ``finally: f.close()`` cleanup stays safe."""
        if not self._done:
            self._done = True
            self._buf.clear()
            if self._upload_id is not None:
                self._fs._abort_multipart(self._bucket, self._key, self._upload_id)
        super().close()

    def close(self) -> None:
        if not self._done:
            self._done = True
            if self._upload_id is None:
                # small file: single PUT
                self._fs._request(
                    "PUT", self._bucket, self._key, body=bytes(self._buf)
                )
            else:
                if self._buf:
                    self._ship(bytes(self._buf))
                    self._buf.clear()
                self._fs._complete_multipart(
                    self._bucket, self._key, self._upload_id, self._etags
                )
        super().close()

    def __exit__(self, exc_type, exc, tb) -> None:
        # ``with s3.open(..., 'wb')`` must NOT publish a truncated
        # object when the block raises: commit (close) only on clean
        # exit, abort the multipart upload otherwise (ADVICE r4 —
        # the vortex writer paths already call abort() explicitly;
        # this extends the guarantee to direct S3FS users).
        if exc_type is not None:
            self.abort()
        else:
            self.close()


class S3FS:
    """Object-store filesystem implementing the vortex source's
    handler protocol (open/glob/isdir/exists/remove) over the S3 REST
    API with SigV4 auth. ``endpoint_url`` targets any S3-compatible
    store (AWS, MinIO, the in-process test server); path-style
    addressing so bucket DNS is not required."""

    flat_namespace = True  # no directories: glob results are real objects

    # real S3 rejects multipart parts under 5 MiB (except the last)
    # with EntityTooSmall — at CompleteMultipartUpload, AFTER every
    # part already uploaded. Validate up front instead (ADVICE r4);
    # ``allow_small_parts=True`` is the escape hatch for test
    # endpoints that accept any size.
    MIN_PART_SIZE = 5 * 1024 * 1024

    def __init__(self, endpoint_url: str, access_key: str | None = None,
                 secret_key: str | None = None, region: str = "us-east-1",
                 part_size: int = 64 * 1024 * 1024,
                 session_token: str | None = None,
                 timeout: float = 60.0, max_retries: int = 3,
                 retry_backoff: float = 0.5,
                 allow_small_parts: bool = False):
        if part_size < self.MIN_PART_SIZE and not allow_small_parts:
            raise ValueError(
                f"part_size {part_size} < S3's 5 MiB multipart minimum — real "
                "S3 fails the upload with EntityTooSmall only at "
                "CompleteMultipartUpload, after all parts are shipped; pass "
                "allow_small_parts=True only for test endpoints"
            )
        self.endpoint = endpoint_url.rstrip("/")
        self.part_size = part_size
        self.timeout = timeout
        self.max_retries = max_retries
        self.retry_backoff = retry_backoff
        # AWS_SESSION_TOKEN: temporary credentials (STS/instance roles/
        # SSO) are the NORM on real clusters; without the signed
        # x-amz-security-token header every such request 403s
        self.session_token = (
            session_token
            if session_token is not None
            else os.environ.get("AWS_SESSION_TOKEN") or None
        )
        self.signer = SigV4Signer(
            access_key or os.environ.get("AWS_ACCESS_KEY_ID", ""),
            secret_key or os.environ.get("AWS_SECRET_ACCESS_KEY", ""),
            region,
        )

    @property
    def config(self) -> tuple:
        """Identity tuple for conflict detection in register_s3: two
        stores are "the same" iff every wire-affecting parameter is."""
        return (
            self.endpoint,
            self.signer.access_key,
            self.signer.secret_key,
            self.signer.region,
            self.session_token,
        )

    # -- HTTP plumbing -----------------------------------------------------

    # 5xx statuses real S3 emits for transient conditions (500
    # InternalError, 503 SlowDown under request-rate throttling) plus
    # the gateway pair a proxy in front of the store can add.
    _RETRY_STATUSES = frozenset({500, 502, 503, 504})
    # Verbs safe to resend: GET/HEAD are pure reads; DELETE and a
    # partNumber'd PUT are idempotent (re-PUT of the same part just
    # replaces it). POST (InitiateMultipart / CompleteMultipart) is NOT
    # retried here — a blind re-POST of initiate leaks an upload id.
    _RETRY_METHODS = frozenset({"GET", "HEAD", "PUT", "DELETE"})

    def _request_full(self, method: str, bucket: str, key: str,
                      query: dict[str, str] | None = None,
                      headers: dict[str, str] | None = None,
                      body: bytes = b""):
        """Sign and send one request; returns the open response (body
        + headers). The SINGLE copy of the canonical-uri → sign →
        Request → send sequence — every verb routes through here so a
        signing change (e.g. session tokens) lands exactly once.

        Every send carries an explicit ``timeout`` (a stalled
        connection must fail the Spark task, not hang the executor
        slot forever), and idempotent verbs get a small bounded retry
        with backoff: transient 500/503 (S3 ``SlowDown``) responses
        are ROUTINE against a real store under load and must not fail
        a whole task on first occurrence (ADVICE r4)."""
        query = query or {}
        canonical_uri = "/" + urllib.parse.quote(f"{bucket}/{key}" if key else bucket,
                                                 safe="/-_.~")
        host = urllib.parse.urlparse(self.endpoint).netloc
        payload_hash = hashlib.sha256(body).hexdigest() if body else _EMPTY_SHA256
        extra = dict(headers or {})
        if self.session_token:
            extra["x-amz-security-token"] = self.session_token
        qs = ("?" + self.signer._canonical_query(query)) if query else ""
        attempts = self.max_retries + 1 if method in self._RETRY_METHODS else 1
        for attempt in range(attempts):
            # re-sign per attempt: x-amz-date must be fresh (a retry
            # after backoff with a stale signature can trip the
            # server's request-skew window on long backoffs)
            hdrs = self.signer.sign(
                method, host, canonical_uri, query, extra, payload_hash
            )
            # send EXACTLY the canonical encoding that was signed
            # (urlencode would emit '+' for spaces where sigv4
            # canonicalizes '%20' — real S3 recomputes the signature
            # from the raw sent query, so the encodings must byte-match)
            req = urllib.request.Request(
                f"{self.endpoint}{canonical_uri}{qs}", data=body or None, method=method
            )
            for k, v in hdrs.items():
                req.add_header(k, v)
            try:
                return urllib.request.urlopen(req, timeout=self.timeout)
            except urllib.error.HTTPError as e:
                if attempt + 1 >= attempts or e.code not in self._RETRY_STATUSES:
                    raise
                e.close()
            except (urllib.error.URLError, TimeoutError, ConnectionError):
                # connection reset / DNS blip / socket timeout
                if attempt + 1 >= attempts:
                    raise
            time.sleep(self.retry_backoff * (2 ** attempt))

    def _request(self, method: str, bucket: str, key: str,
                 query: dict[str, str] | None = None,
                 headers: dict[str, str] | None = None,
                 body: bytes = b"") -> bytes:
        with self._request_full(method, bucket, key, query, headers, body) as resp:
            return resp.read()

    def _head_size(self, bucket: str, key: str) -> int:
        with self._request_full("HEAD", bucket, key) as resp:
            return int(resp.headers["Content-Length"])

    # -- multipart upload (the streaming write path) ----------------------

    def _initiate_multipart(self, bucket: str, key: str) -> str:
        data = self._request("POST", bucket, key, query={"uploads": ""})
        root = ET.fromstring(data)
        ns = root.tag.split("}")[0] + "}" if root.tag.startswith("{") else ""
        return root.find(f"{ns}UploadId").text

    def _upload_part(self, bucket: str, key: str, upload_id: str,
                     part_number: int, body: bytes) -> str:
        query = {"partNumber": str(part_number), "uploadId": upload_id}
        with self._request_full("PUT", bucket, key, query, body=body) as resp:
            return resp.headers.get("ETag", "").strip('"')

    def _complete_multipart(self, bucket: str, key: str, upload_id: str,
                            etags: list[str]) -> None:
        parts = "".join(
            f"<Part><PartNumber>{i + 1}</PartNumber><ETag>{e}</ETag></Part>"
            for i, e in enumerate(etags)
        )
        body = f"<CompleteMultipartUpload>{parts}</CompleteMultipartUpload>".encode()
        self._request("POST", bucket, key, query={"uploadId": upload_id}, body=body)

    def _abort_multipart(self, bucket: str, key: str, upload_id: str) -> None:
        self._request("DELETE", bucket, key, query={"uploadId": upload_id})

    def _list(self, bucket: str, prefix: str, limit: int | None = None) -> list[str]:
        """Keys under prefix (ListObjectsV2, paginated). ``limit``
        caps the answer server-side (max-keys) — existence probes must
        not page through a whole dataset's listing."""
        keys: list[str] = []
        token: str | None = None
        while True:
            q = {"list-type": "2", "prefix": prefix}
            if limit is not None:
                q["max-keys"] = str(limit)
            if token:
                q["continuation-token"] = token
            data = self._request("GET", bucket, "", query=q)
            root = ET.fromstring(data)
            ns = root.tag.split("}")[0] + "}" if root.tag.startswith("{") else ""
            for c in root.findall(f"{ns}Contents"):
                keys.append(c.find(f"{ns}Key").text)
            if limit is not None and len(keys) >= limit:
                return keys[:limit]
            trunc = root.find(f"{ns}IsTruncated")
            if trunc is None or trunc.text != "true":
                return keys
            token = root.find(f"{ns}NextContinuationToken").text

    # -- handler protocol --------------------------------------------------

    def open(self, path: str, mode: str = "rb"):
        """Open one object. Write mode streams multipart; NOTE the
        commit contract: ``close()`` PUBLISHES the object (single PUT
        or CompleteMultipartUpload) — a writer that may fail mid-write
        must call ``abort()`` on the error path, and the ``with``
        statement does this automatically (``__exit__`` aborts on
        exception, commits only on clean exit)."""
        bucket, key = parse_s3_uri(path)
        if "r" in mode:
            return _S3ReadableFile(self, bucket, key)
        return _S3WritableFile(self, bucket, key, self.part_size)

    def glob(self, pattern: str) -> list[str]:
        return [p for p, _ in self.glob_entries(pattern)]

    def glob_entries(self, pattern: str) -> list[tuple[str, bool]]:
        """Glob with LOCAL-GLOB segment semantics over the flat key
        namespace: ``*``/``?``/``[...]`` never match ``/`` (so
        ``dir/*.vortex`` cannot silently pull in ``dir/sub/x.vortex``)
        while ``**`` crosses segments — matching the local-filesystem
        handler, so a dataset URI means the same files on either store
        (ADVICE r4).

        Returns ``(uri, is_dir)`` pairs from ONE listing: a key that
        fully matches is an object (``is_dir=False``); a *key prefix*
        ending at a ``/`` boundary that matches is a dataset
        "directory" (``is_dir=True`` — e.g. pattern ``ds-?.vortex``
        with data at ``ds-1.vortex/part-0.vortex``), which the vortex
        source expands to its part files exactly as it does locally.
        No per-match network probes — object/directory classification
        falls out of the same listing."""
        bucket, keypat = parse_s3_uri(pattern)
        # list from the literal prefix before the first wildcard, then
        # regex-match client-side
        cut = len(keypat)
        for ch in "*?[":
            i = keypat.find(ch)
            if i != -1:
                cut = min(cut, i)
        scheme = pattern.partition("://")[0]
        rx = _glob_regex(keypat)
        objects: set[str] = set()
        dirs: set[str] = set()
        for k in self._list(bucket, keypat[:cut]):
            if rx.fullmatch(k):
                objects.add(k)
                continue
            # probe each '/'-boundary prefix of the key as a directory
            j = k.find("/")
            while j != -1:
                pre = k[:j]
                if rx.fullmatch(pre):
                    dirs.add(pre)
                    break
                j = k.find("/", j + 1)
        entries = [(f"{scheme}://{bucket}/{k}", False) for k in objects]
        entries += [(f"{scheme}://{bucket}/{d}", True) for d in dirs - objects]
        return sorted(entries)

    def isdir(self, path: str) -> bool:
        bucket, key = parse_s3_uri(path)
        prefix = key.rstrip("/") + "/" if key else ""
        # existence probe, not an enumeration: max-keys=1 — paging a
        # 10k-file dataset listing per probe is O(N) network at plan time
        return bool(self._list(bucket, prefix, limit=1))

    def exists(self, path: str) -> bool:
        bucket, key = parse_s3_uri(path)
        try:
            self._head_size(bucket, key)
            return True
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return bool(key) and self.isdir(path)
            raise

    def remove(self, path: str) -> None:
        bucket, key = parse_s3_uri(path)
        self._request("DELETE", bucket, key)


def register_s3(endpoint_url: str, access_key: str | None = None,
                secret_key: str | None = None, region: str = "us-east-1",
                schemes: tuple[str, ...] = ("s3", "s3a", "s3n"),
                session_token: str | None = None,
                replace: bool = False, **s3fs_kwargs) -> S3FS:
    """Build an S3FS and register it for the s3/s3a/s3n schemes in the
    vortex source's scheme registry. Call once per process (driver AND
    executors — in practice from a session-init hook). ``session_token``
    (or AWS_SESSION_TOKEN in the env) enables temporary STS creds.

    A scheme can hold only ONE store per process, so registering a
    *different* endpoint/credentials over an existing registration is
    a conflict that silently reroutes the first dataset's later reads
    (ADVICE r4): it now raises unless ``replace=True`` (the vortex
    DataSource's per-task option re-application passes replace=True
    deliberately — each task re-registers its OWN store immediately
    before resolving paths, see vortex._apply_store_options)."""
    from . import vortex_format

    fs = S3FS(endpoint_url, access_key, secret_key, region,
              session_token=session_token, **s3fs_kwargs)
    if not replace:
        for s in schemes:
            prev = vortex_format._FILESYSTEMS.get(s)
            if prev is None:
                continue
            if isinstance(prev, S3FS):
                if prev.config != fs.config:
                    raise ValueError(
                        f"scheme {s!r} already registered for endpoint "
                        f"{prev.endpoint!r}; registering {fs.endpoint!r} would "
                        "silently reroute its reads — pass replace=True if "
                        "intentional"
                    )
            else:
                # a custom (non-S3FS) handler on the scheme is the same
                # silent-reroute hazard the guard exists for (ADVICE r5)
                raise ValueError(
                    f"scheme {s!r} already registered with a custom "
                    f"filesystem ({type(prev).__name__}); registering an "
                    "S3FS over it would silently reroute its reads — pass "
                    "replace=True if intentional"
                )
    for s in schemes:
        vortex_format.register_filesystem(s, fs)
    return fs
