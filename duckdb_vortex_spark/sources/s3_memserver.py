"""In-process S3-compatible memory server with SERVER-SIDE SigV4
verification — the validation half of the A3 object-store story.

This is not a mock that echoes the client: it independently rebuilds
the canonical request from the raw HTTP wire (method, path, query,
signed headers, payload hash), re-derives the AWS4 signing key from
the shared secret, and 403s any mismatch — a second implementation of
the published SigV4 algorithm, so the client's signer is validated
against the spec rather than against itself. Payload hashes are also
recomputed server-side (catches body/hash mismatches), multipart
completion verifies the client's claimed per-part ETags, listings
paginate with a deliberately tiny page size to force continuation
tokens, and ranged GETs implement real-S3 RFC 7233 semantics
(an invalid byte-range-spec is IGNORED and the full object returned —
the lenient-server behavior that masks read(0) bugs).

Used by tests/test_object_store.py AND the driver catalog entry
``vortex_s3_roundtrip_scan`` (sources/vortex_entries.py), which runs
the full Spark loop — ``.option("s3_endpoint", …)`` DataSource write →
ranged-GET footer-first read → pushed-filter aggregate — against this
server inside the correctness gate. Binds 127.0.0.1 only; no external
network.
"""

from __future__ import annotations

import hashlib
import hmac
import http.server
import re
import threading
import urllib.parse

__all__ = ["S3MemHandler", "start_memserver"]


class S3MemHandler(http.server.BaseHTTPRequestHandler):
    """Minimal S3 REST subset (PUT/GET/HEAD/DELETE, multipart,
    ListObjectsV2) with server-side SigV4 verification. Credentials
    and state are CLASS attributes — subclass via start_memserver so
    concurrent servers don't share stores."""

    access_key = "memserver-access"
    secret_key = "memserver-secret"
    store: dict[tuple[str, str], bytes]
    uploads: dict[str, dict[int, bytes]]
    protocol_version = "HTTP/1.1"
    page_size = 2  # tiny, to force ListObjectsV2 pagination

    def log_message(self, *a):  # quiet
        pass

    # -- server-side signature check --------------------------------------

    def _verify(self) -> bool:
        auth = self.headers.get("Authorization", "")
        if not auth.startswith("AWS4-HMAC-SHA256 "):
            return False
        parts = dict(
            p.strip().split("=", 1) for p in auth[len("AWS4-HMAC-SHA256 "):].split(",")
        )
        cred = parts["Credential"].split("/")
        access, datestamp, region, service = cred[0], cred[1], cred[2], cred[3]
        if access != self.access_key:
            return False
        signed = parts["SignedHeaders"].split(";")
        url = urllib.parse.urlsplit(self.path)
        # canonical query from the raw query string
        q = urllib.parse.parse_qsl(url.query, keep_blank_values=True)
        cq = "&".join(
            f"{urllib.parse.quote(k, safe='-_.~')}={urllib.parse.quote(v, safe='-_.~')}"
            for k, v in sorted(q)
        )
        ch = "".join(f"{h}:{self.headers[h].strip()}\n" for h in signed)
        payload_hash = self.headers.get("x-amz-content-sha256", "")
        creq = "\n".join(
            [self.command, url.path, cq, ch, ";".join(signed), payload_hash]
        )
        scope = f"{datestamp}/{region}/{service}/aws4_request"
        sts = "\n".join(
            [
                "AWS4-HMAC-SHA256",
                self.headers["x-amz-date"],
                scope,
                hashlib.sha256(creq.encode()).hexdigest(),
            ]
        )
        k = ("AWS4" + self.secret_key).encode()
        for step in (datestamp, region, service, "aws4_request"):
            k = hmac.new(k, step.encode(), hashlib.sha256).digest()
        want = hmac.new(k, sts.encode(), hashlib.sha256).hexdigest()
        return hmac.compare_digest(want, parts["Signature"])

    # -- request routing ----------------------------------------------------

    def _bk(self) -> tuple[str, str]:
        path = urllib.parse.urlsplit(self.path).path.lstrip("/")
        path = urllib.parse.unquote(path)
        bucket, _, key = path.partition("/")
        return bucket, key

    def _deny(self):
        self.send_response(403)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_PUT(self):
        if not self._verify():
            return self._deny()
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        # verify the payload hash too: catches body/hash mismatch
        if hashlib.sha256(body).hexdigest() != self.headers.get(
            "x-amz-content-sha256"
        ):
            return self._deny()
        q = dict(urllib.parse.parse_qsl(urllib.parse.urlsplit(self.path).query))
        if "uploadId" in q and "partNumber" in q:  # multipart part
            self.uploads.setdefault(q["uploadId"], {})[int(q["partNumber"])] = body
            self.send_response(200)
            self.send_header("ETag", f'"{hashlib.md5(body).hexdigest()}"')
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.store[self._bk()] = body
        self.send_response(200)
        self.send_header("Content-Length", "0")
        self.end_headers()

    def do_POST(self):
        if not self._verify():
            return self._deny()
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        q = dict(
            urllib.parse.parse_qsl(
                urllib.parse.urlsplit(self.path).query, keep_blank_values=True
            )
        )
        if "uploads" in q:  # initiate
            uid = f"up-{len(self.uploads)}"
            self.uploads[uid] = {}
            out = (
                '<?xml version="1.0"?><InitiateMultipartUploadResult>'
                f"<UploadId>{uid}</UploadId></InitiateMultipartUploadResult>"
            ).encode()
        elif "uploadId" in q:  # complete: verify client ETags, assemble
            uid = q["uploadId"]
            parts = self.uploads.pop(uid, {})
            claimed = dict(
                (int(m.group(1)), m.group(2))
                for m in re.finditer(
                    r"<Part><PartNumber>(\d+)</PartNumber><ETag>([0-9a-f]+)</ETag>",
                    body.decode(),
                )
            )
            for num, data in parts.items():
                if claimed.get(num) != hashlib.md5(data).hexdigest():
                    return self._deny()
            self.store[self._bk()] = b"".join(parts[i] for i in sorted(parts))
            out = b'<?xml version="1.0"?><CompleteMultipartUploadResult/>'
        else:
            return self._deny()
        self.send_response(200)
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    # Optional per-server HEAD audit, mirroring ``get_log`` below:
    # lets tests pin that a hot path costs ZERO size probes (e.g. the
    # pointer-table fetch, whose lazy-size readable file never needs
    # one — ADVICE r9 found the old eager HEAD doubled its requests).
    head_log: list | None = None

    def do_HEAD(self):
        if not self._verify():
            return self._deny()
        if self.head_log is not None:
            self.head_log.append(self._bk()[1])
        obj = self.store.get(self._bk())
        if obj is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Length", str(len(obj)))
        self.end_headers()

    def do_DELETE(self):
        if not self._verify():
            return self._deny()
        q = dict(urllib.parse.parse_qsl(urllib.parse.urlsplit(self.path).query))
        if "uploadId" in q:  # abort multipart
            self.uploads.pop(q["uploadId"], None)
            self.send_response(204)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        self.store.pop(self._bk(), None)
        self.send_response(204)
        self.send_header("Content-Length", "0")
        self.end_headers()

    # Optional per-server GET audit: when a subclass sets ``get_log``
    # to a list, every object GET appends (key, Range header, bytes
    # served). Lets tests assert the RANGED-read contract — e.g. that
    # a pointer-table media fetch touched only the sampled byte ranges
    # of a packed shard, never the whole object.
    get_log: list | None = None

    def do_GET(self):
        if not self._verify():
            return self._deny()
        bucket, key = self._bk()
        url = urllib.parse.urlsplit(self.path)
        q = dict(urllib.parse.parse_qsl(url.query))
        if not key and q.get("list-type") == "2":
            return self._list(bucket, q)
        obj = self.store.get((bucket, key))
        if obj is None:
            self.send_response(404)
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        rng = self.headers.get("Range")
        status = 200
        if rng and rng.startswith("bytes="):
            a, _, b = rng[len("bytes="):].partition("-")
            # real-S3 semantics (RFC 7233): an invalid byte-range-spec
            # (first > last, or neither end given) is IGNORED and the
            # FULL object returned — this is exactly what masks a
            # read(0) bug on a lenient server. All three valid forms
            # are served: 'a-b', open-ended 'a-', and suffix '-n'.
            if not a and not b:
                pass  # 'bytes=-' — no positions at all: full object
            elif not a:
                # suffix form 'bytes=-n': last n bytes.  A ZERO
                # suffix-length is unsatisfiable under RFC 7233 §2.1
                # ("a suffix-byte-range-spec with a non-zero
                # suffix-length"); real S3 ignores the header and
                # returns the full object — mirror that (status 200)
                # rather than inventing a lenient empty-206.
                if int(b):
                    obj = obj[-int(b):]
                    status = 206
                # else: fall through — full object, status 200
            elif b and int(a) > int(b):
                pass  # invalid byte-range-spec (first > last): full object
            elif int(a) >= len(obj):
                # RFC 7233 §4.4: a VALID spec whose first-byte-pos is
                # at/after the current length is unsatisfiable → 416
                # (real S3 does this) — the loud signal a corrupt
                # past-EOF pointer deserves, vs the silent b'' a
                # lenient server would invent. (An INVALID spec — first
                # > last — is handled above: header ignored, full 200.)
                self.send_response(416)
                self.send_header("Content-Range", f"bytes */{len(obj)}")
                self.send_header("Content-Length", "0")
                self.end_headers()
                return
            elif not b:
                obj = obj[int(a):]
                status = 206  # open-ended 'bytes=a-': a through EOF
            else:
                obj = obj[int(a): int(b) + 1]
                status = 206
        if self.get_log is not None:
            self.get_log.append((key, rng, len(obj)))
        self.send_response(status)
        self.send_header("Content-Length", str(len(obj)))
        self.end_headers()
        self.wfile.write(obj)

    def _list(self, bucket: str, q: dict):
        prefix = q.get("prefix", "")
        keys = sorted(
            k for (b, k) in self.store if b == bucket and k.startswith(prefix)
        )
        start = 0
        tok = q.get("continuation-token")
        if tok:
            start = int(tok)
        page = keys[start: start + self.page_size]
        truncated = start + self.page_size < len(keys)
        items = "".join(f"<Contents><Key>{k}</Key></Contents>" for k in page)
        nxt = (
            f"<NextContinuationToken>{start + self.page_size}</NextContinuationToken>"
            if truncated
            else ""
        )
        body = (
            '<?xml version="1.0"?><ListBucketResult>'
            f"<IsTruncated>{'true' if truncated else 'false'}</IsTruncated>"
            f"{items}{nxt}</ListBucketResult>"
        ).encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def start_memserver(access_key: str, secret_key: str):
    """Start a fresh memory server on 127.0.0.1:<ephemeral>. Returns
    ``(server, endpoint_url)``; call ``server.shutdown()`` +
    ``server.server_close()`` when done. Each call gets its OWN
    handler subclass (own store/uploads/credentials), so concurrent
    servers in one process never share state."""
    handler = type(
        "S3MemHandlerInstance",
        (S3MemHandler,),
        {"access_key": access_key, "secret_key": secret_key,
         "store": {}, "uploads": {}},
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://127.0.0.1:{srv.server_address[1]}"
