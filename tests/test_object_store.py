"""Object-store (A3) tests: SigV4 signing pinned against AWS's
published test vector, plus a full client round trip against an
in-process S3-compatible server that INDEPENDENTLY recomputes the
signature from the raw HTTP request (a second implementation of the
spec, not an echo of the client's) and rejects mismatches.

No external network: the server binds 127.0.0.1. Against a real
store, `register_s3(endpoint_url=...)` speaks the same wire format.
"""

from __future__ import annotations

import datetime
import hashlib
import hmac
import http.server
import threading
import urllib.error
import urllib.parse
import urllib.request

import pyarrow as pa
import pytest

from duckdb_vortex_spark.sources.object_store import S3FS, SigV4Signer, parse_s3_uri

ACCESS, SECRET, REGION = "AKIDEXAMPLE", "sk-test-secret", "us-east-1"


# --- the published AWS vector --------------------------------------------

def test_sigv4_matches_aws_published_vector():
    """AWS's sigv4 documentation example (IAM ListUsers, 2015-08-30):
    a known (request, secret) -> signature constant published by the
    service owner — an external oracle for the whole canonical-
    request/string-to-sign/HMAC-chain pipeline."""
    s = SigV4Signer(
        "AKIDEXAMPLE",
        "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        "us-east-1",
        service="iam",
    )
    hdrs = s.sign(
        "GET",
        "iam.amazonaws.com",
        "/",
        {"Action": "ListUsers", "Version": "2010-05-08"},
        {"content-type": "application/x-www-form-urlencoded; charset=utf-8"},
        hashlib.sha256(b"").hexdigest(),
        now=datetime.datetime(2015, 8, 30, 12, 36, 0, tzinfo=datetime.timezone.utc),
    )
    assert hdrs["Authorization"].endswith(
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"
    )
    assert "SignedHeaders=content-type;host;x-amz-date" in hdrs["Authorization"]


# --- in-process S3-compatible server --------------------------------------

from duckdb_vortex_spark.sources.s3_memserver import S3MemHandler


class _S3Handler(S3MemHandler):
    """The package's SigV4-recomputing memory server (moved to
    duckdb_vortex_spark/sources/s3_memserver.py in round 5 so the
    driver entry vortex_s3_roundtrip_scan can run the same full Spark
    loop inside the correctness gate), bound to this suite's creds."""

    access_key = ACCESS
    secret_key = SECRET
    store = {}
    uploads = {}


@pytest.fixture()
def s3(monkeypatch):
    _S3Handler.store = {}
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _S3Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    fs = S3FS(
        f"http://127.0.0.1:{srv.server_address[1]}", ACCESS, SECRET, REGION
    )
    yield fs
    srv.shutdown()
    srv.server_close()


# --- client round trips ----------------------------------------------------

def test_parse_s3_uri():
    assert parse_s3_uri("s3://b/k1/k2.vortex") == ("b", "k1/k2.vortex")
    assert parse_s3_uri("s3a://b/x") == ("b", "x")
    with pytest.raises(ValueError):
        parse_s3_uri("/local/path")


def test_put_get_head_delete(s3):
    with s3.open("s3://bkt/dir/a.bin", "wb") as f:
        f.write(b"hello object store")
    assert s3.exists("s3://bkt/dir/a.bin")
    with s3.open("s3://bkt/dir/a.bin", "rb") as f:
        assert f.read() == b"hello object store"
    s3.remove("s3://bkt/dir/a.bin")
    assert not s3.exists("s3://bkt/dir/a.bin")


def test_ranged_reads_and_seek_end(s3):
    payload = bytes(range(256)) * 4
    with s3.open("s3://bkt/r.bin", "wb") as f:
        f.write(payload)
    f = s3.open("s3://bkt/r.bin", "rb")
    assert f.read(4) == payload[:4]  # ranged GET, not whole object
    f.seek(-8, 2)
    assert f.read(8) == payload[-8:]  # the vortex trailer pattern
    f.seek(100)
    assert f.read(10) == payload[100:110]


def test_server_suffix_and_open_ended_ranges(s3):
    """RFC 7233's other two valid byte-range forms — suffix
    ('bytes=-n' → last n bytes) and open-ended ('bytes=n-' → n..EOF) —
    must be served, not crash the handler with int('') (ADVICE r5:
    the in-repo client never sends them, but the server's docstring
    claims real-S3 semantics and a future reader change would hit a
    confusing 500)."""
    payload = bytes(range(200))
    with s3.open("s3://bkt/rfc.bin", "wb") as f:
        f.write(payload)
    get = lambda rng: s3._request("GET", "bkt", "rfc.bin", headers={"Range": rng})
    assert get("bytes=-10") == payload[-10:]  # suffix
    assert get("bytes=150-") == payload[150:]  # open-ended
    assert get("bytes=-") == payload  # no positions: invalid spec → full
    assert get("bytes=5-4") == payload  # first>last: invalid → full
    # zero suffix-length is unsatisfiable per RFC 7233 §2.1; real S3
    # ignores the header — full object, NOT an empty 206 (ADVICE r6)
    assert get("bytes=-0") == payload


def test_glob_regex_hostile_character_classes():
    """A class body containing regex metacharacters ('\\', '[]]')
    must not raise re.error at glob time — escape or fall back to a
    literal '[' (ADVICE r5)."""
    from duckdb_vortex_spark.sources.object_store import _glob_regex

    r = _glob_regex("part-[0-9].vortex")
    assert r.fullmatch("part-3.vortex") and not r.fullmatch("part-x.vortex")
    assert _glob_regex("a[\\]b").fullmatch("a\\b")  # backslash member, literal
    _glob_regex("x[]]y")  # empty-scan class: must not raise
    assert _glob_regex("a[!0-9]b").fullmatch("axb")
    assert not _glob_regex("a[!0-9]b").fullmatch("a5b")


def test_glob_and_isdir_with_pagination(s3):
    for i in range(5):  # 5 keys > page_size 2 -> 3 list pages
        with s3.open(f"s3://bkt/t/part-{i:05d}.vortex", "wb") as f:
            f.write(b"x" * (i + 1))
    with s3.open("s3://bkt/t/_SUCCESS", "wb") as f:
        f.write(b"")
    got = s3.glob("s3://bkt/t/part-*.vortex")
    assert got == [f"s3://bkt/t/part-{i:05d}.vortex" for i in range(5)]
    assert s3.isdir("s3://bkt/t")
    assert not s3.isdir("s3://bkt/nope")
    assert s3.exists("s3://bkt/t")  # prefix-exists fallback


def test_bad_signature_rejected(s3):
    with s3.open("s3://bkt/sec.bin", "wb") as f:
        f.write(b"data")
    evil = S3FS(s3.endpoint, ACCESS, "wrong-secret", REGION)
    with pytest.raises(urllib.error.HTTPError) as e:
        evil.open("s3://bkt/sec.bin", "rb").read()
    assert e.value.code == 403


def test_vortex_file_roundtrip_over_s3(s3, monkeypatch):
    """End-to-end A3: a real .vortex file written to and read back
    from the object store through the scheme registry — footer via
    SEEK_END ranged GET, chunk columns via offset ranged GETs."""
    from duckdb_vortex_spark.sources import vortex_format as vf

    monkeypatch.setitem(vf._FILESYSTEMS, "s3", s3)
    table = pa.table(
        {
            "i": pa.array(list(range(1000)), pa.int64()),
            "s": pa.array([f"row-{i % 7}" for i in range(1000)]),
            "f": pa.array([i / 3.0 for i in range(1000)], pa.float64()),
        }
    )
    w = vf.VortexFileWriter("s3://bkt/data/t.vortex", table.schema)
    w.write_table(table, row_group_size=256)
    w.close()

    footer = vf.read_footer("s3://bkt/data/t.vortex")
    assert footer.n_rows == 1000 and len(footer.chunks) == 4
    cols = ["i", "s", "f"]
    got = pa.concat_tables(
        vf.read_chunk("s3://bkt/data/t.vortex", footer, ci, cols)
        for ci in range(len(footer.chunks))
    )
    assert got.equals(table)


def test_spark_datasource_reads_vortex_over_s3(s3, monkeypatch, spark):
    """The full A3 loop: spark.read.format('vortex')
    .option('s3_endpoint', ...).load('s3://...'). Python data sources
    evaluate in separate worker processes, so the store connection
    rides in the DataSource OPTIONS (the Python-source analogue of
    fs.s3a.endpoint) and each worker registers the filesystem from
    them; footer + chunk reads are ranged GETs against the signed
    store."""
    from duckdb_vortex_spark.sources import vortex_format as vf
    from duckdb_vortex_spark.sources.vortex import register

    monkeypatch.setitem(vf._FILESYSTEMS, "s3", s3)  # writer below, this process
    register(spark)

    table = pa.table(
        {
            "k": pa.array(list(range(500)), pa.int64()),
            "v": pa.array([f"val-{i % 13}" for i in range(500)]),
        }
    )
    w = vf.VortexFileWriter("s3://bkt/warehouse/part-00000.vortex", table.schema)
    w.write_table(table, row_group_size=128)
    w.close()

    def rd(path):
        return (
            spark.read.format("vortex")
            .option("s3_endpoint", s3.endpoint)
            .option("s3_access_key", ACCESS)
            .option("s3_secret_key", SECRET)
            .load(path)
        )

    df = rd("s3://bkt/warehouse/part-00000.vortex")
    assert df.count() == 500
    got = df.filter("k % 100 = 0").orderBy("k").collect()
    assert [r["k"] for r in got] == [0, 100, 200, 300, 400]
    # glob over the store, too
    assert rd("s3://bkt/warehouse/part-*.vortex").count() == 500


def test_glob_with_space_in_prefix(s3):
    """Query-string encoding edge: the sent ListObjectsV2 query must
    byte-match the signed canonical form (sigv4 canonicalizes spaces
    as %20; urlencode's '+' would make real S3 reject the request)."""
    with s3.open("s3://bkt/my dir/part-00000.vortex", "wb") as f:
        f.write(b"d")
    assert s3.glob("s3://bkt/my dir/part-*.vortex") == [
        "s3://bkt/my dir/part-00000.vortex"
    ]


def test_multipart_streaming_upload(s3):
    """A file bigger than part_size streams as multipart: only one
    part buffers in memory, parts ship as they fill, and the completed
    object is byte-identical. The server verifies per-part ETags from
    the completion manifest."""
    s3.part_size = 1024
    payload = bytes((i * 7) % 256 for i in range(5000))  # 4 full parts + tail
    with s3.open("s3://bkt/big/stream.bin", "wb") as f:
        for off in range(0, len(payload), 600):  # writes not aligned to parts
            f.write(payload[off: off + 600])
    with s3.open("s3://bkt/big/stream.bin", "rb") as f:
        assert f.read() == payload

    # a vortex file through the multipart path reads back identically
    from duckdb_vortex_spark.sources import vortex_format as vf

    table = pa.table({"x": pa.array(list(range(4000)), pa.int64())})
    import unittest.mock as _m

    with _m.patch.dict(vf._FILESYSTEMS, {"s3": s3}):
        w = vf.VortexFileWriter("s3://bkt/big/t.vortex", table.schema)
        w.write_table(table, row_group_size=1000)
        w.close()
        footer = vf.read_footer("s3://bkt/big/t.vortex")
        assert footer.n_rows == 4000
        got = pa.concat_tables(
            vf.read_chunk("s3://bkt/big/t.vortex", footer, ci, ["x"])
            for ci in range(len(footer.chunks))
        )
        assert got.equals(table)


def test_constant_column_file_reads_over_s3(s3, monkeypatch):
    """Constant/RLE columns encode to ZERO-length buffers; the reader
    then issues read(0), and an invalid 'bytes=p-(p-1)' Range header
    would make real S3 return the WHOLE object (RFC 7233 ignores
    invalid specs) — corrupting the slice and failing CRC on every
    valid file with a constant column. The server now mimics the
    real-S3 ignore behavior, so this test fails without the read(0)
    short-circuit."""
    from duckdb_vortex_spark.sources import vortex_format as vf

    monkeypatch.setitem(vf._FILESYSTEMS, "s3", s3)
    table = pa.table(
        {
            "const": pa.array([7] * 2000, pa.int64()),  # 0-byte encoded buffer
            "v": pa.array(list(range(2000)), pa.int64()),
        }
    )
    w = vf.VortexFileWriter("s3://bkt/c/t.vortex", table.schema)
    w.write_table(table, row_group_size=500)
    w.close()
    footer = vf.read_footer("s3://bkt/c/t.vortex")
    got = pa.concat_tables(
        vf.read_chunk("s3://bkt/c/t.vortex", footer, ci, ["const", "v"])
        for ci in range(len(footer.chunks))
    )
    assert got.equals(table)


def test_abort_discards_partial_write(s3):
    """abort() after a mid-write failure: no object materializes, the
    initiated multipart upload is aborted server-side (real S3 would
    otherwise retain and bill the parts forever)."""
    s3.part_size = 1024
    f = s3.open("s3://bkt/fail/part.vortex", "wb")
    f.write(b"z" * 3000)  # two parts shipped, upload initiated
    assert _S3Handler.uploads  # parts pending server-side
    f.abort()
    assert not s3.exists("s3://bkt/fail/part.vortex")
    assert not _S3Handler.uploads  # aborted: nothing pending
    f.close()  # idempotent after abort: still no object
    assert not s3.exists("s3://bkt/fail/part.vortex")


def test_vortex_writer_abort_unlinks_local(tmp_path):
    """VortexFileWriter.abort() on a LOCAL file unlinks the partial
    instead of stamping a valid footer over truncated chunks."""
    from duckdb_vortex_spark.sources import vortex_format as vf

    table = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
    out = str(tmp_path / "partial.vortex")
    w = vf.VortexFileWriter(out, table.schema)
    w.write_table(table)
    w.abort()
    import os as _os

    assert not _os.path.exists(out)


def test_session_token_signed_and_sent(s3):
    """STS temporary credentials: x-amz-security-token is added to the
    SIGNED headers (the server recomputes the signature over whatever
    SignedHeaders lists, so a sent-but-unsigned token would 403)."""
    tok_fs = S3FS(s3.endpoint, ACCESS, SECRET, REGION, session_token="tok123")
    with tok_fs.open("s3://bkt/tok/a.bin", "wb") as f:
        f.write(b"with token")
    with tok_fs.open("s3://bkt/tok/a.bin", "rb") as f:
        assert f.read() == b"with token"


def test_question_mark_wildcard_key(s3):
    """'?' is a glob wildcard the source supports — urlparse-based URI
    splitting would truncate the key at it."""
    with s3.open("s3://bkt/q/part-00001.vortex", "wb") as f:
        f.write(b"x")
    assert s3.glob("s3://bkt/q/part-0000?.vortex") == ["s3://bkt/q/part-00001.vortex"]


def test_spark_datasource_writes_vortex_over_s3(s3, spark):
    """Finding-2 regression: df.write.format('vortex')
    .mode('overwrite').option('s3_endpoint', ...).save('s3://...') —
    the writer() overwrite branch runs in its own worker process and
    must register the store from options BEFORE routing the path."""
    from duckdb_vortex_spark.sources.vortex import register

    register(spark)

    def opts(w):
        return (
            w.option("s3_endpoint", s3.endpoint)
            .option("s3_access_key", ACCESS)
            .option("s3_secret_key", SECRET)
        )

    df = spark.range(300).selectExpr("id AS k", "CAST(id % 9 AS STRING) AS v")
    opts(df.coalesce(1).write.format("vortex").mode("append")).save("s3://bkt/w/ds")
    # overwrite: must route s3 in the planning worker to clear old parts
    df2 = spark.range(100).selectExpr("id AS k", "'x' AS v")
    opts(df2.coalesce(1).write.format("vortex").mode("overwrite")).save("s3://bkt/w/ds")
    back = (
        spark.read.format("vortex")
        .option("s3_endpoint", s3.endpoint)
        .option("s3_access_key", ACCESS)
        .option("s3_secret_key", SECRET)
        .load("s3://bkt/w/ds")
    )
    assert back.count() == 100  # old parts really were removed


def test_spark_streaming_reads_vortex_over_s3(s3, spark, tmp_path):
    """readStream.format('vortex') over s3://: the stream reader's
    offset discovery (glob), schema bind, and per-chunk reads all run
    in worker processes and register the store from options. Appending
    a new object between drains delivers only the new rows."""
    from duckdb_vortex_spark.sources import vortex_format as vf
    from duckdb_vortex_spark.sources.vortex import register

    register(spark)

    def put(name, lo, hi):
        import unittest.mock as _m

        table = pa.table({"v": pa.array(list(range(lo, hi)), pa.int64())})
        with _m.patch.dict(vf._FILESYSTEMS, {"s3": s3}):
            w = vf.VortexFileWriter(f"s3://bkt/stream/{name}", table.schema)
            w.write_table(table)
            w.close()

    put("part-00000.vortex", 0, 10)
    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("vortex")
            .option("s3_endpoint", s3.endpoint)
            .option("s3_access_key", ACCESS)
            .option("s3_secret_key", SECRET)
            .load("s3://bkt/stream/part-*.vortex")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    drain()
    assert spark.read.parquet(out).count() == 10
    put("part-00001.vortex", 10, 15)
    drain()
    back = spark.read.parquet(out)
    assert back.count() == 15  # exactly-once: only the 5 new rows added
    assert back.agg({"v": "sum"}).first()[0] == sum(range(15))


# --- round-5 hardening (ADVICE r4) -----------------------------------------

def test_glob_does_not_cross_segments(s3):
    """'*'/'?' stay within one key segment (local-glob semantics): a
    dataset glob must not silently pull in nested keys."""
    for k in ("dir/a.vortex", "dir/b.vortex", "dir/sub/x.vortex"):
        with s3.open(f"s3://bkt/{k}", "wb") as f:
            f.write(b"z")
    assert s3.glob("s3://bkt/dir/*.vortex") == [
        "s3://bkt/dir/a.vortex",
        "s3://bkt/dir/b.vortex",
    ]
    # '**' is the explicit recursive form
    assert "s3://bkt/dir/sub/x.vortex" in s3.glob("s3://bkt/dir/**.vortex")
    assert s3.glob("s3://bkt/dir/?.vortex") == [
        "s3://bkt/dir/a.vortex",
        "s3://bkt/dir/b.vortex",
    ]


def test_glob_expands_dataset_directories(s3):
    """A glob whose match is a dataset 'directory' name (data lives at
    ds-1.vortex/part-*.vortex) classifies as a directory entry and the
    vortex _expand path resolves it to part files, as locally."""
    import unittest.mock as _m

    from duckdb_vortex_spark.sources import vortex as vx
    from duckdb_vortex_spark.sources import vortex_format as vf

    for ds in ("ds-1.vortex", "ds-2.vortex"):
        for p in ("part-00000.vortex", "part-00001.vortex"):
            with s3.open(f"s3://bkt/{ds}/{p}", "wb") as f:
                f.write(b"z")
    ents = s3.glob_entries("s3://bkt/ds-?.vortex")
    assert ents == [("s3://bkt/ds-1.vortex", True), ("s3://bkt/ds-2.vortex", True)]
    with _m.patch.dict(vf._FILESYSTEMS, {"s3": s3}):
        got = vx._expand("s3://bkt/ds-?.vortex")
    assert got == [
        "s3://bkt/ds-1.vortex/part-00000.vortex",
        "s3://bkt/ds-1.vortex/part-00001.vortex",
        "s3://bkt/ds-2.vortex/part-00000.vortex",
        "s3://bkt/ds-2.vortex/part-00001.vortex",
    ]


def test_with_block_aborts_on_exception(s3):
    """`with open(...,'wb')` must not publish a truncated object when
    the block raises: multipart is aborted, nothing becomes visible."""
    s3.part_size = 1024
    with pytest.raises(RuntimeError, match="boom"):
        with s3.open("s3://bkt/doomed.bin", "wb") as f:
            f.write(b"x" * 4096)  # ships parts -> multipart initiated
            raise RuntimeError("boom")
    assert not s3.exists("s3://bkt/doomed.bin")
    # clean exit still commits
    with s3.open("s3://bkt/fine.bin", "wb") as f:
        f.write(b"x" * 4096)
    assert s3.exists("s3://bkt/fine.bin")


def test_part_size_minimum_validated():
    """part_size below S3's 5 MiB multipart floor fails fast at
    construction (real S3 only fails at CompleteMultipartUpload)."""
    with pytest.raises(ValueError, match="5 MiB"):
        S3FS("http://127.0.0.1:1", ACCESS, SECRET, REGION, part_size=1024)
    fs = S3FS("http://127.0.0.1:1", ACCESS, SECRET, REGION,
              part_size=1024, allow_small_parts=True)
    assert fs.part_size == 1024


def test_register_s3_conflict_raises(s3):
    """Registering a DIFFERENT endpoint over a live registration would
    silently reroute the first store's reads: loud error unless the
    caller owns the swap with replace=True."""
    import unittest.mock as _m

    from duckdb_vortex_spark.sources import vortex_format as vf
    from duckdb_vortex_spark.sources.object_store import register_s3

    with _m.patch.dict(vf._FILESYSTEMS, {}, clear=False):
        register_s3(s3.endpoint, ACCESS, SECRET, REGION, replace=True)
        register_s3(s3.endpoint, ACCESS, SECRET, REGION)  # same config: fine
        with pytest.raises(ValueError, match="replace=True"):
            register_s3("http://127.0.0.1:9", ACCESS, SECRET, REGION)
        out = register_s3("http://127.0.0.1:9", ACCESS, SECRET, REGION,
                          replace=True)
        assert vf._FILESYSTEMS["s3"] is out

    class _CustomFS:  # a non-S3FS handler on the scheme (ADVICE r5)
        pass

    with _m.patch.dict(vf._FILESYSTEMS, {"s3": _CustomFS()}, clear=False):
        with pytest.raises(ValueError, match="replace=True"):
            register_s3(s3.endpoint, ACCESS, SECRET, REGION)
        register_s3(s3.endpoint, ACCESS, SECRET, REGION, replace=True)


def test_transient_503_retried(s3, monkeypatch):
    """A SlowDown-style 503 on an idempotent verb is retried with
    backoff instead of failing the task; POST is never blind-retried."""
    import io as _io
    import urllib.request as _ur

    s3.retry_backoff = 0.0
    with s3.open("s3://bkt/retry.bin", "wb") as f:
        f.write(b"payload")
    real = _ur.urlopen
    fails = {"n": 2}

    def flaky(req, timeout=None):
        if fails["n"] > 0:
            fails["n"] -= 1
            raise urllib.error.HTTPError(
                req.full_url, 503, "SlowDown", {}, _io.BytesIO(b"")
            )
        return real(req, timeout=timeout)

    monkeypatch.setattr(_ur, "urlopen", flaky)
    with s3.open("s3://bkt/retry.bin", "rb") as f:
        assert f.read() == b"payload"
    assert fails["n"] == 0


def test_requests_carry_timeout(s3, monkeypatch):
    """Every send passes an explicit socket timeout (a stalled
    connection must fail the task, not hang the executor slot)."""
    import urllib.request as _ur

    seen: list[float | None] = []
    real = _ur.urlopen

    def spy(req, timeout=None):
        seen.append(timeout)
        return real(req, timeout=timeout)

    monkeypatch.setattr(_ur, "urlopen", spy)
    with s3.open("s3://bkt/t.bin", "wb") as f:
        f.write(b"x")
    s3.exists("s3://bkt/t.bin")
    assert seen and all(t == s3.timeout for t in seen)


def test_lazy_size_reads(s3):
    """r10 (ADVICE r9): opening a readable no longer HEADs — a
    seek(SET)+read(n) access pattern costs exactly one ranged GET and
    zero HEADs; read-all and SEEK_END resolve the size lazily (one
    HEAD at most, on first need); and a sized read from at/after EOF
    on a never-sized handle surfaces the server's 416 loudly instead
    of inventing b'' (a pointer past EOF is corrupt metadata)."""
    import urllib.error

    import pytest

    payload = bytes(range(200))
    with s3.open("s3://bkt/lazy.bin", "wb") as f:
        f.write(payload)
    srv_handler = type(s3)  # noqa: F841 (kept for symmetry with audit tests)

    f = s3.open("s3://bkt/lazy.bin", "rb")
    assert f._size is None  # no HEAD at open
    f.seek(50)
    assert f.read(10) == payload[50:60]
    assert f._size is None  # still no HEAD after a sized read
    # range crossing the tail: the server clamps, short read comes back
    f.seek(190)
    assert f.read(50) == payload[190:]
    # read past EOF without a known size: loud 416, not b''
    f.seek(500)
    with pytest.raises(urllib.error.HTTPError):
        f.read(5)
    # pos EXACTLY == size on a never-sized handle is the io.RawIOBase
    # EOF probe (ADVICE r10): the 416 is caught, the true size parsed
    # from Content-Range 'bytes */<len>', and b'' returned — while
    # pos > size (above) stays loud
    e = s3.open("s3://bkt/lazy.bin", "rb")
    e.seek(len(payload))
    assert e._size is None
    assert e.read(5) == b""
    assert e._size == len(payload)  # learned from the 416's Content-Range
    # and a sequential consumer over the whole handle terminates cleanly
    import io as _io
    import shutil as _shutil

    src = s3.open("s3://bkt/lazy.bin", "rb")
    dst = _io.BytesIO()
    _shutil.copyfileobj(src, dst, length=64)
    assert dst.getvalue() == payload
    # read-all resolves the size lazily and still works
    g = s3.open("s3://bkt/lazy.bin", "rb")
    assert g.read() == payload
    assert g._size == len(payload)
    # SEEK_END resolves it too, then reads past EOF return b'' (size known)
    h = s3.open("s3://bkt/lazy.bin", "rb")
    h.seek(-8, 2)
    assert h.read(8) == payload[-8:]
    assert h.read(8) == b""
