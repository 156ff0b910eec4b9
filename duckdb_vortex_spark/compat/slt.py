"""Run the reference's own sqllogictest files against this engine.

The reference tests exclusively via sqllogictest SQL files
(/root/reference/test/sql/*.test — SURVEY.md §5); this module executes
those files, unmodified, on Spark: the DuckDB-dialect statements are
translated to Spark SQL (the §1.2 type mapping plus the handful of
function/table-function idioms the corpus uses), ``COPY ... (FORMAT
VORTEX)`` routes to the vortex DataSource writer, ``read_vortex(...)``
to its reader, and golden result blocks are compared value-for-value.

The translator intentionally covers the reference corpus' dialect, not
all of DuckDB SQL — each rewrite cites what pins it. This is the
strongest parity statement the repo makes: the reference's own test
suite passes against the Spark engine.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


# --- dialect translation (corpus-pinned rewrites) -------------------------

_TYPE_MAP = [
    # §1.2: unsigned 64-bit widens to DECIMAL(20,0) (Spark parquet-reader convention)
    (re.compile(r"\bUBIGINT\b", re.I), "DECIMAL(20,0)"),
    # §1.2: all DuckDB timestamp precisions are zone-naive → TIMESTAMP_NTZ,
    # and the reference itself asserts the precisions unify after round
    # trip (timestamp.test:28-37), so s/ms/ns all map to µs NTZ.
    (re.compile(r"\bTIMESTAMP_(?:S|MS|NS)\b", re.I), "TIMESTAMP_NTZ"),
    (re.compile(r"\bTIMESTAMP\b(?!_NTZ)", re.I), "TIMESTAMP_NTZ"),
    (re.compile(r"\bVARCHAR\b", re.I), "STRING"),
    (re.compile(r"\bBLOB\b", re.I), "BINARY"),
]


def _gs_repl_aliased(m: re.Match) -> str:
    lo, hi, tbl, col = m.group(1), m.group(2), m.group(3), m.group(4)
    return f"FROM (SELECT id AS {col} FROM range({lo}, {int(hi) + 1})) AS {tbl}"


def _gs_repl_bare(m: re.Match) -> str:
    lo, hi = m.group(1), m.group(2)
    return f"FROM (SELECT id AS generate_series FROM range({lo}, {int(hi) + 1})) AS t"


def translate(sql: str) -> str:
    """DuckDB-dialect → Spark SQL for the reference corpus."""
    s = sql
    # DuckDB tolerates trailing commas in column/select lists
    # (table.test:27,50); Spark does not.
    s = re.sub(r",(\s*\))", r"\1", s)
    s = re.sub(r",(\s*\n\s*FROM\b)", r"\1", s, flags=re.I)
    # generate_series(a, b) is inclusive; Spark range(a, b) is exclusive
    # (sequence.test:11, table.test:50, timestamp.test:22)
    s = re.sub(
        r"FROM\s+generate_series\((\d+)\s*,\s*(\d+)\)\s+AS\s+(\w+)\((\w+)\)",
        _gs_repl_aliased,
        s,
        flags=re.I,
    )
    s = re.sub(r"FROM\s+generate_series\((\d+)\s*,\s*(\d+)\)", _gs_repl_bare, s, flags=re.I)
    # to_seconds(n)/to_days(n) interval constructors (table.test:44-48)
    s = re.sub(
        r"(DATE\s+'[^']*')\s*\+\s*to_days\(([^()]*(?:\([^()]*\)[^()]*)*)\)",
        r"date_add(\1, \2)",
        s,
        flags=re.I,
    )
    s = re.sub(
        r"to_seconds\(([^()]*(?:\([^()]*\)[^()]*)*)\)",
        r"make_interval(0, 0, 0, 0, 0, 0, \1)",
        s,
        flags=re.I,
    )
    # sum(bool_expr) needs an int cast in Spark (timestamp.test:31-32)
    s = re.sub(
        r"\bsum\(([^()]+?=[^()]+?)\)",
        r"sum(CAST(\1 AS INT))",
        s,
        flags=re.I,
    )
    # string || non-string needs an explicit cast in Spark (table.test:43)
    s = re.sub(r"\|\|\s*seq\b", "|| CAST(seq AS STRING)", s)
    for rx, rep in _TYPE_MAP:
        s = rx.sub(rep, s)
    return s


# --- runner ---------------------------------------------------------------


@dataclass
class SltResult:
    file: str
    statements_ok: int = 0
    queries_ok: int = 0
    failures: list[str] = field(default_factory=list)

    @property
    def ok(self) -> bool:
        return not self.failures


def _render(v) -> str:
    """sqllogictest value rendering (DuckDB runner conventions for the
    value types this corpus produces)."""
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "1" if v else "0"
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)
    return str(v)


def _split_records(text: str) -> list[list[str]]:
    records, cur = [], []
    for raw in text.split("\n"):
        line = raw.rstrip()
        if not line.strip():
            if cur:
                records.append(cur)
                cur = []
            continue
        if line.lstrip().startswith("#"):
            continue
        cur.append(line)
    if cur:
        records.append(cur)
    return records


def run_slt_file(spark: SparkSession, path: str, test_dir: str) -> SltResult:
    """Execute one reference .test file; returns pass/fail detail."""
    from ..sources.vortex import register

    register(spark)
    res = SltResult(file=path)
    text = open(path).read().replace("__TEST_DIR__", test_dir)
    view_n = 0
    # Each run gets its own database: managed-table names recur across
    # the reference files, and a stale warehouse directory from a prior
    # process would collide with CREATE TABLE in a fresh catalog.
    db = "slt_" + re.sub(r"\W", "_", test_dir).strip("_")[-48:]
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    spark.sql(f"USE {db}")

    def prep(sql: str) -> str:
        nonlocal view_n
        out = sql
        for m in re.finditer(r"read_vortex\('([^']+)'\)", sql):
            view_n += 1
            view = f"__slt_vortex_{view_n}"
            spark.read.format("vortex").load(m.group(1)).createOrReplaceTempView(view)
            out = out.replace(m.group(0), view)
        return translate(out)

    def execute(sql: str) -> DataFrame | None:
        m = re.match(
            r"^\s*COPY\s+(.*)\s+TO\s+'([^']+)'\s*\(\s*FORMAT\s+VORTEX\s*\)\s*;?\s*$",
            sql,
            flags=re.I | re.S,
        )
        if m:
            src, out_path = m.group(1).strip(), m.group(2)
            if src.startswith("("):
                df = spark.sql(prep(src[1:-1]))
            else:
                df = spark.table(src)
            df.write.format("vortex").mode("overwrite").save(out_path)
            return None
        s = prep(sql)
        if re.match(r"^\s*CREATE\s+TABLE\b", s, flags=re.I) and "USING" not in s.upper():
            name = re.match(r"^\s*CREATE\s+TABLE\s+(\w+)", s, flags=re.I).group(1)
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            s = s.rstrip().rstrip(";") + " USING parquet"
        return spark.sql(s)

    try:
        for rec in _split_records(text):
            head = rec[0].strip()
            if head.startswith("require"):
                continue
            if head.startswith("statement ok"):
                sql = "\n".join(rec[1:])
                try:
                    execute(sql)
                    res.statements_ok += 1
                except Exception as e:  # noqa: BLE001
                    res.failures.append(f"statement failed: {sql[:120]} -> {e}")
            elif head.startswith("query"):
                sql = "\n".join(rec[1 : rec.index("----")])
                golden = rec[rec.index("----") + 1 :]
                try:
                    df = execute(sql)
                    rows = df.collect()
                    ncol = len(df.columns)
                    got = [tuple(_render(v) for v in r) for r in rows]
                    # Golden rows are tab-separated per line (DuckDB style);
                    # fall back to one-value-per-line regrouping when the
                    # line width doesn't match the result arity.
                    flat = [v for line in golden for v in line.split("\t")]
                    if golden and len(golden[0].split("\t")) == ncol:
                        want = [tuple(line.split("\t")) for line in golden]
                    else:
                        want = [
                            tuple(flat[i : i + ncol]) for i in range(0, len(flat), ncol)
                        ]
                    ordered = re.search(r"\bORDER\s+BY\b", sql, flags=re.I)
                    # Row-major comparison: rows sorted as whole tuples when
                    # unordered, never a flattened value multiset (a flat
                    # sort would accept values permuted across rows/columns).
                    if (got if ordered else sorted(got)) == (
                        want if ordered else sorted(want)
                    ):
                        res.queries_ok += 1
                    else:
                        res.failures.append(
                            f"query mismatch: {sql[:80]} got={got[:4]} want={want[:4]}"
                        )
                except Exception as e:  # noqa: BLE001
                    res.failures.append(f"query failed: {sql[:120]} -> {e}")
    finally:
        spark.sql("USE default")
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    return res
