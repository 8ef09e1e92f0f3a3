#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Reads Spark-written result parquet from OUTDIR/<name>/, runs each oracle SQL
from OUTDIR/oracle_sql.json in DuckDB over the SFDIR parquet tables, and
compares: columns sorted by name, rows sorted, exact value match.

Usage: python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def pycheck_deflate(con, sfdir):
    """Non-DuckDB oracle arm for the deflate-valued artifact (VERDICT
    r10 #5, repointed r12): DuckDB has no deflate, but Python zlib emits
    the same RFC 1951 raw stream as java.util.zip.Deflater(6,
    nowrap=true) — independent implementation, same algorithm. Since
    r12 the registered q192 emits only DuckDB-checkable columns; the
    deflate VALUES live in <outdir>.extras/deflate_bytes, written by
    Verify whenever q192 runs. Returns (cols, rows) in canon form.
    """
    import zlib
    import math
    df = con.sql(f"SELECT doc_id, text FROM '{sfdir}/documents.parquet'").df()
    rows = []
    for doc_id, text in df.itertuples(index=False, name=None):
        raw = ("" if text is None else text).encode("utf-8")
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        n = len(c.compress(raw) + c.flush())
        ratio = 1000000 if len(raw) == 0 else int(math.floor(n * 1e6 / len(raw) + 0.5))
        rows.append((int(doc_id), len(raw), n, ratio))
    cols = sorted(["doc_id", "n_raw", "n_deflate", "ratio_micro"])
    order = [["doc_id", "n_raw", "n_deflate", "ratio_micro"].index(c) for c in cols]
    out = sorted(tuple(str(r[i]) for i in order) for r in rows)
    return cols, out


def check_deflate_extras(con, sfdir, outdir):
    """Check the deflate-valued extras artifact against the zlib arm.
    REQUIRED whenever the run included q192 (Verify writes the artifact
    in that case — a missing one means the deflate pass broke or was
    skipped); prefix-filtered runs without q192 skip it silently.
    Returns (n_pass, n_fail)."""
    ran_q192 = bool(glob.glob(f"{outdir}/q192_compression_signal/*.parquet"))
    files = glob.glob(f"{outdir}.extras/deflate_bytes/*.parquet")
    if not files:
        if ran_q192:
            print("FAIL deflate_extras: q192 ran but "
                  f"{outdir}.extras/deflate_bytes is missing")
            return 0, 1
        return 0, 0
    try:
        scols, srows = canon(
            con, f"SELECT * FROM '{outdir}.extras/deflate_bytes/*.parquet'")
        ocols, orows = pycheck_deflate(con, sfdir)
    except Exception as e:
        print(f"FAIL deflate_extras: error {e}")
        return 0, 1
    if scols != ocols:
        print(f"FAIL deflate_extras: columns {scols} != {ocols}")
        return 0, 1
    if srows != orows:
        diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
        print(f"FAIL deflate_extras: {len(srows)} vs {len(orows)} rows; "
              f"first diffs: {diffs}")
        return 0, 1
    print(f"PASS deflate_extras: {len(srows)} rows (Python-zlib arm)")
    return 1, 0

def canon(con, rel_sql):
    df = con.sql(rel_sql).df()
    df = df[sorted(df.columns)]
    # stringify for stable compare; normalize floats
    def norm(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if v != v:
                return "NaN"
            return repr(v)
        return str(v)
    rows = sorted(tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None))
    return list(df.columns), rows

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    results = sorted(p.split("/")[-1] for p in glob.glob(f"{outdir}/*") if not p.endswith(".json"))
    n_pass = n_fail = 0
    for name in results:
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_sql = f"SELECT * FROM '{outdir}/{name}/*.parquet'"
        if name not in oracles:
            n = con.sql(spark_sql).df().shape[0]
            print(f"ROWS {name}: {n} rows (no oracle)")
            continue
        try:
            scols, srows = canon(con, spark_sql)
            ocols, orows = canon(con, oracles[name])
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} != {ocols}")
            n_fail += 1
        elif srows != orows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL {name}: {len(srows)} vs {len(orows)} rows; first diffs: {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(srows)} rows")
            n_pass += 1
    p, f = check_deflate_extras(con, sfdir, outdir)
    n_pass += p
    n_fail += f
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
