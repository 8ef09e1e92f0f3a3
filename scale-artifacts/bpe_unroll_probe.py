# Tractability probe for the q221-style unrolled BPE oracle at high
# round counts: replicates bpeTokenizePackCtes' round chain (bpw/bpp/
# bpm MATERIALIZED CTEs) and times DuckDB on the sf0.01 corpus.
import duckdb, sys, time
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
TOK = "list_filter(str_split(text, ' '), x -> x <> '')"
def chain(rounds):
    sb = [f"""
        bpw0 AS MATERIALIZED (
          SELECT word, count(*)::BIGINT AS wc,
                 '(' || array_to_string(str_split(word, ''), ')(') || ')' AS st
          FROM (SELECT unnest({TOK}) AS word FROM documents)
          GROUP BY 1)"""]
    for k in range(1, rounds + 1):
        sb.append(f""",
        bpp{k} AS (
          SELECT cs[i] AS sym_l, cs[i + 1] AS sym_r, sum(wc)::BIGINT AS c
          FROM (SELECT wc, str_split(substr(st, 2, length(st) - 2), ')(') AS cs
                FROM bpw{k - 1}),
               unnest(range(1, len(cs))) AS u(i)
          GROUP BY 1, 2),
        bpm{k} AS MATERIALIZED (SELECT sym_l, sym_r FROM bpp{k}
                  ORDER BY c DESC, sym_l, sym_r LIMIT 1),
        bpw{k} AS MATERIALIZED (
          SELECT word, wc,
                 replace(st, '(' || m.sym_l || ')(' || m.sym_r || ')',
                         '(' || m.sym_l || m.sym_r || ')') AS st
          FROM bpw{k - 1}, bpm{k} m)""")
    return "".join(sb)
con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
for rounds in [12, 64, 128, 256]:
    sql = "WITH " + chain(rounds) + f" SELECT count(*) c, sum(length(st)) s FROM bpw{rounds}"
    t0 = time.time()
    r = con.execute(sql).fetchone()
    print(f"rounds={rounds}: {time.time()-t0:.2f} s (sql {len(sql)//1024} KiB, state rows={r[0]})", flush=True)
