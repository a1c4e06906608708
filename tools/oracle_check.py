import duckdb, json, glob, math, sys

outdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify_sf001'
sfdir = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f'{outdir}/oracle_sql.json'))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return 'nan'
        return f'{v:.9g}'
    if isinstance(v, list): return tuple(norm(x) for x in v)
    return str(v)

def table_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)

# The driver's hasher is dtype-sensitive (it hashes Arrow-typed values):
# a DuckDB HUGEINT (arrow decimal128) vs a Spark BIGINT (int64) fails there
# even when every value prints identically. Mirror that by comparing the
# Arrow schema types per (name-sorted) column before the value comparison.
# Each relation is fetched as Arrow ONCE — rows and schema both derive from
# the same table (re-running heavy oracles like substring_dedup twice would
# double the wall time).
def fetch(rel):
    tbl = rel.arrow()
    cols = tbl.column_names
    # positional extraction (NOT to_pylist dicts): duplicate column names
    # must keep their own values, mirroring the driver's column handling
    col_vals = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    rows = list(zip(*col_vals)) if col_vals else []
    types = {f.name: str(f.type) for f in tbl.schema}
    return cols, rows, types

import re as _re

def canon_type(t):
    # Benign aliases the driver's hasher demonstrably accepts (all were
    # hash-green in CORRECTNESS_r03): string/binary width variants and plain
    # integer widths (int32 vs int64 both hash as integers). Integer vs
    # decimal128 (DuckDB HUGEINT) is NOT benign — that's the skew class that
    # made q_sessionize red at the driver while passing here.
    t = t.replace('large_string', 'string').replace('large_list', 'list')
    t = t.replace('large_binary', 'binary')
    t = _re.sub(r'\b(u?int)(8|16|32|64)\b', 'int', t)
    return t

def compatible_type(a, b):
    return canon_type(a) == canon_type(b)

fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    try:
        scols, srows, stypes = fetch(con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'"))
        dcols, drows, dtypes = fetch(con.sql(sql))
        if sorted(scols) != sorted(dcols):
            print(f'FAIL {name}: cols {sorted(scols)} vs {sorted(dcols)}'); fails += 1; continue
        skew = {c: (stypes[c], dtypes[c]) for c in stypes
                if not compatible_type(stypes[c], dtypes.get(c, ''))}
        if skew:
            print(f'FAIL {name}: dtype skew (spark vs oracle): {skew}'); fails += 1; continue
        sk, dk = table_key(srows, scols), table_key(drows, dcols)
        if len(sk) != len(dk):
            print(f'FAIL {name}: rows {len(sk)} vs {len(dk)}'); fails += 1; continue
        bad = [ (a,b) for a,b in zip(sk,dk) if a != b ]
        if bad:
            print(f'FAIL {name}: {len(bad)} mismatched rows, first: {bad[0]}'); fails += 1
        else:
            print(f'OK   {name}: {len(sk)} rows')
    except Exception as e:
        print(f'ERR  {name}: {str(e)[:200]}'); fails += 1
print('FAILS:', fails)
sys.exit(1 if fails else 0)
