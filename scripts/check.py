#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Reads Verify output (<out>/<name>/ parquet + oracle_sql.json), runs each
oracle SQL in DuckDB against the same sf parquet tables, and compares:
row count, column names (sorted), and values (rows sorted, floats rounded).
Usage: python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v): v = "NaN"
                else: v = f"{v:.6f}"
            vals.append(str(v))
        out.append("\x01".join(vals))
    return sorted(cols), sorted(out)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(f"{outdir}/{d}"))
    n_pass = n_fail = n_weak = 0
    for name in names:
        t = pq.read_table(f"{outdir}/{name}")
        scols = t.column_names
        d = t.to_pydict()
        srows = [tuple(d[c][i] for c in scols) for i in range(t.num_rows)]
        if name not in oracle:
            n_weak += 1
            status = "WEAK " if t.num_rows > 0 else "WEAK0"
            print(f"[{status}] {name}: rows={t.num_rows} (no oracle)")
            continue
        try:
            # fetch via Arrow: HUGEINT sums surface as the float/decimal
            # values the driver's hasher would see, not python ints
            dt = con.execute(oracle[name]).arrow()
            dcols = dt.column_names
            dd = dt.to_pydict()
            drows = [tuple(dd[c][i] for c in dcols)
                     for i in range(dt.num_rows)]
        except Exception as e:
            n_fail += 1
            print(f"[FAIL ] {name}: duckdb error: {e}")
            continue
        sc, sv = canon(scols, srows)
        dc, dv = canon(dcols, drows)
        if sc != dc:
            n_fail += 1
            print(f"[FAIL ] {name}: schema {sc} != {dc}")
        elif len(sv) != len(dv):
            n_fail += 1
            print(f"[FAIL ] {name}: rows {len(sv)} != {len(dv)}")
        elif sv != dv:
            n_fail += 1
            bad = next(i for i, (a, b) in enumerate(zip(sv, dv)) if a != b)
            print(f"[FAIL ] {name}: values differ at sorted row {bad}:")
            print(f"         spark:  {sv[bad][:200]}")
            print(f"         duckdb: {dv[bad][:200]}")
        else:
            n_pass += 1
            print(f"[PASS ] {name}: rows={len(sv)}")
    # pin the oracle engine version into the artifact trail: the r15
    # q188 red row was a DRIVER-environment DuckDB delta invisible in
    # the repo's own runs (VERDICT r15 adjudication)
    print(f"[env  ] duckdb={duckdb.__version__}")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
