#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate: run Verify's parquet dumps
against the oracle SQL in DuckDB and diff, mimicking the driver's
sort-columns-by-name + sort-rows + value compare.

usage: check_oracle.py <sfdir> <verify_outdir> [query ...]
"""
import json, sys, math
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            exp = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            fails += 1
            continue
        try:
            got = norm(con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            fails += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            fails += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            fails += 1
            continue
        bad = None
        for c in exp.columns:
            ev, gv = exp[c].values, got[c].values
            for i in range(len(ev)):
                e_, g_ = ev[i], gv[i]
                if e_ is None and g_ is None:
                    continue
                try:
                    if isinstance(e_, float) or isinstance(g_, float):
                        if (isinstance(e_, float) and math.isnan(e_)) and (isinstance(g_, float) and math.isnan(g_)):
                            continue
                        if e_ != g_:
                            bad = (c, i, e_, g_, abs(float(e_) - float(g_)))
                            break
                    elif str(e_) != str(g_):
                        bad = (c, i, e_, g_, None)
                        break
                except Exception:
                    bad = (c, i, e_, g_, None)
                    break
            if bad:
                break
        if bad:
            c, i, e_, g_, d = bad
            print(f"FAIL {name}: col={c} row={i} oracle={e_!r} spark={g_!r} absdiff={d}")
            fails += 1
        else:
            print(f"PASS {name} ({len(exp)} rows, {len(exp.columns)} cols)")
    print(f"{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'}")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
