#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: check_verify.py <sfDir> <verifyOutDir>
Reads <out>/oracle_sql.json, runs each oracle in DuckDB over the sf tables,
loads the Spark result parquet, sorts columns by name, and compares
shape + dtypes + values exactly (with a near-miss report for floats).
"""
import duckdb, json, sys, glob
import numpy as np

def float_bits_equal(a, b):
    """Bit-exact float compare matching the driver's raw-byte hash:
    -0.0 != +0.0, NaN payloads must match bitwise."""
    ib = {'float64': np.int64, 'float32': np.int32}[str(a.dtype)]
    av = a.to_numpy().view(ib)
    bv = b.to_numpy().view(ib)
    return av == bv

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
    out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
    con = duckdb.connect()
    for t in ['region','nation','customer','supplier','part','orders','lineitem',
              'events','documents','embeddings']:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f'{out}/oracle_sql.json'))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f'{out}/{name}/*.parquet')
        if not files:
            print(f'FAIL {name}: no spark output'); n_fail += 1; continue
        try:
            sdf = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
            ddf = con.sql(oracle[name]).df()
        except Exception as e:
            print(f'FAIL {name}: {str(e).splitlines()[0]}'); n_fail += 1; continue
        sdf = sdf[sorted(sdf.columns)]
        ddf = ddf[sorted(ddf.columns)]
        if list(sdf.columns) != list(ddf.columns):
            print(f'FAIL {name}: cols spark={list(sdf.columns)} duck={list(ddf.columns)}'); n_fail += 1; continue
        if sdf.shape != ddf.shape:
            print(f'FAIL {name}: shape spark={sdf.shape} duck={ddf.shape}'); n_fail += 1; continue
        bad = []
        for c in sdf.columns:
            a, b = sdf[c], ddf[c]
            if str(a.dtype) != str(b.dtype):
                bad.append(f'{c}: dtype {a.dtype} vs {b.dtype}')
                continue
            try:
                if str(a.dtype) in ('float64', 'float32'):
                    # The driver hashes raw double bytes: sign of zero and NaN
                    # payloads matter. pandas == would hide -0.0 vs +0.0.
                    eq = float_bits_equal(a, b)
                else:
                    eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not np.asarray(eq).all():
                neq = ~np.asarray(eq)
                i = int(np.argmax(neq))
                bad.append(f'{c}: {int(neq.sum())} diffs, first@{i}: {a.iloc[i]!r} vs {b.iloc[i]!r}')
        if bad:
            print(f'FAIL {name}: ' + '; '.join(bad[:4])); n_fail += 1
        else:
            print(f'PASS {name} ({len(sdf)} rows)'); n_pass += 1
    print(f'== {n_pass} pass, {n_fail} fail, {len(oracle)} oracles ==')
    return 1 if n_fail else 0

if __name__ == '__main__':
    sys.exit(main())
