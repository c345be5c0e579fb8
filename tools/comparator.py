#!/usr/bin/env python3
"""Measure the same-scale DuckDB comparator for the bench headline queries.

Usage: comparator.py [sfDir] [oracleSqlJson]

Runs each headline query's oracle SQL (the exact SQL the correctness gate
uses) in DuckDB over the same parquet tables graft.Bench reads, with the
same protocol (warm pass, then per-query median of 3 timed passes, 32
threads), and writes tools/comparator_<sf>.json. graft.Bench embeds that
file in its output JSON so BENCH_r{N}.json carries both engines' totals
measured in the same session on the same machine.

DuckDB is driver-side tooling only — the Scala engine never links it.
"""
import duckdb, json, os, sys, time

HEADLINE = [
    "agg_h01", "agg_global_h06", "agg_distinct",
    "join_inner_h03", "join_left_hist", "join_self_nation", "join_theta",
    "tpch_h05", "tpch_h09", "tpch_h18", "tpch_h21",
    "subq_scalar", "cte_h15",
    "win_rownum", "win_running_sum", "topk",
    "dedup_exact", "dedup_minhash_lsh", "dedup_jaccard", "dedup_simhash",
    "pipeline_clean_corpus",
    "embed_cosine_topk", "embed_knn",
    "text_stats", "text_fingerprint",
    "events_hourly", "events_sessions"]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.1'
    oracle_path = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out/oracle_sql.json'
    oracle = json.load(open(oracle_path))
    missing = [q for q in HEADLINE if q not in oracle]
    if missing:
        print(f'missing oracles: {missing}', file=sys.stderr)
        return 1
    con = duckdb.connect()
    con.sql('SET threads TO 32')
    for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
              'lineitem', 'events', 'documents', 'embeddings']:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    for q in HEADLINE:  # warm: OS page cache + duckdb's own caches
        con.sql(oracle[q]).fetchall()
    passes = []
    for _ in range(3):
        p = {}
        for q in HEADLINE:
            t0 = time.perf_counter()
            con.sql(oracle[q]).fetchall()
            p[q] = time.perf_counter() - t0
        passes.append(p)
    med = {q: sorted(p[q] for p in passes)[1] for q in HEADLINE}
    out = {
        'engine': 'duckdb', 'version': duckdb.__version__, 'threads': 32,
        'sf': sf, 'protocol': 'per-query median of 3 warm passes',
        'measured_at': time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime()),
        'total': sum(med.values()),
        'queries': {q: round(med[q], 6) for q in HEADLINE},
        'pass_totals': [round(sum(p.values()), 6) for p in passes],
    }
    dest = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f'comparator_{os.path.basename(sf.rstrip("/"))}.json')
    with open(dest, 'w') as f:
        json.dump(out, f, separators=(',', ':'))  # single line: graft.Bench embeds this verbatim in its one-line JSON contract
    print(f'wrote {dest}: total={out["total"]:.3f}s pass_totals={out["pass_totals"]}')
    return 0


if __name__ == '__main__':
    sys.exit(main())
