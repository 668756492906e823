#!/usr/bin/env python3
"""DuckDB wall-time baseline for the bench queries.

The reference publishes no performance numbers, so the honest numeric
baseline is DuckDB 'single-node state-of-the-art' running the SAME oracle
SQL on the SAME parquet at the same scale factor. Run after Verify has
produced oracle_sql.json:

    python3 scripts/bench_duckdb.py [sfDir] [verifyOut] [outJson]

Writes DUCKDB_BASELINE.json: per-query wall seconds (median of 3 runs after
1 warmup) + total, for the bench-set query names (mirrors Bench.scala's
noop-sink methodology via a fetch-all, i.e. full materialization).
"""
import sys, os, json, time, statistics
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# keep in sync with QueryDef(bench = true) entries in the Scala registry.
# q_odim_ingest is bench=true but deliberately ABSENT: its oracle SQL reads
# the Spark-staged self-consistency parquet back (DuckDB cannot decode
# HDF5), which would be a no-op read, not a baseline.
BENCH = """q1_pricing_summary q2_filter_pushdown q3_shipping_priority
q5_local_supplier_volume q_anti_join q_agg_coverage q_window_lag
q_stream_tumbling q_asof_join q_dedup_exact q_dedup_minhash_sig
q_dedup_lsh_candidates q_dedup_simhash_pairs q_dedup_jaccard_pairs
q_dedup_components q_dedup_keeper_by_quality q_decontaminate q_ann_kmeans
q_skew_join_unsalted q_skew_join_salted q_ann_bruteforce_topk
q_ann_lsh_signature q_text_quality q_text_tokens q_bloom_prejoin
q_dedup_segments q_dedup_semantic q_pipeline_prep q_pipeline_full
q_text_bm25 q_text_bm25_probe q_text_bm25_msprobe
q_dedup_incremental_indexed q_ann_knn_join_batch q_dedup_suffix_lrs q_ann_nndescent q_text_bm25_wand q_text_bm25_rare q_text_bm25_rare_probe q_ann_hnsw_probe q_ann_hnsw_probe_batch q_text_bm25_ds_probe q_text_bm25_ds_rare q_ann_hnsw_auto q_ann_hnsw_auto_batch
q_ann_hnsw_search q_dedup_incremental""".split()


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    dst = sys.argv[3] if len(sys.argv) > 3 else "DUCKDB_BASELINE.json"
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    # optional subset (comma-separated names, 4th arg or BENCH_ONLY env) —
    # the sf10 amortization run times only the compute-bound heavy set
    only = sys.argv[4] if len(sys.argv) > 4 else os.environ.get("BENCH_ONLY")
    bench = [n for n in BENCH if n in set(only.split(","))] if only else BENCH
    # BENCH_RUNS trims the median-of-3 to fewer runs for multi-minute
    # per-query scales (sf10: single-run noise is <2% at 100s+ absolutes,
    # but 4x500s per query would burn the measurement window)
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    warmup = int(os.environ.get("BENCH_WARMUP", "1"))
    results = {}
    for name in bench:
        sql = oracles.get(name)
        if not sql:
            results[name] = None
            continue
        for _ in range(warmup):
            con.execute(sql).fetchall()
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            times.append(time.perf_counter() - t0)
        results[name] = round(statistics.median(times), 6)
    total = round(sum(v for v in results.values() if v), 6)
    doc = {"engine": "duckdb", "version": duckdb.__version__, "sf": sf,
           "threads": os.cpu_count(), "metric": "total", "value": total,
           "unit": "sec", "queries": results}
    with open(dst, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps({"total": total, "n": len([v for v in results.values() if v])}))


if __name__ == "__main__":
    main()
