#!/usr/bin/env python3
"""Scale a driver-generated sf directory by an integer factor (bench-only).

    python3 scripts/make_sf.py /root/testdata/sf0.1 /tmp/sf1 10

The driver provides sf0.001/0.01/0.1; the sf1 bench run (BASELINE.md) needs
10x more. Each copy k shifts every entity key by k*STRIDE so join structure
and key cardinalities scale linearly, and DECORRELATES content so the
workload character is preserved rather than duplicated:

- documents: words of each copy>0 are shuffled with a per-(doc,copy) seeded
  RNG — vocabulary and length distributions survive, shingle/minhash
  structure does not, so dedup operators see fresh documents instead of a
  10x-duplicated corpus (which would blow every LSH bucket past MaxBucket
  and measure a different algorithm).
- embeddings: copy k>0 permutes vector dimensions with a per-copy seeded
  permutation — norm- and intra-copy-geometry-preserving, cross-copy
  decorrelated.
- nation/region: constant dimensions, copied as-is (TPC-H semantics).

Schemas are preserved exactly (pyarrow, TIMESTAMP(NANOS) kept as ns).
Correctness gates keep using the driver data untouched; this scaled set is
for wall-clock measurement only.
"""
import sys, os, shutil, zlib
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

STRIDE = 10_000_000

SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def shuffle_words(text, seed):
    words = text.split(" ")
    np.random.RandomState(seed & 0x7FFFFFFF).shuffle(words)
    return " ".join(words)


def scale_table(name, src, dst, copies):
    t = pq.read_table(f"{src}/{name}.parquet")
    schema = t.schema
    chunks = []
    for k in range(copies):
        cols = {}
        for field in schema:
            col = t.column(field.name).to_pandas()
            if field.name in SHIFTS.get(name, []) and k > 0:
                col = col + k * STRIDE
            cols[field.name] = col
        if name == "documents" and k > 0:
            # seed from CONTENT, not doc_id: exact-duplicate texts must
            # shuffle identically within a copy or the scaled corpus loses
            # its exact-dup rate ~copies-fold and under-represents the
            # exact-dedup workload (crc32 is stable across runs, unlike
            # Python's salted hash())
            cols["text"] = pa.array(
                [shuffle_words(s, zlib.crc32(s.encode()) * 31 + k)
                 for s in cols["text"]])
        if name == "embeddings" and k > 0:
            perm = np.random.RandomState(1000 + k).permutation(
                len(t.column("embedding")[0]))
            cols["embedding"] = pa.array(
                [np.asarray(v, dtype=np.float32)[perm]
                 for v in cols["embedding"]],
                type=schema.field("embedding").type)
        chunks.append(pa.table(
            {f.name: pa.array(cols[f.name], type=f.type) for f in schema},
            schema=schema))
    out = pa.concat_tables(chunks)
    # realistic row groups: a single giant row group would cap BOTH Spark's
    # and DuckDB's scan parallelism at one task per file
    pq.write_table(out, f"{dst}/{name}.parquet",
                   coerce_timestamps=None, version="2.6",
                   row_group_size=8192)
    print(f"{name}: {t.num_rows} -> {out.num_rows}")


def main():
    src, dst, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    # optional 4th arg: comma-separated table subset (e.g. the sf10
    # amortization-curve point only needs documents+embeddings — scaling
    # lineitem x100 would cost minutes and GBs for queries never run there)
    subset = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    os.makedirs(dst, exist_ok=True)
    for name in ["region", "nation"]:
        shutil.copy(f"{src}/{name}.parquet", f"{dst}/{name}.parquet")
        print(f"{name}: copied as-is (constant dim)")
    for name in SHIFTS:
        if subset is None or name in subset:
            scale_table(name, src, dst, copies)


if __name__ == "__main__":
    main()
