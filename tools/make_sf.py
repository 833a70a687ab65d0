#!/usr/bin/env python3
"""Scale a testdata SF directory by key-shifted replication.

Usage: python3 tools/make_sf.py <src_sf_dir> <out_dir> <factor>

Produces a join-structure-preserving larger dataset: each fact/entity
table is replicated <factor> times with every key column offset by
copy * (max_key + 1), so foreign keys keep resolving within a copy and
no cross-copy collisions appear. Fixed dimensions (region, nation) are
copied once. This is a THROUGHPUT benchmark input (more rows through
the same plans), not a statistical twin of a genuinely larger TPC-H scale —
selectivities per copy match the source SF exactly.

Driver-side tooling only (pyarrow); not part of the shipped library.
"""
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

# key columns to offset per table (offset unit = per-column max+1 of the
# source, so each copy occupies a disjoint id range)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_ONCE = ["region", "nation"]


def main(src: Path, out: Path, factor: int) -> None:
    out.mkdir(parents=True, exist_ok=True)
    for t in COPY_ONCE:
        pq.write_table(pq.read_table(src / f"{t}.parquet"), out / f"{t}.parquet")
        print(f"{t}: copied once")
    for t, keys in KEYED.items():
        tbl = pq.read_table(src / f"{t}.parquet")
        units = {k: pa.compute.max(tbl[k]).as_py() + 1 for k in keys}
        copies = []
        for c in range(factor):
            cols = []
            for name in tbl.column_names:
                col = tbl[name]
                if name in units and c > 0:
                    col = pa.compute.add(col, c * units[name])
                cols.append(col)
            copies.append(pa.table(cols, names=tbl.column_names))
        big = pa.concat_tables(copies)
        pq.write_table(big, out / f"{t}.parquet")
        print(f"{t}: {tbl.num_rows} -> {big.num_rows}")


if __name__ == "__main__":
    main(Path(sys.argv[1]), Path(sys.argv[2]), int(sys.argv[3]))
