#!/usr/bin/env python3
"""Scale a testdata SF directory by key-shifted replication.

Usage: python3 tools/make_sf.py <src_sf_dir> <out_dir> <factor> [--perturb]

Produces a join-structure-preserving larger dataset: each fact/entity
table is replicated <factor> times with every key column offset by
copy * (max_key + 1), so foreign keys keep resolving within a copy and
no cross-copy collisions appear. Fixed dimensions (region, nation) are
copied once. This is a THROUGHPUT benchmark input (more rows through
the same plans), not a statistical twin of a genuinely larger TPC-H scale —
selectivities per copy match the source SF exactly.

Without --perturb, copies keep IDENTICAL text/embedding values, so every
copy is a genuine near-dup of its siblings: dedup-family output (and
cost) grows ~copies² by construction — useful as a dedup stress test,
misleading as a throughput ratio. With --perturb, copy > 0 rows get a
copy-seeded token shuffle (documents.text: same token multiset, so
tf/df/length stats are unchanged, but contiguous n-grams break) and a
circular shift of the embedding array by `copy` positions (same norm
and value distribution, different direction) — cross-copy near-dups
disappear and the 10x run measures throughput.

With --heaps, the vocabulary GROWS with the corpus the way natural text
does (Heaps' law, V ~ n^0.5): each copy > 0 rewrites ~24% of token
occurrences (copy-seeded) to a copy-local variant "tok~c", so a 10x
corpus carries ~3.2x the distinct tokens (10^0.5) instead of the base
mode's fixed ~30k vocabulary. Per-shingle document frequencies then
stay roughly FLAT as the corpus grows — the regime real web text is in
— instead of growing ~copies, which is what pushed the containment /
Jaccard inverted-index joins through their quadratic df knee on the
replicated corpora. Embeddings get the --perturb roll (no cross-copy
near-dup inflation). Use this mode to measure dedup-family scaling
ratios; use --perturb for pure throughput; use the base mode as a
dedup correctness stress test.

Driver-side tooling only (pyarrow); not part of the shipped library.
"""
import random
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


def shuffle_text(col: pa.ChunkedArray, copy: int, seed: int) -> pa.Array:
    out = []
    for i, v in enumerate(col.to_pylist()):
        toks = v.split(" ")
        random.Random((seed << 48) ^ (copy << 32) | i).shuffle(toks)
        out.append(" ".join(toks))
    return pa.array(out, type=col.type)


def roll_embedding(col: pa.ChunkedArray, copy: int) -> pa.Array:
    out = []
    for v in col.to_pylist():
        k = copy % len(v)
        out.append(v[k:] + v[:k])
    return pa.array(out, type=col.type)


# ~24% occurrence mutation per copy: for factor F, expected vocab growth
# is ~V0*(1 + (F-1)*q*hit) with hit≈1 for non-rare types, i.e. ~F^0.5
# at F=10 — the Heaps exponent of typical web corpora.
HEAPS_Q = 0.24


def heaps_text(col: pa.ChunkedArray, copy: int, seed: int) -> pa.Array:
    out = []
    for i, v in enumerate(col.to_pylist()):
        rng = random.Random((seed << 48) ^ (copy << 32) | i)
        toks = [f"{w}~{copy}" if rng.random() < HEAPS_Q else w
                for w in v.split(" ")]
        out.append(" ".join(toks))
    return pa.array(out, type=col.type)


def table_stat(path: Path):
    md = pq.read_metadata(path)
    return {"rows": md.num_rows, "bytes": path.stat().st_size}


def main(src: Path, out: Path, factor: int, perturb: bool,
         heaps: bool = False, seed: int = 42) -> None:
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
                elif heaps and c > 0 and t == "documents" and name == "text":
                    col = heaps_text(col, c, seed)
                elif perturb and c > 0 and t == "documents" and name == "text":
                    col = shuffle_text(col, c, seed)
                elif (perturb or heaps) and c > 0 and t == "embeddings" and name == "embedding":
                    col = roll_embedding(col, c)
                cols.append(col)
            copies.append(pa.table(cols, names=tbl.column_names))
        big = pa.concat_tables(copies)
        # Row-group layout: deterministic (round-8 verdict #4 — two
        # regenerations from the same source are byte-identical: rows per
        # group depends only on SOURCE stats) AND bounded at ~6 MB of
        # on-disk bytes per group (round-11 verdict #4 — a fat-row table
        # written as one 2^20-row group caps scan parallelism at 1 task;
        # the loader's repartition backstop then pays a shuffle that a
        # well-written file never needs). The 6 MB figure is derived from
        # the loader's own zero-shuffle law: Tables.load repartitions
        # when rowGroups*2 < bytesTarget (one split per 4 MB), so groups
        # must stay <= 8 MB of OUTPUT bytes; 6 MB of SOURCE-estimated
        # bytes leaves margin for heaps-mode output compressing ~12%
        # worse than the source. bytes/row comes from the source file, so
        # skinny fact tables keep big groups (lineitem ~18 B/row ->
        # ~349k rows/group, splits from group count as before) while
        # documents/embeddings get real splits (~119 B/row -> ~53k
        # rows/group).
        bpr = max(1.0, (src / f"{t}.parquet").stat().st_size / tbl.num_rows)
        group_rows = max(1024, min(1 << 20, int((6 << 20) / bpr)))
        pq.write_table(big, out / f"{t}.parquet", row_group_size=group_rows)
        print(f"{t}: {tbl.num_rows} -> {big.num_rows} "
              f"({group_rows} rows/group)")
    # Manifest: the seed + mode + source/output fingerprints, read by
    # graft.Bench to stamp "corpus_seed" into scaled-run artifacts, and
    # by humans to attribute any residual drift to SOURCE regeneration
    # (the driver rewrites /root/testdata each round) vs this script.
    import json
    mode = "heaps" if heaps else ("perturb" if perturb else "base")
    manifest = {
        "seed": seed, "factor": factor, "mode": mode,
        "source_dir": str(src),
        "source": {t: table_stat(src / f"{t}.parquet")
                   for t in list(KEYED) + COPY_ONCE},
        "output": {t: table_stat(out / f"{t}.parquet")
                   for t in list(KEYED) + COPY_ONCE},
    }
    (out / "MANIFEST.json").write_text(json.dumps(manifest, indent=1))
    print(f"MANIFEST.json: seed={seed} mode={mode} factor={factor}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    seed = next((int(a.split("=", 1)[1]) for a in sys.argv[1:]
                 if a.startswith("--seed=")), 42)
    main(Path(args[0]), Path(args[1]), int(args[2]),
         "--perturb" in sys.argv, "--heaps" in sys.argv, seed)
