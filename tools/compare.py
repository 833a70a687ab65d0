#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <verify_out_dir> <sf_dir>

Runs each oracle SQL from <verify_out_dir>/oracle_sql.json in DuckDB over
the parquet tables in <sf_dir>, loads the Spark result parquet from
<verify_out_dir>/<name>/, sorts columns by name and rows by all columns,
and compares cell values (exact; floats to 1e-9 relative so we catch any
real drift before the driver's hash compare would).
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def cells_equal(a, b):
    a, b = norm(a), norm(b)
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return True
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    # decimal vs float / int vs float tolerance across engines
    import decimal
    if isinstance(a, (int, float, decimal.Decimal)) and isinstance(b, (int, float, decimal.Decimal)):
        try:
            return float(a) == float(b) or abs(float(a) - float(b)) <= 1e-9 * max(1.0, abs(float(a)), abs(float(b)))
        except Exception:
            return False
    return a == b


def load_spark(dirpath: Path):
    files = sorted(dirpath.glob("*.parquet"))
    if not files:
        return None, None
    import pyarrow as pa
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    cols = sorted(tbl.column_names)
    rows = [tuple(r[c] for c in cols) for r in tbl.to_pylist()]
    return cols, rows


def main():
    out_dir, sf_dir = Path(sys.argv[1]), Path(sys.argv[2])
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    skipped = []
    for name in sorted(p.name for p in out_dir.iterdir() if p.is_dir()):
        scols, srows = load_spark(out_dir / name)
        if scols is None:
            failures.append((name, "no spark output"))
            continue
        if name not in oracle:
            skipped.append((name, len(srows)))
            continue
        try:
            res = con.execute(oracle[name])
            dcols = sorted(res.description[i][0] for i in range(len(res.description)))
            raw = res.fetchall()
            names = [d[0] for d in res.description]
            order = sorted(range(len(names)), key=lambda i: names[i])
            drows = [tuple(r[i] for i in order) for r in raw]
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            continue
        if scols != dcols:
            failures.append((name, f"schema mismatch spark={scols} duck={dcols}"))
            continue
        if len(srows) != len(drows):
            failures.append((name, f"row count spark={len(srows)} duck={len(drows)}"))
            continue

        def key(row):
            return tuple(
                (str(type(v)), str(norm(v))) if not isinstance(v, (int, float)) else ("num", f"{float(v):.9g}")
                for v in row)
        ssort = sorted(srows, key=key)
        dsort = sorted(drows, key=key)
        bad = None
        for i, (sr, dr) in enumerate(zip(ssort, dsort)):
            for c, (sv, dv) in enumerate(zip(sr, dr)):
                if not cells_equal(sv, dv):
                    bad = (i, dcols[c], sv, dv)
                    break
            if bad:
                break
        if bad:
            failures.append((name, f"value mismatch row {bad[0]} col {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}"))
        else:
            print(f"PASS  {name} ({len(srows)} rows)")

    for name, n in skipped:
        print(f"ROWS-ONLY  {name} ({n} rows, no oracle)")
    for name, why in failures:
        print(f"FAIL  {name}: {why}")
    missing = sorted(set(oracle) - {p.name for p in out_dir.iterdir() if p.is_dir()})
    for name in missing:
        print(f"FAIL  {name}: oracle declared but no spark output")
    sys.exit(1 if failures or missing else 0)


if __name__ == "__main__":
    main()
