#!/usr/bin/env python3
"""Deterministic scale-up of the driver testdata for local scale probes.

Usage: python3 tools/scaleup.py <srcSfDir> <dstDir> [replicas=10]

Replicates every fact table N times with per-replica key offsets so that
all FK relationships (orders->customer, lineitem->orders/part/supplier,
events->user) hold within each replica and keys stay globally unique.
Dimension tables (region, nation) are fixed-size and copied as-is —
exactly how TPC-H scales. Text/embedding payloads are kept byte-identical
across replicas: exact duplicates at 10x density are a *feature* for the
dedup/ANN operators (they stress tie-breaking and cluster growth, the
bug classes the sf0.1 sweep surfaced in round 8).

Offsets are powers of ten strictly above each key's max, so replica r of
key k is r*OFF + k — easy to read in a failing diff.

This writes OUTSIDE /root/testdata (which is read-only driver data);
the output is a scratch artifact, never an oracle-of-record.
"""
import sys, os, glob
import duckdb

src = sys.argv[1]
dst = sys.argv[2]
n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
os.makedirs(dst, exist_ok=True)

con = duckdb.connect()
con.execute(f"SET threads TO {os.cpu_count()}")

# key -> power-of-10 offset above its sf0.1 max (comfortable headroom
# so the same offsets stay valid if we ever scale from sf0.01)
OFF = {
    "c_custkey": 100_000, "s_suppkey": 10_000, "p_partkey": 100_000,
    "o_orderkey": 1_000_000, "l_orderkey": 1_000_000,
    "l_partkey": 100_000, "l_suppkey": 10_000, "o_custkey": 100_000,
    "event_id": 1_000_000, "user_id": 10_000,
    "doc_id": 100_000, "vec_id": 100_000,
}

COPY_AS_IS = {"region", "nation"}

for f in sorted(glob.glob(f"{src}/*.parquet")):
    t = os.path.basename(f)[:-len(".parquet")]
    out = f"{dst}/{t}.parquet"
    if t in COPY_AS_IS:
        con.execute(f"COPY (SELECT * FROM '{f}') TO '{out}' (FORMAT PARQUET)")
        print(f"{t}: copied as-is")
        continue
    cols = con.sql(f"DESCRIBE SELECT * FROM '{f}'").fetchall()
    sel = []
    for name, typ, *_ in cols:
        if name in OFF:
            # cast back so the parquet physical type matches the source
            sel.append(f'CAST("{name}" + r.i * {OFF[name]} AS {typ}) AS "{name}"')
        else:
            sel.append(f'"{name}"')
    con.execute(
        f"COPY (SELECT {', '.join(sel)} FROM '{f}', range({n}) r(i)) "
        f"TO '{out}' (FORMAT PARQUET)")
    rows = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
    print(f"{t}: {rows} rows ({n}x)")
print(f"done -> {dst}")
