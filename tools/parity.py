#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json:
  - read the Spark result parquet written by graft.Verify
  - run the oracle SQL in DuckDB with views over <sfDir>/*.parquet
  - sort columns by name, compare row-by-row values (with a tiny float
    tolerance report so we can see WHERE a hash compare would diverge)
"""
import sys, json, glob, os
import duckdb
import math

sf_dir, out_dir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

# Timestamp-unit probe (one footer read): the events ts column has
# silently changed parquet logical types across testdata drops (ns →
# µs). The Spark loader probes at runtime and TestdataCanarySpec pins
# the real data; this is the harness-side tripwire that catches drift
# BEFORE a full parity run burns on collapsed timestamps.
try:
    t, lo, hi = con.sql(
        "SELECT any_value(typeof(ts)), year(min(ts)), year(max(ts)) FROM events"
    ).fetchone()
    if "TIMESTAMP" not in t.upper() or not (2000 <= lo <= 2100 and 2000 <= hi <= 2100):
        print(f"WARNING events.ts drift: type={t} year range {lo}..{hi} — "
              "check Tables.loadEvents' unit probe before trusting results")
except Exception as e:
    print(f"WARNING events.ts probe failed: {e}")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
n_pass = n_fail = 0
for name, sql in sorted(oracles.items()):
    spark_dir = f"{out_dir}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir")
        n_fail += 1
        continue
    try:
        got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
        want = con.sql(sql)
    except Exception as e:
        print(f"FAIL {name}: {e}")
        n_fail += 1
        continue
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if [c.lower() for c in gcols] != [c.lower() for c in wcols]:
        print(f"FAIL {name}: columns differ spark={gcols} oracle={wcols}")
        n_fail += 1
        continue
    # Type-drift gate: Python compares int128 == int64 as True, so a
    # value compare can pass while the driver's hash compare (which
    # renders types) fails. DuckDB promotes uncast SUM(BIGINT) to
    # HUGEINT — flag any oracle column whose DuckDB type the Spark
    # parquet side can't have (HUGEINT always; DECIMAL only when the
    # Spark column isn't DECIMAL too).
    gtypes = {c.lower(): str(t) for c, t in zip(got.columns, got.types)}
    wtypes = {c.lower(): str(t) for c, t in zip(want.columns, want.types)}
    drift = []
    for c in (c.lower() for c in wcols):
        ot, gt = wtypes[c], gtypes[c]
        if "HUGEINT" in ot:
            drift.append((c, ot, gt))
        elif ot.startswith("DECIMAL") and not gt.startswith("DECIMAL"):
            drift.append((c, ot, gt))
    if drift:
        c, ot, gt = drift[0]
        print(f"FAIL {name}: oracle type drift col {c}: oracle={ot} "
              f"spark={gt} (cast the oracle output, e.g. CAST(SUM(..) AS BIGINT))")
        n_fail += 1
        continue
    grows = got.select(", ".join(f'"{c}"' for c in gcols)).fetchall()
    wrows = want.select(", ".join(f'"{c}"' for c in wcols)).fetchall()
    if len(grows) != len(wrows):
        print(f"FAIL {name}: rowcount spark={len(grows)} oracle={len(wrows)}")
        n_fail += 1
        continue
    bad = None
    for i, (g, w) in enumerate(zip(grows, wrows)):
        for j, (a, b) in enumerate(zip(g, w)):
            if a == b:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if (math.isnan(a) and math.isnan(b)):
                    continue
                bad = (i, gcols[j], a, b, abs(a - b))
                break
            bad = (i, gcols[j], a, b, None)
            break
        if bad:
            break
    if bad:
        i, c, a, b, d = bad
        print(f"FAIL {name}: row {i} col {c}: spark={a!r} oracle={b!r}"
              + (f" absdiff={d:.3e}" if d is not None else ""))
        n_fail += 1
    else:
        print(f"PASS {name} ({len(grows)} rows)")
        n_pass += 1
print(f"\n{n_pass} pass, {n_fail} fail, {len(oracles)} total")
sys.exit(1 if n_fail else 0)
