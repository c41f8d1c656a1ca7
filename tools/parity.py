#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json:
  - read the Spark result parquet written by graft.Verify
  - run the oracle SQL in DuckDB with views over <sfDir>/*.parquet
  - sort columns by name, compare row-by-row values (with a tiny float
    tolerance report so we can see WHERE a hash compare would diverge)
"""
import sys, json, glob, os, threading
import duckdb
import math

args = [a for a in sys.argv[1:] if not a.startswith("--")]
opts = dict(a[2:].split("=", 1) for a in sys.argv[1:] if a.startswith("--"))
sf_dir, out_dir = args[0], args[1]
# --skip=sub1,sub2 : skip queries whose name contains any substring
#   (scale probes: the declared-quadratic oracle baselines are O(n²)
#   in DuckDB too and dominate wall-clock far beyond their value)
# --timeout=SECS   : per-oracle-query wall clock; on expiry the DuckDB
#   query is interrupted and the query reported TIMEOUT (not a fail)
skip_subs = [s for s in opts.get("skip", "").split(",") if s]
timeout_s = float(opts["timeout"]) if "timeout" in opts else None

con = duckdb.connect()
# Cap DuckDB's memory so a pathological oracle (e.g. a recursive-CTE
# transitive closure over duplicate-dense scale-up data) spills or
# errors instead of OOM-killing the whole box — the sf1 probe lost a
# 90-minute run exactly this way. DuckDB's 80%-of-RAM default does not
# reliably bound recursive CTE materialization.
con.execute(f"SET memory_limit='{opts.get('mem', '48GB')}'")
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
n_pass = n_fail = n_skip = 0


def compare(name, sql):
    """Returns a result line; raises duckdb.InterruptException on timeout."""
    spark_dir = f"{out_dir}/{name}"
    got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
    want = con.sql(sql)
    gcols, wcols = sorted(got.columns), sorted(want.columns)
    if [c.lower() for c in gcols] != [c.lower() for c in wcols]:
        return f"FAIL {name}: columns differ spark={gcols} oracle={wcols}"
    # Type-drift gate: Python compares int128 == int64 as True, so a
    # value compare can pass while the driver's hash compare (which
    # renders types) fails. DuckDB promotes uncast SUM(BIGINT) to
    # HUGEINT — flag any oracle column whose DuckDB type the Spark
    # parquet side can't have (HUGEINT always; DECIMAL only when the
    # Spark column isn't DECIMAL too).
    gtypes = {c.lower(): str(t) for c, t in zip(got.columns, got.types)}
    wtypes = {c.lower(): str(t) for c, t in zip(want.columns, want.types)}
    for c in (c.lower() for c in wcols):
        ot, gt = wtypes[c], gtypes[c]
        if "HUGEINT" in ot or (ot.startswith("DECIMAL")
                               and not gt.startswith("DECIMAL")):
            return (f"FAIL {name}: oracle type drift col {c}: oracle={ot} "
                    f"spark={gt} (cast the oracle output, e.g. "
                    f"CAST(SUM(..) AS BIGINT))")
    grows = got.select(", ".join(f'"{c}"' for c in gcols)).fetchall()
    wrows = want.select(", ".join(f'"{c}"' for c in wcols)).fetchall()
    if len(grows) != len(wrows):
        return f"FAIL {name}: rowcount spark={len(grows)} oracle={len(wrows)}"
    for i, (g, w) in enumerate(zip(grows, wrows)):
        for j, (a, b) in enumerate(zip(g, w)):
            if a == b:
                continue
            if isinstance(a, float) and isinstance(b, float) \
                    and math.isnan(a) and math.isnan(b):
                continue
            d = (f" absdiff={abs(a - b):.3e}"
                 if isinstance(a, float) and isinstance(b, float) else "")
            return f"FAIL {name}: row {i} col {gcols[j]}: spark={a!r} oracle={b!r}{d}"
    return f"PASS {name} ({len(grows)} rows)"


for name, sql in sorted(oracles.items()):
    if any(s in name for s in skip_subs):
        print(f"SKIP {name}")
        n_skip += 1
        continue
    if not os.path.isdir(f"{out_dir}/{name}"):
        print(f"FAIL {name}: no spark output dir")
        n_fail += 1
        continue
    timed_out = []
    timer = threading.Timer(
        timeout_s, lambda: (timed_out.append(1), con.interrupt())) \
        if timeout_s else None
    if timer:
        timer.start()
    try:
        line = compare(name, sql)
    except Exception as e:
        line = (f"TIMEOUT {name} (> {timeout_s:.0f}s oracle)" if timed_out
                else f"FAIL {name}: {e}")
    finally:
        if timer:
            timer.cancel()
    print(line, flush=True)
    if line.startswith("PASS"):
        n_pass += 1
    elif line.startswith("TIMEOUT"):
        n_skip += 1
    else:
        n_fail += 1
print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} skipped/timeout, "
      f"{len(oracles)} total")
sys.exit(1 if n_fail else 0)
