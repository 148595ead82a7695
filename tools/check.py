#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sf_dir] [verify_out_dir] [name_prefixes]

Assumes `graft.Verify` has already been run (sbt "runMain graft.Verify
<sf_dir> <out_dir>"). Registers each testdata parquet as a DuckDB view,
runs every oracle SQL from oracle_sql.json, and compares against the
Spark-written parquet result: column names (sorted), row counts, and
cell-exact values on rows sorted by all columns.

Oracle-regime caveat: qg10/qg11 serve the exact neighborhood function
(what the DuckDB SQL computes) only while the co-activity graph has at
most 512 vertices — true for every sf <= 0.01 gate run. Above that
(sf0.1: |V|~1500) the engine switches to HyperBall with `_est` columns
and this compare is NOT applicable; the engine logs the mode choice.
"""
import sys, json, glob, math, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def cells_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    # optional 3rd arg: comma-separated name prefixes (mirrors Verify's
    # subset arg) so a just-landed query can be gated in isolation
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    # Asserted regime guards: some oracles are only valid in a regime
    # the engine verifies at runtime (qg10/qg11: exact neighborhood
    # function only while the co-activity graph is small; HyperBall
    # estimates above). The predicate SQL and threshold come from
    # regime_guard.json, which graft.Verify generates from the SAME
    # Scala constants the engine's mode switch reads — recomputed here
    # from the data instead of trusting either side, and only when a
    # guarded query is actually in the selected set.
    regime_skips = {}
    guard_path = f"{out}/regime_guard.json"
    if not os.path.exists(guard_path):
        # an out dir from an older graft.Verify (or a partial copy):
        # without the guard the qg10/qg11 exact-SQL oracles would be
        # compared against HyperBall _est output at sf>0.01 and FAIL
        # spuriously — warn loudly instead of silently dropping the skip
        maybe_guarded = [n for n in oracle
                         if (n.startswith("qg10") or n.startswith("qg11")) and
                            (not only or any(n.startswith(p) for p in only))]
        if maybe_guarded:
            print(f"WARNING: {guard_path} missing but regime-guarded queries "
                  f"{maybe_guarded} are selected — any FAIL on them may be a "
                  f"regime artifact, not a correctness bug; re-run graft.Verify "
                  f"to regenerate the guard")
    else:
        guard = json.load(open(guard_path))
        guarded = [n for n in guard["queries"] if n in oracle and
                   (not only or any(n.startswith(p) for p in only))]
        if guarded:
            n_vertices = con.execute(guard["vertex_count_sql"]).fetchone()[0]
            if n_vertices > guard["max_vertices"]:
                reason = (f"exact-regime oracle (|V| <= {guard['max_vertices']}); "
                          f"engine in sketch regime at |V|={n_vertices}")
                regime_skips = {n: reason for n in guarded}
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracle):
        if only and not any(name.startswith(p) for p in only):
            continue
        if name in regime_skips:
            print(f"SKIP {name}: {regime_skips[name]}")
            n_skip += 1
            continue
        sql = oracle[name]
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = canon(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            ora_df = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        dt_s = [str(t) for t in spark_df.dtypes]
        dt_o = [str(t) for t in ora_df.dtypes]
        if dt_s != dt_o:
            # hard failure: a silent int32-vs-int64 (or object-vs-float)
            # divergence passes the cell compare via numpy coercion but
            # means the engine and oracle disagree on the schema
            print(f"FAIL {name}: dtypes spark={dt_s} oracle={dt_o}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(ora_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} oracle={list(ora_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(ora_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} oracle={len(ora_df)}")
            n_fail += 1
            continue
        bad = None
        for col in spark_df.columns:
            sv, ov = spark_df[col].tolist(), ora_df[col].tolist()
            for i, (a, b) in enumerate(zip(sv, ov)):
                if not cells_equal(a, b):
                    bad = (col, i, a, b)
                    break
            if bad:
                break
        if bad:
            col, i, a, b = bad
            print(f"FAIL {name}: cell mismatch col={col} row={i} spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    skip_note = f", {n_skip} regime-skip" if n_skip else ""
    print(f"\n{n_pass} pass, {n_fail} fail{skip_note}")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
