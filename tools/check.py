#!/usr/bin/env python3
"""Local driver-mimic: compare Verify output parquet against the DuckDB
oracle. Usage: tools/check.py <sfDir> <verifyOutDir> [query ...]"""
import sys, json, glob, os
import duckdb

def norm(v):
    # EXACT float comparison (bit-identical via repr), matching the
    # driver's hash check. Rounding here (the old 9dp form) was SOFTER
    # than the driver and let round()-on-double tie divergence through
    # (r7: x59/x64 passed locally, failed the driver hash). NOTE the
    # residual blind spot: the local DuckDB may be older than the
    # driver's, so any round(double, n) in oracle SQL can still diverge
    # on version-specific tie behavior — the real fix is to keep
    # round-on-double off integer-ratio output columns entirely.
    if isinstance(v, float):
        return repr(v)
    return v

def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = [tuple(norm(r[i]) for i in order) for r in cur.fetchall()]
    return [cols[i] for i in order], sorted(data, key=lambda t: tuple(str(x) for x in t))

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for q, sql in sorted(oracle.items()):
        if only and q not in only:
            continue
        res_dir = os.path.join(out_dir, q)
        if not os.path.isdir(res_dir):
            print(f"FAIL {q}: no result dir"); n_fail += 1; continue
        try:
            got_cols, got = rows_of(con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')"))
            want_cols, want = rows_of(con.execute(sql))
        except Exception as e:
            print(f"FAIL {q}: {e}"); n_fail += 1; continue
        if got_cols != want_cols:
            print(f"FAIL {q}: columns {got_cols} != {want_cols}"); n_fail += 1
        elif got != want:
            n_fail += 1
            print(f"FAIL {q}: {len(got)} vs {len(want)} rows")
            diff = [(g, w) for g, w in zip(got, want) if g != w][:3]
            for g, w in diff:
                print(f"   got  {g}\n   want {w}")
            og = [r for r in got if r not in set(want)][:2]
            ow = [r for r in want if r not in set(got)][:2]
            if og: print(f"   only-got  {og}")
            if ow: print(f"   only-want {ow}")
        else:
            n_pass += 1
            print(f"PASS {q} ({len(got)} rows)")
    # Result-TYPE lint is part of the gate: a HUGEINT output column can
    # be bit-exact here yet hash-FAIL the driver's newer DuckDB (r8: 15
    # queries). Value comparison cannot catch that class; DESCRIBE can.
    # It runs BEFORE the summary line so a lint-only failure can never
    # hide behind an all-green "N pass / 0 fail".
    import subprocess
    lint = subprocess.run(
        [sys.executable,
         os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "lint_oracle_types.py"),
         sf_dir, os.path.join(out_dir, "oracle_sql.json"), *sorted(only)])
    if lint.returncode:
        n_fail += 1
        print("FAIL <type-lint>: see lint output above")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
