#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json entry in DuckDB against views over the
sfDir parquet tables, loads the Spark result parquet from
verifyOutDir/<name>, sorts columns by name, sorts rows, and compares
cell-by-cell (exact for non-floats; exact-then-1e-9-relative report
for floats so we can see how close a miss is).

No known probabilistic margins remain: every key's oracle is expected
to match bit-for-bit, and ANY miss is a real bug.

ROOT-CAUSED AND FIXED (round 15): the last per-element double->decimal
accumulation casts (vec_covariance's scale-6 product sums and
vec_quantize's scale-12 error mean) carried a tiny per-cast midpoint
risk — Spark (BigDecimal, correctly rounded) vs DuckDB
(int128 x 10^-s, double-rounded) could round a grid-midpoint double
apart. Both now accumulate exact BIGINT units via floor(x*10^s + 0.5)
— both engines floor the SAME IEEE double, no midpoint ambiguity —
so that bug class is closed.

ROOT-CAUSED AND FIXED (round 14): every oracle that embeds a
full-precision Scala double as a BARE SQL literal was 1-ulp-fragile —
DuckDB routes bare decimal literals through DECIMAL and converts
int128 x 10^-s with a double rounding (measured: the HLL
linear-counting literal for V=170 diverged at sf0.1). All embedded
double tables (HLL pow/ln tables, alphaMM, the entropy ln table, the
LSH plane literals) are now QUOTED strings cast to DOUBLE — the
correctly-rounded strtod path — and the affected keys pass at both
sf0.01 and sf0.1. text_entropy's previously-documented ~1e-11/doc
presentation risk was this mechanism; it is gone.
"""
import sys, json, glob, os, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    def key(t):
        return tuple((x is None, str(x)) for x in t)
    return sorted(out, key=key), [cols[i] for i in order]

def cells_equal(a, b):
    if a is None and b is None: return True, 0.0
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False, math.inf
        if af == bf or (math.isnan(af) and math.isnan(bf)): return True, 0.0
        denom = max(abs(af), abs(bf), 1e-300)
        return False, abs(af-bf)/denom
    return a == b, (0.0 if a == b else math.inf)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {spark_dir}")
            n_fail += 1; continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1; continue
        # Driver's hash is TYPE-sensitive (e.g. DuckDB HUGEINT vs Spark
        # BIGINT hash differently with identical values) — diff the
        # DESCRIBE types of both sides, not just the values.
        otypes = {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}
        stypes = {r[0]: r[1] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{spark_dir}/*.parquet')").fetchall()}
        tdiff = {k: (otypes.get(k), stypes.get(k))
                 for k in set(otypes) | set(stypes) if otypes.get(k) != stypes.get(k)}
        if tdiff:
            print(f"FAIL {name}: result type mismatch (oracle,spark): {tdiff}")
            n_fail += 1; continue
        cur = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        scols = [d[0] for d in cur.description]
        srows = cur.fetchall()
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: column mismatch oracle={sorted(ocols)} spark={sorted(scols)}")
            n_fail += 1; continue
        orows, cols = canon(orows, ocols)
        srows, _ = canon(srows, scols)
        if len(orows) != len(srows):
            print(f"FAIL {name}: row count oracle={len(orows)} spark={len(srows)}")
            n_fail += 1; continue
        bad = None
        for i, (orow, srow) in enumerate(zip(orows, srows)):
            for j, (a, b) in enumerate(zip(orow, srow)):
                eq, rel = cells_equal(a, b)
                if not eq:
                    bad = (i, cols[j], a, b, rel)
                    break
            if bad: break
        if bad:
            i, c, a, b, rel = bad
            print(f"FAIL {name}: row {i} col {c}: oracle={a!r} spark={b!r} rel={rel:.2e}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    missing = set(oracle) - set()
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
