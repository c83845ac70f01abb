#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

For each query result parquet under <verifyOutDir>/<name>/, runs the
matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
testdata parquet tables, sorts columns by name, and compares row count,
schema and values (exact for non-floats; floats to 1e-9 relative).
"""
import json, sys, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for marker in sorted(glob.glob(f"{out_dir}/*.error")):
        print(f"FAIL (verify error marker) {marker}: {open(marker).read().strip()}")
        n_fail += 1
    for name in sorted(oracles):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_fail += 1
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            scols = sorted(spark_rel.columns)
            ssel = spark_rel.select(", ".join(f'"{c}"' for c in scols))
            stypes = [str(t) for t in ssel.types]
            sdf = ssel.fetchall()
            oracle_rel = con.sql(oracles[name])
            ocols = sorted(oracle_rel.columns)
            osel = oracle_rel.select(", ".join(f'"{c}"' for c in ocols))
            otypes = [str(t) for t in osel.types]
            odf = osel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error {e}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: cols spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if stypes != otypes:
            # The driver's hash is TYPE-sensitive (r3: q79/q80 matched
            # value-for-value but an uncast HUGEINT window-sum failed the
            # hash) — so a type mismatch is a hard FAIL here too.
            diff = [(c, a, b) for c, a, b in zip(scols, stypes, otypes) if a != b]
            print(f"FAIL {name}: types differ {diff}")
            n_fail += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            n_fail += 1
            continue
        bad = None
        for i, (sr, orow) in enumerate(zip(sdf, odf)):
            for c, (a, b) in enumerate(zip(sr, orow)):
                if isinstance(a, float) or isinstance(b, float):
                    if a is None or b is None:
                        ok = a is None and b is None
                    else:
                        ok = (a == b) or (math.isfinite(a) and math.isfinite(b)
                             and abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b)))
                else:
                    ok = a == b
                if not ok:
                    bad = (i, scols[c], a, b)
                    break
            if bad:
                break
        if bad:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            # exact-hash check note for floats
            exact = all(a == b for sr, orow in zip(sdf, odf) for a, b in zip(sr, orow))
            tag = "PASS " if exact else "PASS~"  # ~ = float-tolerance only
            print(f"{tag} {name}: {len(sdf)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
