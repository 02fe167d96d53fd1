#!/usr/bin/env python3
"""Dev-only harness (mirrors the driver's correctness gate; NOT part of the
shipped library): run after `sbt "runMain graft.Verify <sfDir> <outDir>"`.
Loads each dumped parquet, runs the matching oracle SQL in DuckDB over views
named after the testdata tables, and diffs values with rows+columns sorted.
"""
import json, sys, math, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# --- dtype gate -------------------------------------------------------------
# The driver's hasher canonicalizes values WITHIN a 64-bit-representable type
# class, but NOT across wider types: DuckDB HUGEINT (sum of BIGINT) and
# precision-38 decimals hash differently from Spark's int64/decimal even when
# every value is identical (round-2 and round-4 red rows: q154, q158). The
# stringified-value compare below can't see that, so we gate on dtypes too.

WIDE = re.compile(r"DECIMAL\((\d+),\s*(\d+)\)")

def type_class(t):
    ts = str(t).upper()
    if ts in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
              "UTINYINT", "USMALLINT", "UINTEGER"):
        return "INT64"
    if ts in ("FLOAT", "DOUBLE"):
        return "FLOAT"
    m = WIDE.match(ts)
    if m:
        return f"DECIMAL({m.group(1)},{m.group(2)})"
    return ts

def wide_cols(cols, types):
    """Columns whose dtype the driver's hasher cannot canonicalize."""
    bad = []
    for c, t in zip(cols, types):
        ts = str(t).upper()
        m = WIDE.match(ts)
        if ts == "HUGEINT" or (m and int(m.group(1)) > 18):
            bad.append((c, ts))
    return bad

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                rr.append(("f", repr(v)))   # exact double repr
            elif v is None:
                rr.append(("n", ""))
            else:
                rr.append(("o", str(v)))
        out.append(tuple(rr))
    out.sort()
    return sorted(cols), out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            s_types = dict(zip(spark_rel.columns, spark_rel.types))
            s_cols, s_rows = canon(spark_rel.fetchall(), spark_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark dump: {e}"); n_bad += 1; continue
        try:
            ora_rel = con.sql(sql)
            o_types = dict(zip(ora_rel.columns, ora_rel.types))
            o_cols, o_rows = canon(ora_rel.fetchall(), ora_rel.columns)
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}"); n_bad += 1; continue
        # dtype gate first — catches divergence the stringified compare hides
        wide = wide_cols(list(o_types), list(o_types.values())) + \
               wide_cols(list(s_types), list(s_types.values()))
        if wide:
            print(f"FAIL {name}: uncanonicalizable dtypes (HUGEINT/DECIMAL(p>18)): {wide}")
            n_bad += 1; continue
        if s_cols != o_cols:
            print(f"FAIL {name}: columns spark={s_cols} oracle={o_cols}"); n_bad += 1; continue
        tmis = [(c, str(s_types[c]), str(o_types[c])) for c in s_cols
                if type_class(s_types[c]) != type_class(o_types[c])]
        if tmis:
            print(f"FAIL {name}: dtype class mismatch (col, spark, oracle): {tmis}")
            n_bad += 1; continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} oracle={len(o_rows)}"); n_bad += 1; continue
        if s_rows != o_rows:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
            print(f"FAIL {name}: {len(bad)}/{len(s_rows)} mismatched rows; first: ")
            for i, a, b in bad[:3]:
                print(f"  row {i}:\n    spark : {a}\n    oracle: {b}")
            n_bad += 1; continue
        print(f"OK   {name}: {len(s_rows)} rows")
        n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
