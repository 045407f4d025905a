#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 dev/compare.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (Spark result), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB (tables = views over the
sfDir parquet files), and compares: columns sorted by name, values compared
exactly after canonicalization. Dev-only tool (driver-side python env);
the Scala library never depends on this.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)  # shortest round-trip repr
    if isinstance(v, bool):
        return str(v)
    return str(v)

def table_rows(rel):
    cols = rel.columns if hasattr(rel, "columns") else None
    rows = rel.fetchall()
    return cols, rows

def type_class(t):
    """Collapse a DuckDB type name to the class the driver's pandas hasher
    distinguishes. HUGEINT/UHUGEINT become pandas `object` dtype (vs int64 for
    BIGINT) and hash differently even for identical values; list/struct/map
    cells are unhashable and crash the driver's sort — both are hard errors."""
    t = str(t).upper()
    if "[]" in t or t.startswith(("STRUCT", "LIST", "MAP", "UNION")):
        return "NESTED"
    if t in ("HUGEINT", "UHUGEINT"):
        return "HUGEINT"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.startswith(("TIMESTAMP", "DATETIME")):
        return "timestamp"
    if t == "DATE":
        return "date"
    if t in ("VARCHAR", "TEXT", "STRING", "BLOB"):
        return "string"
    if t == "BOOLEAN":
        return "bool"
    return t

def type_errors(name, cols, types, side):
    """Driver-killing output types: HUGEINT (dtype-sensitive hash) and any
    nested type (pandas sort crash). Returns a list of error strings."""
    errs = []
    for c, t in zip(cols, types):
        cls = type_class(t)
        if cls == "HUGEINT":
            errs.append(f"{side} column {c} is {t}: driver hashes it as pandas "
                        f"object, not int64 — CAST(... AS BIGINT) in the oracle")
        elif cls == "NESTED":
            errs.append(f"{side} column {c} is {t}: unhashable in the driver's "
                        f"pandas sorter — serialize (array_to_string/array_join)")
    return errs

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    # rows-only check for queries without an oracle (mimics the driver's weaker gate)
    for d in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, d)
        if os.path.isdir(path) and d not in oracles:
            files = glob.glob(f"{path}/*.parquet")
            n = con.sql(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
            if n > 0:
                print(f"PASS {d} (rows-only, {n} rows)"); n_pass += 1
            else:
                print(f"FAIL {d}: rows-only query returned no rows"); n_fail += 1
    for name, sql_text in sorted(oracles.items()):
        res_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{res_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            s_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            o_rel = con.sql(sql_text)
            stypes, otypes = list(s_rel.types), list(o_rel.types)
            scols, srows = table_rows(s_rel)
            ocols, orows = table_rows(o_rel)
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        # driver-killing types on either face (oracle HUGEINT, nested columns)
        terrs = (type_errors(name, ocols, otypes, "oracle")
                 + type_errors(name, scols, stypes, "spark"))
        if terrs:
            for e in terrs:
                print(f"FAIL {name}: {e}")
            n_fail += 1; continue
        # driver sorts columns by name before hashing
        s_idx = sorted(range(len(scols)), key=lambda i: scols[i])
        o_idx = sorted(range(len(ocols)), key=lambda i: ocols[i])
        s_names = [scols[i] for i in s_idx]
        o_names = [ocols[i] for i in o_idx]
        if s_names != o_names:
            print(f"FAIL {name}: columns {s_names} vs {o_names}"); n_fail += 1; continue
        # dtype-class drift between the faces (int vs float vs string …)
        # surfaces as a silent pandas-hash mismatch driver-side
        s_cls = [type_class(stypes[i]) for i in s_idx]
        o_cls = [type_class(otypes[i]) for i in o_idx]
        cls_drift = [(n_, a, b) for n_, a, b in zip(s_names, s_cls, o_cls) if a != b]
        if cls_drift:
            print(f"FAIL {name}: type-class drift spark-vs-oracle: {cls_drift}")
            n_fail += 1; continue
        s_tab = [tuple(canon(r[i]) for i in s_idx) for r in srows]
        o_tab = [tuple(canon(r[i]) for i in o_idx) for r in orows]
        if len(s_tab) != len(o_tab):
            print(f"FAIL {name}: rowcount {len(s_tab)} vs {len(o_tab)}"); n_fail += 1; continue
        ordered = s_tab == o_tab
        unordered = sorted(s_tab) == sorted(o_tab)
        if ordered:
            print(f"PASS {name} ({len(s_tab)} rows)"); n_pass += 1
        elif unordered:
            print(f"WARN {name}: rows match only after sorting"); n_fail += 1
        else:
            diffs = [(a, b) for a, b in zip(s_tab, o_tab) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
