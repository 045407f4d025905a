#!/usr/bin/env python3
"""Second-engine check of the Dialects catalog SQL (dev-only).

JdbcCatalogSpec already executes every dialect string through Spark SQL
against mocked information_schema tables. This script runs the SAME shipped
strings (dumped by `sbt "Test/runMain graft.DialectsDump /tmp/dialects.json"`)
through DuckDB — whose parser is Postgres-flavored and stricter in different
places — against equivalent mocks, and asserts the same result facts the
spec pins. A MySQL-vs-PG drift (typo'd catalog column, backend-specific
syntax slip) that one engine tolerates fails the other.

Usage:
    sbt -batch "Test/runMain graft.DialectsDump /tmp/dialects.json"
    python3 dev/dialect_check.py /tmp/dialects.json
"""
import json
import re
import sys

import duckdb

# information_schema/pg_catalog are reserved in DuckDB; route the shipped
# SQL at mock tables via mechanical name rewrites (same trick the Spark
# spec uses, applied to a different engine).
REWRITES = [
    (r"\binformation_schema\.", "mock_is_"),
    (r"\bpg_index\b", "mock_pg_index"),
    (r"\bpg_class\b", "mock_pg_class"),
    (r"\bpg_attribute\b", "mock_pg_attribute"),
]


def rewrite(sql):
    for pat, rep in REWRITES:
        sql = re.sub(pat, rep, sql)
    return sql


def build_mocks(con):
    # mirrors JdbcCatalogSpec.mockInformationSchema row-for-row
    con.execute("""CREATE TABLE mock_is_columns AS SELECT * FROM (VALUES
        ('def','mydb','users','id',1,'int',NULL,'NO','PRI'),
        ('def','mydb','users','email',2,'varchar',255,'NO',''),
        ('def','mydb','users','bio',3,'text',1000,'YES',''),
        ('def','mydb','orders','id',1,'int',NULL,'NO','PRI'),
        ('def','mydb','orders','user_id',2,'int',NULL,'YES','MUL'),
        ('def','mydb','orders','total_amount',3,'double',NULL,'YES',''),
        ('pgdb','public','users','id',1,'integer',NULL,'NO',''),
        ('pgdb','public','users','email',2,'character varying',255,'NO',''),
        ('pgdb','public','orders','user_id',1,'integer',NULL,'YES','')
      ) t(table_catalog, table_schema, table_name, column_name,
          ordinal_position, data_type, character_maximum_length,
          is_nullable, column_key)""")
    con.execute("""CREATE TABLE mock_is_statistics AS SELECT * FROM (VALUES
        ('mydb','users','email',0,'ux_email'),
        ('mydb','users','id',0,'PRIMARY'),
        ('mydb','orders','user_id',1,'ix_user')
      ) t(table_schema, table_name, column_name, non_unique, index_name)""")
    con.execute("""CREATE TABLE mock_is_key_column_usage AS SELECT * FROM (VALUES
        ('mydb','orders','orders_ibfk_1','user_id',1,'users'),
        ('mydb','users','PRIMARY','id',1,NULL),
        ('pgdb','orders','fk_orders_users','user_id',1,NULL)
      ) t(table_schema, table_name, constraint_name, column_name,
          ordinal_position, referenced_table_name)""")
    con.execute("""CREATE TABLE mock_is_table_constraints AS SELECT * FROM (VALUES
        ('UNIQUE','users','ux_email'),
        ('PRIMARY KEY','users','pk_users'),
        ('FOREIGN KEY','orders','fk_orders_users')
      ) t(constraint_type, table_name, constraint_name)""")
    con.execute("""CREATE TABLE mock_is_constraint_column_usage AS SELECT * FROM (VALUES
        ('ux_email','email','users'),
        ('pk_users','id','users'),
        ('fk_orders_users','id','users')
      ) t(constraint_name, column_name, table_name)""")
    con.execute("""CREATE TABLE mock_pg_index AS SELECT * FROM (VALUES
        (100, 200, [2], false),
        (100, 201, [1], true)
      ) t(indrelid, indexrelid, indkey, indisprimary)""")
    con.execute("""CREATE TABLE mock_pg_class AS SELECT * FROM (VALUES
        (100,'users'), (200,'ux_email'), (201,'pk_users')
      ) t(oid, relname)""")
    con.execute("""CREATE TABLE mock_pg_attribute AS SELECT * FROM (VALUES
        (100,1,'id'), (100,2,'email'), (100,3,'bio')
      ) t(attrelid, attnum, attname)""")


def check(label, cond, failures):
    status = "PASS" if cond else "FAIL"
    print(f"{status} {label}")
    if not cond:
        failures.append(label)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dialects.json"
    dialects = json.load(open(path))
    con = duckdb.connect()
    build_mocks(con)
    failures = []

    # ---- MySQL ----
    my = dialects["mysql"]
    cols = {(r[0], r[2]): r for r in con.sql(rewrite(my["columnsSql"])).fetchall()}
    check("mysql columnsSql parses and returns the 6 mydb columns", len(cols) == 6, failures)
    if len(cols) == 6:
        email = cols[("users", "email")]
        # (table, seq, column, ordinal, type, len, nullable, unique, pk)
        check("mysql: email is VARCHAR(255) NOT NULL UNIQUE",
              email[4] == "VARCHAR" and email[5] == 255
              and email[6] is False and email[7] is True, failures)
        check("mysql: users.id is primary key", cols[("users", "id")][8] is True, failures)
        check("mysql: dense table_seq in name order",
              cols[("orders", "id")][1] == 1 and cols[("users", "id")][1] == 2, failures)
    idx = con.sql(rewrite(my["indexColsSql"])).fetchall()
    check("mysql indexColsSql excludes PRIMARY",
          {r[1] for r in idx} == {"ux_email", "ix_user"}, failures)
    fks = con.sql(rewrite(my["fkColsSql"])).fetchall()
    check("mysql fkColsSql returns only the real FK",
          len(fks) == 1 and fks[0][4] == "users", failures)

    # ---- PostgreSQL ----
    pg = dialects["postgresql"]
    pcols = {(r[0], r[2]): r for r in con.sql(rewrite(pg["columnsSql"])).fetchall()}
    check("pg columnsSql parses and returns the 3 pgdb columns", len(pcols) == 3, failures)
    if len(pcols) == 3:
        email = pcols[("users", "email")]
        check("pg: email unique + not nullable",
              email[7] is True and email[6] is False, failures)
        check("pg: users.id primary key", pcols[("users", "id")][8] is True, failures)
    pidx = con.sql(rewrite(pg["indexColsSql"])).fetchall()
    check("pg indexColsSql resolves non-primary index via pg_catalog (incl. = ANY(indkey))",
          pidx == [("users", "ux_email", "email")], failures)
    pfks = con.sql(rewrite(pg["fkColsSql"])).fetchall()
    check("pg fkColsSql returns the FK with referenced table",
          len(pfks) == 1 and pfks[0][2] == "user_id" and pfks[0][4] == "users", failures)

    print(f"== {'FAIL' if failures else 'OK'}: {len(failures)} failure(s) ==")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
