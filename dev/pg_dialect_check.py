#!/usr/bin/env python3
"""LIVE-PostgreSQL execution of the shipped Dialects catalog SQL (dev-only).

JdbcCatalogSpec executes the dialect strings through Spark SQL against
mocked information_schema tables; dev/dialect_check.py re-executes them
through DuckDB's Postgres-flavored parser against the same mocks. This
script closes the remaining gap the mocks cannot: it boots a REAL
PostgreSQL 15 server (initdb + postgres on a private unix socket, no
TCP), creates the reference-shaped schema (PK / UNIQUE constraint /
secondary index / FK), and runs the exact `Dialects.postgresql` strings
via psql against the server's real information_schema and pg_catalog —
so a column that only exists in the mocks, or a semantic drift between
PostgreSQL's catalog and our mock of it, fails here.

Facts asserted (the same ones JdbcCatalogSpec pins on the mocks):
  - columnsSql: 6 user columns, dense table_seq in table-name order,
    PK/UNIQUE/nullability flags, upper-cased data types, varchar length;
  - indexColsSql: scoped to the user tables it yields EXACTLY the
    secondary index and the UNIQUE-constraint-backed index (pg_index is
    database-wide — system-catalog indexes are present unscoped, which
    is why Catalog's rule engine always scopes index rows to discovered
    tables);
  - fkColsSql: exactly the one FK column row with ordinal 1.

Usage:
    sbt -batch "Test/runMain graft.DialectsDump /tmp/dialects.json"
    python3 dev/pg_dialect_check.py /tmp/dialects.json
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile

PGBIN = "/usr/lib/postgresql/15/bin"


def main():
    dump = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dialects.json"
    sqls = json.load(open(dump))["postgresql"]
    tmp = tempfile.mkdtemp(prefix="graft_pg_")
    data, sock = os.path.join(tmp, "data"), os.path.join(tmp, "sock")
    os.makedirs(sock)
    env = dict(os.environ, LC_ALL="C")
    # the server refuses to run as root; the sandbox ships an
    # unprivileged `postgres` account — hand it the work dir and wrap
    # the server-side commands in runuser (socket auth is trust, so the
    # psql CLIENT can stay whoever we are, passing -U postgres)
    asPg = []
    if os.geteuid() == 0:
        subprocess.run(["chown", "-R", "postgres:postgres", tmp], check=True)
        asPg = ["runuser", "-u", "postgres", "--"]
    subprocess.run(asPg + [f"{PGBIN}/initdb", "-D", data, "-A", "trust", "-U", "postgres"],
                   check=True, capture_output=True, env=env)
    # DEVNULL, not capture_output: the daemon inherits pg_ctl's stdio,
    # so a captured pipe never reaches EOF and the wait hangs forever
    subprocess.run(
        asPg + [f"{PGBIN}/pg_ctl", "-D", data, "-w", "-l", os.path.join(tmp, "pg.log"),
                "-o", f"-c listen_addresses='' -k {sock}", "start"],
        check=True, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env)
    try:
        subprocess.run([f"{PGBIN}/createdb", "-h", sock, "-U", "postgres", "pgdb"],
                       check=True, capture_output=True)
        ddl = """
          CREATE TABLE users (
            id integer NOT NULL PRIMARY KEY,
            email varchar(255) NOT NULL,
            bio text,
            CONSTRAINT ux_email UNIQUE (email));
          CREATE TABLE orders (
            id integer NOT NULL PRIMARY KEY,
            user_id integer,
            total_amount double precision,
            CONSTRAINT fk_orders_users FOREIGN KEY (user_id) REFERENCES users(id));
          CREATE INDEX ix_user ON orders (user_id);
        """
        subprocess.run([f"{PGBIN}/psql", "-h", sock, "-U", "postgres", "-d", "pgdb",
                        "-X", "-v", "ON_ERROR_STOP=1", "-c", ddl],
                       check=True, capture_output=True, text=True)

        def runq(sql):
            out = subprocess.run(
                [f"{PGBIN}/psql", "-h", sock, "-U", "postgres", "-d", "pgdb",
                 "-X", "-tA", "-F", "|", "-c", sql],
                check=True, capture_output=True, text=True).stdout
            return [line.split("|") for line in out.splitlines() if line]

        fails = []

        def check(cond, msg):
            if cond:
                print("PASS", msg)
            else:
                print("FAIL", msg)
                fails.append(msg)

        # --- columnsSql -------------------------------------------------
        cols = runq(sqls["columnsSql"])
        # (table, seq, column, ordinal, type, len, nullable, unique, pk)
        by = {(r[0], r[2]): r for r in cols}
        check(len(cols) == 6, f"columnsSql returns the 6 user columns (got {len(cols)})")
        check(all(r[1] == ("1" if r[0] == "orders" else "2") for r in cols),
              "table_seq is a dense rank in table-name order (orders=1, users=2)")
        check(by[("users", "id")][8] == "t" and by[("users", "id")][6] == "f",
              "users.id is a non-nullable primary key")
        check(by[("users", "email")][7] == "t" and by[("users", "email")][8] == "f",
              "users.email is UNIQUE-constrained, not a PK")
        check(by[("users", "email")][4] == "CHARACTER VARYING"
              and by[("users", "email")][5] == "255",
              "varchar column reports upper-cased type + max length")
        check(by[("orders", "user_id")][6] == "t" and by[("orders", "user_id")][7] == "f"
              and by[("orders", "user_id")][8] == "f",
              "orders.user_id is nullable, not unique, not a PK")
        check(by[("orders", "total_amount")][4] == "DOUBLE PRECISION",
              "double column reports DOUBLE PRECISION")

        # --- indexColsSql ------------------------------------------------
        idx = runq(sqls["indexColsSql"])
        scoped = {tuple(r) for r in idx if r[0] in ("users", "orders")}
        check(scoped == {("users", "ux_email", "email"), ("orders", "ix_user", "user_id")},
              f"index rows scoped to the user tables are exactly the secondary + "
              f"unique-constraint indexes (got {sorted(scoped)})")
        check(any(r[0] not in ("users", "orders") for r in idx),
              "unscoped pg_index rows include system catalogs — the reason the "
              "rule engine scopes index rows to discovered tables")

        # --- fkColsSql ---------------------------------------------------
        fk = runq(sqls["fkColsSql"])
        check([r for r in fk if r[0] == "orders"] ==
              [["orders", "fk_orders_users", "user_id", "1", "users"]],
              f"fk rows are exactly the one FK column at ordinal 1 (got {fk})")

        if fails:
            print(f"== {len(fails)} FAILED ==")
            sys.exit(1)
        print("== live PostgreSQL dialect check: all facts hold ==")
    finally:
        subprocess.run(asPg + [f"{PGBIN}/pg_ctl", "-D", data, "-m", "immediate", "stop"],
                       capture_output=True)
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
