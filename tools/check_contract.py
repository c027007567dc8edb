"""Local replica of the driver's correctness gate.

Runs each contract query on Spark and its oracle on DuckDB at sf0.01,
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, values stringified, rows sorted). Usage:

    python tools/check_contract.py [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = sorted(
        "\x1f".join(_norm(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in canon:
        h.update(line.encode())
        h.update(b"\x1e")
    return h.hexdigest()[:16]


def _norm(v: object) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    sys.path.insert(0, "/root/repo")
    from nebula_importer_spark.contract import ORACLES, QUERIES
    from nebula_importer_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark(app_name="contract-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in ORACLES:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(ORACLES[name])
            ocols = [c.lower() for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            failures.append(name)
            continue
        sh = value_hash(srows, [c.lower() for c in scols])
        oh = value_hash(orows, ocols)
        ok_cols = sorted(c.lower() for c in scols) == sorted(ocols)
        status = "ok  " if (len(srows) == len(orows) and sh == oh and ok_cols) else "FAIL"
        print(
            f"{status} {name}: spark={len(srows)} oracle={len(orows)} "
            f"hash={'match' if sh == oh else f'{sh}!={oh}'} cols={'match' if ok_cols else f'{scols} vs {ocols}'} "
            f"({time.time()-t0:.1f}s)"
        )
        if status == "FAIL":
            failures.append(name)
            # show a few mismatching rows for debugging
            sset = {tuple(_norm(v) for v in r) for r in srows}
            oset = {tuple(_norm(v) for v in r) for r in orows}
            for label, diff in (("spark-only", sset - oset), ("oracle-only", oset - sset)):
                for row in list(diff)[:3]:
                    print(f"       {label}: {row}")

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nall green")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
