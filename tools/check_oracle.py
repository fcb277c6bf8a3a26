"""Local replica of the driver's correctness gate: run every
queries()[k] on Spark and oracle_sql()[k] on DuckDB at the same sf,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [only_key ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    if hasattr(v, "asDict"):
        return tuple(sorted((k, canon(x)) for k, x in v.asDict().items()))
    return v


def rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort by repr: canon'd rows can mix None with values (left-join
    # misses, empty-group aggregates), and Python's sorted() raises
    # TypeError on None < str — any total order works here as long as
    # both engines' rows pass through the SAME one
    return sorted(
        (tuple(canon(r[i]) for i in order) for r in rows), key=repr
    )


# Normalize engine type names into comparable classes.
_TYPE_CLASS = {
    "tinyint": "int", "smallint": "int", "int": "int", "integer": "int",
    "bigint": "long", "hugeint": "hugeint",
    "float": "float", "real": "float", "double": "double",
    "string": "str", "varchar": "str",
    "boolean": "bool",
    "timestamp": "ts", "timestamp_ntz": "ts", "timestamp_ns": "ts",
    "timestamp with time zone": "ts", "date": "date",
}


def type_class(t: str) -> str:
    t = t.lower()
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith(("array", "struct", "map", "interval", "binary", "list")):
        return "complex"
    return _TYPE_CLASS.get(t, t)


# Keys whose Spark/DuckDB value agreement is PROVEN only at the gate
# fixtures (sf0.001/sf0.01): quantiles_approx needs integral p*n for
# the two engines' discrete-rank conventions to provably coincide
# (documented at its queries() entry); at e.g. sf0.1 they may differ
# by one neighboring element. Reported as a documented SKIP at other
# scale factors rather than a FAIL.
GATE_SF_ONLY = {"quantiles_approx"}
GATE_SF_DIRS = ("sf0.001", "sf0.01")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from hillview_spark import cache
    from hillview_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd key must not produce a green "0 failures" run
        print(f"unknown query keys: {sorted(unknown)}")
        return 2
    failures = []
    at_gate_sf = sf_dir.rstrip("/").endswith(GATE_SF_DIRS)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in GATE_SF_ONLY and not at_gate_sf:
            print(f"SKIP {name}: value agreement proven at gate SFs only")
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            cache.release_all()
            continue
        if name not in os_:
            # every key must ship an oracle (rows+schema at minimum) —
            # a silent SKIP here let an oracle-less key look green
            failures.append(name)
            print(f"FAIL {name}: no oracle_sql entry — {len(srows)} rows")
            cache.release_all()
            continue
        try:
            rel = con.sql(os_[name])
            dcols = list(rel.columns)
            dtype_list = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            cache.release_all()
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        else:
            stypes = dict(sdf.dtypes)
            dtypes = dict(zip(dcols, dtype_list))
            for c in scols:
                sc, dc = type_class(stypes[c]), type_class(dtypes.get(c, "?"))
                if sc != dc:
                    problems.append(f"type drift {c}: spark={stypes[c]} duckdb={dtypes.get(c)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        # declared rows+schema-only oracle (iterative/driver-side
        # values, see oracle_sql comments): value hash is expected to
        # differ — rows+schema are the checkable surface
        rows_schema_only = "rows+schema oracle only" in os_[name]
        if not problems and rows_schema_only:
            print(f"OK   {name} ({len(srows)} rows, rows+schema only)")
            cache.release_all()
            continue
        if not problems:
            a = rows_to_multiset(scols, [[r[c] for c in scols] for r in srows])
            b = rows_to_multiset(dcols, drows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"OK   {name} ({len(srows)} rows)")
        cache.release_all()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
