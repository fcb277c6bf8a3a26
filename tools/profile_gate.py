"""Time each queries()/oracle_sql() key at a given sf: spark wall,
duckdb wall, printed sorted by total. Usage:
    python tools/profile_gate.py [sf_dir] [only_key ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from hillview_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    rows = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            fn(spark, sf_dir).collect()
            s = time.monotonic() - t0
        except Exception as e:
            s = -1.0
            print(f"spark ERR {name}: {e}")
        t0 = time.monotonic()
        if name in os_:
            try:
                con.sql(os_[name]).fetchall()
                d = time.monotonic() - t0
            except Exception as e:
                d = -1.0
                print(f"duck ERR {name}: {e}")
        else:
            d = 0.0
        rows.append((s + d, s, d, name))
        print(f"{name:32s} spark={s:7.2f}s duck={d:7.2f}s")
    print("\n--- sorted by total ---")
    for tot, s, d, name in sorted(rows, reverse=True):
        print(f"{name:32s} total={tot:7.2f}s spark={s:7.2f}s duck={d:7.2f}s")
    print(f"\nTOTAL {sum(r[0] for r in rows):.1f}s over {len(rows)} keys")
    spark.stop()


if __name__ == "__main__":
    main()
