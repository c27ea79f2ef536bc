"""Dump exact results of every declared query for regression diffing.

Collects each queries() entry at the given SF dir, canonicalizes (sorted
column order, rows sorted by repr) WITHOUT rounding — floats compared via
repr so any bit-level change is visible — and pickles to the output path.

  python scripts/dump_query_results.py /root/testdata/sf0.01 /tmp/q_sf001.pkl
  python scripts/dump_query_results.py --diff /tmp/a.pkl /tmp/b.pkl
"""

from __future__ import annotations

import os
import pickle
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted((tuple(repr(r[i]) for i in order) for r in rows))
    return [cols[i] for i in order], out


def dump(sf_dir: str, out_path: str) -> None:
    from wage_etl_spark.session import get_spark

    import __spark_entry__ as em
    from wage_etl_spark.operators.caching import release_operator_caches

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="dumpq", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")
    res = {}
    for name, fn in em.queries().items():
        df = fn(spark, sf_dir)
        rows = [tuple(r) for r in df.collect()]
        res[name] = canon(df.columns, rows)
        release_operator_caches()
        print(f"{name}: {len(rows)} rows", file=sys.stderr)
    with open(out_path, "wb") as f:
        pickle.dump(res, f)
    print(f"wrote {out_path} ({len(res)} queries)")


def diff(a_path: str, b_path: str) -> int:
    with open(a_path, "rb") as f:
        a = pickle.load(f)
    with open(b_path, "rb") as f:
        b = pickle.load(f)
    bad = 0
    for name in sorted(set(a) | set(b)):
        if name not in a or name not in b:
            print(f"MISSING {name}: only in {'a' if name in a else 'b'}")
            bad += 1
            continue
        ca, ra = a[name]
        cb, rb = b[name]
        if ca != cb:
            print(f"COLS DIFFER {name}: {ca} vs {cb}")
            bad += 1
        elif ra != rb:
            n = sum(1 for x, y in zip(ra, rb) if x != y) + abs(len(ra) - len(rb))
            ex = next(((x, y) for x, y in zip(ra, rb) if x != y), ("len", "len"))
            print(f"ROWS DIFFER {name}: {len(ra)} vs {len(rb)} rows, {n} diffs; "
                  f"first: {ex[0][:200]!r} vs {ex[1][:200]!r}")
            bad += 1
    print("IDENTICAL" if bad == 0 else f"{bad} QUERIES DIFFER")
    return 0 if bad == 0 else 1


if __name__ == "__main__":
    if sys.argv[1] == "--diff":
        sys.exit(diff(sys.argv[2], sys.argv[3]))
    dump(sys.argv[1], sys.argv[2])
