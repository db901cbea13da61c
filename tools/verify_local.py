"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every registered query at the given SF, runs its oracle SQL in
DuckDB over the same parquet files, and compares row count, column
names, and order-insensitive values (with float tolerance reporting so
rounding mismatches are visible before the driver's exact hash sees
them).

Usage: python tools/verify_local.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from braintumor_data_pipeline_spark import registry
from braintumor_data_pipeline_spark.session import get_spark
from braintumor_data_pipeline_spark.sources.fixtures import TABLES


def _canon(rows, cols):
    """Sort columns by name, rows by value — the driver's compare shape."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def key(row):
        out = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 9)
            out.append((v is None, str(type(v).__name__), str(v)))
        return out

    return sorted([tuple(row[i] for i in order) for row in rows], key=key), [
        cols[i] for i in order
    ]


def _values_equal(a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb or abs(fa - fb) <= 1e-9 * max(1.0, abs(fa), abs(fb))
    return a == b


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]

    spark = get_spark(app_name="verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    specs = registry.all_queries()
    names = [
        n
        for n in specs
        if not filters or any(f in n for f in filters)
    ]
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if spec.oracle is None or (
            spec.pinned_sf and spec.pinned_sf not in sf_dir
        ):
            n_rows_only += 1
            why = "no oracle" if spec.oracle is None else (
                f"golden pinned at {spec.pinned_sf}"
            )
            print(
                f"rows  {name}: {len(srows)} rows ({why}) "
                f"[{time.time()-t0:.1f}s]"
            )
            continue
        try:
            res = con.execute(spec.oracle)
            ocols = [d[0] for d in res.description]
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        ok = True
        msg = ""
        if sorted(scols) != sorted(ocols):
            ok = False
            msg = f"columns differ: spark={sorted(scols)} oracle={sorted(ocols)}"
        elif len(srows) != len(orows):
            ok = False
            msg = f"row count differs: spark={len(srows)} oracle={len(orows)}"
        else:
            s_can, _ = _canon(srows, scols)
            o_can, _ = _canon(orows, ocols)
            for i, (sr, orow) in enumerate(zip(s_can, o_can)):
                if not all(_values_equal(a, b) for a, b in zip(sr, orow)):
                    ok = False
                    msg = f"value mismatch at sorted-row {i}: spark={sr} oracle={orow}"
                    break
        if ok:
            n_pass += 1
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
        else:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: {msg}")

    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only, "
        f"{len(names)} total"
    )
    if failures:
        print("failed:", " ".join(failures))
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
