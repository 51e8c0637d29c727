"""Strict dtype/exactness sweep: every driver query vs its DuckDB oracle
at sf0.001, recording per-column dtype mismatches and the STRICT
compare_frames verdict (check_dtype=True, check_exact=True).

Round-4 verdict found 41 queries whose DuckDB oracle materializes a
column as float64 (HUGEINT from SUM(BIGINT)) or a differently-sized int
against Spark's int64 — bit-identical values, driver-hash RED.  This job
is the whack-a-mole killer: it prints exactly which (query, column)
pairs differ in dtype so the CAST sweep can be verified complete.

Usage::

    python jobs/dtype_sweep.py [sf_dir] [out_json]
    SWEEP_ONLY=q1,q2 python jobs/dtype_sweep.py   # subset re-check
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dtype_sweep_r5.json"
    only = [s for s in os.environ.get("SWEEP_ONLY", "").split(",") if s]

    import __spark_entry__ as entry
    from compare_util import compare_frames, duck_con
    from cross_sentence_relation_extraction_idepnn_spark.session import get_spark, release_caches

    spark = get_spark("dtype_sweep", cores=8)
    con = duck_con(sf_dir)
    oracles = entry.oracle_sql()
    out: dict[str, dict] = {}
    t_start = time.time()
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            df = fn(spark, sf_dir)
            spd = df.toPandas()
            dpd = con.sql(oracles[name]).df()
            dt = {}
            for c in sorted(set(spd.columns) & set(dpd.columns)):
                a, b = str(spd[c].dtype), str(dpd[c].dtype)
                if a != b:
                    dt[c] = [a, b]
            row = compare_frames(df, con, oracles[name])
            row["dtype_diffs"] = dt
        except Exception as exc:
            row = {"hash_match": False, "dtype_diffs": None,
                   "err": f"{type(exc).__name__}: {exc}"[:400]}
        out[name] = row
        release_caches()
        spark.catalog.clearCache()
        if not row.get("hash_match") or row.get("dtype_diffs"):
            sys.stderr.write(f"BAD {name}: dtypes={row.get('dtype_diffs')} "
                             f"err={str(row.get('err'))[:160]}\n")
        else:
            sys.stderr.write(f"ok  {name}\n")

    bad = {k: v for k, v in out.items()
           if not v.get("hash_match") or v.get("dtype_diffs")}
    result = {"sf_dir": sf_dir, "n": len(out), "n_bad": len(bad),
              "sec": round(time.time() - t_start, 1), "bad": bad}
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({"n": len(out), "n_bad": len(bad),
                      "bad": sorted(bad)}))
    spark.stop()


if __name__ == "__main__":
    main()
