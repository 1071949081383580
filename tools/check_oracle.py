#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf-dir parquet tables and compare against the Spark
result parquet dumped by graft.Verify.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Comparison: columns sorted by name, rows compared in dumped order
(every query ORDER BYs a unique key), exact value equality (floats
bit-compared via struct pack so we see真 ulp drift immediately).
"""
import json
import math
import struct
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return struct.pack("<d", v).hex()
    return v


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # testdata ships single files; Spark-written corpora (e.g. the
        # ScaleUp /tmp/sf1 synth) are directories of part files
        p = Path(sf_dir) / f"{t}.parquet"
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracles = json.loads(Path(f"{out_dir}/oracle_sql.json").read_text())
    failures = 0
    for name, sql in sorted(oracles.items()):
        rdir = Path(out_dir) / name
        if not rdir.exists():
            print(f"FAIL {name}: no Spark result dir")
            failures += 1
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{rdir}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                f"SELECT {', '.join(spark_cols)} FROM '{rdir}/*.parquet'"
            ).fetchall()
            oracle_rel = con.sql(sql)
            ocols_orig = oracle_rel.columns
            ocols = sorted(ocols_orig)
            oracle_rows = con.sql(
                f"SELECT {', '.join(ocols)} FROM ({sql})"
            ).fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: error: {e}")
            failures += 1
            continue
        if spark_cols != ocols:
            print(f"FAIL {name}: columns differ spark={spark_cols} oracle={ocols}")
            failures += 1
            continue
        # the DRIVER comparator canonicalizes with pandas sort_values,
        # which cannot hash array/map/struct cells (r18 q181 shipped red
        # on exactly this) — mirror that restriction here so a nested
        # column fails locally before it fails at the driver
        nested = [
            f"{c}: {t}"
            for c, t in zip(spark_rel.columns, [str(t) for t in spark_rel.types])
            if "[" in str(t) or str(t).startswith(("STRUCT", "MAP", "LIST"))
        ]
        if nested:
            print(f"FAIL {name}: non-scalar output columns ({', '.join(nested)}) — "
                  "the driver comparator cannot canonicalize them")
            failures += 1
            continue
        # dtype drift is a warning: value-hash parity may still hold, but
        # a type-sensitive comparator would flag it
        stypes = dict(zip(spark_rel.columns, [str(t) for t in spark_rel.types]))
        otypes = dict(zip(ocols_orig, [str(t) for t in oracle_rel.types]))
        for c in spark_cols:
            if stypes.get(c) != otypes.get(c):
                print(f"WARN {name}: dtype {c}: spark={stypes.get(c)} oracle={otypes.get(c)}")
        if len(spark_rows) != len(oracle_rows):
            print(f"FAIL {name}: rows spark={len(spark_rows)} oracle={len(oracle_rows)}")
            failures += 1
            continue
        bad = 0
        for i, (srow, orow) in enumerate(zip(spark_rows, oracle_rows)):
            if tuple(map(canon, srow)) != tuple(map(canon, orow)):
                if bad == 0:
                    print(f"FAIL {name}: row {i} differs")
                    for c, sv, ov in zip(spark_cols, srow, orow):
                        if canon(sv) != canon(ov):
                            print(f"    {c}: spark={sv!r} oracle={ov!r}")
                bad += 1
        if bad:
            print(f"     ({bad}/{len(spark_rows)} rows differ)")
            failures += 1
        else:
            print(f"OK   {name}: {len(spark_rows)} rows")
    print(f"\n{len(oracles) - failures}/{len(oracles)} oracle queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
