#!/usr/bin/env python3
"""Declared-output shape lint.

The driver's oracle gate pandas-sorts EVERY column of a declared
query's result before hashing; pandas `sort_values` cannot factorize
array/map/struct cells (`TypeError: unhashable type: 'numpy.ndarray'`),
so a declared output carrying a complex top-level column is
unverifiable at the binding gate even when it is semantically right —
exactly how e32_centroid_agg shipped red in round 8 while the local
compare (which normalizes arrays) stayed green. This lint closes that
divergence: it inspects the parquet Verify dumped for every
oracle-checkable key and FAILS on any top-level non-scalar column.

Usage: python3 tools/shape_lint.py <verifyOutDir>
Exit 0 = all declared outputs are driver-sortable scalar columns.
"""
import glob
import json
import sys

import pyarrow.parquet as pq
import pyarrow.types as pt


def bad_columns(schema):
    out = []
    for f in schema:
        t = f.type
        if (pt.is_list(t) or pt.is_large_list(t) or pt.is_fixed_size_list(t)
                or pt.is_struct(t) or pt.is_map(t)):
            out.append((f.name, str(t)))
    return out


def main(out_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_checked, violations = 0, []
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            # a missing dump is the compare step's problem, not shape's
            continue
        n_checked += 1
        bad = bad_columns(pq.read_schema(files[0]))
        if bad:
            violations.append((name, bad))
    for name, bad in violations:
        cols = ", ".join(f"{c}: {t}" for c, t in bad)
        print(f"[SHAPE] {name}: non-scalar top-level column(s) — {cols}")
    if violations:
        print(f"shape_lint: {len(violations)} of {n_checked} declared outputs "
              "carry array/map/struct columns the driver gate cannot sort — "
              "explode or stringify them (see e32_centroid_agg, round 9)")
        return 1
    print(f"shape_lint: {n_checked} declared outputs all scalar — driver-sortable")
    return 0


def selftest():
    """The lint must actually fail on a non-scalar column (the whole
    point) — build a throwaway violation and assert rc=1, plus a clean
    dump and assert rc=0. Run by ci.sh before the real lint so a
    regression in the lint itself can't silently wave violations
    through."""
    import shutil
    import tempfile

    import pyarrow as pa

    root = tempfile.mkdtemp(prefix="shape-lint-selftest-")
    try:
        import os
        with open(f"{root}/oracle_sql.json", "w") as f:
            json.dump({"good_key": "SELECT 1", "bad_key": "SELECT 1"}, f)
        os.makedirs(f"{root}/good_key")
        pq.write_table(pa.table({"k": [1], "v": [2.0]}),
                       f"{root}/good_key/part-0.parquet")
        assert main(root) == 0, "lint rejected a scalar-only dump"
        os.makedirs(f"{root}/bad_key")
        pq.write_table(pa.table({"k": [1], "v": [[1.0, 2.0]]}),
                       f"{root}/bad_key/part-0.parquet")
        assert main(root) == 1, "lint passed an array-valued declared output"
        print("shape_lint --selftest: ok (scalar dump passes, array dump fails)")
        return 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    if sys.argv[1] == "--selftest":
        sys.exit(selftest())
    sys.exit(main(sys.argv[1]))
