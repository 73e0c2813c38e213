#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 gate (SURVEY.md §5.2).

Usage: python3 scripts/preverify.py [sfDir] [verifyOutDir] [query...]

Compares each Verify-produced parquet under verifyOutDir/<name>/ against
DuckDB running oracle_sql.json[<name>] over the same fixture tables,
mimicking the driver: columns sorted by name, row order as produced,
exact value equality. Exits nonzero listing every mismatching query.
"""
import duckdb
import glob
import json
import math
import sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    return [tuple(r[i] for i in order) for r in rows], [names[i] for i in order]


def eq(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
    if isinstance(a, dict) and isinstance(b, dict):
        return set(a) == set(b) and all(eq(a[k], b[k]) for k in a)
    return a == b


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    vdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/v"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{vdir}/oracle_sql.json"))
    fails = []
    # Registry-completeness gate (round 7: two queries crashed out of the
    # verify run and their ABSENCE read as "all green" until diffed against
    # the registry). Verify writes manifest.json = every registered id it was
    # asked to run; any id with no output dir is a hard FAIL here even if it
    # has no oracle (capability-only queries must still produce rows).
    try:
        manifest = json.load(open(f"{vdir}/manifest.json"))
    except FileNotFoundError:
        manifest = []
    # Verify's explicit crash record (crashed.json, always written since
    # round 9): a nonempty list is a hard FAIL even before diffing dirs.
    try:
        for name in json.load(open(f"{vdir}/crashed.json")):
            if not only or name in only:
                print(f"FAIL {name}: crashed during verify (crashed.json)")
                fails.append(name)
    except FileNotFoundError:
        pass
    for name in sorted(manifest):
        if (only and name not in only) or name in oracle:
            continue  # oracle-declared ids get the full check below
        if not glob.glob(f"{vdir}/{name}/*.parquet"):
            print(f"FAIL {name}: registered but ABSENT from verify output")
            fails.append(name)
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{vdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output found")
            fails.append(name)
            continue
        try:
            gcur = con.execute(
                "SELECT * FROM read_parquet([" +
                ",".join(f"'{f}'" for f in files) + "])")
            gnames = [d[0] for d in gcur.description]
            gtypes = [str(d[1]) for d in gcur.description]
            got = gcur.fetchall()
            ecur = con.execute(sql)
            enames = [d[0] for d in ecur.description]
            etypes = [str(d[1]) for d in ecur.description]
            exp = ecur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:160]}")
            fails.append(name)
            continue
        if sorted(gnames) != sorted(enames):
            print(f"FAIL {name}: columns spark={sorted(gnames)} oracle={sorted(enames)}")
            fails.append(name)
            continue
        gt = dict(zip(gnames, gtypes))
        et = dict(zip(enames, etypes))
        tmis = [c for c in gt if gt[c] != et[c]]
        if tmis:
            print(f"FAIL {name}: dtype mismatch " +
                  ", ".join(f"{c}: spark={gt[c]} oracle={et[c]}" for c in tmis))
            fails.append(name)
            continue
        # Pandas-materialized dtypes — the representation the driver's differ
        # actually hashes. DBAPI typecodes are too coarse: DuckDB sum(BIGINT)
        # returns HUGEINT which typecodes as NUMBER like BIGINT but lands in
        # pandas as float64 vs Spark's int64 (6 hash-fails in round 2).
        gdt = {c: str(t) for c, t in con.execute(
            "SELECT * FROM read_parquet([" +
            ",".join(f"'{f}'" for f in files) + "])").df().dtypes.items()}
        edt = {c: str(t) for c, t in con.execute(sql).df().dtypes.items()}
        dmis = [c for c in gdt if gdt[c] != edt.get(c)]
        if dmis:
            print(f"FAIL {name}: pandas dtype drift " + ", ".join(
                f"{c}: spark={gdt[c]} oracle={edt.get(c)}" for c in dmis))
            fails.append(name)
            continue
        got, names_s = canon(got, gnames)
        exp, _ = canon(exp, enames)
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            fails.append(name)
            continue
        bad = [(i, g, e) for i, (g, e) in enumerate(zip(got, exp))
               if not eq(g, e)]
        if bad:
            i, g, e = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(got)} rows differ; first at row {i}")
            print(f"  cols:   {names_s}")
            print(f"  spark:  {g}")
            print(f"  oracle: {e}")
            fails.append(name)
        else:
            print(f"OK   {name}: {len(got)} rows")
    checked = len([n for n in oracle if not only or n in only])
    print(f"\n{checked - len(fails)}/{checked} queries match")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
