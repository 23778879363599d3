#!/usr/bin/env python3
"""Local replica of the driver's correctness compare (dev tool only —
NOT part of the library; the library itself is pure Scala/Spark).

Usage:
  1) sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/vout"
     (optionally SPARK_GRAFT_ONLY=q206 to scope)
  2) python3 dev/check_gates.py /root/testdata/sf0.01 /tmp/vout [only_prefix...]

For each <name>.parquet under outDir it runs the matching oracle SQL
from oracle_sql.json in DuckDB over the same sf tables and compares:
  - row count
  - schema (column names sorted; a name-matched TYPE drift prints a
    loud warning without failing — the driver's type contract is
    unknown, but drift is the first suspect for a "value-identical"
    hash mismatch)
  - order-insensitive full-row hash: columns sorted by name, every cell
    canonicalized to a string (floats via repr of float64, decimals via
    str, NULL as a sentinel, arrays/structs via canonical recursion),
    rows sorted, sha256 over the concatenation.
This mirrors the driver's count+schema+hash contract closely enough to
catch a hash-fragile gate locally before a round ships.
"""
import sys, os, json, glob, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        # canonical float64 text; -0.0 folds to 0.0
        if v == 0.0:
            v = 0.0
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, bytes):
        return "b" + v.hex()
    return str(v)


def frame_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode("utf-8", "surrogatepass"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = sys.argv[3:]
    sql_map = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    if only:
        names = [n for n in names if any(n.startswith(o) for o in only)]
    n_bad = 0
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"{name}: NO OUTPUT PARQUET");  n_bad += 1;  continue
        scon = duckdb.connect()
        sq = scon.execute(
            f"SELECT * FROM read_parquet({files!r})")
        s_rows = sq.fetchall();  s_cols = [c[0] for c in sq.description]
        s_types = {c[0]: str(c[1]) for c in sq.description}
        if name not in sql_map:
            print(f"{name}: rows={len(s_rows)} (no oracle — rows-only)")
            continue
        oq = con.execute(sql_map[name])
        o_rows = oq.fetchall();  o_cols = [c[0] for c in oq.description]
        o_types = {c[0]: str(c[1]) for c in oq.description}
        rows_ok = len(s_rows) == len(o_rows)
        schema_ok = sorted(s_cols) == sorted(o_cols)
        # type drift is a loud WARNING, not a failure: the driver's own
        # compare contract on types is unknown, but a drift here is the
        # first place to look when a hash mismatch looks value-identical
        if schema_ok and s_types != o_types:
            diff = {k: (s_types[k], o_types[k])
                    for k in s_types if s_types[k] != o_types.get(k)}
            print(f"{name}: WARNING type drift {diff}")
        hash_ok = (schema_ok and
                   frame_sig(s_cols, s_rows) == frame_sig(o_cols, o_rows))
        ok = rows_ok and schema_ok and hash_ok
        if not ok:
            n_bad += 1
            print(f"{name}: FAIL rows={rows_ok}({len(s_rows)}/{len(o_rows)}) "
                  f"schema={schema_ok} hash={hash_ok}")
            if schema_ok and rows_ok and not hash_ok and len(s_rows) <= 60:
                so = sorted(map(str, s_rows));  oo = sorted(map(str, o_rows))
                for a, b in zip(so, oo):
                    if a != b:
                        print(f"  spark:  {a}\n  oracle: {b}")
        else:
            print(f"{name}: ok ({len(s_rows)} rows)")
    print(f"== {len(names)} checked, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
