"""Local replica of the driver's correctness gate + the cold-cost sweep.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf, compares row count + (sorted-by-name) schema + an
order-insensitive value hash, and prints a per-query verdict.

Timing protocol (stall-resistant, round 6): the first run's rows are
the correctness record; its wall time is cross-checked against the
previous committed sweep (``--baseline FILE``, default: the newest
SWEEP_r*.txt in the repo root).  An entry that comes in >= 3x its
baseline (and over 1 s) — or a baseline-less entry over 2 s — is RE-RUN
once and the MINIMUM is recorded, with both raw timings shown, so a
host stall can no longer masquerade as a regression (round 5 recorded
8.1 s for a 1.7 s query during a documented stall phase).  Entries
whose execution rode a session-scoped memo (shared pair graph /
component labels) are tagged ``[memo-warm]`` — their number is NOT a
cold cost.  The whole-session caveat remains: entries late in the
sweep run on a JVM with hot codegen caches; first-query-in-session
cost is higher for everything.

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
       python tools/verify_oracle.py --baseline SWEEP_r05.txt sf_dir
"""

from __future__ import annotations

import glob
import hashlib
import math
import os
import re
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from devcontainers_etl_node_spark.schemas import CORPUS_TABLES  # noqa: E402
from devcontainers_etl_node_spark.session import get_spark  # noqa: E402
from tools.type_parity import type_mismatches  # noqa: E402

RERUN_FACTOR = 3.0  # rerun when >= 3x the baseline time
RERUN_FLOOR = 1.0  # ...and over this many seconds (absolute noise floor)
NO_BASELINE_RERUN = 2.0  # baseline-less entries rerun over this


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style float normalization: repr of the double
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def value_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(_norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def load_baseline(path: str | None) -> dict[str, float]:
    """name -> seconds from a prior sweep file (OK/ROWS lines)."""
    if path is None:
        candidates = sorted(glob.glob("/root/repo/SWEEP_r*.txt"))
        if not candidates:
            return {}
        path = candidates[-1]
    out: dict[str, float] = {}
    try:
        with open(path) as f:
            for line in f:
                m = re.match(r"(?:OK|ROWS)\s+(\w+):", line)
                if not m:
                    continue
                # r6+ rerun format "(min(a, b) = X.Ys)" or plain "(X.Ys)"
                t = re.search(r"= ([\d.]+)s\)", line) or re.search(
                    r"\((?:rows-only, )?([\d.]+)s\)", line
                )
                if t:
                    out[m.group(1)] = float(t.group(1))
    except OSError:
        return {}
    return out


def _memo_hits() -> int:
    from devcontainers_etl_node_spark.operators import dedup, graph

    return dedup.MEMO_HITS + graph.MEMO_HITS


def main() -> int:
    argv = sys.argv[1:]
    baseline_path = None
    if argv and argv[0] == "--baseline":
        baseline_path = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    baseline = load_baseline(baseline_path)
    print(
        f"# sweep protocol: first-run rows are the correctness record; "
        f"timing reruns once when t >= {RERUN_FACTOR}x baseline (and > "
        f"{RERUN_FLOOR}s) or no-baseline t > {NO_BASELINE_RERUN}s, min "
        f"recorded as 'min(a, b)'; [memo-warm] = rode a session memo, "
        f"not a cold plan; baseline entries loaded: {len(baseline)}"
    )

    spark = get_spark()
    con = duckdb.connect()
    for t in CORPUS_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        hits0 = _memo_hits()
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        t1 = time.time() - t0
        memo_warm = _memo_hits() > hits0
        base = baseline.get(name)
        rerun = (
            base is not None and t1 >= RERUN_FACTOR * base and t1 > RERUN_FLOOR
        ) or (base is None and t1 > NO_BASELINE_RERUN)
        if rerun and not memo_warm:
            hits1 = _memo_hits()
            t0 = time.time()
            try:
                fn(spark, sf_dir).collect()
                t2 = time.time() - t0
                if _memo_hits() > hits1:
                    # the rerun rode a memo the FIRST run populated — its
                    # time is not a cold cost, keep the first measurement
                    t_str = f"{t1:.1f}s (rerun memoized: {t2:.1f}s, kept first)"
                else:
                    t_str = f"min({t1:.1f}, {t2:.1f}) = {min(t1, t2):.1f}s"
            except Exception:  # noqa: BLE001
                t_str = f"{t1:.1f}s (rerun errored)"
        else:
            t_str = f"{t1:.1f}s"
        tag = " [memo-warm]" if memo_warm else ""
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (rows-only, {t_str}){tag}")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        # declared-type parity (r8 post-mortem: the driver's canonicalizer
        # is type-sensitive while our value hash stringifies, so a HUGEINT
        # oracle column is invisible here but red at the driver)
        try:
            rel = con.sql(oracles[name])
            tmism = type_mismatches(sdf.schema, rel.columns, rel.types)
        except Exception:  # noqa: BLE001 — rel planning failed; exec above caught it
            tmism = []
        if tmism:
            problems.append("type drift: " + "; ".join(tmism))
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        elif value_hash(srows, scols) != value_hash(orows, ocols):
            problems.append("value-hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            # print a small diff sample
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_o = sorted(range(len(ocols)), key=lambda i: ocols[i]) if sorted(scols) == sorted(ocols) else None
            s_set = sorted("|".join(_norm_cell(r[i]) for i in order_s) for r in srows)
            if order_o is not None:
                o_set = sorted("|".join(_norm_cell(r[i]) for i in order_o) for r in orows)
                s_only = [x for x in s_set if x not in set(o_set)][:3]
                o_only = [x for x in o_set if x not in set(s_set)][:3]
                for x in s_only:
                    print(f"        spark-only: {x[:160]}")
                for x in o_only:
                    print(f"        duck-only:  {x[:160]}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(srows)} rows ({t_str}){tag}")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
