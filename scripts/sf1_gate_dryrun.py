#!/usr/bin/env python
"""sf1-scale correctness dry run over the FULL driver gate.

The shipped testdata tops out at sf0.1 (~50k documents). This script
materializes an sf1-scale variant by replicating the sf0.1
``documents``/``embeddings`` tables 10x with shifted ids
(deterministic — no synthesis), then runs EVERY registered
driver-gate entry (round 5; round 4 ran only the 10 most
data-dependent) through exactly the contract-test comparison (Spark
plan vs DuckDB oracle: row count, column names, order-insensitive
canonical values), recording per-entry seconds. Scale bugs masked at
tiny sf (overflow, skew collapse, oracle divergence on bigger
windows) surface here.

Scale note: the 10x replication applies to the document/embedding
corpus — the tables the heavy text/dedup/ANN entries consume; the
TPC-H-shaped relational tables are carried verbatim at sf0.1 (both
engines read the SAME files, so the comparison is exact either way;
replicating them with shifted keys would break FK structure, not add
scale coverage beyond what sf0.1 already gives those entries).

Writes SF1_GATE.json at the repo root:
    {"sf_equivalent": 1.0, "n_documents": ..., "results": {name: ok}}

Run:  python scripts/sf1_gate_dryrun.py   (~30-40 min; the
dedup_clusters DuckDB recursive-CTE oracle alone is ~10 min of that;
needs ~2 GB tmp). SPARK_GRAFT_SF1_ENTRIES=a,b,c restricts to a
subset (the round-4 shortlist lives in DATA_HEAVY).
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.abspath(os.path.join(HERE, ".."))
sys.path.insert(0, ROOT)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
FACTOR = int(os.environ.get("SPARK_GRAFT_SF1_FACTOR", "10"))

# the round-4 shortlist (most data-dependent), kept for quick runs
# via SPARK_GRAFT_SF1_ENTRIES=$(this list)
DATA_HEAVY = [
    "a3_pair_window_stats",
    "a4_triple_window_stats",
    "a9_copresence_pairs",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_clusters",
    "t4_bm25_topk",
    "curation_pipeline",
]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return round(val, 9)
    if isinstance(val, bool):
        return int(val)
    return val


def _rows_canon(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in idx) for r in rows)


def main() -> None:
    import duckdb
    from pyspark.sql import functions as F

    import __spark_entry__ as entry_mod
    from efficient_query_expansion_spark.session import get_spark

    spark = get_spark(app_name="eqx-sf1-gate", cores=32,
                      shuffle_partitions=64)
    work = tempfile.mkdtemp(prefix="eqx_sf1_")

    # 10x replication with shifted ids; other tables copied verbatim
    # (the chosen entries only consume documents/embeddings)
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = spark.range(FACTOR).select(F.col("id").alias("rep"))
    big_docs = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("rep") * max_doc).alias("doc_id"),
        # make replicas non-identical (except rep 0) so dedup entries
        # see realistic near-dup structure, deterministically
        F.when(F.col("rep") == 0, F.col("text"))
        .otherwise(
            F.concat(F.col("text"), F.lit(" rep"),
                     F.col("rep").cast("string"))
        ).alias("text"),
    )
    big_docs.write.mode("overwrite").parquet(f"{work}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    max_vec = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    big_emb = emb.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("rep") * max_vec).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x: x + F.col("rep").cast("float") * F.lit(0.001),
        ).alias("embedding"),
    )
    big_emb.write.mode("overwrite").parquet(f"{work}/embeddings.parquet")

    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{work}/{t}.parquet")

    n_docs = big_docs.count()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{work}/{t}.parquet/*.parquet')"
        )

    q = entry_mod.queries()
    sqls = entry_mod.oracle_sql()
    sel = os.environ.get("SPARK_GRAFT_SF1_ENTRIES")
    entries = (
        [e.strip() for e in sel.split(",") if e.strip()]
        if sel
        else list(q)  # the FULL gate, in registration order
    )
    results, timings = {}, {}
    for name in entries:
        t0 = time.time()
        try:
            sdf = q[name](spark, work)
            srows = sdf.collect()
            scols = sdf.columns
            res = con.execute(sqls[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            ok = (
                sorted(scols) == sorted(dcols)
                and len(srows) == len(drows)
                and _rows_canon(
                    scols, [[r[c] for c in scols] for r in srows]
                )
                == _rows_canon(dcols, drows)
            )
            results[name] = {"ok": bool(ok), "rows": len(srows)}
        except Exception as e:  # record, keep going
            results[name] = {"ok": False, "err": str(e)[:300]}
        timings[name] = round(time.time() - t0, 1)
        print(name, results[name], timings[name], "s", flush=True)

    try:
        sf_eq = round(FACTOR * float(SRC.rstrip("/").split("sf")[-1]), 3)
    except ValueError:
        sf_eq = -1.0  # non-sf-suffixed SPARK_GRAFT_SF_DIR override
    gate_path = os.path.join(ROOT, "SF1_GATE.json")
    if sel and os.path.exists(gate_path):
        # subset re-run (e.g. after fixing one entry): merge into the
        # existing full-gate record instead of clobbering it
        with open(gate_path) as f:
            prev = json.load(f)
        results = {**prev.get("results", {}), **results}
        timings = {**prev.get("seconds", {}), **timings}
    out = {
        "sf_equivalent": sf_eq,
        "n_documents": n_docs,
        "source": SRC,
        "factor": FACTOR,
        "results": results,
        "seconds": timings,
        "n_ok": sum(1 for r in results.values() if r["ok"]),
        "n_total": len(results),
    }
    with open(gate_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("sf_equivalent", "n_documents", "n_ok", "n_total")}))
    spark.stop()


if __name__ == "__main__":
    main()
