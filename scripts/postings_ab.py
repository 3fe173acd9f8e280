"""Postings-stage A/B on a REALISTIC vocabulary (VERDICT r4 item 7).

The round-4 partial-pack vs row-shuffle A/B ran on the sf0.1 documents
corpus, whose vocabulary is exactly 31 distinct terms — structurally the
best case for the old row-shuffle packer (the (term, doc) shuffle rows are
tiny and /dev/shm shuffle is free) and the worst case for judging the
partial-pack path (its map-side flush pays per-DISTINCT-term work that a
31-term stream never exercises). A web corpus has millions of distinct
terms; this harness generates a Zipfian ~100k-term corpus (~250 tokens/doc,
p(rank r) ∝ 1/r — head term hits ~8% of tokens, so skew splitting still
engages) and times ONLY the postings stage (tokenize → pack → write) both
ways at two parallelism levels, each leg inside a trough-gated bandwidth
window (platform_gate).

Per (mode, cores) leg the child reports a two-phase decomposition:
- map_secs: tokenize + map-side work only (partials/postings materialized
  to parquet with NO term shuffle — for the old path this is the persisted
  postings count, i.e. its tokenize cost)
- full_secs: the complete stage (tokenize → term-keyed shuffle → merge/pack
  → write); full - map ≈ shuffle + merge cost.

Run: python scripts/postings_ab.py → BENCH/postings_ab.json + a summary
section appended to BENCH/BASELINE.md.
Env: AB_N_DOCS (default 1_000_000), AB_REPEATS (default 1),
AB_LOW_CORES/AB_HIGH_CORES (2/8), AB_GATE_GBPS (10), AB_ROWS_PER_RUN
(500_000).
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GEN = r"""
import json, sys
sys.path.insert(0, __REPO__)
n_docs = int(sys.argv[1]); out = sys.argv[2]
import numpy as np
import pandas as pd
from pyspark.sql import types as T
from opensearch_loader_spark.session import get_spark

spark = get_spark("ab-gen", cores=8, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

VOCAB_N = 100_000
# rank→word: fixed-width ids through a deterministic permutation so
# lexicographic order is uncorrelated with frequency rank (a frequency-
# sorted vocab would make the packer's lexsort artificially cache-friendly)
perm = np.random.default_rng(1234).permutation(VOCAB_N)
VOCAB = np.array([f"t{p:06d}" for p in perm])
ranks = np.arange(VOCAB_N, dtype=np.float64) + 1.0
probs = 1.0 / ranks
probs /= probs.sum()
CUM = np.cumsum(probs)

def _gen(batches):
    for pdf in batches:
        ids = pdf["id"].values
        # deterministic for THIS materialization (seeded by the batch's
        # doc ids); the corpus is written once and shared by every leg
        rng = np.random.default_rng(int(ids[0]) * 2654435761 % (2**31))
        lens = rng.integers(50, 450, size=len(ids))
        tot = int(lens.sum())
        toks = VOCAB[np.searchsorted(CUM, rng.random(tot), side="right")]
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        texts = [
            " ".join(toks[s : s + l]) for s, l in zip(starts, lens)
        ]
        yield pd.DataFrame({"doc_id": ids.astype("int64"), "text": texts})

schema = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])
df = spark.range(n_docs).repartition(32).mapInPandas(_gen, schema=schema)
df.write.mode("overwrite").parquet(out)

docs = spark.read.parquet(out)
from opensearch_loader_spark.indexer import doc_lengths
from pyspark.sql import functions as F
row = doc_lengths(docs).agg(
    F.count("*").alias("n"), F.avg("doc_len").alias("avgdl")
).collect()[0]
print(json.dumps({"n": int(row["n"]), "avgdl": float(row["avgdl"])}))
"""

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, __REPO__)
cores = int(sys.argv[1]); src = sys.argv[2]; mode = sys.argv[3]
n_docs = int(sys.argv[4]); avgdl = float(sys.argv[5])
rows_per_run = int(sys.argv[6])
from opensearch_loader_spark.session import get_spark
from opensearch_loader_spark.indexer import (
    pack_blocks, pack_partial_runs, salt_postings, sampled_skew_plan,
    skew_plan, tokenize_partial_runs, tokenize_postings,
)

spark = get_spark("ab", cores=cores, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(src)
docs.count()  # warm metadata/scan outside the timed region

def _steal():
    f = open("/proc/stat").readline().split()
    v = [int(x) for x in f[1:9]]
    return sum(v), v[7]

d = tempfile.mkdtemp(prefix=f"osls_ab_{mode}_{cores}_", dir="/dev/shm")
s0 = _steal()
if mode == "partial":
    # phase A: map side only — partials written with NO term shuffle
    t0 = time.time()
    plan = sampled_skew_plan(docs, n_docs, rows_per_run)
    plan_secs = time.time() - t0
    t0 = time.time()
    partials = tokenize_partial_runs(docs, plan)
    partials.write.mode("overwrite").parquet(d + "/map")
    map_secs = time.time() - t0
    # phase B: the full stage
    t0 = time.time()
    blocks = pack_partial_runs(tokenize_partial_runs(docs, plan), avgdl)
    blocks.write.mode("overwrite").parquet(d + "/blocks")
    full_secs = time.time() - t0
else:
    # round-3 row-shuffle path, as the build ran it (postings persisted to
    # feed the exact skew plan, then salted + packed)
    t0 = time.time()
    postings = tokenize_postings(docs).persist()
    n_post = postings.count()  # materialize = its tokenize cost
    map_secs = time.time() - t0
    plan_secs = 0.0
    t0 = time.time()
    plan = skew_plan(postings, rows_per_run)
    salted = salt_postings(postings, plan)
    pack_blocks(salted, avgdl).write.mode("overwrite").parquet(d + "/blocks")
    full_secs = time.time() - t0 + map_secs
    postings.unpersist()
s1 = _steal()
import glob
blk_bytes = sum(os.path.getsize(p) for p in glob.glob(d + "/blocks/*.parquet"))
shutil.rmtree(d, ignore_errors=True)
print(json.dumps({
    "mode": mode, "cores": cores,
    "plan_secs": round(plan_secs, 2),
    "map_secs": round(map_secs, 2),
    "full_secs": round(full_secs, 2),
    "docs_per_sec": round(n_docs / full_secs, 1),
    "blocks_bytes": blk_bytes,
    "steal_pct": round(100.0 * (s1[1] - s0[1]) / max(1, s1[0] - s0[0]), 2),
}))
"""


def _run_child(code: str, args: list[str], timeout: int = 3600) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", code.replace("__REPO__", repr(REPO))] + args,
        capture_output=True, text=True, timeout=timeout, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def run_leg_gated(cores, src, mode, n, avgdl, rpr, min_gbps, discarded):
    from opensearch_loader_spark.platform_gate import (
        memcpy_probe,
        wait_for_clean_window,
    )

    for attempt in range(3):
        pre = wait_for_clean_window(min_gbps=min_gbps, label=f"ab-{mode}-{cores}c")
        res = _run_child(
            CHILD, [str(cores), src, mode, str(n), str(avgdl), str(rpr)]
        )
        post = memcpy_probe()
        res.update(
            memcpy_gbps_pre=round(pre, 2),
            memcpy_gbps_post=round(post, 2),
            attempt=attempt,
        )
        res["gated_clean"] = (
            pre >= min_gbps
            and post >= min_gbps
            and max(pre, post) <= 2 * min(pre, post)
        )
        if res["gated_clean"]:
            return res
        print(
            f"ab: {mode}@{cores}c attempt {attempt} DIRTY "
            f"({pre:.2f}->{post:.2f} GiB/s)",
            file=sys.stderr,
        )
        discarded.append(res)
    return res


def main() -> None:
    n_docs = int(os.environ.get("AB_N_DOCS", "1000000"))
    repeats = int(os.environ.get("AB_REPEATS", "1"))
    low = int(os.environ.get("AB_LOW_CORES", "2"))
    high = int(os.environ.get("AB_HIGH_CORES", "8"))
    gate = float(os.environ.get("AB_GATE_GBPS", "10"))
    rpr = int(os.environ.get("AB_ROWS_PER_RUN", "500000"))
    src = os.environ.get("AB_SRC", "/dev/shm/osls_ab_corpus")

    meta_path = src + ".meta.json"
    if os.path.exists(meta_path):
        meta = json.load(open(meta_path))
    else:
        print(f"ab: generating {n_docs} Zipf-100k docs → {src}", file=sys.stderr)
        meta = _run_child(GEN, [str(n_docs), src])
        json.dump(meta, open(meta_path, "w"))
    n, avgdl = meta["n"], meta["avgdl"]
    print(f"ab: corpus n={n} avgdl={avgdl:.1f}", file=sys.stderr)

    discarded: list = []
    legs: dict[str, list] = {}
    for _ in range(repeats):
        for mode in ("partial", "rowshuffle"):
            for cores in (low, high):
                key = f"{mode}_{cores}c"
                r = run_leg_gated(
                    cores, src, mode, n, avgdl, rpr, gate, discarded
                )
                legs.setdefault(key, []).append(r)
                print(json.dumps(r), file=sys.stderr)
                time.sleep(10)

    def med(key, field):
        return round(
            statistics.median(r[field] for r in legs[key]), 2
        )

    ratio = high / low
    summary = {"n_docs": n, "avgdl": round(avgdl, 1), "vocab": 100_000,
               "rows_per_run": rpr, "gate_gbps": gate, "repeats": repeats,
               "low_cores": low, "high_cores": high}
    for mode in ("partial", "rowshuffle"):
        lo_k, hi_k = f"{mode}_{low}c", f"{mode}_{high}c"
        summary[mode] = {
            "low_full_secs": med(lo_k, "full_secs"),
            "high_full_secs": med(hi_k, "full_secs"),
            "low_map_secs": med(lo_k, "map_secs"),
            "high_map_secs": med(hi_k, "map_secs"),
            "scaling_eff": round(
                (med(lo_k, "full_secs") / med(hi_k, "full_secs")) / ratio, 3
            ),
        }
    result = {"summary": summary, "legs": legs, "discarded": discarded}
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "postings_ab.json"), "w") as f:
        json.dump(result, f, indent=2)
    p, r_ = summary["partial"], summary["rowshuffle"]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Postings-stage A/B, Zipf 100k-term vocabulary "
            f"({n} docs, avgdl {avgdl:.0f}, trough-gated ≥{gate} GiB/s)\n\n"
            f"| path | {low}c full | {high}c full | {low}c map-side | "
            f"{high}c map-side | eff {low}→{high}c |\n|---|---|---|---|---|---|\n"
            f"| partial-pack (default) | {p['low_full_secs']} | "
            f"{p['high_full_secs']} | {p['low_map_secs']} | "
            f"{p['high_map_secs']} | {p['scaling_eff']} |\n"
            f"| row-shuffle (round-3) | {r_['low_full_secs']} | "
            f"{r_['high_full_secs']} | {r_['low_map_secs']} | "
            f"{r_['high_map_secs']} | {r_['scaling_eff']} |\n\n"
            f"full − map ≈ shuffle+merge; discarded legs: {len(discarded)}.\n"
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
