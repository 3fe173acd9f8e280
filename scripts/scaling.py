"""Scaling-efficiency evidence (north rule: ≥0.8 from N to 4N executors).

Sandbox stand-in per driver instruction: run the identical index build at
local[8] and local[32] on the same sf0.1 input in separate JVMs (fresh
process each), report docs/sec at both and
efficiency = (T_8 / T_32) / (32/8).

Run: python scripts/scaling.py  → prints JSON + updates BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
cores = int(sys.argv[1])
sf_dir = sys.argv[2]
from opensearch_loader_spark.session import get_spark
from opensearch_loader_spark.indexer import build_index
from opensearch_loader_spark.sources.catalog import documents_as_corpus
spark = get_spark("scaling", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
corpus = documents_as_corpus(spark, sf_dir)
n = corpus.count()
d = tempfile.mkdtemp(prefix=f"osls_scale_{cores}_")
t0 = time.time()
build_index(spark, corpus, d, n_buckets=max(16, cores), rows_per_run=100_000)
secs = time.time() - t0
shutil.rmtree(d, ignore_errors=True)
print(json.dumps({"cores": cores, "secs": round(secs, 3), "n_docs": n,
                  "docs_per_sec": round(n / secs, 1)}))
"""


def run_at(cores: int, sf_dir: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO), str(cores), sf_dir],
        capture_output=True, text=True, timeout=3600, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    lo = run_at(8, sf_dir)
    hi = run_at(32, sf_dir)
    eff = (lo["secs"] / hi["secs"]) / (32 / 8)
    result = {"low": lo, "high": hi, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))
    md = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(md), exist_ok=True)
    with open(md, "a") as f:
        f.write(
            f"\n## Scaling run (sf_dir={sf_dir})\n\n"
            f"| cores | build secs | docs/sec |\n|---|---|---|\n"
            f"| 8 | {lo['secs']} | {lo['docs_per_sec']} |\n"
            f"| 32 | {hi['secs']} | {hi['docs_per_sec']} |\n\n"
            f"Scaling efficiency (T_8/T_32)/4 = **{round(eff, 3)}**\n"
        )


if __name__ == "__main__":
    main()
