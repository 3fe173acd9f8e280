"""spark-submit entry point for the spec-driven loader — the reference's
``python -m opensearch_loader.cli`` analogue (cli.py + loader.py:98-229).

Usage:
  spark-submit --py-files opensearch_loader_spark.zip scripts/load_job.py \
      --spec indices.yaml --output-dir /indexes [--data-dir /tables] \
      [--indices a,b] [--test-mode] [--page-size 10000] \
      [--about-file about.yaml] [--model-files m1.yaml,m2.yaml]

Config precedence: spec-file `config:` block < OSLS_* env vars < CLI flags
(reference config.py:18-43). Exit code 1 if any index errored (the reference
logs and continues per index, then reports — loader.py:176-203).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opensearch_loader_spark.loader import Config, Loader  # noqa: E402
from opensearch_loader_spark.session import get_spark  # noqa: E402
from opensearch_loader_spark.sources.spec import load_index_spec  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--spec", required=True, help="index spec YAML")
    ap.add_argument("--output-dir", default=None)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--indices", default=None, help="comma-separated subset")
    ap.add_argument("--about-file", default=None)
    ap.add_argument("--model-files", default=None, help="comma-separated")
    ap.add_argument("--page-size", type=int, default=None)
    ap.add_argument("--test-mode", action="store_true", default=None)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    spec = load_index_spec(args.spec)
    yaml_cfg = dict(spec.get("config", {}))
    yaml_cfg["index_spec_file"] = args.spec
    cli = {
        "output_dir": args.output_dir,
        "data_dir": args.data_dir,
        "about_file": args.about_file,
        "page_size": args.page_size,
        "test_mode": args.test_mode,
        "selected_indices": args.indices.split(",") if args.indices else None,
        "model_files": args.model_files.split(",") if args.model_files else None,
    }
    config = Config(yaml_values=yaml_cfg, cli=cli)

    spark = get_spark("osls-load", cores=args.cores)
    spark.sparkContext.setLogLevel("WARN")
    summary = Loader(spark, config).load()
    print(json.dumps(summary, indent=2))
    return 1 if any(s["error"] for s in summary["index_stats"]) else 0


if __name__ == "__main__":
    sys.exit(main())
