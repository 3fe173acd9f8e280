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


DEFAULT_SPECS = ("indices.yaml", "config.yaml")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--spec", default=None,
        help="index spec YAML (default: ./indices.yaml or ./config.yaml, "
             "the reference's default-config discovery, cli.py:210-214)",
    )
    ap.add_argument("--output-dir", default=None)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--indices", default=None, help="comma-separated subset")
    ap.add_argument("--about-file", default=None)
    ap.add_argument("--model-files", default=None, help="comma-separated")
    ap.add_argument("--page-size", type=int, default=None)
    ap.add_argument("--test-mode", action="store_true", default=None)
    ap.add_argument(
        "--compact", action="store_true", default=None,
        help="compact delta segments after update queries",
    )
    ap.add_argument(
        "--log-level", default=None,
        choices=["DEBUG", "INFO", "WARN", "WARNING", "ERROR"],
        help="driver log level (reference cli.py log-level flags)",
    )
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args(argv)

    spec_path = args.spec
    if spec_path is None:
        for cand in DEFAULT_SPECS:
            if os.path.exists(cand):
                spec_path = cand
                break
        if spec_path is None:
            ap.error(
                "--spec not given and no default spec "
                f"({', '.join(DEFAULT_SPECS)}) found in cwd"
            )
    args.spec = spec_path

    spec = load_index_spec(args.spec)
    yaml_cfg = dict(spec.get("config", {}))
    yaml_cfg["index_spec_file"] = args.spec
    cli = {
        "output_dir": args.output_dir,
        "data_dir": args.data_dir,
        "about_file": args.about_file,
        "page_size": args.page_size,
        "test_mode": args.test_mode,
        "compact": args.compact,
        "log_level": args.log_level,
        "selected_indices": args.indices.split(",") if args.indices else None,
        "model_files": args.model_files.split(",") if args.model_files else None,
    }
    config = Config(yaml_values=yaml_cfg, cli=cli)

    level = str(config.get("log_level") or "WARN").upper()
    if level == "WARNING":
        level = "WARN"
    import logging

    logging.basicConfig(
        level=getattr(logging, "WARNING" if level == "WARN" else level)
    )
    spark = get_spark("osls-load", cores=args.cores)
    spark.sparkContext.setLogLevel(level)
    summary = Loader(spark, config).load()
    print(json.dumps(summary, indent=2))
    return 1 if any(s["error"] for s in summary["index_stats"]) else 0


if __name__ == "__main__":
    sys.exit(main())
