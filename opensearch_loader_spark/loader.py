"""Top-level loader orchestration — the Spark-native equivalent of the
reference's ``Loader.load()`` (loader.py:98-229): load the index spec, filter
by selected indices, route each entry by type (query / about_file / model)
through mapping enforcement and an index build, then apply ordered update
queries — with per-index error isolation, per-index stats and a timing
summary, exactly as the reference records them (loader.py:176-203, 205-229).

Config precedence mirrors the reference's ``Config`` (config.py:18-43):
YAML file values are overridden by ``OSLS_*`` environment variables
(config.py:47-64 env map) which are overridden by CLI arguments
(config.py:120-196). ``test_mode`` limits each UPDATE query to one page
(``df.limit(page_size)``) while initial queries always run completely —
the reference's exemption at loader.py:587-593 vs :868-878.

The "index" each entry produces is this engine's compressed inverted index
(indexer.build_index) over the entry's documents: stored fields live in the
segment docs table (the OpenSearch ``_source`` analogue), and the entry's
``text_field`` feeds the BM25-searchable text. Sources are partition-parallel
parquet scans instead of paginated Cypher (SURVEY.md §2 #1).
"""

from __future__ import annotations

import json
import logging
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opensearch_loader_spark.indexer import build_index
from opensearch_loader_spark.plans.mapping import (
    enforce_mapping,
    parse_grouped_mapping,
)
from opensearch_loader_spark.plans.model import (
    merge_model_files,
    model_documents,
)
from opensearch_loader_spark.plans.query_validation import validate_predicate
from opensearch_loader_spark.sources.spec import (
    load_about_pages,
    load_index_spec,
    parse_env_value,
    select_indices,
)
from opensearch_loader_spark.streaming.incremental import build_delta_segment

logger = logging.getLogger(__name__)

# config keys the loader understands, with their types for env parsing
# (reference env map, config.py:47-64)
CONFIG_TYPES: dict[str, type] = {
    "index_spec_file": str,
    "about_file": str,
    "model_files": list,
    "selected_indices": list,
    "test_mode": bool,
    "page_size": int,
    "output_dir": str,
    "data_dir": str,
    "compact": bool,
    "log_level": str,
}


class Config:
    """YAML → env (``OSLS_<KEY>``) → CLI precedence (config.py:18-43)."""

    def __init__(
        self,
        yaml_values: dict | None = None,
        env: dict | None = None,
        cli: dict | None = None,
        env_prefix: str = "OSLS_",
    ):
        self.values: dict = {}
        self.values.update(yaml_values or {})
        env = dict(os.environ) if env is None else env
        for key, typ in CONFIG_TYPES.items():
            env_key = env_prefix + key.upper()
            if env_key in env:
                self.values[key] = parse_env_value(env[env_key], typ)
        for k, v in (cli or {}).items():
            if v is not None:
                self.values[k] = v

    def get(self, key: str, default=None):
        return self.values.get(key, default)

    @property
    def test_mode(self) -> bool:
        return bool(self.get("test_mode", False))

    @property
    def page_size(self) -> int:
        return int(self.get("page_size", 10_000))


def _docs_to_corpus(docs: DataFrame, id_col: str, text_cols: list[str]) -> DataFrame:
    """Adapt an arbitrary document table onto the engine corpus shape:
    url = string doc key, text = space-joined text fields (the searchable
    content), lang/html NULL, warc_ts fixed (stored fields stay in the docs
    table; this only feeds tokenization)."""
    text = F.concat_ws(
        " ", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in text_cols]
    )
    return docs.select(
        F.col(id_col).cast("string").alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        text.alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


class Loader:
    """Routes a multi-index spec through builds + ordered updates."""

    def __init__(self, spark: SparkSession, config: Config):
        self.spark = spark
        self.config = config
        self.model: dict | None = None
        self.index_stats: list[dict] = []
        self.query_timings: dict[str, float] = {}

    # ------------------------------------------------------------- sources

    def _read_source(self, source: dict, limit_one_page: bool = False) -> DataFrame:
        """A spec `query` block → DataFrame. Shape:
        {table: name-or-path, where: SQL predicate?, select: {alias: col}?}.
        The reference's read-only/pagination lints apply to the `where`
        clause (memgraph_client.py:42-95 analogue)."""
        table = source["table"]
        path = (
            table
            if os.path.isabs(table)
            else os.path.join(self.config.get("data_dir", "."), f"{table}.parquet")
        )
        df = self.spark.read.parquet(path)
        where = source.get("where")
        if where:
            validate_predicate(where)
            df = df.filter(where)
        sel = source.get("select")
        if sel:
            df = df.select(*[F.col(c).alias(a) for a, c in sel.items()])
        if limit_one_page:
            # test_mode: one page only (memgraph_client.py:178-186) —
            # validates the query end-to-end without a full run
            df = df.limit(self.config.page_size)
        return df

    # ------------------------------------------------------------ routing

    def load(self) -> dict:
        spec_file = self.config.get("index_spec_file")
        if not spec_file:
            raise ValueError("index_spec_file not specified in configuration")
        spec = load_index_spec(spec_file)
        indices = spec.get("indices", [])
        if not indices:
            raise ValueError("No indices defined in specification file")

        names = [i.get("index_name", "") for i in indices]
        keep = set(select_indices(names, self.config.get("selected_indices")))
        indices = [i for i in indices if i.get("index_name", "") in keep]

        if any(i.get("type") == "model" for i in indices):
            model_files = self.config.get("model_files") or []
            models = [load_index_spec(p) for p in model_files]
            self.model = merge_model_files(models) if models else None

        t0 = time.time()
        for index_config in indices:
            name = index_config.get("index_name", "unknown")
            t_idx = time.time()
            try:
                n = self._process_index(index_config)
                self.index_stats.append(
                    {"index_name": name, "document_count": n,
                     "duration": round(time.time() - t_idx, 3), "error": False}
                )
            except Exception as e:  # per-index isolation (loader.py:185-198)
                logger.error("Error processing index %s: %s. Skipping.", name, e)
                self.index_stats.append(
                    {"index_name": name, "document_count": "ERROR",
                     "duration": round(time.time() - t_idx, 3), "error": True}
                )
        summary = {
            "total_time": round(time.time() - t0, 3),
            "index_stats": self.index_stats,
            "query_timings": dict(
                sorted(self.query_timings.items(), key=lambda kv: -kv[1])
            ),
        }
        out_dir = self.config.get("output_dir")
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            with open(os.path.join(out_dir, "load_summary.json"), "w") as f:
                json.dump(summary, f, indent=2)
        return summary

    def _process_index(self, index_config: dict) -> int:
        name = index_config.get("index_name")
        if not name:
            raise ValueError("index_name is required in index configuration")
        itype = index_config.get("type")
        if itype == "about_file":
            return self._process_about_index(index_config)
        if itype == "model":
            return self._process_model_index(index_config)
        return self._process_query_index(index_config)

    def _index_dir(self, name: str) -> str:
        out = self.config.get("output_dir") or "."
        return os.path.join(out, name)

    def _build(self, name: str, docs: DataFrame, id_col: str,
               text_cols: list[str], mapping: dict | None) -> int:
        if mapping is not None:
            enforce_mapping(docs, mapping)
        corpus = _docs_to_corpus(docs, id_col, text_cols)
        manifest = build_index(self.spark, corpus, self._index_dir(name))
        # stored fields: keep the original document table alongside the index
        docs.write.mode("overwrite").parquet(
            os.path.join(self._index_dir(name), "stored_fields")
        )
        return manifest["N"]

    def _process_about_index(self, index_config: dict) -> int:
        name = index_config["index_name"]
        mapping = (
            parse_grouped_mapping(index_config["mapping"])
            if index_config.get("mapping")
            else None  # reference default mapping is install-side; ours is open
        )
        about_file = self.config.get("about_file")
        if not about_file:
            logger.warning('"about_file" not set; %s will not be loaded', name)
            return 0
        docs = load_about_pages(self.spark, about_file)
        return self._build(name, docs, "doc_id", ["title", "content"], mapping)

    def _process_model_index(self, index_config: dict) -> int:
        name = index_config["index_name"]
        subtype = index_config.get("subtype")
        if not self.model:
            logger.warning('"model_files" not set; %s will not be loaded', name)
            return 0
        if not subtype:
            logger.warning('no "subtype" for model index %s; not loaded', name)
            return 0
        docs = model_documents(self.spark, self.model, subtype)
        text_cols = [c for c in docs.columns if c != "doc_id"]
        return self._build(name, docs, "doc_id", text_cols, None)

    def _process_query_index(self, index_config: dict) -> int:
        name = index_config["index_name"]
        t0 = time.time()
        # initial query ALWAYS runs completely, even in test mode
        # (loader.py:587-593)
        docs = self._read_source(index_config["query"], limit_one_page=False)
        mapping = (
            parse_grouped_mapping(index_config["mapping"])
            if index_config.get("mapping")
            else None
        )
        id_col = index_config.get("id_field", "doc_id")
        text_cols = index_config.get(
            "text_fields", [c for c in docs.columns if c != id_col]
        )
        n = self._build(name, docs, id_col, text_cols, mapping)
        self.query_timings[f"{name}:Initial Query"] = round(time.time() - t0, 3)

        # ordered update queries (loader.py:645-653): each becomes a delta
        # segment with doc_as_upsert=False semantics (unknown keys dropped
        # and counted); test_mode limits each to one page (:868-878)
        for qi, uq in enumerate(index_config.get("update_queries", [])):
            tq = time.time()
            upd = self._read_source(uq, limit_one_page=self.config.test_mode)
            upd_corpus = _docs_to_corpus(upd, id_col, text_cols)
            build_delta_segment(
                self.spark,
                self._index_dir(name),
                upd_corpus,
                segment=f"seg-update-{qi:06d}",
                upsert=False,
            )
            self.query_timings[
                f"{name}:Update Query {qi}"
            ] = round(time.time() - tq, 3)

        # optional post-update compaction (CLI --compact): fold the delta
        # segments back into one, the LSM merge the reference leaves to
        # OpenSearch's own segment merging
        if self.config.get("compact") and index_config.get("update_queries"):
            from opensearch_loader_spark.operators.merge import compact_segments

            tq = time.time()
            compact_segments(self.spark, self._index_dir(name))
            self.query_timings[f"{name}:Compaction"] = round(time.time() - tq, 3)
        return n
