"""End-to-end loader orchestration — the reference's Loader.load() routing
(loader.py:98-229): a 3-index spec (query / about_file / model), mapping
enforcement, ordered update queries, Config precedence (YAML→env→CLI) and
test_mode one-page limiting (update queries only; initial exempt)."""

import json
import os

import pytest
import yaml

from opensearch_loader_spark.loader import Config, Loader
from opensearch_loader_spark.query_engine import load_index_info, search


@pytest.fixture()
def spec_env(spark, tmp_path):
    """Write data tables + spec + about/model YAMLs; return (config kwargs)."""
    data_dir = tmp_path / "data"
    out_dir = tmp_path / "out"
    data_dir.mkdir()

    rows = [
        (i, f"title {i}", f"body words alpha{i % 7} beta common text", "en" if i % 3 else "de")
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "doc_id long, title string, body string, lang string"
    ).write.parquet(str(data_dir / "articles.parquet"))

    upd_rows = [(i, f"title {i}", "updated gamma body", "en") for i in range(0, 60, 2)]
    spark.createDataFrame(
        upd_rows, "doc_id long, title string, body string, lang string"
    ).write.parquet(str(data_dir / "article_updates.parquet"))

    about = [
        {"page": "home", "title": "Home", "content": "welcome landing page"},
        {"title": "no-page-field, skipped"},
        {"page": "faq", "title": "FAQ", "content": "questions answers"},
    ]
    (tmp_path / "about.yaml").write_text(yaml.safe_dump(about))

    model = {
        "Nodes": {"study": {"Props": ["study_id", "phase"]}},
        "PropDefinitions": {
            "study_id": {"Type": "String", "Key": True},
            "phase": {"Type": {"Enum": ["I", "II"]}},
        },
    }
    (tmp_path / "model.yaml").write_text(yaml.safe_dump(model))

    spec = {
        "indices": [
            {
                "index_name": "articles",
                "query": {"table": "articles", "where": "doc_id < 40"},
                "id_field": "doc_id",
                "text_fields": ["title", "body"],
                "mapping": {
                    "long": ["doc_id"],
                    "text": ["title", "body"],
                    "keyword": ["lang"],
                },
                "update_queries": [{"table": "article_updates"}],
            },
            {"index_name": "about", "type": "about_file"},
            {"index_name": "model_nodes", "type": "model", "subtype": "value"},
        ]
    }
    spec_path = tmp_path / "spec.yaml"
    spec_path.write_text(yaml.safe_dump(spec))
    return {
        "index_spec_file": str(spec_path),
        "about_file": str(tmp_path / "about.yaml"),
        "model_files": [str(tmp_path / "model.yaml")],
        "data_dir": str(data_dir),
        "output_dir": str(out_dir),
    }


def test_loader_three_index_spec(spark, spec_env):
    summary = Loader(spark, Config(yaml_values=spec_env, env={})).load()
    stats = {s["index_name"]: s for s in summary["index_stats"]}
    assert not any(s["error"] for s in stats.values()), stats
    assert stats["articles"]["document_count"] == 40
    assert stats["about"]["document_count"] == 2  # missing-page entry skipped
    assert stats["model_nodes"]["document_count"] == 2  # phase enum I, II

    # update query became an ordered delta segment with upsert=False:
    # 20 updates hit existing doc_ids 0..38 even, 10 (ids 40..58) dropped
    idx = os.path.join(spec_env["output_dir"], "articles")
    info = load_index_info(idx)
    segs = {m["segment"]: m for m in info["segments"]}
    assert "seg-update-000000" in segs
    assert segs["seg-update-000000"]["updated"] == 20
    assert segs["seg-update-000000"]["skipped"] == 10

    # the updated text is searchable; the initial text of updated docs is not
    res = search(spark, idx, [("q", "gamma updated", 5)]).collect()
    assert len(res) == 5

    # about index is searchable by its content
    res = search(
        spark, os.path.join(spec_env["output_dir"], "about"),
        [("q", "welcome landing", 1)], hydrate=True,
    ).collect()
    assert len(res) == 1 and res[0]["url"] == "page0"

    # timings recorded + summary persisted (reference _save_query_timings)
    assert "articles:Initial Query" in summary["query_timings"]
    assert "articles:Update Query 0" in summary["query_timings"]
    assert os.path.exists(os.path.join(spec_env["output_dir"], "load_summary.json"))


def test_loader_selected_indices_and_mapping_rejection(spark, spec_env, tmp_path):
    # selection filters; unknown name warned+ignored (loader.py:114-148)
    cfg = Config(yaml_values={**spec_env, "selected_indices": ["about", "nope"]}, env={})
    summary = Loader(spark, cfg).load()
    assert [s["index_name"] for s in summary["index_stats"]] == ["about"]

    # a query index whose result has unmapped fields is rejected but does not
    # abort the run (per-index isolation, loader.py:600-605)
    spec = yaml.safe_load(open(spec_env["index_spec_file"]))
    spec["indices"][0]["mapping"] = {"long": ["doc_id"], "text": ["title"]}
    bad = tmp_path / "bad_spec.yaml"
    bad.write_text(yaml.safe_dump(spec))
    cfg = Config(
        yaml_values={**spec_env, "index_spec_file": str(bad),
                     "selected_indices": ["articles"]},
        env={},
    )
    summary = Loader(spark, cfg).load()
    assert summary["index_stats"][0]["error"] is True


def test_config_precedence_and_test_mode(spark, spec_env):
    # YAML < env < CLI (reference config.py:18-43)
    cfg = Config(
        yaml_values={"page_size": 7, "test_mode": False},
        env={"OSLS_PAGE_SIZE": "11", "OSLS_TEST_MODE": "true"},
        cli={"page_size": 5},
    )
    assert cfg.page_size == 5  # CLI wins
    assert cfg.test_mode is True  # env wins over yaml

    # test_mode limits UPDATE queries to one page; initial query runs fully.
    # page_size=25 (< the 30 update rows): df.limit picks arbitrary rows, but
    # at most 10 of the 30 have unknown keys, so ≥15 always match and the
    # delta segment always materializes.
    cfg = Config(
        yaml_values={**spec_env, "selected_indices": ["articles"],
                     "test_mode": True, "page_size": 25},
        env={},
    )
    summary = Loader(spark, cfg).load()
    assert summary["index_stats"][0]["document_count"] == 40  # initial: full
    idx = os.path.join(spec_env["output_dir"], "articles")
    seg = [
        m for m in load_index_info(idx)["segments"]
        if m["segment"] == "seg-update-000000"
    ][0]
    assert seg["updated"] + seg["skipped"] == 25  # one page only


def test_load_job_cli(spark, spec_env, capsys):
    """scripts/load_job.py: CLI flags override spec config; exit 0 on clean
    run; summary JSON on stdout (reference cli.py analogue)."""
    import scripts.load_job as job

    rc = job.main(
        ["--spec", spec_env["index_spec_file"],
         "--output-dir", spec_env["output_dir"],
         "--data-dir", spec_env["data_dir"],
         "--about-file", spec_env["about_file"],
         "--model-files", spec_env["model_files"][0],
         "--indices", "articles,about"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    import json as _json

    summary = _json.loads(out[out.index("{"):])
    assert [s["index_name"] for s in summary["index_stats"]] == ["articles", "about"]
