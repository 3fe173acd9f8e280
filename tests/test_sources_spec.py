import textwrap

from opensearch_loader_spark.sources.spec import (
    load_about_pages,
    load_index_spec,
    parse_env_value,
    select_indices,
)


def test_index_spec_trim(tmp_path):
    p = tmp_path / "spec.yaml"
    p.write_text(
        textwrap.dedent(
            """
            indices:
              - name: "  users  "
                id_field: user_id
                mapping:
                  keyword: [" user_id ", name]
            """
        )
    )
    spec = load_index_spec(str(p))
    idx = spec["indices"][0]
    assert idx["name"] == "users"
    assert idx["mapping"]["keyword"][0] == "user_id"


def test_select_indices():
    avail = ["users", "orders", "about"]
    assert select_indices(avail, None) == avail
    assert select_indices(avail, []) == avail
    assert select_indices(avail, [" users ", "ghost"]) == ["users"]


def test_parse_env_value():
    assert parse_env_value("TRUE", bool) is True
    assert parse_env_value("0", bool) is False
    assert parse_env_value(" 42 ", int) == 42
    assert parse_env_value("a, b ,c", list) == ["a", "b", "c"]


def test_about_pages(spark, tmp_path):
    p = tmp_path / "about.yaml"
    p.write_text(
        textwrap.dedent(
            """
            - page: home
              title: Home
              content: welcome
            - title: orphan (no page field, skipped)
            - page: faq
              title: FAQ
              content: questions
            """
        )
    )
    rows = {r["doc_id"]: r for r in load_about_pages(spark, str(p)).collect()}
    assert set(rows) == {"page0", "page2"}  # numbering keeps original positions
    assert rows["page0"]["page"] == "home"
    assert rows["page2"]["title"] == "FAQ"


def test_prefix_search(spark, tiny_index):
    from opensearch_loader_spark.query_engine import prefix_search

    d, _ = tiny_index
    res = prefix_search(spark, d, "var", k=5).collect()
    assert len(res) == 5  # 'varbyte' is in the core vocab
    res_empty = prefix_search(spark, d, "zzz", k=5).collect()
    assert res_empty == []
