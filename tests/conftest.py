import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from opensearch_loader_spark.session import get_spark

    s = get_spark("osls-tests", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    from opensearch_loader_spark.corpus import make_corpus_df

    return make_corpus_df(spark, n_docs=200, seed=42).cache()


@pytest.fixture(scope="session")
def tiny_index(spark, tiny_corpus, tmp_path_factory):
    from opensearch_loader_spark.indexer import build_index

    d = str(tmp_path_factory.mktemp("index"))
    manifest = build_index(
        spark, tiny_corpus, d, n_buckets=8, block_size=16, rows_per_run=40
    )
    return d, manifest
