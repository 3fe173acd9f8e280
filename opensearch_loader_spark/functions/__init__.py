from opensearch_loader_spark.functions.varbyte import (  # noqa: F401
    delta_decode,
    delta_encode,
    varbyte_decode,
    varbyte_encode,
)
from opensearch_loader_spark.functions.bm25 import (  # noqa: F401
    bm25_idf,
    bm25_term_score,
    tf_norm_bound,
)
