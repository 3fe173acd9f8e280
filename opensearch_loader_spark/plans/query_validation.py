"""Read-only query lint — reference memgraph_client.py:12-15, 42-95.

Kept for SQL-passthrough mode: the engine itself is read-only by
construction, but user-supplied SQL/Cypher-ish strings run through the same
guard the reference applies before sending anything to the database.
"""

from __future__ import annotations

import re

WRITE_KEYWORDS = [
    "CREATE", "SET", "DELETE", "REMOVE", "MERGE", "DETACH", "DROP", "FOREACH",
    # SQL-side additions for passthrough mode
    "INSERT", "UPDATE", "TRUNCATE", "ALTER",
]


class QueryValidationError(ValueError):
    pass


def validate_read_only(query: str) -> None:
    """Reject queries containing write keywords (word-boundary match on the
    upper-cased text, memgraph_client.py:54-66); require a read verb."""
    if not query or not query.strip():
        raise QueryValidationError("empty query")
    upper = query.upper()
    for kw in WRITE_KEYWORDS:
        if re.search(rf"\b{kw}\b", upper):
            raise QueryValidationError(f"write keyword not allowed: {kw}")
    if not re.search(r"\b(MATCH|RETURN|SELECT|WITH)\b", upper):
        raise QueryValidationError("query must contain a read clause")


def validate_predicate(pred: str) -> None:
    """Write-keyword lint for a bare filter predicate (loader spec `where`
    clauses): same guard as validate_read_only minus the read-clause
    requirement — a predicate has no read verb of its own."""
    if not pred or not pred.strip():
        raise QueryValidationError("empty predicate")
    upper = pred.upper()
    for kw in WRITE_KEYWORDS:
        if re.search(rf"\b{kw}\b", upper):
            raise QueryValidationError(f"write keyword not allowed: {kw}")


def validate_pagination_params(query: str) -> None:
    """Reference requires literal $skip/$limit (memgraph_client.py:74-95);
    kept as a spec lint for paging-emulation mode."""
    if "$skip" not in query or "$limit" not in query:
        raise QueryValidationError("paginated query must contain $skip and $limit")
