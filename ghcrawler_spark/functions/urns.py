"""URN identity — the reference's hierarchical document keys.

ghcrawler keys every stored document by a URN built from the parent's
qualifier plus (type, id): ``urn:repo:12:commit:<sha>``
(lib/request.js:106-117 getQualifier/createQualifiedUrn;
storage keyed by both URL and URN, providers/storage/inmemoryDocStore.js:24-26).

Here: pure Column expressions + DuckDB SQL twins. The graft's entity
hierarchy is host → page → image, so a stored image doc gets
``urn:host:<host>:page:<page_id>:image:<image_id>``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

URN_PREFIX = "urn"


def child_urn(qualifier: Column | str, child_type: Column | str, child_id: Column | str) -> Column:
    """qualifier + ':' + type + ':' + id (request.js:113-117)."""
    q = F.col(qualifier) if isinstance(qualifier, str) else qualifier
    t = F.col(child_type) if isinstance(child_type, str) else child_type
    i = F.col(child_id) if isinstance(child_id, str) else child_id
    return F.concat_ws(":", q, t, i.cast("string"))


def root_urn(root_type: Column | str, root_id: Column | str) -> Column:
    t = F.col(root_type) if isinstance(root_type, str) else root_type
    i = F.col(root_id) if isinstance(root_id, str) else root_id
    return F.concat_ws(":", F.lit(URN_PREFIX), t, i.cast("string"))


def child_urn_sql(qualifier: str, child_type: str, child_id: str) -> str:
    return f"{qualifier} || ':' || {child_type} || ':' || CAST({child_id} AS VARCHAR)"


def root_urn_sql(root_type: str, root_id: str) -> str:
    return f"'{URN_PREFIX}' || ':' || {root_type} || ':' || CAST({root_id} AS VARCHAR)"


def urn_type(urn: Column | str) -> Column:
    """Second-to-last segment = entity type (request.js getCollectionType
    analog: type is the segment before the id)."""
    u = F.col(urn) if isinstance(urn, str) else urn
    parts = F.split(u, ":")
    return F.element_at(parts, F.size(parts) - 1)


def urn_parent(urn: Column | str) -> Column:
    """Strip the trailing (type, id) pair → parent qualifier."""
    u = F.col(urn) if isinstance(urn, str) else urn
    parts = F.split(u, ":")
    return F.concat_ws(":", F.slice(parts, 1, F.size(parts) - 2))
