"""Python UDTFs for the SQL front door (Spark 4 user-defined table
functions).

The DataFrame chunking operator (``curation.chunk_documents``) is the
hot path — pure JVM ``sequence``/``explode``/``substring``, no Python.
This module exposes the SAME semantics to the SQL-only audience as a
lateral-joinable table function::

    SELECT d.doc_id, c.* FROM documents d,
    LATERAL chunk_docs(d.text, 500, 100) c

UDTFs evaluate in Python (Arrow-batched transfer with
``useArrow=True``), so this is the convenience surface, not the scale
surface — the docstring contract (identical rows to
``chunk_documents``) is pinned by a differential test, and a SQL user
who outgrows it switches to the view-over-DataFrame route with no
semantic change.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf
from pyspark.sql.session import SparkSession


@udtf(
    returnType="chunk_off int, chunk_text string, chunk_len int",
    useArrow=True,
)
class ChunkDocsUDTF:
    """Overlapping-window chunker: mirrors
    ``curation.chunk_documents`` row-for-row (stride = size − overlap,
    last window anchored so every position is covered, empty text
    yields no rows)."""

    def eval(self, text: str, size: int = 500, overlap: int = 100):
        if text is None or len(text) == 0:
            return
        if not 0 <= overlap < size:
            raise ValueError("need 0 <= overlap < size")
        stride = size - overlap
        last = max(len(text) - overlap, 1) - 1
        for off in range(0, last + 1, stride):
            chunk = text[off : off + size]
            yield off, chunk, len(chunk)


def register_udtfs(spark: SparkSession) -> list[str]:
    """Publish the UDTF surface alongside ``sql_frontdoor.register_views``."""
    spark.udtf.register("chunk_docs", ChunkDocsUDTF)
    return ["chunk_docs"]
