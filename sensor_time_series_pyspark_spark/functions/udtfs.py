"""Python UDTF surface (Spark 4 `pyspark.sql.functions.udtf`) — the
row-to-table seam for logic that genuinely multiplies rows in Python.

The engine's stance (SCALING.md): UDTFs are the SLOW path — every
JVM-expressible fan-out in this repo is array algebra + explode
(operators/chunking.py) or mapInPandas (operators/multimodal.py). This
module exists because the reference-capable surface should still OFFER
the UDTF contract for users porting imperative row-expanders; the
parity test (tests/test_round3c_ops.py) pins that the UDTF and the
column-algebra twin produce identical rows, so migrating off the slow
path is a proven no-op.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, start int, n_tokens int, chunk_text string")
class ChunkSpansUDTF:
    """Split one document's text into disjoint ``chunk_size``-token
    chunks — the imperative twin of operators/chunking.py:chunk_tokens
    (same outputs for stride == chunk_size)."""

    def eval(self, text: str, chunk_size: int):  # noqa: D102
        if text is None or chunk_size is None or chunk_size <= 0:
            return
        toks = [t for t in text.split() if t]
        for i, start in enumerate(range(0, len(toks), chunk_size)):
            window = toks[start:start + chunk_size]
            yield i, start, len(window), " ".join(window)


def register_udtfs(spark) -> None:
    """Register the UDTF surface for SQL use:
    ``SELECT d.doc_id, c.* FROM docs d,
    LATERAL chunk_spans(d.text, 64) c``."""
    spark.udtf.register("chunk_spans", ChunkSpansUDTF)
