"""Document chunking: split long documents into fixed-size, optionally
overlapping token windows — the step before embedding / retrieval
indexing (RAG chunkers, long-context preprocessing).

Chunk i of a doc covers tokens [i*stride, i*stride + chunk_size) with
stride = chunk_size - overlap; the last chunk is the final (possibly
short) remainder window, and a doc shorter than chunk_size yields
exactly one chunk.  Chunk starts are therefore 0, stride, 2*stride, ...
up to the last start < n_tokens (empty docs yield no chunks).

Scale shape: pure Catalyst — tokenize once (`split`), then
``sequence``/``slice``/``posexplode`` generate the windows JVM-side
inside whole-stage codegen.  No UDF, no shuffle: chunking is a flat-map
over the scan, and downstream embedding jobs partition by (doc_id,
chunk_id) for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 128,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode each doc into (doc_id, chunk_id, start_tok, n_tokens,
    chunk_text) rows of whitespace-token windows."""
    if chunk_size <= 0:
        raise ValueError("chunk_documents: chunk_size must be > 0")
    if not (0 <= overlap < chunk_size):
        raise ValueError("chunk_documents: need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    # starts: 0, stride, ..., stopping once the PREVIOUS chunk already
    # reached the end of the doc — chunk i only exists if it adds tokens
    # beyond chunk i-1's coverage, i.e. (i-1)*stride + chunk_size < n.
    # Last useful start = stride * ceil((n - chunk_size) / stride); a doc
    # with n <= chunk_size yields exactly one chunk.
    last_start = F.lit(stride) * F.ceil(
        (n - F.lit(chunk_size)) / F.lit(float(stride))
    ).cast("int")
    starts = (
        F.when(n <= 0, F.array())
        .when(n <= chunk_size, F.array(F.lit(0)))
        .otherwise(F.sequence(F.lit(0), last_start, F.lit(stride)))
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("__toks"),
        n.alias("__n"),
        starts.alias("__starts"),
    )
    exploded = base.select(
        "doc_id", "__toks", "__n",
        F.posexplode("__starts").alias("chunk_id", "start_tok"),
    )
    window = F.slice(
        F.col("__toks"), F.col("start_tok") + 1,
        F.least(F.lit(chunk_size), F.col("__n") - F.col("start_tok")),
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.size(window).cast("long").alias("n_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )
