"""Sanctioned Python API surfaces, kept OUT of hot paths and proven
equivalent to their codegen twins.

The engine rule is "UDFs are the slow path": every relational operator is
pyspark.sql built-ins inside whole-stage codegen.  But the Spark Python
surfaces exist for logic that genuinely needs imperative code, and the
engine proves it knows them rather than avoiding them blindly:

- grouped ``applyInPandas``      — queries/analytics_q.pandas_minmax_norm
  (measured ~12× its codegen twin minmax_norm_sql, same oracle)
- cogrouped ``applyInPandas``    — operators/temporal.cogrouped_asof_join
  (equality-tested vs the union-merge as_of_join)
- ``applyInPandasWithState``     — streaming/stateful.sessionize_stream
- Arrow ``mapInPandas``          — operators/multimodal decode seam
- Python UDTF (this module)      — table-function chunker, equality-tested
  vs the codegen chunk_docs grid

A UDTF is Spark 4's lateral table function: one input row → many output
rows from a Python generator.  The codegen twin (sequence()+explode+slice
in queries/curation3_q.chunk_docs) is the hot-path form; this exists as
the API-surface proof and the template for chunkers that need a real
tokenizer library (where Python is unavoidable and the UDTF shape — row in,
chunk rows out — is exactly right).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

CHUNK, STRIDE = 64, 48


@udtf(returnType="chunk_idx bigint, n_chunk_tokens bigint, chunk_text string")
class ChunkDocUDTF:
    """Yield sliding (CHUNK, STRIDE) token windows of one document."""

    def eval(self, text: str):  # noqa: D102 - UDTF contract method
        toks = (text or "").split(" ")
        n = len(toks)
        n_chunks = 1 if n <= CHUNK else 1 + -(-(n - CHUNK) // STRIDE)
        for i in range(n_chunks):
            window = toks[i * STRIDE : i * STRIDE + CHUNK]
            yield i, len(window), " ".join(window)
