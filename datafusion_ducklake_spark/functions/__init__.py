"""Training-data pipeline operators, layered over the same engine.

Beyond the reference's own surface (its roadmap stops at lakehouse reads/
writes), these are the operations a 100 TB LLM-data pipeline needs:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search (brute-force + LSH-bucketed ANN), text analysis
(tokens, quality, language ID, fingerprints), and multimodal column
plumbing (binary payloads + mapInPandas decode stages).

Everything is built from JVM-side built-ins and higher-order functions —
no Python UDFs in any hot path except the (stubbed) multimodal decoders,
which are Arrow-batched mapInPandas by design.
"""

from . import dedup, multimodal, similarity, text  # noqa: F401
