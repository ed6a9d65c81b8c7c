"""LLM-training-data pipeline operators: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard), similarity search over embeddings, text
analysis (language-ID, quality, token counts, fingerprints).
"""

from __future__ import annotations
