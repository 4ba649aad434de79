"""Large-scale training-data pipeline operators.

Beyond the reference's telemetry surface: deduplication, similarity
search, text analysis, and multimodal-column plumbing — the operations
a 100 TB LLM-data pipeline runs on Spark.
"""

from lakerunner_spark.dataops.dedup import (  # noqa: F401
    exact_dedup_stats,
    shingles,
    minhash_signatures,
    lsh_candidates,
    jaccard_verify,
    simhash,
)
from lakerunner_spark.dataops.similarity import cosine_topk  # noqa: F401
from lakerunner_spark.dataops.text import (  # noqa: F401
    text_stats,
    quality_score,
    langid_heuristic,
    structural_fingerprint,
)
