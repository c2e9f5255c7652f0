"""Structured Streaming surface.

The reference is a batch OLAP extension — it ships no streaming operators
(SURVEY.md §2.0). Every scalar/predicate function in this engine is
stateless, so the whole ST_* surface works under Structured Streaming
unchanged; this module packages the canonical streaming shapes:

  * streaming_envelope_counts — windowed geofence counts with watermarking
  * streaming_session_dedup   — stateful streaming dedup by content
    fingerprint (applyInPandasWithState)
"""

from .demo import (  # noqa: F401
    streaming_envelope_counts,
    streaming_extent_agg,
    streaming_ivf_probe,
    streaming_minhash_probe,
    streaming_session_dedup,
    streaming_sessionize,
    streaming_tagged_transform,
)
