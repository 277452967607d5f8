from .enrich import enrich_with_dim, run_stream_upsert  # noqa: F401
from .events import hourly_rollup_batch, run_streaming_rollup, sessionize  # noqa: F401
