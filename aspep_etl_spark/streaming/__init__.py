from .events import hourly_rollup_batch, run_streaming_rollup, sessionize  # noqa: F401
