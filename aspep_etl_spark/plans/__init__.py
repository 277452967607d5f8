from .pipeline import derive_extended_stats, derive_stats, normalize_fact  # noqa: F401
