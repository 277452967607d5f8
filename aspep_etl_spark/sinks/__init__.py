from .publish import write_canonical_store, write_json_array, gzip_publish  # noqa: F401
