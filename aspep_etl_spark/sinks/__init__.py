from .publish import (  # noqa: F401
    gzip_publish,
    publish_dir,
    write_canonical_store,
    write_json_array,
)
