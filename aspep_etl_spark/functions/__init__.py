from .scalar import (  # noqa: F401
    classify_state_scope,
    cleanse_numeric,
    max_abs_numeric,
    normalize_dim,
    safe_ratio,
    slugify_expr,
    slugify_py,
    upper_code,
)
