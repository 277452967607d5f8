from .filters import filter_significant, filter_year_range, point_lookup  # noqa: F401
from .recode import broadcast_dim_join, recode_via_join, recode_values  # noqa: F401
from .setops import sort_canonical, union_by_name  # noqa: F401
from .stats import append_cohort_stats, grouped_stats  # noqa: F401
from .windows import cohort_ranks, signed_delta_ranks, yoy_deltas  # noqa: F401
