from .windows import latest_with_ties, stripe_group_id, tail_n_per_key  # noqa: F401
from .merge import dedup_batch, idempotent_append  # noqa: F401
from .stringagg import sorted_string_agg  # noqa: F401
from .fallback import filter_with_fallback  # noqa: F401
from .retention import retention_cutoff, apply_retention  # noqa: F401
