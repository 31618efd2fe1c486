from .flat import (  # noqa: F401
    PAD,
    FlatBwt,
    empty_state,
    grow_state,
    state_from_partition_runs,
)
from .rank import build_block_tables, rank_global  # noqa: F401
from .merge import apply_insertions  # noqa: F401
