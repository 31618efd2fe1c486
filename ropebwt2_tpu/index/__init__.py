from .flat import PAD, FlatBwt, empty_state, grow_state  # noqa: F401
from .rank import build_block_tables, rank_global  # noqa: F401
from .merge import apply_insertions  # noqa: F401
