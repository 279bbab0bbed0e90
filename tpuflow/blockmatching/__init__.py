from tpuflow.blockmatching.matcher import (  # noqa: F401
    BlockMatchResult,
    block_matching_bidirectional,
    block_matching_labels,
    grid_labels,
)
