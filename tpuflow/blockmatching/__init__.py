from tpuflow.blockmatching.matcher import (  # noqa: F401
    BlockMatchResult,
    block_matching_bidirectional,
    block_matching_labels,
    grid_labels,
)
from tpuflow.blockmatching.prewarm import (  # noqa: F401
    neighbor_buckets,
    prewarm_flagship,
)
