from tpuflow.features.hog import (  # noqa: F401
    block_normalize,
    block_normalize_integral,
    compute_hog,
    hog_descriptor,
    hog_matching,
    orientation,
)
