from tpuflow.features.hog import (  # noqa: F401
    block_normalize,
    compute_hog,
    hog_descriptor,
    hog_matching,
    orientation,
)
