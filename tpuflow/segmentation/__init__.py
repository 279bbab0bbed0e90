from tpuflow.segmentation.meanshift import (  # noqa: F401
    SegmentationResult,
    mean_shift_filter,
    segment_meanshift,
    segment_meanshift_async,
)
