from tpuflow.ops.filters import (  # noqa: F401
    box_filter,
    conv2d,
    epsilon_filter,
    filterer,
    gaussian_filter,
    gaussian_kernel,
    horizontal_median,
    sep_conv2d,
)
from tpuflow.ops.derivatives import (  # noqa: F401
    derivation_abs,
    derivative_angler,
    derivator,
    sobel_opencv,
)
