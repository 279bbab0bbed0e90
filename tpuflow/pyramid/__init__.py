from tpuflow.pyramid.pyramid import (  # noqa: F401
    add_vector_offset,
    dt_pyramid,
    grad_pyramid,
    level_down,
    pyramid_sizes,
    pyramider,
)
