from tpuflow.dist.mesh import make_mesh, mesh_factor  # noqa: F401
from tpuflow.dist.halo import halo_pad_2d, shift_along  # noqa: F401
from tpuflow.dist.solvers import (  # noqa: F401
    horn_schunck_sharded,
    horn_schunck_sharded_fused,
    irls_level_sharded,
    irls_level_sharded_fused,
)
from tpuflow.dist.pyramid import optical_flow_pyramid_sharded  # noqa: F401
from tpuflow.dist.scaling import weak_scaling_report  # noqa: F401
from tpuflow.dist.farneback import farneback_sharded  # noqa: F401
from tpuflow.dist.bm import block_matching_labels_sharded  # noqa: F401
from tpuflow.dist.bm_refine import (  # noqa: F401
    affine_parametric_flow_sharded,
    gradient_method_flow_sharded,
    gradient_method_flow_sharded_bidirectional,
)
from tpuflow.dist.ops import (  # noqa: F401
    conv2d_sharded,
    detect_scratch_sharded,
    epsilon_filter_sharded,
    filterer_sharded,
    gaussian_filter_sharded,
    hog_matching_sharded,
    horizontal_median_sharded,
)
