from tpuflow.solvers.horn_schunck import (  # noqa: F401
    horn_schunck,
    horn_schunck_classic,
    hs_gradients,
)
from tpuflow.solvers.black_anandan import (  # noqa: F401
    irls_energy,
    irls_grad,
    irls_optical_flow_level,
    irls_sup,
    optical_flow_pyramid,
)
from tpuflow.solvers.affine import (  # noqa: F401
    affine_flow_field,
    multiple_motion_affine,
)
from tpuflow.solvers.black_anandan_fast import (  # noqa: F401
    optical_flow_pyramid_fast,
)
from tpuflow.solvers.farneback import calc_optical_flow_farneback  # noqa: F401
from tpuflow.solvers.lucas_kanade import (  # noqa: F401
    accept_tracked_point,
    dense_lucas_kanade,
    good_features_to_track,
    track_points,
)
from tpuflow.solvers.mestimators import (  # noqa: F401
    geman_mcclure_psi,
    geman_mcclure_rho,
    lorentzian_psi,
    lorentzian_rho,
)
from tpuflow.solvers.bm_flow import (  # noqa: F401
    affine_parametric_flow,
    gradient_method_flow,
    optical_flow_block_matching,
    optical_flow_block_matching_async,
)
