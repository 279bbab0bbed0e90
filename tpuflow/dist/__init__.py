from tpuflow.dist.mesh import make_mesh, mesh_factor  # noqa: F401
from tpuflow.dist.halo import halo_pad_2d, shift_along  # noqa: F401
