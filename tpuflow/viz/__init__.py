from tpuflow.viz.quiver import plot_quiver  # noqa: F401
from tpuflow.viz.colorwheel import flow_to_color  # noqa: F401
from tpuflow.viz.plot2d import plot_segments, superimpose  # noqa: F401
from tpuflow.viz.plot3d import (  # noqa: F401
    ParticleState,
    galaxy_step,
    gravity_step,
    render_scene,
)
