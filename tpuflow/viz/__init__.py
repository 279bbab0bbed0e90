from tpuflow.viz.quiver import plot_quiver  # noqa: F401
from tpuflow.viz.colorwheel import flow_to_color  # noqa: F401
