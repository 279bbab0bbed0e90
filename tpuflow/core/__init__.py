from tpuflow.core import borders, color, config, io  # noqa: F401
