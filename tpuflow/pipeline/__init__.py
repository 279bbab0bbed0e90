from tpuflow.pipeline.metrics import angular_error, epe  # noqa: F401
