from tpuflow.utils.telemetry import (  # noqa: F401
    EnergyTrace,
    Telemetry,
    get_telemetry,
    trace_span,
)
