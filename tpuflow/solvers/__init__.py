from tpuflow.solvers.horn_schunck import (  # noqa: F401
    horn_schunck,
    horn_schunck_classic,
    hs_gradients,
)
