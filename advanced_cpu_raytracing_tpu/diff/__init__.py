from advanced_cpu_raytracing_tpu.diff.params import (  # noqa: F401
    extract_params,
    inject_params,
)
