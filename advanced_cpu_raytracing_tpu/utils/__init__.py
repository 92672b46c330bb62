from advanced_cpu_raytracing_tpu.utils import math3d, transforms  # noqa: F401
