from advanced_cpu_raytracing_tpu.post.tonemap import reinhard_tonemap  # noqa: F401
