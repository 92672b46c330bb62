from advanced_cpu_raytracing_tpu.scene.xml_parser import load_scene  # noqa: F401
from advanced_cpu_raytracing_tpu.scene.types import SceneConfig  # noqa: F401
