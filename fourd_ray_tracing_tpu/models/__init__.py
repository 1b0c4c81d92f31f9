from fourd_ray_tracing_tpu.models.scene import Scene, intersect_scene
from fourd_ray_tracing_tpu.models import library, renderer

__all__ = ["Scene", "intersect_scene", "library", "renderer"]
