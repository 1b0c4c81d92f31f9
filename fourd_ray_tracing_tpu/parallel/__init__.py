from fourd_ray_tracing_tpu.parallel.mesh import (
    RAYS_AXIS,
    SAMPLES_AXIS,
    make_mesh,
    sharded_render_image,
    sharded_render_light,
)

__all__ = [
    "RAYS_AXIS",
    "SAMPLES_AXIS",
    "make_mesh",
    "sharded_render_image",
    "sharded_render_light",
]
