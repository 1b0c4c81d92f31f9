from fourd_ray_tracing_tpu.ops.pallas.megakernel import (
    render_light_pallas,
    render_image_pallas,
)

__all__ = ["render_light_pallas", "render_image_pallas"]
