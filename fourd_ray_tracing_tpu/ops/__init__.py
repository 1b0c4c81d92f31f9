from fourd_ray_tracing_tpu.ops.vec4 import Vec3, Vec4
from fourd_ray_tracing_tpu.ops import rng, sampler, geometry, sky

__all__ = ["Vec3", "Vec4", "rng", "sampler", "geometry", "sky"]
