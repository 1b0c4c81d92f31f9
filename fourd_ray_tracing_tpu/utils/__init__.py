from fourd_ray_tracing_tpu.utils.config import Properties, AppConfig

__all__ = ["Properties", "AppConfig"]
