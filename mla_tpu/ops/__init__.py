from mla_tpu.ops import attention, chamfer, pointops, projection, rope

__all__ = ["attention", "chamfer", "pointops", "projection", "rope"]
