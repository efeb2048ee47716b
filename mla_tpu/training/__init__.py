from mla_tpu.training import metrics, optim, strategy

__all__ = ["metrics", "optim", "strategy"]
