from mla_tpu.serving.server import BatchingServer, QueueFull, ServeRequest  # noqa: F401
