from mla_tpu.serving.server import BatchingServer, ServeRequest  # noqa: F401
