from strling_tpu.ops import encode  # noqa: F401
