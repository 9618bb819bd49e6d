from .batcher import MicroBatcher  # noqa: F401
