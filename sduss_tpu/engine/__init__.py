from sduss_tpu.engine.async_engine import AsyncEngine, AsyncEngineDeadError, AsyncStream  # noqa: F401
from sduss_tpu.engine.engine import Engine  # noqa: F401
from sduss_tpu.engine.worker import Worker  # noqa: F401
