"""Serving layer: continuous batching engine + HTTP front-end.

`ServingEngine` pools KV-cache slots and advances all active requests with
one compiled decode step per tick; `serving.http.serve` exposes it as an
OpenAI-style completions endpoint. Run directly:

    python -m crabml_tpu.serving.http model.gguf --port 8000
"""

from .engine import Request, ServingEngine
from .paged import PagedServingEngine

__all__ = ["Request", "ServingEngine", "PagedServingEngine"]
