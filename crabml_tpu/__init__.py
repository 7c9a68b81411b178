"""crabml-tpu: a TPU-native GGUF LLM inference engine (JAX/XLA/Pallas).

Built from scratch with the capabilities of the crabml reference engine
(llama.cpp-compatible GGUF inference), re-designed TPU-first: planar quantized
weight layouts, fused dequant+matmul Pallas kernels, single-jit prefill/decode
steps with a fixed-shape donated KV cache, on-device sampling, and
Mesh/NamedSharding tensor parallelism over ICI.
"""

__version__ = "0.1.0"

from .gguf.constants import GGMLType  # noqa: F401
from .gguf.reader import GGUFFile  # noqa: F401


def __getattr__(name):
    # lazy public API: keep `import crabml_tpu` cheap (no jax import)
    if name == "Runner":
        from .runtime.runner import Runner

        return Runner
    if name == "ServingEngine":
        from .serving.engine import ServingEngine

        return ServingEngine
    if name == "ChatSession":
        from .runtime.chat import ChatSession

        return ChatSession
    if name == "Sampler":
        from .runtime.sampler import Sampler

        return Sampler
    raise AttributeError(name)


__all__ = ["GGMLType", "GGUFFile", "Runner", "ServingEngine", "ChatSession", "Sampler"]
