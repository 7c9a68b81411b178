from .config import ModelConfig, config_from_gguf  # noqa: F401
from .weights import load_weights  # noqa: F401
