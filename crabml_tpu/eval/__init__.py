"""Model-quality evaluation: perplexity + quant-scheme comparison."""

from .perplexity import perplexity, quant_sweep

__all__ = ["perplexity", "quant_sweep"]
