from .codecs import dequantize, quantize  # noqa: F401
