from .constants import GGMLType, GGUFValueType, QK_K, tensor_nbytes  # noqa: F401
from .reader import GGUFError, GGUFFile, GGUFMetadata, GGUFTensorInfo  # noqa: F401
from .writer import GGUFWriter  # noqa: F401
