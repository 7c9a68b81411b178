from .norm import rms_norm  # noqa: F401
from .rope import apply_rope  # noqa: F401
from .matmul import qmatmul  # noqa: F401
