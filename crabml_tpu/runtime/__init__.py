from .runner import Runner  # noqa: F401
from .sampler import Sampler  # noqa: F401
