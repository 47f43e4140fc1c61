from . import profiling  # noqa: F401
from .profiling import Timer, trace  # noqa: F401
