from . import mbd, path_integral  # noqa: F401
from .mbd import MBDConfig  # noqa: F401
from .path_integral import PathIntegralConfig  # noqa: F401
