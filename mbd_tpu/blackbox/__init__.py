from . import bbo, mnist  # noqa: F401
