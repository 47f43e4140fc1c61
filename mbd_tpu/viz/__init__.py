from . import html  # noqa: F401
from .html import render, render_states  # noqa: F401
