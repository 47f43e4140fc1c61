from . import math, schedule  # noqa: F401
from .schedule import make_schedule, DiffusionSchedule  # noqa: F401
