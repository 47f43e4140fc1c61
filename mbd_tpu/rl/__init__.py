from . import networks, ppo, sac, wrappers  # noqa: F401
