"""Environment registry (reference parity: mbd/envs/__init__.py:13-33)."""

from .base import Env, State  # noqa: F401


def get_env(env_name: str):
    if env_name == "car2d":
        from .car2d import Car2d
        return Car2d()
    if env_name == "hopper":
        from .hopper import Hopper
        return Hopper()
    if env_name == "walker2d":
        from .walker2d import Walker2d
        return Walker2d()
    if env_name == "cartpole":
        from .cartpole import Cartpole
        return Cartpole()
    if env_name == "humanoidrun":
        from .humanoidrun import HumanoidRun
        return HumanoidRun()
    if env_name == "humanoidstandup":
        from .humanoidstandup import HumanoidStandup
        return HumanoidStandup()
    if env_name == "humanoidtrack":
        from .humanoidtrack import HumanoidTrack
        return HumanoidTrack()
    if env_name == "humanoidtrack_walk":
        # the reference ships walk_xref alongside jog but never loads it
        # (mbd/envs/humanoidtrack.py:33 hardcodes "jog"); same env, walk clip
        from .humanoidtrack import HumanoidTrack
        return HumanoidTrack(mode="walk")
    if env_name == "pushT":
        from .pushT import PushT
        return PushT()
    if env_name == "ant":
        from .ant import Ant
        return Ant()
    if env_name == "halfcheetah":
        from .halfcheetah import Halfcheetah
        return Halfcheetah()
    raise ValueError(f"Unknown environment: {env_name}")
