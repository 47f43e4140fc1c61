"""Backend pinning for the measurement CLIs.

This box's ``sitecustomize`` registers the axon TPU plugin and the
environment pins ``JAX_PLATFORMS=axon``, so the env var alone cannot
select the CPU backend — the pin must happen through ``jax.config``
before first backend use. The harness tools take ``--platform cpu`` to
route a re-measure onto the host CPU when the TPU tunnel is down; every
result row records ``jax.default_backend()`` so the evidence says where
it was measured.
"""

from __future__ import annotations


def enable_persistent_cache(path: str | None = None) -> None:
    """Point jax at the repo's persistent compilation cache.

    On this box XLA compiles happen on the remote end of the axon tunnel
    (minutes-class for humanoid-shape programs), so every CLI that can
    re-run the same program shape must reuse compiled executables across
    invocations. bench.py and the tools/ harnesses already do this;
    calling it here gives the planner/RL CLIs the same behavior.
    """
    import os

    import jax

    if path is None:
        path = os.path.abspath(os.path.join(
            os.path.dirname(__file__), "..", "..", ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def force_platform(platform: str | None, n_cpu_devices: int = 0) -> None:
    """Pin the jax platform (must run before any backend use).

    ``platform`` empty/None = keep the environment default (axon TPU
    here). ``n_cpu_devices`` > 0 additionally splits the host into a
    virtual CPU mesh (the sharding-test topology).
    """
    if not platform:
        return
    import jax

    jax.config.update("jax_platforms", platform)
    if platform == "cpu" and n_cpu_devices:
        jax.config.update("jax_num_cpu_devices", n_cpu_devices)
