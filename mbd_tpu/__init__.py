"""mbd_tpu — a TPU-native Model-Based Diffusion trajectory-optimization
framework.

A from-scratch re-design of the capabilities of
LeCAR-Lab/model-based-diffusion for TPU hardware: a batched generalized-
coordinate rigid-body engine (dense masked-einsum FK/CRBA/RNEA + penalty
contacts) feeding a fused reverse-diffusion planner, with the sample axis
sharded over an ICI device mesh.
"""

__version__ = "0.1.0"

from . import core, envs, planners, rollout, parallel  # noqa: F401
