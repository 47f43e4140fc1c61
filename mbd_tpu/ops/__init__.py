from . import rollout_pallas  # noqa: F401
