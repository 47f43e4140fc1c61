from . import collision, contact, dynamics, kinematics, pipeline, system  # noqa: F401
from .pipeline import PipelineState, pipeline_init, pipeline_step  # noqa: F401
from .system import System, load_mjcf  # noqa: F401
