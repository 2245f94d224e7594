from .checkpoint import CheckpointManager  # noqa: F401
from .visualizer import Visualizer  # noqa: F401
