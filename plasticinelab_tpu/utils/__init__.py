from .timer import Timer
from . import profiling

__all__ = ["Timer", "profiling"]
