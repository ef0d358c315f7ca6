from .checkpoint import Checkpointer
from .profiling import cost_analysis, profile_trace, timed

__all__ = ["Checkpointer", "timed", "profile_trace", "cost_analysis"]
