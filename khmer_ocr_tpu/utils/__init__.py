from .logging import setup_logging
from .profiling import profile_trace, stage_timer, StageTimes

__all__ = ["setup_logging", "profile_trace", "stage_timer", "StageTimes"]
