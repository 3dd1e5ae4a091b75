from .cache import enable_compilation_cache
from .logging import setup_logging
from .profiling import profile_trace, stage_timer, StageTimes

__all__ = ["enable_compilation_cache", "setup_logging", "profile_trace", "stage_timer", "StageTimes"]
