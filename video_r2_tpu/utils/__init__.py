from .metrics_log import MetricsLogger
from .profiling import PhaseTimer, profile_trace, profiling_phase

__all__ = ["MetricsLogger", "PhaseTimer", "profile_trace", "profiling_phase"]
