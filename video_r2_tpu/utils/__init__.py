from .profiling import PhaseTimer, profile_trace, profiling_phase

__all__ = ["PhaseTimer", "profile_trace", "profiling_phase"]
