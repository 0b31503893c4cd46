from .profiling import profile_trace, StepTimer  # noqa: F401
