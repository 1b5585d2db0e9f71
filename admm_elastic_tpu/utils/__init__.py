from .checkpoint import save_state, load_state
from .profiling import Timer, trace

__all__ = ["save_state", "load_state", "Timer", "trace"]
