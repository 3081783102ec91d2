from .engine import MultiStreamEngine, StepOutput, StreamState
from .session import MultiStreamSession

__all__ = ["MultiStreamEngine", "StepOutput", "StreamState", "MultiStreamSession"]
