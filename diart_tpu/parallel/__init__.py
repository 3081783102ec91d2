from .engine import MultiStreamEngine, StepOutput, StreamState
from .mesh import provision_devices, streams_mesh
from .session import MultiStreamSession

__all__ = [
    "MultiStreamEngine",
    "StepOutput",
    "StreamState",
    "MultiStreamSession",
    "provision_devices",
    "streams_mesh",
]
