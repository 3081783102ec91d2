from .cohort import CohortScheduler, HopTiming
from .engine import MultiStreamEngine, StepOutput, StreamState
from .mesh import initialize_distributed, provision_devices, streams_mesh
from .session import MultiStreamSession

__all__ = [
    "CohortScheduler",
    "HopTiming",
    "MultiStreamEngine",
    "StepOutput",
    "StreamState",
    "MultiStreamSession",
    "initialize_distributed",
    "provision_devices",
    "streams_mesh",
]
