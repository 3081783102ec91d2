from .rx import Observable, Observer, Subject, ops
from .sources import (
    AudioSource,
    FileAudioSource,
    IteratorAudioSource,
    MicrophoneAudioSource,
    WebSocketAudioSource,
)
from .sinks import (
    PredictionAccumulator,
    RTTMWriter,
    StreamingPlot,
    WindowClosedException,
)
from .inference import Benchmark, Parallelize, StreamingInference

__all__ = [
    "Observable",
    "Observer",
    "Subject",
    "ops",
    "AudioSource",
    "FileAudioSource",
    "IteratorAudioSource",
    "MicrophoneAudioSource",
    "WebSocketAudioSource",
    "PredictionAccumulator",
    "RTTMWriter",
    "StreamingPlot",
    "WindowClosedException",
    "Benchmark",
    "Parallelize",
    "StreamingInference",
]
