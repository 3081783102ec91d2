from .rx import Observable, Observer, Subject, ops
from .sources import (
    AppleDeviceAudioSource,
    AudioSource,
    FileAudioSource,
    IteratorAudioSource,
    MicrophoneAudioSource,
    TorchStreamAudioSource,
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
    "TorchStreamAudioSource",
    "AppleDeviceAudioSource",
    "PredictionAccumulator",
    "RTTMWriter",
    "StreamingPlot",
    "WindowClosedException",
    "Benchmark",
    "Parallelize",
    "StreamingInference",
]
