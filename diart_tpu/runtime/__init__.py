from .rx import Observable, Observer, Subject, ops
from .sources import (
    AppleDeviceAudioSource,
    AudioSource,
    FFmpegAudioSource,
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
from .operators import (
    SlidingChunker,
    accumulate_output,
    buffer_output,
    buffer_slide,
    rearrange_audio_stream,
)

__all__ = [
    "Observable",
    "Observer",
    "Subject",
    "ops",
    "AudioSource",
    "FFmpegAudioSource",
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
    "SlidingChunker",
    "rearrange_audio_stream",
    "buffer_slide",
    "accumulate_output",
    "buffer_output",
]
