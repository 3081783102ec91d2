from .base import EmbeddingModel, LazyModel, SegmentationModel
from .segmentation import PyanNet
from .embedding import XVectorSincNet, weighted_stats_pool, resample_weights
from .ecapa import EcapaTDNN
from .resnet import ResNet34
from .titanet import TitaNet
from .xvect import XVectorFbank
from .fbank import (
    kaldi_log_mel,
    log_mel_filterbank,
    mel_filter_matrix,
    num_fbank_frames,
    speechbrain_log_mel,
)
from .sincnet import SincNet, SincConv, num_sincnet_frames
from .lstm import BiLSTM
from .powerset import num_powerset_classes, powerset_mapping, to_multilabel

__all__ = [
    "LazyModel",
    "SegmentationModel",
    "EmbeddingModel",
    "PyanNet",
    "XVectorSincNet",
    "EcapaTDNN",
    "ResNet34",
    "TitaNet",
    "XVectorFbank",
    "kaldi_log_mel",
    "speechbrain_log_mel",
    "log_mel_filterbank",
    "mel_filter_matrix",
    "num_fbank_frames",
    "SincNet",
    "SincConv",
    "BiLSTM",
    "weighted_stats_pool",
    "resample_weights",
    "num_sincnet_frames",
    "num_powerset_classes",
    "powerset_mapping",
    "to_multilabel",
]
