"""Faithful plain-torch replicas of the pretrained architectures the
reference serves, used to prove checkpoint-conversion fidelity without
network access.

The reference wraps HF-hosted pyannote models
(``/root/reference/src/diart/models.py:42-59``): ``pyannote/segmentation``
(PyanNet: SincNet -> BiLSTM -> linear x2 -> sigmoid classifier) and
``pyannote/embedding`` (XVectorSincNet: SincNet -> TDNN x5 -> weighted stats
pooling -> linear). Their SincNet frontend is asteroid-filterbanks'
``ParamSincFB`` inside an ``Encoder``. These replicas reproduce those
modules' exact math and state-dict layout (parameter names match real
checkpoints), so a random-init replica state dict converted through
``diart_tpu.models.convert`` and compared full-forward against the torch
forward is a true fidelity test for loading real pretrained weights.

No pyannote/asteroid import — torch only.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class ParamSincFB(nn.Module):
    """asteroid_filterbanks.ParamSincFB: n_filters//2 learnable (low, band)
    pairs -> [cos filters..., sin filters...] of odd length kernel_size."""

    def __init__(
        self,
        n_filters: int = 80,
        kernel_size: int = 251,
        stride: int = 10,
        sample_rate: float = 16000.0,
        min_low_hz: float = 50.0,
        min_band_hz: float = 50.0,
    ):
        super().__init__()
        assert n_filters % 2 == 0 and kernel_size % 2 == 1
        self.n_filters = n_filters
        self.kernel_size = kernel_size
        self.stride = stride
        self.sample_rate = sample_rate
        self.min_low_hz = min_low_hz
        self.min_band_hz = min_band_hz
        self.cutoff = n_filters // 2
        self.half_kernel = kernel_size // 2

        # mel-spaced initialization
        low_hz = 30.0
        high_hz = sample_rate / 2 - (min_low_hz + min_band_hz)
        mel = np.linspace(
            self._to_mel(low_hz), self._to_mel(high_hz), self.cutoff + 1
        )
        hz = self._to_hz(mel)
        self.low_hz_ = nn.Parameter(torch.from_numpy(hz[:-1]).float().view(-1, 1))
        self.band_hz_ = nn.Parameter(torch.from_numpy(np.diff(hz)).float().view(-1, 1))

        n_lin = torch.linspace(0, self.kernel_size / 2 - 1, steps=self.half_kernel)
        self.register_buffer(
            "window_", 0.54 - 0.46 * torch.cos(2 * np.pi * n_lin / self.kernel_size)
        )
        n = (self.kernel_size - 1) / 2.0
        self.register_buffer(
            "n_", 2 * np.pi * torch.arange(-n, 0.0).view(1, -1) / self.sample_rate
        )

    @staticmethod
    def _to_mel(hz):
        return 2595 * np.log10(1 + hz / 700)

    @staticmethod
    def _to_hz(mel):
        return 700 * (10 ** (mel / 2595) - 1)

    def _make_filters(self, low, high, filt_type):
        band = (high - low)[:, 0]
        ft_low = torch.matmul(low, self.n_)
        ft_high = torch.matmul(high, self.n_)
        if filt_type == "cos":
            bp_left = ((torch.sin(ft_high) - torch.sin(ft_low)) / (self.n_ / 2)) * self.window_
            bp_center = 2 * band.view(-1, 1)
            bp_right = torch.flip(bp_left, dims=[1])
        else:
            bp_left = ((torch.cos(ft_low) - torch.cos(ft_high)) / (self.n_ / 2)) * self.window_
            bp_center = torch.zeros_like(band.view(-1, 1))
            bp_right = -torch.flip(bp_left, dims=[1])
        band_pass = torch.cat([bp_left, bp_center, bp_right], dim=1)
        return (band_pass / (2 * band[:, None]))[:, None, :]

    def filters(self) -> torch.Tensor:
        low = self.min_low_hz + torch.abs(self.low_hz_)
        high = torch.clamp(
            low + self.min_band_hz + torch.abs(self.band_hz_),
            self.min_low_hz,
            self.sample_rate / 2,
        )
        return torch.cat(
            [
                self._make_filters(low, high, "cos"),
                self._make_filters(low, high, "sin"),
            ],
            dim=0,
        )


class Encoder(nn.Module):
    """asteroid_filterbanks.Encoder: conv1d with the filterbank's kernels."""

    def __init__(self, filterbank: ParamSincFB):
        super().__init__()
        self.filterbank = filterbank

    def forward(self, waveform: torch.Tensor) -> torch.Tensor:
        return F.conv1d(waveform, self.filterbank.filters(), stride=self.filterbank.stride)


class TorchSincNet(nn.Module):
    """pyannote.audio SincNet block (models/blocks/sincnet.py)."""

    def __init__(self, sample_rate: int = 16000, stride: int = 10):
        super().__init__()
        self.wav_norm1d = nn.InstanceNorm1d(1, affine=True)
        self.conv1d = nn.ModuleList(
            [
                Encoder(ParamSincFB(80, 251, stride=stride, sample_rate=sample_rate)),
                nn.Conv1d(80, 60, 5, stride=1),
                nn.Conv1d(60, 60, 5, stride=1),
            ]
        )
        self.pool1d = nn.ModuleList([nn.MaxPool1d(3, stride=3) for _ in range(3)])
        self.norm1d = nn.ModuleList(
            [
                nn.InstanceNorm1d(80, affine=True),
                nn.InstanceNorm1d(60, affine=True),
                nn.InstanceNorm1d(60, affine=True),
            ]
        )

    def forward(self, waveforms: torch.Tensor) -> torch.Tensor:
        outputs = self.wav_norm1d(waveforms)
        for c, (conv1d, pool1d, norm1d) in enumerate(
            zip(self.conv1d, self.pool1d, self.norm1d)
        ):
            outputs = conv1d(outputs)
            if c == 0:
                outputs = torch.abs(outputs)
            outputs = F.leaky_relu(norm1d(pool1d(outputs)))
        return outputs


class TorchPyanNet(nn.Module):
    """pyannote.audio PyanNet (models/segmentation/PyanNet.py), monolithic
    LSTM variant, multilabel sigmoid head."""

    def __init__(
        self,
        num_speakers: int = 4,
        lstm_hidden: int = 128,
        lstm_layers: int = 4,
        linear_dims=(128, 128),
        sample_rate: int = 16000,
    ):
        super().__init__()
        self.sincnet = TorchSincNet(sample_rate=sample_rate)
        self.lstm = nn.LSTM(
            60,
            lstm_hidden,
            num_layers=lstm_layers,
            bidirectional=True,
            batch_first=True,
        )
        dims = [2 * lstm_hidden, *linear_dims]
        self.linear = nn.ModuleList(
            [nn.Linear(i, o) for i, o in zip(dims[:-1], dims[1:])]
        )
        self.classifier = nn.Linear(dims[-1], num_speakers)
        self.activation = nn.Sigmoid()

    def forward(self, waveforms: torch.Tensor) -> torch.Tensor:
        outputs = self.sincnet(waveforms)  # (B, 60, T)
        outputs = outputs.transpose(1, 2)  # (B, T, 60)
        outputs, _ = self.lstm(outputs)
        for linear in self.linear:
            outputs = F.leaky_relu(linear(outputs))
        return self.activation(self.classifier(outputs))


class TorchStatsPool(nn.Module):
    """pyannote.audio StatsPool (models/blocks/pooling.py): weighted mean +
    reliability-weighted unbiased std."""

    def forward(self, sequences: torch.Tensor, weights=None) -> torch.Tensor:
        # sequences: (B, C, T); weights: (B, T') or None
        if weights is None:
            mean = sequences.mean(dim=-1)
            std = sequences.std(dim=-1, unbiased=True)
            return torch.cat([mean, std], dim=-1)
        weights = weights.unsqueeze(dim=1)  # (B, 1, T')
        num_frames = sequences.shape[2]
        if weights.shape[2] != num_frames:
            weights = F.interpolate(weights, size=num_frames, mode="nearest")
        v1 = weights.sum(dim=2)
        mean = torch.sum(sequences * weights, dim=2) / (v1 + 1e-8)
        dx2 = torch.square(sequences - mean.unsqueeze(2))
        v2 = torch.square(weights).sum(dim=2)
        var = torch.sum(dx2 * weights, dim=2) / (v1 - v2 / v1 + 1e-8)
        std = torch.sqrt(var)
        return torch.cat([mean, std], dim=-1)


class TorchXVectorSincNet(nn.Module):
    """pyannote.audio XVectorSincNet (models/embedding/xvector.py): SincNet
    -> 5 dilated TDNN (Conv1d, LeakyReLU, BatchNorm1d) triples in one flat
    ModuleList -> StatsPool -> Linear."""

    def __init__(self, dimension: int = 512, sample_rate: int = 16000):
        super().__init__()
        self.sincnet = TorchSincNet(sample_rate=sample_rate)
        in_channel = 60
        out_channels = [512, 512, 512, 512, 1500]
        kernel_sizes = [5, 3, 3, 1, 1]
        dilations = [1, 2, 3, 1, 1]
        self.tdnns = nn.ModuleList()
        for out_channel, kernel_size, dilation in zip(
            out_channels, kernel_sizes, dilations
        ):
            self.tdnns.extend(
                [
                    nn.Conv1d(
                        in_channels=in_channel,
                        out_channels=out_channel,
                        kernel_size=kernel_size,
                        dilation=dilation,
                    ),
                    nn.LeakyReLU(),
                    nn.BatchNorm1d(out_channel),
                ]
            )
            in_channel = out_channel
        self.stats_pool = TorchStatsPool()
        self.embedding = nn.Linear(3000, dimension)

    def forward(self, waveforms: torch.Tensor, weights=None) -> torch.Tensor:
        outputs = self.sincnet(waveforms)
        for block in self.tdnns:
            outputs = block(outputs)
        outputs = self.stats_pool(outputs, weights=weights)
        return self.embedding(outputs)


# --------------------------------------------------------------------- #
# speechbrain ECAPA-TDNN replica (lobes/models/ECAPA_TDNN.py), including
# the wrapper-module nesting (.conv.conv / .norm.norm) so the state dict
# has the exact key layout of speechbrain/spkrec-ecapa-voxceleb.
# --------------------------------------------------------------------- #


class _SBConv1d(nn.Module):
    """speechbrain.nnet.CNN.Conv1d: inner .conv, 'same' padding with the
    REFLECT padding mode (speechbrain's default ``padding_mode="reflect"``
    — boundary frames mirror instead of zero-filling)."""

    def __init__(self, in_channels, out_channels, kernel_size, dilation=1):
        super().__init__()
        pad = (kernel_size - 1) * dilation // 2
        self.conv = nn.Conv1d(
            in_channels,
            out_channels,
            kernel_size,
            dilation=dilation,
            padding=pad,
            padding_mode="reflect" if pad else "zeros",
        )

    def forward(self, x):
        return self.conv(x)


class _SBBatchNorm1d(nn.Module):
    """speechbrain.nnet.normalization.BatchNorm1d: inner .norm."""

    def __init__(self, channels):
        super().__init__()
        self.norm = nn.BatchNorm1d(channels)

    def forward(self, x):
        return self.norm(x)


class SBTDNNBlock(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, dilation):
        super().__init__()
        self.conv = _SBConv1d(in_channels, out_channels, kernel_size, dilation)
        self.activation = nn.ReLU()
        self.norm = _SBBatchNorm1d(out_channels)

    def forward(self, x):
        return self.norm(self.activation(self.conv(x)))


class SBRes2NetBlock(nn.Module):
    def __init__(self, channels, kernel_size, dilation, scale=8):
        super().__init__()
        width = channels // scale
        self.scale = scale
        self.blocks = nn.ModuleList(
            [SBTDNNBlock(width, width, kernel_size, dilation) for _ in range(scale - 1)]
        )

    def forward(self, x):
        y = []
        for i, x_i in enumerate(torch.chunk(x, self.scale, dim=1)):
            if i == 0:
                y_i = x_i
            elif i == 1:
                y_i = self.blocks[i - 1](x_i)
            else:
                y_i = self.blocks[i - 1](x_i + y_i)
            y.append(y_i)
        return torch.cat(y, dim=1)


class SBSEBlock(nn.Module):
    def __init__(self, in_channels, se_channels, out_channels):
        super().__init__()
        self.conv1 = _SBConv1d(in_channels, se_channels, 1)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = _SBConv1d(se_channels, out_channels, 1)
        self.sigmoid = nn.Sigmoid()

    def forward(self, x):
        s = x.mean(dim=2, keepdim=True)
        s = self.relu(self.conv1(s))
        s = self.sigmoid(self.conv2(s))
        return s * x


class SBSERes2NetBlock(nn.Module):
    def __init__(self, in_channels, out_channels, res2net_scale, se_channels, kernel_size, dilation):
        super().__init__()
        self.tdnn1 = SBTDNNBlock(in_channels, out_channels, 1, 1)
        self.res2net_block = SBRes2NetBlock(out_channels, kernel_size, dilation, res2net_scale)
        self.tdnn2 = SBTDNNBlock(out_channels, out_channels, 1, 1)
        self.se_block = SBSEBlock(out_channels, se_channels, out_channels)

    def forward(self, x):
        residual = x
        x = self.tdnn1(x)
        x = self.res2net_block(x)
        x = self.tdnn2(x)
        x = self.se_block(x)
        return x + residual


class SBAttentiveStatisticsPooling(nn.Module):
    def __init__(self, channels, attention_channels=128):
        super().__init__()
        self.eps = 1e-12
        self.tdnn = SBTDNNBlock(channels * 3, attention_channels, 1, 1)
        self.tanh = nn.Tanh()
        self.conv = _SBConv1d(attention_channels, channels, 1)

    @staticmethod
    def _stats(x, m, dim=2, eps=1e-12):
        mean = (m * x).sum(dim)
        std = torch.sqrt((m * (x - mean.unsqueeze(dim)).pow(2)).sum(dim).clamp(eps))
        return mean, std

    def forward(self, x):
        L = x.shape[-1]
        mean, std = self._stats(x, 1.0 / L, eps=self.eps)
        attn = torch.cat(
            [x, mean.unsqueeze(2).repeat(1, 1, L), std.unsqueeze(2).repeat(1, 1, L)],
            dim=1,
        )
        attn = self.conv(self.tanh(self.tdnn(attn)))
        attn = torch.softmax(attn, dim=2)
        mean, std = self._stats(x, attn, eps=self.eps)
        return torch.cat((mean, std), dim=1).unsqueeze(2)  # (B, 2C, 1)


class SBEcapaTDNN(nn.Module):
    """speechbrain ECAPA_TDNN over fbank features (B, T, mels)."""

    def __init__(
        self,
        input_size=80,
        lin_neurons=192,
        channels=(512, 512, 512, 512, 1536),
        kernel_sizes=(5, 3, 3, 3, 1),
        dilations=(1, 2, 3, 4, 1),
        attention_channels=128,
        res2net_scale=8,
        se_channels=128,
    ):
        super().__init__()
        self.blocks = nn.ModuleList()
        self.blocks.append(SBTDNNBlock(input_size, channels[0], kernel_sizes[0], dilations[0]))
        for i in range(1, len(channels) - 1):
            self.blocks.append(
                SBSERes2NetBlock(
                    channels[i - 1], channels[i], res2net_scale, se_channels,
                    kernel_sizes[i], dilations[i],
                )
            )
        self.mfa = SBTDNNBlock(channels[-1], channels[-1], kernel_sizes[-1], dilations[-1])
        self.asp = SBAttentiveStatisticsPooling(channels[-1], attention_channels)
        self.asp_bn = _SBBatchNorm1d(channels[-1] * 2)
        self.fc = _SBConv1d(channels[-1] * 2, lin_neurons, 1)

    def forward(self, feats):
        # feats: (B, T, mels) -> speechbrain transposes to (B, C, T)
        x = feats.transpose(1, 2)
        xl = []
        for layer in self.blocks:
            x = layer(x)
            xl.append(x)
        x = torch.cat(xl[1:], dim=1)
        x = self.mfa(x)
        x = self.asp(x)
        x = self.asp_bn(x)
        x = self.fc(x)
        return x.squeeze(2)  # (B, dim)


def sb_fbank(waveform: torch.Tensor, n_mels=80, n_fft=400, hop=160, sample_rate=16000):
    """speechbrain Fbank replica: centered constant-padded STFT with a
    periodic Hamming window, power spectrum, speechbrain mel triangles,
    amplitude_to_DB with per-utterance top_db=80 floor. (B, S) -> (B, T, M)."""
    spec = torch.stft(
        waveform,
        n_fft=n_fft,
        hop_length=hop,
        win_length=n_fft,
        window=torch.hamming_window(n_fft, periodic=True),
        center=True,
        pad_mode="constant",
        return_complex=True,
    )  # (B, F, T)
    power = spec.real**2 + spec.imag**2
    all_freqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    mel = np.linspace(
        2595 * np.log10(1 + 0.0 / 700), 2595 * np.log10(1 + 8000.0 / 700), n_mels + 2
    )
    hz = 700 * (10 ** (mel / 2595) - 1)
    band = (hz[1:] - hz[:-1])[:-1]
    f_central = hz[1:-1]
    slope = (all_freqs[None, :] - f_central[:, None]) / band[:, None]
    fb = np.maximum(0.0, np.minimum(slope + 1.0, -slope + 1.0)).astype(np.float32)
    fbanks = torch.einsum("bft,mf->btm", power.float(), torch.from_numpy(fb))
    x_db = 10.0 * torch.log10(torch.clamp(fbanks, min=1e-10))
    floor = x_db.amax(dim=(1, 2), keepdim=True) - 80.0
    return torch.maximum(x_db, floor)


# --------------------------------------------------------------------- #
# speechbrain x-vector replica (lobes/models/Xvector.py), state-dict
# layout of spkrec-xvect-voxceleb: a flat `blocks` ModuleList of
# [Conv1d, LeakyReLU, BatchNorm1d] x 5 + StatisticsPooling + Linear, so
# parameter keys are blocks.{0,3,6,9,12}.conv.* / blocks.{2,5,8,11,14}.norm.*
# / blocks.16.w.*.
# --------------------------------------------------------------------- #


class _SBLinear(nn.Module):
    """speechbrain.nnet.linear.Linear: inner .w."""

    def __init__(self, in_features, out_features):
        super().__init__()
        self.w = nn.Linear(in_features, out_features)

    def forward(self, x):
        return self.w(x)


class SBXVector(nn.Module):
    """speechbrain Xvector over fbank features (B, T, mels).

    StatisticsPooling: temporal mean + unbiased std, std + 1e-5. The
    random eps-magnitude perturbation speechbrain adds to the mean
    (<= 9e-5, applied even at inference) is omitted for determinism — it
    sits below every fidelity tolerance.
    """

    def __init__(
        self,
        in_channels=24,
        lin_neurons=512,
        tdnn_channels=(512, 512, 512, 512, 1500),
        tdnn_kernel_sizes=(5, 3, 3, 1, 1),
        tdnn_dilations=(1, 2, 3, 1, 1),
    ):
        super().__init__()
        self.blocks = nn.ModuleList()
        in_c = in_channels
        for out_c, k, d in zip(tdnn_channels, tdnn_kernel_sizes, tdnn_dilations):
            self.blocks.extend(
                [_SBConv1d(in_c, out_c, k, d), nn.LeakyReLU(), _SBBatchNorm1d(out_c)]
            )
            in_c = out_c
        self.blocks.append(nn.Identity())  # StatisticsPooling (no params)
        self.blocks.append(_SBLinear(tdnn_channels[-1] * 2, lin_neurons))

    def forward(self, feats):
        # feats: (B, T, mels) -> speechbrain transposes to (B, C, T)
        x = feats.transpose(1, 2)
        for layer in self.blocks[:-2]:
            x = layer(x)
        mean = x.mean(dim=2)
        std = x.std(dim=2) + 1e-5
        return self.blocks[-1](torch.cat([mean, std], dim=1))


# --------------------------------------------------------------------- #
# wespeaker ResNet34 replica (wespeaker/models/resnet.py), state-dict
# layout of wespeaker-voxceleb-resnet34-LM.
# --------------------------------------------------------------------- #


class WSBasicBlock(nn.Module):
    expansion = 1

    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=1, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = None
        if stride != 1 or in_planes != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes),
            )

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        residual = x if self.downsample is None else self.downsample(x)
        return F.relu(out + residual)


class WSTSTP(nn.Module):
    """wespeaker temporal statistics pooling: mean + std over time of the
    flattened (channel, freq) maps."""

    def forward(self, x):
        # x: (B, C, F, T)
        x = x.reshape(x.shape[0], -1, x.shape[-1])  # (B, C*F, T)
        mean = x.mean(dim=-1)
        std = torch.sqrt(torch.var(x, dim=-1) + 1e-7)
        return torch.cat([mean, std], dim=-1)


class WSResNet34(nn.Module):
    """wespeaker ResNet34 over fbank features (B, T, mels); TSTP + seg_1."""

    def __init__(self, feat_dim=80, embed_dim=256, m_channels=32, depths=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(1, m_channels, 3, stride=1, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(m_channels)

        def make_layer(in_planes, planes, depth, stride):
            blocks = [WSBasicBlock(in_planes, planes, stride)]
            for _ in range(depth - 1):
                blocks.append(WSBasicBlock(planes, planes, 1))
            return nn.Sequential(*blocks)

        self.layer1 = make_layer(m_channels, m_channels, depths[0], 1)
        self.layer2 = make_layer(m_channels, 2 * m_channels, depths[1], 2)
        self.layer3 = make_layer(2 * m_channels, 4 * m_channels, depths[2], 2)
        self.layer4 = make_layer(4 * m_channels, 8 * m_channels, depths[3], 2)
        self.pool = WSTSTP()
        stats_dim = (feat_dim // 8) * m_channels * 8
        self.seg_1 = nn.Linear(stats_dim * 2, embed_dim)

    def forward(self, feats):
        # feats: (B, T, F) -> image (B, 1, F, T) (wespeaker convention)
        x = feats.permute(0, 2, 1).unsqueeze(1)
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        return self.seg_1(self.pool(x))


def kaldi_fbank(
    waveform: torch.Tensor,
    num_mels=80,
    frame_length=400,
    hop=160,
    sample_rate=16000,
    preemph=0.97,
) -> torch.Tensor:
    """torchaudio.compliance.kaldi.fbank replica (dither=0): snip-edges,
    per-frame DC removal, pre-emphasis, povey window, pow2-padded power
    spectrum, mel triangles in kaldi mel space, ln with float-eps floor.
    (B, S) -> (B, T, M)."""
    b, samples = waveform.shape
    m = 1 + (samples - frame_length) // hop
    idx = torch.arange(m)[:, None] * hop + torch.arange(frame_length)[None, :]
    frames = waveform[:, idx]  # (B, m, flen)
    frames = frames - frames.mean(dim=-1, keepdim=True)
    first = frames[..., :1] - preemph * frames[..., :1]
    rest = frames[..., 1:] - preemph * frames[..., :-1]
    frames = torch.cat([first, rest], dim=-1)
    n = torch.arange(frame_length, dtype=torch.float64)
    povey = (0.5 - 0.5 * torch.cos(2 * np.pi * n / (frame_length - 1))) ** 0.85
    frames = frames * povey.float()
    padded = 1 << (frame_length - 1).bit_length()
    spec = torch.fft.rfft(frames, n=padded)
    power = spec.real**2 + spec.imag**2

    def to_mel(hz):
        return 1127.0 * np.log(1.0 + np.asarray(hz) / 700.0)

    num_bins = padded // 2
    fft_freqs = to_mel(np.arange(num_bins) * sample_rate / padded)
    mel_low, mel_high = to_mel(20.0), to_mel(sample_rate / 2)
    delta = (mel_high - mel_low) / (num_mels + 1)
    filters = np.zeros((num_mels, num_bins), np.float32)
    for i in range(num_mels):
        left = mel_low + i * delta
        up = (fft_freqs - left) / delta
        down = (left + 2 * delta - fft_freqs) / delta
        filters[i] = np.clip(np.minimum(up, down), 0.0, None)
    mel = torch.einsum("btf,mf->btm", power[..., :num_bins].float(), torch.from_numpy(filters))
    return torch.log(torch.clamp(mel, min=float(np.finfo(np.float32).eps)))


# --------------------------------------------------------------------- #
# NeMo TitaNet replica (ConvASREncoder JasperBlocks + SpeakerDecoder),
# state-dict layout of nvidia/speakerverification_en_titanet_large.
# --------------------------------------------------------------------- #


class _NMMaskedConv1d(nn.Module):
    """NeMo MaskedConv1d: inner .conv."""

    def __init__(self, in_c, out_c, k, groups=1, bias=False):
        super().__init__()
        self.conv = nn.Conv1d(
            in_c, out_c, k, padding=(k - 1) // 2, groups=groups, bias=bias
        )

    def forward(self, x):
        return self.conv(x)


class _NMSqueezeExcite(nn.Module):
    """NeMo SqueezeExcite (global context): fc = Sequential(Linear, ReLU,
    Linear)."""

    def __init__(self, channels, reduction=8):
        super().__init__()
        self.fc = nn.Sequential(
            nn.Linear(channels, channels // reduction, bias=True),
            nn.ReLU(),
            nn.Linear(channels // reduction, channels, bias=True),
        )

    def forward(self, x):  # (B, C, T)
        s = x.mean(dim=-1)  # (B, C)
        s = torch.sigmoid(self.fc(s))
        return x * s.unsqueeze(-1)


class _NMJasperBlock(nn.Module):
    """NeMo JasperBlock (separable, SE, optional residual): mconv holds
    [dw, pw, bn, relu, dropout] per repeat (final repeat without act/drop),
    then the SE module; res holds [[1x1 conv, bn]]."""

    def __init__(self, in_c, out_c, kernel, repeat=1, residual=True):
        super().__init__()
        layers = []
        c = in_c
        for r in range(repeat):
            layers.append(_NMMaskedConv1d(c, c, kernel, groups=c))
            layers.append(_NMMaskedConv1d(c, out_c, 1))
            layers.append(nn.BatchNorm1d(out_c))
            if r < repeat - 1:
                layers.append(nn.ReLU())
                layers.append(nn.Dropout(0.0))
            c = out_c
        layers.append(_NMSqueezeExcite(out_c))
        self.mconv = nn.ModuleList(layers)
        self.res = None
        if residual:
            self.res = nn.ModuleList(
                [nn.ModuleList([_NMMaskedConv1d(in_c, out_c, 1), nn.BatchNorm1d(out_c)])]
            )
        self.mout = nn.Sequential(nn.ReLU(), nn.Dropout(0.0))

    def forward(self, x):
        out = x
        for layer in self.mconv:
            out = layer(out)
        if self.res is not None:
            res = x
            for layer in self.res[0]:
                res = layer(res)
            out = out + res
        return self.mout(out)


class _NMTDNNModule(nn.Module):
    """NeMo TDNNModule: conv_layer -> relu -> bn."""

    def __init__(self, in_c, out_c):
        super().__init__()
        self.conv_layer = nn.Conv1d(in_c, out_c, 1, bias=True)
        self.bn = nn.BatchNorm1d(out_c)

    def forward(self, x):
        return self.bn(torch.relu(self.conv_layer(x)))


class _NMAttentivePool(nn.Module):
    """NeMo AttentivePoolLayer with global context: attention over
    [x; mean; std], softmax over time, weighted mean+std."""

    def __init__(self, channels, attention_channels=128):
        super().__init__()
        self.attention_layer = nn.Sequential(
            _NMTDNNModule(channels * 3, attention_channels),
            nn.Tanh(),
            nn.Conv1d(attention_channels, channels, 1, bias=True),
        )

    def forward(self, x):  # (B, C, T)
        t = x.shape[-1]
        mean = x.mean(dim=-1, keepdim=True)
        std = torch.sqrt((x - mean).pow(2).mean(dim=-1, keepdim=True).clamp(1e-12))
        attn = torch.cat([x, mean.expand(-1, -1, t), std.expand(-1, -1, t)], dim=1)
        alpha = torch.softmax(self.attention_layer(attn), dim=-1)
        mu = (alpha * x).sum(dim=-1)
        sg = torch.sqrt(((alpha * x * x).sum(dim=-1) - mu.pow(2)).clamp(1e-12))
        return torch.cat([mu, sg], dim=-1)  # (B, 2C)


def nemo_fbank(
    waveform: torch.Tensor,
    n_mels=80,
    n_fft=512,
    win_length=400,
    hop=160,
    sample_rate=16000,
    preemph=0.97,
):
    """NeMo ``AudioToMelSpectrogramPreprocessor`` replica
    (``FilterbankFeatures``): whole-signal pre-emphasis with the first
    sample kept, ``torch.stft`` center=True/reflect with a *symmetric*
    Hann(win_length) window, power spectrum, librosa slaney-normalized mel
    triangles (htk=False, norm='slaney'), ``log(x + 2^-24)``, and
    ``per_feature`` normalization (per-feature mean / unbiased std + 1e-5).
    (B, S) -> (B, T, M)."""
    x = torch.cat(
        [waveform[:, :1], waveform[:, 1:] - preemph * waveform[:, :-1]], dim=1
    )
    spec = torch.stft(
        x,
        n_fft=n_fft,
        hop_length=hop,
        win_length=win_length,
        window=torch.hann_window(win_length, periodic=False),
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )  # (B, F, T)
    power = spec.real**2 + spec.imag**2

    # librosa.filters.mel(htk=False, norm='slaney'), written out
    def hz_to_mel(hz):
        hz = np.asarray(hz, np.float64)
        return np.where(
            hz >= 1000.0,
            15.0 + np.log(hz / 1000.0) / (np.log(6.4) / 27.0),
            hz / (200.0 / 3.0),
        )

    def mel_to_hz(mel):
        mel = np.asarray(mel, np.float64)
        return np.where(
            mel >= 15.0,
            1000.0 * np.exp((np.log(6.4) / 27.0) * (mel - 15.0)),
            mel * (200.0 / 3.0),
        )

    pts = mel_to_hz(np.linspace(0.0, hz_to_mel(sample_rate / 2), n_mels + 2))
    freqs = np.arange(n_fft // 2 + 1) * sample_rate / n_fft
    lower = (freqs[None, :] - pts[:-2, None]) / (pts[1:-1] - pts[:-2])[:, None]
    upper = (pts[2:, None] - freqs[None, :]) / (pts[2:] - pts[1:-1])[:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    fb *= (2.0 / (pts[2:] - pts[:-2]))[:, None]

    mel = torch.einsum("bft,mf->bmt", power.float(), torch.from_numpy(fb.astype(np.float32)))
    logmel = torch.log(mel + 2.0**-24)  # (B, M, T)
    mean = logmel.mean(dim=-1, keepdim=True)
    std = logmel.std(dim=-1, keepdim=True)  # unbiased
    return ((logmel - mean) / (std + 1e-5)).transpose(1, 2)


class NMTitaNet(nn.Module):
    """NeMo-layout TitaNet over fbank features (B, T, mels)."""

    def __init__(self, feat_dim=80, channels=1024, embed_dim=192,
                 mega_kernels=(7, 11, 15), repeat=3):
        super().__init__()

        class Encoder(nn.Module):
            def __init__(self):
                super().__init__()
                blocks = [_NMJasperBlock(feat_dim, channels, 3, 1, residual=False)]
                for k in mega_kernels:
                    blocks.append(_NMJasperBlock(channels, channels, k, repeat, residual=True))
                blocks.append(_NMJasperBlock(channels, 3 * channels, 1, 1, residual=False))
                self.encoder = nn.ModuleList(blocks)

            def forward(self, x):
                for b in self.encoder:
                    x = b(x)
                return x

        class Decoder(nn.Module):
            def __init__(self):
                super().__init__()
                self._pooling = _NMAttentivePool(3 * channels)
                self.emb_layers = nn.ModuleList(
                    [nn.Sequential(nn.BatchNorm1d(6 * channels), nn.Linear(6 * channels, embed_dim))]
                )

            def forward(self, x):
                pooled = self._pooling(x)
                return self.emb_layers[0](pooled)

        self.encoder = Encoder()
        self.decoder = Decoder()

    def forward(self, feats):  # (B, T, F)
        x = feats.transpose(1, 2)  # (B, F, T)
        return self.decoder(self.encoder(x))
