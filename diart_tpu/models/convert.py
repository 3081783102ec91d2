"""PyTorch checkpoint -> JAX parameter conversion.

The reference loads pyannote/HF-hosted PyTorch models at runtime
(``/root/reference/src/diart/models.py:42-59``). The TPU-native framework
instead *converts* those checkpoints once into its flax parameter trees:

* :func:`load_pyannet_checkpoint` — pyannote ``PyanNet`` segmentation
  checkpoints -> :class:`diart_tpu.models.segmentation.PyanNet` params.
* :func:`load_xvector_checkpoint` — pyannote ``XVectorSincNet`` embedding
  checkpoints -> :class:`diart_tpu.models.embedding.XVectorSincNet` params.
* :func:`load_pyannote_segmentation` / :func:`load_pyannote_embedding` —
  resolve a HF model name through ``pyannote.audio`` (optional dependency),
  then convert its state dict.

Layout rules (verified by per-layer equivalence tests against torch in
``tests/test_convert.py``):

* ``torch.nn.Conv1d.weight (out, in, k)``  -> flax ``Conv.kernel (k, in, out)``
* ``torch.nn.Linear.weight (out, in)``     -> flax ``Dense.kernel (in, out)``
* ``torch.nn.LSTM`` per layer+direction: ``weight_ih (4H, in)`` maps
  directly; biases are summed (``b = bias_ih + bias_hh``); gate order i,f,g,o
  is shared.
* ``InstanceNorm1d``/``BatchNorm1d`` affine params map to the scale/bias
  (and running mean/var) leaves.

Requires ``torch`` (CPU build is enough); everything degrades with a clear
error message when unavailable.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .embedding import XVectorSincNet
from .segmentation import PyanNet

__all__ = [
    "pyannet_params_from_state_dict",
    "xvector_params_from_state_dict",
    "ecapa_params_from_state_dict",
    "xvect_sb_params_from_state_dict",
    "resnet_params_from_state_dict",
    "load_pyannet_checkpoint",
    "load_xvector_checkpoint",
    "load_ecapa_checkpoint",
    "load_xvect_sb_checkpoint",
    "load_resnet_checkpoint",
    "titanet_params_from_state_dict",
    "load_titanet_checkpoint",
    "load_embedding_checkpoint",
    "load_pyannote_segmentation",
    "load_pyannote_embedding",
]


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _get(sd: Dict[str, Any], *aliases: str) -> np.ndarray:
    for key in aliases:
        if key in sd:
            return _np(sd[key])
    raise KeyError(f"none of {aliases} found in state dict (keys: {sorted(sd)[:8]}...)")


def _sincnet_params(sd: Dict[str, Any], prefix: str = "sincnet.") -> Dict[str, Any]:
    p = prefix
    out = {
        "wav_norm_scale": _get(sd, f"{p}wav_norm1d.weight"),
        "wav_norm_bias": _get(sd, f"{p}wav_norm1d.bias"),
        "sinc": {
            "low_hz": _get(
                sd,
                f"{p}conv1d.0.low_hz_",
                f"{p}conv1d.0.filterbank.low_hz_",
            ).reshape(-1),
            "band_hz": _get(
                sd,
                f"{p}conv1d.0.band_hz_",
                f"{p}conv1d.0.filterbank.band_hz_",
            ).reshape(-1),
        },
        "norm1_scale": _get(sd, f"{p}norm1d.0.weight"),
        "norm1_bias": _get(sd, f"{p}norm1d.0.bias"),
    }
    for i in (1, 2):
        w = _get(sd, f"{p}conv1d.{i}.weight")  # (out, in, k)
        out[f"conv{i + 1}"] = {
            "kernel": w.transpose(2, 1, 0),
            "bias": _get(sd, f"{p}conv1d.{i}.bias"),
        }
        out[f"norm{i + 1}_scale"] = _get(sd, f"{p}norm1d.{i}.weight")
        out[f"norm{i + 1}_bias"] = _get(sd, f"{p}norm1d.{i}.bias")
    return out


def _lstm_params(sd: Dict[str, Any], num_layers: int, prefix: str = "lstm.") -> Dict[str, Any]:
    if f"{prefix}weight_ih_l0_reverse" not in sd:
        # a supported pyannote config we do not model — fail with intent
        # rather than a raw KeyError deep in _get
        raise ValueError(
            "checkpoint's LSTM is unidirectional; this converter supports "
            "the bidirectional PyanNet recipes only"
        )
    out = {}
    for layer in range(num_layers):
        w_ih = np.stack(
            [
                _get(sd, f"{prefix}weight_ih_l{layer}"),
                _get(sd, f"{prefix}weight_ih_l{layer}_reverse"),
            ]
        )
        w_hh = np.stack(
            [
                _get(sd, f"{prefix}weight_hh_l{layer}"),
                _get(sd, f"{prefix}weight_hh_l{layer}_reverse"),
            ]
        )
        b = np.stack(
            [
                _get(sd, f"{prefix}bias_ih_l{layer}")
                + _get(sd, f"{prefix}bias_hh_l{layer}"),
                _get(sd, f"{prefix}bias_ih_l{layer}_reverse")
                + _get(sd, f"{prefix}bias_hh_l{layer}_reverse"),
            ]
        )
        out[f"l{layer}_w_ih"] = w_ih
        out[f"l{layer}_w_hh"] = w_hh
        out[f"l{layer}_b"] = b
    return out


def _dense(sd: Dict[str, Any], key: str) -> Dict[str, np.ndarray]:
    return {
        "kernel": _get(sd, f"{key}.weight").T,
        "bias": _get(sd, f"{key}.bias"),
    }


def pyannet_params_from_state_dict(
    sd: Dict[str, Any], num_layers: int = 4
) -> Dict[str, Any]:
    """Map a pyannote PyanNet state dict onto our parameter tree."""
    params = {
        "sincnet": _sincnet_params(sd),
        "lstm": _lstm_params(sd, num_layers),
        "classifier": _dense(sd, "classifier"),
    }
    i = 0
    while f"linear.{i}.weight" in sd:
        params[f"linear{i}"] = _dense(sd, f"linear.{i}")
        i += 1
    return {"params": params}


def xvector_params_from_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map a pyannote XVectorSincNet state dict onto our parameter tree.

    pyannote lays the TDNN out as a flat ``nn.Sequential`` of
    (Conv1d, LeakyReLU, BatchNorm1d) triples named ``tdnns.{j}``.
    """
    params: Dict[str, Any] = {"sincnet": _sincnet_params(sd)}
    conv_keys = sorted(
        {k.split(".")[1] for k in sd if k.startswith("tdnns.") and k.endswith(".weight")
         and sd[k].ndim == 3},
        key=int,
    )
    for i, j in enumerate(conv_keys):
        w = _get(sd, f"tdnns.{j}.weight")
        params[f"tdnn{i}"] = {
            "kernel": w.transpose(2, 1, 0),
            "bias": _get(sd, f"tdnns.{j}.bias"),
        }
        norm_j = int(j) + 2  # Conv, LeakyReLU, BatchNorm triple
        params[f"tdnn{i}_norm"] = {
            "scale": _get(sd, f"tdnns.{norm_j}.weight"),
            "bias": _get(sd, f"tdnns.{norm_j}.bias"),
            "mean": _get(sd, f"tdnns.{norm_j}.running_mean"),
            "var": _get(sd, f"tdnns.{norm_j}.running_var"),
        }
    params["embedding"] = _dense(sd, "embedding")
    return {"params": params}


def _conv1x1_dense(sd: Dict[str, Any], key: str) -> Dict[str, np.ndarray]:
    """torch Conv1d(in, out, 1) -> flax Dense: weight (out, in, 1)."""
    out = {"kernel": _get(sd, f"{key}.weight")[:, :, 0].T}
    if f"{key}.bias" in sd:
        out["bias"] = _get(sd, f"{key}.bias")
    return out


def _sb_bn(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    """speechbrain BatchNorm1d wrapper (``<prefix>.norm.*``) -> _BatchNorm."""
    return {
        "scale": _get(sd, f"{prefix}.weight"),
        "bias": _get(sd, f"{prefix}.bias"),
        "mean": _get(sd, f"{prefix}.running_mean"),
        "var": _get(sd, f"{prefix}.running_var"),
    }


def _sb_tdnn(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """speechbrain TDNNBlock (Conv1d wrapper + BatchNorm1d wrapper)."""
    w = _get(sd, f"{prefix}.conv.conv.weight")  # (out, in, k)
    return {
        "conv": {
            "kernel": w.transpose(2, 1, 0),
            "bias": _get(sd, f"{prefix}.conv.conv.bias"),
        },
        "bn": _sb_bn(sd, f"{prefix}.norm.norm"),
    }


def _ecapa_res2_scale(sd: Dict[str, Any]) -> int:
    """Res2Net scale implied by the state dict (scale - 1 conv blocks)."""
    n = 0
    while f"blocks.1.res2net_block.blocks.{n}.conv.conv.weight" in sd:
        n += 1
    return n + 1


def ecapa_params_from_state_dict(
    sd: Dict[str, Any], res2_scale: Optional[int] = None
) -> Dict[str, Any]:
    """Map a speechbrain ``ECAPA_TDNN`` state dict (the ``embedding_model``
    of ``speechbrain/spkrec-ecapa-voxceleb``) onto our
    :class:`diart_tpu.models.ecapa.EcapaTDNN` parameter tree.

    res2_scale is inferred from the state dict when not given — a
    checkpoint trained at a different scale must not silently convert
    only the first 7 res2net blocks."""
    found = _ecapa_res2_scale(sd)
    if res2_scale is None:
        res2_scale = found
    elif res2_scale != found:
        raise ValueError(
            f"checkpoint has res2net scale {found}, caller declared "
            f"{res2_scale}"
        )
    params: Dict[str, Any] = {"stem": _sb_tdnn(sd, "blocks.0")}
    for i in (1, 2, 3):
        block = {
            "tdnn1": _sb_tdnn(sd, f"blocks.{i}.tdnn1"),
            "tdnn2": _sb_tdnn(sd, f"blocks.{i}.tdnn2"),
            "res2net": {
                f"block{j}": _sb_tdnn(sd, f"blocks.{i}.res2net_block.blocks.{j}")
                for j in range(res2_scale - 1)
            },
            "se": {
                "conv1": _conv1x1_dense(sd, f"blocks.{i}.se_block.conv1.conv"),
                "conv2": _conv1x1_dense(sd, f"blocks.{i}.se_block.conv2.conv"),
            },
        }
        params[f"block{i}"] = block
    params["mfa"] = _sb_tdnn(sd, "mfa")
    # ASP attention: TDNNBlock over [x; mean; std] (9C -> bottleneck) is
    # split into local (first 3C inputs) and global (remaining 6C) matmuls.
    att_w = _get(sd, "asp.tdnn.conv.conv.weight")[:, :, 0]  # (bottleneck, 9C)
    channels3 = att_w.shape[1] // 3
    params["att_local"] = {
        "kernel": att_w[:, :channels3].T,
        "bias": _get(sd, "asp.tdnn.conv.conv.bias"),
    }
    params["att_global"] = {"kernel": att_w[:, channels3:].T}
    params["att_bn"] = _sb_bn(sd, "asp.tdnn.norm.norm")
    params["att2"] = _conv1x1_dense(sd, "asp.conv.conv")
    params["asp_bn"] = _sb_bn(sd, "asp_bn.norm")
    params["embedding"] = _conv1x1_dense(sd, "fc.conv")
    return {"params": params}


def load_ecapa_checkpoint(path: Union[str, Path]):
    """speechbrain ECAPA-TDNN checkpoint -> (module, params, meta)."""
    return _load_ecapa_from_sd(_load_torch_state_dict(path), source=str(path))


def _load_ecapa_from_sd(sd: Dict[str, Any], source: str = ""):
    from .ecapa import EcapaTDNN

    dim = int(_np(sd["fc.conv.weight"]).shape[0])
    channels = int(_np(sd["blocks.0.conv.conv.weight"]).shape[0])
    num_mels = int(_np(sd["blocks.0.conv.conv.weight"]).shape[1])
    module = EcapaTDNN(
        embedding_dim=dim,
        channels=channels,
        num_mels=num_mels,
        res2_scale=_ecapa_res2_scale(sd),
    )
    params = _to_jax(ecapa_params_from_state_dict(sd))
    return module, params, {"sample_rate": 16000, "source": source}


def xvect_sb_params_from_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map a speechbrain ``Xvector`` state dict (the ``embedding_model`` of
    ``speechbrain/spkrec-xvect-voxceleb``) onto our
    :class:`diart_tpu.models.xvect.XVectorFbank` parameter tree.

    speechbrain lays the model out as a flat ``blocks`` ModuleList of
    (Conv1d, activation, BatchNorm1d) triples followed by a parameter-free
    ``StatisticsPooling`` and a ``Linear`` wrapper, so keys are
    ``blocks.{3i}.conv.*``, ``blocks.{3i+2}.norm.*`` and ``blocks.N.w.*``.
    """
    conv_ids = sorted(
        (
            int(k.split(".")[1])
            for k in sd
            if k.startswith("blocks.") and k.endswith(".conv.weight")
        ),
    )
    params: Dict[str, Any] = {}
    for i, b in enumerate(conv_ids):
        w = _get(sd, f"blocks.{b}.conv.weight")  # (out, in, k)
        params[f"tdnn{i}"] = {
            "kernel": w.transpose(2, 1, 0),
            "bias": _get(sd, f"blocks.{b}.conv.bias"),
        }
        params[f"tdnn{i}_norm"] = _sb_bn(sd, f"blocks.{b + 2}.norm")
    lin = max(
        int(k.split(".")[1])
        for k in sd
        if k.startswith("blocks.") and k.endswith(".w.weight")
    )
    params["embedding"] = _dense(sd, f"blocks.{lin}.w")
    return {"params": params}


def _load_xvect_sb_from_sd(sd: Dict[str, Any], source: str = ""):
    from .xvect import XVectorFbank

    conv_ids = sorted(
        int(k.split(".")[1])
        for k in sd
        if k.startswith("blocks.") and k.endswith(".conv.weight")
    )
    kernels = [int(_np(sd[f"blocks.{b}.conv.weight"]).shape[2]) for b in conv_ids]
    channels = [int(_np(sd[f"blocks.{b}.conv.weight"]).shape[0]) for b in conv_ids]
    # dilations are not recoverable from weight shapes; the (1,2,3,1,1)
    # default is the speechbrain Xvector recipe (any other config needs an
    # explicit module)
    dilations = (1, 2, 3, 1, 1) if len(kernels) == 5 else (1,) * len(kernels)
    lin = max(
        int(k.split(".")[1])
        for k in sd
        if k.startswith("blocks.") and k.endswith(".w.weight")
    )
    module = XVectorFbank(
        embedding_dim=int(_np(sd[f"blocks.{lin}.w.weight"]).shape[0]),
        num_mels=int(_np(sd[f"blocks.{conv_ids[0]}.conv.weight"]).shape[1]),
        tdnn_specs=tuple(zip(kernels, dilations, channels)),
    )
    params = _to_jax(xvect_sb_params_from_state_dict(sd))
    return module, params, {"sample_rate": 16000, "source": source}


def load_xvect_sb_checkpoint(path: Union[str, Path]):
    """speechbrain x-vector checkpoint -> (module, params, meta)."""
    return _load_xvect_sb_from_sd(_load_torch_state_dict(path), source=str(path))


def _conv2d(sd: Dict[str, Any], key: str, transpose_hw: bool) -> Dict[str, np.ndarray]:
    """torch Conv2d weight (O, I, kH, kW) -> flax (kH, kW, I, O); with
    ``transpose_hw`` the two spatial dims swap (wespeaker lays the fbank
    image as (freq, time) while our trunk uses (time, freq))."""
    w = _get(sd, f"{key}.weight")
    kernel = w.transpose(3, 2, 1, 0) if transpose_hw else w.transpose(2, 3, 1, 0)
    out = {"kernel": kernel}
    if f"{key}.bias" in sd:
        out["bias"] = _get(sd, f"{key}.bias")
    return out


def _plain_bn(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": _get(sd, f"{prefix}.weight"),
        "bias": _get(sd, f"{prefix}.bias"),
        "mean": _get(sd, f"{prefix}.running_mean"),
        "var": _get(sd, f"{prefix}.running_var"),
    }


def resnet_params_from_state_dict(
    sd: Dict[str, Any], depths=(3, 4, 6, 3)
) -> Dict[str, Any]:
    """Map a wespeaker ResNet state dict (e.g. the torch side of
    ``wespeaker-voxceleb-resnet34-LM``) onto our
    :class:`diart_tpu.models.resnet.ResNet34` parameter tree."""
    if any(k.startswith("resnet.") for k in sd):
        sd = {k[len("resnet."):]: v for k, v in sd.items() if k.startswith("resnet.")}
    # validate the checkpoint really is the basic-block ResNet34 layout:
    # a deeper wespeaker variant (ResNet152/221/...) or a bottleneck one
    # (conv3 keys) would otherwise convert silently with its extra blocks
    # dropped — plausible-looking but wrong embeddings
    if any(".conv3.weight" in k for k in sd):
        raise ValueError(
            "bottleneck ResNet checkpoint (conv3 blocks) is not the "
            "basic-block ResNet34 layout this converter supports"
        )
    found = []
    for stage in range(1, len(depths) + 1):
        n = 0
        while f"layer{stage}.{n}.conv1.weight" in sd:
            n += 1
        found.append(n)
    if tuple(found) != tuple(depths):
        raise ValueError(
            f"checkpoint has ResNet stage depths {tuple(found)}; this "
            f"converter supports ResNet34's {tuple(depths)}"
        )
    params: Dict[str, Any] = {
        "conv1": _conv2d(sd, "conv1", transpose_hw=True),
        "bn1": _plain_bn(sd, "bn1"),
    }
    for stage, depth in enumerate(depths):
        for i in range(depth):
            prefix = f"layer{stage + 1}.{i}"
            block = {
                "conv1": _conv2d(sd, f"{prefix}.conv1", transpose_hw=True),
                "bn1": _plain_bn(sd, f"{prefix}.bn1"),
                "conv2": _conv2d(sd, f"{prefix}.conv2", transpose_hw=True),
                "bn2": _plain_bn(sd, f"{prefix}.bn2"),
            }
            if f"{prefix}.downsample.0.weight" in sd:
                block["downsample_conv"] = _conv2d(
                    sd, f"{prefix}.downsample.0", transpose_hw=True
                )
                block["downsample_bn"] = _plain_bn(sd, f"{prefix}.downsample.1")
            params[f"layer{stage + 1}_{i}"] = block
    params["embedding"] = _dense(sd, "seg_1")
    return {"params": params}


def load_resnet_checkpoint(path: Union[str, Path]):
    """WeSpeaker ResNet34 checkpoint -> (module, params, meta)."""
    sd = _load_torch_state_dict(path)
    return _load_resnet_from_sd(sd, source=str(path))


def _load_resnet_from_sd(sd: Dict[str, Any], source: str = ""):
    from .resnet import ResNet34

    if any(k.startswith("resnet.") for k in sd):
        flat = {k[len("resnet."):]: v for k, v in sd.items() if k.startswith("resnet.")}
    else:
        flat = sd
    dim = int(_np(flat["seg_1.weight"]).shape[0])
    base = int(_np(flat["conv1.weight"]).shape[0])
    module = ResNet34(embedding_dim=dim, base_channels=base)
    return (
        module,
        _to_jax(resnet_params_from_state_dict(sd)),
        {"sample_rate": 16000, "source": source},
    )


def load_embedding_checkpoint(path: Union[str, Path]):
    """Torch embedding checkpoint -> (module, params, meta); the layout is
    sniffed from the state-dict keys (pyannote XVectorSincNet, speechbrain
    ECAPA-TDNN, speechbrain fbank Xvector, NeMo TitaNet, or wespeaker
    ResNet)."""
    sd = _load_torch_state_dict(path)
    if "seg_1.weight" in sd or "resnet.seg_1.weight" in sd:
        return _load_resnet_from_sd(sd, source=str(path))
    if any(k.startswith("encoder.encoder.") for k in sd):
        return _load_titanet_from_sd(sd, source=str(path))
    if any(
        k.startswith("blocks.") and k.endswith(".w.weight") for k in sd
    ) and "blocks.0.conv.weight" in sd:
        return _load_xvect_sb_from_sd(sd, source=str(path))
    if "fc.conv.weight" in sd or "blocks.0.conv.conv.weight" in sd:
        return _load_ecapa_from_sd(sd, source=str(path))
    return load_xvector_checkpoint_from_sd(sd, source=str(path))


def _to_jax(tree):
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x, dtype=jnp.float32), tree)


def _load_torch_state_dict(
    path: Union[str, Path], trust_pickle: bool = False
) -> Dict[str, Any]:
    """Load a torch checkpoint's state dict.

    Uses torch's safe ``weights_only=True`` path by default; arbitrary-pickle
    checkpoints (which can execute code on load) require the explicit
    ``trust_pickle=True`` opt-in, or ``DIART_TPU_TRUST_CHECKPOINTS=1``.
    """
    import os

    import torch

    if not Path(path).exists():
        raise FileNotFoundError(f"checkpoint not found: {path}")
    trust_pickle = trust_pickle or os.environ.get(
        "DIART_TPU_TRUST_CHECKPOINTS"
    ) == "1"
    try:
        obj = torch.load(str(path), map_location="cpu", weights_only=True)
    except Exception as exc:
        if not trust_pickle:
            raise RuntimeError(
                f"checkpoint {path} is not loadable with torch's safe "
                "weights_only=True path. If you trust its origin, set "
                "DIART_TPU_TRUST_CHECKPOINTS=1 to allow full unpickling "
                "(which can execute arbitrary code)."
            ) from exc
        obj = torch.load(str(path), map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("state_dict", "model_state_dict"):
            if key in obj:
                obj = obj[key]
                break
    # strip common prefixes (lightning: "model.")
    if any(k.startswith("model.") for k in obj):
        obj = {k[len("model."):]: v for k, v in obj.items() if k.startswith("model.")}
    return obj


def _pyannet_module_from_state_dict(sd: Dict[str, Any]) -> PyanNet:
    """Derive the PyanNet architecture hyperparameters from a state dict so
    non-default checkpoints (different LSTM width/depth, linear stack) build
    the right module."""
    num_layers = (
        max(
            int(k.split("_l")[-1].replace("_reverse", ""))
            for k in sd
            if k.startswith("lstm.weight_ih_l")
        )
        + 1
    )
    hidden = int(_np(sd["lstm.weight_hh_l0"]).shape[1])
    linear_dims = []
    i = 0
    while f"linear.{i}.weight" in sd:
        linear_dims.append(int(_np(sd[f"linear.{i}.weight"]).shape[0]))
        i += 1
    num_out = int(_np(sd["classifier.weight"]).shape[0])
    return PyanNet(
        num_speakers=num_out,
        lstm_hidden=hidden,
        lstm_layers=num_layers,
        linear_dims=tuple(linear_dims),
    )


def load_pyannet_checkpoint(path: Union[str, Path], powerset=None):
    """Torch PyanNet checkpoint -> (module, params, meta).

    powerset: optional (num_speakers, max_simultaneous) for checkpoints whose
    classifier emits powerset classes (e.g. pyannote/segmentation-3.0): the
    raw state dict cannot reveal the encoding, so it must be declared. The
    classifier width is validated against the implied class count.
    """
    sd = _load_torch_state_dict(path)
    module = _pyannet_module_from_state_dict(sd)
    meta: Dict[str, Any] = {"sample_rate": 16000, "source": str(path)}
    if powerset is not None:
        from .powerset import num_powerset_classes

        num_speakers, max_simultaneous = powerset
        classes = num_powerset_classes(num_speakers, max_simultaneous)
        if module.num_speakers != classes:
            raise ValueError(
                f"checkpoint classifier emits {module.num_speakers} outputs "
                f"but powerset({num_speakers}, {max_simultaneous}) implies "
                f"{classes} classes"
            )
        module = PyanNet(
            num_speakers=num_speakers,
            lstm_hidden=module.lstm_hidden,
            lstm_layers=module.lstm_layers,
            linear_dims=module.linear_dims,
            powerset_classes=classes,
        )
        meta["powerset"] = (num_speakers, max_simultaneous)
    params = _to_jax(pyannet_params_from_state_dict(sd, module.lstm_layers))
    return module, params, meta


def load_xvector_checkpoint_from_sd(sd: Dict[str, Any], source: str = ""):
    dim = sd["embedding.weight"].shape[0]
    module = XVectorSincNet(embedding_dim=int(dim))
    params = _to_jax(xvector_params_from_state_dict(sd))
    return module, params, {"sample_rate": 16000, "source": source}


def load_xvector_checkpoint(path: Union[str, Path]):
    sd = _load_torch_state_dict(path)
    return load_xvector_checkpoint_from_sd(sd, source=str(path))


def _require_pyannote():
    try:
        from pyannote.audio import Model  # noqa: F401

        return Model
    except ImportError as e:
        raise ImportError(
            "loading HF-hosted pyannote models requires `pyannote.audio`; "
            "convert the checkpoint offline with diart_tpu.models.convert "
            "or pass a native .msgpack/.npz parameter file"
        ) from e


def load_pyannote_segmentation(model, use_hf_token=True):
    Model = _require_pyannote()
    net = Model.from_pretrained(model, use_auth_token=use_hf_token)
    sd = net.state_dict()
    specs = getattr(net, "specifications", None)
    module = _pyannet_module_from_state_dict(sd)
    params = _to_jax(pyannet_params_from_state_dict(sd, module.lstm_layers))
    meta = {"sample_rate": 16000, "source": str(model)}
    if specs is not None and getattr(specs, "powerset", False):
        # rebuild with the powerset head (as load_pyannet_checkpoint does
        # when powerset is declared): the module then emits log-softmax
        # powerset scores instead of sigmoid-ing powerset logits, and
        # num_speakers means speakers, not classes
        num_speakers = len(specs.classes)
        max_simultaneous = specs.powerset_max_classes
        meta["powerset"] = (num_speakers, max_simultaneous)
        module = PyanNet(
            num_speakers=num_speakers,
            powerset_classes=module.num_speakers,
            lstm_hidden=module.lstm_hidden,
            lstm_layers=module.lstm_layers,
            linear_dims=module.linear_dims,
        )
    return module, params, meta


def load_pyannote_embedding(model, use_hf_token=True):
    Model = _require_pyannote()
    net = Model.from_pretrained(model, use_auth_token=use_hf_token)
    sd = net.state_dict()
    return (
        XVectorSincNet(embedding_dim=sd["embedding.weight"].shape[0]),
        _to_jax(xvector_params_from_state_dict(sd)),
        {"sample_rate": 16000, "source": str(model)},
    )


def titanet_params_from_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Map a NeMo TitaNet state dict onto our
    :class:`diart_tpu.models.titanet.TitaNet` parameter tree.

    NeMo's JasperBlock interleaves parameter-free activation/dropout modules
    in ``mconv``, so sub-layer indices drift with config; instead of
    hardcoding them, conv entries are classified by SHAPE (depthwise:
    (C, 1, k); pointwise: (O, I, 1)) and batchnorms by key pattern, in index
    order. Verified against a faithful torch replica
    (``tests/torch_replicas.py``).
    """
    if any(k.startswith("encoder.") for k in sd):
        flat = sd
    else:
        raise KeyError("not a NeMo TitaNet state dict (no encoder.* keys)")

    block_ids = sorted(
        {int(k.split(".")[2]) for k in flat if k.startswith("encoder.encoder.")}
    )

    def convert_block(i: int) -> Dict[str, Any]:
        prefix = f"encoder.encoder.{i}"
        # gather mconv entries by index
        entries = sorted(
            {
                int(k[len(prefix) + 7 :].split(".")[0])
                for k in flat
                if k.startswith(f"{prefix}.mconv.")
            }
        )
        reps = []
        pending: Dict[str, Any] = {}
        se = None
        for j in entries:
            base = f"{prefix}.mconv.{j}"
            if f"{base}.conv.weight" in flat:
                w = _np(flat[f"{base}.conv.weight"])  # (O, I, k)
                if w.shape[1] == 1 and "dw" not in pending:
                    # depthwise (C, 1, k) -> flax grouped kernel (k, 1, C);
                    # per-repeat the depthwise always precedes the pointwise
                    pending["dw"] = {"kernel": w.transpose(2, 1, 0)}
                else:
                    pending["pw"] = {"kernel": w.transpose(2, 1, 0)}
            elif f"{base}.weight" in flat and f"{base}.running_mean" in flat:
                pending["bn"] = _plain_bn(flat, base)
                reps.append(pending)
                pending = {}
            elif f"{base}.fc.0.weight" in flat:
                se = {
                    "fc1": _dense(flat, f"{base}.fc.0"),
                    "fc2": _dense(flat, f"{base}.fc.2"),
                }
        block: Dict[str, Any] = {f"rep{r}": rep for r, rep in enumerate(reps)}
        if se is not None:
            block["se"] = se
        if f"{prefix}.res.0.0.conv.weight" in flat:
            block["res_conv"] = {
                "kernel": _np(flat[f"{prefix}.res.0.0.conv.weight"]).transpose(2, 1, 0)
            }
            block["res_bn"] = _plain_bn(flat, f"{prefix}.res.0.1")
        return block

    params: Dict[str, Any] = {"prologue": convert_block(block_ids[0])}
    for m, i in enumerate(block_ids[1:-1]):
        params[f"mega{m}"] = convert_block(i)
    params["epilogue"] = convert_block(block_ids[-1])

    # decoder: attentive pooling (TDNN over [x; mean; std] split local/global)
    att_w = _np(flat["decoder._pooling.attention_layer.0.conv_layer.weight"])[:, :, 0]
    channels3 = att_w.shape[1] // 3
    params["att_local"] = {
        "kernel": att_w[:, :channels3].T,
        "bias": _np(flat["decoder._pooling.attention_layer.0.conv_layer.bias"]),
    }
    params["att_global"] = {"kernel": att_w[:, channels3:].T}
    params["att_bn"] = _plain_bn(flat, "decoder._pooling.attention_layer.0.bn")
    params["att2"] = _conv1x1_dense(flat, "decoder._pooling.attention_layer.2")
    params["emb_bn"] = _plain_bn(flat, "decoder.emb_layers.0.0")
    params["embedding"] = _dense(flat, "decoder.emb_layers.0.1")
    return {"params": params}


def load_titanet_checkpoint(path: Union[str, Path]):
    """NeMo TitaNet checkpoint -> (module, params, meta)."""
    sd = _load_torch_state_dict(path)
    return _load_titanet_from_sd(sd, source=str(path))


def _load_titanet_from_sd(sd: Dict[str, Any], source: str = ""):
    from .titanet import TitaNet

    dim = int(_np(sd["decoder.emb_layers.0.1.weight"]).shape[0])
    channels = int(_np(sd["encoder.encoder.0.mconv.1.conv.weight"]).shape[0])
    block_ids = sorted(
        {int(k.split(".")[2]) for k in sd if k.startswith("encoder.encoder.")}
    )
    kernels = []
    for i in block_ids[1:-1]:
        w = _np(sd[f"encoder.encoder.{i}.mconv.0.conv.weight"])
        kernels.append(int(w.shape[2]))
    module = TitaNet(
        embedding_dim=dim, channels=channels, mega_kernels=tuple(kernels)
    )
    return (
        module,
        _to_jax(titanet_params_from_state_dict(sd)),
        {"sample_rate": 16000, "source": source},
    )
