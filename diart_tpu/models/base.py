"""Model wrappers: lazy loading, registry, pretrained entry points.

API-parity layer over the JAX models, mirroring the reference's
``SegmentationModel`` / ``EmbeddingModel`` lazy wrappers
(``/root/reference/src/diart/models.py:112-265``) while staying
backend-native:

* ``from_pretrained`` resolves, in order: native serialized params
  (``.msgpack``/``.npz`` + config json), PyTorch checkpoints (converted on
  the fly via :mod:`diart_tpu.models.convert`, requires ``torch``), ONNX
  files (requires ``onnxruntime``), pyannote/HF model names (requires
  ``pyannote.audio``), and the built-in ``tpu/...`` registry of natively
  initialized architectures (used for tests, benchmarks and training from
  scratch).
* loading is lazy: models declared on the CLI don't touch the device until a
  block instantiates them (reference ``models.py:122-129``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .embedding import XVectorSincNet
from .powerset import num_powerset_classes, powerset_mapping, to_multilabel
from .segmentation import PyanNet

__all__ = ["LazyModel", "SegmentationModel", "EmbeddingModel"]


def _dtype_kwarg(kwargs):
    dtype = kwargs.get("dtype", "f32")
    if dtype in ("bf16", "bfloat16", jnp.bfloat16):
        return jnp.bfloat16
    return jnp.float32


def _seed_from_name(name: str) -> int:
    # Stable across processes (unlike str.__hash__, which is per-process
    # randomized) so spawn workers rebuild identical registry weights.
    import zlib

    return zlib.crc32(name.encode("utf-8")) % (2**31)


def _init_params(module, seed: int, samples: int):
    """Initialize parameters on the host CPU backend.

    Running ``module.init`` on the accelerator compiles a full forward pass
    just to produce random weights (observed ~2 min over the remote-TPU
    tunnel); the CPU backend does it in seconds and the arrays migrate to the
    accelerator lazily on first use.
    """
    from .. import precision

    try:
        # local_devices, not devices: in a multi-host process group
        # jax.devices() is the GLOBAL list, and its first CPU belongs to
        # process 0 — placing eager init computations on a non-addressable
        # device crashes every other process (caught by tests/test_dcn.py)
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = None
    # Pallas kernels can't lower for the CPU backend; the init computation
    # only produces shapes/weights, so force the portable paths here —
    # force=True also beats env overrides that pin a fast path on.
    with precision.use(precision.Precision.portable(), force=True):
        if cpu is None:
            return module.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, 1, samples))
            )
        with jax.default_device(cpu):
            # the dummy input is created INSIDE the CPU scope — eagerly
            # allocating it on the default (accelerator) backend is
            # exactly the remote round trip this function exists to avoid
            return module.init(
                jax.random.PRNGKey(seed), jnp.zeros((1, 1, samples))
            )




class _SegRegistryLoader:
    """Picklable registry loader (Parallelize pickles configs across
    processes, reference inference.py:456-493)."""

    def __init__(self, name, kwargs):
        self.name = name
        self.kwargs = kwargs

    KNOWN = ("tpu/pyannet", "tpu/pyannet-powerset")

    def __call__(self):
        name, kwargs = self.name, self.kwargs
        if name not in self.KNOWN:
            # a typo'd registry name must not silently build the default
            # architecture with different random weights
            raise ValueError(
                f"unknown segmentation registry name {name!r}; known: "
                f"{list(self.KNOWN)}"
            )
        powerset_classes = 0
        num_speakers = kwargs.get("num_speakers", 4)
        if name == "tpu/pyannet-powerset":
            num_speakers = kwargs.get("num_speakers", 3)
            powerset_classes = num_powerset_classes(
                num_speakers, kwargs.get("max_simultaneous", 2)
            )
        module = PyanNet(
            num_speakers=num_speakers,
            powerset_classes=powerset_classes,
            lstm_hidden=kwargs.get("lstm_hidden", 128),
            lstm_layers=kwargs.get("lstm_layers", 4),
            linear_dims=tuple(kwargs.get("linear_dims", (128, 128))),
            compute_dtype=_dtype_kwarg(kwargs),
        )
        samples = kwargs.get("init_samples", 80000)
        params = _init_params(
            module, kwargs.get("seed", _seed_from_name(name)), samples
        )
        return module, params, {"sample_rate": 16000, "name": name}


class _EmbRegistryLoader:
    def __init__(self, name, kwargs):
        self.name = name
        self.kwargs = kwargs

    def __call__(self):
        name, kwargs = self.name, self.kwargs
        if name == "tpu/ecapa":
            from .ecapa import EcapaTDNN

            module = EcapaTDNN(
                embedding_dim=kwargs.get("embedding_dim", 192),
                channels=kwargs.get("channels", 512),
                compute_dtype=_dtype_kwarg(kwargs),
            )
        elif name == "tpu/resnet34":
            from .resnet import ResNet34

            module = ResNet34(
                embedding_dim=kwargs.get("embedding_dim", 256),
                base_channels=kwargs.get("base_channels", 32),
                compute_dtype=_dtype_kwarg(kwargs),
            )
        elif name == "tpu/titanet":
            from .titanet import TitaNet

            module = TitaNet(
                embedding_dim=kwargs.get("embedding_dim", 192),
                channels=kwargs.get("channels", 1024),
                compute_dtype=_dtype_kwarg(kwargs),
            )
        elif name == "tpu/xvect-sb":
            from .xvect import XVectorFbank

            module = XVectorFbank(
                embedding_dim=kwargs.get("embedding_dim", 512),
                num_mels=kwargs.get("num_mels", 24),
                tdnn_specs=tuple(
                    kwargs.get(
                        "tdnn_specs",
                        ((5, 1, 512), (3, 2, 512), (3, 3, 512), (1, 1, 512), (1, 1, 1500)),
                    )
                ),
                compute_dtype=_dtype_kwarg(kwargs),
            )
        elif name == "tpu/xvector":
            module = XVectorSincNet(
                embedding_dim=kwargs.get("embedding_dim", 512),
                compute_dtype=_dtype_kwarg(kwargs),
            )
        else:
            raise ValueError(
                f"unknown embedding registry name {name!r}; known: "
                "['tpu/ecapa', 'tpu/resnet34', 'tpu/titanet', "
                "'tpu/xvect-sb', 'tpu/xvector']"
            )
        samples = kwargs.get("init_samples", 80000)
        params = _init_params(
            module, kwargs.get("seed", _seed_from_name(name)), samples
        )
        return module, params, {"sample_rate": 16000, "name": name}


class _OnnxLoader:
    """Picklable ONNX loader (Parallelize pickles configs across spawn
    workers, reference inference.py:456-493 — a local closure here would
    fail that pickling with an opaque AttributeError)."""

    def __init__(self, model_path, input_names, output_name):
        self.model_path = model_path
        self.input_names = list(input_names)
        self.output_name = output_name

    def __call__(self):
        from .onnx import ONNXModel

        return (
            ONNXModel(self.model_path, self.input_names, self.output_name),
            None,
            {},
        )


class _SegFnModule:
    """Module shim for ``SegmentationModel.from_apply`` (module-level so
    the wrapping model pickles whenever the user's function does)."""

    def __init__(self, apply_fn, num_speakers):
        self._apply_fn = apply_fn
        self.num_speakers = num_speakers

    def apply(self, p, waveform, *a, **k):
        return self._apply_fn(p, waveform)


class _EmbFnModule:
    """Module shim for ``EmbeddingModel.from_apply``."""

    def __init__(self, trunk_fn, head_fn, embedding_dim):
        self._trunk_fn = trunk_fn
        self._head_fn = head_fn
        self.embedding_dim = embedding_dim

    def apply(self, p, *args, method=None, **k):
        if method == "trunk":
            return self._trunk_fn(p, *args)
        if method == "head":
            return self._head_fn(p, *args)
        waveform, weights = args[0], args[1] if len(args) > 1 else None
        frames = self._trunk_fn(p, waveform)
        if weights is None:
            ones = jnp.ones((frames.shape[0], 1, frames.shape[1]), frames.dtype)
            return self._head_fn(p, frames, ones)[:, 0]
        return self._head_fn(p, frames, weights)


class _ApplyLoader:
    """Picklable loader for the ``from_apply`` constructors."""

    def __init__(self, module, params, sample_rate):
        self.module = module
        self.params = params
        self.sample_rate = sample_rate

    def __call__(self):
        return (
            self.module,
            {} if self.params is None else self.params,
            {"sample_rate": self.sample_rate},
        )


class _FileLoader:
    """Picklable loader for native/torch/pyannote-backed checkpoints."""

    def __init__(self, kind, *args):
        self.kind = kind
        self.args = args

    def __call__(self):
        if self.kind == "native_seg":
            return _load_native(Path(self.args[0]), PyanNet)
        if self.kind == "native_emb":
            return _load_native(Path(self.args[0]), XVectorSincNet)
        if self.kind == "torch_seg":
            from .convert import load_pyannet_checkpoint

            return load_pyannet_checkpoint(*self.args)
        if self.kind == "torch_emb":
            from .convert import load_embedding_checkpoint

            return load_embedding_checkpoint(self.args[0])
        if self.kind == "pyannote_seg":
            from .convert import load_pyannote_segmentation

            return load_pyannote_segmentation(*self.args)
        if self.kind == "pyannote_emb":
            from .convert import load_pyannote_embedding

            return load_pyannote_embedding(*self.args)
        raise ValueError(self.kind)


class LazyModel:
    """Defers building module+params until first use."""

    def __init__(self, loader: Callable[[], Tuple[Any, Any, Dict]]):
        self._loader = loader
        self.module = None
        self.params = None
        self.meta: Dict[str, Any] = {}
        self._pending_dtype = None

    def is_in_memory(self) -> bool:
        return self.module is not None

    def load(self) -> "LazyModel":
        if not self.is_in_memory():
            self.module, self.params, self.meta = self._loader()
            self._swap_dtype()
        return self

    def with_dtype(self, dtype) -> "LazyModel":
        """Serve this model's trunk in a different compute dtype (``"bf16"``
        or ``"f32"``) regardless of how it was loaded — converted torch
        checkpoints included. Parameters stay f32; only the module's
        ``compute_dtype`` field is replaced (modules without one — ONNX,
        user callables — are unaffected). Call before first use."""
        self._pending_dtype = _dtype_kwarg({"dtype": dtype})
        if self.is_in_memory():
            self._swap_dtype()
        return self

    def _swap_dtype(self) -> None:
        import dataclasses

        dt = self._pending_dtype
        if dt is None or not dataclasses.is_dataclass(self.module):
            return
        if any(f.name == "compute_dtype" for f in dataclasses.fields(self.module)):
            self.module = self.module.clone(compute_dtype=dt)
            if getattr(self, "_apply", None) is not None:
                self._apply = None  # retrace with the new dtype

    def __getstate__(self):
        """Pickle only the loader: compiled functions aren't picklable and
        parameters are cheaper to rebuild in the worker than to ship
        (Parallelize sends configs to spawn workers)."""
        state = self.__dict__.copy()
        state["module"] = None
        state["params"] = None
        state["meta"] = {}
        if "_apply" in state:
            state["_apply"] = None
        return state

    # The reference exposes .to(device)/.eval(); JAX arrays are placed by the
    # surrounding jit/sharding, so these are no-ops kept for API parity.
    def to(self, device=None) -> "LazyModel":
        return self.load()

    def eval(self) -> "LazyModel":
        return self.load()


def _module_config(module) -> Dict[str, Any]:
    """JSON-serializable dataclass fields of a flax module (dtypes as
    strings), so serialized models reconstruct with their exact shape."""
    import dataclasses

    if not dataclasses.is_dataclass(module):
        # from_apply shims and ONNX sessions have no flax config to
        # serialize; fail with intent instead of an internal TypeError
        raise TypeError(
            f"save() supports native flax modules only; "
            f"{type(module).__name__} (from_apply/ONNX-backed) cannot be "
            "serialized"
        )
    out = {}
    for field in dataclasses.fields(module):
        if field.name in ("parent", "name"):
            continue
        value = getattr(module, field.name)
        if value is jnp.bfloat16:
            value = "bf16"
        elif value is jnp.float32:
            value = "f32"
        elif isinstance(value, tuple):
            value = list(value)
        out[field.name] = value
    return out


def _restore_module_config(config: Dict[str, Any]) -> Dict[str, Any]:
    out = {}
    for key, value in config.items():
        if value == "bf16":
            value = jnp.bfloat16
        elif value == "f32":
            value = jnp.float32
        elif isinstance(value, list):
            value = tuple(tuple(v) if isinstance(v, list) else v for v in value)
        out[key] = value
    return out


def _save_native(path: Path, params, config: Dict[str, Any]) -> None:
    from flax import serialization

    path = Path(path)
    path.write_bytes(serialization.to_bytes(params))
    path.with_suffix(path.suffix + ".json").write_text(json.dumps(config))


_NATIVE_MODULE_CLASSES: Dict[str, Callable[[], type]] = {
    "PyanNet": lambda: PyanNet,
    "XVectorSincNet": lambda: XVectorSincNet,
    "EcapaTDNN": lambda: __import__(
        "diart_tpu.models.ecapa", fromlist=["EcapaTDNN"]
    ).EcapaTDNN,
    "ResNet34": lambda: __import__(
        "diart_tpu.models.resnet", fromlist=["ResNet34"]
    ).ResNet34,
    "TitaNet": lambda: __import__(
        "diart_tpu.models.titanet", fromlist=["TitaNet"]
    ).TitaNet,
    "XVectorFbank": lambda: __import__(
        "diart_tpu.models.xvect", fromlist=["XVectorFbank"]
    ).XVectorFbank,
}


def _load_native(path: Path, default_cls):
    from flax import serialization

    path = Path(path)
    config = json.loads(path.with_suffix(path.suffix + ".json").read_text())
    # The saved config records the module class (save() below); fall back to
    # the kind-implied default for files written before that field existed.
    cls_name = config.get("module_class")
    if cls_name is not None:
        if cls_name not in _NATIVE_MODULE_CLASSES:
            raise ValueError(
                f"unknown serialized module class {cls_name!r}; "
                f"known: {sorted(_NATIVE_MODULE_CLASSES)}"
            )
        module_cls = _NATIVE_MODULE_CLASSES[cls_name]()
    else:
        module_cls = default_cls
    module = module_cls(**_restore_module_config(config.get("module", {})))
    dummy = _init_params(module, 0, config.get("init_samples", 16000))
    params = serialization.from_bytes(dummy, path.read_bytes())
    return module, params, config


class SegmentationModel(LazyModel):
    """Waveform (batch, channels, samples) -> activations (batch, frames, K).

    Matches the reference's calling convention (``models.py:188-198``).
    """

    def __init__(self, loader, powerset: Optional[Tuple[int, int]] = None):
        super().__init__(loader)
        self._powerset = powerset  # (num_speakers, max_simultaneous)
        self._apply = None

    # ------------------------------------------------------------------ #
    # Constructors
    # ------------------------------------------------------------------ #
    @staticmethod
    def from_pretrained(model: Union[str, Path], use_hf_token=True, **kwargs) -> "SegmentationModel":
        name = str(model)
        if name.endswith(".onnx"):
            return SegmentationModel.from_onnx(model)
        if name.endswith((".msgpack", ".npz")):
            return SegmentationModel(_FileLoader("native_seg", model))
        if name.endswith((".bin", ".pt", ".ckpt", ".safetensors")):
            return SegmentationModel.from_torch(model, powerset=kwargs.get("powerset"))
        if name.startswith("tpu/"):
            return SegmentationModel.from_registry(name, **kwargs)
        return SegmentationModel.from_pyannote(model, use_hf_token)

    @staticmethod
    def from_apply(
        apply_fn: Callable,
        params=None,
        sample_rate: int = 16000,
        num_speakers: int = 4,
    ) -> "SegmentationModel":
        """Wrap an arbitrary pure function ``(params, waveform (B, C, S)) ->
        (B, frames, K)`` — the native analogue of the reference's support for
        user-supplied model callables (``models.py:112-133``)."""
        return SegmentationModel(
            _ApplyLoader(
                _SegFnModule(apply_fn, num_speakers), params, sample_rate
            )
        )

    @staticmethod
    def from_registry(name: str, **kwargs) -> "SegmentationModel":
        """Natively initialized architectures, e.g. ``tpu/pyannet`` or
        ``tpu/pyannet-powerset`` (random weights — for tests, benchmarks and
        training from scratch)."""

        loader = _SegRegistryLoader(name, kwargs)
        powerset = None
        if name == "tpu/pyannet-powerset":
            powerset = (kwargs.get("num_speakers", 3), kwargs.get("max_simultaneous", 2))
        return SegmentationModel(loader, powerset=powerset)

    @staticmethod
    def from_torch(
        path: Union[str, Path], powerset: Optional[Tuple[int, int]] = None
    ) -> "SegmentationModel":
        """powerset: (num_speakers, max_simultaneous) for checkpoints whose
        classifier emits powerset classes (pyannote/segmentation-3.0 style) —
        undetectable from a raw state dict, so it must be declared."""
        return SegmentationModel(_FileLoader("torch_seg", path, powerset))

    @staticmethod
    def from_pyannote(model, use_hf_token=True) -> "SegmentationModel":
        return SegmentationModel(_FileLoader("pyannote_seg", model, use_hf_token))

    @staticmethod
    def from_onnx(
        model_path: Union[str, Path],
        input_name: str = "waveform",
        output_name: str = "segmentation",
    ) -> "SegmentationModel":
        return SegmentationModel(
            _OnnxLoader(model_path, [input_name], output_name)
        )

    # ------------------------------------------------------------------ #
    @property
    def powerset(self):
        """(num_speakers, max_simultaneous) when the model emits powerset
        classes — set at construction or discovered by the loader (e.g.
        pyannote segmentation-3.0 checkpoints)."""
        self.load()
        return self._powerset or self.meta.get("powerset")

    @property
    def num_speakers(self) -> int:
        self.load()
        if self.powerset is not None:
            return self.powerset[0]
        return getattr(self.module, "num_speakers", 4)

    @property
    def sample_rate(self) -> int:
        self.load()
        return self.meta.get("sample_rate", 16000)

    def apply_fn(self) -> Callable:
        """Pure function (params, waveform (B, 1, samples)) -> (B, frames, K)
        for use inside jitted pipelines. Extra keyword arguments (e.g. the
        engine's stacked-frontend ``sinc_pooled``) pass through to the
        module."""
        self.load()
        if self.params is None:  # ONNX host fallback
            raise RuntimeError("ONNX models cannot run inside jitted pipelines")
        module = self.module
        if self.powerset is not None:
            mapping = powerset_mapping(*self.powerset)

            def fn(params, waveform, **kwargs):
                scores = module.apply(params, waveform, **kwargs)
                return to_multilabel(scores, mapping)

            return fn
        return lambda params, waveform, **kwargs: module.apply(
            params, waveform, **kwargs
        )

    def __call__(self, waveform) -> jnp.ndarray:
        """Eager single-call path (blocks API). waveform: (B, C, samples)."""
        self.load()
        if self.params is None:  # ONNX
            return self.module(waveform)
        if self._apply is None:
            self._apply = jax.jit(self.apply_fn())
        return self._apply(self.params, jnp.asarray(waveform))

    def save(self, path: Union[str, Path]) -> None:
        self.load()
        config = {
            "module": _module_config(self.module),
            "module_class": type(self.module).__name__,
        }
        if self._powerset is not None or self.meta.get("powerset"):
            config["powerset"] = list(self.powerset)
        _save_native(Path(path), self.params, config)


class EmbeddingModel(LazyModel):
    """Waveform + weights -> speaker embeddings, with a trunk/head split.

    Reference interface: ``model(waveform (B, C, samples), weights (B, T))``
    -> ``(B, dim)`` (``models.py:248-265``). The native fast path exposes
    ``trunk_fn``/``head_fn`` so multi-speaker embeddings share one trunk pass
    (see :mod:`diart_tpu.models.embedding`).
    """

    def __init__(self, loader):
        super().__init__(loader)
        self._apply = None

    @staticmethod
    def from_pretrained(model: Union[str, Path], use_hf_token=True, **kwargs) -> "EmbeddingModel":
        name = str(model)
        if name.endswith(".onnx"):
            return EmbeddingModel.from_onnx(model)
        if name.endswith((".msgpack", ".npz")):
            return EmbeddingModel(_FileLoader("native_emb", model))
        if name.endswith((".bin", ".pt", ".ckpt", ".safetensors")):
            return EmbeddingModel.from_torch(model, dtype=kwargs.get("dtype"))
        if name.startswith("tpu/"):
            return EmbeddingModel.from_registry(name, **kwargs)
        return EmbeddingModel.from_pyannote(model, use_hf_token)

    @staticmethod
    def from_apply(
        trunk_fn: Callable,
        head_fn: Callable,
        params=None,
        sample_rate: int = 16000,
        embedding_dim: int = 512,
    ) -> "EmbeddingModel":
        """Wrap arbitrary pure trunk/head functions:
        ``trunk(params, waveform (B, C, S)) -> (B, T, C)`` and
        ``head(params, frames, weights (B, K, Tw)) -> (B, K, E)``."""
        return EmbeddingModel(
            _ApplyLoader(
                _EmbFnModule(trunk_fn, head_fn, embedding_dim),
                params,
                sample_rate,
            )
        )

    @staticmethod
    def from_registry(name: str, **kwargs) -> "EmbeddingModel":
        return EmbeddingModel(_EmbRegistryLoader(name, kwargs))

    @staticmethod
    def from_torch(path: Union[str, Path], dtype=None) -> "EmbeddingModel":
        """dtype: optional trunk compute dtype for serving ("bf16"/"f32");
        parameters and conversion fidelity are f32 either way."""
        model = EmbeddingModel(_FileLoader("torch_emb", path))
        return model.with_dtype(dtype) if dtype is not None else model

    @staticmethod
    def from_pyannote(model, use_hf_token=True) -> "EmbeddingModel":
        return EmbeddingModel(_FileLoader("pyannote_emb", model, use_hf_token))

    @staticmethod
    def from_onnx(
        model_path: Union[str, Path],
        input_names=None,
        output_name: str = "embedding",
    ) -> "EmbeddingModel":
        return EmbeddingModel(
            _OnnxLoader(
                model_path, input_names or ["waveform", "weights"], output_name
            )
        )

    # ------------------------------------------------------------------ #
    @property
    def embedding_dim(self) -> int:
        self.load()
        return getattr(self.module, "embedding_dim", 512)

    @property
    def sample_rate(self) -> int:
        self.load()
        return self.meta.get("sample_rate", 16000)

    def trunk_fn(self) -> Callable:
        """(params, waveform (B, 1, samples)) -> (B, frames, channels).
        Extra keyword arguments (e.g. ``sinc_pooled``) pass through."""
        self.load()
        module = self.module
        return lambda params, waveform, **kwargs: module.apply(
            params, waveform, method="trunk", **kwargs
        )

    def head_fn(self) -> Callable:
        """(params, frames, weights (B, S, T)) -> (B, S, dim)."""
        self.load()
        module = self.module
        return lambda params, frames, weights: module.apply(
            params, frames, weights, method="head"
        )

    def __call__(self, waveform, weights=None) -> jnp.ndarray:
        """Reference-compatible call: waveform (B, C, samples), weights
        (B, frames) -> (B, dim)."""
        self.load()
        if self.params is None:  # ONNX
            return self.module(waveform, weights)
        if self._apply is None:
            module = self.module

            def fn(params, waveform, weights):
                if weights is not None:
                    weights = weights[:, None, :]  # (B, 1, T)
                out = module.apply(params, waveform, weights)
                return out[:, 0] if weights is not None else out

            self._apply = jax.jit(fn, static_argnames=())
        return self._apply(self.params, jnp.asarray(waveform), weights)

    def save(self, path: Union[str, Path]) -> None:
        self.load()
        config = {
            "module": _module_config(self.module),
            "module_class": type(self.module).__name__,
        }
        _save_native(Path(path), self.params, config)
