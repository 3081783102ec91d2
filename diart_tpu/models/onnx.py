"""ONNX model execution (host-side, optional dependency).

Parity with the reference's ONNX backend
(``/root/reference/src/diart/models.py:62-109``): runs an onnxruntime session
on the host. ONNX models cannot participate in the fused on-device streaming
step; they are served through the host-exact pipeline path.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Union

import numpy as np

__all__ = ["ONNXModel"]


class ONNXModel:
    def __init__(self, path: Union[str, Path], input_names: List[str], output_name: str):
        try:
            import onnxruntime as ort
        except ImportError as e:
            raise ImportError(
                "ONNX models require `onnxruntime`, which is not installed"
            ) from e
        options = ort.SessionOptions()
        options.graph_optimization_level = ort.GraphOptimizationLevel.ORT_ENABLE_ALL
        self.path = Path(path)
        self.input_names = input_names
        self.output_name = output_name
        self.session = ort.InferenceSession(
            str(self.path), sess_options=options, providers=["CPUExecutionProvider"]
        )

    def __call__(self, *args) -> np.ndarray:
        inputs = {
            name: np.asarray(arg, dtype=np.float32)
            for name, arg in zip(self.input_names, args)
            if arg is not None
        }
        return self.session.run([self.output_name], inputs)[0]
