"""``diart-tpu-convert``: convert a checkpoint to native serialized params.

The reference loads torch/HF checkpoints at runtime on every process start
(``/root/reference/src/diart/models.py``). Here conversion can be done ONCE,
offline, producing the native ``.msgpack`` (+ config json) that
``from_pretrained`` loads directly — no torch at serving time, instant
worker start-up.

Supported inputs: pyannote PyanNet / XVectorSincNet, speechbrain ECAPA-TDNN
and fbank Xvector, NeMo TitaNet and wespeaker ResNet34 torch checkpoints
(layout auto-detected), and pyannote model names when ``pyannote.audio`` is
installed.
"""

import argparse
from pathlib import Path

from .. import models as m
from .. import utils


def run():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "kind", choices=["segmentation", "embedding"],
        help="Which model role the checkpoint plays",
    )
    parser.add_argument(
        "source", type=str,
        help="Torch checkpoint path (.bin/.pt/.ckpt/.safetensors) or pyannote "
        "model name",
    )
    parser.add_argument(
        "output", type=Path, help="Output path for the native params (.msgpack)"
    )
    parser.add_argument(
        "--powerset",
        nargs=2,
        type=int,
        metavar=("SPEAKERS", "MAX_SIMULTANEOUS"),
        help="Declare a raw torch segmentation checkpoint as powerset-encoded",
    )
    parser.add_argument(
        "--hf-token", default="true", type=str,
        help="Hugging Face token for pyannote model names",
    )
    parser.add_argument(
        "--check", action="store_true",
        help="Reload the converted file and verify a forward pass runs",
    )
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # conversion is host work

    hf_token = utils.parse_hf_token_arg(args.hf_token)
    if args.kind == "segmentation":
        model = m.SegmentationModel.from_pretrained(
            args.source, hf_token,
            powerset=tuple(args.powerset) if args.powerset else None,
        )
    else:
        model = m.EmbeddingModel.from_pretrained(args.source, hf_token)
    model.load()
    args.output.parent.mkdir(parents=True, exist_ok=True)
    model.save(args.output)
    kind_cls = type(model.module).__name__
    print(f"converted {args.source} ({kind_cls}) -> {args.output}")

    if args.check:
        import numpy as np

        cls = m.SegmentationModel if args.kind == "segmentation" else m.EmbeddingModel
        reloaded = cls.from_pretrained(str(args.output))
        sr = reloaded.sample_rate
        out = reloaded(np.zeros((1, 1, sr), np.float32))
        print(f"check ok: forward on 1 s of silence -> {tuple(out.shape)}")


if __name__ == "__main__":
    run()
