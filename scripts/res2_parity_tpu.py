"""On-device (compiled Mosaic) parity of the fused SE-Res2 kernel.

The CPU suite pins the kernel in interpreter mode
(``tests/test_pallas_res2.py``); this runs the SAME comparison with the
compiled kernel on the real TPU — the missing evidence before the
``pallas_res2`` default can flip on. Prints max abs/rel error per geometry.
"""

import sys
from pathlib import Path

import jax
import numpy as np

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))

from test_pallas_res2 import _params, _rand  # noqa: E402

from diart_tpu.ops.pallas_res2 import (  # noqa: E402
    fused_se_res2_block,
    se_res2_block_reference,
)


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    geometries = [
        (8, 501, 512, 8, 3),  # the ECAPA engine's exact geometry
        (3, 41, 256, 4, 2),
        (2, 64, 128, 2, 4),
    ]
    worst = 0.0
    for batch, time, chans, scale, dilation in geometries:
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        x = _rand(keys[0], batch, time, chans)
        params = _params(keys[1], chans, scale, 3, 128)
        got = np.asarray(fused_se_res2_block(x, params, dilation, interpret=False))
        want = np.asarray(se_res2_block_reference(x, *params, dilation))
        abs_err = np.max(np.abs(got - want))
        rel_err = np.max(np.abs(got - want) / (np.abs(want) + 1e-3))
        worst = max(worst, rel_err)
        print(
            f"geometry=({batch},{time},{chans},scale={scale},dil={dilation}) "
            f"max_abs={abs_err:.3e} max_rel={rel_err:.3e}",
            flush=True,
        )
    # same envelope as the interpreter-mode suite, mildly widened for MXU
    # reduction order
    ok = worst < 5e-3
    print(f"parity={'OK' if ok else 'FAIL'} worst_rel={worst:.3e}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
