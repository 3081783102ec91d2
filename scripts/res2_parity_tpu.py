"""On-device (compiled Mosaic) parity of the fused SE-Res2 kernel.

The CPU suite pins the kernel in interpreter mode
(``tests/test_pallas_res2.py``); this runs the SAME comparison with the
compiled kernel on the real TPU — the missing evidence before the
``pallas_res2`` default can flip on. Prints max abs/rel error per geometry.

Params come from the unit-gain `_params` (see its docstring): with the
original O(1)-gain random weights the 7-group cascade chaotically
amplified f32 rounding noise ~1e5x, which masqueraded as a compiled-path
parity failure in round 2. As a guard against ever mistaking conditioning
for miscompilation again, each geometry is ALSO checked against a float64
oracle (computed on CPU): the compiled kernel must sit no farther from
the f64 truth than the f32 reference does (within 2x).
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


def _f64_oracle(x, params, dilation):
    """Numpy float64 SE-Res2 block (same math as the jnp reference)."""
    (w1, b1, a1, c1, wg, bg, ag, cg, w2, b2, a2, c2, ws1, bs1, ws2, bs2) = [
        np.asarray(p, np.float64) for p in params
    ]
    x = np.asarray(x, np.float64)
    groups, taps, width, _ = wg.shape

    def tdnn(v, w, b, a, c):
        y = np.maximum(v @ w + b, 0.0)
        return y * a + c

    z1 = tdnn(x, w1, b1, a1, c1)
    chunks = np.split(z1, groups + 1, axis=-1)
    outputs = [chunks[0]]
    y = None
    pad = (taps - 1) * dilation // 2
    for i in range(groups):
        inp = chunks[i + 1] if y is None else chunks[i + 1] + y
        padded = np.pad(inp, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        acc = np.zeros(inp.shape[:2] + (width,), np.float64)
        for j in range(taps):
            acc += padded[:, j * dilation : j * dilation + inp.shape[1]] @ wg[i, j]
        y = np.maximum(acc + bg[i], 0.0) * ag[i] + cg[i]
        outputs.append(y)
    z2 = tdnn(np.concatenate(outputs, axis=-1), w2, b2, a2, c2)
    s = np.maximum(z2.mean(axis=1) @ ws1 + bs1, 0.0)
    gate = 1.0 / (1.0 + np.exp(-(s @ ws2 + bs2)))
    return x + z2 * gate[:, None, :]


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    geometries = [
        (8, 501, 512, 8, 3),  # the ECAPA engine's exact geometry (block2)
        (8, 501, 512, 8, 2),  # block1
        (8, 501, 512, 8, 4),  # block3
        (3, 41, 256, 4, 2),
        (2, 64, 128, 2, 4),
    ]
    worst = 0.0
    ok = True
    for batch, time, chans, scale, dilation in geometries:
        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        x = _rand(keys[0], batch, time, chans)
        params = _params(keys[1], chans, scale, 3, 128)
        got = np.asarray(fused_se_res2_block(x, params, dilation, interpret=False))
        want = np.asarray(se_res2_block_reference(x, *params, dilation))
        truth = _f64_oracle(np.asarray(x), params, dilation)
        abs_err = np.max(np.abs(got - want))
        kernel_vs_truth = np.max(np.abs(got - truth))
        ref_vs_truth = np.max(np.abs(want - truth))
        worst = max(worst, abs_err)
        # the kernel must be no farther from the f64 truth than the f32
        # reference is (2x slack for MXU reduction order)
        if kernel_vs_truth > max(2.0 * ref_vs_truth, 1e-4):
            ok = False
        print(
            f"geometry=({batch},{time},{chans},scale={scale},dil={dilation}) "
            f"max_abs={abs_err:.3e} "
            f"kernel_vs_f64={kernel_vs_truth:.3e} ref_vs_f64={ref_vs_truth:.3e}",
            flush=True,
        )
    # absolute envelope on unit-gain O(1) outputs (rel error is noisy at
    # near-zero outputs; the f64 sandwich above is the principled check)
    ok = ok and worst < 5e-3
    print(f"parity={'OK' if ok else 'FAIL'} worst_abs={worst:.3e}", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
