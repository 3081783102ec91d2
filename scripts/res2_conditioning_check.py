"""Test the chaos hypothesis for the res2 'parity failure': if the test
params make the group cascade an amplifier, then the f32 REFERENCE itself
must diverge from a float64 oracle by the same magnitude the kernel
diverges from the reference — no miscompile required.

Runs entirely on CPU (JAX_PLATFORMS=cpu recommended): compares
  (a) f32 reference vs f64 reference   (conditioning of the formulation)
  (b) f32 reference with one tap's accumulation order changed vs f32
      reference                         (sensitivity to benign reordering)
and estimates the per-stage linear gain of the cascade.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))

from test_pallas_res2 import _params, _rand  # noqa: E402


def reference(x, params, dilation, dtype, reorder=False):
    (w1, b1, a1, c1, wg, bg, ag, cg, *_rest) = params
    x = x.astype(dtype)
    params = [p.astype(dtype) for p in (w1, b1, a1, c1, wg, bg, ag, cg)]
    w1, b1, a1, c1, wg, bg, ag, cg = params
    groups, taps, width, _ = wg.shape

    def tdnn(v, w, b, a, c):
        y = jnp.einsum("btc,cd->btd", v, w)
        y = jnp.maximum(y + b, 0.0)
        return y * a + c

    z1 = tdnn(x, w1, b1, a1, c1)
    chunks = jnp.split(z1, groups + 1, axis=-1)
    outputs = [chunks[0]]
    y = None
    pad = (taps - 1) * dilation // 2
    for i in range(groups):
        inp = chunks[i + 1] if y is None else chunks[i + 1] + y
        padded = jnp.pad(inp, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        acc = jnp.zeros(inp.shape[:2] + (width,), dtype)
        order = range(taps - 1, -1, -1) if reorder else range(taps)
        for j in order:
            sl = padded[:, j * dilation : j * dilation + inp.shape[1]]
            acc = acc + jnp.einsum("btw,wv->btv", sl, wg[i, j])
        acc = jnp.maximum(acc + bg[i], 0.0)
        y = acc * ag[i] + cg[i]
        outputs.append(y)
    return jnp.concatenate(outputs, axis=-1)


def main():
    batch, time, chans, scale, dilation = 8, 501, 512, 8, 3
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    x = np.asarray(_rand(keys[0], batch, time, chans))
    params = [np.asarray(p) for p in _params(keys[1], chans, scale, 3, 128)]

    f64 = np.asarray(reference(jnp.asarray(x), params, dilation, jnp.float64))
    f32 = np.asarray(reference(jnp.asarray(x), params, dilation, jnp.float32))
    f32r = np.asarray(
        reference(jnp.asarray(x), params, dilation, jnp.float32, reorder=True)
    )

    e_cond = np.abs(f32 - f64)
    e_reord = np.abs(f32 - f32r)
    by_b = e_cond.max(axis=(1, 2))
    print(f"f32_ref vs f64_ref: max={e_cond.max():.3e} "
          f"by_row={np.array2string(by_b, precision=2)}")
    by_b2 = e_reord.max(axis=(1, 2))
    print(f"f32_ref vs f32_ref(reordered taps): max={e_reord.max():.3e} "
          f"by_row={np.array2string(by_b2, precision=2)}")

    # per-group linear gain estimate: ||wg|| spectral-ish via power iteration
    wg = params[4]
    w1 = params[0]
    print(f"w1 spectral norm ~ {np.linalg.norm(w1, 2):.2f}")
    for i in range(wg.shape[0]):
        w_eff = wg[i].sum(axis=0)  # taps collapse (upper bound-ish)
        print(f"group {i}: sum-tap spectral {np.linalg.norm(w_eff, 2):.2f}, "
              f"per-tap {[f'{np.linalg.norm(wg[i, j], 2):.2f}' for j in range(wg.shape[1])]}")


if __name__ == "__main__":
    main()
