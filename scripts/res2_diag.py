"""Localize the compiled-vs-reference divergence of the fused SE-Res2
kernel at the ECAPA geometry (compiled Mosaic fails, interpret passes)."""

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
    batch, time, chans, scale, dilation = 8, 501, 512, 8, 3
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    x = _rand(keys[0], batch, time, chans)
    params = _params(keys[1], chans, scale, 3, 128)
    got = np.asarray(fused_se_res2_block(x, params, dilation, interpret=False))
    want = np.asarray(se_res2_block_reference(x, *params, dilation))
    err = np.abs(got - want)
    print(f"shape={err.shape} max={err.max():.3e} mean={err.mean():.3e}")
    # error by time position (max over batch, channels)
    by_t = err.max(axis=(0, 2))
    bad_t = np.where(by_t > 1e-2)[0]
    print(f"bad time positions ({len(bad_t)}): first 30: {bad_t[:30]}")
    if len(bad_t):
        print(f"last 30: {bad_t[-30:]}")
    by_c = err.max(axis=(0, 1))
    bad_c = np.where(by_c > 1e-2)[0]
    print(f"bad channels ({len(bad_c)}): first 20: {bad_c[:20]} last 10: {bad_c[-10:]}")
    by_b = err.max(axis=(1, 2))
    print(f"err by batch row: {np.array2string(by_b, precision=2)}")
    # group structure: 512 chans / scale 8 = 64-wide groups
    width = chans // scale
    by_g = err.max(axis=(0, 1)).reshape(scale, width).max(axis=1)
    print(f"err by res2 group: {np.array2string(by_g, precision=2)}")


if __name__ == "__main__":
    main()
