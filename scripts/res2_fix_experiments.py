"""Variant experiments to pinpoint the compiled-Mosaic res2 divergence.

Findings so far (res2_diag / res2_bisect / res2_stage_debug, all on TPU):
  - deterministic, data-dependent; magnitude varies with seed
  - batch-row-specific: B=8 -> rows 2,3,5 bad; B=2 exact; B=1 catastrophic
  - independent of T alignment (501/504/512 identical max_err)
  - bad time positions spaced by the dilation
  - stage bisection: groups 0-2 exact (1.4e-5), error enters at group 3
  - the standalone roll+mask `shifted` micro-kernel is bit-exact

Variants (each a hypothesis):
  base    unchanged kernel body (expected FAIL at the big geometry)
  scratch materialize each shifted slice through a VMEM scratch ref before
          the dot (tests: roll-into-dot lazy-fusion miscompile)
  rows1/rows2/rows4
          force the row-unroll count with a larger grid (tests: unroll-
          length-dependent register allocation)
  zerob   drop the reflect boundary rolls (zero boundary) in BOTH kernel
          and reference (tests: the boundary row-select chain vs the bulk
          roll)
  wcopy   copy the sliced group-weight block to scratch before the dot
          (tests: strided weight-ref operand)
"""

import sys
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))
sys.path.insert(0, str(_ROOT / "tests"))

from test_pallas_res2 import _params, _rand  # noqa: E402


def _kernel(
    x_ref, w1_ref, v1_ref, wg_ref, vg_ref, out_ref, sl_scr, w_scr, *,
    rows, time, width, groups, taps, dilation, variant,
):
    dt = x_ref.dtype
    pad = (taps - 1) * dilation // 2
    dims = (((1,), (0,)), ((), ()))

    def tdnn(v, w_ref, aff_ref):
        y = jax.lax.dot_general(
            v, w_ref[...], dimension_numbers=dims,
            preferred_element_type=jnp.float32,
        )
        y = jnp.maximum(y + aff_ref[0:1], 0.0)
        return (y * aff_ref[1:2] + aff_ref[2:3]).astype(dt)

    for r in range(rows):
        x_r = x_ref[r]
        z1 = tdnn(x_r, w1_ref, v1_ref)
        row = jax.lax.broadcasted_iota(jnp.int32, (time, width), 0)

        def shifted(v, s):
            if s == 0:
                return v
            rr = pltpu.roll(v, (-s) % time, 0)
            if s > 0:
                out = jnp.where(row < time - s, rr, 0).astype(v.dtype)
                if variant != "zerob":
                    for k in range(s):
                        t, q = time - s + k, time - 2 - k
                        rk = pltpu.roll(v, (t - q) % time, 0)
                        out = jnp.where(row == t, rk, out).astype(v.dtype)
                return out
            out = jnp.where(row >= -s, rr, 0).astype(v.dtype)
            if variant != "zerob":
                for k in range(-s):
                    q = (-s) - k
                    rk = pltpu.roll(v, (k - q) % time, 0)
                    out = jnp.where(row == k, rk, out).astype(v.dtype)
            return out

        outputs = [z1[:, :width]]
        y = None
        for i in range(groups):
            inp = z1[:, (i + 1) * width : (i + 2) * width]
            if y is not None:
                inp = inp + y
            if variant == "tapcat":
                sl_cat = jnp.concatenate(
                    [shifted(inp, (j * dilation) - pad) for j in range(taps)],
                    axis=-1,
                )
                base = i * taps * width
                acc = jax.lax.dot_general(
                    sl_cat, wg_ref[base : base + taps * width],
                    dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                )
            else:
              acc = jnp.zeros((time, width), jnp.float32)
              for j in range(taps):
                sl = shifted(inp, (j * dilation) - pad)
                if variant == "scratch":
                    sl_scr[...] = sl
                    sl = sl_scr[...]
                base = (i * taps + j) * width
                if variant == "wcopy":
                    w_scr[...] = wg_ref[base : base + width]
                    w_blk = w_scr[...]
                else:
                    w_blk = wg_ref[base : base + width]
                acc = acc + jax.lax.dot_general(
                    sl, w_blk, dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                )
            acc = jnp.maximum(acc + vg_ref[3 * i : 3 * i + 1], 0.0)
            y = (
                acc * vg_ref[3 * i + 1 : 3 * i + 2]
                + vg_ref[3 * i + 2 : 3 * i + 3]
            ).astype(dt)
            outputs.append(y)
        out_ref[r] = jnp.concatenate(outputs, axis=-1)


def run_variant(x, params, dilation, variant, rows=None):
    (w1, b1, a1, c1, wg, bg, ag, cg, *_rest) = params
    batch, time, chans = x.shape
    groups, taps, width, _ = wg.shape
    if rows is None:
        rows = 8
        while batch % rows:
            rows //= 2
    f32 = jnp.float32
    v1 = jnp.stack([b1.astype(f32), a1.astype(f32), c1.astype(f32)])
    vg = jnp.stack([bg, ag, cg], axis=1).reshape(3 * groups, width).astype(f32)
    wgf = wg.astype(x.dtype).reshape(groups * taps * width, width)
    spec_w = lambda shape: pl.BlockSpec(shape, lambda ib: tuple(0 for _ in shape))
    return pl.pallas_call(
        partial(
            _kernel, rows=rows, time=time, width=width,
            groups=groups, taps=taps, dilation=dilation, variant=variant,
        ),
        grid=(batch // rows,),
        out_shape=jax.ShapeDtypeStruct((batch, time, chans), x.dtype),
        in_specs=[
            pl.BlockSpec((rows, time, chans), lambda ib: (ib, 0, 0)),
            spec_w((chans, chans)),
            spec_w((3, chans)),
            spec_w((groups * taps * width, width)),
            spec_w((3 * groups, width)),
        ],
        out_specs=pl.BlockSpec((rows, time, chans), lambda ib: (ib, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((time, width), jnp.float32),
            pltpu.VMEM((width, width), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=int(1e8),
        ),
    )(x, w1.astype(x.dtype), v1, wgf, vg)


def reference(x, params, dilation, zero_boundary=False):
    (w1, b1, a1, c1, wg, bg, ag, cg, *_rest) = params
    dt = x.dtype
    groups, taps, width, _ = wg.shape

    def tdnn(v, w, b, a, c):
        y = jnp.einsum("btc,cd->btd", v, w, preferred_element_type=jnp.float32)
        y = jnp.maximum(y + b, 0.0)
        return (y * a + c).astype(dt)

    z1 = tdnn(x, w1, b1, a1, c1)
    chunks = jnp.split(z1, groups + 1, axis=-1)
    outputs = [chunks[0]]
    y = None
    pad = (taps - 1) * dilation // 2
    mode = "constant" if zero_boundary else "reflect"
    for i in range(groups):
        inp = chunks[i + 1] if y is None else chunks[i + 1] + y
        padded = jnp.pad(inp, ((0, 0), (pad, pad), (0, 0)), mode=mode)
        acc = jnp.zeros(inp.shape[:2] + (width,), jnp.float32)
        for j in range(taps):
            sl = padded[:, j * dilation : j * dilation + inp.shape[1]]
            acc = acc + jnp.einsum(
                "btw,wv->btv", sl, wg[i, j], preferred_element_type=jnp.float32
            )
        acc = jnp.maximum(acc + bg[i], 0.0)
        y = (acc * ag[i] + cg[i]).astype(dt)
        outputs.append(y)
    return jnp.concatenate(outputs, axis=-1)


def time_variants():
    """Back-to-back timing of the taps-loop vs tap-concat group-conv
    formulations at the production shape (B=256, bf16). Perturbs w1 per
    iteration: the axon terminal caches results for identical
    (executable, inputs) pairs."""
    import time as _time

    batch, time, chans, scale, dilation = 256, 501, 512, 8, 3
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    x = _rand(keys[0], batch, time, chans).astype(jnp.bfloat16)
    params = list(_params(keys[1], chans, scale, 3, 128))
    fns = {}
    for name in ("base", "tapcat"):
        fns[name] = jax.jit(
            lambda x, params, v=name: run_variant(x, tuple(params), dilation, v)
        )
        jax.block_until_ready(fns[name](x, params))
    for name in ("base", "tapcat", "base", "tapcat"):
        iters = 10
        t0 = _time.perf_counter()
        for i in range(iters):
            params[0] = params[0] + 1e-9
            out = fns[name](x, params)
        jax.block_until_ready(out)
        ms = (_time.perf_counter() - t0) / iters * 1e3
        print(f"{name}: {ms:.3f} ms/block (B={batch}, bf16)", flush=True)


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    if "--time" in sys.argv:
        time_variants()
        return
    batch, time, chans, scale, dilation = 8, 501, 512, 8, 3
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    x = _rand(keys[0], batch, time, chans)
    params = _params(keys[1], chans, scale, 3, 128)
    want = np.asarray(reference(x, params, dilation))
    want_zb = np.asarray(reference(x, params, dilation, zero_boundary=True))

    for name, kw in [
        ("base", {}),
        ("scratch", {"variant": "scratch"}),
        ("rows1", {"rows": 1}),
        ("rows2", {"rows": 2}),
        ("rows4", {"rows": 4}),
        ("zerob", {"variant": "zerob"}),
        ("wcopy", {"variant": "wcopy"}),
    ]:
        variant = kw.pop("variant", "base")
        try:
            got = np.asarray(run_variant(x, params, dilation, variant, **kw))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        tgt = want_zb if variant == "zerob" else want
        err = np.abs(got - tgt)
        by_b = err.max(axis=(1, 2))
        print(
            f"{name}: max_err={err.max():.3e} "
            f"by_row={np.array2string(by_b, precision=2)}",
            flush=True,
        )


if __name__ == "__main__":
    main()
