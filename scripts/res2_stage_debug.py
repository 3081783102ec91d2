"""Stage-wise bisection of the compiled res2 kernel divergence.

Runs a modified copy of the kernel that early-exits after a chosen stage
(z1 / each group conv / z2) and compares each stage against the reference
formulation; plus a micro-kernel exercising ONLY the roll+mask `shifted`
op at the failing shape.
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


# ---------------------------------------------------------------- micro roll
def _shift_kernel(x_ref, out_ref, *, time, s):
    row = jax.lax.broadcasted_iota(jnp.int32, x_ref.shape, 0)
    v = x_ref[...]
    if s == 0:
        out_ref[...] = v
        return
    r = pltpu.roll(v, (-s) % time, 0)
    if s > 0:
        out = jnp.where(row < time - s, r, 0).astype(v.dtype)
        for k in range(s):
            t, q = time - s + k, time - 2 - k
            rk = pltpu.roll(v, (t - q) % time, 0)
            out = jnp.where(row == t, rk, out).astype(v.dtype)
    else:
        out = jnp.where(row >= -s, r, 0).astype(v.dtype)
        for k in range(-s):
            q = (-s) - k
            rk = pltpu.roll(v, (k - q) % time, 0)
            out = jnp.where(row == k, rk, out).astype(v.dtype)
    out_ref[...] = out


def micro_roll(time=501, width=64):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(time, width)), jnp.float32)
    xn = np.asarray(x)
    for s in (-4, -3, -2, -1, 1, 2, 3, 4):
        got = pl.pallas_call(
            partial(_shift_kernel, time=time, s=s),
            out_shape=jax.ShapeDtypeStruct((time, width), jnp.float32),
        )(x)
        # reflect oracle: out[t] = x[reflect(t+s)]
        idx = np.arange(time) + s
        idx = np.where(idx < 0, -idx, idx)
        idx = np.where(idx >= time, 2 * (time - 1) - idx, idx)
        want = xn[idx]
        err = np.max(np.abs(np.asarray(got) - want))
        print(f"micro shifted s={s:+d}: max_err={err:.3e}", flush=True)


# ------------------------------------------------------------- staged kernel
def _staged_kernel(
    x_ref, w1_ref, v1_ref, wg_ref, vg_ref, out_ref, *,
    rows, time, width, groups, taps, dilation, stage,
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
            out_dt = v.dtype
            if jnp.dtype(out_dt).itemsize < 4:
                v = v.astype(jnp.float32)
            rr = pltpu.roll(v, (-s) % time, 0)
            if s > 0:
                out = jnp.where(row < time - s, rr, 0).astype(v.dtype)
                for k in range(s):
                    t, q = time - s + k, time - 2 - k
                    rk = pltpu.roll(v, (t - q) % time, 0)
                    out = jnp.where(row == t, rk, out).astype(v.dtype)
                return out.astype(out_dt)
            out = jnp.where(row >= -s, rr, 0).astype(v.dtype)
            for k in range(-s):
                q = (-s) - k
                rk = pltpu.roll(v, (k - q) % time, 0)
                out = jnp.where(row == k, rk, out).astype(v.dtype)
            return out.astype(out_dt)

        if stage == 0:
            out_ref[r] = z1
            continue
        outputs = [z1[:, :width]]
        y = None
        for i in range(min(groups, stage)):
            inp = z1[:, (i + 1) * width : (i + 2) * width]
            if y is not None:
                inp = inp + y
            acc = jnp.zeros((time, width), jnp.float32)
            for j in range(taps):
                sl = shifted(inp, (j * dilation) - pad)
                base = (i * taps + j) * width
                acc = acc + jax.lax.dot_general(
                    sl, wg_ref[base : base + width],
                    dimension_numbers=dims,
                    preferred_element_type=jnp.float32,
                )
            acc = jnp.maximum(acc + vg_ref[3 * i : 3 * i + 1], 0.0)
            y = (
                acc * vg_ref[3 * i + 1 : 3 * i + 2]
                + vg_ref[3 * i + 2 : 3 * i + 3]
            ).astype(dt)
            outputs.append(y)
        pad_groups = groups - (len(outputs) - 1)
        outputs.extend(
            jnp.zeros((time, width), dt) for _ in range(pad_groups)
        )
        out_ref[r] = jnp.concatenate(outputs, axis=-1)


def staged(x, params, dilation, stage):
    (w1, b1, a1, c1, wg, bg, ag, cg, *_rest) = params
    batch, time, chans = x.shape
    groups, taps, width, _ = wg.shape
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
            _staged_kernel, rows=rows, time=time, width=width,
            groups=groups, taps=taps, dilation=dilation, stage=stage,
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
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=int(1e8),
        ),
    )(x, w1.astype(x.dtype), v1, wgf, vg)


def reference_stage(x, params, dilation, stage):
    (w1, b1, a1, c1, wg, bg, ag, cg, *_rest) = params
    dt = x.dtype
    groups, taps, width, _ = wg.shape

    def tdnn(v, w, b, a, c):
        y = jnp.einsum("btc,cd->btd", v, w, preferred_element_type=jnp.float32)
        y = jnp.maximum(y + b, 0.0)
        return (y * a + c).astype(dt)

    z1 = tdnn(x, w1, b1, a1, c1)
    if stage == 0:
        return z1
    chunks = jnp.split(z1, groups + 1, axis=-1)
    outputs = [chunks[0]]
    y = None
    pad = (taps - 1) * dilation // 2
    for i in range(min(groups, stage)):
        inp = chunks[i + 1] if y is None else chunks[i + 1] + y
        padded = jnp.pad(inp, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        acc = jnp.zeros(inp.shape[:2] + (width,), jnp.float32)
        for j in range(taps):
            sl = padded[:, j * dilation : j * dilation + inp.shape[1]]
            acc = acc + jnp.einsum(
                "btw,wv->btv", sl, wg[i, j], preferred_element_type=jnp.float32
            )
        acc = jnp.maximum(acc + bg[i], 0.0)
        y = (acc * ag[i] + cg[i]).astype(dt)
        outputs.append(y)
    pad_groups = groups - (len(outputs) - 1)
    outputs.extend(jnp.zeros_like(outputs[0]) for _ in range(pad_groups))
    return jnp.concatenate(outputs, axis=-1)


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    micro_roll()
    batch, time, chans, scale, dilation = 8, 501, 512, 8, 3
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    x = _rand(keys[0], batch, time, chans)
    params = _params(keys[1], chans, scale, 3, 128)
    for stage in range(0, scale):
        got = np.asarray(staged(x, params, dilation, stage))
        want = np.asarray(reference_stage(x, params, dilation, stage))
        err = np.abs(got - want)
        bad_rows = np.where(err.max(axis=(1, 2)) > 1e-2)[0]
        print(
            f"stage={stage}: max_err={err.max():.3e} bad_batch_rows={bad_rows}",
            flush=True,
        )


if __name__ == "__main__":
    main()
