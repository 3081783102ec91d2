"""Micro-benchmark: does this TPU actually run s8xs8->s32 convolutions
faster than bf16? Diagnoses the engine-level int8 A/B (``bench.py --ab
--set int8_trunk=1``): a neutral engine delta can mean either "the trunk is
a minor share of the step" or "XLA never emits an int8 MXU conv". This
isolates the conv itself at trunk-realistic shapes.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def bench(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(jax.device_get(out.ravel()[:1]))
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(jax.device_get(out.ravel()[:1]))
        times.append((time.perf_counter() - t0) / iters)
    return min(times)


def conv(dtype, acc_dtype, batch, t, cin, cout, k):
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-127, 127, (batch, cin, t)), jnp.int8)
        w = jnp.asarray(rng.integers(-127, 127, (cout, cin, k)), jnp.int8)
    else:
        x = jnp.asarray(rng.normal(size=(batch, cin, t)), dtype)
        w = jnp.asarray(rng.normal(size=(cout, cin, k)), dtype)

    @jax.jit
    def f(x, w):
        return lax.conv_general_dilated(
            x,
            w,
            window_strides=(1,),
            padding="SAME",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=acc_dtype,
        )

    return bench(f, x, w), f.lower(x, w).compile()


def main():
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    # xvector TDNN-ish (wide 1500-ch) and ResNet-ish (256-ch square) shapes
    shapes = [
        ("xvect_tdnn", 256, 293, 512, 1500, 1),
        ("resnet_mid", 256, 160, 256, 256, 3),
    ]
    for name, batch, t, cin, cout, k in shapes:
        t_bf16, _ = conv(jnp.bfloat16, jnp.float32, batch, t, cin, cout, k)
        t_int8, compiled = conv(jnp.int8, jnp.int32, batch, t, cin, cout, k)
        hlo = compiled.as_text()
        has_s8 = "s8" in hlo and "convolution" in hlo
        print(
            f"{name}: bf16={t_bf16*1000:.3f}ms int8={t_int8*1000:.3f}ms "
            f"speedup={t_bf16/t_int8:.2f}x s8_conv_in_hlo={has_s8}",
            flush=True,
        )


if __name__ == "__main__":
    main()
