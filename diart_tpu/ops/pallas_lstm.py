"""Pallas TPU kernel: fused recurrent LSTM sweep.

The segmentation model's BiLSTM is the latency-critical sequential op in the
streaming hot path (~293 timesteps per 5 s chunk; SURVEY.md hard part 4).
Under plain ``lax.scan`` every timestep is a separate tiny HLO loop
iteration whose recurrent weights are re-fetched from HBM. This kernel runs
the whole time sweep inside one Pallas program:

* the recurrent weights ``w_hh (2, 4H, H)`` and the running ``h``/``c``
  state stay resident in VMEM for the entire sweep;
* the pre-computed input projections stream from HBM with double-buffered
  async DMA (two time-step slots), so the MXU matmul of step ``t`` overlaps
  the fetch of step ``t+1``;
* both directions run in the same kernel (the caller time-flips direction 1,
  exactly like the XLA path in :mod:`diart_tpu.models.lstm`).

The kernel computes gates in f32 on the MXU (``preferred_element_type``) and
matches the XLA path bit-for-bit at f32 within normal accumulation noise —
verified by parity tests (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lstm_sweep", "lstm_sweep_tm"]

# Note on a rejected optimization: a "fully fused" variant that computed the
# input projection INSIDE the sweep kernel (streaming the raw layer input
# instead of the 8x-larger pre-projected gate stream, double-buffered DMA of
# x[t] and x[T-1-t], software-pipelined projection of step t+1 behind step
# t's gate math) was built, parity-tested, and A/B-measured at batch 256 on
# v5e: 0.77 ms/layer vs 0.61 ms/layer for the two-stage path below. The
# serialized per-step (2,B,F)x(F,4H) projection on the MXU costs more than
# the full-sequence XLA projection matmul saves in HBM traffic once the gate
# stream is bf16. Revisit only if the recurrence becomes DMA-bound again
# (e.g. much larger hidden sizes). The implementation is in git history.



def _lstm_kernel(
    proj_ref, w_hh_ref, out_ref, h_scr, c_scr, x_scr, o_scr, sem, *, flip_dir1
):
    """proj_ref: (T, 2, B, 4H) in ANY/HBM; w_hh_ref: (2, 4H, H) VMEM;
    out_ref: (T, 2, B, H) in ANY/HBM; scratch: h/c (2, B, H) f32 VMEM,
    x (2 slots, 2, B, 4H) VMEM, o (2, B, H) output-dtype staging,
    sem: 4 fetch + 1 out semaphore.

    Time is the MAJOR axis of the HBM buffers: Mosaic requires slices along
    the (sublane, lane)-tiled trailing dims to be tile-aligned, so a
    1-timestep slice must cut an untiled unrolled axis.

    flip_dir1: when True, direction 1 reads ``proj[T-1-t]`` and writes
    ``out[T-1-t]`` — the backward sweep over an UNREVERSED stream. The
    caller then never materializes time-flipped copies of the projections
    or hidden states (``x[:, ::-1]`` on a 150 MB stream costs real HBM
    traffic; indexing in the kernel costs nothing).

    Dtypes: gate math and the cell state are always f32. With a bf16
    projection stream (the bandwidth-saving fast path) the recurrent matmul
    also runs at the MXU's bf16 rate with f32 accumulation; hidden states
    are written back in the stream dtype. With an f32 stream the compute is
    bit-identical to the XLA scan path.
    """
    time, _, batch, gates4 = proj_ref.shape
    hidden = gates4 // 4
    out_dtype = out_ref.dtype

    h_scr[...] = jnp.zeros_like(h_scr)
    c_scr[...] = jnp.zeros_like(c_scr)

    def fetch(slot, t):
        if not flip_dir1:
            return (
                pltpu.make_async_copy(
                    proj_ref.at[t], x_scr.at[slot], sem.at[slot]
                ),
            )
        return (
            pltpu.make_async_copy(
                proj_ref.at[t, 0], x_scr.at[slot, 0], sem.at[slot]
            ),
            pltpu.make_async_copy(
                proj_ref.at[time - 1 - t, 1], x_scr.at[slot, 1], sem.at[2 + slot]
            ),
        )

    # warm-up: start the first timestep's DMA
    for c in fetch(0, 0):
        c.start()

    def step(t, _):
        slot = jax.lax.rem(t, 2)
        next_slot = jax.lax.rem(t + 1, 2)

        @pl.when(t + 1 < time)
        def _():
            for c in fetch(next_slot, t + 1):
                c.start()

        for c in fetch(slot, t):
            c.wait()

        xt = x_scr[slot]  # (2, B, 4H)
        h = h_scr[...].astype(w_hh_ref.dtype)
        gates = xt.astype(jnp.float32) + jax.lax.dot_general(
            h,
            w_hh_ref[...],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        i = jax.nn.sigmoid(gates[..., 0 * hidden : 1 * hidden])
        f = jax.nn.sigmoid(gates[..., 1 * hidden : 2 * hidden])
        g = jnp.tanh(gates[..., 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(gates[..., 3 * hidden : 4 * hidden])
        c = f * c_scr[...] + i * g
        h = o * jnp.tanh(c)
        c_scr[...] = c
        h_scr[...] = h

        # write h back to HBM (async; the next iteration's state lives in
        # VMEM so we only need the copy to finish by kernel end). An f32
        # stream writes straight from the state; a bf16 stream stages the
        # down-cast in o_scr first.
        src = h_scr
        if out_dtype != jnp.float32:
            o_scr[...] = h.astype(out_dtype)
            src = o_scr
        if not flip_dir1:
            out_copy = pltpu.make_async_copy(src, out_ref.at[t], sem.at[4])
            out_copy.start()
            out_copy.wait()
        else:
            c0 = pltpu.make_async_copy(src.at[0], out_ref.at[t, 0], sem.at[4])
            c1 = pltpu.make_async_copy(
                src.at[1], out_ref.at[time - 1 - t, 1], sem.at[5]
            )
            c0.start()
            c1.start()
            c0.wait()
            c1.wait()
        return 0

    jax.lax.fori_loop(0, time, step, 0)


@partial(jax.jit, static_argnames=("interpret",))
def lstm_sweep(
    proj: jnp.ndarray, w_hh: jnp.ndarray, interpret: bool = None
) -> jnp.ndarray:
    """Run a bidirectional LSTM recurrence over pre-projected inputs.

    Parameters
    ----------
    proj: (2, batch, time, 4*hidden) — input projections incl. bias
        (direction 1 already time-flipped). bf16 selects the
        reduced-bandwidth stream (f32 gate math / cell state either way).
    w_hh: (2, 4*hidden, hidden) — recurrent weights (PyTorch gate order).
    interpret: None resolves to compiled on TPU backends and interpreter
        mode elsewhere (compiled Pallas only lowers for TPU).

    Returns
    -------
    (2, batch, time, hidden) hidden states (direction 1 still flipped).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _with_vjp(interpret)(proj, w_hh)


@lru_cache(maxsize=None)
def _with_vjp(interpret: bool):
    """Differentiable wrapper: the Pallas kernel computes the forward; the
    backward differentiates the XLA scan formulation (pallas_call has no
    autodiff rule, and training with the TPU fast path enabled must work —
    e.g. ``train/segmentation.py`` taking grads through PyanNet)."""

    @jax.custom_vjp
    def run(proj, w_hh):
        return _run_kernel(proj, w_hh, interpret)

    def fwd(proj, w_hh):
        return run(proj, w_hh), (proj, w_hh)

    def bwd(residuals, cotangent):
        from ..models.lstm import _bidirectional_scan

        proj, w_hh = residuals
        hidden = proj.shape[-1] // 4
        _, vjp = jax.vjp(lambda p, w: _bidirectional_scan(p, w, hidden), proj, w_hh)
        return vjp(cotangent)

    run.defvjp(fwd, bwd)
    return run


def _pallas_sweep(proj_t, w_hh, interpret, flip_dir1):
    """proj_t: (T, 2, B, 4H) time-major; -> (T, 2, B, H)."""
    time, dirs, batch, gates4 = proj_t.shape
    hidden = gates4 // 4
    # Mosaic tiles the (B, 4H) trailing dims, so the per-step DMA slices
    # need a sublane-aligned batch; tiny batches (e.g. the batch-1 latency
    # path) are zero-padded — batch rows are independent in the recurrence,
    # and the padded rows are sliced off below.
    pad = (-batch) % 8
    if pad:
        proj_t = jnp.pad(proj_t, ((0, 0), (0, 0), (0, pad), (0, 0)))
        batch += pad
    # a bf16 projection stream also runs the recurrent matmul at bf16
    # (f32 accumulation); an f32 stream keeps everything f32/bit-exact
    w_hh = w_hh.astype(proj_t.dtype)
    out = pl.pallas_call(
        partial(_lstm_kernel, flip_dir1=flip_dir1),
        out_shape=jax.ShapeDtypeStruct((time, dirs, batch, hidden), proj_t.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # proj streams via DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh resident
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((dirs, batch, hidden), jnp.float32),  # h (state: f32)
            pltpu.VMEM((dirs, batch, hidden), jnp.float32),  # c (state: f32)
            pltpu.VMEM((2, dirs, batch, gates4), proj_t.dtype),  # x double buffer
            pltpu.VMEM((dirs, batch, hidden), proj_t.dtype),  # out staging
            pltpu.SemaphoreType.DMA((6,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.2e8),
        ),
    )(proj_t, w_hh)
    return out[:, :, : batch - pad] if pad else out


def _run_kernel(proj, w_hh, interpret):
    # time-major HBM layout so per-timestep DMA slices cut an untiled axis
    proj_t = jnp.moveaxis(proj, 2, 0)  # (T, 2, B, 4H)
    out_t = _pallas_sweep(proj_t, w_hh, interpret, flip_dir1=False)
    return jnp.moveaxis(out_t, 0, 2)  # (2, B, T, H)


@partial(jax.jit, static_argnames=("interpret", "block"))
def lstm_sweep_tm(
    proj_t: jnp.ndarray,
    w_hh: jnp.ndarray,
    interpret: bool = None,
    block: int = 0,
) -> jnp.ndarray:
    """Time-major bidirectional sweep over UNREVERSED projections.

    proj_t: (T, 2, B, 4H) — both directions in natural time order (the
    kernel walks direction 1 backwards by indexing, so the caller never
    materializes a time-flipped copy of the gate stream). Returns
    (T, 2, B, H) hidden states, both directions in natural time order.
    Differentiable (backward through the XLA scan formulation).

    block: 0/1 = the per-timestep kernel (one fetch + one writeback DMA
    pair per step). block >= 2 = the DMA-blocked kernel: ``block``
    timesteps per double-buffered fetch/writeback DMA, amortizing the
    per-step DMA start/wait overhead that dominates this latency-bound
    sweep (the per-step recurrent matmul is ~0.3 us against ~2 us of
    measured per-step cost; see PERF.md).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _with_vjp_tm(interpret, int(block))(proj_t, w_hh)


def _tm_reference(proj_t, w_hh):
    """XLA-scan oracle of lstm_sweep_tm (time-major, unreversed layout)."""
    hidden = proj_t.shape[-1] // 4
    proj = jnp.moveaxis(proj_t, 0, 2)  # (2, B, T, 4H) natural order
    flipped = jnp.stack([proj[0], proj[1][:, ::-1]], axis=0)
    out = _bidirectional_scan_lazy(flipped, w_hh, hidden)  # dir1 flipped
    out = jnp.stack([out[0], out[1][:, ::-1]], axis=0)
    return jnp.moveaxis(out, 2, 0)  # (T, 2, B, H)


def _bidirectional_scan_lazy(proj, w_hh, hidden):
    from ..models.lstm import _bidirectional_scan

    return _bidirectional_scan(proj, w_hh, hidden)


@lru_cache(maxsize=None)
def _with_vjp_tm(interpret: bool, block: int = 0):
    @jax.custom_vjp
    def run(proj_t, w_hh):
        # the blocked kernel's epilogue re-fetches a full block window, so
        # it needs at least two full blocks of timesteps
        if block >= 2 and proj_t.shape[0] >= 2 * block:
            return _pallas_sweep_blocked(proj_t, w_hh, interpret, block)
        return _pallas_sweep(proj_t, w_hh, interpret, flip_dir1=True)

    def fwd(proj_t, w_hh):
        return run(proj_t, w_hh), (proj_t, w_hh)

    def bwd(residuals, cotangent):
        _, vjp = jax.vjp(_tm_reference, *residuals)
        return vjp(cotangent)

    run.defvjp(fwd, bwd)
    return run


def _lstm_block_kernel(
    proj_ref, w_hh_ref, out_ref, h_scr, c_scr, x_scr, o_scr, sem, *, block
):
    """DMA-blocked variant of :func:`_lstm_kernel` (flip_dir1 semantics).

    proj_ref/out_ref: (T, 2, B, 4H|H) in HBM, natural time order, NO time
    padding (the caller guarantees T >= 2*block). x_scr/o_scr: (2 slots,
    block, 2, B, 4H|H) VMEM. sem: 8 DMA semaphores — [slot*2 + dir] for
    fetches, [4 + slot*2 + dir] for writebacks.

    Per outer iteration the kernel moves ``block`` timesteps of both
    directions with ONE fetch DMA pair and ONE writeback DMA pair (the
    per-timestep kernel pays 4 DMA start/waits per step), then runs the
    ``block`` recurrence steps unrolled out of VMEM. Writebacks are
    double-buffered: block j's flush is only waited when its staging slot
    is re-staged at block j+2 (and drained at kernel end).

    Direction 1 walks backwards: outer block j fetches natural rows
    [T - (j+1)*block, T - j*block) and the k-th substep consumes staged
    row block-1-k. The T %% block tail is a STATIC epilogue after the
    loop: it fetches the last full-block window (rows [T-block, T) for
    dir 0, [0, block) for dir 1 — re-fetching a few already-consumed rows
    keeps the DMA shape static), computes the remaining r substeps at
    static in-block offsets, and flushes only the r fresh rows of each
    direction with static partial-row DMAs. No zero-padding ever enters
    the recurrence, so no state masking is needed anywhere.
    """
    time, dirs, batch, gates4 = proj_ref.shape
    hidden = gates4 // 4
    out_dtype = out_ref.dtype
    nb = time // block  # full blocks; caller guarantees nb >= 2
    rem = time - nb * block

    h_scr[...] = jnp.zeros_like(h_scr)
    c_scr[...] = jnp.zeros_like(c_scr)

    def fetch(slot, j):
        """Start-of-window offsets for full block j (j may be traced)."""
        return (
            pltpu.make_async_copy(
                proj_ref.at[pl.ds(j * block, block), 0],
                x_scr.at[slot, :, 0],
                sem.at[slot * 2],
            ),
            pltpu.make_async_copy(
                proj_ref.at[pl.ds(time - (j + 1) * block, block), 1],
                x_scr.at[slot, :, 1],
                sem.at[slot * 2 + 1],
            ),
        )

    def fetch_epilogue(slot):
        return (
            pltpu.make_async_copy(
                proj_ref.at[pl.ds(time - block, block), 0],
                x_scr.at[slot, :, 0],
                sem.at[slot * 2],
            ),
            pltpu.make_async_copy(
                proj_ref.at[pl.ds(0, block), 1],
                x_scr.at[slot, :, 1],
                sem.at[slot * 2 + 1],
            ),
        )

    def flush(slot, j):
        return (
            pltpu.make_async_copy(
                o_scr.at[slot, :, 0],
                out_ref.at[pl.ds(j * block, block), 0],
                sem.at[4 + slot * 2],
            ),
            pltpu.make_async_copy(
                o_scr.at[slot, :, 1],
                out_ref.at[pl.ds(time - (j + 1) * block, block), 1],
                sem.at[4 + slot * 2 + 1],
            ),
        )

    def flush_epilogue(slot):
        # only the r fresh rows: dir 0 tail [T-rem, T), dir 1 head [0, rem)
        return (
            pltpu.make_async_copy(
                o_scr.at[slot, pl.ds(block - rem, rem), 0],
                out_ref.at[pl.ds(time - rem, rem), 0],
                sem.at[4 + slot * 2],
            ),
            pltpu.make_async_copy(
                o_scr.at[slot, pl.ds(0, rem), 1],
                out_ref.at[pl.ds(0, rem), 1],
                sem.at[4 + slot * 2 + 1],
            ),
        )

    def substep(slot, k_in, k_out):
        """One recurrence step from staged rows: direction 0 reads staged
        row k_in and stages its output at row k_out; direction 1 reads
        staged row block-1-k_in and stages at block-1-k_out."""
        xt = jnp.stack(
            [x_scr[slot, k_in, 0], x_scr[slot, block - 1 - k_in, 1]]
        )  # (2, B, 4H)
        h = h_scr[...].astype(w_hh_ref.dtype)
        gates = xt.astype(jnp.float32) + jax.lax.dot_general(
            h,
            w_hh_ref[...],
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        i = jax.nn.sigmoid(gates[..., 0 * hidden : 1 * hidden])
        f = jax.nn.sigmoid(gates[..., 1 * hidden : 2 * hidden])
        g = jnp.tanh(gates[..., 2 * hidden : 3 * hidden])
        o = jax.nn.sigmoid(gates[..., 3 * hidden : 4 * hidden])
        c = f * c_scr[...] + i * g
        h_new = o * jnp.tanh(c)
        c_scr[...] = c
        h_scr[...] = h_new
        o_scr[slot, k_out, 0] = h_new[0].astype(out_dtype)
        o_scr[slot, block - 1 - k_out, 1] = h_new[1].astype(out_dtype)

    # warm-up: start block 0's fetch
    for c in fetch(0, 0):
        c.start()

    def outer(j, _):
        slot = jax.lax.rem(j, 2)
        next_slot = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < nb)
        def _():
            for c in fetch(next_slot, j + 1):
                c.start()

        if rem:

            @pl.when(j + 1 == nb)
            def _():
                for c in fetch_epilogue(next_slot):
                    c.start()

        for c in fetch(slot, j):
            c.wait()

        # o_scr[slot] was last flushed by block j-2; drain before restaging
        @pl.when(j >= 2)
        def _():
            for c in flush(slot, j - 2):
                c.wait()

        for k in range(block):
            substep(slot, k, k)

        for c in flush(slot, j):
            c.start()
        return 0

    jax.lax.fori_loop(0, nb, outer, 0)

    if rem:
        slot = nb % 2
        for c in fetch_epilogue(slot):
            c.wait()
        for c in flush(slot, nb - 2):
            c.wait()
        # dir 0's remaining timesteps [T-rem, T) sit at staged rows
        # block-rem..block-1 of the [T-block, T) window; dir 1's remaining
        # positions rem-1..0 are read via block-1-k_in = rem-1-i, i.e.
        # k_in = block-rem+i as well. Staging at k_out = k_in lands the
        # fresh rows exactly where flush_epilogue slices them.
        for i in range(rem):
            substep(slot, block - rem + i, block - rem + i)
        for c in flush_epilogue(slot):
            c.start()
        for c in flush((nb - 1) % 2, nb - 1):
            c.wait()
        for c in flush_epilogue(slot):
            c.wait()
    else:
        for c in flush((nb - 2) % 2, nb - 2):
            c.wait()
        for c in flush((nb - 1) % 2, nb - 1):
            c.wait()


def _pallas_sweep_blocked(proj_t, w_hh, interpret, block):
    """proj_t: (T, 2, B, 4H) time-major natural order -> (T, 2, B, H).

    The caller (:func:`lstm_sweep_tm`) guarantees T >= 2*block. Sub-8
    batches are zero-padded to the sublane tile behind an
    ``optimization_barrier``: XLA:CPU's interpret-mode emulation misreads
    an operand whose batch-axis pad was fused into the kernel call (the
    un-padded layout leaks through; observed 2026-08-20), and the barrier
    forces the padded buffer to materialize. Production batches are
    already sublane-aligned, so the barrier never fires there.
    """
    time, dirs, batch, gates4 = proj_t.shape
    hidden = gates4 // 4
    bpad = (-batch) % 8
    if bpad:
        proj_t = jax.lax.optimization_barrier(
            jnp.pad(proj_t, ((0, 0), (0, 0), (0, bpad), (0, 0)))
        )
    w_hh = w_hh.astype(proj_t.dtype)
    out = pl.pallas_call(
        partial(_lstm_block_kernel, block=block),
        out_shape=jax.ShapeDtypeStruct(
            (time, dirs, batch + bpad, hidden), proj_t.dtype
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # proj streams via DMA
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_hh resident
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((dirs, batch + bpad, hidden), jnp.float32),  # h
            pltpu.VMEM((dirs, batch + bpad, hidden), jnp.float32),  # c
            pltpu.VMEM(
                (2, block, dirs, batch + bpad, gates4), proj_t.dtype
            ),  # x double buffer
            pltpu.VMEM(
                (2, block, dirs, batch + bpad, hidden), proj_t.dtype
            ),  # out staging double buffer
            pltpu.SemaphoreType.DMA((8,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(1.2e8),
        ),
    )(proj_t, w_hh)
    return out[:, :, :batch] if bpad else out

