"""Tests for the jittable ops layer, including parity against the host-exact
oracle blocks (mapping/clustering/aggregation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from diart_tpu.blocks.aggregation import DelayedAggregation
from diart_tpu.blocks.clustering import OnlineSpeakerClustering
from diart_tpu.core import Segment, SlidingWindow, SlidingWindowFeature
from diart_tpu.ops import (
    ClusteringParams,
    aggregate,
    assign_rows,
    binarize,
    build_geometry,
    cluster_step,
    cosine_cdist,
    init_state,
    normalize_embeddings,
    overlapped_speech_penalty,
    resample,
)


class TestFunctional:
    def test_osp_formula(self, rng):
        seg = rng.uniform(0, 1, (2, 50, 4)).astype(np.float32)
        got = np.asarray(overlapped_speech_penalty(jnp.asarray(seg), 3.0, 10.0))
        # independent numpy recomputation of reference functional.py:6-13
        e = np.exp(10.0 * seg)
        probs = e / e.sum(-1, keepdims=True)
        want = np.maximum(seg**3 * probs**3, 1e-8)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)

    def test_osp_clamp(self):
        seg = jnp.zeros((1, 10, 4))
        w = overlapped_speech_penalty(seg)
        assert float(jnp.min(w)) == pytest.approx(1e-8)

    def test_normalize_embeddings(self, rng):
        emb = rng.normal(size=(3, 4, 16)).astype(np.float32)
        out = np.asarray(normalize_embeddings(jnp.asarray(emb), 1.0))
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1), np.ones((3, 4)), rtol=1e-5
        )
        # per-speaker target norms broadcast
        norms = np.full((3, 4, 1), 2.5, dtype=np.float32)
        out = np.asarray(normalize_embeddings(jnp.asarray(emb), jnp.asarray(norms)))
        np.testing.assert_allclose(
            np.linalg.norm(out, axis=-1), 2.5 * np.ones((3, 4)), rtol=1e-5
        )

    def test_cosine_cdist_vs_scipy(self, rng):
        from scipy.spatial.distance import cdist

        x = rng.normal(size=(4, 32))
        y = rng.normal(size=(7, 32))
        got = np.asarray(cosine_cdist(jnp.asarray(x), jnp.asarray(y)))
        want = cdist(x, y, metric="cosine")
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestAssignment:
    @pytest.mark.parametrize("rows,cols", [(1, 5), (2, 8), (3, 20), (4, 20)])
    def test_matches_scipy_cost(self, rng, rows, cols):
        solve = jax.jit(assign_rows)
        for _ in range(25):
            cost = rng.uniform(0, 1, (rows, cols)).astype(np.float32)
            got = np.asarray(solve(jnp.asarray(cost)))
            assert len(set(got.tolist())) == rows  # distinct columns
            want_rows, want_cols = linear_sum_assignment(cost)
            got_total = cost[np.arange(rows), got].sum()
            want_total = cost[want_rows, want_cols].sum()
            assert got_total == pytest.approx(want_total, abs=1e-5)

    def test_with_invalid_entries(self, rng):
        # sentinel-invalidated rows/cols as used by clustering
        cost = rng.uniform(0, 1, (4, 10)).astype(np.float32)
        cost[2, :] = 1e10
        cost[:, 5] = 1e10
        got = np.asarray(assign_rows(jnp.asarray(cost)))
        want_total = cost[linear_sum_assignment(cost)].sum()
        got_total = cost[np.arange(4), got].sum()
        assert got_total == pytest.approx(want_total, rel=1e-6)

    def test_vmappable(self, rng):
        costs = rng.uniform(0, 1, (8, 4, 20)).astype(np.float32)
        batched = jax.jit(jax.vmap(assign_rows))(jnp.asarray(costs))
        for b in range(8):
            want = costs[b][linear_sum_assignment(costs[b])].sum()
            got = costs[b][np.arange(4), np.asarray(batched[b])].sum()
            assert got == pytest.approx(want, abs=1e-5)


def _simulate_stream(rng, num_chunks, num_local=4, dim=16, num_true=3):
    """Synthetic stream with `num_true` well-separated ground-truth speakers."""
    true_emb = rng.normal(size=(num_true, dim))
    true_emb /= np.linalg.norm(true_emb, axis=1, keepdims=True)
    chunks = []
    for _ in range(num_chunks):
        seg = rng.uniform(0, 0.45, (50, num_local))
        emb = rng.normal(scale=0.2, size=(num_local, dim))
        speakers = rng.integers(0, num_true, size=num_local)
        for k in range(num_local):
            if rng.uniform() < 0.7:  # speaker k active in this chunk
                seg[:, k] += rng.uniform(0.3, 0.55)
                emb[k] += true_emb[speakers[k]]
        seg = np.clip(seg, 0, 1).astype(np.float32)
        emb = emb.astype(np.float32)
        chunks.append((seg, emb))
    return chunks


class TestClusteringParity:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3])
    def test_device_matches_host_oracle(self, seed):
        rng = np.random.default_rng(seed)
        chunks = _simulate_stream(rng, num_chunks=25)
        tau, rho, delta, max_spk = 0.5, 0.3, 1.0, 6

        oracle = OnlineSpeakerClustering(tau, rho, delta, "cosine", max_spk)
        params = ClusteringParams(tau, rho, delta)
        state = init_state(max_spk, 16)
        step = jax.jit(lambda s, seg, emb: cluster_step(s, seg, emb, params))

        res = 0.01
        mismatches = 0
        for t, (seg, emb) in enumerate(chunks):
            sw = SlidingWindow(start=t * 0.5, duration=res, step=res)
            want = oracle(SlidingWindowFeature(seg, sw), emb).data
            state, permuted, _ = step(state, jnp.asarray(seg), jnp.asarray(emb))
            got = np.asarray(permuted)
            if not np.allclose(got, want, atol=1e-4):
                mismatches += 1
        # The device path mirrors the oracle's post-threshold re-solve
        # (ops/clustering.py parity notes); on continuous random data
        # (no exact cost ties) it must match the oracle exactly.
        assert mismatches == 0, f"{mismatches} mismatched chunks of {len(chunks)}"

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
    def test_device_matches_host_oracle_low_delta(self, seed):
        """delta_new low enough that assignments routinely fail the
        threshold — the regime where the oracle's re-solve after
        unmap_threshold moves surviving speakers to cheaper columns
        (regression: the device path used to keep the pre-threshold joint
        assignment and diverged on ~16% of random streams)."""
        rng = np.random.default_rng(100 + seed)
        chunks = _simulate_stream(rng, num_chunks=40)
        tau, rho, delta, max_spk = 0.5, 0.3, 0.6, 6

        oracle = OnlineSpeakerClustering(tau, rho, delta, "cosine", max_spk)
        params = ClusteringParams(tau, rho, delta)
        state = init_state(max_spk, 16)
        step = jax.jit(lambda s, seg, emb: cluster_step(s, seg, emb, params))

        res = 0.01
        for t, (seg, emb) in enumerate(chunks):
            sw = SlidingWindow(start=t * 0.5, duration=res, step=res)
            want = oracle(SlidingWindowFeature(seg, sw), emb).data
            state, permuted, _ = step(state, jnp.asarray(seg), jnp.asarray(emb))
            np.testing.assert_allclose(
                np.asarray(permuted), want, atol=1e-4,
                err_msg=f"chunk {t} diverged from the host oracle",
            )

    def test_first_chunk_initializes_actives(self):
        params = ClusteringParams(0.5, 0.3, 1.0)
        state = init_state(4, 8)
        seg = np.zeros((20, 3), dtype=np.float32)
        seg[:, 0] = 0.9
        seg[:, 2] = 0.8
        emb = np.eye(3, 8, dtype=np.float32)
        state, permuted, targets = cluster_step(
            state, jnp.asarray(seg), jnp.asarray(emb), params
        )
        assert np.asarray(targets).tolist() == [0, -1, 1]
        assert np.asarray(state.active).tolist() == [True, True, False, False]
        np.testing.assert_allclose(np.asarray(permuted)[:, 0], seg[:, 0])
        np.testing.assert_allclose(np.asarray(permuted)[:, 1], seg[:, 2])

    def test_nan_embeddings_ignored(self):
        params = ClusteringParams(0.5, 0.3, 1.0)
        state = init_state(4, 8)
        seg = np.full((20, 2), 0.9, dtype=np.float32)
        emb = np.ones((2, 8), dtype=np.float32)
        emb[1] = np.nan
        state, _, targets = cluster_step(
            state, jnp.asarray(seg), jnp.asarray(emb), params
        )
        assert np.asarray(targets).tolist() == [0, -1]


class TestAggregationParity:
    @pytest.mark.parametrize("latency", [0.5, 1.0, 2.0, 5.0])
    def test_hamming_matches_host(self, rng, latency):
        duration, step, frames, dims = 5.0, 0.5, 293, 3
        W = int(round(latency / step))
        geometry = build_geometry(duration, step, latency, frames, "hamming")
        host = DelayedAggregation(step, latency, "hamming", "loose")

        buffers = []  # host list: oldest -> newest
        ring = np.zeros((W, frames, dims), dtype=np.float32)  # newest first
        for t in range(W + 5):
            chunk = rng.uniform(0, 1, (frames, dims)).astype(np.float32)
            sw = SlidingWindow(start=t * step, duration=duration / frames, step=duration / frames)
            buffers.append(SlidingWindowFeature(chunk, sw))
            if len(buffers) > W:
                buffers = buffers[1:]
            ring = np.roll(ring, 1, axis=0)
            ring[0] = chunk
            count = min(t + 1, W)

            want = host(buffers).data
            got = np.asarray(
                aggregate(geometry, jnp.asarray(ring), jnp.asarray(count))
            )
            if t == 0 and latency < duration + 1e-9:
                # host output includes the first-chunk prepend; the device
                # caller reproduces it via geometry.first_indices
                first = chunk[geometry.first_indices].copy()
                first[-geometry.num_out :] = got
                got = first
            np.testing.assert_allclose(got, want, atol=1e-5, err_msg=f"t={t}")

    def test_first_strategy_matches_host(self, rng):
        duration, step, latency, frames = 5.0, 0.5, 2.0, 100
        W = int(round(latency / step))
        geometry = build_geometry(duration, step, latency, frames, "first")
        host = DelayedAggregation(step, latency, "first", "loose")
        buffers, ring = [], np.zeros((W, frames, 2), dtype=np.float32)
        for t in range(W + 3):
            chunk = rng.uniform(0, 1, (frames, 2)).astype(np.float32)
            sw = SlidingWindow(start=t * step, duration=duration / frames, step=duration / frames)
            buffers = (buffers + [SlidingWindowFeature(chunk, sw)])[-W:]
            ring = np.roll(ring, 1, axis=0)
            ring[0] = chunk
            if t == 0:
                continue  # prepend handled separately (hamming test covers it)
            want = host(buffers).data
            got = np.asarray(
                aggregate(geometry, jnp.asarray(ring), jnp.asarray(min(t + 1, W)))
            )
            np.testing.assert_allclose(got, want, atol=1e-6)


class TestBinarize:
    def test_simple_turns(self):
        res = 0.1
        sw = SlidingWindow(start=0.0, duration=res, step=res)
        scores = np.zeros((10, 2))
        scores[2:5, 0] = 0.9  # frames 2,3,4 active
        scores[0:10, 1] = 0.8  # always active
        ann = binarize(SlidingWindowFeature(scores, sw), 0.5, uri="u")
        turns = {
            label: seg for seg, _, label in ann.itertracks(yield_label=True)
        }
        # speaker0: starts middle of frame 2 (0.25), ends middle of frame 5 (0.55)
        assert turns["speaker0"].start == pytest.approx(0.25)
        assert turns["speaker0"].end == pytest.approx(0.55)
        # speaker1: full span, closed by the artificial last frame
        assert turns["speaker1"].start == pytest.approx(0.05)
        assert turns["speaker1"].end == pytest.approx(1.05)

    def test_threshold_strict(self):
        sw = SlidingWindow(start=0.0, duration=0.1, step=0.1)
        scores = np.full((5, 1), 0.5)
        ann = binarize(SlidingWindowFeature(scores, sw), 0.5)
        assert len(ann) == 0  # strictly greater-than

    def test_random_vs_naive_scan(self):
        """The single-pass 2D formulation must match a frame-by-frame scan
        of the reference algorithm (blocks/utils.py:38-52) on random
        activity patterns, incl. first/last-frame-active edges."""
        rng = np.random.default_rng(7)
        res = 0.1
        sw = SlidingWindow(start=0.3, duration=res, step=res)
        for trial in range(50):
            frames = int(rng.integers(1, 12))
            speakers = int(rng.integers(1, 6))
            scores = rng.uniform(0, 1, (frames, speakers))
            if trial % 3 == 0:  # force long runs + saturated columns
                scores[:, 0] = 1.0
                scores[:, -1] = 0.0
            ann = binarize(SlidingWindowFeature(scores, sw), 0.5, uri="u")
            got = sorted(
                (label, round(seg.start, 6), round(seg.end, 6))
                for seg, _, label in ann.itertracks(yield_label=True)
            )
            middles = sw.start + np.arange(frames + 1) * res + 0.5 * res
            want = []
            for spk in range(speakers):
                on = None
                for t in range(frames + 1):
                    active = t < frames and scores[t, spk] > 0.5
                    if active and on is None:
                        on = t
                    elif not active and on is not None:
                        want.append(
                            (f"speaker{spk}", round(middles[on], 6),
                             round(middles[t], 6))
                        )
                        on = None
            assert got == sorted(want)

    def test_rttm_fast_path_exact(self):
        """binarize_rttm must produce the EXACT string of
        binarize(...).to_rttm() — same turn set, ordering (incl. identical-
        segment ties resolved by str(track)), and %.3f rendering."""
        from diart_tpu.ops.binarize import binarize_rttm

        rng = np.random.default_rng(11)
        for trial in range(60):
            frames = int(rng.integers(1, 40))
            speakers = int(rng.integers(1, 8))
            scores = rng.uniform(0, 1, (frames, speakers))
            if trial % 4 == 0:
                # quantize so several speakers share identical on/off
                # frames -> identical segments, exercising the tie order
                scores = np.round(scores)
            res = float(rng.choice([0.016875, 0.1, 0.5]))
            start = float(rng.uniform(0, 100))
            sw = SlidingWindow(start=start, duration=res, step=res)
            th = float(rng.choice([0.3, 0.5, 0.9]))
            uri = None if trial % 5 == 0 else f"u{trial}"
            swf = SlidingWindowFeature(scores, sw)
            assert binarize_rttm(swf, th, uri=uri) == binarize(
                swf, th, uri=uri
            ).to_rttm()

    def test_rttm_batch_matches_per_stream(self):
        """batch_binarize_rttm (one transition pass for the whole hop) must
        equal the per-stream binarize().to_rttm() route for every stream,
        including all-inactive streams (empty string)."""
        from diart_tpu.ops.binarize import batch_binarize_rttm

        rng = np.random.default_rng(12)
        b, frames, speakers = 7, 23, 5
        data = rng.uniform(0, 1, (b, frames, speakers))
        data[3] = 0.0  # silent stream
        data[5] = np.round(data[5])  # tie-heavy stream
        res = 0.016875
        starts = rng.uniform(0, 50, (b,))
        uris = [f"c{i}" if i % 2 else None for i in range(b)]
        got = batch_binarize_rttm(data, starts, res, 0.5, uris)
        for i in range(b):
            sw = SlidingWindow(start=float(starts[i]), duration=res, step=res)
            want = binarize(
                SlidingWindowFeature(data[i], sw), 0.5, uri=uris[i]
            ).to_rttm()
            assert got[i] == want, f"stream {i}"


class TestResample:
    def test_tone_preserved(self):
        sr_in, sr_out, f0 = 48000, 16000, 440.0
        t = np.arange(sr_in) / sr_in
        x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
        y = np.asarray(resample(jnp.asarray(x), sr_in, sr_out))
        assert y.shape[0] == sr_out
        # dominant frequency survives
        spec = np.abs(np.fft.rfft(y))
        peak = np.argmax(spec) * sr_out / y.shape[0]
        assert peak == pytest.approx(f0, abs=2.0)

    def test_shapes(self):
        x = jnp.zeros((2, 3, 44100))
        y = resample(x, 44100, 16000)
        assert y.shape == (2, 3, 16000)

    def test_identity(self):
        x = jnp.ones((100,))
        assert resample(x, 16000, 16000) is x


class TestPallasLSTM:
    def test_unaligned_hidden_falls_back_to_scan(self, rng, monkeypatch):
        """Mosaic needs 128-lane-aligned gate slices, so BiLSTM must route
        non-multiple-of-128 hidden sizes (custom small models) to the XLA
        scan even when the pallas path is requested — a hidden=64 model
        previously failed to compile on TPU (memref slice alignment)."""
        import diart_tpu.ops.pallas_lstm as pallas_lstm
        from diart_tpu.models.lstm import BiLSTM

        def boom(*_a, **_k):  # the kernel must never be invoked
            raise AssertionError("pallas sweep called for unaligned hidden")

        monkeypatch.setattr(pallas_lstm, "lstm_sweep_tm", boom)
        x = jnp.asarray(rng.normal(size=(2, 9, 12)).astype(np.float32))
        model = BiLSTM(hidden_size=96, num_layers=1, use_pallas=True)
        out, _ = model.init_with_output(jax.random.PRNGKey(0), x)
        assert out.shape == (2, 9, 2 * 96)

    def test_interpret_matches_scan(self, rng):
        from diart_tpu.models.lstm import _bidirectional_scan
        from diart_tpu.ops.pallas_lstm import lstm_sweep

        D, B, T, H = 2, 3, 17, 8
        proj = jnp.asarray(rng.normal(size=(D, B, T, 4 * H)).astype(np.float32))
        w_hh = jnp.asarray(
            rng.normal(scale=0.3, size=(D, 4 * H, H)).astype(np.float32)
        )
        want = np.asarray(_bidirectional_scan(proj, w_hh, H))
        got = np.asarray(lstm_sweep(proj, w_hh, interpret=True))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_time_major_sweep_matches_scan(self, rng):
        """lstm_sweep_tm (unreversed, time-major; the kernel indexes
        direction 1 backwards) == the scan over the flipped layout."""
        from diart_tpu.models.lstm import _bidirectional_scan
        from diart_tpu.ops.pallas_lstm import lstm_sweep_tm

        D, B, T, H = 2, 3, 17, 8
        proj = jnp.asarray(rng.normal(size=(D, B, T, 4 * H)).astype(np.float32))
        w_hh = jnp.asarray(
            rng.normal(scale=0.3, size=(D, 4 * H, H)).astype(np.float32)
        )
        flipped = jnp.stack([proj[0], proj[1][:, ::-1]], axis=0)
        out = _bidirectional_scan(flipped, w_hh, H)  # dir1 flipped
        want = np.asarray(jnp.stack([out[0], out[1][:, ::-1]], axis=0))

        proj_t = jnp.moveaxis(proj, 2, 0)  # (T, 2, B, 4H) natural order
        got_t = lstm_sweep_tm(proj_t, w_hh, interpret=True)
        got = np.asarray(jnp.moveaxis(got_t, 0, 2))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_batch_one_padding(self, rng):
        """The batch-1 latency path: Mosaic rejects sub-sublane DMA slices
        of the (B, 4H)-tiled gate stream, so tiny batches are zero-padded
        inside the sweep and sliced back (the engine at batch_size=1
        crashed on TPU before this was pinned)."""
        from diart_tpu.models.lstm import _bidirectional_scan
        from diart_tpu.ops.pallas_lstm import lstm_sweep, lstm_sweep_tm

        D, B, T, H = 2, 1, 11, 8
        proj = jnp.asarray(rng.normal(size=(D, B, T, 4 * H)).astype(np.float32))
        w_hh = jnp.asarray(
            rng.normal(scale=0.3, size=(D, 4 * H, H)).astype(np.float32)
        )
        want = np.asarray(_bidirectional_scan(proj, w_hh, H))
        got = np.asarray(lstm_sweep(proj, w_hh, interpret=True))
        assert got.shape == (D, B, T, H)
        np.testing.assert_allclose(got, want, atol=1e-5)

        flipped = jnp.stack([proj[0], proj[1][:, ::-1]], axis=0)
        out = _bidirectional_scan(flipped, w_hh, H)
        want_tm = np.asarray(jnp.stack([out[0], out[1][:, ::-1]], axis=0))
        got_t = lstm_sweep_tm(jnp.moveaxis(proj, 2, 0), w_hh, interpret=True)
        assert got_t.shape == (T, D, B, H)
        np.testing.assert_allclose(
            np.asarray(jnp.moveaxis(got_t, 0, 2)), want_tm, atol=1e-5
        )

    def test_time_major_sweep_grad(self, rng):
        from diart_tpu.ops.pallas_lstm import _tm_reference, lstm_sweep_tm

        D, B, T, H = 2, 2, 9, 8
        proj_t = jnp.asarray(rng.normal(size=(T, D, B, 4 * H)).astype(np.float32))
        w_hh = jnp.asarray(
            rng.normal(scale=0.3, size=(D, 4 * H, H)).astype(np.float32)
        )
        gp = jax.grad(
            lambda p, w: jnp.sum(lstm_sweep_tm(p, w, interpret=True) ** 2),
            argnums=(0, 1),
        )(proj_t, w_hh)
        gr = jax.grad(
            lambda p, w: jnp.sum(_tm_reference(p, w) ** 2), argnums=(0, 1)
        )(proj_t, w_hh)
        for a, b in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_grad_flows_through_sweep(self, rng):
        """Training with the Pallas fast path on must work: the kernel's
        custom VJP differentiates the scan formulation, so grads through
        lstm_sweep == grads through the scan."""
        from diart_tpu.models.lstm import _bidirectional_scan
        from diart_tpu.ops.pallas_lstm import lstm_sweep

        D, B, T, H = 2, 2, 9, 8
        proj = jnp.asarray(rng.normal(size=(D, B, T, 4 * H)).astype(np.float32))
        w_hh = jnp.asarray(
            rng.normal(scale=0.3, size=(D, 4 * H, H)).astype(np.float32)
        )

        def loss_pallas(p, w):
            return jnp.sum(lstm_sweep(p, w, interpret=True) ** 2)

        def loss_scan(p, w):
            return jnp.sum(_bidirectional_scan(p, w, H) ** 2)

        gp = jax.grad(loss_pallas, argnums=(0, 1))(proj, w_hh)
        gs = jax.grad(loss_scan, argnums=(0, 1))(proj, w_hh)
        for a, b in zip(gp, gs):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_bf16_stream_close_to_f32(self, rng):
        """The reduced-bandwidth bf16 stream keeps gate math and the cell
        state in f32; hidden states may only differ by bf16 rounding of the
        projections/weights/outputs."""
        from diart_tpu.models.lstm import _bidirectional_scan
        from diart_tpu.ops.pallas_lstm import lstm_sweep

        D, B, T, H = 2, 3, 29, 8
        proj = jnp.asarray(rng.normal(size=(D, B, T, 4 * H)).astype(np.float32))
        w_hh = jnp.asarray(
            rng.normal(scale=0.3, size=(D, 4 * H, H)).astype(np.float32)
        )
        want = np.asarray(_bidirectional_scan(proj, w_hh, H))
        got = np.asarray(
            lstm_sweep(proj.astype(jnp.bfloat16), w_hh, interpret=True)
        )
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(got.astype(np.float32), want, atol=0.05)

    def test_bilstm_module_pallas_flag(self, rng):
        from diart_tpu.models.lstm import BiLSTM

        x = jnp.asarray(rng.normal(size=(2, 11, 6)).astype(np.float32))
        ref_model = BiLSTM(hidden_size=8, num_layers=2, use_pallas=False)
        params = ref_model.init(jax.random.PRNGKey(0), x)
        want = np.asarray(ref_model.apply(params, x))
        # pallas path compiles on TPU; on CPU it runs via pallas interpret
        # machinery only when requested, so emulate via interpret env
        from diart_tpu.ops import pallas_lstm

        orig = pallas_lstm.lstm_sweep
        pallas_lstm.lstm_sweep = lambda p, w: orig(p, w, interpret=True)
        try:
            pl_model = BiLSTM(hidden_size=8, num_layers=2, use_pallas=True)
            got = np.asarray(pl_model.apply(params, x))
        finally:
            pallas_lstm.lstm_sweep = orig
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestLongStreamDrift:
    def test_accumulated_der_divergence_bounded(self):
        """500-chunk stream: tie-break differences between the device
        clustering and the host oracle feed back through centroid state;
        the *accumulated* disagreement must stay below a 0.5% DER budget
        (VERDICT r1 item 10)."""
        from diart_tpu.metrics import DiarizationErrorRate
        from diart_tpu.core.annotation import Annotation

        rng = np.random.default_rng(7)
        num_chunks = 500
        chunks = _simulate_stream(rng, num_chunks=num_chunks)
        tau, rho, delta, max_spk = 0.5, 0.3, 1.0, 6

        oracle = OnlineSpeakerClustering(tau, rho, delta, "cosine", max_spk)
        params = ClusteringParams(tau, rho, delta)
        state = init_state(max_spk, 16)
        step = jax.jit(lambda s, seg, emb: cluster_step(s, seg, emb, params))

        res = 0.01

        def binarize_into(annotation, scores, t0, prefix):
            active = scores > tau
            for k in range(scores.shape[1]):
                on = None
                for f in range(scores.shape[0]):
                    if active[f, k] and on is None:
                        on = f
                    elif not active[f, k] and on is not None:
                        annotation[Segment(t0 + on * res, t0 + f * res), k] = f"{prefix}{k}"
                        on = None
                if on is not None:
                    annotation[
                        Segment(t0 + on * res, t0 + scores.shape[0] * res), k
                    ] = f"{prefix}{k}"

        ref_ann = Annotation("drift")
        hyp_ann = Annotation("drift")
        for t, (seg, emb) in enumerate(chunks):
            sw = SlidingWindow(start=t * 0.5, duration=res, step=res)
            want = oracle(SlidingWindowFeature(seg, sw), emb).data
            state, permuted, _ = step(state, jnp.asarray(seg), jnp.asarray(emb))
            got = np.asarray(permuted)
            binarize_into(ref_ann, want, t * 0.5, "spk")
            binarize_into(hyp_ann, got, t * 0.5, "spk")

        der = DiarizationErrorRate()
        drift = der(ref_ann.support(0.01), hyp_ann.support(0.01))
        assert drift < 0.005, f"accumulated device-vs-oracle DER drift {drift:.4f}"
