"""Windowed monotone row-gather kernel vs numpy oracle (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from softgroup_tpu.ops.gather_kernel import (bf16x3_sum, f32_to_bf16x3,
                                             monotone_gather_f32,
                                             monotone_row_gather,
                                             monotone_window_overflow)


@pytest.fixture
def rng():
    return np.random.RandomState(7)


class TestSplit:
    def test_bf16x3_roundtrip_exact(self, rng):
        x = (rng.randn(64, 3) * 50).astype(np.float32)
        y = f32_to_bf16x3(jnp.asarray(x))
        back = bf16x3_sum(
            jnp.concatenate([y[:, :3].astype(jnp.float32),
                             y[:, 3:6].astype(jnp.float32),
                             y[:, 6:9].astype(jnp.float32)], axis=1), 3)
        assert (np.asarray(back) == x).all()


class TestMonotoneGather:
    def test_matches_oracle_bf16(self, rng):
        v, e, b, w = 1024, 512, 128, 192
        src = rng.randn(v, 8).astype(np.float32)
        srcb = jnp.asarray(src).astype(jnp.bfloat16)
        idx = np.sort(rng.randint(0, v, size=e)).astype(np.int32)
        got = monotone_row_gather(srcb, jnp.asarray(idx), block_b=b,
                                  window_w=w, interpret=True)
        ref = np.asarray(srcb)[idx].astype(np.float32)
        ok = monotone_window_overflow(jnp.asarray(idx), b, w, v)
        if int(ok) == 0:
            assert np.array_equal(np.asarray(got), ref)

    def test_exact_f32_with_extra(self, rng):
        v, e = 2048, 1024
        src = (rng.randn(v, 4) * 100).astype(np.float32)
        extra = rng.randint(0, 20, size=(v, 6)).astype(np.float32)
        # dense monotone indices: span per block <= b
        idx = np.sort(rng.randint(0, v, size=e)).astype(np.int32)
        n_bad = int(monotone_window_overflow(jnp.asarray(idx), 256, 1024, v))
        out, ex = monotone_gather_f32(jnp.asarray(src), jnp.asarray(idx),
                                      jnp.asarray(extra), block_b=256,
                                      window_w=1024, interpret=True)
        assert n_bad == 0
        assert np.array_equal(np.asarray(out), src[idx])
        assert np.array_equal(np.asarray(ex), extra[idx])

    def test_slowly_increasing_index_never_overflows(self, rng):
        # cid_s-style stream: increments of 0/1 — span per block <= b
        v, e, b, w = 4096, 2048, 256, 384
        idx = np.cumsum(rng.randint(0, 2, size=e)).astype(np.int32)
        assert idx[-1] < v
        src = rng.randn(v, 1).astype(np.float32)
        assert int(monotone_window_overflow(jnp.asarray(idx), b, w, v)) == 0
        out = monotone_gather_f32(jnp.asarray(src), jnp.asarray(idx),
                                  block_b=b, window_w=w, interpret=True)
        assert np.array_equal(np.asarray(out), src[idx])

    def test_overflow_detected_on_sparse_stream(self, rng):
        # big jumps: per-block span >> window
        e, b, w = 512, 128, 192
        idx = (np.arange(e, dtype=np.int32) * 37)
        v = int(idx[-1]) + 1
        assert int(monotone_window_overflow(jnp.asarray(idx), b, w, v)) > 0


class TestMonotoneSegmentSum:
    """monotone_segment_sum (the devoxelize-backward kernel) vs
    jax.ops.segment_sum on sorted segment ids."""

    def test_matches_segment_sum(self, rng):
        from softgroup_tpu.ops.gather_kernel import monotone_segment_sum
        n, v, c = 2048, 1536, 32
        # sorted ids with duplicate runs + a clipped tail (pad rows clip to
        # v-1, like devoxelize's idx)
        seg = np.sort(rng.randint(0, v, size=n)).astype(np.int32)
        seg[-64:] = v - 1
        vals = rng.randn(n, c).astype(np.float32).astype(jnp.bfloat16)
        out = monotone_segment_sum(jnp.asarray(vals), jnp.asarray(seg), v,
                                   block_b=256, window_w=1024,
                                   interpret=True)
        import jax
        ref = jax.ops.segment_sum(jnp.asarray(vals).astype(jnp.float32),
                                  jnp.asarray(seg), num_segments=v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-5)

    def test_overflow_falls_back(self, rng):
        """One segment holding more rows than the window must still be
        exact (lax.cond fallback to segment_sum)."""
        from softgroup_tpu.ops.gather_kernel import monotone_segment_sum
        n, v, c = 2048, 512, 8
        seg = np.zeros(n, np.int32)       # all rows in segment 0
        seg[-4:] = v - 1
        vals = rng.randn(n, c).astype(np.float32).astype(jnp.bfloat16)
        out = monotone_segment_sum(jnp.asarray(vals), jnp.asarray(seg), v,
                                   block_b=256, window_w=1024,
                                   interpret=True)
        import jax
        ref = jax.ops.segment_sum(jnp.asarray(vals).astype(jnp.float32),
                                  jnp.asarray(seg), num_segments=v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-4)

    def test_pad_tail_dropped(self, rng):
        """A capacity-pad tail (seg == num_segments) must not overflow the
        windows nor contribute — devoxelize-backward's layout."""
        from softgroup_tpu.ops.gather_kernel import monotone_segment_sum
        n, v, c = 2048, 512, 16
        seg = np.sort(rng.randint(0, v, size=n - 700)).astype(np.int32)
        seg = np.concatenate([seg, np.full(700, v, np.int32)])
        vals = rng.randn(n, c).astype(np.float32).astype(jnp.bfloat16)
        out = monotone_segment_sum(jnp.asarray(vals), jnp.asarray(seg), v,
                                   block_b=256, window_w=1024,
                                   interpret=True)
        import jax
        ref = jax.ops.segment_sum(
            jnp.asarray(vals[:n - 700]).astype(jnp.float32),
            jnp.asarray(seg[:n - 700]), num_segments=v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-5)


class TestGatherRowsSegsumVjp:

    def test_forward_and_grad_match_plain_gather(self, rng):
        from softgroup_tpu.ops import dispatch
        from softgroup_tpu.ops.gather_kernel import gather_rows_segsum_vjp
        import jax
        v, e, c = 512, 1152, 5
        src = rng.randn(v, c).astype(np.float32)
        idx = rng.randint(0, v, size=e).astype(np.int32)
        ct = rng.randn(e, c).astype(np.float32)

        def f(s):
            return jnp.sum(gather_rows_segsum_vjp(s, jnp.asarray(idx))
                           * jnp.asarray(ct))

        def ref(s):
            return jnp.sum(s[jnp.asarray(idx)] * jnp.asarray(ct))

        out = gather_rows_segsum_vjp(jnp.asarray(src), jnp.asarray(idx))
        assert np.array_equal(np.asarray(out), src[idx])
        # CPU fallback branch
        g1 = np.asarray(jax.grad(f)(jnp.asarray(src)))
        g0 = np.asarray(jax.grad(ref)(jnp.asarray(src)))
        np.testing.assert_allclose(g1, g0, rtol=1e-6, atol=1e-6)
        # kernel branch in interpret mode (e % 128 == 0, v % 256 == 0)
        dispatch.set_kernels(True)
        dispatch.set_interpret(True)
        try:
            g2 = np.asarray(jax.grad(f)(jnp.asarray(src)))
        finally:
            dispatch.set_kernels(None)
            dispatch.set_interpret(None)
        np.testing.assert_allclose(g2, g0, rtol=1e-6, atol=1e-5)
