"""Golden tests for the L0 sparse core (keys, voxelize, segment ops) against
tiny numpy oracles — the op-level test tier the reference never had
(SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from softgroup_tpu.ops import keys as K
from softgroup_tpu.ops.segment import (offsets_to_segment_ids, segment_max,
                                       segment_mean, segment_min, segment_sum)
from softgroup_tpu.ops.voxelize import (devoxelize, voxel_features, voxelize,
                                        voxelize_np)

DIMS = jnp.array([64, 64, 64], jnp.int32)


def random_coords(rng, n, extent=20, batch=2):
    b = rng.randint(0, batch, size=(n, 1))
    xyz = rng.randint(0, extent, size=(n, 3))
    return np.concatenate([b, xyz], axis=1).astype(np.int32)


class TestLookup:

    def test_lookup_finds_all_and_only_table_keys(self, rng):
        table = np.unique(random_coords(rng, 50), axis=0)
        t_hi, t_lo = K.pack_coords(jnp.asarray(table), DIMS)
        queries = random_coords(rng, 200)
        q_hi, q_lo = K.pack_coords(jnp.asarray(queries), DIMS)
        got = np.asarray(K.lookup(q_hi, q_lo, t_hi, t_lo))

        table_set = {tuple(r) for r in table.tolist()}
        for qi, q in enumerate(queries.tolist()):
            if tuple(q) in table_set:
                assert (table[got[qi]] == q).all()
            else:
                assert got[qi] == -1

    def test_lookup_respects_table_validity(self, rng):
        table = np.unique(random_coords(rng, 30), axis=0)
        t_hi, t_lo = K.pack_coords(jnp.asarray(table), DIMS)
        t_valid = jnp.arange(len(table)) < 10
        q_hi, q_lo = t_hi, t_lo
        got = np.asarray(K.lookup(q_hi, q_lo, t_hi, t_lo, t_valid))
        np.testing.assert_array_equal(got[:10], np.arange(10))
        assert (got[10:] == -1).all()

    def test_lookup_invalid_query_key(self, rng):
        table = np.unique(random_coords(rng, 10), axis=0)
        t_hi, t_lo = K.pack_coords(jnp.asarray(table), DIMS)
        q_hi = jnp.array([K.INVALID_KEY], jnp.int32)
        q_lo = jnp.array([K.INVALID_KEY], jnp.int32)
        assert int(K.lookup(q_hi, q_lo, t_hi, t_lo)[0]) == -1


class TestVoxelize:

    @pytest.mark.parametrize("n,cap", [(100, 128), (500, 512)])
    def test_matches_numpy_oracle(self, rng, n, cap):
        coords = random_coords(rng, n, extent=8)
        valid = np.ones(n, bool)
        valid[n - 7:] = False  # padding tail
        vx = voxelize(jnp.asarray(coords), jnp.asarray(valid), DIMS, cap)

        ref_vc, ref_p2v, ref_counts = voxelize_np(coords[valid])
        m = len(ref_vc)
        assert int(vx.n_voxels) == m
        got_vc = np.asarray(vx.vox_coords)[:m]
        # both sorted by key -> identical order
        np.testing.assert_array_equal(got_vc, ref_vc)
        got_p2v = np.asarray(vx.p2v)
        np.testing.assert_array_equal(got_p2v[valid], ref_p2v)
        assert (got_p2v[~valid] == cap).all()
        assert np.asarray(vx.vox_valid).sum() == m

    def test_voxelize_linear_overflow_goes_to_dustbin(self, rng):
        """Voxels beyond capacity must route to the dustbin row (p2v ==
        capacity), never merge into row capacity-1."""
        from softgroup_tpu.ops.voxelize import voxelize_linear
        n = 256
        # 256 distinct voxels, capacity 128 -> 128 overflow
        coords = np.stack([np.zeros(n, np.int32),
                           np.arange(n, dtype=np.int32) % 16,
                           np.arange(n, dtype=np.int32) // 16,
                           np.zeros(n, np.int32)], axis=1)
        cap = 128
        vx, ckey = voxelize_linear(jnp.asarray(coords), jnp.ones(n, bool),
                                   DIMS, cap)
        assert int(vx.n_voxels) == 256  # true count still reported
        p2v = np.asarray(vx.p2v)
        in_cap = p2v < cap
        assert in_cap.sum() == cap
        # the kept voxels are the lowest-key 128, each with ONE point
        assert (np.bincount(p2v[in_cap], minlength=cap) == 1).all()
        # overflow points hit the dustbin, not row cap-1
        assert (p2v[~in_cap] == cap).all()

    def test_voxel_features_mean_and_devoxelize(self, rng):
        n, cap = 200, 256
        coords = random_coords(rng, n, extent=4)
        valid = np.ones(n, bool)
        feats = rng.randn(n, 5).astype(np.float32)
        vx = voxelize(jnp.asarray(coords), jnp.asarray(valid), DIMS, cap)
        vf = np.asarray(voxel_features(jnp.asarray(feats), vx.p2v, cap))

        ref_vc, ref_p2v, _ = voxelize_np(coords)
        for v in range(len(ref_vc)):
            np.testing.assert_allclose(
                vf[v], feats[ref_p2v == v].mean(0), rtol=1e-5)
        back = np.asarray(devoxelize(jnp.asarray(vf), vx.p2v))
        np.testing.assert_allclose(back, vf[ref_p2v], rtol=1e-6)


class TestSegment:

    def test_mean_min_max_sum_against_numpy(self, rng):
        n, nseg = 300, 17
        ids = rng.randint(0, nseg + 1, size=n)  # nseg -> some dustbin rows
        vals = rng.randn(n, 3).astype(np.float32)
        jid, jval = jnp.asarray(ids), jnp.asarray(vals)
        got_sum = np.asarray(segment_sum(jval, jid, nseg))
        got_mean = np.asarray(segment_mean(jval, jid, nseg))
        got_min = np.asarray(segment_min(jval, jid, nseg))
        got_max = np.asarray(segment_max(jval, jid, nseg))
        for s in range(nseg):
            rows = vals[ids == s]
            if len(rows) == 0:
                np.testing.assert_allclose(got_mean[s], 0)
                np.testing.assert_allclose(got_min[s], 0)
                np.testing.assert_allclose(got_max[s], 0)
            else:
                np.testing.assert_allclose(got_sum[s], rows.sum(0), rtol=1e-5)
                np.testing.assert_allclose(got_mean[s], rows.mean(0), rtol=1e-5)
                np.testing.assert_allclose(got_min[s], rows.min(0))
                np.testing.assert_allclose(got_max[s], rows.max(0))

    def test_sorted_segment_minmax_matches_scatter_path(self, rng):
        from softgroup_tpu.ops.segment import (segment_mean_fused,
                                               sorted_segment_minmax)
        # three shapes cover the cases (odd nseg + small block, degenerate
        # 1-segment, many-segment big): each variant compiles 5 programs on
        # the 1-core CI host, so keep the set minimal
        for nseg, n, block in [(17, 512, 64), (1, 256, 128),
                               (256, 2048, 128)]:
            ids = np.sort(rng.randint(0, nseg + 1, size=n))  # sorted + dustbin
            vals = rng.randn(n, 3).astype(np.float32)
            jid, jval = jnp.asarray(ids), jnp.asarray(vals)
            got_min, got_max = sorted_segment_minmax(jval, jid, nseg, block)
            ref_min = np.asarray(segment_min(jval, jid, nseg))
            ref_max = np.asarray(segment_max(jval, jid, nseg))
            np.testing.assert_allclose(np.asarray(got_min), ref_min)
            np.testing.assert_allclose(np.asarray(got_max), ref_max)
            got_mean = np.asarray(segment_mean_fused(jval, jid, nseg))
            ref_mean = np.asarray(segment_mean(jval, jid, nseg))
            np.testing.assert_allclose(got_mean, ref_mean, rtol=1e-5)

    def test_offsets_to_segment_ids(self):
        offsets = jnp.array([0, 3, 3, 7], jnp.int32)
        ids = np.asarray(offsets_to_segment_ids(offsets, 9))
        np.testing.assert_array_equal(ids, [0, 0, 0, 2, 2, 2, 2, 3, 3])

    def test_segment_mean_grad_matches_reference_backward(self, rng):
        """voxelize_bp scatters grad/count back to points (voxelize.cu:42-62)."""
        import jax
        n, nseg = 40, 5
        ids = jnp.asarray(rng.randint(0, nseg, size=n))
        vals = jnp.asarray(rng.randn(n, 2).astype(np.float32))
        g = jax.grad(lambda v: segment_mean(v, ids, nseg).sum())(vals)
        counts = np.bincount(np.asarray(ids), minlength=nseg)
        expect = 1.0 / counts[np.asarray(ids)]
        np.testing.assert_allclose(np.asarray(g)[:, 0], expect, rtol=1e-5)


class TestDevoxKernel:
    def test_devoxelize_kernel_and_vjp_match_xla(self, rng):
        """The monotone devoxelize kernel (production dispatch: bf16 feats,
        sorted p2v) and its custom VJP must match the plain-gather path."""
        import jax
        import jax.numpy as jnp
        from softgroup_tpu.ops import dispatch
        from softgroup_tpu.ops.voxelize import devoxelize
        v, p, c = 640, 1024, 16
        vox = jnp.asarray(rng.randn(v, c), jnp.bfloat16)
        p2v = jnp.asarray(np.sort(rng.randint(0, v, p)).astype(np.int32))
        cot = jnp.asarray(rng.randn(p, c), jnp.bfloat16)

        def loss(x):
            return jnp.vdot(devoxelize(x, p2v).astype(jnp.float32),
                            cot.astype(jnp.float32))

        ref_out = np.asarray(vox[p2v], np.float32)
        ref_g = np.asarray(jax.grad(loss)(vox), np.float32)
        dispatch.set_kernels(True)
        dispatch.set_interpret(True)
        try:
            out = np.asarray(devoxelize(vox, p2v), np.float32)
            g = np.asarray(jax.grad(loss)(vox), np.float32)
        finally:
            dispatch.set_kernels(None)
            dispatch.set_interpret(None)
        np.testing.assert_allclose(out, ref_out, rtol=0.02, atol=0.02)
        np.testing.assert_allclose(g, ref_g, rtol=0.02, atol=0.05)
