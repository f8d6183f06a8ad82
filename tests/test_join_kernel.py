"""Windowed monotone neighbour-cell join kernel vs oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from softgroup_tpu.ops.join_kernel import (_INT_MAX, cell_neighbor_join,
                                           xla_cell_join)


def make_case(rng, m=512, n_valid=400, rdim=7, radius=0.3, spread=1.0,
              dims=(12, 13, 11)):
    """Sorted unique linear cell keys + coords + centroids + offsets."""
    D = np.asarray(dims, np.int32)
    total = int(D[0] * D[1] * D[2])
    lin = np.sort(rng.choice(total, size=n_valid,
                             replace=False)).astype(np.int32)
    table = np.full((m,), _INT_MAX, np.int32)
    table[:n_valid] = lin
    cz = lin % D[2]
    cy = (lin // D[2]) % D[1]
    cx = lin // (D[1] * D[2])
    ccoord = np.zeros((m, 3), np.int32)
    ccoord[:n_valid] = np.stack([cx, cy, cz], axis=1)
    centroid = rng.uniform(-spread, spread, size=(m, 3)).astype(np.float32)
    offs = tuple({(int(o[0]), int(o[1]), int(o[2]))
                  for o in rng.randint(-2, 3, size=(rdim, 3))})
    return (jnp.asarray(table), jnp.asarray(centroid), jnp.asarray(ccoord),
            jnp.asarray(D), offs, radius)


def brute_join(table, centroid, ccoord, D, offs, radius):
    table, centroid = np.asarray(table), np.asarray(centroid)
    ccoord, D = np.asarray(ccoord), np.asarray(D)
    m = len(table)
    out = np.full((len(offs), m), -1, np.int32)
    for r, off in enumerate(offs):
        for i in range(m):
            if table[i] == _INT_MAX:
                continue
            nc = ccoord[i] + np.asarray(off, np.int32)
            if (nc < 0).any() or (nc >= D).any():
                continue
            q = (nc[0] * D[1] + nc[1]) * D[2] + nc[2]
            js = np.where(table == q)[0]
            if len(js) == 0:
                continue
            j = int(js[0])
            if np.sum((centroid[i] - centroid[j]) ** 2) <= radius ** 2:
                out[r, i] = j
    return out


class TestCellNeighborJoin:

    @pytest.fixture
    def rng(self):
        return np.random.RandomState(0)

    def test_oracle_matches_brute_force(self, rng):
        table, centroid, ccoord, D, offs, radius = make_case(
            rng, m=256, n_valid=200)
        want = brute_join(table, centroid, ccoord, D, offs, radius)
        got = xla_cell_join(table, centroid, ccoord, D,
                            np.asarray(offs, np.int32), radius)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_matches_oracle(self, rng):
        table, centroid, ccoord, D, offs, radius = make_case(rng)
        got = cell_neighbor_join(table, centroid, ccoord, D, offs, radius,
                                 block_b=64, window_w=256, interpret=True,
                                 force_kernel=True)
        want = xla_cell_join(table, centroid, ccoord, D,
                             np.asarray(offs, np.int32), radius)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_zero_offset_hits_self(self, rng):
        table, centroid, ccoord, D, _, _ = make_case(rng, spread=0.0)
        n_valid = int((np.asarray(table) != _INT_MAX).sum())
        got = cell_neighbor_join(table, centroid, ccoord, D, ((0, 0, 0),),
                                 0.5, block_b=64, window_w=256,
                                 interpret=True, force_kernel=True)
        got = np.asarray(got)[0]
        np.testing.assert_array_equal(got[:n_valid], np.arange(n_valid))
        assert (got[n_valid:] == -1).all()

    def test_radius_gate(self, rng):
        table, centroid, ccoord, D, offs, _ = make_case(rng, spread=2.0)
        tight = np.asarray(cell_neighbor_join(
            table, centroid, ccoord, D, offs, 1e-6, block_b=64,
            window_w=256, interpret=True, force_kernel=True))
        want = np.asarray(xla_cell_join(table, centroid, ccoord, D,
                                        np.asarray(offs, np.int32), 1e-6))
        np.testing.assert_array_equal(tight, want)

    def test_overflow_falls_back(self, rng):
        # adversarial: block 0's keys span a gap holding > w table rows, so
        # its query window (which must cover all of the block's query
        # positions) overflows and the lax.cond picks the XLA fallback
        m = 1024
        D = np.asarray([1, 1, 16384], np.int32)
        lin = np.concatenate([np.arange(63), [10000],
                              np.arange(10100, 10700)]).astype(np.int32)
        table = np.full((m,), _INT_MAX, np.int32)
        table[:len(lin)] = lin
        ccoord = np.zeros((m, 3), np.int32)
        ccoord[:len(lin), 2] = lin
        centroid = np.zeros((m, 3), np.float32)
        offs = ((0, 0, 500),)   # block 0 query span covers the mid cluster
        got = cell_neighbor_join(jnp.asarray(table), jnp.asarray(centroid),
                                 jnp.asarray(ccoord), jnp.asarray(D), offs,
                                 0.5, block_b=64, window_w=256,
                                 interpret=True)
        want = xla_cell_join(jnp.asarray(table), jnp.asarray(centroid),
                             jnp.asarray(ccoord), jnp.asarray(D),
                             np.asarray(offs, np.int32), 0.5)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        assert (np.asarray(want) >= 0).any()   # the case actually matches

    def test_bench_scale_shapes(self, rng):
        table, centroid, ccoord, D, offs, radius = make_case(
            rng, m=1024, n_valid=900, rdim=26, dims=(17, 19, 23))
        got = cell_neighbor_join(table, centroid, ccoord, D, offs, radius,
                                 block_b=128, window_w=256, interpret=True,
                                 force_kernel=True)
        want = xla_cell_join(table, centroid, ccoord, D,
                             np.asarray(offs, np.int32), radius)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


class TestSortedKeyRulesJoin:
    """Gate-free rulebook join (sorted_key_rules_join) vs the searchsorted
    oracle, incl. through build_subm_rules_linear's dispatch."""

    @pytest.fixture
    def rng(self):
        return np.random.RandomState(1)

    def _grid_case(self, rng, m=512, n_valid=420, dims=(16, 20, 20),
                   n_grids=4):
        """Proposal-grid-like keys: n_grids dense sub-blocks of a
        (batch, x, y, z) linear key space — the train-path tiny-U-Net
        layout this kernel serves."""
        D = np.asarray(dims, np.int32)
        total = int(D[0] * D[1] * D[2])
        per = n_valid // n_grids
        lin = []
        for g in range(n_grids):
            base = rng.randint(0, total - 900)
            lin.append(base + rng.choice(900, size=per, replace=False))
        lin = np.sort(np.unique(np.concatenate(lin))).astype(np.int32)
        table = np.full((m,), _INT_MAX, np.int32)
        table[:len(lin)] = lin
        cz = lin % D[2]
        cy = (lin // D[2]) % D[1]
        cx = lin // (D[1] * D[2])
        xyz = np.zeros((m, 3), np.int32)
        xyz[:len(lin)] = np.stack([cx, cy, cz], axis=1)
        return jnp.asarray(table), jnp.asarray(xyz), jnp.asarray(D)

    def test_matches_xla_oracle(self, rng):
        from softgroup_tpu.ops.join_kernel import (sorted_key_rules_join,
                                                   xla_rules_join)
        from softgroup_tpu.ops.rulebook import CENTER_TAP, SUBM_OFFSETS
        table, xyz, D = self._grid_case(rng)
        offs = tuple(map(tuple, np.delete(SUBM_OFFSETS, CENTER_TAP,
                                          axis=0).tolist()))
        want = np.asarray(xla_rules_join(
            table, xyz, D, np.delete(SUBM_OFFSETS, CENTER_TAP, axis=0)))
        # guarded dispatch (the production path): exact — overflow falls
        # back to the XLA join inside the lax.cond
        got = np.asarray(sorted_key_rules_join(
            table, xyz, D, offs, block_b=128, window_w=256,
            interpret=True))
        np.testing.assert_array_equal(got, want)
        # forced kernel: any divergence must be a MISS (window overflow
        # drops a hit) — never a wrong index
        forced = np.asarray(sorted_key_rules_join(
            table, xyz, D, offs, block_b=128, window_w=256,
            interpret=True, force_kernel=True))
        diff = forced != want
        assert (forced[diff] == -1).all()
        assert (want >= 0).any()

    def test_overflow_falls_back(self, rng):
        """A key gap wider than the window forces the XLA branch; results
        must still match the oracle exactly."""
        from softgroup_tpu.ops.join_kernel import (sorted_key_rules_join,
                                                   xla_rules_join)
        m = 1024
        D = np.asarray([1, 1, 16384], np.int32)
        lin = np.concatenate([np.arange(63), [10000],
                              np.arange(10100, 10700)]).astype(np.int32)
        table = np.full((m,), _INT_MAX, np.int32)
        table[:len(lin)] = lin
        xyz = np.zeros((m, 3), np.int32)
        xyz[:len(lin), 2] = lin
        offs = ((0, 0, 500),)
        got = np.asarray(sorted_key_rules_join(
            jnp.asarray(table), jnp.asarray(xyz), jnp.asarray(D), offs,
            block_b=64, window_w=256, interpret=True))
        want = np.asarray(xla_rules_join(jnp.asarray(table),
                                         jnp.asarray(xyz), jnp.asarray(D),
                                         np.asarray(offs, np.int32)))
        np.testing.assert_array_equal(got, want)
        assert (want >= 0).any()

    def test_build_subm_rules_linear_dispatch_parity(self, rng):
        """build_subm_rules_linear with kernels on (join kernel, interpret)
        == kernels off (searchsorted path) on a real voxelization."""
        import jax
        from softgroup_tpu.ops import dispatch
        from softgroup_tpu.ops.rulebook import build_subm_rules_linear
        from softgroup_tpu.ops.voxelize import voxelize_linear
        n = 2000
        coords = np.zeros((n, 4), np.int32)
        coords[:, 0] = rng.randint(0, 4, n)
        coords[:, 1:] = rng.randint(0, 20, (n, 3))
        dims = jnp.asarray([20, 20, 20], np.int32)
        vx, ckey = voxelize_linear(jnp.asarray(coords),
                                   jnp.ones((n,), bool), dims, 2048)
        ref = np.asarray(build_subm_rules_linear(
            ckey, vx.vox_coords, vx.vox_valid, dims))
        dispatch.set_kernels(True)
        dispatch.set_interpret(True)
        try:
            got = np.asarray(build_subm_rules_linear(
                ckey, vx.vox_coords, vx.vox_valid, dims))
        finally:
            dispatch.set_kernels(None)
            dispatch.set_interpret(None)
        np.testing.assert_array_equal(got, ref)
        assert (ref[0] >= 0).any() or (ref[1] >= 0).any()
