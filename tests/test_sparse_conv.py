"""Sparse conv engine vs. dense 3D convolution numpy oracles, and
device-vs-host rulebook/pyramid agreement."""

import jax.numpy as jnp
import numpy as np
import pytest

from softgroup_tpu.ops import keys as K
from softgroup_tpu.ops.geometry import build_pyramid, build_pyramid_np
from softgroup_tpu.ops.rulebook import (DOWN_OFFSETS, SUBM_OFFSETS,
                                        build_downsample, build_downsample_np,
                                        build_subm_rules, build_subm_rules_np)
from softgroup_tpu.ops.sparse_conv import (down_conv, inverse_conv, linear,
                                           subm_conv)
from softgroup_tpu.ops.voxelize import voxelize_np

DIMS = np.array([16, 16, 16])


def random_voxels(rng, n, extent=10, batch=2):
    b = rng.randint(0, batch, size=(n, 1))
    xyz = rng.randint(0, extent, size=(n, 3))
    coords = np.unique(np.concatenate([b, xyz], 1).astype(np.int32), axis=0)
    # restore "sorted by key" canonical order
    vc, _, _ = voxelize_np(coords)
    return vc


class TestRulebooks:

    def test_subm_rules_device_matches_host(self, rng):
        vc = random_voxels(rng, 200)
        host = build_subm_rules_np(vc, DIMS)
        cap = len(vc) + 13
        vcp = np.zeros((cap, 4), np.int32)
        vcp[:len(vc)] = vc
        valid = jnp.asarray(np.arange(cap) < len(vc))
        dev = np.asarray(build_subm_rules(jnp.asarray(vcp), valid,
                                          jnp.asarray(DIMS, jnp.int32)))
        np.testing.assert_array_equal(dev[:, :len(vc)], host)
        assert (dev[:, len(vc):] == -1).all()

    def test_subm_rules_semantics(self, rng):
        """rules[k, v] = index of voxel at coords[v] + offset[k], else -1."""
        vc = random_voxels(rng, 100)
        rules = build_subm_rules_np(vc, DIMS)
        coord_to_idx = {tuple(c): i for i, c in enumerate(vc.tolist())}
        for k, off in enumerate(SUBM_OFFSETS):
            for v in range(len(vc)):
                q = vc[v].copy()
                q[1:] += off
                expect = coord_to_idx.get(tuple(q.tolist()), -1)
                if (q[1:] < 0).any() or (q[1:] >= DIMS).any():
                    expect = -1
                assert rules[k, v] == expect

    def test_downsample_device_matches_host(self, rng):
        vc = random_voxels(rng, 300)
        h_out, h_down, h_parent, h_tap = build_downsample_np(vc)
        cap, cap_next = len(vc) + 5, len(h_out) + 9
        vcp = np.zeros((cap, 4), np.int32)
        vcp[:len(vc)] = vc
        valid = jnp.asarray(np.arange(cap) < len(vc))
        (d_out, d_valid, d_n, d_down, d_parent, d_tap) = build_downsample(
            jnp.asarray(vcp), valid, jnp.asarray(DIMS, jnp.int32), cap_next)
        assert int(d_n) == len(h_out)
        np.testing.assert_array_equal(np.asarray(d_out)[:len(h_out)], h_out)
        np.testing.assert_array_equal(np.asarray(d_down)[:, :len(h_out)], h_down)
        np.testing.assert_array_equal(np.asarray(d_parent)[:len(vc)], h_parent)
        np.testing.assert_array_equal(np.asarray(d_tap)[:len(vc)], h_tap)


def dense_from_sparse(vc, feats, dims, batch=2):
    d = np.zeros((batch, dims[0], dims[1], dims[2], feats.shape[1]), np.float32)
    d[vc[:, 0], vc[:, 1], vc[:, 2], vc[:, 3]] = feats
    occ = np.zeros((batch, dims[0], dims[1], dims[2]), bool)
    occ[vc[:, 0], vc[:, 1], vc[:, 2], vc[:, 3]] = True
    return d, occ


class TestConvOracles:

    def test_subm_conv_matches_dense_oracle(self, rng):
        """Submanifold conv == dense 3^3 conv evaluated only at active sites."""
        vc = random_voxels(rng, 150, extent=8)
        cin, cout = 5, 7
        feats = rng.randn(len(vc), cin).astype(np.float32)
        w = rng.randn(27, cin, cout).astype(np.float32) * 0.1
        rules = build_subm_rules_np(vc, DIMS)
        got = np.asarray(subm_conv(jnp.asarray(feats), jnp.asarray(w),
                                   jnp.asarray(rules)))

        dense, occ = dense_from_sparse(vc, feats, DIMS)
        for v, (b, x, y, z) in enumerate(vc):
            expect = np.zeros(cout)
            for k, (dx, dy, dz) in enumerate(SUBM_OFFSETS):
                xx, yy, zz = x + dx, y + dy, z + dz
                if 0 <= xx < DIMS[0] and 0 <= yy < DIMS[1] and 0 <= zz < DIMS[2] \
                        and occ[b, xx, yy, zz]:
                    expect += dense[b, xx, yy, zz] @ w[k]
            np.testing.assert_allclose(got[v], expect, rtol=1e-4, atol=1e-5)

    def test_down_then_inverse_conv_oracle(self, rng):
        vc = random_voxels(rng, 120, extent=8)
        cin, cmid, cout = 4, 6, 3
        feats = rng.randn(len(vc), cin).astype(np.float32)
        w_down = rng.randn(8, cin, cmid).astype(np.float32) * 0.1
        w_up = rng.randn(8, cmid, cout).astype(np.float32) * 0.1
        out_vc, down_rules, parent_idx, child_tap = build_downsample_np(vc)

        mid = np.asarray(down_conv(jnp.asarray(feats), jnp.asarray(w_down),
                                   jnp.asarray(down_rules)))
        # oracle: out[p] = sum over children 2p+delta present
        cmap = {tuple(c): i for i, c in enumerate(vc.tolist())}
        for p, (b, x, y, z) in enumerate(out_vc):
            expect = np.zeros(cmid)
            for k, (dx, dy, dz) in enumerate(DOWN_OFFSETS):
                child = (b, 2 * x + dx, 2 * y + dy, 2 * z + dz)
                if child in cmap:
                    expect += feats[cmap[child]] @ w_down[k]
            np.testing.assert_allclose(mid[p], expect, rtol=1e-4, atol=1e-5)

        up = np.asarray(inverse_conv(jnp.asarray(mid), jnp.asarray(w_up),
                                     jnp.asarray(parent_idx),
                                     jnp.asarray(child_tap)))
        # oracle: each fine voxel reads its unique parent through tap weight
        for v in range(len(vc)):
            expect = mid[parent_idx[v]] @ w_up[child_tap[v]]
            np.testing.assert_allclose(up[v], expect, rtol=1e-4, atol=1e-5)

    def test_linear(self, rng):
        x = rng.randn(10, 4).astype(np.float32)
        w = rng.randn(4, 6).astype(np.float32)
        b = rng.randn(6).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(linear(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b))),
            x @ w + b, rtol=1e-5)

    def test_inverse_conv_custom_vjp_matches_autodiff(self, rng):
        """inverse_conv's scatter-free backward (down_rules path) must match
        plain autodiff of the one-hot-matmul forward exactly."""
        import jax
        vc = random_voxels(rng, 120, extent=8)
        cin, cout = 4, 3
        _, down_rules, parent_idx, child_tap = build_downsample_np(vc)
        n_coarse = down_rules.shape[1]
        feats = jnp.asarray(rng.randn(n_coarse, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(8, cin, cout).astype(np.float32) * 0.1)
        pi, ct, dr = (jnp.asarray(parent_idx), jnp.asarray(child_tap),
                      jnp.asarray(down_rules))
        cot = jnp.asarray(rng.randn(len(vc), cout).astype(np.float32))

        def loss_custom(f, w):
            return jnp.vdot(inverse_conv(f, w, pi, ct, dr), cot)

        def loss_plain(f, w):
            return jnp.vdot(inverse_conv(f, w, pi, ct), cot)

        gc = jax.grad(loss_custom, argnums=(0, 1))(feats, w)
        gp = jax.grad(loss_plain, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(np.asarray(gc[0]), np.asarray(gp[0]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gc[1]), np.asarray(gp[1]),
                                   rtol=1e-4, atol=1e-5)

    def test_subm_conv_grad_flows(self, rng):
        import jax
        vc = random_voxels(rng, 60, extent=6)
        feats = jnp.asarray(rng.randn(len(vc), 4).astype(np.float32))
        w = jnp.asarray(rng.randn(27, 4, 4).astype(np.float32) * 0.1)
        rules = jnp.asarray(build_subm_rules_np(vc, DIMS))
        g = jax.grad(lambda f, w: subm_conv(f, w, rules).sum(), argnums=(0, 1))(
            feats, w)
        assert np.isfinite(np.asarray(g[0])).all()
        assert np.abs(np.asarray(g[1])).sum() > 0


class TestPyramid:

    @pytest.mark.slow
    def test_device_and_host_pyramids_agree(self, rng):
        coords = np.concatenate([
            rng.randint(0, 2, size=(400, 1)),
            rng.randint(0, 14, size=(400, 3))], 1).astype(np.int32)
        caps = [512, 384, 160]
        host = build_pyramid_np(coords, DIMS, 3, caps)
        dev = build_pyramid(jnp.asarray(coords), jnp.ones(400, bool),
                            jnp.asarray(DIMS, jnp.int32), 3, caps)
        for lh, ld in zip(host.levels, dev.levels):
            nh = int(np.asarray(lh.vox_valid).sum())
            nd = int(np.asarray(ld.vox_valid).sum())
            assert nh == nd
            np.testing.assert_array_equal(np.asarray(lh.vox_coords)[:nh],
                                          np.asarray(ld.vox_coords)[:nh])
            np.testing.assert_array_equal(np.asarray(lh.subm_rules)[:, :nh],
                                          np.asarray(ld.subm_rules)[:, :nh])
        np.testing.assert_array_equal(np.asarray(host.p2v), np.asarray(dev.p2v))
