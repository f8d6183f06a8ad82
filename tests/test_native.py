"""Native C++ host kernels vs numpy oracles (identical outputs required)."""

import numpy as np
import pytest

from softgroup_tpu.ops import native
from softgroup_tpu.ops.rulebook import build_downsample_np, build_subm_rules_np
from softgroup_tpu.ops.voxelize import voxelize_np

pytestmark = pytest.mark.skipif(not native.use_native(),
                                reason='no C++ compiler available')


def random_coords(rng, n, extent=24, batch=3):
    return np.concatenate(
        [rng.randint(0, batch, size=(n, 1)),
         rng.randint(0, extent, size=(n, 3))], axis=1).astype(np.int32)


def test_voxelize_matches_numpy(rng):
    coords = random_coords(rng, 5000)
    ref_vc, ref_p2v, _ = voxelize_np(coords)
    vc, p2v, m = native.voxelize_native(coords)
    assert m == len(ref_vc)
    np.testing.assert_array_equal(vc, ref_vc)
    np.testing.assert_array_equal(p2v, ref_p2v)


def test_subm_rules_match_numpy(rng):
    coords = random_coords(rng, 2000)
    vc, _, _ = voxelize_np(coords)
    dims = np.array([24, 24, 24])
    np.testing.assert_array_equal(native.subm_rules_native(vc, dims),
                                  build_subm_rules_np(vc, dims))


def test_downsample_matches_numpy(rng):
    coords = random_coords(rng, 3000)
    vc, _, _ = voxelize_np(coords)
    out, down, parent, tap = native.downsample_native(vc)
    ref_out, ref_down, ref_parent, ref_tap = build_downsample_np(vc)
    np.testing.assert_array_equal(out, ref_out)
    np.testing.assert_array_equal(down, ref_down)
    np.testing.assert_array_equal(parent, ref_parent)
    np.testing.assert_array_equal(tap, ref_tap)


@pytest.mark.parametrize('n_win', [1, 2])
def test_window_meta_matches_numpy(rng, n_win):
    """sg_window_meta == window_rules_np + numpy compaction, bit-identical
    (incl. an overflowing rulebook so the correction entries are exercised,
    and a padded capacity region so dead blocks are exercised)."""
    from softgroup_tpu.ops.conv_kernel import _SUBM_GROUPS, window_rules_np
    coords = random_coords(rng, 4000)
    vc, _, _ = voxelize_np(coords)
    dims = np.array([24, 24, 24])
    r = build_subm_rules_np(vc, dims)
    cap = ((len(vc) + 127) // 128) * 128 + 256
    rules = np.full((27, cap), -1, np.int32)
    rules[:, :len(vc)] = r
    # three far targets in one block-group defeat dual windows -> overflow
    rules[0, 0], rules[1, 1], rules[2, 2] = 0, cap // 2, cap - 12
    gmap = np.asarray(_SUBM_GROUPS, np.int32)
    b, w, ccap = 128, 192, 4096
    ref_local, ref_starts, ref_over = window_rules_np(
        rules, gmap, 3, w, b, cap, n_win=n_win)
    flat = rules.reshape(-1)
    eidx = np.flatnonzero(ref_local.reshape(-1) >= n_win * w)[:ccap]
    local, starts, n_over, ke, ve, src = native.window_meta_native(
        rules, gmap, 3, w, b, cap, n_win, ccap)
    np.testing.assert_array_equal(local, ref_local)
    np.testing.assert_array_equal(starts, ref_starts)
    assert n_over == ref_over and n_over > 0
    m = len(eidx)
    np.testing.assert_array_equal(ke[:m], eidx // cap)
    np.testing.assert_array_equal(ve[:m], eidx % cap)
    np.testing.assert_array_equal(src[:m], flat[eidx])
    assert (ke[m:] == -1).all() and (src[m:] == -1).all()
