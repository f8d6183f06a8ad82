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
