"""Windowed monotone key-join kernel vs the plain-XLA oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from softgroup_tpu.ops.join_kernel import (_INT_MAX, monotone_key_join,
                                           xla_key_join)


def make_case(rng, m=512, n_valid=400, rdim=7, radius=0.3, spread=1.0):
    """Sorted unique int32 keys + centroids + per-row shifted queries."""
    keys = np.sort(rng.choice(20 * n_valid, size=n_valid, replace=False))
    table = np.full((m,), _INT_MAX, np.int32)
    table[:n_valid] = keys
    centroid = rng.uniform(-spread, spread, size=(m, 3)).astype(np.float32)
    shifts = rng.randint(-25, 25, size=(rdim,))
    queries = np.full((rdim, m), _INT_MAX, np.int32)
    for r, s in enumerate(shifts):
        q = keys + s
        ok = rng.rand(n_valid) > 0.2  # interspersed invalid queries
        queries[r, :n_valid] = np.where(ok, q, _INT_MAX)
    return (jnp.asarray(table), jnp.asarray(centroid),
            jnp.asarray(queries), radius)


class TestMonotoneKeyJoin:

    @pytest.fixture
    def rng(self):
        return np.random.RandomState(0)

    def test_matches_oracle(self, rng):
        table, centroid, queries, radius = make_case(rng)
        got = monotone_key_join(table, centroid, queries, radius,
                                block_b=64, window_w=256, interpret=True, force_kernel=True)
        want = xla_key_join(table, centroid, queries, radius)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_all_hits_when_shift_zero(self, rng):
        table, centroid, _, _ = make_case(rng, spread=0.0)
        n_valid = int((np.asarray(table) != _INT_MAX).sum())
        queries = jnp.asarray(np.asarray(table)[None, :])
        got = monotone_key_join(table, centroid, queries, 0.5,
                                block_b=64, window_w=256, interpret=True, force_kernel=True)
        got = np.asarray(got)[0]
        np.testing.assert_array_equal(got[:n_valid], np.arange(n_valid))
        assert (got[n_valid:] == -1).all()

    def test_radius_gate(self, rng):
        table, centroid, queries, _ = make_case(rng, spread=2.0)
        tight = np.asarray(monotone_key_join(
            table, centroid, queries, 1e-6, block_b=64, window_w=256,
            interpret=True, force_kernel=True))
        want = np.asarray(xla_key_join(table, centroid, queries, 1e-6))
        np.testing.assert_array_equal(tight, want)

    def test_overflow_falls_back(self, rng):
        # adversarial: one query row spans the whole table inside one block
        m, n_valid = 512, 500
        keys = np.sort(rng.choice(10**6, size=n_valid, replace=False))
        table = np.full((m,), _INT_MAX, np.int32)
        table[:n_valid] = keys
        centroid = np.zeros((m, 3), np.float32)
        queries = np.full((1, m), _INT_MAX, np.int32)
        queries[0, :n_valid] = keys  # dense row: fine
        queries[0, 0] = keys[0]
        queries[0, 63] = keys[-1]    # block 0 spans the entire table
        queries[0, 1:63] = _INT_MAX
        got = monotone_key_join(jnp.asarray(table), jnp.asarray(centroid),
                                jnp.asarray(queries), 0.5,
                                block_b=64, window_w=256, interpret=True)
        want = xla_key_join(jnp.asarray(table), jnp.asarray(centroid),
                            jnp.asarray(queries), 0.5)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_bench_scale_shapes(self, rng):
        table, centroid, queries, radius = make_case(
            rng, m=1024, n_valid=900, rdim=26)
        got = monotone_key_join(table, centroid, queries, radius,
                                block_b=128, window_w=256, interpret=True, force_kernel=True)
        want = xla_key_join(table, centroid, queries, radius)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
