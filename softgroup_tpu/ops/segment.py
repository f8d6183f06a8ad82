"""Segment reductions over (values, segment_ids) layouts.

TPU-native replacements for the reference's CSR segment kernels:
`sec_mean` / `sec_min` / `sec_max` (`softgroup/ops/src/sec_mean/sec_mean.cu`),
`global_avg_pool_fp/bp` (`softgroup/ops/src/roipool/roipool.cu`) and
`voxelize_fp/bp` (`softgroup/ops/src/voxelize/voxelize.cu`).

Instead of a (values, offsets) CSR layout walked by one CUDA block per
segment, we carry a flat `segment_ids` array (padding rows point at a dustbin
segment `num_segments`) and use `jax.ops.segment_*`, which XLA lowers to
sorted-scatter reductions that fuse with neighbouring ops.  All functions are
differentiable where the reference op has a backward pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_sum(values: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Sum of values per segment; ids == num_segments land in a dropped dustbin."""
    out = jax.ops.segment_sum(values, segment_ids, num_segments=num_segments + 1)
    return out[:num_segments]


def segment_count(segment_ids: jax.Array, num_segments: int) -> jax.Array:
    ones = jnp.ones(segment_ids.shape[:1], jnp.int32)
    return segment_sum(ones, segment_ids, num_segments)


def segment_mean(values: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Mean of values per segment (empty segments → 0).

    Replaces `voxelize_fp` mode 4 (`voxelize.cu:9-40`) and `global_avg_pool_fp`
    (`roipool.cu:12-40`); the autodiff transpose reproduces their backward
    scatter (`voxelize.cu:42-62`, `roipool.cu:42-71`).
    """
    total = segment_sum(values, segment_ids, num_segments)
    count = segment_count(segment_ids, num_segments)
    denom = jnp.maximum(count, 1).astype(total.dtype)
    return total / denom.reshape((-1,) + (1,) * (total.ndim - 1))


def segment_min(values: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Min per segment (empty segments → 0, matching sec_min's zero-init output)."""
    out = jax.ops.segment_min(values, segment_ids, num_segments=num_segments + 1)
    out = out[:num_segments]
    count = segment_count(segment_ids, num_segments)
    nonempty = (count > 0).reshape((-1,) + (1,) * (out.ndim - 1))
    return jnp.where(nonempty, out, 0)


def segment_max(values: jax.Array, segment_ids: jax.Array, num_segments: int) -> jax.Array:
    """Max per segment (empty segments → 0, matching sec_max's zero-init output)."""
    out = jax.ops.segment_max(values, segment_ids, num_segments=num_segments + 1)
    out = out[:num_segments]
    count = segment_count(segment_ids, num_segments)
    nonempty = (count > 0).reshape((-1,) + (1,) * (out.ndim - 1))
    return jnp.where(nonempty, out, 0)


def offsets_to_segment_ids(offsets: jax.Array, total: int) -> jax.Array:
    """Convert CSR offsets (nSeg+1,) to per-row segment ids of length ``total``.

    Rows beyond offsets[-1] get id ``nSeg`` (dustbin).  Static-shape friendly:
    uses a scatter of ones at segment starts + cumsum.
    """
    nseg = offsets.shape[0] - 1
    starts = offsets[1:]  # the first segment starts at row 0 implicitly
    bump = jnp.zeros((total + 1,), jnp.int32).at[jnp.clip(starts, 0, total)].add(1)
    ids = jnp.cumsum(bump[:total])
    return jnp.minimum(ids, nseg)
