"""Network building blocks (flax.linen) over the sparse-conv engine.

Equivalents of the reference blocks (`softgroup/model/blocks.py`): MLP
(`:9-27`), the 1x1-conv identity branch (`Custom1x1Subm3d`, `:31-41`),
ResidualBlock (`:44-79`) and the recursive UBlock U-Net (`:82-143`) — but
operating on padded (V, C) feature matrices plus a precomputed `LevelGeom`
pyramid instead of spconv tensors.  BatchNorm is masked over valid voxels so
padding never leaks into statistics.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.geometry import LevelGeom
from ..ops.sparse_conv import down_conv, inverse_conv, linear, subm_conv


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid rows only (torch semantics: eps=1e-4,
    momentum=0.1, biased batch variance for normalization, unbiased for the
    running-stat update)."""
    features: int
    eps: float = 1e-4
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, mask, train: bool):
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((self.features,), jnp.float32))
        if train:
            m = mask.astype(jnp.float32)[:, None]
            n = jnp.maximum(m.sum(), 1.0)
            xf = x.astype(jnp.float32)
            mean = (xf * m).sum(0) / n
            var = (jnp.square(xf - mean) * m).sum(0) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return y.astype(x.dtype)


class Dense(nn.Module):
    """nn.Linear with torch-style default init (kaiming-uniform weight)."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        w = self.param('kernel',
                       nn.initializers.variance_scaling(1 / 3, 'fan_in', 'uniform'),
                       (cin, self.features))
        b = self.param('bias', _torch_bias_init(cin),
                       (self.features,)) if self.use_bias else None
        return linear(x, w, b)


def _torch_bias_init(fan_in):
    bound = 1.0 / (fan_in ** 0.5)
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class SubMConv(nn.Module):
    """3^3 submanifold conv (spconv.SubMConv3d k=3 p=1 bias=False).

    Accepts either a LevelGeom (keyed levels resolve neighbours in-kernel)
    or a raw (27, V) rulebook array."""
    features: int

    @nn.compact
    def __call__(self, x, lv):
        cin = x.shape[-1]
        # spconv uses kaiming-style fan-in = 27 * cin
        w = self.param('kernel',
                       nn.initializers.variance_scaling(1 / 3, 'fan_in', 'uniform'),
                       (27, cin, self.features))
        rules = getattr(lv, 'subm_rules', lv)
        if rules is None:
            from ..ops.conv_kernel import keyed_subm_conv_ad
            from ..ops.dispatch import kernel_interpret, tacc_enabled
            return keyed_subm_conv_ad(x, w, lv.ckey, lv.spatial_d,
                                      tacc=tacc_enabled(),
                                      interpret=kernel_interpret())
        return subm_conv(x, w, rules, win=getattr(lv, 'subm_win', None))


class DownConv(nn.Module):
    """k=2 s=2 strided conv (spconv.SparseConv3d)."""
    features: int

    @nn.compact
    def __call__(self, x, lv, nxt=None):
        cin = x.shape[-1]
        w = self.param('kernel',
                       nn.initializers.variance_scaling(1 / 3, 'fan_in', 'uniform'),
                       (8, cin, self.features))
        rules = getattr(lv, 'down_rules', lv)
        if rules is None:
            from ..ops.conv_kernel import keyed_down_conv_ad
            from ..ops.dispatch import kernel_interpret, tacc_enabled
            return keyed_down_conv_ad(x, w, lv.ckey, nxt.ckey,
                                      nxt.spatial_d, tacc=tacc_enabled(),
                                      interpret=kernel_interpret())
        return down_conv(x, w, rules, win=getattr(lv, 'down_win', None))


class UpConv(nn.Module):
    """k=2 inverse conv (spconv.SparseInverseConv3d).  The fine level's
    down_rules (when present) buy the fully scatter-free backward."""
    features: int

    @nn.compact
    def __call__(self, x, parent_idx, child_tap, down_rules=None, win=None):
        cin = x.shape[-1]
        w = self.param('kernel',
                       nn.initializers.variance_scaling(1 / 3, 'fan_in', 'uniform'),
                       (8, cin, self.features))
        return inverse_conv(x, w, parent_idx, child_tap, down_rules,
                            win=win)


class MLP(nn.Module):
    """Reference MLP head (`blocks.py:9-27`): (num_layers-1) x
    [Linear -> BN? -> ReLU] -> Linear.  init_weights: xavier-uniform hidden,
    N(0, 0.01) final (`blocks.py:21-27`)."""
    out_features: int
    norm: bool = True
    num_layers: int = 2

    @nn.compact
    def __call__(self, x, mask, train: bool):
        cin = x.shape[-1]
        for i in range(self.num_layers - 1):
            w = self.param(f'hidden{i}_kernel', nn.initializers.xavier_uniform(),
                           (cin, cin))
            b = self.param(f'hidden{i}_bias', nn.initializers.zeros, (cin,))
            x = linear(x, w, b)
            if self.norm:
                x = MaskedBatchNorm(cin, name=f'norm{i}')(x, mask, train)
            x = nn.relu(x)
        w = self.param('final_kernel',
                       nn.initializers.normal(0.01), (cin, self.out_features))
        b = self.param('final_bias', nn.initializers.zeros, (self.out_features,))
        return linear(x, w, b)


class ResidualBlock(nn.Module):
    """Pre-activation sparse residual block (`blocks.py:44-79`):
    identity (1x1 if channels change) + [BN-ReLU-SubM-BN-ReLU-SubM]."""
    features: int

    @nn.compact
    def __call__(self, x, lv, mask, train: bool):
        cin = x.shape[-1]
        if cin == self.features:
            identity = x
        else:
            wi = self.param('i_branch_kernel',
                            nn.initializers.variance_scaling(1 / 3, 'fan_in',
                                                             'uniform'),
                            (cin, self.features))
            identity = linear(x, wi)
        y = MaskedBatchNorm(cin, name='norm1')(x, mask, train)
        y = nn.relu(y)
        y = SubMConv(self.features, name='conv1')(y, lv)
        y = MaskedBatchNorm(self.features, name='norm2')(y, mask, train)
        y = nn.relu(y)
        y = SubMConv(self.features, name='conv2')(y, lv)
        return y + identity


class UBlock(nn.Module):
    """Recursive sparse U-Net (`blocks.py:82-143`).

    nPlanes[i] = channel width at pyramid level i.  Per level: block_reps
    residual blocks, k2s2 down, recurse, inverse-conv up, concat skip,
    block_reps tail blocks (first tail block sees 2x channels).
    """
    nPlanes: Sequence[int]
    block_reps: int = 2

    @nn.compact
    def __call__(self, x, levels: tuple[LevelGeom, ...], train: bool):
        lv = levels[0]
        width = self.nPlanes[0]
        for i in range(self.block_reps):
            x = ResidualBlock(width, name=f'block{i}')(
                x, lv, lv.vox_valid, train)
        if len(self.nPlanes) > 1:
            nxt = levels[1]
            y = MaskedBatchNorm(width, name='conv_norm')(x, lv.vox_valid, train)
            y = nn.relu(y)
            y = DownConv(self.nPlanes[1], name='conv')(y, lv, nxt)
            y = UBlock(self.nPlanes[1:], self.block_reps, name='u')(
                y, levels[1:], train)
            y = MaskedBatchNorm(self.nPlanes[1], name='deconv_norm')(
                y, nxt.vox_valid, train)
            y = nn.relu(y)
            y = UpConv(width, name='deconv')(y, lv.parent_idx, lv.child_tap,
                                             lv.down_rules,
                                             getattr(lv, 'down_win', None))
            x = jnp.concatenate([x, y], axis=1)
            for i in range(self.block_reps):
                x = ResidualBlock(width, name=f'block_tail{i}')(
                    x, lv, lv.vox_valid, train)
        return x
