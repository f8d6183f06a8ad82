"""Checkpoint save/load (orbax) + reference-.pth weight import.

Equivalents of `softgroup/util/utils.py:88-145` (master-only save with a
`latest` pointer and power-of-2 / save_freq retention; tolerant load that
skips shape-mismatched keys) and `tools/convert_checkpoint.py` (cross-format
import) — the importer maps released torch/spconv checkpoints onto our
parameter tree so AP parity against reference checkpoints can be validated.
"""

from __future__ import annotations

import os
import re
import shutil

import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def is_power2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def should_keep(epoch: int, save_freq: int) -> bool:
    return is_power2(epoch) or (save_freq and epoch % save_freq == 0)


class CheckpointManager:

    def __init__(self, work_dir: str, save_freq: int = 0, rank: int = 0):
        self.dir = os.path.abspath(os.path.join(work_dir, 'ckpt'))
        self.save_freq = save_freq
        self.rank = rank
        if rank == 0:
            os.makedirs(self.dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def save(self, state, epoch: int):
        if self.rank != 0:
            return
        path = os.path.join(self.dir, f'epoch_{epoch}')
        if os.path.exists(path):
            shutil.rmtree(path, ignore_errors=True)
        self._ckpt.save(path, state, force=True)
        self._ckpt.wait_until_finished()
        with open(os.path.join(self.dir, 'latest'), 'w') as f:
            f.write(f'epoch_{epoch}')
        # retention: keep power-of-2 and save_freq epochs (utils.py:88-108)
        prev = epoch - 1
        if prev > 0 and not should_keep(prev, self.save_freq):
            stale = os.path.join(self.dir, f'epoch_{prev}')
            shutil.rmtree(stale, ignore_errors=True)

    def latest_epoch(self) -> int | None:
        latest = os.path.join(self.dir, 'latest')
        if not os.path.exists(latest):
            return None
        with open(latest) as f:
            m = re.match(r'epoch_(\d+)', f.read().strip())
        return int(m.group(1)) if m else None

    def load(self, state_template, epoch: int | None = None):
        """Restore into the template; returns (state, next_epoch)."""
        if epoch is None:
            epoch = self.latest_epoch()
            if epoch is None:
                return state_template, 1
        path = os.path.join(self.dir, f'epoch_{epoch}')
        state = self._ckpt.restore(path, state_template)
        return state, epoch + 1


# ---------------------------------------------------------------------------
# Reference .pth import.
#
# Name translation from our flax tree to the reference state_dict:
#   input_conv/kernel                  -> input_conv.0.weight
#   unet/.../block{i}/...              -> unet....blocks.block{i}.conv_branch.*
#   MLP heads (Linear/BN/ReLU/Linear)  -> sequential indices 0/1/3 (normed)
#                                         or 0/2 (norm-free mask_linear)
# Weight layout: spconv2 kernels are (Cout, k, k, k, Cin); flattening the
# spatial dims x-major matches our SUBM_OFFSETS/DOWN_OFFSETS tap enumeration,
# giving (taps, Cin, Cout).  torch Linear (out, in) transposes to (in, out).
# ---------------------------------------------------------------------------

def load_reference_state_dict(path: str) -> dict:
    import torch
    ckpt = torch.load(path, map_location='cpu', weights_only=False)
    sd = ckpt.get('net', ckpt)
    return {k.replace('module.', ''): np.asarray(v.detach().cpu().numpy())
            for k, v in sd.items()}


_BN_LEAF = {'scale': 'weight', 'bias': 'bias', 'mean': 'running_mean',
            'var': 'running_var'}


def _translate(path: tuple[str, ...]) -> str | None:
    """Our param/batch_stats path -> reference state_dict key."""
    parts = list(path)
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p == 'input_conv':
            return 'input_conv.0.' + _leaf(parts[i + 1:])
        if p == 'output_norm':
            return 'output_layer.0.' + _leaf(parts[i + 1:])
        if p == 'tiny_output_norm':
            return 'tiny_unet_outputlayer.0.' + _leaf(parts[i + 1:])
        if p in ('cls_linear', 'iou_score_linear'):
            return f'{p}.' + _leaf(parts[i + 1:])
        if p in ('semantic_linear', 'offset_linear', 'mask_linear'):
            return f'{p}.' + _mlp_leaf(parts[i + 1:], normed=p != 'mask_linear')
        if p in ('unet', 'tiny_unet', 'u'):
            out.append(p)
        elif re.match(r'block_tail\d+$', p):
            out.append('blocks_tail.' + p.replace('_tail', ''))
            return '.'.join(out) + '.' + _resblock_leaf(parts[i + 1:])
        elif re.match(r'block\d+$', p):
            out.append(f'blocks.{p}')
            return '.'.join(out) + '.' + _resblock_leaf(parts[i + 1:])
        elif p == 'conv_norm':
            return '.'.join(out) + '.conv.0.' + _leaf(parts[i + 1:])
        elif p == 'conv':
            return '.'.join(out) + '.conv.2.' + _leaf(parts[i + 1:])
        elif p == 'deconv_norm':
            return '.'.join(out) + '.deconv.0.' + _leaf(parts[i + 1:])
        elif p == 'deconv':
            return '.'.join(out) + '.deconv.2.' + _leaf(parts[i + 1:])
        else:
            return None
        i += 1
    return None


def _leaf(rest: list[str]) -> str:
    leaf = rest[-1]
    if leaf == 'kernel':
        return 'weight'
    return _BN_LEAF.get(leaf, leaf)


def _resblock_leaf(rest: list[str]) -> str:
    sub = {'norm1': 'conv_branch.0', 'conv1': 'conv_branch.2',
           'norm2': 'conv_branch.3', 'conv2': 'conv_branch.5'}
    if rest[0] == 'i_branch_kernel':
        return 'i_branch.0.weight'
    if rest[0] in sub:
        return sub[rest[0]] + '.' + _leaf(rest[1:])
    return '.'.join(rest)


def _mlp_leaf(rest: list[str], normed: bool) -> str:
    leaf = rest[0]
    m = re.match(r'hidden(\d+)_(kernel|bias)$', leaf)
    stride = 3 if normed else 2
    if m:
        i = int(m.group(1))
        return f'{i * stride}.' + ('weight' if m.group(2) == 'kernel'
                                   else 'bias')
    m = re.match(r'norm(\d+)$', leaf)
    if m:
        return f'{int(m.group(1)) * stride + 1}.' + _leaf(rest[1:])
    if leaf == 'final_kernel':
        return f'{stride}.weight' if False else _final(stride, 'weight')
    if leaf == 'final_bias':
        return _final(stride, 'bias')
    return '.'.join(rest)


def _final(stride: int, leaf: str) -> str:
    # final linear sits after (num_layers-1) groups; num_layers=2 everywhere
    return f'{stride}.{leaf}'


def _convert(src: np.ndarray, dst_shape) -> np.ndarray | None:
    if src.ndim == 5:  # spconv kernel (Cout, k, k, k, Cin)
        cout, cin = src.shape[0], src.shape[-1]
        taps = int(np.prod(src.shape[1:4]))
        w = np.transpose(src.reshape(cout, taps, cin), (1, 2, 0))
        if taps == 1 and tuple(dst_shape) == (cin, cout):
            return np.ascontiguousarray(w[0])  # 1x1 conv -> dense
        return np.ascontiguousarray(w) if w.shape == tuple(dst_shape) else None
    if src.ndim == 2 and tuple(dst_shape) == tuple(src.shape[::-1]):
        return np.ascontiguousarray(src.T)  # torch Linear (out,in) -> (in,out)
    if tuple(dst_shape) == tuple(src.shape):
        return src
    return None


def import_reference_weights(variables: dict, torch_state: dict,
                             logger=None) -> dict:
    """Return a copy of {'params':..., 'batch_stats':...} with every
    translatable tensor replaced by the reference value (tolerant like
    `load_checkpoint`, utils.py:111-145)."""
    import jax

    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
    n_hit = 0
    new_leaves = []
    for keypath, leaf in flat:
        parts = tuple(getattr(k, 'key', str(k)) for k in keypath)
        # drop the collection prefix ('params' / 'batch_stats')
        ref = _translate(parts[1:]) if len(parts) > 1 else None
        src = torch_state.get(ref) if ref else None
        if src is not None:
            conv = _convert(src, leaf.shape)
            if conv is not None:
                new_leaves.append(jnp.asarray(conv, leaf.dtype))
                n_hit += 1
                continue
            if logger:
                logger.info(f'import: shape mismatch {ref} {src.shape} '
                            f'vs {leaf.shape}')
        elif logger and ref:
            logger.info(f'import: missing {ref} for {"/".join(parts)}')
        new_leaves.append(leaf)
    if logger:
        logger.info(f'import: loaded {n_hit}/{len(flat)} tensors')
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
