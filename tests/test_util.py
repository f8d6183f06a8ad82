"""Util-layer tests: checkpointing (save/load/retention), LR schedule,
optimizer building + parameter freezing, YAML config handling.

Pins the semantics of `softgroup/util/utils.py:55-145` (cosine-after-step
schedule, power-of-2/save_freq checkpoint retention, tolerant load) and
`softgroup/util/optim.py` as reimplemented in softgroup_tpu/util/.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from softgroup_tpu.util.checkpoint import (CheckpointManager, is_power2,
                                           should_keep)
from softgroup_tpu.util.config import Config, getattr_or, load_config
from softgroup_tpu.util.optim import (build_optimizer,
                                      cosine_after_step_schedule,
                                      freeze_mask, masked_optimizer)


class TestSchedule:

    def test_constant_then_cosine(self):
        sched = cosine_after_step_schedule(
            base_lr=0.004, step_epoch=50, total_epochs=128,
            steps_per_epoch=100)
        # flat before step_epoch
        assert float(sched(0)) == pytest.approx(0.004)
        assert float(sched(49 * 100)) == pytest.approx(0.004)
        # cosine after: halfway point of the decay span
        half = (50 + (128 - 50) / 2) * 100
        assert float(sched(int(half))) == pytest.approx(0.002, rel=1e-3)
        # ~0 at the end of training
        assert float(sched(128 * 100)) == pytest.approx(0.0, abs=1e-9)

    def test_monotone_after_step(self):
        sched = cosine_after_step_schedule(0.01, 10, 20, 10)
        vals = [float(sched(s)) for s in range(100, 201, 10)]
        assert all(a >= b - 1e-12 for a, b in zip(vals, vals[1:]))


class TestOptim:

    def _params(self):
        return {'unet': {'w': jnp.ones((4, 4))},
                'semantic_linear': {'w': jnp.ones((4,))},
                'cls_linear': {'w': jnp.ones((2,))}}

    @pytest.mark.parametrize('otype', ['Adam', 'AdamW', 'SGD'])
    def test_build_optimizer_types(self, otype):
        params = self._params()
        tx = build_optimizer(params, {'type': otype, 'lr': 1e-3},
                             lambda s: 1e-3)
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        assert jax.tree.all(jax.tree.map(
            lambda u: bool(jnp.all(jnp.isfinite(u))), updates))

    def test_build_optimizer_unknown_raises(self):
        with pytest.raises(ValueError):
            build_optimizer({}, {'type': 'LBFGS', 'lr': 1e-3}, 1e-3)

    def test_freeze_mask_and_masked_optimizer(self):
        """fixed_modules params get exactly zero updates (the reference
        freezes via requires_grad=False, softgroup.py:81-84)."""
        params = self._params()
        mask = freeze_mask(params, ['unet', 'semantic_linear'])
        assert mask['unet']['w'] is False
        assert mask['semantic_linear']['w'] is False
        assert mask['cls_linear']['w'] is True

        tx = masked_optimizer(optax.sgd(0.1), params,
                              ['unet', 'semantic_linear'])
        state = tx.init(params)
        grads = jax.tree.map(jnp.ones_like, params)
        updates, _ = tx.update(grads, state, params)
        assert float(jnp.abs(updates['unet']['w']).max()) == 0.0
        assert float(jnp.abs(updates['semantic_linear']['w']).max()) == 0.0
        assert float(jnp.abs(updates['cls_linear']['w']).max()) > 0.0


class TestCheckpoint:

    def test_retention_policy(self):
        keep = [e for e in range(1, 20) if should_keep(e, save_freq=6)]
        assert keep == [1, 2, 4, 6, 8, 12, 16, 18]
        assert is_power2(1) and is_power2(16) and not is_power2(12)

    def test_save_load_roundtrip(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), save_freq=4)
        state = {'params': {'w': jnp.arange(6.0).reshape(2, 3)},
                 'step': jnp.asarray(7, jnp.int32)}
        mgr.save(state, epoch=1)
        mgr.save(jax.tree.map(lambda x: x * 2, state), epoch=2)
        assert mgr.latest_epoch() == 2
        template = jax.tree.map(jnp.zeros_like, state)
        restored, next_epoch = mgr.load(template)
        assert next_epoch == 3
        np.testing.assert_allclose(np.asarray(restored['params']['w']),
                                   np.arange(6.0).reshape(2, 3) * 2)
        assert int(restored['step']) == 14

    def test_load_specific_epoch(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path), save_freq=0)
        state = {'w': jnp.asarray(1.0)}
        mgr.save(state, epoch=1)
        mgr.save({'w': jnp.asarray(5.0)}, epoch=2)
        restored, nxt = mgr.load({'w': jnp.asarray(0.0)}, epoch=1)
        assert float(restored['w']) == 1.0 and nxt == 2

    def test_load_without_checkpoint_returns_template(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path))
        template = {'w': jnp.asarray(3.0)}
        restored, nxt = mgr.load(template)
        assert restored is template and nxt == 1

    def test_non_power2_epoch_pruned(self, tmp_path):
        import os
        mgr = CheckpointManager(str(tmp_path), save_freq=0)
        state = {'w': jnp.asarray(1.0)}
        for e in range(1, 7):
            mgr.save(state, epoch=e)
        names = set(os.listdir(mgr.dir))
        # epochs 3 and 5 (not power-of-2, no save_freq) must be pruned;
        # the latest (6) always survives
        assert 'epoch_3' not in names and 'epoch_5' not in names
        for e in (1, 2, 4, 6):
            assert f'epoch_{e}' in names


class TestReferenceImport:

    def test_state_dict_roundtrip(self):
        """Every param/batch_stat leaf of the real model translates to a
        reference state_dict name, and importing a fabricated state dict in
        the reference layout (spconv (Cout, k, k, k, Cin) kernels, torch
        (out, in) linears) restores every tensor bit-exactly."""
        import jax
        import __graft_entry__ as ge
        from softgroup_tpu.model.softgroup import Capacities
        from softgroup_tpu.util.checkpoint import (_translate,
                                                   import_reference_weights)

        # small capacities: the test only needs the variable STRUCTURE, and
        # _build's bench-scale defaults cost ~15 s of init compile here
        caps = Capacities(points=2048, voxels=(2048, 2048, 2048),
                          grouping_points=4096, proposals=16,
                          proposal_entries=4096, instances=32,
                          inst_voxels=(2048, 512))
        _, variables, _, _, _ = ge._build(channels=4, num_blocks=3,
                                          n_points=1500, caps=caps)
        variables = dict(variables)
        flat, _ = jax.tree_util.tree_flatten_with_path(variables)
        rng = np.random.RandomState(0)
        torch_state, expected = {}, {}
        for keypath, leaf in flat:
            parts = tuple(getattr(k, 'key', str(k)) for k in keypath)
            ref = _translate(parts[1:])
            assert ref is not None, f'unmapped leaf {"/".join(parts)}'
            val = rng.randn(*leaf.shape).astype(np.float32)
            expected['/'.join(parts)] = val
            leafname = parts[-1]
            if val.ndim == 3:            # (K, Cin, Cout) conv kernel
                k = val.shape[0]
                k1 = round(k ** (1 / 3))
                assert k1 ** 3 == k, k
                torch_state[ref] = np.ascontiguousarray(
                    val.transpose(2, 0, 1).reshape(
                        val.shape[2], k1, k1, k1, val.shape[1]))
            elif val.ndim == 2 and leafname.endswith('kernel'):
                if leafname == 'i_branch_kernel':
                    # reference 1x1 subm conv: (Cout, 1, 1, 1, Cin)
                    torch_state[ref] = np.ascontiguousarray(
                        val.T[:, None, None, None, :])
                else:
                    torch_state[ref] = np.ascontiguousarray(val.T)
            else:
                torch_state[ref] = val
        out = import_reference_weights(variables, torch_state)
        oflat, _ = jax.tree_util.tree_flatten_with_path(out)
        for keypath, leaf in oflat:
            parts = '/'.join(getattr(k, 'key', str(k)) for k in keypath)
            np.testing.assert_array_equal(np.asarray(leaf), expected[parts],
                                          err_msg=parts)


class TestConfig:

    def test_attribute_access_nested(self):
        cfg = Config(dict(model=dict(channels=32, grouping_cfg=dict(
            score_thr=0.2)), data=dict(train=dict(prefix='train'))))
        assert cfg.model.channels == 32
        assert cfg.model.grouping_cfg.score_thr == 0.2
        cfg.model.channels = 64
        assert cfg['model']['channels'] == 64

    def test_getattr_or(self):
        cfg = Config(dict(a=1))
        assert getattr_or(cfg, 'a') == 1
        assert getattr_or(cfg, 'missing', 5) == 5
        assert getattr_or(None, 'x', 'd') == 'd'

    def test_load_all_repo_configs(self):
        """Every shipped YAML config parses and carries the reference schema's
        top-level sections."""
        from glob import glob
        paths = sorted(glob('configs/*/*.yaml'))
        assert len(paths) >= 24  # the reference ships 24 (SURVEY §2)
        for p in paths:
            cfg = load_config(p)
            assert 'model' in cfg and 'data' in cfg, p
            assert 'channels' in cfg.model, p

    def test_copy_is_deep(self):
        cfg = Config(dict(a=dict(b=1)))
        cp = cfg.copy()
        cp.a.b = 2
        assert cfg.a.b == 1
