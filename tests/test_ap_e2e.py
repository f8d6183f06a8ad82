"""End-to-end AP regression (VERDICT r03 missing #2): overfit the small net
on synthetic room scenes, run the FULL inference + evaluation protocol
(test_forward -> get_instances -> ScanNetEval), and require near-perfect
AP_50 on the memorized scenes.  An AP-destroying bug anywhere in the
trained-pipeline chain (grouping at production settings, refinement,
postprocessing, the AP protocol itself) drags this far below the gate.

The chip-scale version of this harness is tools/bench_ap.py (results in
docs/grouping_fidelity.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_overfit_ap50():
    import optax
    import sys
    sys.path.insert(0, '/root/repo')
    from tools.bench_ap import build_batches, build_cfg

    from softgroup_tpu.evaluation.instance_eval import ScanNetEval
    from softgroup_tpu.evaluation.postprocess import (get_gt_instances,
                                                      get_instances)
    from softgroup_tpu.model.softgroup import SoftGroupNet
    from softgroup_tpu.parallel.mesh import TrainState, make_train_step

    # settings tuned on the chip-scale harness (docs/grouping_fidelity.md
    # end-to-end section: 15k x 3 scenes, 3000 steps @ lr 3e-3 reaches
    # AP_50 0.94): the CPU gate uses a smaller scene + budget and a 0.5
    # threshold — an AP-destroying pipeline bug scores 0.0, not 0.5
    cfg = build_cfg(radius=0.08)   # radius scaled to the sparser tiny scene
    batches, metas, caps = build_batches(
        n_points=4000, n_scenes=2, num_levels=3, cfg=cfg)
    net = SoftGroupNet(channels=8, num_blocks=3, semantic_classes=20,
                       instance_classes=18)
    variables = jax.jit(lambda key, b: net.init(
        key, b, cfg, caps, method=net.test_forward))(
            jax.random.PRNGKey(0), batches[0])
    tx = optax.adam(5e-3)
    step = make_train_step(net, cfg, caps, tx, mesh=None)
    state = TrainState(params=variables['params'],
                       batch_stats=variables['batch_stats'],
                       opt_state=tx.init(variables['params']),
                       step=jnp.zeros((), jnp.int32))
    rng = jax.random.PRNGKey(42)
    for i in range(1200):
        state, logs = step(state, batches[i % len(batches)],
                           jax.random.fold_in(rng, i))
    assert np.isfinite(float(logs['loss']))

    test_fn = jax.jit(lambda v, b: net.apply(
        v, b, cfg, caps, method=net.test_forward))
    final = {'params': state.params, 'batch_stats': state.batch_stats}
    preds, gts = [], []
    for si, (batch, meta) in enumerate(zip(batches, metas)):
        out = {k: np.asarray(v) for k, v in test_fn(final, batch).items()}
        n = meta['n']
        sem_gt = np.asarray(batch.semantic_labels)[:n]
        inst_gt = np.asarray(batch.instance_labels)[:n]
        preds.append(get_instances(f's{si}', out, n, cfg))
        gts.append(get_gt_instances(sem_gt, inst_gt, 20, 18))
    ev = ScanNetEval([f'c{i}' for i in range(18)],
                     min_npoint=cfg.test_cfg.min_npoint)
    res = ev.evaluate(preds, gts, nproc=1)
    assert res['all_ap_50%'] >= 0.5, res
