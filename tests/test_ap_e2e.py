"""End-to-end AP regression (VERDICT r03 missing #2): overfit the small net
on synthetic room scenes, run the FULL inference + evaluation protocol
(test_forward -> get_instances -> ScanNetEval), and require near-perfect
AP_50 on the memorized scenes.  An AP-destroying bug anywhere in the
trained-pipeline chain (grouping at production settings, refinement,
postprocessing, the AP protocol itself) drags this far below the gate.

The same trained weights also gate the SoftGroup++ lvl_fusion inference
path (test_forward_plus: grouping/refinement on the level-0 voxel set,
reference softgroup.py:309-312 — "++ is faster at equal AP", README.md:50)
and the panoptic chain (panoptic_fusion -> PanopticEval, softgroup.py:
606-639) — VERDICT r04 next-round items 3 and 6.

The chip-scale version of this harness is tools/bench_ap.py (results in
docs/grouping_fidelity.md)."""

import os.path as osp
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


@pytest.mark.slow
def test_overfit_ap50():
    import optax
    from tools.bench_ap import build_batches, build_cfg, evaluate_weights

    from softgroup_tpu.model.softgroup import SoftGroupNet
    from softgroup_tpu.parallel.mesh import TrainState, make_train_step

    # settings tuned on the chip-scale harness (docs/grouping_fidelity.md
    # end-to-end section: 15k x 3 scenes, 3000 steps @ lr 3e-3 reaches
    # AP_50 0.94): the CPU gate uses a smaller scene + budget and a 0.5
    # threshold — an AP-destroying pipeline bug scores 0.0, not 0.5
    from softgroup_tpu.model.softgroup import Capacities

    cfg = build_cfg(radius=0.08)   # radius scaled to the sparser tiny scene
    # tight capacities: the CPU step costs by cap, not live rows — the
    # build_batches defaults (32k inst_voxels etc.) ran 2.06 s/step on the
    # 1-core CI host vs 0.77 s/step with these (identical coverage: 12
    # instances/scene, ~3.8k voxels)
    caps = Capacities(points=4096, voxels=(4096, 4096, 4096),
                      grouping_points=8192, proposals=128,
                      proposal_entries=8192, instances=32,
                      inst_voxels=(8192, 2048), grouping_cells=4096)
    batches, metas, caps = build_batches(
        n_points=4000, n_scenes=2, num_levels=3, cfg=cfg, caps=caps)
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

    final = {'params': state.params, 'batch_stats': state.batch_stats}
    m, _ = evaluate_weights(net, cfg, caps, final, batches, metas,
                            panoptic=True)
    assert m['AP_50'] >= 0.5, m
    # panoptic chain off the same predictions: stuff classes (floor/wall)
    # come from semantics, things from the pasted instances.  Restricted to
    # classes present in gt; a fusion/protocol bug zeroes this.
    assert m['PQ_present'] >= 30.0, m

    # SoftGroup++ lvl_fusion on the SAME weights: the reference claim is
    # equal AP through the voxel-level grouping + p2v mask expansion chain
    m_pp, _ = evaluate_weights(net, cfg, caps, final, batches, metas,
                               lvl_fusion=True)
    assert m_pp['AP_50'] >= 0.5, (m_pp, m)
    assert m_pp['AP_25'] >= m['AP_25'] - 0.1, (m_pp, m)
