"""End-to-end training convergence: overfit one tiny synthetic scene and
verify the losses actually optimize — the strongest cheap signal that the
whole gradient path (Pallas/XLA conv VJPs, masked BN, CSR proposal losses)
is wired correctly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_overfit_synthetic_scene():
    import optax

    import __graft_entry__ as ge
    from softgroup_tpu.model.softgroup import Capacities
    from softgroup_tpu.parallel.mesh import TrainState, make_train_step

    caps = Capacities(points=4096, voxels=(4096, 4096, 4096),
                      grouping_points=8192, proposals=16,
                      proposal_entries=8192, instances=32,
                      inst_voxels=(4096, 1024), grouping_cells=4096)
    net, variables, cfg, caps, batch = ge._build(
        channels=8, num_blocks=3, n_points=3000, caps=caps)
    tx = optax.adam(5e-3)
    step = make_train_step(net, cfg, caps, tx, mesh=None)
    state = TrainState(params=variables['params'],
                       batch_stats=variables['batch_stats'],
                       opt_state=tx.init(variables['params']),
                       step=jnp.zeros((), jnp.int32))
    rng = jax.random.PRNGKey(0)

    logs0 = None
    for i in range(150):
        state, logs = step(state, batch, rng)  # fixed rng: pure overfit
        if logs0 is None:
            logs0 = {k: float(v) for k, v in logs.items()}
    logs_end = {k: float(v) for k, v in logs.items()}

    assert np.isfinite(logs_end['loss'])
    # semantic CE must collapse on a memorized scene
    assert logs_end['semantic_loss'] < 0.5 * logs0['semantic_loss'], (
        logs0, logs_end)
    assert logs_end['offset_loss'] < logs0['offset_loss']

    # semantic predictions on the memorized scene should be mostly right
    out = net.apply({'params': state.params,
                     'batch_stats': state.batch_stats},
                    batch, cfg, caps, method=net.test_forward)
    pv = np.asarray(batch.pyramid.point_valid)
    pred = np.asarray(out['semantic_preds'])[pv]
    gt = np.asarray(batch.semantic_labels)[pv]
    mask = gt != cfg.ignore_label
    acc = (pred[mask] == gt[mask]).mean()
    assert acc > 0.7, f'semantic acc after overfit: {acc:.3f}'
