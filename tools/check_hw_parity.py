#!/usr/bin/env python3
"""Hardware kernel parity check (run on a real TPU).

CI runs the Pallas kernels in interpreter mode on CPU (tests/conftest.py
forces the cpu platform), so the Mosaic/TPU lowering of the production
paths — in particular the transposed-accumulator (tacc) relayouts — is
never exercised by the suite (ADVICE round-1: a hardware-lowering
regression in the tacc path would go uncaught).  This tool compiles the
production dispatch on the chip for both accumulator layouts plus the
keyed variant and asserts bf16-level agreement with the exact XLA conv on
a realistic (surface-scene) rulebook.

Exit code 0 = all parities hold.  Run: `python tools/check_hw_parity.py`.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from softgroup_tpu.data.synthetic import collate_scenes, make_room_scene
    from softgroup_tpu.ops import dispatch, native
    from softgroup_tpu.ops.conv_kernel import (_SUBM_GROUPS, keyed_subm_conv,
                                               _stack_weight, subm_plan,
                                               build_window_meta_np)
    from softgroup_tpu.ops.rulebook import build_subm_rules_np
    from softgroup_tpu.ops.sparse_conv import _conv_xla, subm_conv
    from softgroup_tpu.ops.voxelize import voxelize_np

    assert jax.default_backend() == 'tpu', (
        f'needs a TPU, got {jax.default_backend()}')

    rng = np.random.RandomState(0)
    scene = make_room_scene(rng, n_points=60000, n_instances=8)
    data = collate_scenes([scene], scale=50.0)
    coords = np.ascontiguousarray(data['coords'], np.int32)
    if native.use_native():
        vc, _, _ = native.voxelize_native(coords)
    else:
        vc, _, _ = voxelize_np(coords)
    dims = np.asarray(data['spatial_shape'], np.int64)
    r = build_subm_rules_np(vc, dims) if not native.use_native() else \
        native.subm_rules_native(vc, np.asarray(dims, np.int32))
    cap = ((len(vc) + 255) // 256) * 256
    rules = np.full((27, cap), -1, np.int32)
    rules[:, :len(vc)] = r
    rules_j = jnp.asarray(rules)
    b, w, n_win, ccap = subm_plan(cap)
    meta = build_window_meta_np(rules, _SUBM_GROUPS, 3, w, b, cap, n_win,
                                ccap)
    print(f'rulebook: V={len(vc)} cap={cap} overflow='
          f'{int(np.asarray(meta.n_overflow))}')

    failures = 0
    for cin, cout in ((32, 32), (64, 64), (128, 96)):
        feats = jnp.asarray(rng.randn(cap, cin).astype(np.float32))
        weight = jnp.asarray(
            rng.randn(27, cin, cout).astype(np.float32) * 0.1)
        ref = np.asarray(_conv_xla(feats, weight, rules_j, jnp.float32))
        scale = np.abs(ref).max()
        for tacc in (True, False):
            dispatch.set_kernels(True)
            dispatch.set_tacc(tacc)
            try:
                out = np.asarray(jax.jit(subm_conv)(
                    feats, weight, rules_j, win=meta))
            finally:
                dispatch.set_kernels(None)
                dispatch.set_tacc(None)
            err = np.abs(out - ref).max() / max(scale, 1e-6)
            ok = err < 0.02
            failures += not ok
            print(f'subm C={cin}->{cout} tacc={tacc}: rel_err={err:.4f} '
                  f'{"OK" if ok else "FAIL"}')

    # keyed variant (proposal-grid geometry path) on a dense grid
    d = 16
    n = d * d * d // 2
    keys = np.sort(rng.choice(d * d * d, n, replace=False)).astype(np.int32)
    keyed_cap = ((n + 127) // 128) * 128
    ckey = np.full(keyed_cap, np.iinfo(np.int32).max, np.int32)
    ckey[:n] = keys
    ckey_j = jnp.asarray(ckey)
    feats = jnp.asarray(rng.randn(keyed_cap, 32).astype(np.float32))
    weight = jnp.asarray(rng.randn(27, 32, 32).astype(np.float32) * 0.1)
    from softgroup_tpu.ops.conv_kernel import _SUBM_OFFS, _rules_from_keys
    kr = _rules_from_keys(ckey_j, ckey_j, d, _SUBM_OFFS, False)
    ref = np.asarray(_conv_xla(feats, weight, kr, jnp.float32))
    scale = np.abs(ref).max()
    for tacc in (True, False):
        out = np.asarray(keyed_subm_conv(
            feats, _stack_weight(weight, 3), ckey_j, d, tacc=tacc))
        err = np.abs(out - ref).max() / max(scale, 1e-6)
        ok = err < 0.02
        failures += not ok
        print(f'keyed subm tacc={tacc}: rel_err={err:.4f} '
              f'{"OK" if ok else "FAIL"}')

    print('hardware parity:', 'PASS' if failures == 0 else
          f'{failures} FAILURES')
    return 1 if failures else 0


if __name__ == '__main__':
    sys.exit(main())
