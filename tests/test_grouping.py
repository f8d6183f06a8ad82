"""ball_cluster vs. an exact numpy connected-components oracle.

Shape discipline: every case is padded to one canonical size (PAD = 256)
and dispatched through a cached jitted wrapper with the radius as a traced
argument, so the whole file compiles each clustering variant ONCE (the
suite previously paid a fresh eager trace + compile per test — ~185 s of
the fast suite's wall-clock on the 1-core CI host)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from softgroup_tpu.ops.grouping import ball_cluster

PAD = 256


@functools.lru_cache(maxsize=None)
def _jitted_ball(neighbors_per_cell, own_window):
    fn = functools.partial(ball_cluster,
                           neighbors_per_cell=neighbors_per_cell,
                           own_window=own_window)
    return jax.jit(lambda p, g, v, r: fn(p, g, v, r))


@functools.lru_cache(maxsize=None)
def _jitted_cell(pair_keys, cell_scale, m_cap):
    from softgroup_tpu.ops.grouping import cell_cluster
    return jax.jit(lambda p, g, v, r: cell_cluster(
        p, g, v, r, cell_scale=cell_scale, m_cap=m_cap,
        pair_keys=pair_keys))


@functools.lru_cache(maxsize=None)
def _jitted_csr(pair_keys, cell_scale, m_cap, n_thr):
    from softgroup_tpu.ops.grouping import cell_cluster_csr
    return jax.jit(lambda p, g, v, pay, thr, r: cell_cluster_csr(
        p, g, v, pay, thr, r, cell_scale=cell_scale, m_cap=m_cap,
        pair_keys=pair_keys))


def cc_oracle(pts, batch, radius):
    """Exact union-find over the full r-ball graph."""
    n = len(pts)
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        for j in range(i + 1, n):
            if batch[i] == batch[j] and \
                    np.sum((pts[i] - pts[j]) ** 2) <= radius ** 2:
                ra, rb = find(i), find(j)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    return np.array([find(i) for i in range(n)])


def canon(labels):
    """Canonical cluster partition as a set of frozensets."""
    out = {}
    for i, l in enumerate(labels):
        out.setdefault(l, set()).add(i)
    return {frozenset(v) for v in out.values()}


def run_case(pts, batch, radius, pad_to=PAD, neighbors_per_cell=4,
             own_window=4):
    n = len(pts)
    p = np.zeros((pad_to, 3), np.float32)
    p[:n] = pts
    b = np.zeros((pad_to,), np.int32)
    b[:n] = batch
    valid = np.arange(pad_to) < n
    fn = _jitted_ball(neighbors_per_cell, own_window)
    labels = np.asarray(fn(jnp.asarray(p), jnp.asarray(b),
                           jnp.asarray(valid), jnp.float32(radius)))
    assert (labels[n:] == -1).all()
    return labels[:n]


class TestBallCluster:

    def test_uniform_random_matches_oracle(self, rng):
        pts = rng.rand(80, 3).astype(np.float32) * 0.6
        batch = np.zeros(80, np.int64)
        got = run_case(pts, batch, 0.08,
                       neighbors_per_cell=8, own_window=8)
        expect = cc_oracle(pts, batch, 0.08)
        assert canon(got) == canon(expect)

    def test_dense_blobs(self, rng):
        """Offset-shifted instances collapse into tight blobs — the common
        case; blobs further apart than r must stay separate."""
        centers = np.array([[0, 0, 0], [0.5, 0, 0], [0, 0.5, 0]])
        pts = np.concatenate(
            [c + rng.randn(60, 3) * 0.01 for c in centers]).astype(np.float32)
        batch = np.zeros(len(pts), np.int64)
        got = run_case(pts, batch, 0.05)
        expect = cc_oracle(pts, batch, 0.05)
        assert canon(got) == canon(expect)

    def test_batch_separation(self, rng):
        """Identical coordinates in different batch items never connect
        (reference: per-batch ball query, bfs_cluster.cu:23-30)."""
        pts = np.tile(rng.rand(30, 3).astype(np.float32) * 0.1, (2, 1))
        batch = np.repeat([0, 1], 30)
        got = run_case(pts, batch, 0.05)
        assert canon(got) == canon(cc_oracle(pts, batch, 0.05))
        assert len({got[i] for i in range(30)} &
                   {got[i] for i in range(30, 60)}) == 0

    def test_chain_connectivity(self):
        """A long chain of points spaced just under r forms one component
        (stresses propagation round count)."""
        m = 150
        pts = np.zeros((m, 3), np.float32)
        pts[:, 0] = np.arange(m) * 0.039
        batch = np.zeros(m, np.int64)
        got = run_case(pts, batch, 0.04)
        assert len(canon(got)) == 1

    def test_all_invalid(self):
        fn = _jitted_ball(4, 4)
        labels = np.asarray(fn(
            jnp.zeros((PAD, 3)), jnp.zeros((PAD,), jnp.int32),
            jnp.zeros((PAD,), bool), jnp.float32(0.04)))
        assert (labels == -1).all()


class TestCellCluster:
    """cell_cluster (production path) — SoftGroup++-style centroid grouping;
    exact on well-separated blobs."""

    def run(self, pts, batch, radius, pair_keys=True, cell_scale=0.5):
        n = len(pts)
        p = np.zeros((PAD, 3), np.float32)
        p[:n] = pts
        b = np.zeros((PAD,), np.int32)
        b[:n] = batch
        valid = np.arange(PAD) < n
        fn = _jitted_cell(pair_keys, cell_scale, PAD)
        labels, _, _, _ = fn(jnp.asarray(p), jnp.asarray(b),
                             jnp.asarray(valid), jnp.float32(radius))
        return np.asarray(labels)[:n]

    def test_blobs_separate_and_merge(self, rng):
        centers = np.array([[0, 0, 0], [1.0, 0, 0], [0, 1.0, 0]])
        pts = np.concatenate(
            [c + rng.randn(50, 3) * 0.01 for c in centers]).astype(np.float32)
        batch = np.zeros(len(pts), np.int32)
        got = self.run(pts, batch, 0.05)
        parts = canon(got)
        assert len(parts) == 3
        for i in range(3):
            assert frozenset(range(i * 50, (i + 1) * 50)) in parts

    def test_batch_separation(self, rng):
        pts = np.tile((rng.rand(30, 3) * 0.02).astype(np.float32), (2, 1))
        batch = np.repeat([0, 1], 30).astype(np.int32)
        got = self.run(pts, batch, 0.1)
        assert len(canon(got)) == 2
        assert {got[i] for i in range(30)}.isdisjoint(
            {got[i] for i in range(30, 60)})

    def test_single_key_mode_matches_pair(self, rng):
        # pair_keys=False (bounded-scene fast path) must produce the same
        # partition as the safe pair-key default
        centers = np.array([[0, 0, 0], [1.0, 0, 0], [0, 1.0, 0]])
        pts = np.concatenate(
            [c + rng.randn(50, 3) * 0.01 for c in centers]).astype(np.float32)
        batch = np.zeros(len(pts), np.int32)
        a = canon(self.run(pts, batch, 0.05, pair_keys=True))
        b = canon(self.run(pts, batch, 0.05, pair_keys=False))
        assert a == b

    def test_chain_merges(self):
        m = 60
        pts = np.zeros((m, 3), np.float32)
        pts[:, 0] = np.arange(m) * 0.03  # consecutive cells connect
        got = self.run(pts, np.zeros(m, np.int32), 0.04)
        assert len(canon(got)) == 1


class TestCellClusterCSR:
    """cell_cluster_csr (sorted-space fast path) must produce the same
    thresholded partition as cell_cluster + entry-level size gating."""

    def both(self, pts, group, valid, payload, thr_cls, radius):
        n = len(pts)
        m = PAD
        pp = np.zeros((PAD, 3), np.float32)
        pp[:n] = pts
        gg = np.zeros((PAD,), np.int32)
        gg[:n] = group
        vv = np.zeros((PAD,), bool)
        vv[:n] = valid
        # pad payloads get unique ids >= n so they can never collide with a
        # real entry when tests scatter labels back by payload
        pay = np.arange(PAD, dtype=np.int32)
        pay[:n] = payload
        pts_j, g_j = jnp.asarray(pp), jnp.asarray(gg)
        v_j = jnp.asarray(vv)
        # legacy path + explicit per-entry threshold
        labels, _, clab, cnt = _jitted_cell(True, 0.5, m)(
            pts_j, g_j, v_j, jnp.float32(radius))
        sizes = np.zeros(m + 1, np.float32)
        np.add.at(sizes, np.clip(np.asarray(clab), 0, m), np.asarray(cnt))
        labels = np.asarray(labels)
        size_of = sizes[np.clip(labels, 0, m - 1)]
        thr = thr_cls[np.asarray(gg) % len(thr_cls)]
        keep = vv & (labels >= 0) & (size_of >= thr)
        legacy = np.where(keep, labels, -1)[:n]
        # fast path
        ent_label, payload_s = _jitted_csr(True, 0.5, m, len(thr_cls))(
            pts_j, g_j, v_j, jnp.asarray(pay), jnp.asarray(thr_cls),
            jnp.float32(radius))
        return legacy, np.asarray(ent_label), np.asarray(payload_s)

    def test_matches_legacy_with_threshold(self, rng):
        n_cls = 3
        centers = np.array([[0, 0, 0], [1.0, 0, 0], [0, 1.0, 0],
                            [1.0, 1.0, 0]])
        sizes = [50, 30, 8, 3]
        pts = np.concatenate(
            [c + rng.randn(s, 3) * 0.01 for c, s in zip(centers, sizes)]
        ).astype(np.float32)
        n = len(pts)
        cls = np.concatenate(
            [np.full(s, i % n_cls, np.int32) for i, s in enumerate(sizes)])
        group = cls.astype(np.int32)  # batch 0: group == class
        valid = np.ones(n, bool)
        payload = np.arange(n, dtype=np.int32)
        thr_cls = np.array([10.0, 5.0, 100.0], np.float32)
        legacy, ent_label, payload_s = self.both(
            pts, group, valid, payload, thr_cls, 0.05)
        # compare as (payload -> label) maps: fast path is in sorted order
        fast = np.full(PAD, -1, np.int64)
        fast[payload_s] = ent_label
        fast = fast[:n]
        # same kept-entry sets per cluster
        assert canon(fast) == canon(legacy)
        # last blob (class 0, size 3 < thr 10) must be dropped entirely
        assert (fast[-3:] == -1).all()

    def test_padding_and_invalid(self, rng):
        pts = np.zeros((64, 3), np.float32)
        pts[:32, 0] = np.arange(32) * 0.001
        valid = np.arange(64) < 32
        group = np.zeros(64, np.int32)
        payload = np.arange(64, dtype=np.int32)
        legacy, ent_label, payload_s = self.both(
            pts, group, valid, payload, np.array([1.0], np.float32), 0.05)
        # invalid entries -> -1, valid entries form a prefix
        fast = np.full(PAD, -1, np.int64)
        fast[payload_s] = ent_label
        fast = fast[:64]
        assert (fast[32:] == -1).all()
        assert (ent_label[:32] >= 0).all() and (ent_label[32:] == -1).all()
        assert canon(fast) == canon(legacy)

    def test_kernel_path_invalid_tail(self, rng):
        """Regression (VERDICT r03 missing #1): with the Pallas gather
        kernel dispatched, the sentinel cid (= m) of the invalid tail used
        to overflow the gather window and read label 0 instead of -1,
        flooding proposal 0 with every padded entry and pushing real
        components past the CSR cap (AP 0.25 vs 1.00 on the fidelity
        harness).  Kernel conditions: n % 256 == 0, m + 1 >= 384."""
        from softgroup_tpu.ops import dispatch
        from softgroup_tpu.ops.grouping import cell_cluster_csr
        n, m = 256, 512    # one 256-entry block; m + 1 >= 384 window
        n_valid = 100
        pts = np.zeros((n, 3), np.float32)
        # three well-separated blobs in the valid prefix
        centers = np.array([[0, 0, 0], [1.0, 0, 0], [0, 1.0, 0]])
        which = rng.randint(3, size=n_valid)
        pts[:n_valid] = centers[which] + rng.randn(n_valid, 3) * 0.01
        valid = np.arange(n) < n_valid
        group = np.zeros(n, np.int32)
        payload = np.arange(n, dtype=np.int32)
        dispatch.set_kernels(True)
        dispatch.set_interpret(True)
        try:
            ent_label, payload_s = cell_cluster_csr(
                jnp.asarray(pts), jnp.asarray(group), jnp.asarray(valid),
                jnp.asarray(payload), jnp.asarray([1.0], jnp.float32),
                0.05, m_cap=m)
        finally:
            dispatch.set_kernels(None)
            dispatch.set_interpret(None)
        ent_label = np.asarray(ent_label)
        payload_s = np.asarray(payload_s)
        fast = np.full(n, -1, np.int64)
        fast[payload_s] = ent_label
        assert (fast[n_valid:] == -1).all()          # the old bug: label 0
        assert (ent_label[:n_valid] >= 0).all()
        assert (ent_label[n_valid:] == -1).all()
        assert len(canon(fast[:n_valid])) == 3       # the 3 blobs


class TestPerClassPyramidLevels:
    """SoftGroup++ picks a pyramid level PER CLASS from its active count
    (reference softgroup.py:445,482-489).  Two classes straddling the level
    threshold must cluster at different effective radii in ONE fused
    grouping call: the big class's level-2 radius merges blobs the small
    class's level-1 radius keeps apart."""

    def _run(self, with_pyramid):
        import jax.numpy as jnp

        from softgroup_tpu.model.softgroup import Capacities, forward_grouping
        from softgroup_tpu.util.config import Config

        rng = np.random.RandomState(0)
        n_cls = 6
        blobs = []           # (center, class, n)
        # class 2 ("small"): 2x20 active points; class 3 ("big"): 2x40
        for c, n_per in ((2, 20), (3, 40)):
            for bx in (0.0, 0.5):
                blobs.append((np.array([bx, c * 3.0, 0.0]), c, n_per))
        pts, cls = [], []
        for center, c, n_per in blobs:
            pts.append(center + rng.randn(n_per, 3).astype(np.float32) * 0.01)
            cls.append(np.full(n_per, c, np.int32))
        coords = np.concatenate(pts).astype(np.float32)
        cls = np.concatenate(cls)
        p_cap = 256
        n = len(coords)
        coords_p = np.zeros((p_cap, 3), np.float32)
        coords_p[:n] = coords
        scores = np.full((p_cap, n_cls), -10.0, np.float32)
        scores[np.arange(n), cls] = 10.0
        valid = np.arange(p_cap) < n

        cfg = Config(dict(
            grouping_cfg=dict(
                score_thr=0.2, radius=0.3, mean_active=300,
                class_numpoint_mean=[-1.0] * n_cls, npoint_thr=5,
                ignore_classes=[0, 1], with_pyramid=with_pyramid,
                pyramid_thresholds=(50, 10 ** 9), exact_ball_query=True),
            test_cfg=dict(min_npoint=10),
        ))
        caps = Capacities(points=p_cap, voxels=(p_cap,),
                          grouping_points=512, proposals=16,
                          proposal_entries=512, instances=8,
                          inst_voxels=(256,), grouping_cells=512)
        props = forward_grouping(
            jnp.asarray(scores), jnp.zeros((p_cap, 3), jnp.float32),
            jnp.zeros((p_cap,), jnp.int32), jnp.asarray(coords_p),
            jnp.asarray(valid), cfg, caps)
        n_props = int(props.n_proposals)
        # proposal -> class via its first point
        ev = np.asarray(props.entry_valid)
        seg = np.asarray(props.entry_seg)[ev]
        pt = np.asarray(props.entry_pt)[ev]
        per_class = {}
        for s in np.unique(seg):
            c = int(cls[pt[seg == s][0]])
            per_class[c] = per_class.get(c, 0) + 1
        return n_props, per_class

    def test_levels_differ_across_threshold(self):
        # no pyramid: both classes split into 2 blobs (gap 0.5 > radius 0.3)
        n0, by_cls0 = self._run(with_pyramid=False)
        assert by_cls0 == {2: 2, 3: 2}, by_cls0
        # pyramid: class 3 (80 active > thr 50) gets level 2 -> effective
        # radius 0.6 merges its blobs; class 2 (40 active) stays level 1
        n1, by_cls1 = self._run(with_pyramid=True)
        assert by_cls1 == {2: 2, 3: 1}, by_cls1
