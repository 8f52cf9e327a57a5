"""Native map-store (C++/ctypes) vs the Python MapLineStore (oracle).

Runs a randomized operation trace through both and checks the graph state
(observations, covisibility, windows) stays identical.
"""

import numpy as np
import pytest

from tpuslam.slammap.map import KeyFrame, MapLineStore, SlamMap
from tpuslam.slammap.native import load_native, NativeMapStore


pytestmark = pytest.mark.skipif(load_native() is None, reason="no native toolchain")


def test_basic_lifecycle():
    s = NativeMapStore(line_capacity=64, kf_capacity=8, feat_capacity=16)
    for k in range(3):
        s.add_keyframe(k)
    a = s.allocate(0)
    b = s.allocate(0)
    assert a != b and s.alive(a) and s.alive(b)
    assert s.add_observation(a, 0, 2)
    assert s.add_observation(a, 1, 3)
    assert s.add_observation(b, 1, 4)
    assert s.n_obs(a) == 2
    assert list(s.line_ids(1)[:5]) == [-1, -1, -1, a, b]
    # covisibility of kf0: shares landmark a with kf1
    kids, counts = s.covisibility(0)
    assert list(kids) == [1] and list(counts) == [1]
    # window lines over (0, 1)
    assert sorted(s.window_lines([0, 1])) == sorted([a, b])
    # observation table
    li, kk, ss = s.observations(np.asarray([a, b]))
    assert len(li) == 3
    # erase + kill
    s.erase_observation(a, 1)
    assert s.n_obs(a) == 1
    s.kill(b)
    assert not s.alive(b)
    assert s.line_ids(1)[4] == -1


def test_replace_fusion():
    s = NativeMapStore(line_capacity=16, kf_capacity=4, feat_capacity=8)
    for k in range(3):
        s.add_keyframe(k)
    old = s.allocate(0)
    new = s.allocate(1)
    s.add_observation(old, 0, 1)
    s.add_observation(old, 1, 2)
    s.add_observation(new, 1, 3)
    s.add_observation(new, 2, 4)
    s.replace(old, new)
    assert not s.alive(old)
    # kf0's slot now points at new; kf1 keeps its original binding of new
    assert s.line_ids(0)[1] == new
    assert s.line_ids(1)[3] == new
    assert s.line_ids(1)[2] == -1
    assert s.n_obs(new) == 3


def test_randomized_parity_with_python_store(rng):
    """Drive both stores with the same op trace; compare state."""
    from tpuslam.frontend.frame import FrameFeatures

    F = 12
    nat = NativeMapStore(line_capacity=256, kf_capacity=16, feat_capacity=F)
    smap = SlamMap(line_capacity=256)

    def mk_kf(kid):
        f = FrameFeatures(
            endpoints=np.zeros((F, 2, 2), np.float32),
            valid=np.ones(F, bool),
            angle=np.zeros(F, np.float32),
            length=np.zeros(F, np.float32),
            midpoint=np.zeros((F, 2), np.float32),
            response=np.zeros(F, np.float32),
            level=np.zeros(F, np.int32),
            sigma=np.ones(F, np.float32),
            desc=np.zeros((F, 72), np.float32),
            desc_bits=np.zeros((F, 8), np.uint32),
            depth=np.zeros((F, 2), np.float32),
            has_depth=np.zeros(F, bool),
        )
        return smap.new_keyframe(kid, 0.0, np.eye(4, dtype=np.float32), f)

    kfs = {}
    lids = []
    for k in range(8):
        kfs[k] = mk_kf(k)
        nat.add_keyframe(k)
    for _ in range(200):
        op = rng.integers(0, 5)
        if op == 0 or not lids:  # allocate + bind
            k = int(rng.integers(0, 8))
            slot = int(rng.integers(0, F))
            if kfs[k].line_ids[slot] >= 0:
                continue
            lp = smap.lines.allocate(np.zeros(6, np.float32), np.zeros((2, 3), np.float32), np.zeros(8, np.uint32), k)
            ln = nat.allocate(k)
            assert lp == ln
            smap.lines.add_observation(lp, kfs[k], slot)
            nat.add_observation(ln, k, slot)
            lids.append(lp)
        elif op == 1:  # add obs
            lid = int(rng.choice(lids))
            k = int(rng.integers(0, 8))
            slot = int(rng.integers(0, F))
            if not smap.lines.alive[lid] or kfs[k].line_ids[slot] >= 0:
                continue
            if k in smap.lines.obs.get(lid, {}):
                continue
            smap.lines.add_observation(lid, kfs[k], slot)
            nat.add_observation(lid, k, slot)
        elif op == 2:  # erase obs
            lid = int(rng.choice(lids))
            k = int(rng.integers(0, 8))
            smap.lines.erase_observation(lid, kfs[k])
            nat.erase_observation(lid, k)
        elif op == 3:  # kill
            lid = int(rng.choice(lids))
            if smap.lines.alive[lid]:
                smap.lines.kill(lid, smap.keyframes)
                nat.kill(lid)
        else:  # replace
            if len(lids) < 2:
                continue
            a, b = rng.choice(lids, 2, replace=False)
            a, b = int(a), int(b)
            if a == b or not (smap.lines.alive[a] and smap.lines.alive[b]):
                continue
            smap.lines.replace(a, b, smap.keyframes)
            nat.replace(a, b)

    # compare state
    for lid in set(lids):
        assert bool(smap.lines.alive[lid]) == nat.alive(lid), lid
        if smap.lines.alive[lid]:
            assert int(smap.lines.n_obs[lid]) == nat.n_obs(lid), lid
    for k in range(8):
        assert np.array_equal(kfs[k].line_ids, nat.line_ids(k)), k
    # covisibility parity
    for k in range(8):
        smap.update_connections(kfs[k])
        py = smap.covis[k]
        kids, counts = nat.covisibility(k)
        assert dict(zip(kids.tolist(), counts.tolist())) == py, k


def test_replace_overflow_clears_stale_slot():
    """When new_id's observation list is full, ms_replace must still clear
    the keyframe slot that pointed at the dying old_id (ADVICE r1)."""
    s = NativeMapStore(line_capacity=128, kf_capacity=64, feat_capacity=8)
    for k in range(40):
        s.add_keyframe(k)
    new = s.allocate(0)
    # fill new's observation list to MAX_OBS (32)
    for k in range(32):
        assert s.add_observation(new, k, 1)
    old = s.allocate(33)
    assert s.add_observation(old, 33, 2)
    s.replace(old, new)
    assert not s.alive(old)
    # overflow: new couldn't absorb kf33's observation, but the slot must
    # not keep pointing at the dead old id
    assert s.line_ids(33)[2] == -1
    # reallocating must not alias into kf33's stale slot
    fresh = s.allocate(34)
    assert s.line_ids(33)[2] == -1 and fresh >= 0


def test_add_observation_rebind_clears_previous_slot():
    s = NativeMapStore(line_capacity=16, kf_capacity=4, feat_capacity=8)
    s.add_keyframe(0)
    a = s.allocate(0)
    assert s.add_observation(a, 0, 2)
    # re-bind the same (landmark, keyframe) pair to a different slot
    assert s.add_observation(a, 0, 5)
    ids = s.line_ids(0)
    assert ids[5] == a and ids[2] == -1
    assert s.n_obs(a) == 1


def test_slammap_native_mirror_covisibility_parity(rng):
    """SlamMap with the native graph mirror produces the same covisibility
    rows and spanning tree as the pure-python path over a randomized
    allocate/observe/kill/replace/cull sequence (the production integration:
    update_connections routes its recount through native/mapstore.cpp)."""
    from tpuslam.frontend.frame import FrameFeatures

    def mk_feats(K=32):
        return FrameFeatures(
            endpoints=np.zeros((K, 2, 2), np.float32),
            valid=np.ones(K, np.float32),
            angle=np.zeros(K, np.float32),
            length=np.zeros(K, np.float32),
            midpoint=np.zeros((K, 2), np.float32),
            response=np.zeros(K, np.float32),
            level=np.zeros(K, np.int32),
            sigma=np.ones(K, np.float32),
            desc=np.zeros((K, 72), np.float32),
            desc_bits=np.zeros((K, 8), np.uint32),
            depth=np.zeros((K, 2), np.float32),
            has_depth=np.zeros(K, np.float32),
        )

    maps = [SlamMap(line_capacity=256, native=True), SlamMap(line_capacity=256, native=False)]
    assert maps[0].lines.mirror is not None, "native mirror failed to load"
    lids: list = []
    for step in range(8):
        feats = mk_feats()
        kfs = [m.new_keyframe(step, float(step), np.eye(4, dtype=np.float32), feats) for m in maps]
        # observe a random subset of existing landmarks at matching slots
        # (each landmark at most once per keyframe — the production
        # invariant both stores assume)
        slots = rng.permutation(32)[:12]
        pool = list(dict.fromkeys(lids))
        rng.shuffle(pool)
        for si, lid in zip(slots, pool[:12]):
            for m, kf in zip(maps, kfs):
                if m.lines.alive[lid]:
                    m.lines.add_observation(lid, kf, int(si))
        # allocate a few new landmarks on free slots
        for si in rng.permutation(32)[:6]:
            if kfs[0].line_ids[si] >= 0:
                continue
            new_ids = [
                m.lines.allocate(np.zeros(6), np.zeros((2, 3)), np.zeros(8, np.uint32), kfs[0].kid)
                for m in maps
            ]
            assert new_ids[0] == new_ids[1]
            lids.append(new_ids[0])
            for m, kf, lid in zip(maps, kfs, new_ids):
                m.lines.add_observation(lid, kf, int(si))
        for m, kf in zip(maps, kfs):
            m.update_connections(kf)
        # random kills / replaces / erases, mirrored identically
        if lids and step % 2 == 1:
            victim = int(lids[int(rng.integers(0, len(lids)))])
            for m in maps:
                m.lines.kill(victim, m.keyframes)
        if len(lids) > 4 and step % 3 == 2:
            a, b = (int(lids[i]) for i in rng.integers(0, len(lids), 2))
            for m in maps:
                if m.lines.alive[a] and m.lines.alive[b] and a != b:
                    m.lines.replace(a, b, m.keyframes)
        if step == 5:
            for m in maps:
                m.erase_keyframe(2)

    assert maps[0].lines.mirror is not None, "mirror dropped mid-sequence"
    # covisibility rows must agree exactly
    for kid in maps[1].keyframes:
        assert maps[0].covis.get(kid, {}) == maps[1].covis.get(kid, {}), kid
        assert maps[0].keyframes[kid].parent == maps[1].keyframes[kid].parent
