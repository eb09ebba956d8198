"""Golden tests: adjacency builders vs the reference generators."""

import sys

import numpy as np
import pytest

from dstdgcn_tpu.graphs import skeleton as sk
from dstdgcn_tpu.graphs import temporal as tg

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

try:
    from model.layers.graph import Graph as RefGraph
    from model.layers.time import Time as RefTime
except Exception:
    RefGraph = RefTime = None

needs_ref = pytest.mark.skipif(RefGraph is None,
                               reason="reference repo not available")


@needs_ref
@pytest.mark.parametrize("layout", ["h36m", "cmu", "3dpw"])
def test_skeleton_adjacency_matches_reference(layout):
    ref = RefGraph(layout)
    for kind in ["self", "connect", "part", "all"]:
        ours = sk.adjacency(layout, kind)
        theirs = ref.get_adjacency_type(kind)
        assert np.array_equal(ours, theirs.astype(np.float32)), (layout, kind)
    assert np.array_equal(sk.stacked_adjacency(layout),
                          ref.get_all_adjacency().astype(np.float32))
    assert np.array_equal(sk.adjacency(layout, "all"),
                          ref.get_adjacency().astype(np.float32))


@needs_ref
@pytest.mark.parametrize("t", [15, 20, 35, 40])
def test_temporal_adjacency_matches_reference(t):
    ref = RefTime(t)
    for kind, ref_kind in [("self", "self"), ("neighbor", "neighboor"),
                           ("inout", "inout"), ("all", "all")]:
        ours = tg.adjacency(t, kind)
        theirs = ref.get_adjacency_type(ref_kind)
        assert np.array_equal(ours, theirs.astype(np.float32)), (t, kind)
    assert np.array_equal(tg.stacked_adjacency(t),
                          ref.get_all_adjacency().astype(np.float32))


def test_layout_shapes():
    assert sk.get_layout("h36m").num_joints == 22
    assert sk.get_layout("cmu").num_joints == 25
    assert sk.get_layout("3dpw").num_joints == 23


def test_bone_incidence_lengths():
    inc = sk.bone_incidence("h36m")
    assert inc.shape == (22, 22)  # 22 bone edges for h36m
    # every column has exactly one +1 and one -1
    assert np.all(inc.sum(0) == 0)
    assert np.all(np.abs(inc).sum(0) == 2)


def test_edge_list_roundtrip():
    adj = sk.adjacency("h36m", "all")
    edges = sk.edge_list(adj)
    recon = np.zeros_like(adj)
    recon[edges[:, 0], edges[:, 1]] = 1
    assert np.array_equal(recon, adj)


@needs_ref
def test_jbc_adjacency_matches_reference_h36m():
    from model.layers.graph import GraphJBC
    ref = GraphJBC("h36m")
    assert np.array_equal(sk.jbc_adjacency("h36m", "joint"),
                          ref.get_joint_adjacency().astype(np.float32))
    assert np.array_equal(sk.jbc_adjacency("h36m", "bone"),
                          ref.get_bone_adjacency().astype(np.float32))
    assert np.array_equal(sk.jbc_adjacency("h36m", "cross"),
                          ref.get_cross_adjacency().astype(np.float32))


@needs_ref
def test_flattened_adjacency_matches_reference_h36m():
    from model.layers.graph import GraphFlatten
    ref = GraphFlatten("h36m")
    assert np.array_equal(sk.flattened_adjacency("h36m", "joint"),
                          ref.load_joint_graph().astype(np.float32))
    assert np.array_equal(sk.flattened_adjacency("h36m", "coordinate"),
                          ref.load_coordinate_graph().astype(np.float32))
    assert np.array_equal(sk.flattened_adjacency("h36m", "connection"),
                          ref.load_connection_graph().astype(np.float32))


@pytest.mark.parametrize("layout", ["h36m", "cmu", "3dpw"])
def test_jbc_and_flattened_structural(layout):
    """The reference only implements h36m; ours generalizes to all layouts."""
    lay = sk.get_layout(layout)
    e = len(lay.kinematic_bones)
    joint = sk.jbc_adjacency(layout, "joint")
    assert np.array_equal(joint, joint.T)
    bone = sk.jbc_adjacency(layout, "bone")
    assert bone.shape == (e, e) and np.array_equal(np.diag(bone), np.ones(e))
    cross = sk.jbc_adjacency(layout, "cross")
    assert np.array_equal(cross.sum(axis=1), 2 * np.ones(e))
    flat_j = sk.flattened_adjacency(layout, "joint")
    assert np.array_equal(flat_j, flat_j.T)
    coord = sk.flattened_adjacency(layout, "coordinate")
    v = lay.num_joints
    assert coord.sum() == v * 3 * 2  # each joint: a 3-clique (6 directed)
    conn = sk.flattened_adjacency(layout, "connection")
    assert np.array_equal(np.diag(conn), np.zeros(3 * v))


@needs_ref
def test_hop_and_normalize_match_reference():
    from dataset.utils import (get_hop_distance, normalize_digraph,
                               normalize_undigraph)
    rng = np.random.RandomState(3)
    edges = [(i, j) for i in range(10) for j in range(10)
             if i != j and rng.rand() < 0.25]
    ours = sk.hop_distance(np.asarray(edges), 10, max_hop=3)
    ref = get_hop_distance(10, edges, max_hop=3)
    assert np.array_equal(ours, ref)
    adj = (rng.rand(12, 12) < 0.3).astype(float)
    assert np.allclose(sk.normalize_digraph(adj), normalize_digraph(adj))
    assert np.allclose(sk.normalize_undigraph(adj), normalize_undigraph(adj))


@needs_ref
@pytest.mark.parametrize("strategy", ["uniform", "distance", "spatial"])
def test_stgcn_adjacency_matches_reference_h36m(strategy):
    """Generic partitioner vs GraphH36, fed the reference's own edge list
    (its compact-index remap has an off-by-one we don't bake into our
    layout tables — see skeleton.py docstring)."""
    from dataset.utils import GraphH36
    for max_hop in (1, 2):
        ref = GraphH36("h36m", strategy=strategy, max_hop=max_hop)
        ours = sk.stgcn_adjacency(np.asarray(ref.edge), strategy=strategy,
                                  max_hop=max_hop, center=ref.center,
                                  num_node=ref.num_node)
        assert ours.shape == ref.A_j.shape
        assert np.allclose(ours, ref.A_j, atol=1e-7)


@needs_ref
def test_joint_bone_transform_matches_reference_h36m():
    from dataset.utils import JointBoneTransformH36
    ref = JointBoneTransformH36()
    assert np.array_equal(sk.joint_bone_flattened("h36m", "joint"),
                          ref.get_joint_flatten_adjacent().astype(np.float32))
    assert np.array_equal(sk.joint_bone_flattened("h36m", "bone"),
                          ref.get_bone_flattens_adjacent().astype(np.float32))
    assert np.array_equal(sk.joint_bone_flattened("h36m", "joint-node"),
                          ref.get_joint_adjacent().astype(np.float32))
    assert np.array_equal(sk.joint_bone_flattened("h36m", "bone-node"),
                          ref.get_bone_adjacent().astype(np.float32))
    assert np.array_equal(sk.joint_bone_transition("h36m"),
                          ref.get_transition().astype(np.float32))


@pytest.mark.parametrize("layout", ["h36m", "cmu", "3dpw"])
def test_stgcn_and_joint_bone_generalize(layout):
    for strategy, k in (("uniform", 1), ("spatial", 3)):
        a = sk.stgcn_adjacency(layout, strategy=strategy, max_hop=1, center=0)
        v = sk.get_layout(layout).num_joints
        assert a.shape == (k, v, v)
        # each partition stack sums back to the normalized adjacency
        assert np.all(a.sum(0) >= 0)
    trans = sk.joint_bone_transition(layout)
    e = len(sk.get_layout(layout).kinematic_bones)
    assert trans.shape == (3 * sk.get_layout(layout).num_joints, 3 * e)
    assert np.array_equal(trans.sum(0), 2 * np.ones(3 * e))
