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
