"""Kinematics golden tests vs the reference numpy implementations."""

import sys

import numpy as np
import pytest

from dstdgcn_tpu.data import kinematics as K

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

try:
    from dataset.utils import (expmap2rotmat, fkl, quat2expmap, rotmat2quat,
                               _some_variables, _some_variables_cmu)
except Exception:
    expmap2rotmat = None

needs_ref = pytest.mark.skipif(expmap2rotmat is None,
                               reason="reference repo not available")


@needs_ref
def test_expmap_to_rotmat_matches_reference(rng):
    rs = rng.randn(50, 3).astype(np.float32)
    ours = K.expmap_to_rotmat(rs)
    for i, r in enumerate(rs):
        np.testing.assert_allclose(ours[i], expmap2rotmat(r), rtol=1e-4,
                                   atol=1e-5)


@needs_ref
def test_quat_roundtrip_matches_reference(rng):
    rs = rng.randn(20, 3).astype(np.float64)
    rm = K.expmap_to_rotmat(rs)
    q = K.rotmat_to_quat(rm)
    back = K.quat_to_expmap(q)
    for i in range(len(rs)):
        ref_q = rotmat2quat(expmap2rotmat(rs[i]))
        np.testing.assert_allclose(q[i], ref_q, rtol=1e-3, atol=1e-4)
        ref_e = quat2expmap(ref_q)
        np.testing.assert_allclose(back[i], ref_e, rtol=1e-3, atol=1e-4)


@needs_ref
def test_h36m_forward_kinematics_matches_reference_fkl(rng):
    skel = K.h36m_skeleton()
    parent, offset, rotInd, expmapInd = _some_variables()
    np.testing.assert_array_equal(skel.parents, parent)
    np.testing.assert_allclose(skel.offsets, offset)

    angles = (0.3 * rng.randn(4, 99)).astype(np.float32)
    angles[:, :6] = 0  # loaders zero global rot/trans (utils.py:856)
    ours = K.forward_kinematics(angles, skel)
    for i in range(len(angles)):
        want = fkl(angles[i], parent, offset, rotInd, expmapInd)
        np.testing.assert_allclose(ours[i], want, rtol=1e-3, atol=1e-2)


@needs_ref
def test_cmu_forward_kinematics_matches_reference_fkl(rng):
    skel = K.cmu_skeleton()
    parent, offset, rotInd, expmapInd = _some_variables_cmu()
    np.testing.assert_array_equal(skel.parents, parent)
    np.testing.assert_allclose(skel.offsets, offset, rtol=1e-6)

    angles = (0.3 * rng.randn(3, 117)).astype(np.float32)
    angles[:, :6] = 0
    ours = K.forward_kinematics(angles, skel)
    for i in range(len(angles)):
        want = fkl_cmu(angles[i], parent, offset, expmapInd)
        np.testing.assert_allclose(ours[i], want, rtol=1e-3, atol=1e-2)


def fkl_cmu(angles, parent, offset, expmapInd):
    """Reference ``fkl_torch`` semantics in plain numpy (the reference's
    ``fkl`` asserts 99 channels; its torch variant is GPU-only)."""
    j = len(parent)
    r = np.stack([np.asarray(
        K.expmap_to_rotmat(angles[expmapInd[i]]))
        for i in range(j)])
    r_glob = r.copy()
    p = offset.copy().astype(np.float64)
    for i in range(1, j):
        if parent[i] > 0:
            p[i] = offset[i] @ r_glob[parent[i]] + p[parent[i]]
            r_glob[i] = r[i] @ r_glob[parent[i]]
    return p


def test_fk_zero_angles_gives_offsets_chain():
    skel = K.h36m_skeleton()
    angles = np.zeros((1, 99), np.float32)
    out = K.forward_kinematics(angles, skel)[0]
    # with identity rotations every joint is the cumulative offset sum
    want = skel.offsets.copy()
    for lvl in skel.levels[1:]:
        for j in lvl:
            if skel.parents[j] > 0:
                want[j] = skel.offsets[j] + want[skel.parents[j]]
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-3)
