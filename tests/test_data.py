"""Data pipeline tests: transforms, windows, SRNN indices, datasets."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from dstdgcn_tpu.data import (Loader, Synthetic, TimeTransform, datasets,
                              get_dataset, padding_indices, transforms as tfm)

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


def test_padding_indices_match_reference_semantics():
    i_idx, i_inv = padding_indices(10, 25)
    want = np.concatenate([np.arange(10), np.full(25, 9)])
    np.testing.assert_array_equal(i_idx, want)
    want_inv = np.concatenate([np.arange(25, 35)[::-1], np.full(25, 25)])
    np.testing.assert_array_equal(i_inv, want_inv)


def test_srnn_indices_match_reference():
    try:
        from dataset.utils import find_indices_srnn, find_indices_256
    except Exception:
        pytest.skip("reference not available")
    f1, f2 = datasets.find_indices_srnn(1000, 900, 35)
    r1, r2 = find_indices_srnn(1000, 900, 35)
    np.testing.assert_array_equal(f1, r1)
    np.testing.assert_array_equal(f2, r2)
    f1, f2 = datasets.find_indices_srnn(1000, 900, 35, count=128)
    r1, r2 = find_indices_256(1000, 900, 35)
    np.testing.assert_array_equal(f1, r1)
    np.testing.assert_array_equal(f2, r2)


def test_dct_matches_reference_and_roundtrips(rng):
    try:
        from dataset.utils import get_dct_matrix
    except Exception:
        pytest.skip("reference not available")
    m_ref, im_ref = get_dct_matrix(35)
    m, im = tfm.dct_matrix(35)
    np.testing.assert_allclose(m, m_ref, rtol=1e-10)
    np.testing.assert_allclose(im, im_ref, rtol=1e-8)

    tt = TimeTransform(20, 20)  # full-rank: exact roundtrip
    x = rng.randn(3, 20, 6).astype(np.float32)
    back = tt.inverse(tt.transform(x))
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-3, atol=1e-4)


def test_layout_transforms_match_reference_torch(rng):
    torch = pytest.importorskip("torch")
    try:
        from engine.utils import transform as reft
    except Exception:
        pytest.skip("reference not available")
    x66 = rng.randn(2, 5, 66).astype(np.float32)
    x75 = rng.randn(2, 5, 75).astype(np.float32)
    x69 = rng.randn(2, 5, 69).astype(np.float32)
    cases = [
        ("tsc", x66, reft.tsc_transform, reft.tsc_inverse),
        ("st", x66, reft.st_transform, reft.st_inverse),
        ("cst", x66, reft.cst_transform, reft.cst_inverse),
        ("tscr_h36m", x66, reft.tscr_h36m_transform, reft.tscr_h36m_inverse),
        ("tscr_cmu", x75, reft.tscr_cmu_transform, reft.tscr_cmu_inverse),
        ("tscr_3dpw", x69, reft.tscr_3dpw_transform, reft.tscr_3dpw_inverse),
    ]
    for name, x, rt, ri in cases:
        f, inv = tfm.get_transform(name)
        y = np.asarray(f(jnp.asarray(x)))
        y_ref = rt(torch.from_numpy(x)).numpy()
        np.testing.assert_array_equal(y, y_ref), name
        back = np.asarray(inv(jnp.asarray(y)))
        back_ref = ri(torch.from_numpy(y_ref)).numpy()
        np.testing.assert_array_equal(back, back_ref), name
        np.testing.assert_array_equal(back, x), name


def test_mirror_matches_reference_h36m(rng):
    try:
        from dataset.h36m import Human36M as RefH36M
    except Exception:
        pytest.skip("reference not available")
    seqs = rng.randn(3, 4, 96).astype(np.float32)
    ref_m = RefH36M.get_mirror(None, seqs.copy())
    from dstdgcn_tpu.graphs import get_layout
    lay = get_layout("h36m")
    ours = tfm.mirror_sequences(seqs, lay.mirror_right, lay.mirror_left)
    np.testing.assert_allclose(ours, ref_m, rtol=1e-6)


def test_sliding_windows(rng):
    seq = rng.randn(10, 4).astype(np.float32)
    w = datasets.sliding_windows(seq, 4)
    assert w.shape == (7, 4, 4)
    np.testing.assert_array_equal(w[0], seq[:4])
    np.testing.assert_array_equal(w[6], seq[6:10])


def test_synthetic_dataset_shapes_and_determinism():
    ds1 = Synthetic(layout="h36m", num_sequences=4, input_n=5, output_n=5,
                    seed=3)
    ds2 = Synthetic(layout="h36m", num_sequences=4, input_n=5, output_n=5,
                    seed=3)
    assert ds1.all_seqs.shape == (4, 10, 96)
    assert ds1.input_seqs.shape == (4, 10, 66)
    np.testing.assert_array_equal(ds1.all_seqs, ds2.all_seqs)
    # padding: output frames replicate frame input_n-1
    np.testing.assert_array_equal(ds1.input_seqs[:, 5:],
                                  np.repeat(ds1.input_seqs[:, 4:5], 5, 1))


def test_synthetic_mirror_doubles():
    ds = Synthetic(layout="h36m", num_sequences=4, input_n=5, output_n=5,
                   mirror=True)
    assert len(ds) == 8


def test_loader_determinism_and_sharding_split():
    arrays = tuple(np.arange(20)[:, None] + np.zeros((20, k))
                   for k in (1, 2))
    l1 = Loader(arrays, batch_size=6, shuffle=True, seed=1)
    l1.set_epoch(3)
    b1 = [b[0][:, 0].tolist() for b in l1]
    l2 = Loader(arrays, batch_size=6, shuffle=True, seed=1)
    l2.set_epoch(3)
    b2 = [b[0][:, 0].tolist() for b in l2]
    assert b1 == b2
    assert len(l1) == 4  # ceil(20/6), last partial

    # two-process split covers the global batch disjointly
    la = Loader(arrays, batch_size=6, process_index=0, process_count=2)
    lb = Loader(arrays, batch_size=6, process_index=1, process_count=2)
    for (xa,), (xb,) in zip(
            ((b[0],) for b in la), ((b[0],) for b in lb)):
        assert set(xa[:, 0]) & set(xb[:, 0]) == set()


def test_joint_weights_normalized():
    ds = Synthetic(layout="h36m", num_sequences=4, input_n=5, output_n=5)
    assert ds.joint_weight_all.min() == pytest.approx(0)
    assert ds.joint_weight_all.max() == pytest.approx(1)
    assert ds.joint_weight_use.shape == (22,)


class TestPoseNorm:
    """Golden tests vs the reference ExPI/NTU normalization helpers."""

    def _ref(self):
        import sys
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        try:
            from dataset import utils as ref_utils
        except Exception:
            return None
        return ref_utils

    def test_expi_2p_matches_reference(self):
        ref = self._ref()
        if ref is None:
            import pytest
            pytest.skip("reference unavailable")
        rng = np.random.RandomState(0)
        seq = rng.randn(6, 108).astype(np.float64)
        from dstdgcn_tpu.data import pose_norm
        ours = pose_norm.normalize_expi_2p(seq)
        theirs = ref.normExPI_2p_by_frame(seq)
        np.testing.assert_allclose(ours, theirs, atol=1e-8)

    def test_ntu_2p_matches_reference(self):
        ref = self._ref()
        if ref is None:
            import pytest
            pytest.skip("reference unavailable")
        rng = np.random.RandomState(1)
        seq = rng.randn(5, 150).astype(np.float64)
        from dstdgcn_tpu.data import pose_norm
        ours = pose_norm.normalize_ntu(seq)
        theirs = ref.normNTURGBD_2p_by_frame(seq)
        np.testing.assert_allclose(ours, theirs, atol=1e-8)

    def test_filter_and_pelvis(self):
        from dstdgcn_tpu.data import pose_norm
        seq = np.ones((4, 150))
        seq[2] = 0
        assert pose_norm.filter_zero_frames(seq).shape[0] == 3
        out = pose_norm.ntu_pelvis_center(np.arange(300.).reshape(2, 150))
        assert out.shape == (2, 50, 3)
        np.testing.assert_allclose(out[0, 0], 0.0)

    def test_expi_independent_shapes(self):
        from dstdgcn_tpu.data import pose_norm
        rng = np.random.RandomState(2)
        x = rng.randn(2, 3, 36, 3)
        out = pose_norm.normalize_expi_independent(x)
        assert out.shape == x.shape
        x1 = rng.randn(2, 3, 18, 3)
        assert pose_norm.normalize_expi_independent(x1).shape == x1.shape
        y = rng.randn(2, 3, 50, 3)
        assert pose_norm.normalize_ntu_independent(y).shape == y.shape
