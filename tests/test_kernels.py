"""Golden tests: fused Pallas kernels vs the jnp oracle.

On CPU the kernels execute through the Pallas interpreter (bit-accurate
semantics of the kernel body); on TPU the same body lowers through Mosaic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dstdgcn_tpu.kernels import fused
from dstdgcn_tpu.ops import dstd as oracle


def _weights(rng, k, cin, co, red, ref):
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
    return dict(wf=mk(k, cin, co), bf=mk(k, co), wm1=mk(k, cin, red),
                bm1=mk(k, red), wm2=mk(k, cin, red), bm2=mk(k, red),
                wrm=mk(k, red, ref, ref), brm=mk(k, ref))


@pytest.mark.parametrize("agg", ["right", "left"])
@pytest.mark.parametrize("n", [3, 8])
def test_fused_spatial_matches_oracle(agg, n):
    rng = np.random.RandomState(0)
    t, v, cin, co, k = 7, 6, 5, 4, 2
    x = jnp.asarray(rng.randn(n, t, v, cin), jnp.float32)
    base = jnp.asarray(rng.randn(k, v, v), jnp.float32) * 0.3
    alpha = jnp.asarray(0.7)
    w = _weights(rng, k, cin, co, 2, t)
    want = oracle.dstd_spatial(x, base, alpha, **w, agg=agg)
    got = fused.dstd_spatial(x, base, alpha, w["wf"], w["bf"], w["wm1"],
                             w["bm1"], w["wm2"], w["bm2"], w["wrm"],
                             w["brm"], None, agg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("agg", ["right", "left"])
@pytest.mark.parametrize("n", [3, 8])
def test_fused_temporal_matches_oracle(agg, n):
    rng = np.random.RandomState(1)
    t, v, cin, co, k = 6, 7, 5, 4, 1
    x = jnp.asarray(rng.randn(n, t, v, cin), jnp.float32)
    base = jnp.asarray(rng.randn(k, t, t), jnp.float32) * 0.3
    alpha = jnp.asarray(0.5)
    w = _weights(rng, k, cin, co, 2, v)
    want = oracle.dstd_temporal(x, base, alpha, **w, agg=agg)
    got = fused.dstd_temporal(x, base, alpha, w["wf"], w["bf"], w["wm1"],
                              w["bm1"], w["wm2"], w["bm2"], w["wrm"],
                              w["brm"], None, agg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_gradients_match_oracle():
    rng = np.random.RandomState(2)
    n, t, v, cin, co, k = 4, 5, 6, 4, 4, 2
    x = jnp.asarray(rng.randn(n, t, v, cin), jnp.float32)
    base = jnp.asarray(rng.randn(k, v, v), jnp.float32) * 0.3
    alpha = jnp.asarray(0.3)
    w = _weights(rng, k, cin, co, 2, t)
    args = (x, base, alpha, w["wf"], w["bf"], w["wm1"], w["bm1"], w["wm2"],
            w["bm2"], w["wrm"], w["brm"])

    def loss_fused(*a):
        return jnp.sum(fused.dstd_spatial(*a, None, "right") ** 2)

    def loss_oracle(*a):
        return jnp.sum(oracle.dstd_spatial(*a, None, "right") ** 2)

    g1 = jax.grad(loss_fused, argnums=tuple(range(len(args))))(*args)
    g2 = jax.grad(loss_oracle, argnums=tuple(range(len(args))))(*args)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_model_with_pallas_matches_without():
    from dstdgcn_tpu.models import DSTDGCN

    cfg = dict(input_channels=6, input_time_frame=4, output_time_frame=4,
               st_gcnn_dropout=0.0, joints_to_consider=22, num_feature=8,
               num_layers=1, layout="h36m")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 22, 3), jnp.float32)
    m0 = DSTDGCN(**cfg, use_pallas=False)
    m1 = DSTDGCN(**cfg, use_pallas=True)
    variables = m0.init({"params": jax.random.key(0)}, x, train=False)
    y0 = m0.apply(variables, x, train=False)
    y1 = m1.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), rtol=1e-4,
                               atol=1e-4)


def test_compute_dtype_bf16_close_to_f32():
    """bf16 compute path stays within mixed-precision tolerance of f32."""
    import jax
    import jax.numpy as jnp
    from dstdgcn_tpu.models import DSTDGCN

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 22, 3).astype(np.float32))
    cfg = dict(input_channels=6, input_time_frame=4, output_time_frame=4,
               st_gcnn_dropout=0.0, joints_to_consider=22, num_feature=8,
               num_layers=1, layout="h36m")
    m32 = DSTDGCN(**cfg)
    variables = m32.init({"params": jax.random.key(0)}, x, train=False)
    y32 = m32.apply(variables, x, train=False)
    m16 = DSTDGCN(**cfg, compute_dtype="bfloat16")
    y16 = m16.apply(variables, x, train=False)
    err = float(jnp.abs(y32 - y16).max() / (jnp.abs(y32).max() + 1e-9))
    assert err < 3e-2, err
    # gradients flow through the bf16 path
    g = jax.grad(lambda p: jnp.sum(m16.apply(
        {"params": p, "batch_stats": variables.get("batch_stats", {})},
        x, train=False) ** 2))(variables["params"])
    assert all(np.isfinite(np.asarray(l)).all() for l in jax.tree.leaves(g))


@pytest.mark.parametrize("mode", ["spatial", "temporal"])
@pytest.mark.parametrize("agg", ["right", "left"])
def test_pair_flat_matches_grid(mode, agg):
    """Flat (P*P)-lane pair layout is numerically identical to the grid
    formulation (incl. masked pairs and gradients)."""
    rng = np.random.RandomState(3)
    n, t, v, cin, co = 3, 6, 5, 4, 4
    k = 2 if mode == "spatial" else 1
    ref = t if mode == "spatial" else v
    p = v if mode == "spatial" else t
    x = jnp.asarray(rng.randn(n, t, v, cin), jnp.float32)
    base = jnp.asarray(rng.randn(k, p, p), jnp.float32) * 0.3
    alpha = jnp.asarray(0.7)
    w = _weights(rng, k, cin, co, 2, ref)
    mask = jnp.asarray((rng.rand(p, p) < 0.7).astype(np.float32))
    op = oracle.dstd_spatial if mode == "spatial" else oracle.dstd_temporal
    for m in (None, mask):
        want = op(x, base, alpha, **w, mask=m, agg=agg)
        got = op(x, base, alpha, **w, mask=m, agg=agg, pair_flat=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)
    g0 = jax.grad(lambda xx: jnp.sum(op(xx, base, alpha, **w, agg=agg) ** 2))(x)
    g1 = jax.grad(lambda xx: jnp.sum(
        op(xx, base, alpha, **w, agg=agg, pair_flat=True) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("agg", ["right", "left"])
def test_fused_chain_matches_oracle_chain(agg):
    """Whole-chain kernel (one pallas_call for B (spatial, temporal) blocks,
    fori_loop over VMEM-resident weights) vs the per-op oracle chain,
    including gradients (oracle-replay VJP)."""
    rng = np.random.RandomState(7)
    n, t, v, c = 4, 10, 7, 6
    blocks = []
    for i in range(3):
        ws = _weights(rng, 2, c, c, 2, t)
        wt = _weights(rng, 1, c, c, 2, v)
        blocks.append((
            (jnp.asarray(rng.randn(2, v, v), jnp.float32) * 0.3,
             jnp.asarray(0.5), ws["wf"], ws["bf"], ws["wm1"], ws["bm1"],
             ws["wm2"], ws["bm2"], ws["wrm"], ws["brm"]),
            (jnp.asarray(rng.randn(1, t, t), jnp.float32) * 0.3,
             jnp.asarray(0.4), wt["wf"], wt["bf"], wt["wm1"], wt["bm1"],
             wt["wm2"], wt["bm2"], wt["wrm"], wt["brm"]),
        ))
    x = jnp.asarray(rng.randn(n, t, v, c), jnp.float32)
    want = np.asarray(fused._chain_oracle(x, blocks, agg))
    got = np.asarray(fused.dstd_chain(x, blocks, agg))
    # activations grow unnormalized through the blocks; scale-relative
    # tolerance absorbs fp32 reassociation between the two formulations
    assert np.abs(got - want).max() < 1e-4 * max(np.abs(want).max(), 1.0)
    g0 = np.asarray(jax.grad(lambda xx: jnp.sum(
        fused._chain_oracle(xx, blocks, agg) ** 2))(x))
    g1 = np.asarray(jax.grad(lambda xx: jnp.sum(
        fused.dstd_chain(xx, blocks, agg) ** 2))(x))
    assert np.abs(g1 - g0).max() < 1e-4 * max(np.abs(g0).max(), 1.0)


@pytest.mark.parametrize("mode", ["spatial", "temporal"])
@pytest.mark.parametrize("agg", ["right", "left"])
def test_fused_pallas_backward_matches_oracle(mode, agg):
    """Hand-derived Pallas backward (kernels/fused_bwd.py) vs oracle
    autograd: dx and every weight gradient."""
    rng = np.random.RandomState(11)
    n, t, v, cin, co = 3, 6, 5, 4, 4
    k = 2 if mode == "spatial" else 1
    ref_len = t if mode == "spatial" else v
    p = v if mode == "spatial" else t

    def mk(*s):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.2)

    x = mk(n, t, v, cin)
    args = (mk(k, p, p), jnp.asarray(0.7), mk(k, cin, co), mk(k, co),
            mk(k, cin, 2), mk(k, 2), mk(k, cin, 2), mk(k, 2),
            mk(k, 2, ref_len, ref_len), mk(k, ref_len))
    f_fused = fused.dstd_spatial if mode == "spatial" else fused.dstd_temporal
    f_orc = oracle.dstd_spatial if mode == "spatial" else oracle.dstd_temporal
    g_fused = jax.grad(lambda *a: jnp.sum(jnp.sin(f_fused(*a, agg=agg))),
                       argnums=tuple(range(11)))(x, *args)
    g_orc = jax.grad(lambda *a: jnp.sum(jnp.sin(f_orc(*a, agg=agg))),
                     argnums=tuple(range(11)))(x, *args)
    for a, b in zip(g_fused, g_orc):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape
        assert np.abs(a - b).max() < 1e-4 * max(np.abs(b).max(), 1.0)


def test_model_variant_knobs_match_baseline():
    """Model-level perf knobs (hybrid use_pallas='spatial', block-diagonal
    agg_group sizes) are numerically equivalent to the plain path."""
    from dstdgcn_tpu.models import DSTDGCN

    cfg = dict(input_channels=6, input_time_frame=4, output_time_frame=4,
               st_gcnn_dropout=0.0, joints_to_consider=22, num_feature=8,
               num_layers=1, layout="h36m")
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 22, 3), jnp.float32)
    m0 = DSTDGCN(**cfg)
    variables = m0.init({"params": jax.random.key(0)}, x, train=False)
    y0 = np.asarray(m0.apply(variables, x, train=False))
    for knobs in (dict(use_pallas="spatial"),
                  dict(agg_group_spatial=4, agg_group_temporal=3),
                  # non-divisor spatial group (T=8 % 3 != 0): exercises the
                  # frame-padding path of aggregate_spatial_grouped
                  dict(agg_group_spatial=3, agg_group_temporal=2),
                  dict(use_pallas="spatial", agg_group_temporal=3)):
        y1 = np.asarray(DSTDGCN(**cfg, **knobs).apply(variables, x,
                                                      train=False))
        assert np.abs(y1 - y0).max() < 1e-3 * max(np.abs(y0).max(), 1.0), \
            knobs


@pytest.mark.parametrize("use_pallas", [False, True])
def test_remat_matches_no_remat(use_pallas):
    """DSTDGC(remat=True) — jax.checkpoint around the op — reproduces the
    non-remat outputs AND gradients exactly, on the ops path and composed
    with the use_pallas custom_vjp kernels (interpreted on CPU)."""
    from dstdgcn_tpu.models.layers import DSTDGC

    rng = np.random.RandomState(7)
    n, t, v, cin, co = 3, 6, 5, 4, 4
    x = jnp.asarray(rng.randn(n, t, v, cin), jnp.float32)
    base = jnp.asarray(rng.randn(2, v, v), jnp.float32) * 0.3
    alpha = jnp.asarray(0.7)
    mk = lambda r: DSTDGC(out_channels=co, ref_len=t, num_kernels=2,
                          mode="spatial", use_pallas=use_pallas, remat=r)
    variables = mk(False).init(jax.random.key(0), x, base, alpha)

    def loss(m, params, xx):
        return jnp.sum(jnp.sin(m.apply(params, xx, base, alpha)))

    y0 = np.asarray(mk(False).apply(variables, x, base, alpha))
    y1 = np.asarray(mk(True).apply(variables, x, base, alpha))
    np.testing.assert_allclose(y1, y0, rtol=1e-6, atol=1e-6)
    g0 = jax.grad(lambda p, xx: loss(mk(False), p, xx),
                  argnums=(0, 1))(variables, x)
    g1 = jax.grad(lambda p, xx: loss(mk(True), p, xx),
                  argnums=(0, 1))(variables, x)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_use_pallas_serving_mode():
    """use_pallas='serving' routes the fused kernels in eval but the XLA
    formulation in training (Pallas-in-training is a measured structural
    regression on v5e); outputs match the baseline in both modes."""
    from dstdgcn_tpu.models import DSTDGCN

    cfg = dict(input_channels=6, input_time_frame=4, output_time_frame=4,
               st_gcnn_dropout=0.0, joints_to_consider=22, num_feature=8,
               num_layers=1, layout="h36m")
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 22, 3), jnp.float32)
    m0 = DSTDGCN(**cfg)
    ms = DSTDGCN(**cfg, use_pallas="serving")
    variables = m0.init({"params": jax.random.key(0)}, x, train=False)
    y0 = np.asarray(m0.apply(variables, x, train=False))
    ys = np.asarray(ms.apply(variables, x, train=False))
    assert np.abs(ys - y0).max() < 1e-3 * max(np.abs(y0).max(), 1.0)

    def loss(m, params):
        out, _ = m.apply(variables | {"params": params}, x, train=True,
                         mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    g0 = jax.grad(lambda p: loss(m0, p))(variables["params"])
    gs = jax.grad(lambda p: loss(ms, p))(variables["params"])
    # train path is exactly the XLA formulation -> bitwise-equal grads
    for a, b in zip(jax.tree.leaves(gs), jax.tree.leaves(g0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_model_remat_knob_matches_baseline():
    """The model-level remat knob (plumbed through STGCNNLayer/DSTDGCB) is
    a pure gradient-checkpointing choice: train-mode loss and parameter
    gradients match the non-remat model."""
    from dstdgcn_tpu.models import DSTDGCN

    cfg = dict(input_channels=6, input_time_frame=4, output_time_frame=4,
               st_gcnn_dropout=0.0, joints_to_consider=22, num_feature=8,
               num_layers=1, layout="h36m")
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 22, 3), jnp.float32)
    m0, m1 = DSTDGCN(**cfg), DSTDGCN(**cfg, remat=True)
    variables = m0.init({"params": jax.random.key(0)}, x, train=True)

    def loss(m, params):
        out, _ = m.apply(variables | {"params": params}, x, train=True,
                         mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(variables["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(variables["params"])
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", ["spatial", "temporal"])
def test_fused_bf16_dots_close_to_f32(mode):
    """In-kernel bf16 matmul inputs (f32 accumulation) stay within
    mixed-precision tolerance of the f32 kernel, forward and backward."""
    rng = np.random.RandomState(5)
    n, t, v, cin, co = 4, 6, 5, 4, 4
    k = 2 if mode == "spatial" else 1
    ref_len = t if mode == "spatial" else v
    p = v if mode == "spatial" else t
    x = jnp.asarray(rng.randn(n, t, v, cin), jnp.float32)
    base = jnp.asarray(rng.randn(k, p, p), jnp.float32) * 0.3
    alpha = jnp.asarray(0.7)
    w = _weights(rng, k, cin, co, 2, ref_len)
    f = fused.dstd_spatial if mode == "spatial" else fused.dstd_temporal
    args = (x, base, alpha, w["wf"], w["bf"], w["wm1"], w["bm1"], w["wm2"],
            w["bm2"], w["wrm"], w["brm"])
    y32 = np.asarray(f(*args, None, "right"))
    y16 = np.asarray(f(*args, None, "right", jnp.bfloat16))
    assert np.abs(y16 - y32).max() < 3e-2 * max(np.abs(y32).max(), 1.0)
    g32 = jax.grad(lambda *a: jnp.sum(f(*a, None, "right") ** 2),
                   argnums=tuple(range(11)))(*args)
    g16 = jax.grad(lambda *a: jnp.sum(f(*a, None, "right", jnp.bfloat16)
                                      ** 2), argnums=tuple(range(11)))(*args)
    for a, b in zip(g16, g32):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        assert np.abs(a - b).max() < 5e-2 * max(np.abs(b).max(), 1.0)


def test_fused_chain_dtype_and_nb_knobs():
    """dstd_chain with bf16 dots and an explicit nb override matches the
    f32 oracle chain within mixed-precision tolerance."""
    rng = np.random.RandomState(9)
    n, t, v, c = 8, 10, 7, 6
    blocks = []
    for _ in range(2):
        ws = _weights(rng, 2, c, c, 2, t)
        wt = _weights(rng, 1, c, c, 2, v)
        blocks.append((
            (jnp.asarray(rng.randn(2, v, v), jnp.float32) * 0.3,
             jnp.asarray(0.5), ws["wf"], ws["bf"], ws["wm1"], ws["bm1"],
             ws["wm2"], ws["bm2"], ws["wrm"], ws["brm"]),
            (jnp.asarray(rng.randn(1, t, t), jnp.float32) * 0.3,
             jnp.asarray(0.4), wt["wf"], wt["bf"], wt["wm1"], wt["bm1"],
             wt["wm2"], wt["bm2"], wt["wrm"], wt["brm"]),
        ))
    x = jnp.asarray(rng.randn(n, t, v, c), jnp.float32)
    want = np.asarray(fused._chain_oracle(x, blocks, "right"))
    for dtype, nb, tol in ((None, 8, 1e-4), (jnp.bfloat16, None, 3e-2),
                           (jnp.bfloat16, 8, 3e-2)):
        got = np.asarray(fused.dstd_chain(x, blocks, "right", dtype, nb))
        assert np.abs(got - want).max() < tol * max(np.abs(want).max(), 1.0), \
            (dtype, nb)


@pytest.mark.parametrize("agg", ["right", "left"])
def test_encoder_chain_matches_oracle(agg):
    """Whole-encoder fused inference kernel (DSTD ops + eval-BN affines +
    residuals + PReLUs in one pallas_call) vs the oracle layer math."""
    rng = np.random.RandomState(11)
    n, t, v, c = 4, 10, 7, 6
    layers = []
    for _ in range(2):
        ws = _weights(rng, 2, c, c, 2, t)
        wt = _weights(rng, 1, c, c, 2, v)
        mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3)
        layers.append((
            (mk(2, v, v), jnp.asarray(0.5), ws["wf"], ws["bf"], ws["wm1"],
             ws["bm1"], ws["wm2"], ws["bm2"], ws["wrm"], ws["brm"]),
            (mk(1, t, t), jnp.asarray(0.4), wt["wf"], wt["bf"], wt["wm1"],
             wt["bm1"], wt["wm2"], wt["bm2"], wt["wrm"], wt["brm"]),
            jnp.stack([1.0 + 0.1 * mk(v, c), 0.2 * mk(v, c)]),
            jnp.stack([1.0 + 0.1 * mk(v, c), 0.2 * mk(v, c)]),
            jnp.asarray([0.25, 0.1], jnp.float32),
        ))
    x = jnp.asarray(rng.randn(n, t, v, c), jnp.float32)
    want = np.asarray(fused._encoder_oracle(x, layers, agg))
    got = np.asarray(fused.dstd_encoder_chain(x, layers, agg))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # bf16 MXU dots (f32 accumulation): loose tolerance, same semantics —
    # the serving bench's fused-encoder bf16 row rides this path
    got16 = np.asarray(fused.dstd_encoder_chain(x, layers, agg,
                                                dtype=jnp.bfloat16))
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got16 - want).max() / scale < 6e-2


@pytest.mark.parametrize("fast", [False, True])
def test_fused_eval_forward_matches_model(fast):
    """models.infer.fused_eval_forward == model.apply(train=False) on a
    trained-ish variables tree (perturbed params + real batch stats)."""
    from dstdgcn_tpu.models import DSTDGCN
    from dstdgcn_tpu.models import infer

    cfg = dict(input_channels=6, input_time_frame=4, output_time_frame=4,
               st_gcnn_dropout=0.0, joints_to_consider=22, num_feature=8,
               num_layers=2, layout="h36m", fast=fast)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 8, 22, 3), jnp.float32)
    model = DSTDGCN(**cfg)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    # make the tree non-trivial: noise on every param (alphas/gates become
    # nonzero so the dynamic term and BN affines are actually exercised),
    # then a train-mode pass to move batch_stats off init
    leaves, tdef = jax.tree_util.tree_flatten(variables["params"])
    keys = jax.random.split(jax.random.key(1), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    params = jax.tree_util.tree_unflatten(tdef, leaves)
    _, upd = model.apply({"params": params,
                          "batch_stats": variables["batch_stats"]},
                         x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.key(2)})
    variables = {"params": params, "batch_stats": upd["batch_stats"]}

    want = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(infer.fused_eval_forward(variables, x,
                                              num_layers=2, fast=fast))
    # f32 association-order noise amplifies through the residual cascade;
    # scale the tolerance to the activation magnitude
    tol = 2e-5 * max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=tol)
    # grouped block-diagonal aggregation in the in/out layers is exact
    got_g = np.asarray(infer.fused_eval_forward(variables, x, num_layers=2,
                                                fast=fast, agg_group=(4, 3)))
    np.testing.assert_allclose(got_g, want, rtol=1e-3, atol=tol)


def test_pallas_bf16_train_gradients_work():
    """use_pallas=True + compute_dtype=bfloat16: the custom_vjp must return
    cotangents in the primals' dtypes (regression: f32 cotangents broke the
    upstream PReLU transpose) and stay near the oracle-bf16 gradients."""
    import jax.tree_util as tu
    from dstdgcn_tpu.models import DSTDGCN

    cfg = dict(input_channels=6, input_time_frame=4, output_time_frame=4,
               st_gcnn_dropout=0.0, joints_to_consider=22, num_feature=8,
               num_layers=1, layout="h36m", compute_dtype="bfloat16")
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 8, 22, 3), jnp.float32)
    v = DSTDGCN(**cfg).init({"params": jax.random.key(0)}, x, train=False)

    def grads(use_pallas):
        m = DSTDGCN(**cfg, use_pallas=use_pallas)

        def loss(p):
            out, _ = m.apply({"params": p,
                              "batch_stats": v["batch_stats"]}, x,
                             train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.key(1)})
            return jnp.mean(out ** 2)

        return jax.grad(loss)(v["params"])

    gp, go = grads(True), grads(False)
    scale = tu.tree_reduce(max, tu.tree_map(
        lambda b: float(jnp.max(jnp.abs(b.astype(jnp.float32)))), go))
    diff = tu.tree_reduce(max, tu.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                           - b.astype(jnp.float32)))),
        gp, go))
    assert np.isfinite(diff)
    assert diff < 0.15 * max(scale, 1.0)   # bf16-precision agreement
