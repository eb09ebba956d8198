"""CPU guards for the benchmark harness (bench.py at the repo root).

The TPU timings obviously cannot run here; what CAN be locked is that the
bench-local candidate formulations compute the shipped model's op — the
tether the headline number depends on (VERDICT r3 weak #6)."""

import numpy as np
import pytest

bench = pytest.importorskip("bench")
jnp = pytest.importorskip("jax.numpy")


def test_tether_candidate_matches_module_path():
    rng = np.random.RandomState(0)
    params = bench._naive_params(rng, 2, 8, 10, 6)
    x = jnp.asarray(rng.randn(4, 10, 6, 8).astype(np.float32))
    assert bench.tether_check(params, x) < 2e-2


def test_naive_reference_matches_stacked():
    """The reference-style baseline and our stacked formulation are the
    same function (different layouts): vs_baseline measures formulation
    speed, not different math."""
    rng = np.random.RandomState(1)
    params = bench._naive_params(rng, 2, 8, 10, 6)
    x = jnp.asarray(rng.randn(4, 10, 6, 8).astype(np.float32))
    x_nctv = jnp.transpose(x, (0, 3, 1, 2))
    want = np.asarray(bench.naive_reference_forward(params, x_nctv))
    got = np.asarray(bench.stacked_forward(params, x))
    got_nctv = np.transpose(got, (0, 3, 1, 2))
    err = np.abs(got_nctv - want).max() / max(np.abs(want).max(), 1.0)
    assert err < 1e-4
