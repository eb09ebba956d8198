#!/usr/bin/env python
"""Edges/s scaling-efficiency benchmark for the edge-partitioned DSTD ops.

North-star harness (BASELINE.json: ">=90% edges/s scaling efficiency on a
2-host pod slice"): weak-scaling sweep over (data x graph) meshes built from
the available devices — per-device load held constant, efficiency =
edges/s(N) / (N * edges/s(1)).  On a real pod slice this measures ICI
collectives; on the CPU backend (`JAX_PLATFORMS=cpu` +
`--xla_force_host_platform_device_count=8`) it validates the partitioned
path and measures partitioning overhead.

Prints one JSON line per mesh size plus a summary line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dstdgcn_tpu.ops import dstd as ops
    from dstdgcn_tpu.parallel import activation_sharding_context, make_mesh

    devices = jax.devices()
    sizes = [n for n in (1, 2, 4, 8, 16) if n <= len(devices)]
    t, v, c, kk, r = 16, 64, 64, 2, 2
    per_dev_batch = 32
    iters = 20
    rng = np.random.RandomState(0)

    def mk(*s):
        return jnp.asarray(rng.randn(*s).astype(np.float32) * 0.05)

    wf, bf = mk(kk, c, c), mk(kk, c)
    wm1, bm1, wm2, bm2 = mk(kk, c, r), mk(kk, r), mk(kk, c, r), mk(kk, r)
    wrm, brm = mk(kk, r, t, t), mk(kk, t)
    base = mk(kk, v, v)
    alpha = jnp.asarray(0.5)

    results = []
    for nd in sizes:
        graph = 2 if nd % 2 == 0 else 1
        mesh = make_mesh(data=nd // graph, graph=graph,
                         devices=devices[:nd])
        n = per_dev_batch * (nd // graph)
        x = jnp.asarray(rng.randn(n, t, v, c).astype(np.float32))
        x = jax.device_put(x, NamedSharding(mesh, P("data", None, "graph")))

        def step(xx):
            return ops.dstd_spatial(xx, base, alpha, wf, bf, wm1, bm1,
                                    wm2, bm2, wrm, brm)

        with activation_sharding_context(mesh):
            f = jax.jit(lambda xx: jax.lax.fori_loop(
                0, iters, lambda i, acc: acc + 0.0 * step(acc), xx))
            jax.block_until_ready(f(x))
            t0 = time.perf_counter()
            jax.block_until_ready(f(x))
            dt = (time.perf_counter() - t0) / iters

        edges = kk * n * t * v * v
        eps = edges / dt
        results.append((nd, eps))
        print(json.dumps({"devices": nd, "mesh": dict(mesh.shape),
                          "batch": n, "edges_per_s": round(eps, 1),
                          "step_ms": round(dt * 1e3, 3)}))

    base_eps = results[0][1]
    summary = {
        "metric": "edges/s scaling efficiency (weak)",
        "backend": jax.default_backend(),
        "efficiency": {str(nd): round(eps / (nd * base_eps), 4)
                       for nd, eps in results},
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--cpu":
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    main()
