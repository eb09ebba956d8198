#!/usr/bin/env python
"""Bisect the tpu_compile_helper crash with minimal Pallas programs.

Candidates (present in the crashing chain/bwd kernels, absent in the
working per-op forward kernels):
  A. plain grid kernel, output indexed by program id     (control — works?)
  B. output block with CONSTANT index map (revisited)    + read-after-write
  C. `@pl.when(program_id == 0)` guarded init
  D. accumulation `ref[...] += v` into constant-index output
  E. multiple outputs (tuple out_shape)
Prints FULL error text for the first failure of each case.
"""
import json
import os
import sys
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/dstdgcn_tpu/xla"))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def log(**kw):
    print(json.dumps(kw), flush=True)


x = jnp.asarray(np.random.RandomState(0).randn(8, 128, 128), jnp.float32)


def run(name, fn):
    try:
        out = jax.jit(fn)(x)
        jax.block_until_ready(out)
        log(case=name, ok=True)
    except Exception as e:
        msg = "".join(traceback.format_exception_only(type(e), e))
        log(case=name, ok=False, err=msg[:2000])


# A. control: out indexed by i
def kA(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0


run("A_control", lambda xx: pl.pallas_call(
    kA,
    out_shape=jax.ShapeDtypeStruct((8, 128, 128), jnp.float32),
    grid=(4,),
    in_specs=[pl.BlockSpec((2, 128, 128), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((2, 128, 128), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM),
)(xx))


# B. constant-index output, read-after-write across programs
def kB(x_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[:] = o_ref[:] + jnp.sum(x_ref[:]) * jnp.ones_like(o_ref)


run("B_revisit_accum", lambda xx: pl.pallas_call(
    kB,
    out_shape=jax.ShapeDtypeStruct((2, 128, 128), jnp.float32),
    grid=(4,),
    in_specs=[pl.BlockSpec((2, 128, 128), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((2, 128, 128), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM),
    compiler_params=pltpu.CompilerParams(
        dimension_semantics=("arbitrary",)),
)(xx))


# C. pl.when-guarded init only (no read-back)
def kC(x_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    o_ref[:] = x_ref[:] * 2.0


run("C_when_init", lambda xx: pl.pallas_call(
    kC,
    out_shape=jax.ShapeDtypeStruct((8, 128, 128), jnp.float32),
    grid=(4,),
    in_specs=[pl.BlockSpec((2, 128, 128), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((2, 128, 128), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM),
)(xx))


# D. += accumulation into constant-index output (bwd weight-grad pattern)
def kD(x_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)
    o_ref[...] += jnp.sum(x_ref[:], axis=0)


run("D_plus_eq", lambda xx: pl.pallas_call(
    kD,
    out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
    grid=(4,),
    in_specs=[pl.BlockSpec((2, 128, 128), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((128, 128), lambda i: (0, 0),
                           memory_space=pltpu.VMEM),
    compiler_params=pltpu.CompilerParams(
        dimension_semantics=("arbitrary",)),
)(xx))


# E. multiple outputs
def kE(x_ref, o1_ref, o2_ref):
    o1_ref[:] = x_ref[:] * 2.0
    o2_ref[:] = x_ref[:] + 1.0


run("E_multi_out", lambda xx: pl.pallas_call(
    kE,
    out_shape=(jax.ShapeDtypeStruct((8, 128, 128), jnp.float32),
               jax.ShapeDtypeStruct((8, 128, 128), jnp.float32)),
    grid=(4,),
    in_specs=[pl.BlockSpec((2, 128, 128), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)],
    out_specs=(pl.BlockSpec((2, 128, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM),
               pl.BlockSpec((2, 128, 128), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)),
)(xx)[0])

log(done=True)
