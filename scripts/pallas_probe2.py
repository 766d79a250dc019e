"""Mosaic capability probes for the fused numeric kernel.

Small compile+run tests, each printing OK/FAILED + timing where relevant:
  1. in-kernel reshape (CH,2,128) -> (CH,16,16)
  2. in-kernel batched dot_general on (CH,16,16)
  3. per-pair fori_loop of (16,16) dots with dynamic VMEM indexing
  4. strided lane slice + jnp.repeat (flat-layout matmul building blocks)
  5. dynamic-index VMEM accumulation c[s] += x
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 1024
key = jax.random.PRNGKey(0)


def force(o):
    return float(jnp.sum(jnp.ravel(o)[:1024]))


def probe(name, fn, check=None):
    try:
        out = fn()
        s = force(out)
        ok = True if check is None else check(out)
        print(f"{name}: OK (checksum {s:.1f}, correct={ok})",
              file=sys.stderr)
        return True
    except Exception as e:
        msg = str(e)
        for marker in ("Mosaic failed", "Unsupported", "NotImplemented",
                       "not implemented", "Error:"):
            k = msg.find(marker)
            if k >= 0:
                msg = msg[k:k + 300]
                break
        else:
            msg = msg[:300]
        print(f"{name}: FAILED {type(e).__name__}: {msg}", file=sys.stderr)
        return False


a_flat = jax.random.normal(key, (CH, 2, 128), jnp.float32)
b_flat = jax.random.normal(key, (CH, 2, 128), jnp.float32)
a3 = a_flat.reshape(CH, 16, 16)
b3 = b_flat.reshape(CH, 16, 16)


# 1. reshape in kernel
def k_reshape(a_ref, o_ref):
    o_ref[:] = a_ref[:].reshape(CH, 16, 16).reshape(CH, 2, 128)


probe("reshape (CH,2,128)<->(CH,16,16)", lambda: pl.pallas_call(
    k_reshape,
    out_shape=jax.ShapeDtypeStruct((CH, 2, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(a_flat))


# 2. batched dot_general
def k_bdot(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)


def check_bdot(out):
    want = np.einsum("pij,pjk->pik", np.asarray(a3), np.asarray(b3))
    return bool(np.allclose(np.asarray(out), want, atol=1e-3))


probe("batched dot_general (CH,16,16)", lambda: pl.pallas_call(
    k_bdot,
    out_shape=jax.ShapeDtypeStruct((CH, 16, 16), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(a3, b3), check_bdot)


# 3. per-pair loop of dots
def k_loopdot(a_ref, b_ref, o_ref):
    def body(k, _):
        o_ref[k] = jnp.dot(a_ref[k], b_ref[k],
                           preferred_element_type=jnp.float32)
        return 0
    lax.fori_loop(0, CH, body, 0)


probe("fori_loop per-pair dot (16,16)", lambda: pl.pallas_call(
    k_loopdot,
    out_shape=jax.ShapeDtypeStruct((CH, 16, 16), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(a3, b3), check_bdot)


# 4a. strided lane slice: A[:, :, j::16]
def k_stride(a_ref, o_ref):
    x = a_ref[:]                       # (CH, 2, 128)
    o_ref[:] = x[:, :, 3::16]          # (CH, 2, 8)


probe("strided lane slice [:, :, 3::16]", lambda: pl.pallas_call(
    k_stride,
    out_shape=jax.ShapeDtypeStruct((CH, 2, 8), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(a_flat))


# 4b. jnp.repeat along lanes
def k_repeat(a_ref, o_ref):
    x = a_ref[:][:, :, 0:8]            # (CH, 2, 8)
    o_ref[:] = jnp.repeat(x, 16, axis=2)


probe("jnp.repeat x16 along lanes", lambda: pl.pallas_call(
    k_repeat,
    out_shape=jax.ShapeDtypeStruct((CH, 2, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(a_flat))


# 5. dynamic-index VMEM accumulate
def k_dynacc(s_ref, x_ref, o_ref):
    o_ref[:] = jnp.zeros_like(o_ref)

    def body(k, _):
        s = s_ref[k]
        o_ref[pl.ds(s, 1)] += x_ref[pl.ds(k, 1)]
        return 0
    lax.fori_loop(0, 64, body, 0)


seg = jnp.sort(jax.random.randint(key, (CH,), 0, 64, jnp.int32))
probe("dynamic VMEM accumulate o[s] += x", lambda: pl.pallas_call(
    k_dynacc,
    out_shape=jax.ShapeDtypeStruct((64, 2, 128), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(seg, a_flat))


# timing: batched dot_general throughput if it compiled
def timed_bdot():
    P = 1 << 17
    aa = jax.random.normal(key, (P, 16, 16), jnp.float32)

    f = jax.jit(lambda x, y: pl.pallas_call(
        k_bdot,
        grid=(P // CH,),
        in_specs=[pl.BlockSpec((CH, 16, 16), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((CH, 16, 16), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, 16, 16), jnp.float32),
    )(x, y))
    force(f(aa, aa))
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        force(f(aa, aa))
        ts.append(time.perf_counter() - t0)
    # two sizes for slope
    P2 = P * 4
    aa2 = jax.random.normal(key, (P2, 16, 16), jnp.float32)
    f2 = jax.jit(lambda x, y: pl.pallas_call(
        k_bdot,
        grid=(P2 // CH,),
        in_specs=[pl.BlockSpec((CH, 16, 16), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((CH, 16, 16), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P2, 16, 16), jnp.float32),
    )(x, y))
    force(f2(aa2, aa2))
    ts2 = []
    for _ in range(4):
        t0 = time.perf_counter()
        force(f2(aa2, aa2))
        ts2.append(time.perf_counter() - t0)
    sec = (min(ts2) - min(ts)) / (P2 - P)
    print(f"pallas batched dot slope: {sec*1e9:.2f} ns/pair "
          f"= {2*16**3/sec/1e12:.2f} TFLOP/s", file=sys.stderr)


try:
    timed_bdot()
except Exception as e:
    print("timed_bdot failed:", str(e)[:200], file=sys.stderr)

print("PROBE2 DONE")
