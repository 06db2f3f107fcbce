"""Probe MXU efficiency of the transform-matmul shapes used by the DCT
solver at 2048x1024 (fori_loop in-jit: amortizes the ~1 ms axon dispatch)."""
import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax, jax.numpy as jnp
from navierstokessolver_tpu.utils import jaxcache as _jc
_jc.setup()
import numpy as np

rng = np.random.default_rng(0)
M = jnp.asarray(rng.normal(size=(2048, 2048)), jnp.float32)
Mb = M.astype(jnp.bfloat16)
x = jnp.asarray(rng.normal(size=(2048, 1024)), jnp.float32)
N = 100
HI = jax.lax.Precision.HIGH
DF = jax.lax.Precision.DEFAULT

def bench(name, fn, inp):
    f = jax.jit(lambda v: jax.lax.fori_loop(0, N, lambda i, a: fn(a), v))
    o = f(inp); jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = f(inp); jax.block_until_ready(o)
    dtm = (time.perf_counter() - t0) / N
    print(f"{name}: {dtm*1e3:.4f} ms ({2*2048*2048*1024/dtm/1e12:.1f} TFLOP/s eff)", flush=True)

dg = jax.lax.dot_general
bench("f32xf32 HIGH (M@x)", lambda v: dg(M, v, (((1,), (0,)), ((), ())), precision=HI), x)
bench("f32xf32 DEFAULT", lambda v: dg(M, v, (((1,), (0,)), ((), ())), precision=DF), x)
bench("bf16 weights x f32 act, f32 out", lambda v: dg(Mb, v.astype(jnp.bfloat16), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32), x)
bench("xT @ M (act-major)", lambda v: dg(v, M, (((0,), (0,)), ((), ())), precision=DF).T, x)
# 3-pass manual high: split M into hi+lo bf16, x into hi+lo bf16
Mh = M.astype(jnp.bfloat16)
Ml = (M - Mh.astype(jnp.float32)).astype(jnp.bfloat16)
def manual_high(v):
    vh = v.astype(jnp.bfloat16)
    vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
    d = lambda a, b: dg(a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return d(Mh, vh) + d(Mh, vl) + d(Ml, vh)
bench("manual 3-pass bf16 (pre-split weights)", manual_high, x)
# wider activation batch: does N=2048 help?
x2 = jnp.asarray(rng.normal(size=(2048, 2048)), jnp.float32)
def b2(name, fn, inp, flops):
    f = jax.jit(lambda v: jax.lax.fori_loop(0, N, lambda i, a: fn(a), v))
    o = f(inp); jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = f(inp); jax.block_until_ready(o)
    dtm = (time.perf_counter() - t0) / N
    print(f"{name}: {dtm*1e3:.4f} ms ({flops/dtm/1e12:.1f} TFLOP/s eff)", flush=True)
b2("f32 DEFAULT (2048 cols)", lambda v: dg(M, v, (((1,), (0,)), ((), ())), precision=DF), x2, 2*2048**3)
