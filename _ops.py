import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/pbmm_jax_cache")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/pbmm_jax_cache")

B, N, K = 8, 2048, 4
rng = np.random.default_rng(0)
x = jax.device_put((rng.random((B, N, N)).astype(np.float32) + 0.5))

def sync(v):
    np.asarray(jax.tree.leaves(v)[0].reshape(-1)[0])

def timeit(name, body, reps=6):
    spec = pl.BlockSpec((1, 256, N), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    def kernel(a_ref, o_ref):
        o_ref[0] = body(a_ref[0])
    @jax.jit
    def run(a):
        out = a
        for _ in range(K):
            out = pl.pallas_call(kernel, grid=(B, N // 256),
                in_specs=[spec], out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((B, N, N), jnp.float32))(out)
        return out
    f = run
    o = f(x); sync(o)
    o = f(x); sync(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(x)
    sync(o)
    dt = (time.perf_counter() - t0) / reps / K / B
    print(f"{name:34s} {dt*1e3:7.3f} ms/frame", flush=True)

timeit("baseline copy+1", lambda a: a + 1.0)
timeit("4x sqrt", lambda a: jnp.sqrt(jnp.sqrt(jnp.sqrt(jnp.sqrt(a)))))
timeit("4x rsqrt", lambda a: jax.lax.rsqrt(jax.lax.rsqrt(jax.lax.rsqrt(jax.lax.rsqrt(a)))))
timeit("4x cos", lambda a: jnp.cos(jnp.cos(jnp.cos(jnp.cos(a)))))
timeit("2x atan2", lambda a: jnp.arctan2(jnp.arctan2(a, 1.5), 2.0))
timeit("16x mul-add", lambda a: sum(a * (1.0 + 0.01 * i) for i in range(16)))
def poly10(a):
    # degree-10 even poly (cos-like) via Horner: 6 coeffs
    u = a * a
    c = [1.0, -0.5, 0.04167, -0.001389, 2.48e-5, -2.76e-7]
    r = c[5]
    for k in range(4, -1, -1):
        r = r * u + c[k]
    return r
timeit("4x poly10 (cos approx)", lambda a: poly10(poly10(poly10(poly10(a*0.1)))))
timeit("4x exp", lambda a: jnp.exp(-jnp.exp(-jnp.exp(-jnp.exp(-a)))))
timeit("8x select(where)", lambda a: sum(jnp.where(a > 0.5 + 0.05*i, a, 0.1*i) for i in range(8)))
