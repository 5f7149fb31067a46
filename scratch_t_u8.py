import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kern(u_ref, o_ref):
    o_ref[:] = u_ref[0, 0].astype(jnp.int32) + 1

@jax.jit
def run(u):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((8,128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(u)

for dt in (jnp.uint8, jnp.int16):
    u = jnp.ones((2, 3, 8, 128), dt)
    try:
        out = run(u)
        print(dt.__name__, "OK", int(out[0,0]))
    except Exception as e:
        print(dt.__name__, "FAILED:", str(e)[:150])
