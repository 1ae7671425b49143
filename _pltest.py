import sys, numpy as np, jax, jax.numpy as jnp
if '--x64' in sys.argv: jax.config.update('jax_enable_x64', True)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
case = sys.argv[1]
if case == "a":   # simplest f32 2D
    def k(x_ref, o_ref): o_ref[...] = x_ref[...] * 2.0
    x = jnp.ones((128, 128), jnp.float32)
    out = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((128,128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
elif case == "b":  # u32 3D with grid
    def k(x_ref, o_ref): o_ref[...] = x_ref[...] + jnp.uint32(1)
    x = jnp.ones((64, 2, 1024), jnp.uint32)
    out = pl.pallas_call(k, grid=(1,),
        in_specs=[pl.BlockSpec((64,2,1024), lambda g:(g,0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64,2,1024), lambda g:(g,0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64,2,1024), jnp.uint32))(x)
elif case == "c":  # (BG,1) i32 input
    def k(a_ref, x_ref, o_ref): o_ref[...] = x_ref[...] + a_ref[...].astype(jnp.uint32)[..., None]
    a = jnp.ones((64, 1), jnp.int32); x = jnp.ones((64, 2, 1024), jnp.uint32)
    out = pl.pallas_call(k, grid=(1,),
        in_specs=[pl.BlockSpec((64,1), lambda g:(g,0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((64,2,1024), lambda g:(g,0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64,2,1024), lambda g:(g,0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64,2,1024), jnp.uint32))(a, x)
elif case == "d":  # 4D input block
    def k(x_ref, o_ref): o_ref[...] = x_ref[:, :, 0, :] 
    x = jnp.ones((6, 2, 8, 1024), jnp.int32)
    out = pl.pallas_call(k, grid=(1,),
        in_specs=[pl.BlockSpec((6,2,8,1024), lambda g:(0,0,0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((6,2,1024), lambda g:(0,0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((6,2,1024), jnp.int32))(x)
if case in "abcd": print(case, "OK", np.asarray(out).ravel()[0])

if case == "e":  # unused extra inputs
    def k(a_ref, x_ref, u1, u2, o_ref): o_ref[...] = x_ref[...] + a_ref[:, :2][..., None].astype(jnp.uint32)
    a = jnp.ones((64, 128), jnp.int32); x = jnp.ones((64, 2, 1024), jnp.uint32)
    u1 = jnp.ones((6,2,8,1024), jnp.int32); u2 = jnp.ones((2,8,128), jnp.int32)
    out = pl.pallas_call(k, grid=(1,),
        in_specs=[pl.BlockSpec((64,128), lambda g:(g,0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((64,2,1024), lambda g:(g,0,0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((6,2,8,1024), lambda g:(0,0,0,0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((2,8,128), lambda g:(0,0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64,2,1024), lambda g:(g,0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64,2,1024), jnp.uint32))(a, x, u1, u2)
    print(case, "OK", np.asarray(out).ravel()[0])
if case == "f":  # fori_loop around pallas_call
    def k(x_ref, o_ref): o_ref[...] = x_ref[...] + jnp.uint32(1)
    call = pl.pallas_call(k, grid=(1,),
        in_specs=[pl.BlockSpec((64,2,1024), lambda g:(g,0,0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64,2,1024), lambda g:(g,0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64,2,1024), jnp.uint32))
    x = jnp.ones((64, 2, 1024), jnp.uint32)
    out = jax.jit(lambda x: jax.lax.fori_loop(0, 5, lambda i, v: call(v), x))(x)
    print(case, "OK", np.asarray(out).ravel()[0])

if case == "g":  # add (2,128,128) unused inputs like the tables
    def k(a_ref, x_ref, u1, t1, t2, t3, t4, t5, t6, o_ref):
        o_ref[...] = x_ref[...] + jnp.uint32(1)
    a = jnp.ones((64, 128), jnp.int32); x = jnp.ones((64, 2, 1024), jnp.uint32)
    u1 = jnp.ones((6,2,8,1024), jnp.int32)
    ts = [jnp.ones((2,8,128), jnp.int32), jnp.ones((2,128,128), jnp.int32),
          jnp.ones((2,128,128), jnp.int32), jnp.ones((2,128,128), jnp.int32),
          jnp.ones((2,128,128), jnp.int32), jnp.ones((2,8,128), jnp.int32)]
    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda g,_n=nd:(0,)*_n, memory_space=pltpu.VMEM)
    out = pl.pallas_call(k, grid=(1,),
        in_specs=[pl.BlockSpec((64,128), lambda g:(g,0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((64,2,1024), lambda g:(g,0,0), memory_space=pltpu.VMEM),
                  full((6,2,8,1024)), full((2,8,128)), full((2,128,128)),
                  full((2,128,128)), full((2,128,128)), full((2,128,128)), full((2,8,128))],
        out_specs=pl.BlockSpec((64,2,1024), lambda g:(g,0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64,2,1024), jnp.uint32))(a, x, u1, *ts)
    print(case, "OK", np.asarray(out).ravel()[0])

if case == "h":  # same as g but under jax.jit
    def k(a_ref, x_ref, u1, t1, t2, t3, t4, t5, t6, o_ref):
        o_ref[...] = x_ref[...] + jnp.uint32(1)
    a = jnp.ones((64, 128), jnp.int32); x = jnp.ones((64, 2, 1024), jnp.uint32)
    u1 = jnp.ones((6,2,8,1024), jnp.int32)
    ts = [jnp.ones((2,8,128), jnp.int32), jnp.ones((2,128,128), jnp.int32),
          jnp.ones((2,128,128), jnp.int32), jnp.ones((2,128,128), jnp.int32),
          jnp.ones((2,128,128), jnp.int32), jnp.ones((2,8,128), jnp.int32)]
    def full(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda g,_n=nd:(0,)*_n, memory_space=pltpu.VMEM)
    call = pl.pallas_call(k, grid=(1,),
        in_specs=[pl.BlockSpec((64,128), lambda g:(g,0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((64,2,1024), lambda g:(g,0,0), memory_space=pltpu.VMEM),
                  full((6,2,8,1024)), full((2,8,128)), full((2,128,128)),
                  full((2,128,128)), full((2,128,128)), full((2,128,128)), full((2,8,128))],
        out_specs=pl.BlockSpec((64,2,1024), lambda g:(g,0,0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64,2,1024), jnp.uint32))
    out = jax.jit(lambda *z: call(*z))(a, x, u1, *ts)
    print(case, "OK", np.asarray(out).ravel()[0])

if case == "i":  # x64 on globally, pallas traced under disable_x64
    from jax.experimental import disable_x64
    def k(x_ref, o_ref): o_ref[...] = x_ref[...] + jnp.uint32(1)
    x = jnp.ones((64, 2, 1024), jnp.uint32)
    def f(x):
        with disable_x64():
            return pl.pallas_call(k, grid=(1,),
                in_specs=[pl.BlockSpec((64,2,1024), lambda g:(g,0,0), memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((64,2,1024), lambda g:(g,0,0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((64,2,1024), jnp.uint32))(x)
    out = jax.jit(f)(x)
    print(case, "OK", np.asarray(out).ravel()[0])
