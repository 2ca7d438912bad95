"""One-off probe: pltpu.roll semantics on real Mosaic vs jnp.roll.

The cost-volume kernel rolls a (H, W, C) f32 value along axis=1 (sublanes)
by a DYNAMIC, possibly NEGATIVE shift derived from program_id. Interpret
mode (= jnp.roll) passes; on-chip parity fails (rel err ~20). This isolates
which (sign, dynamism) combination breaks.
"""
import sys

sys.path.insert(0, ".")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def make(shift_mode):
    def kernel(x_ref, o_ref):
        v = x_ref[0]
        if shift_mode == "static_pos":
            d = 3
        elif shift_mode == "static_neg":
            d = -3
        elif shift_mode == "dyn_pos":
            d = pl.program_id(0) + 3
        elif shift_mode == "dyn_neg":
            d = pl.program_id(0) - 4  # = -4 at the only step
        elif shift_mode == "dyn_neg_mod":
            d = pl.program_id(0) - 4
            d = jax.lax.rem(jax.lax.rem(d, v.shape[1]) + v.shape[1], v.shape[1])
        o_ref[0] = pltpu.roll(v, d, axis=1)

    return kernel


x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 8, 16, 128)), jnp.float32)
for mode, d in [("static_pos", 3), ("dyn_pos", 3),
                ("dyn_neg", -4), ("dyn_neg_mod", -4)]:
    got = pl.pallas_call(
        make(mode),
        grid=(1,),
        in_specs=[pl.BlockSpec((1, 8, 16, 128), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 16, 128), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 8, 16, 128), jnp.float32),
    )(x)
    want = jnp.roll(x, d, axis=2)
    err = float(jnp.max(jnp.abs(got - want)))
    alt = float(jnp.max(jnp.abs(got - jnp.roll(x, -d, axis=2))))
    print(f"{mode:13s} shift={d:+d}: err_vs_roll(+d)={err:.3e}  "
          f"err_vs_roll(-d)={alt:.3e}", flush=True)

# clean FIN exit (tools/tpu_probe.py pattern)
import os

os._exit(0)
