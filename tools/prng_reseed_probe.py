"""TPU probe: does re-calling pltpu.prng_seed mid-kernel rewind the PRNG
stream so draws replay exactly?

The layer-fused backward (core/layer_kernel.py:_fl_bwd_kernel) depends on
this: pass 1 recomputes the forward (attention head draws, then three
epilogue draws), and the attention-backward head loop then re-seeds and
replays the head draws to rebuild the same logits-dropout masks. This
probe draws A (2 tensors), re-seeds, draws B (2 tensors), and checks
A == B on the real device.

  python tools/prng_reseed_probe.py        # prints PASS/FAIL
"""

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(seed_ref, a1_ref, a2_ref, b1_ref, b2_ref):
    pltpu.prng_seed(seed_ref[0])
    a1_ref[...] = pltpu.bitcast(pltpu.prng_random_bits(a1_ref.shape),
                                jnp.int32)
    a2_ref[...] = pltpu.bitcast(pltpu.prng_random_bits(a2_ref.shape),
                                jnp.int32)
    pltpu.prng_seed(seed_ref[0])
    b1_ref[...] = pltpu.bitcast(pltpu.prng_random_bits(b1_ref.shape),
                                jnp.int32)
    b2_ref[...] = pltpu.bitcast(pltpu.prng_random_bits(b2_ref.shape),
                                jnp.int32)


def main():
    shape1, shape2 = (8, 16, 128), (8, 24, 128)
    spec = lambda s: pl.BlockSpec(s, lambda: tuple(0 for _ in s))
    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(),
            in_specs=[],
            out_specs=[spec(shape1), spec(shape2), spec(shape1),
                       spec(shape2)]),
        out_shape=[jax.ShapeDtypeStruct(shape1, jnp.int32),
                   jax.ShapeDtypeStruct(shape2, jnp.int32),
                   jax.ShapeDtypeStruct(shape1, jnp.int32),
                   jax.ShapeDtypeStruct(shape2, jnp.int32)],
    )(jnp.asarray([12345], jnp.int32))
    a1, a2, b1, b2 = map(np.asarray, out)
    same = bool((a1 == b1).all() and (a2 == b2).all())
    distinct = not (a1[: a2.shape[0]] == a2[: a1.shape[0]]).all()
    print(f"reseed replay identical: {same}; draws non-constant: "
          f"{distinct and bool((a1 != a1[0, 0, 0]).any())}")
    if same:
        print("PASS")
        return 0
    print("FAIL — backward must store keep masks instead of re-seeding")
    return 1


if __name__ == "__main__":
    sys.exit(main())
