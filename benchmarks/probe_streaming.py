"""Feasibility probe for the streaming (HBM-resident) Pallas kernels:
ANY-space refs + manual async DMA + input/output aliasing + dynamic fori
bounds + in-kernel parity/sign construction.  Run on the real TPU.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (standalone runs)

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = SUB = 128


def _parity_sign(v):
    """(1 - 2*parity(v)) as f32 for i32 v (<= 2^28)."""
    p = v
    p = p ^ (p >> 16)
    p = p ^ (p >> 8)
    p = p ^ (p >> 4)
    p = p ^ (p >> 2)
    p = p ^ (p >> 1)
    return (1 - 2 * (p & 1)).astype(jnp.float32)


def kernel(nouter_ref, xh_ref, z_ref, psi_ref, out_ref, bufA, bufB, outA,
           sems):
    g = pl.program_id(0)
    n_outer = nouter_ref[g]
    xh = xh_ref[g]

    # in-kernel sign row from a streamed z row: (1, K)
    zrow = z_ref[...]                     # (1, K) i32 block
    srow = _parity_sign(jnp.broadcast_to(jnp.int32(3), zrow.shape) & zrow)

    C = bufA.shape[1]

    def outer(i, _):
        h = i
        hh = h ^ xh
        dma_a = pltpu.make_async_copy(psi_ref.at[0, pl.ds(h * C, C)],
                                      bufA.at[0], sems.at[0])
        dma_b = pltpu.make_async_copy(psi_ref.at[0, pl.ds(hh * C, C)],
                                      bufB.at[0], sems.at[1])
        dma_a.start()
        dma_b.start()
        dma_a.wait()
        dma_b.wait()
        outA[0] = bufA[0] + 2.0 * bufB[0] + srow[0, 0]
        dma_o = pltpu.make_async_copy(outA.at[0], out_ref.at[0, pl.ds(h * C, C)],
                                      sems.at[2])
        dma_o.start()
        dma_o.wait()
        return 0

    jax.lax.fori_loop(0, n_outer, outer, 0)


def run(interpret: bool):
    T, C = 8, 2
    psi = np.arange(T * SUB * LANE, dtype=np.float32).reshape(1, T, SUB, LANE)
    n_outer = np.array([T // C], np.int32)
    xh = np.array([2], np.int32)          # chunk pairing h ^ 2
    z = np.array([[1, 2, 3, 4]], np.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, 4), lambda g, *r: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),     # psi stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((1, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((1, C, SUB, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(psi.shape, jnp.float32),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(n_outer, xh, z, psi)
    out = np.asarray(out)

    # expected: out[h*C + i] = psi[h*C+i] + 2*psi[(h^2)*C+i] + sign(parity(3 & 1))
    exp = np.empty_like(psi)
    for h in range(T // C):
        hh = h ^ 2
        exp[0, h * C:h * C + C] = (psi[0, h * C:h * C + C]
                                   + 2.0 * psi[0, hh * C:hh * C + C]
                                   + (1 - 2 * (bin(3 & 1).count("1") % 2)))
    ok = np.array_equal(out, exp)
    print(f"interpret={interpret}: ok={ok}  maxdiff={np.max(np.abs(out - exp))}")
    return ok


if __name__ == "__main__":
    import sys
    if jax.default_backend() == "cpu":
        run(interpret=True)
    else:
        run(interpret=False)
