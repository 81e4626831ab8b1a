"""Streaming Pallas kernels: HBM-resident statevector, chunk-pair DMA.

The VMEM-resident kernels (sim/pallas_kernels.py) cap at 20 qubits (8 MB
state in ~16 MB VMEM).  Above that the XLA grouped path pays ~5 full-state
HBM round trips per excitation group (three permutation matmuls, the
sign-field matmul, the rotation combine — XLA does not fuse across
matmuls).  These kernels stream the state through VMEM once per group:

  * state laid out as psi[2, T, 128, 128] in HBM (plane, tile, sublane,
    lane; tile = amplitude bits 14..n-1) — a free reshape of (2, 2^n);
  * the group's index-XOR splits as  lane (bits 0..6, MXU matmul P_lo),
    sublane (7..13, matmul P_mid), in-chunk tile (14..14+c-1, dynamic
    VMEM index), chunk (14+c.., HBM chunk PAIRING);
  * per group, chunk pairs (h, h ^ x_huge) are DMA'd HBM->VMEM, all C
    tiles processed (partner tile i ^ x_chunk of the partner chunk),
    results DMA'd back — ONE read + ONE write of the state per rotation
    group (vs ~5 round trips), read-only for expectations;
  * per-group sign/weight fields are built IN KERNEL from the streamed
    (K,) z-masks and coefficients via parity bit-tricks and iotas — the
    only streamed operands are three (K,)-vectors per group, so operand
    bandwidth is ~nothing and no O(G*T*K) host arrays exist (the
    VMEM kernels' s_top tables would be GBs at 26-28 qubits).

Grid dimension is "arbitrary" (sequential): rotations must apply in group
order; DMAs are waited before each grid step ends so step g+1 reads fully
written state.

Applicability: TPU backend, f32 planes, n >= MIN_N (tiles exist beyond one
chunk).  Parity is tested in interpret mode against the XLA grouped path
(tests/test_streaming.py) and on hardware by scripts/tpu_smoke.py.

Reference hot-loop analog: get_energy_ucc.py:158-175; this replaces the
segmented XLA grouped path (sim/grouped.py) at 21+ qubits — round-1 VERDICT
items 2-4 (the 24-28 qubit north star).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 128
TILE_BITS = 14
CHUNK_BITS = 3                 # C = 8 tiles/chunk = 512 KB per plane-chunk
MIN_N = TILE_BITS + CHUNK_BITS + 1


def streaming_supported(n: int) -> bool:
    return n >= MIN_N and jax.default_backend() not in ("cpu",)


# --------------------------------------------------------------- host prep

@dataclass
class StreamGroupData:
    """Per-group streaming operands.  Scalars ride the prefetch channel;
    z/coef rows are streamed VMEM blocks; everything else is built in
    kernel."""
    n: int
    T: int                  # total 128x128 tiles = 2^(n-14)
    C: int                  # tiles per chunk
    x_lane: np.ndarray      # (G,) i32  bits 0..6 of the group mask
    x_mid: np.ndarray       # (G,) i32  bits 7..13
    x_chunk: np.ndarray     # (G,) i32  bits 14..14+c-1
    x_huge: np.ndarray      # (G,) i32  bits 14+c..
    mb: np.ndarray          # (G,) i32  msb position of x_huge (0 if none)
    n_outer: np.ndarray     # (G,) i32  outer chunk iterations
    z_r: np.ndarray         # (G, K, 1) i32 full z masks (column layout)
    z_c: np.ndarray         # (G, 1, K) i32 full z masks (row layout)
    cre: np.ndarray         # (G, K, 1) f32 Re coefficients
    cim: Optional[np.ndarray]  # (G, K, 1) f32 Im coefficients (ham only)
    op: Optional[np.ndarray]   # (G,) i32 parameter index (sequences only)

    @property
    def G(self) -> int:
        return len(self.x_lane)


def build_stream_data(n: int, x: np.ndarray, z: np.ndarray, coef: np.ndarray,
                      op: Optional[np.ndarray] = None,
                      coef_im: Optional[np.ndarray] = None,
                      chunk_bits: int = CHUNK_BITS) -> StreamGroupData:
    """Lower grouped (x, z, coef) arrays — shapes (G,), (G, K), (G, K) —
    to streaming kernel operands."""
    if n < TILE_BITS + chunk_bits:
        raise ValueError(f"streaming needs n >= {TILE_BITS + chunk_bits}")
    G, K = z.shape
    Kp = max(8, K)
    T = 1 << (n - TILE_BITS)
    C = 1 << chunk_bits
    H = T // C
    xi = np.asarray(x, np.int64)
    x_lane = (xi & (LANE - 1)).astype(np.int32)
    x_mid = ((xi >> 7) & (SUB - 1)).astype(np.int32)
    x_chunk = ((xi >> TILE_BITS) & (C - 1)).astype(np.int32)
    x_huge = (xi >> (TILE_BITS + chunk_bits)).astype(np.int32)
    mb = np.zeros(G, np.int32)
    n_outer = np.full(G, H, np.int32)
    for g in range(G):
        if x_huge[g]:
            mb[g] = int(x_huge[g]).bit_length() - 1
            n_outer[g] = H // 2
    zp = np.zeros((G, Kp), np.int32)
    zp[:, :K] = z
    crep = np.zeros((G, Kp), np.float32)
    crep[:, :K] = coef
    cimp = None
    if coef_im is not None:
        cimp = np.zeros((G, Kp), np.float32)
        cimp[:, :K] = coef_im
    return StreamGroupData(
        n=n, T=T, C=C, x_lane=x_lane, x_mid=x_mid, x_chunk=x_chunk,
        x_huge=x_huge, mb=mb, n_outer=n_outer,
        z_r=zp[:, :, None], z_c=zp[:, None, :],
        cre=crep[:, :, None],
        cim=None if cimp is None else cimp[:, :, None],
        op=None if op is None else np.asarray(op, np.int32))


def stream_seq_data(gseq) -> StreamGroupData:
    """From a GroupedOpSequence (sim/grouped.py)."""
    return build_stream_data(gseq.n, gseq.x, gseq.z, gseq.s, op=gseq.op)


def stream_ham_data(gham) -> StreamGroupData:
    """Off-diagonal groups of a GroupedPauliSum (odd-Y strings carry purely
    imaginary compiled coefficients even for Hermitian H — both weight
    fields are lowered, as in pallas_kernels.ham_group_data)."""
    return build_stream_data(gham.n, gham.x, gham.z, gham.a_re,
                             coef_im=gham.a_im)


def seq_stream_args(sd: StreamGroupData):
    """(prefetch... , streamed...) argument tuple for the rotation/adjoint
    kernels — pass as traced jit arguments (shared executables per padded
    bucket)."""
    return (sd.x_huge, sd.mb, sd.n_outer, sd.x_chunk, sd.x_mid, sd.x_lane,
            sd.op, sd.z_r, sd.z_c, sd.cre)


def ham_stream_args(sd: StreamGroupData):
    cim = sd.cim if sd.cim is not None else np.zeros_like(sd.cre)
    return (sd.x_huge, sd.mb, sd.n_outer, sd.x_chunk, sd.x_mid, sd.x_lane,
            sd.z_r, sd.z_c, sd.cre, cim)


def slice_args(args, lo: int, hi: int):
    """Group-axis slice of a stream argument tuple (host segmentation)."""
    return tuple(None if a is None else a[lo:hi] for a in args)


# ---------------------------------------------------------------- kernels

def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _perm_matrix(x_scalar):
    i = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    return (jnp.bitwise_xor(i, j) == x_scalar).astype(jnp.float32)


def _parity_sign(v):
    """(1 - 2*parity(v)) as f32 for i32 v (v < 2^30)."""
    p = v
    p = p ^ (p >> 16)
    p = p ^ (p >> 8)
    p = p ^ (p >> 4)
    p = p ^ (p >> 2)
    p = p ^ (p >> 1)
    return (1 - 2 * (p & 1)).astype(jnp.float32)


class _GroupCtx:
    """Per-grid-step in-kernel context: permutation matrices and sign/weight
    building blocks constructed from the streamed (K,) rows."""

    def __init__(self, x_mid, x_lane, zr, zc, cre, cim=None):
        self.plo = _perm_matrix(x_lane)
        self.pmid = _perm_matrix(x_mid)
        sub_i = jax.lax.broadcasted_iota(jnp.int32, zc.shape[:1] + (SUB, 1),
                                         1)[0] if False else None
        # SM (128, K): sublane signs; built from the row-layout z block
        si = jax.lax.broadcasted_iota(jnp.int32, (SUB,) + (zc.shape[-1],), 0)
        self.SM = _parity_sign(si & ((zc >> 7) & (SUB - 1)))
        # WL (K, 128): lane signs * coefficients; column-layout blocks
        li = jax.lax.broadcasted_iota(jnp.int32, (zr.shape[0], LANE), 1)
        lane_s = _parity_sign(li & (zr & (LANE - 1)))
        self.WLre = cre * lane_s
        self.WLim = None if cim is None else cim * lane_s
        self.zhi = zr >> TILE_BITS        # (K, 1)

    def srow(self, t):
        """(K, 1) tile sign column for global tile index t (traced)."""
        return _parity_sign(t & self.zhi)

    def perm(self, m):
        return _mm(_mm(self.pmid, m), self.plo)

    def field(self, w, t):
        """(128, 128) sign/weight field sum_k w[k] s_k(sub) s_k(lane)
        s_k(tile=t): one (128,K)@(K,128) MXU op."""
        return _mm(self.SM, self.srow(t) * w)


def _pair_index(i, xh, mb):
    """Outer-iteration -> chunk index: enumerate h with bit mb == 0 when
    pairing across chunks (xh > 0), identity otherwise."""
    low = i & ((jnp.int32(1) << mb) - 1)
    paired = ((i >> mb) << (mb + 1)) | low
    return jax.lax.select(xh > 0, paired, i)


def _copy_chunk(src, dst, sem):
    d = pltpu.make_async_copy(src, dst, sem)
    d.start()
    return d


# -------------------------------------------------------- rotation sweep

def _rot_stream_kernel(xh_ref, mb_ref, nout_ref, xc_ref, xm_ref, xl_ref,
                       ang_ref, zr_ref, zc_ref, cre_ref, psi_in_ref, psi_ref,
                       bufA, bufB, outA, outB, sems):
    g = pl.program_id(0)
    xh = xh_ref[g]
    mb = mb_ref[g]
    nout = nout_ref[g]
    xc = xc_ref[g]
    ang = ang_ref[g]
    ctx = _GroupCtx(xm_ref[g], xl_ref[g], zr_ref[0], zc_ref[0], cre_ref[0])
    C = bufA.shape[1]

    def rot(a0, a1, b0, b1, t):
        """cos(B_t) a + sin(B_t) perm(b) for tile t (both planes)."""
        B = ang * ctx.field(ctx.WLre, t)
        c, s = jnp.cos(B), jnp.sin(B)
        return (c * a0 + s * ctx.perm(b0), c * a1 + s * ctx.perm(b1))

    def outer(i, _):
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        d = [_copy_chunk(psi_ref.at[p, pl.ds(h * C, C)], bufA.at[p],
                         sems.at[p]) for p in (0, 1)]
        for x in d:
            x.wait()

        @pl.when(xh > 0)
        def _():
            d = [_copy_chunk(psi_ref.at[p, pl.ds(hh * C, C)], bufB.at[p],
                             sems.at[p]) for p in (0, 1)]
            for x in d:
                x.wait()

        def tile_body(it, _):
            ii = it ^ xc
            tA = h * C + it
            tB = hh * C + ii

            @pl.when(xh > 0)
            def _():                      # pair across chunks: A[it]<->B[ii]
                a0, a1 = bufA[0, it], bufA[1, it]
                b0, b1 = bufB[0, ii], bufB[1, ii]
                na0, na1 = rot(a0, a1, b0, b1, tA)
                nb0, nb1 = rot(b0, b1, a0, a1, tB)
                outA[0, it], outA[1, it] = na0, na1
                outB[0, ii], outB[1, ii] = nb0, nb1

            @pl.when(jnp.logical_and(xh == 0, xc > 0))
            def _():                      # pair inside the chunk
                @pl.when(it < ii)
                def _():
                    a0, a1 = bufA[0, it], bufA[1, it]
                    b0, b1 = bufA[0, ii], bufA[1, ii]
                    na0, na1 = rot(a0, a1, b0, b1, tA)
                    nb0, nb1 = rot(b0, b1, a0, a1, tB)
                    outA[0, it], outA[1, it] = na0, na1
                    outA[0, ii], outA[1, ii] = nb0, nb1

            @pl.when(jnp.logical_and(xh == 0, xc == 0))
            def _():                      # x_top == 0: self-paired tile
                a0, a1 = bufA[0, it], bufA[1, it]
                na0, na1 = rot(a0, a1, a0, a1, tA)
                outA[0, it], outA[1, it] = na0, na1

            return 0

        jax.lax.fori_loop(0, C, tile_body, 0)

        d = [_copy_chunk(outA.at[p], psi_ref.at[p, pl.ds(h * C, C)],
                         sems.at[p]) for p in (0, 1)]
        for x in d:
            x.wait()

        @pl.when(xh > 0)
        def _():
            d = [_copy_chunk(outB.at[p], psi_ref.at[p, pl.ds(hh * C, C)],
                             sems.at[p]) for p in (0, 1)]
            for x in d:
                x.wait()

        return 0

    jax.lax.fori_loop(0, nout, outer, 0)


def apply_grouped_ops_stream(psi, theta, x_huge, mb, n_outer, x_chunk, x_mid,
                             x_lane, op, z_r, z_c, cre,
                             interpret: bool = False):
    """Whole-ansatz rotation sweep, state streamed from HBM; psi (2, 2^n)
    f32 -> (2, 2^n) f32 (updated in place via aliasing)."""
    G, K = z_c.shape[0], z_c.shape[-1]
    N = psi.shape[-1]
    T = N >> TILE_BITS
    C = 1 << CHUNK_BITS
    psi4 = jnp.asarray(psi, jnp.float32).reshape(2, T, SUB, LANE)
    angles = -jnp.asarray(theta, jnp.float32)[jnp.asarray(op)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, K, 1), lambda g, *r: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda g, *r: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 1), lambda g, *r: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # psi (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, C, SUB, LANE), jnp.float32),   # bufA
            pltpu.VMEM((2, C, SUB, LANE), jnp.float32),   # bufB
            pltpu.VMEM((2, C, SUB, LANE), jnp.float32),   # outA
            pltpu.VMEM((2, C, SUB, LANE), jnp.float32),   # outB
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _rot_stream_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(psi4.shape, jnp.float32),
        input_output_aliases={10: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(x_huge), jnp.asarray(mb), jnp.asarray(n_outer),
      jnp.asarray(x_chunk), jnp.asarray(x_mid), jnp.asarray(x_lane), angles,
      jnp.asarray(z_r), jnp.asarray(z_c), jnp.asarray(cre), psi4)
    return out.reshape(2, N)


# ----------------------------------------------------------- expectation

def _expect_stream_kernel(xh_ref, mb_ref, nout_ref, xc_ref, xm_ref, xl_ref,
                          zr_ref, zc_ref, cre_ref, cim_ref, psi_ref, out_ref,
                          bufA, bufB, sems):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    xh = xh_ref[g]
    mb = mb_ref[g]
    nout = nout_ref[g]
    xc = xc_ref[g]
    ctx = _GroupCtx(xm_ref[g], xl_ref[g], zr_ref[0], zc_ref[0], cre_ref[0],
                    cim_ref[0])
    C = bufA.shape[1]

    def contrib(a0, a1, b0, b1, t):
        """E contribution of ordered tile t with partner content b:
        Wre . Re[conj(psi) psi_x] - Wim . Im[conj(psi) psi_x]."""
        pb0, pb1 = ctx.perm(b0), ctx.perm(b1)
        Wre = ctx.field(ctx.WLre, t)
        Wim = ctx.field(ctx.WLim, t)
        return jnp.sum(Wre * (a0 * pb0 + a1 * pb1)
                       - Wim * (a0 * pb1 - a1 * pb0))

    def outer(i, acc):
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        d = [_copy_chunk(psi_ref.at[p, pl.ds(h * C, C)], bufA.at[p],
                         sems.at[p]) for p in (0, 1)]
        for x in d:
            x.wait()

        @pl.when(xh > 0)
        def _():
            d = [_copy_chunk(psi_ref.at[p, pl.ds(hh * C, C)], bufB.at[p],
                             sems.at[p]) for p in (0, 1)]
            for x in d:
                x.wait()

        def tile_body(it, a):
            ii = it ^ xc
            tA = h * C + it
            tB = hh * C + ii

            def cross(a):
                return a + contrib(bufA[0, it], bufA[1, it],
                                   bufB[0, ii], bufB[1, ii], tA) \
                         + contrib(bufB[0, ii], bufB[1, ii],
                                   bufA[0, it], bufA[1, it], tB)

            def intra(a):
                both = a + contrib(bufA[0, it], bufA[1, it],
                                   bufA[0, ii], bufA[1, ii], tA) \
                         + contrib(bufA[0, ii], bufA[1, ii],
                                   bufA[0, it], bufA[1, it], tB)
                return jax.lax.select(it < ii, both, a)

            def self_pair(a):
                return a + contrib(bufA[0, it], bufA[1, it],
                                   bufA[0, it], bufA[1, it], tA)

            return jax.lax.cond(
                xh > 0, cross,
                lambda a: jax.lax.cond(xc > 0, intra, self_pair, a), a)

        return jax.lax.fori_loop(0, C, tile_body, acc)

    tot = jax.lax.fori_loop(0, nout, outer, jnp.float32(0.0))
    out_ref[0, 0] += tot


def expectation_stream(psi, x_huge, mb, n_outer, x_chunk, x_mid, x_lane,
                       z_r, z_c, cre, cim, interpret: bool = False):
    """Off-diagonal grouped <psi|H|psi> contribution, state streamed from
    HBM (diagonal + constant are cheap single XLA passes)."""
    G, K = z_c.shape[0], z_c.shape[-1]
    N = psi.shape[-1]
    T = N >> TILE_BITS
    C = 1 << CHUNK_BITS
    psi4 = jnp.asarray(psi, jnp.float32).reshape(2, T, SUB, LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, K, 1), lambda g, *r: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda g, *r: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 1), lambda g, *r: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 1), lambda g, *r: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda g, *r: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((2, C, SUB, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _expect_stream_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(x_huge), jnp.asarray(mb), jnp.asarray(n_outer),
      jnp.asarray(x_chunk), jnp.asarray(x_mid), jnp.asarray(x_lane),
      jnp.asarray(z_r), jnp.asarray(z_c), jnp.asarray(cre), jnp.asarray(cim),
      psi4)
    return out[0, 0]


# --------------------------------------------------------------- H |psi>

def _ham_stream_kernel(xh_ref, mb_ref, nout_ref, xc_ref, xm_ref, xl_ref,
                       zr_ref, zc_ref, cre_ref, cim_ref, psi_ref, acc_in_ref,
                       acc_ref, bufA, bufB, accA, accB, sems):
    g = pl.program_id(0)
    xh = xh_ref[g]
    mb = mb_ref[g]
    nout = nout_ref[g]
    xc = xc_ref[g]
    ctx = _GroupCtx(xm_ref[g], xl_ref[g], zr_ref[0], zc_ref[0], cre_ref[0],
                    cim_ref[0])
    C = bufA.shape[1]

    def add(o0, o1, b0, b1, t):
        """acc[t] += W(t) (.) perm(psi[t^x]) (complex weights)."""
        pb0, pb1 = ctx.perm(b0), ctx.perm(b1)
        Wre = ctx.field(ctx.WLre, t)
        Wim = ctx.field(ctx.WLim, t)
        return (o0 + Wre * pb0 - Wim * pb1, o1 + Wre * pb1 + Wim * pb0)

    def outer(i, _):
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        d = [_copy_chunk(psi_ref.at[p, pl.ds(h * C, C)], bufA.at[p],
                         sems.at[p]) for p in (0, 1)]
        d += [_copy_chunk(acc_ref.at[p, pl.ds(h * C, C)], accA.at[p],
                          sems.at[2 + p]) for p in (0, 1)]
        for x in d:
            x.wait()

        @pl.when(xh > 0)
        def _():
            d = [_copy_chunk(psi_ref.at[p, pl.ds(hh * C, C)], bufB.at[p],
                             sems.at[p]) for p in (0, 1)]
            d += [_copy_chunk(acc_ref.at[p, pl.ds(hh * C, C)], accB.at[p],
                              sems.at[2 + p]) for p in (0, 1)]
            for x in d:
                x.wait()

        def tile_body(it, _):
            ii = it ^ xc
            tA = h * C + it
            tB = hh * C + ii

            @pl.when(xh > 0)
            def _():
                accA[0, it], accA[1, it] = add(
                    accA[0, it], accA[1, it], bufB[0, ii], bufB[1, ii], tA)
                accB[0, ii], accB[1, ii] = add(
                    accB[0, ii], accB[1, ii], bufA[0, it], bufA[1, it], tB)

            @pl.when(jnp.logical_and(xh == 0, xc > 0))
            def _():
                @pl.when(it < ii)
                def _():
                    accA[0, it], accA[1, it] = add(
                        accA[0, it], accA[1, it],
                        bufA[0, ii], bufA[1, ii], tA)
                    accA[0, ii], accA[1, ii] = add(
                        accA[0, ii], accA[1, ii],
                        bufA[0, it], bufA[1, it], tB)

            @pl.when(jnp.logical_and(xh == 0, xc == 0))
            def _():
                accA[0, it], accA[1, it] = add(
                    accA[0, it], accA[1, it], bufA[0, it], bufA[1, it], tA)

            return 0

        jax.lax.fori_loop(0, C, tile_body, 0)

        d = [_copy_chunk(accA.at[p], acc_ref.at[p, pl.ds(h * C, C)],
                         sems.at[2 + p]) for p in (0, 1)]
        for x in d:
            x.wait()

        @pl.when(xh > 0)
        def _():
            d = [_copy_chunk(accB.at[p], acc_ref.at[p, pl.ds(hh * C, C)],
                             sems.at[2 + p]) for p in (0, 1)]
            for x in d:
                x.wait()

        return 0

    jax.lax.fori_loop(0, nout, outer, 0)


def ham_apply_stream(psi, acc, x_huge, mb, n_outer, x_chunk, x_mid, x_lane,
                     z_r, z_c, cre, cim, interpret: bool = False):
    """acc += (off-diagonal grouped H)|psi>, both streamed from HBM; acc is
    updated in place (pass the diagonal+const part, get the full H|psi>)."""
    G, K = z_c.shape[0], z_c.shape[-1]
    N = psi.shape[-1]
    T = N >> TILE_BITS
    C = 1 << CHUNK_BITS
    psi4 = jnp.asarray(psi, jnp.float32).reshape(2, T, SUB, LANE)
    acc4 = jnp.asarray(acc, jnp.float32).reshape(2, T, SUB, LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, K, 1), lambda g, *r: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda g, *r: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 1), lambda g, *r: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 1), lambda g, *r: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # psi
            pl.BlockSpec(memory_space=pl.ANY),        # acc (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((2, C, SUB, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    out = pl.pallas_call(
        _ham_stream_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(acc4.shape, jnp.float32),
        input_output_aliases={11: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(x_huge), jnp.asarray(mb), jnp.asarray(n_outer),
      jnp.asarray(x_chunk), jnp.asarray(x_mid), jnp.asarray(x_lane),
      jnp.asarray(z_r), jnp.asarray(z_c), jnp.asarray(cre), jnp.asarray(cim),
      psi4, acc4)
    return out.reshape(2, N)


# ------------------------------------------------------- reversible adjoint

def _adj_stream_kernel(xh_ref, mb_ref, nout_ref, xc_ref, xm_ref, xl_ref,
                       ang_ref, zr_ref, zc_ref, cre_ref, p_in_ref, l_in_ref,
                       p_ref, l_ref, gt_ref, bufPA, bufPB, bufLA, bufLB,
                       outPA, outPB, outLA, outLB, gacc, sems):
    g = pl.program_id(0)
    xh = xh_ref[g]
    mb = mb_ref[g]
    nout = nout_ref[g]
    xc = xc_ref[g]
    ang = ang_ref[g]
    ctx = _GroupCtx(xm_ref[g], xl_ref[g], zr_ref[0], zc_ref[0], cre_ref[0])
    C = bufPA.shape[1]
    gacc[...] = jnp.zeros_like(gacc)

    def unrot(pa, pb, la, lb, t):
        """Un-rotated tile t of p and l given partner contents (pb, lb) and
        the tile's gradient contribution (pure reads)."""
        ph = ctx.field(ctx.WLre, t)
        B = ang * ph
        c, s = jnp.cos(B), jnp.sin(B)
        pxp = (ctx.perm(pb[0]), ctx.perm(pb[1]))
        pxl = (ctx.perm(lb[0]), ctx.perm(lb[1]))
        gtc = -2.0 * jnp.sum(ph * (la[0] * pxp[0] + la[1] * pxp[1]))
        return gtc, (c * pa[0] - s * pxp[0], c * pa[1] - s * pxp[1],
                     c * la[0] - s * pxl[0], c * la[1] - s * pxl[1])

    def outer(i, _):
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        d = [_copy_chunk(p_ref.at[p, pl.ds(h * C, C)], bufPA.at[p],
                         sems.at[p]) for p in (0, 1)]
        d += [_copy_chunk(l_ref.at[p, pl.ds(h * C, C)], bufLA.at[p],
                          sems.at[2 + p]) for p in (0, 1)]
        for x in d:
            x.wait()

        @pl.when(xh > 0)
        def _():
            d = [_copy_chunk(p_ref.at[p, pl.ds(hh * C, C)], bufPB.at[p],
                             sems.at[p]) for p in (0, 1)]
            d += [_copy_chunk(l_ref.at[p, pl.ds(hh * C, C)], bufLB.at[p],
                              sems.at[2 + p]) for p in (0, 1)]
            for x in d:
                x.wait()

        def tile_body(it, _):
            ii = it ^ xc
            tA = h * C + it
            tB = hh * C + ii

            @pl.when(xh > 0)
            def _():
                pa = (bufPA[0, it], bufPA[1, it])
                pb = (bufPB[0, ii], bufPB[1, ii])
                la = (bufLA[0, it], bufLA[1, it])
                lb = (bufLB[0, ii], bufLB[1, ii])
                gA, (np0, np1, nl0, nl1) = unrot(pa, pb, la, lb, tA)
                gB, (mp0, mp1, ml0, ml1) = unrot(pb, pa, lb, la, tB)
                gacc[0, :] += gA + gB
                outPA[0, it], outPA[1, it] = np0, np1
                outLA[0, it], outLA[1, it] = nl0, nl1
                outPB[0, ii], outPB[1, ii] = mp0, mp1
                outLB[0, ii], outLB[1, ii] = ml0, ml1

            @pl.when(jnp.logical_and(xh == 0, xc > 0))
            def _():
                @pl.when(it < ii)
                def _():
                    pa = (bufPA[0, it], bufPA[1, it])
                    pb = (bufPA[0, ii], bufPA[1, ii])
                    la = (bufLA[0, it], bufLA[1, it])
                    lb = (bufLA[0, ii], bufLA[1, ii])
                    gA, (np0, np1, nl0, nl1) = unrot(pa, pb, la, lb, tA)
                    gB, (mp0, mp1, ml0, ml1) = unrot(pb, pa, lb, la, tB)
                    gacc[0, :] += gA + gB
                    outPA[0, it], outPA[1, it] = np0, np1
                    outLA[0, it], outLA[1, it] = nl0, nl1
                    outPA[0, ii], outPA[1, ii] = mp0, mp1
                    outLA[0, ii], outLA[1, ii] = ml0, ml1

            @pl.when(jnp.logical_and(xh == 0, xc == 0))
            def _():
                pa = (bufPA[0, it], bufPA[1, it])
                la = (bufLA[0, it], bufLA[1, it])
                gA, (np0, np1, nl0, nl1) = unrot(pa, pa, la, la, tA)
                gacc[0, :] += gA
                outPA[0, it], outPA[1, it] = np0, np1
                outLA[0, it], outLA[1, it] = nl0, nl1

            return 0

        jax.lax.fori_loop(0, C, tile_body, 0)

        d = [_copy_chunk(outPA.at[p], p_ref.at[p, pl.ds(h * C, C)],
                         sems.at[p]) for p in (0, 1)]
        d += [_copy_chunk(outLA.at[p], l_ref.at[p, pl.ds(h * C, C)],
                          sems.at[2 + p]) for p in (0, 1)]
        for x in d:
            x.wait()

        @pl.when(xh > 0)
        def _():
            d = [_copy_chunk(outPB.at[p], p_ref.at[p, pl.ds(hh * C, C)],
                             sems.at[p]) for p in (0, 1)]
            d += [_copy_chunk(outLB.at[p], l_ref.at[p, pl.ds(hh * C, C)],
                              sems.at[2 + p]) for p in (0, 1)]
            for x in d:
                x.wait()

        return 0

    jax.lax.fori_loop(0, nout, outer, 0)
    gt_ref[g % 8, :] = gacc[0, :]


def adjoint_sweep_stream(p, lam, x_huge, mb, n_outer, x_chunk, x_mid, x_lane,
                         angles, z_r, z_c, cre, interpret: bool = False):
    """Reversible adjoint over grouped rotations, both states streamed from
    HBM; operands must be passed in REVERSED group order.  Returns
    (p_prev, lam_prev, per-group gradient entries); angles = -theta[op] per
    (reversed) group."""
    G0 = z_c.shape[0]
    pad = (8 - G0 % 8) % 8
    if pad:
        def p8(a, fill=0):
            return jnp.pad(jnp.asarray(a),
                           [(0, pad)] + [(0, 0)] * (np.ndim(a) - 1))

        x_huge, mb, x_chunk = p8(x_huge), p8(mb), p8(x_chunk)
        x_mid, x_lane = p8(x_mid), p8(x_lane)
        angles, z_r, z_c, cre = p8(angles), p8(z_r), p8(z_c), p8(cre)
        # padded groups are identity rotations (x=0, zero weights) but the
        # outer loop must still run 0 iterations to stay cheap
        n_outer = jnp.concatenate([jnp.asarray(n_outer),
                                   jnp.zeros(pad, jnp.int32)])
    G, K = z_c.shape[0], z_c.shape[-1]
    N = p.shape[-1]
    T = N >> TILE_BITS
    C = 1 << CHUNK_BITS
    p4 = jnp.asarray(p, jnp.float32).reshape(2, T, SUB, LANE)
    l4 = jnp.asarray(lam, jnp.float32).reshape(2, T, SUB, LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, K, 1), lambda g, *r: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, K), lambda g, *r: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, 1), lambda g, *r: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # p
            pl.BlockSpec(memory_space=pl.ANY),        # l
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, LANE), lambda g, *r: (g // 8, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=(
            [pltpu.VMEM((2, C, SUB, LANE), jnp.float32) for _ in range(8)]
            + [pltpu.VMEM((8, LANE), jnp.float32),
               pltpu.SemaphoreType.DMA((4,))]),
    )
    p_out, l_out, gts = pl.pallas_call(
        _adj_stream_kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(p4.shape, jnp.float32),
                   jax.ShapeDtypeStruct(l4.shape, jnp.float32),
                   jax.ShapeDtypeStruct((G, LANE), jnp.float32)),
        input_output_aliases={10: 0, 11: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(x_huge), jnp.asarray(mb), jnp.asarray(n_outer),
      jnp.asarray(x_chunk), jnp.asarray(x_mid), jnp.asarray(x_lane),
      jnp.asarray(angles), jnp.asarray(z_r), jnp.asarray(z_c),
      jnp.asarray(cre), p4, l4)
    return p_out.reshape(2, N), l_out.reshape(2, N), gts[:G0, 0]
