"""Pallas/Mosaic fused kernels: whole-ansatz rotation sweep and grouped
Hamiltonian expectation with the statevector RESIDENT IN VMEM.

The XLA grouped path (sim/grouped.py) costs ~5 HBM round trips per group
(three permutation matmuls, the sign-field matmul, the rotation combine —
XLA does not fuse across matmuls).  Here the state lives in VMEM as
``psi[2, T, 128, 128]`` (plane, tile, sublane-bits, lane-bits; tile index =
amplitude bits above bit 14) for the whole sweep, and each group costs zero
state HBM traffic:

  * index-XOR by the group mask x splits as  tile' = tile ^ (x >> 14)
    (a dynamic VMEM tile index), a 128x128 sublane permutation matmul
    P_mid (bits 13..7) and a lane permutation matmul P_lo (bits 6..0) —
    both MXU ops on the 128x128 tile;
  * the rank-K angle/weight field splits the same way:
    Phi_tile(t) = (S_mid * s_top[t]) @ W_lane — one small MXU op;
  * rotations:  psi_t' = cos(B) psi_t + sin(B) psi_{t^x},  B = angle * Phi
    (sim/grouped.py derivation), processed as (t, t^xtop) tile PAIRS so the
    in-place update reads both sides before writing.

Per-group data (permutation matrices, sign factors) is streamed from HBM —
~128 KB/group, amortized by Mosaic's block pipeline.  The grid dimension is
declared "arbitrary" (sequential): rotations must apply in group order.

Applicability: TPU backend, f32 planes, 14 <= n <= 20 (psi <= 8 MB of
~16 MB VMEM).  Outside that the XLA grouped path runs; parity is tested in
interpret mode and on hardware (tests/test_pallas.py).

Reference hot-loop analog: get_energy_ucc.py:158-175 (circuit re-emission
per evaluation); round-1 VERDICT item 2.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grouped import GroupedOpSequence, GroupedPauliSum, rot_cos_sin

LANE = 128
SUB = 128
TILE_BITS = 14          # bits covered by (sublane, lane) of one tile
MIN_N = TILE_BITS
MAX_N = 20              # 2 * 2^20 * 4 B = 8 MB VMEM for the resident state


def pallas_supported(n: int) -> bool:
    # Mosaic lowers on TPU-family backends only ("axon" = the bench chip)
    return (MIN_N <= n <= MAX_N
            and jax.default_backend() in ("tpu", "axon"))


# ------------------------------------------------------------ host prep

@dataclass
class GroupData:
    """Device arrays for a grouped operator, split at tile boundaries."""
    n: int
    T: int
    x_top: np.ndarray    # (G,) int32 tile-XOR masks
    x_mid: np.ndarray    # (G,) int32 sublane-XOR masks (bits 13..7)
    x_lane: np.ndarray   # (G,) int32 lane-XOR masks (bits 6..0)
    w_lane: np.ndarray   # (G, K, 128) f32 Re(coef)-folded lane signs
    s_mid: np.ndarray    # (G, 128, K) f32 sublane signs
    s_top: np.ndarray    # (G, T, K) f32 tile signs
    op: Optional[np.ndarray] = None        # (G,) int32 (sequences only)
    w_lane_im: Optional[np.ndarray] = None  # (G, K, 128) Im(coef) signs

    @property
    def G(self) -> int:
        return len(self.x_top)


def _signs(idx: np.ndarray, masks: np.ndarray) -> np.ndarray:
    """(len(idx), len(masks)) array of (-1)^popcount(idx & mask)."""
    v = idx[:, None] & masks[None, :]
    pop = np.zeros_like(v)
    while v.any():
        pop += v & 1
        v >>= 1
    return (1.0 - 2.0 * (pop & 1)).astype(np.float32)


def _perm_kernel_matrix(x_scalar):
    """In-kernel 128x128 permutation matrix P[i, j] = (i ^ j == x) — built
    from a prefetched scalar instead of streamed from HBM (the G x 128 x 128
    matrices would dominate both the compile payload and the bandwidth)."""
    i = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    return (jnp.bitwise_xor(i, j) == x_scalar).astype(jnp.float32)


def build_group_data(n: int, x: np.ndarray, z: np.ndarray,
                     coef: np.ndarray, op: Optional[np.ndarray] = None,
                     coef_im: Optional[np.ndarray] = None) -> GroupData:
    """Lower grouped (x, z, coef) arrays — shapes (G,), (G, K), (G, K) —
    to streamed kernel operands."""
    if n < MIN_N or n > MAX_N:
        raise ValueError(f"pallas path needs {MIN_N} <= n <= {MAX_N}, got {n}")
    G, K = z.shape
    T = 1 << (n - TILE_BITS)
    lanes = np.arange(LANE)
    subs = np.arange(SUB)
    tiles = np.arange(T)
    w_lane = np.zeros((G, K, LANE), np.float32)
    w_lane_im = (np.zeros((G, K, LANE), np.float32)
                 if coef_im is not None else None)
    s_mid = np.zeros((G, SUB, K), np.float32)
    s_top = np.zeros((G, T, K), np.float32)
    xi = np.asarray(x, np.int64)
    x_top = (xi >> TILE_BITS).astype(np.int32)
    x_mid = ((xi >> 7) & (SUB - 1)).astype(np.int32)
    x_lane = (xi & (LANE - 1)).astype(np.int32)
    for g in range(G):
        zg = np.asarray(z[g], np.int64)
        lane_signs = _signs(lanes, zg & (LANE - 1)).T
        w_lane[g] = np.asarray(coef[g], np.float32)[:, None] * lane_signs
        if w_lane_im is not None:
            w_lane_im[g] = (np.asarray(coef_im[g], np.float32)[:, None]
                            * lane_signs)
        s_mid[g] = _signs(subs, (zg >> 7) & (SUB - 1))
        s_top[g] = _signs(tiles, zg >> TILE_BITS)
    return GroupData(n=n, T=T, x_top=x_top, x_mid=x_mid, x_lane=x_lane,
                     w_lane=w_lane, s_mid=s_mid, s_top=s_top,
                     op=None if op is None else np.asarray(op, np.int32),
                     w_lane_im=w_lane_im)


def seq_group_data(gseq: GroupedOpSequence) -> GroupData:
    return build_group_data(gseq.n, gseq.x, gseq.z, gseq.s, op=gseq.op)


def ham_group_data(gham: GroupedPauliSum) -> GroupData:
    """Off-diagonal groups of a grouped Hamiltonian.  Odd-Y Pauli strings
    carry purely imaginary compiled coefficients even for Hermitian H (the
    (-i)^nY factor of the index-XOR form), so both Re and Im weight fields
    are lowered:  E_g = sum W_re . P - W_im . Q  with
    P = Re[conj(psi) psi_x], Q = Im[conj(psi) psi_x]."""
    return build_group_data(gham.n, gham.x, gham.z, gham.a_re,
                            coef_im=gham.a_im)


# ------------------------------------------------------------- kernels

def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _rot_kernel(fmode, xtop_ref, xmid_ref, xlane_ref, ang_ref, wl_ref,
                sm_ref, st_ref, psi_in_ref, psi_ref):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        psi_ref[...] = psi_in_ref[...]

    xt = xtop_ref[g]
    ang = ang_ref[g]
    plo = _perm_kernel_matrix(xlane_ref[g])
    pmid = _perm_kernel_matrix(xmid_ref[g])
    wl = wl_ref[0]
    sm = sm_ref[0]
    T = psi_ref.shape[1]

    def perm(m):
        return _mm(_mm(pmid, m), plo)

    def phi(t):
        strow = st_ref[0, pl.ds(t, 1), :]          # (1, K) tile signs
        return _mm(sm * strow, wl)                 # (128, 128) field

    def body(t, _):
        tt = jax.lax.bitwise_xor(jnp.asarray(t, xt.dtype), xt)

        @pl.when(jnp.logical_or(xt == 0, t < tt))
        def _():
            a0 = psi_ref[0, t]
            a1 = psi_ref[1, t]
            b0 = psi_ref[0, tt]
            b1 = psi_ref[1, tt]
            ct, snt = rot_cos_sin(ang, phi(t), fmode)
            na0 = ct * a0 + snt * perm(b0)
            na1 = ct * a1 + snt * perm(b1)

            @pl.when(xt != 0)
            def _():
                cp, sp = rot_cos_sin(ang, phi(tt), fmode)
                psi_ref[0, tt] = cp * b0 + sp * perm(a0)
                psi_ref[1, tt] = cp * b1 + sp * perm(a1)

            psi_ref[0, t] = na0
            psi_ref[1, t] = na1

    jax.lax.fori_loop(0, T, body, None)


def _expect_kernel(xtop_ref, xmid_ref, xlane_ref, wl_ref, wli_ref, sm_ref,
                   st_ref, psi_ref, out_ref):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    xt = xtop_ref[g]
    plo = _perm_kernel_matrix(xlane_ref[g])
    pmid = _perm_kernel_matrix(xmid_ref[g])
    wl = wl_ref[0]
    wli = wli_ref[0]
    sm = sm_ref[0]
    T = psi_ref.shape[1]

    def perm(m):
        return _mm(_mm(pmid, m), plo)

    def body(t, acc):
        tt = jax.lax.bitwise_xor(jnp.asarray(t, xt.dtype), xt)
        a0 = psi_ref[0, t]
        a1 = psi_ref[1, t]
        pa0 = perm(psi_ref[0, tt])
        pa1 = perm(psi_ref[1, tt])
        strow = st_ref[0, pl.ds(t, 1), :]
        smr = sm * strow
        Wre = _mm(smr, wl)
        Wim = _mm(smr, wli)
        # E += W_re . Re[conj(psi) psi_x] - W_im . Im[conj(psi) psi_x]
        return acc + jnp.sum(Wre * (a0 * pa0 + a1 * pa1)
                             - Wim * (a0 * pa1 - a1 * pa0))

    tot = jax.lax.fori_loop(0, T, body, jnp.float32(0.0))
    out_ref[0, 0] += tot


# ------------------------------------------------------------ call wrappers

def _group_specs(T: int, K: int):
    """BlockSpecs for the streamed per-group operands (leading grid dim)."""
    return [
        pl.BlockSpec((1, K, LANE), lambda g, *refs: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, SUB, K), lambda g, *refs: (g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T, K), lambda g, *refs: (g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]


def _psi4(psi):
    N = psi.shape[-1]
    T = N >> TILE_BITS
    return psi.reshape(2, T, SUB, LANE)


def seq_args(gd: GroupData):
    """Traced-argument tuple for apply_grouped_ops_pallas — pass these as
    jit ARGUMENTS so ADAPT rebinding reuses one executable per padded
    bucket (closures would bake them in as constants and recompile — and
    blow the axon remote-compile payload limit)."""
    return (gd.x_top, gd.x_mid, gd.x_lane, gd.op, gd.w_lane, gd.s_mid,
            gd.s_top)


def ham_args(gd: GroupData):
    wli = gd.w_lane_im
    if wli is None:
        wli = np.zeros_like(gd.w_lane)
    return (gd.x_top, gd.x_mid, gd.x_lane, gd.w_lane, wli, gd.s_mid,
            gd.s_top)


def pad_group_data(gd: GroupData, g_pad: int) -> GroupData:
    """Pad the group axis (x=0 / zero-coefficient groups are identities)."""
    G = gd.G
    if g_pad < G:
        raise ValueError(f"g_pad={g_pad} < G={G}")
    pad = g_pad - G

    def p(a):
        return np.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))

    return GroupData(
        n=gd.n, T=gd.T, x_top=p(gd.x_top), x_mid=p(gd.x_mid),
        x_lane=p(gd.x_lane), w_lane=p(gd.w_lane), s_mid=p(gd.s_mid),
        s_top=p(gd.s_top), op=None if gd.op is None else p(gd.op),
        w_lane_im=None if gd.w_lane_im is None else p(gd.w_lane_im))


def apply_grouped_ops_pallas(psi, theta, x_top, x_mid, x_lane, op, w_lane,
                             s_mid, s_top, interpret: bool = False,
                             fmode: int = 0):
    """Whole-ansatz rotation sweep; psi (2, 2^n) f32 -> (2, 2^n) f32.
    Group operands as produced by seq_args(); all may be traced."""
    G, K = w_lane.shape[0], w_lane.shape[1]
    T = s_top.shape[1]
    psi4 = _psi4(jnp.asarray(psi, jnp.float32))
    # B = -theta[op] * Phi; angles ride the scalar-prefetch channel
    angles = -jnp.asarray(theta, jnp.float32)[jnp.asarray(op)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(G,),
        in_specs=[
            *_group_specs(T, K),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # psi_in (resident)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    from functools import partial as _partial
    out = pl.pallas_call(
        _partial(_rot_kernel, fmode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(psi4.shape, jnp.float32),
        input_output_aliases={7: 0},   # psi_in buffer reused as output
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(x_top), jnp.asarray(x_mid), jnp.asarray(x_lane), angles,
      w_lane, s_mid, s_top, psi4)
    return out.reshape(2, -1)


def expectation_pallas(psi, x_top, x_mid, x_lane, w_lane, w_lane_im,
                       s_mid, s_top, interpret: bool = False):
    """Off-diagonal grouped <psi|H|psi> contribution (diagonal + constant
    are cheap single passes handled by the XLA path).  Group operands as
    produced by ham_args(); all may be traced."""
    G, K = w_lane.shape[0], w_lane.shape[1]
    T = s_top.shape[1]
    psi4 = _psi4(jnp.asarray(psi, jnp.float32))

    specs = _group_specs(T, K)
    specs.insert(1, pl.BlockSpec((1, K, LANE), lambda g, *refs: (g, 0, 0),
                                 memory_space=pltpu.VMEM))  # w_lane_im
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[
            *specs,
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda g, *refs: (0, 0),
                               memory_space=pltpu.SMEM),
    )
    out = pl.pallas_call(
        _expect_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(x_top), jnp.asarray(x_mid), jnp.asarray(x_lane), w_lane,
      w_lane_im, s_mid, s_top, psi4)
    return out[0, 0]


# ------------------------------------------------- H-apply / adjoint kernels
#
# Two-state kernels: H|psi> needs (psi, acc) and the reversible adjoint
# needs (p, l) resident — 2 * 2^n * 4 B each, so these run at
# MIN_N <= n <= MAX_N_2STATE (the single-state sweep/expectation kernels
# reach MAX_N).  The adjoint grid iterates the group arrays in REVERSED
# order (pass reversed operands); per-group gradient entries land in a
# (G, 128) buffer segment-summed into ops by the XLA caller.

MAX_N_2STATE = 19


def pallas_2state_supported(n: int) -> bool:
    return (MIN_N <= n <= MAX_N_2STATE
            and jax.default_backend() in ("tpu", "axon"))


def _ham_kernel(xtop_ref, xmid_ref, xlane_ref, wl_ref, wli_ref, sm_ref,
                st_ref, psi_ref, acc_ref):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    xt = xtop_ref[g]
    plo = _perm_kernel_matrix(xlane_ref[g])
    pmid = _perm_kernel_matrix(xmid_ref[g])
    wl = wl_ref[0]
    wli = wli_ref[0]
    sm = sm_ref[0]
    T = psi_ref.shape[1]

    def perm(m):
        return _mm(_mm(pmid, m), plo)

    def body(t, _):
        tt = jax.lax.bitwise_xor(jnp.asarray(t, xt.dtype), xt)
        px0 = perm(psi_ref[0, tt])
        px1 = perm(psi_ref[1, tt])
        strow = st_ref[0, pl.ds(t, 1), :]
        smr = sm * strow
        Wre = _mm(smr, wl)
        Wim = _mm(smr, wli)
        acc_ref[0, t] += Wre * px0 - Wim * px1
        acc_ref[1, t] += Wre * px1 + Wim * px0

    jax.lax.fori_loop(0, T, body, None)


def ham_apply_pallas(psi, x_top, x_mid, x_lane, w_lane, w_lane_im, s_mid,
                     s_top, interpret: bool = False):
    """Off-diagonal grouped H|psi> (diagonal + constant handled by the XLA
    caller); psi (2, 2^n) f32 -> (2, 2^n) f32."""
    G, K = w_lane.shape[0], w_lane.shape[1]
    T = s_top.shape[1]
    psi4 = _psi4(jnp.asarray(psi, jnp.float32))

    specs = _group_specs(T, K)
    specs.insert(1, pl.BlockSpec((1, K, LANE), lambda g, *refs: (g, 0, 0),
                                 memory_space=pltpu.VMEM))  # w_lane_im
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[
            *specs,
            pl.BlockSpec(memory_space=pltpu.VMEM),   # psi (resident)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _ham_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(psi4.shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(x_top), jnp.asarray(x_mid), jnp.asarray(x_lane), w_lane,
      w_lane_im, s_mid, s_top, psi4)
    return out.reshape(2, -1)


def _adjoint_kernel(fmode, xtop_ref, xmid_ref, xlane_ref, ang_ref, wl_ref,
                    sm_ref, st_ref, p_in_ref, l_in_ref, p_ref, l_ref, gt_ref,
                    acc_ref):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        p_ref[...] = p_in_ref[...]
        l_ref[...] = l_in_ref[...]

    xt = xtop_ref[g]
    ang = ang_ref[g]
    plo = _perm_kernel_matrix(xlane_ref[g])
    pmid = _perm_kernel_matrix(xmid_ref[g])
    wl = wl_ref[0]
    sm = sm_ref[0]
    T = p_ref.shape[1]

    def perm(m):
        return _mm(_mm(pmid, m), plo)

    def phi(t):
        strow = st_ref[0, pl.ds(t, 1), :]
        return _mm(sm * strow, wl)

    acc_ref[...] = jnp.zeros_like(acc_ref)

    def tile_update(t, tt):
        """Un-rotated values for tile t of p and l (reading partner tile
        tt) and the tile's gradient contribution — pure reads."""
        ph = phi(t)
        c, s = rot_cos_sin(ang, ph, fmode)
        pxp0 = perm(p_ref[0, tt])
        pxp1 = perm(p_ref[1, tt])
        pxl0 = perm(l_ref[0, tt])
        pxl1 = perm(l_ref[1, tt])
        gtc = -2.0 * jnp.sum(ph * (l_ref[0, t] * pxp0 + l_ref[1, t] * pxp1))
        return gtc, (c * p_ref[0, t] - s * pxp0, c * p_ref[1, t] - s * pxp1,
                     c * l_ref[0, t] - s * pxl0, c * l_ref[1, t] - s * pxl1)

    def body(t, _):
        tt = jax.lax.bitwise_xor(jnp.asarray(t, xt.dtype), xt)

        @pl.when(jnp.logical_or(xt == 0, t < tt))
        def _():
            gtc, (np0, np1, nl0, nl1) = tile_update(t, tt)
            acc_ref[0, :] += gtc

            @pl.when(xt != 0)
            def _():
                gtp, (mp0, mp1, ml0, ml1) = tile_update(tt, t)
                acc_ref[0, :] += gtp
                p_ref[0, tt] = mp0
                p_ref[1, tt] = mp1
                l_ref[0, tt] = ml0
                l_ref[1, tt] = ml1

            p_ref[0, t] = np0
            p_ref[1, t] = np1
            l_ref[0, t] = nl0
            l_ref[1, t] = nl1

        return 0

    jax.lax.fori_loop(0, T, body, 0)
    # per-group gradient entry: row g % 8 of the (G // 8)-blocked output
    gt_ref[g % 8, :] = acc_ref[0, :]


def adjoint_sweep_pallas(p, lam, x_top, x_mid, x_lane, angles, w_lane, s_mid,
                         s_top, interpret: bool = False, fmode: int = 0):
    """Reversible adjoint over grouped rotations (operands must be passed in
    REVERSED group order).  Returns (p_prev, lam_prev, per-group gradient
    entries); the caller segment-sums entries into parameters.  angles =
    -theta[op] per (reversed) group.  G must be a multiple of 8 (the padded
    buckets always are)."""
    G0 = w_lane.shape[0]
    if G0 % 8:
        # pad to a multiple of 8 with identity groups (zero weights)
        pad = 8 - G0 % 8

        def p8(a):
            return jnp.pad(jnp.asarray(a),
                           [(0, pad)] + [(0, 0)] * (np.ndim(a) - 1))

        x_top, x_mid, x_lane = p8(x_top), p8(x_mid), p8(x_lane)
        angles, w_lane = p8(angles), p8(w_lane)
        s_mid, s_top = p8(s_mid), p8(s_top)
    G, K = w_lane.shape[0], w_lane.shape[1]
    T = s_top.shape[1]
    p4 = _psi4(jnp.asarray(p, jnp.float32))
    l4 = _psi4(jnp.asarray(lam, jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(G,),
        in_specs=[
            *_group_specs(T, K),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # p (resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # l (resident)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((8, LANE), lambda g, *refs: (g // 8, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((8, LANE), jnp.float32)],
    )
    from functools import partial as _partial
    p_out, l_out, gts = pl.pallas_call(
        _partial(_adjoint_kernel, fmode),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(p4.shape, jnp.float32),
                   jax.ShapeDtypeStruct(l4.shape, jnp.float32),
                   jax.ShapeDtypeStruct((G, LANE), jnp.float32)),
        input_output_aliases={7: 0, 8: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(x_top), jnp.asarray(x_mid), jnp.asarray(x_lane),
      jnp.asarray(angles), w_lane, s_mid, s_top, p4, l4)
    return p_out.reshape(2, -1), l_out.reshape(2, -1), gts[:G0, 0]
