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

from .grouped import rot_cos_sin

LANE = 128
SUB = 128
TILE_BITS = 14
CHUNK_BITS = 3                 # C = 8 tiles/chunk = 512 KB per plane-chunk
ADJ_CHUNK_BITS = 2             # adjoint streams 4 states: half-size chunks
EXP_HOIST_CHUNK_BITS = 2       # hoisted expectation: the unique-mask
                               # permuted-chunk tables live in VMEM next
                               # to the staging buffers — half-size chunks
MIN_N = TILE_BITS + CHUNK_BITS + 1


def streaming_supported(n: int) -> bool:
    # Mosaic kernels lower on TPU-family backends only (the axon plugin
    # registers the bench chip as "axon"); a GPU backend must fall back to
    # the XLA grouped path rather than crash in pltpu lowering
    return n >= MIN_N and jax.default_backend() in ("tpu", "axon")


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
    fmode: int = 0             # grouped.sequence_field_mode (rotations only)

    @property
    def G(self) -> int:
        return len(self.x_lane)


def build_stream_data(n: int, x: np.ndarray, z: np.ndarray, coef: np.ndarray,
                      op: Optional[np.ndarray] = None,
                      coef_im: Optional[np.ndarray] = None,
                      chunk_bits: int = CHUNK_BITS,
                      fmode: int = 0) -> StreamGroupData:
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
    # bucket-padding groups (x = 0, all-zero coefficients) are identities:
    # skip their full-state pass entirely
    inert = (xi == 0) & (np.max(np.abs(coef), axis=1, initial=0.0) == 0.0)
    if coef_im is not None:
        inert &= np.max(np.abs(coef_im), axis=1, initial=0.0) == 0.0
    n_outer[inert] = 0
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
        op=None if op is None else np.asarray(op, np.int32),
        fmode=fmode)


def stream_seq_data(gseq, chunk_bits: int = CHUNK_BITS) -> StreamGroupData:
    """From a GroupedOpSequence (sim/grouped.py)."""
    return build_stream_data(gseq.n, gseq.x, gseq.z, gseq.s, op=gseq.op,
                             chunk_bits=chunk_bits,
                             fmode=getattr(gseq, "fmode", 0))


def _reverse_sd(sd: StreamGroupData) -> StreamGroupData:
    """Group order reversed (for adjoint bucketing)."""
    r = slice(None, None, -1)
    return StreamGroupData(
        n=sd.n, T=sd.T, C=sd.C, x_lane=sd.x_lane[r], x_mid=sd.x_mid[r],
        x_chunk=sd.x_chunk[r], x_huge=sd.x_huge[r], mb=sd.mb[r],
        n_outer=sd.n_outer[r], z_r=sd.z_r[r], z_c=sd.z_c[r], cre=sd.cre[r],
        cim=None if sd.cim is None else sd.cim[r],
        op=None if sd.op is None else sd.op[r], fmode=sd.fmode)


def stream_ham_data(gham, chunk_bits: int = CHUNK_BITS) -> StreamGroupData:
    """Off-diagonal groups of a GroupedPauliSum (odd-Y strings carry purely
    imaginary compiled coefficients even for Hermitian H — both weight
    fields are lowered, as in pallas_kernels.ham_group_data)."""
    return build_stream_data(gham.n, gham.x, gham.z, gham.a_re,
                             coef_im=gham.a_im, chunk_bits=chunk_bits)


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


# ---------------------------------------------------------------- kernels
#
# All per-chunk work is CHUNK-VECTORIZED: the in-tile permutation runs as
# two C-batched MXU matmuls per plane (no per-tile dispatch), the in-chunk
# tile XOR as a roll+select chain over the (tiny) tile axis, and the three
# pairing modes (cross-chunk, intra-chunk, self) collapse to ONE functional
# update formula — newA = cos(B) A + sin(B) roll_xc(perm(PARTNER)) — because
# chunk updates are computed out of place (no read/write hazard, no i<ii
# guards, no inner tile loop).

def _mm(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


# Permutation matmuls: the {0,1} side is exactly bf16-representable, so only
# the STATE side needs limb-splitting — 3 bf16 MXU passes (residual ~2^-27,
# better than f32) vs Precision.HIGHEST's 6 passes on both operands.
# OVQE_STREAM_MM=highest restores full-precision A/B runs.
import os as _os

_STREAM_MM = _os.environ.get("OVQE_STREAM_MM", "bf16x3").lower()
if _STREAM_MM not in ("bf16x3", "highest"):
    raise ValueError(f"OVQE_STREAM_MM must be bf16x3|highest, got {_STREAM_MM}")

# Timing-attribution probes (WRONG NUMERICS — benchmarks/probe_streaming.py
# only): "noperm" short-circuits the permutation matmuls, "nofield" the
# sign/weight field build, isolating MXU vs VPU vs DMA cost per group.
_STREAM_PROBE = _os.environ.get("OVQE_STREAM_PROBE", "").lower()
if _STREAM_PROBE not in ("", "noperm", "nofield", "copyonly"):
    raise ValueError(f"OVQE_STREAM_PROBE must be empty|noperm|nofield|"
                     f"copyonly, got {_STREAM_PROBE}")
if _STREAM_PROBE:
    import warnings as _warnings

    _warnings.warn(
        f"OVQE_STREAM_PROBE={_STREAM_PROBE!r}: streaming kernels now return "
        f"WRONG NUMERICS (timing-attribution probe for "
        f"benchmarks/probe_streaming.py only) — unset it for any real run",
        stacklevel=2)
    print(f"*** OVQE_STREAM_PROBE={_STREAM_PROBE}: streaming-kernel numerics "
          f"are INVALID (timing probe) ***", file=__import__("sys").stderr)


def grouped_hermitian_operator(gham) -> bool:
    """True iff the grouped Hamiltonian is Hermitian as an OPERATOR (what
    the bucketed-expectation ``herm=True`` certificate needs) — distinct
    from ``gham.hermitian``, which only records that every COMPILED
    coefficient is real.  A compiled term c * perm_x * sign_z has adjoint
    conj(c) * (-1)^popcount(x & z) * perm_x * sign_z, so it is Hermitian
    iff c is real when popcount(x & z) is even and purely imaginary when
    odd — exactly the image of a real-coefficient Pauli string (its Y
    count IS popcount(x & z), and compilation folds in i^{#Y})."""
    if float(getattr(gham, "c_im", 0.0)) != 0.0:
        return False
    if np.asarray(gham.a_diag_im).any():     # x = 0 -> even parity
        return False
    x = np.asarray(gham.x, np.int64)
    if not len(x):
        return True
    z = np.asarray(gham.z, np.int64)
    par = (_popcount_arr(x[:, None] & z) & 1).astype(bool)
    a_re = np.asarray(gham.a_re)
    a_im = np.asarray(gham.a_im)
    return bool(np.all(np.where(par, a_re == 0.0, a_im == 0.0)))


def _popcount_arr(v):
    v = np.asarray(v, np.int64)
    out = np.zeros_like(v)
    while np.any(v):
        out += v & 1
        v >>= 1
    return out


def _exp_mm_limbs(default: int = 3) -> int:
    """bf16-limb depth for the SCALAR-producing permutation matmuls
    (expectation / pool-overlap screens; states always evolve through the
    bitwise-x3 rotation/adjoint kernels).  3 = bitwise f32; 2 trades
    ~2^-17 relative element error for 14% less wall time — measured 9e-10
    absolute on a 24q molecular <H>, invisible in a summed scalar.
    PUBLIC kernels default to bitwise (3) so parity-sensitive callers
    never need env knowledge; the in-package energy-only builders opt
    into 2 explicitly.  OVQE_EXP_MM=bf16x3|bf16x2 forces either globally."""
    env = _os.environ.get("OVQE_EXP_MM", "")
    if env == "bf16x3":
        return 3
    if env == "bf16x2":
        return 2
    if env:
        raise ValueError(f"OVQE_EXP_MM must be bf16x3|bf16x2, got {env}")
    return default


def _split_limbs(x, limbs: int = 3):
    """f32 -> bf16 limbs by BITMASK truncation (the textbook ``x - bf16(x)``
    split miscompiles on this backend — see statevector._split_bf16)."""
    parts = []
    r = x
    for _ in range(limbs - 1):
        ri = pltpu.bitcast(r, jnp.uint32)
        h = pltpu.bitcast(ri & np.uint32(0xFFFF0000), jnp.float32)
        parts.append(h.astype(jnp.bfloat16))
        r = r - h
    parts.append(r.astype(jnp.bfloat16))
    return parts


from .pallas_kernels import _perm_kernel_matrix as _perm_matrix


def _start(dmas):
    for d in dmas:
        d.start()


def _wait(dmas):
    for d in dmas:
        d.wait()


def _pad_group8(arrs):
    """Pad the group axis of every array to a multiple of 8 with inert
    groups (zero n_outer / zero coefficients)."""
    G0 = len(arrs[0])
    pad = (8 - G0 % 8) % 8
    if not pad:
        return [jnp.asarray(a) for a in arrs]
    return [jnp.pad(jnp.asarray(a), [(0, pad)] + [(0, 0)] * (np.ndim(a) - 1))
            for a in arrs]


def _parity_sign(v):
    """(1 - 2*parity(v)) as f32 for i32 v (v < 2^30)."""
    p = v
    p = p ^ (p >> 16)
    p = p ^ (p >> 8)
    p = p ^ (p >> 4)
    p = p ^ (p >> 2)
    p = p ^ (p >> 1)
    return (1 - 2 * (p & 1)).astype(jnp.float32)


def _xor_roll(m, x_scalar, axis):
    """m[..., i ^ x, ...] along ``axis`` via roll+select chains — pure data
    movement, bitwise-exact.  Used only on the C-sized tile axis (a few
    bits); the 128-sized sublane/lane XORs are faster on the MXU.  Mosaic
    cannot branch vector values on a scalar, so the dynamic mask bit rides
    the elementwise select condition."""
    size = m.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, m.shape, axis)
    for b in range(size.bit_length() - 1):
        s = 1 << b
        bit_set = ((x_scalar >> b) & 1) != 0
        hi = jnp.logical_and(bit_set, (idx & s) != 0)
        lo = jnp.logical_and(bit_set, (idx & s) == 0)
        # i^s = i - s where bit b of i is set, i + s where clear
        m = jnp.where(hi, pltpu.roll(m, s, axis),
                      jnp.where(lo, pltpu.roll(m, size - s, axis), m))
    return m


class _GroupCtx:
    """Per-grid-step in-kernel context, built from the streamed (K,) rows:
    permutation matrices (sublane/lane XOR) and sign/weight field blocks."""

    def __init__(self, x_mid, x_lane, x_chunk, zr, zc, cre, cim=None):
        self.xc = x_chunk
        self.pmid = _perm_matrix(x_mid)
        self.plo = _perm_matrix(x_lane)
        # SM (128, K): sublane signs (row-layout z block broadcasts on K)
        si = jax.lax.broadcasted_iota(jnp.int32, (SUB, zc.shape[-1]), 0)
        self.SM = _parity_sign(si & ((zc >> 7) & (SUB - 1)))
        # WL (K, 128): lane signs * coefficients (column-layout blocks)
        li = jax.lax.broadcasted_iota(jnp.int32, (zr.shape[0], LANE), 1)
        lane_s = _parity_sign(li & (zr & (LANE - 1)))
        self.WLre = cre * lane_s
        self.WLim = None if cim is None else cim * lane_s
        self.zhi_row = (zc >> TILE_BITS)        # (1, K)

    def perm(self, X):
        """Partner content for chunk X (C, 128, 128): in-tile index XOR via
        two C-batched MXU matmuls, in-chunk tile XOR via roll chains.
        out[i] = Pmid @ X[i ^ x_chunk] @ Plo.

        bf16x3 mode splits X into limbs ONCE: a permutation of exact bf16
        values is still exactly bf16-representable, so the second stage
        permutes the PERMUTED limbs (lossless casts) instead of re-splitting
        the f32 intermediate — 6 bf16 MXU passes, bitwise-exact, half the
        VPU split traffic."""
        if _STREAM_PROBE == "noperm":
            return X
        if _STREAM_MM == "highest":
            U = _mm(X, self.pmid, ((1,), (0,)))
            V = _mm(U, self.plo, ((1,), (0,)))
            return _xor_roll(V, self.xc, 0)
        pmid16 = self.pmid.astype(jnp.bfloat16)
        plo16 = self.plo.astype(jnp.bfloat16)
        V = None
        for limb in _split_limbs(X):
            u = jax.lax.dot_general(limb, pmid16, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            v = jax.lax.dot_general(u.astype(jnp.bfloat16), plo16,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            V = v if V is None else V + v
        return _xor_roll(V, self.xc, 0)

    def field(self, W, h, C):
        """(C, 128, 128) sign/weight field for tiles h*C + [0..C):
        F[i] = SM @ (srow_i * W) as one C-batched MXU op."""
        if _STREAM_PROBE == "nofield":
            return jnp.ones((C, SUB, LANE), jnp.float32)
        ti = jax.lax.broadcasted_iota(jnp.int32, (C, self.zhi_row.shape[-1]),
                                      0) + h * C
        srow = _parity_sign(ti & self.zhi_row)          # (C, K)
        A2 = srow[:, None, :] * self.SM[None, :, :]     # (C, 128, K)
        return _mm(A2, self.WLre if W == "re" else self.WLim, ((2,), (0,)))


def _pair_index(i, xh, mb):
    """Outer-iteration -> chunk index: enumerate h with bit mb == 0 when
    pairing across chunks (xh > 0), identity otherwise."""
    i = jnp.asarray(i, jnp.int32)
    low = i & ((jnp.int32(1) << mb) - 1)
    paired = ((i >> mb) << (mb + 1)) | low
    return jax.lax.select(xh > 0, paired, i)


def _copy_chunk(src, dst, sem):
    d = pltpu.make_async_copy(src, dst, sem)
    d.start()
    return d


def _dma_chunks(pairs, sems):
    """Start DMAs for [(src, dst), ...] and wait them all."""
    ds = [_copy_chunk(src, dst, sems.at[k]) for k, (src, dst) in
          enumerate(pairs)]
    for d in ds:
        d.wait()


def _resolve_interpret(interpret):
    """None -> interpret on CPU (tests), compiled on TPU."""
    if interpret is None:
        return jax.default_backend() == "cpu"
    return interpret


# -------------------------------------------------------- rotation sweep
#
# Double-buffered pipeline: in-DMAs for chunk-pair i+1 start while pair i
# computes; out-DMAs overlap the next pair's compute (the slot's previous
# write-back is waited before its staging buffer is reused).  Pairs within
# a group are disjoint tiles, so overlapping reads/writes never alias; all
# writes are waited before the grid step ends (group g+1 reads everything).

def _rot_stream_kernel(fmode, xh_ref, mb_ref, nout_ref, xc_ref, xm_ref,
                       xl_ref, ang_ref, zr_ref, zc_ref, cre_ref, psi_in_ref,
                       psi_ref, bufA, bufB, outA, outB, sin, sout):
    g = pl.program_id(0)
    xh = xh_ref[g]
    mb = mb_ref[g]
    nout = nout_ref[g]
    ang = ang_ref[g]
    ctx = _GroupCtx(xm_ref[g], xl_ref[g], xc_ref[g], zr_ref[0], zc_ref[0],
                    cre_ref[0])
    C = bufA.shape[2]

    def in_dmas(i, side):
        slot = i & 1
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        if side == "a":
            return [pltpu.make_async_copy(psi_ref.at[p, pl.ds(h * C, C)],
                                          bufA.at[slot, p], sin.at[slot, p])
                    for p in (0, 1)]
        return [pltpu.make_async_copy(psi_ref.at[p, pl.ds(hh * C, C)],
                                      bufB.at[slot, p], sin.at[slot, 2 + p])
                for p in (0, 1)]

    def out_dmas(i, side):
        slot = i & 1
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        if side == "a":
            return [pltpu.make_async_copy(outA.at[slot, p],
                                          psi_ref.at[p, pl.ds(h * C, C)],
                                          sout.at[slot, p])
                    for p in (0, 1)]
        return [pltpu.make_async_copy(outB.at[slot, p],
                                      psi_ref.at[p, pl.ds(hh * C, C)],
                                      sout.at[slot, 2 + p])
                for p in (0, 1)]

    def rot_chunk(dst, src, partner, h):
        """dst <- cos(B) src + sin(B) roll_xc(perm(partner)) per plane."""
        if _STREAM_PROBE == "copyonly":        # DMA+loop floor (timing only)
            dst[0] = src[0]
            dst[1] = src[1]
            return
        F = ctx.field("re", h, C)
        c, s = rot_cos_sin(ang, F, fmode)
        dst[0] = c * src[0] + s * ctx.perm(partner[0])
        dst[1] = c * src[1] + s * ctx.perm(partner[1])

    @pl.when(nout > 0)
    def _():
        _start(in_dmas(0, "a"))

        @pl.when(xh > 0)
        def _():
            _start(in_dmas(0, "b"))

    def outer(i, _):
        slot = i & 1
        h = _pair_index(i, xh, mb)

        @pl.when(i + 1 < nout)
        def _():
            _start(in_dmas(i + 1, "a"))

            @pl.when(xh > 0)
            def _():
                _start(in_dmas(i + 1, "b"))

        _wait(in_dmas(i, "a"))

        # the slot's previous write-back must land before staging is reused
        @pl.when(i >= 2)
        def _():
            _wait(out_dmas(i - 2, "a"))

            @pl.when(xh > 0)
            def _():
                _wait(out_dmas(i - 2, "b"))

        @pl.when(xh > 0)
        def _():
            _wait(in_dmas(i, "b"))
            rot_chunk(outA.at[slot], bufA.at[slot], bufB.at[slot], h)
            rot_chunk(outB.at[slot], bufB.at[slot], bufA.at[slot], h ^ xh)
            _start(out_dmas(i, "a"))
            _start(out_dmas(i, "b"))

        @pl.when(xh == 0)
        def _():
            rot_chunk(outA.at[slot], bufA.at[slot], bufA.at[slot], h)
            _start(out_dmas(i, "a"))

        return 0

    jax.lax.fori_loop(0, nout, outer, 0)

    def drain(i, _):
        _wait(out_dmas(i, "a"))

        @pl.when(xh > 0)
        def _():
            _wait(out_dmas(i, "b"))

        return 0

    jax.lax.fori_loop(jnp.maximum(nout - 2, 0), nout, drain, 0)


def apply_grouped_ops_stream(psi, theta, x_huge, mb, n_outer, x_chunk, x_mid,
                             x_lane, op, z_r, z_c, cre,
                             interpret: Optional[bool] = None,
                             chunk_bits: int = CHUNK_BITS, fmode: int = 0):
    """Whole-ansatz rotation sweep, state streamed from HBM; psi (2, 2^n)
    f32 -> (2, 2^n) f32 (updated in place via aliasing)."""
    N = psi.shape[-1]
    T = N >> TILE_BITS
    psi4 = jnp.asarray(psi, jnp.float32).reshape(2, T, SUB, LANE)
    out = apply_grouped_ops_stream4(psi4, theta, x_huge, mb, n_outer,
                                    x_chunk, x_mid, x_lane, op, z_r, z_c,
                                    cre, interpret=interpret,
                                    chunk_bits=chunk_bits, fmode=fmode)
    return out.reshape(2, N)


def apply_grouped_ops_stream4(psi4, theta, x_huge, mb, n_outer, x_chunk,
                              x_mid, x_lane, op, z_r, z_c, cre,
                              interpret: Optional[bool] = None,
                              chunk_bits: int = CHUNK_BITS, fmode: int = 0):
    """Rotation sweep on the TILED state view (2, T, 128, 128) with no
    reshape at the jit boundary.  At 30 qubits the 2D wrapper's
    reshape-bitcasts around the donated+aliased pallas pair made XLA's
    buffer assignment materialize a DEFENSIVE full-state copy (an 8 GB HLO
    temp on top of the 8 GB aliased argument — OOM on one v5e); keeping
    the pallas-native shape across the host loop lets the donated
    parameter feed the aliased operand directly."""
    interpret = _resolve_interpret(interpret)
    G, K = z_c.shape[0], z_c.shape[-1]
    C = 1 << chunk_bits
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
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),   # bufA (slots)
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),   # bufB
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),   # outA
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),   # outB
            pltpu.SemaphoreType.DMA((2, 4)),                 # in sems
            pltpu.SemaphoreType.DMA((2, 4)),                 # out sems
        ],
    )
    from functools import partial as _partial
    out = pl.pallas_call(
        _partial(_rot_stream_kernel, fmode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(psi4.shape, jnp.float32),
        input_output_aliases={10: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(x_huge), jnp.asarray(mb), jnp.asarray(n_outer),
      jnp.asarray(x_chunk), jnp.asarray(x_mid), jnp.asarray(x_lane), angles,
      jnp.asarray(z_r), jnp.asarray(z_c), jnp.asarray(cre), psi4)
    return out


# ----------------------------------------------------------- expectation

def _expect_stream_kernel(herm, xh_ref, mb_ref, nout_ref, xc_ref, xm_ref,
                          xl_ref, zr_ref, zc_ref, cre_ref, cim_ref, psi_ref,
                          out_ref, bufA, bufB, eacc, sin):
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    xh = xh_ref[g]
    mb = mb_ref[g]
    nout = nout_ref[g]
    ctx = _GroupCtx(xm_ref[g], xl_ref[g], xc_ref[g], zr_ref[0], zc_ref[0],
                    cre_ref[0], cim_ref[0])
    C = bufA.shape[2]
    eacc[0, 0] = jnp.float32(0.0)

    def in_dmas(i, side):
        slot = i & 1
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        if side == "a":
            return [pltpu.make_async_copy(psi_ref.at[p, pl.ds(h * C, C)],
                                          bufA.at[slot, p], sin.at[slot, p])
                    for p in (0, 1)]
        return [pltpu.make_async_copy(psi_ref.at[p, pl.ds(hh * C, C)],
                                      bufB.at[slot, p], sin.at[slot, 2 + p])
                for p in (0, 1)]

    def contrib(src, partner, h):
        """Ordered contribution of all C tiles of chunk ``src``:
        Wre . Re[conj(psi) psi_x] - Wim . Im[conj(psi) psi_x]."""
        pb0 = ctx.perm(partner[0])
        pb1 = ctx.perm(partner[1])
        Wre = ctx.field("re", h, C)
        Wim = ctx.field("im", h, C)
        return jnp.sum(Wre * (src[0] * pb0 + src[1] * pb1)
                       - Wim * (src[0] * pb1 - src[1] * pb0))

    @pl.when(nout > 0)
    def _():
        _start(in_dmas(0, "a"))

        @pl.when(xh > 0)
        def _():
            _start(in_dmas(0, "b"))

    def outer(i, _):
        slot = i & 1
        h = _pair_index(i, xh, mb)

        @pl.when(i + 1 < nout)
        def _():
            _start(in_dmas(i + 1, "a"))

            @pl.when(xh > 0)
            def _():
                _start(in_dmas(i + 1, "b"))

        _wait(in_dmas(i, "a"))

        @pl.when(xh > 0)
        def _():
            _wait(in_dmas(i, "b"))
            if herm:
                # bra == ket and the group is Hermitian (every row of a
                # compiled REAL Hamiltonian is: Y-phase folding makes
                # (cre + i cim) X^x Z^z self-adjoint), so the mirror
                # chunk's contribution equals this one exactly
                # (M(i^x, i) = conj M(i, i^x)): one contrib doubled —
                # halves the perm/field compute where this kernel is
                # compute-bound (attribution probe, 24q)
                eacc[0, 0] += 2.0 * contrib(bufA.at[slot], bufB.at[slot], h)
            else:
                eacc[0, 0] += (contrib(bufA.at[slot], bufB.at[slot], h)
                               + contrib(bufB.at[slot], bufA.at[slot],
                                         h ^ xh))

        @pl.when(xh == 0)
        def _():
            eacc[0, 0] += contrib(bufA.at[slot], bufA.at[slot], h)

        return 0

    jax.lax.fori_loop(0, nout, outer, 0)
    out_ref[0, 0] += eacc[0, 0]


def expectation_stream(psi, x_huge, mb, n_outer, x_chunk, x_mid, x_lane,
                       z_r, z_c, cre, cim, interpret: Optional[bool] = None,
                       chunk_bits: int = CHUNK_BITS, herm: bool = False):
    """Off-diagonal grouped <psi|H|psi> contribution, state streamed from
    HBM (diagonal + constant are cheap single XLA passes).  herm=True
    certifies every group Hermitian (true for any compiled REAL-coefficient
    Hamiltonian) and halves the cross-chunk compute."""
    N = psi.shape[-1]
    T = N >> TILE_BITS
    psi4 = jnp.asarray(psi, jnp.float32).reshape(2, T, SUB, LANE)
    return expectation_stream4(psi4, x_huge, mb, n_outer, x_chunk, x_mid,
                               x_lane, z_r, z_c, cre, cim,
                               interpret=interpret, chunk_bits=chunk_bits,
                               herm=herm)


def expectation_stream4(psi4, x_huge, mb, n_outer, x_chunk, x_mid, x_lane,
                        z_r, z_c, cre, cim,
                        interpret: Optional[bool] = None,
                        chunk_bits: int = CHUNK_BITS, herm: bool = False):
    """As expectation_stream on the TILED (2, T, 128, 128) state view —
    no boundary reshape (a layout-changing 8 GB copy at 30 qubits)."""
    interpret = _resolve_interpret(interpret)
    G, K = z_c.shape[0], z_c.shape[-1]
    C = 1 << chunk_bits

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
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    from functools import partial as _partial
    out = pl.pallas_call(
        _partial(_expect_stream_kernel, bool(herm)),
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
                       acc_ref, bufA, bufB, accA, accB, sin, sout):
    g = pl.program_id(0)
    xh = xh_ref[g]
    mb = mb_ref[g]
    nout = nout_ref[g]
    ctx = _GroupCtx(xm_ref[g], xl_ref[g], xc_ref[g], zr_ref[0], zc_ref[0],
                    cre_ref[0], cim_ref[0])
    C = bufA.shape[2]

    def in_dmas(i, side):
        slot = i & 1
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        if side == "a":
            return ([pltpu.make_async_copy(psi_ref.at[p, pl.ds(h * C, C)],
                                           bufA.at[slot, p], sin.at[slot, p])
                     for p in (0, 1)]
                    + [pltpu.make_async_copy(
                        acc_ref.at[p, pl.ds(h * C, C)],
                        accA.at[slot, p], sin.at[slot, 2 + p])
                       for p in (0, 1)])
        return ([pltpu.make_async_copy(psi_ref.at[p, pl.ds(hh * C, C)],
                                       bufB.at[slot, p], sin.at[slot, 4 + p])
                 for p in (0, 1)]
                + [pltpu.make_async_copy(acc_ref.at[p, pl.ds(hh * C, C)],
                                         accB.at[slot, p],
                                         sin.at[slot, 6 + p])
                   for p in (0, 1)])

    def out_dmas(i, side):
        slot = i & 1
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        if side == "a":
            return [pltpu.make_async_copy(accA.at[slot, p],
                                          acc_ref.at[p, pl.ds(h * C, C)],
                                          sout.at[slot, p])
                    for p in (0, 1)]
        return [pltpu.make_async_copy(accB.at[slot, p],
                                      acc_ref.at[p, pl.ds(hh * C, C)],
                                      sout.at[slot, 2 + p])
                for p in (0, 1)]

    def add(dst, partner, h):
        """dst += W(h-chunk tiles) (.) roll_xc(perm(partner)) (complex)."""
        pb0 = ctx.perm(partner[0])
        pb1 = ctx.perm(partner[1])
        Wre = ctx.field("re", h, C)
        Wim = ctx.field("im", h, C)
        dst[0] += Wre * pb0 - Wim * pb1
        dst[1] += Wre * pb1 + Wim * pb0

    @pl.when(nout > 0)
    def _():
        _start(in_dmas(0, "a"))

        @pl.when(xh > 0)
        def _():
            _start(in_dmas(0, "b"))

    def outer(i, _):
        slot = i & 1
        h = _pair_index(i, xh, mb)

        @pl.when(i + 1 < nout)
        def _():
            # the next in-DMA reloads the other slot's acc staging; its
            # previous write-back must have landed first
            @pl.when(i >= 1)
            def _():
                _wait(out_dmas(i - 1, "a"))

                @pl.when(xh > 0)
                def _():
                    _wait(out_dmas(i - 1, "b"))

            _start(in_dmas(i + 1, "a"))

            @pl.when(xh > 0)
            def _():
                _start(in_dmas(i + 1, "b"))

        _wait(in_dmas(i, "a"))

        @pl.when(xh > 0)
        def _():
            _wait(in_dmas(i, "b"))
            add(accA.at[slot], bufB.at[slot], h)
            add(accB.at[slot], bufA.at[slot], h ^ xh)
            _start(out_dmas(i, "a"))
            _start(out_dmas(i, "b"))

        @pl.when(xh == 0)
        def _():
            add(accA.at[slot], bufA.at[slot], h)
            _start(out_dmas(i, "a"))

        return 0

    jax.lax.fori_loop(0, nout, outer, 0)

    def drain(i, _):
        _wait(out_dmas(i, "a"))

        @pl.when(xh > 0)
        def _():
            _wait(out_dmas(i, "b"))

        return 0

    jax.lax.fori_loop(jnp.maximum(nout - 2, 0), nout, drain, 0)


def ham_apply_stream(psi, acc, x_huge, mb, n_outer, x_chunk, x_mid, x_lane,
                     z_r, z_c, cre, cim, interpret: Optional[bool] = None,
                     chunk_bits: int = CHUNK_BITS):
    """acc += (off-diagonal grouped H)|psi>, both streamed from HBM; acc is
    updated in place (pass the diagonal+const part, get the full H|psi>)."""
    interpret = _resolve_interpret(interpret)
    G, K = z_c.shape[0], z_c.shape[-1]
    N = psi.shape[-1]
    T = N >> TILE_BITS
    C = 1 << chunk_bits
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
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 8)),
            pltpu.SemaphoreType.DMA((2, 4)),
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


# ------------------------------------------- fused-residency rotation sweep
#
# Rotations must apply in group order, but a MAXIMAL CONSECUTIVE RUN of
# groups sharing one x_huge shares one chunk-pairing pattern: the pair
# (h, h ^ x_huge) stays VMEM-resident while every group in the run mixes
# amplitudes only within it (the pair dynamics is closed).  One HBM
# read+write per RUN instead of per group — at UCCSD orderings consecutive
# excitations often share their high orbitals, so runs are long exactly
# where the state is big.  In-place on the staging buffers (reads are SSA
# values before writes), which also halves VMEM vs the out-of-place
# per-group kernel.

ROT_BUCKET_CAP = 16
FUSED_CHUNK_BITS = 2     # C = 4: the fused kernels' staging + hoisted
                         # contexts must fit the 16 MB scoped-VMEM limit

# Which paths default to the residency-fused kernels.  Both sweeps are
# MXU-bound on the in-tile permutation chain (measured attribution:
# perm 65% / field 30% of the fused rotation kernel), NOT HBM-bound —
# removing ~93% of the DMA via fusion alone changed nothing.  What DID
# move the floor is the per-group STAGE dispatch inside the fused
# kernels (pl.when branches skip the identity mid/lane permutation
# matmuls — ~60% of UCCSD groups have one): measured on v5e at 24
# qubits on the real H12 UCCSD sequence (benchmarks/
# probe_rot_fused_real.py, probe_adj_fused_real.py), rotation
# 0.530 -> 0.439 ms/group (1.21x) and adjoint 0.911 -> 0.780 (1.17x),
# both bitwise-identical to the per-group kernels.  The per-group
# kernels can't stage-dispatch (their grid IS the group axis; Mosaic
# compiles every branch into each program anyway) so fused is now the
# seq default; OVQE_STREAM_FUSE=0 restores per-group.  The pool screen
# measured 1.02x fused (no stage dispatch there yet) and stays
# per-group.
_FUSE_DEFAULT = {"seq": True, "pool": False}


def _fuse_policy(path: str) -> bool:
    env = _os.environ.get("OVQE_STREAM_FUSE")
    if env is not None:
        return env != "0"
    return _FUSE_DEFAULT[path]


def build_seq_buckets(sd: StreamGroupData, gcap: int = ROT_BUCKET_CAP):
    """Bucket an ORDERED StreamGroupData into maximal consecutive
    equal-x_huge runs (cap gcap).  Returns (bxh, bmb, bnout, bop, bxc,
    bxm, bxl, bact, bzr, bzc, bcre) with a bucket axis; inert groups
    (n_outer == 0 padding) are dropped.  Order inside and across buckets
    preserves the input order exactly."""
    if sd.G == 0:
        return None
    keep = np.where(sd.n_outer > 0)[0]
    if len(keep) == 0:
        return None
    buckets: List = []
    cur: List[int] = []
    for g in keep:
        if cur and (sd.x_huge[g] != sd.x_huge[cur[-1]]
                    or len(cur) >= gcap):
            buckets.append(cur)
            cur = []
        cur.append(int(g))
    if cur:
        buckets.append(cur)
    B = len(buckets)
    K = sd.z_r.shape[1]
    bxh = np.zeros(B, np.int32)
    bmb = np.zeros(B, np.int32)
    bnout = np.zeros(B, np.int32)
    bop = np.zeros((B, gcap), np.int32)
    bxc = np.zeros((B, gcap), np.int32)
    bxm = np.zeros((B, gcap), np.int32)
    bxl = np.zeros((B, gcap), np.int32)
    bact = np.zeros((B, gcap), np.int32)
    bzr = np.zeros((B, gcap, K, 1), np.int32)
    bzc = np.zeros((B, gcap, 1, K), np.int32)
    bcre = np.zeros((B, gcap, K, 1), np.float32)
    for b, idx in enumerate(buckets):
        g0 = idx[0]
        bxh[b] = sd.x_huge[g0]
        bmb[b] = sd.mb[g0]
        bnout[b] = sd.n_outer[g0]
        m = len(idx)
        bop[b, :m] = sd.op[idx] if sd.op is not None else 0
        bxc[b, :m] = sd.x_chunk[idx]
        bxm[b, :m] = sd.x_mid[idx]
        bxl[b, :m] = sd.x_lane[idx]
        bact[b, :m] = 1
        bzr[b, :m] = sd.z_r[idx]
        bzc[b, :m] = sd.z_c[idx]
        bcre[b, :m] = sd.cre[idx]
    return (bxh, bmb, bnout, bop, bxc, bxm, bxl, bact, bzr, bzc, bcre)


def _hoist_ctx(b, Gcap, xm_ref, xl_ref, zr_ref, zc_ref, cre_ref,
               pmidS, ploS, smS, wlS, zhiS, cim_ref=None, wlimS=None):
    """Once-per-bucket prologue: build every group's permutation matrices
    and sign/weight blocks into VMEM scratch (the naive per-(pair, group)
    rebuild made the fused kernels compute-bound — measured 0.53x vs the
    per-group kernel before hoisting)."""
    def body(g2, _):
        # {0,1} entries are exactly bf16-representable: half the scratch
        pmidS[g2] = _perm_matrix(xm_ref[b, g2]).astype(pmidS.dtype)
        ploS[g2] = _perm_matrix(xl_ref[b, g2]).astype(ploS.dtype)
        zc = zc_ref[0, g2]
        zr = zr_ref[0, g2]
        si = jax.lax.broadcasted_iota(jnp.int32, (SUB, zc.shape[-1]), 0)
        smS[g2] = _parity_sign(si & ((zc >> 7) & (SUB - 1)))
        li = jax.lax.broadcasted_iota(jnp.int32, (zr.shape[0], LANE), 1)
        lane_s = _parity_sign(li & (zr & (LANE - 1)))
        wlS[g2] = cre_ref[0, g2] * lane_s
        if wlimS is not None:
            wlimS[g2] = cim_ref[0, g2] * lane_s
        zhiS[g2] = (zc >> TILE_BITS)
        return 0

    jax.lax.fori_loop(0, Gcap, body, 0)


def _field_from(smS, wlS, zhiS, g2, h, C):
    """(C, SUB, LANE) weight field for tiles h*C + [0..C) from the hoisted
    per-group blocks."""
    if _STREAM_PROBE == "nofield":      # attribution probe (timing only)
        return jnp.ones((C, SUB, LANE), jnp.float32)
    zhi = zhiS[g2]                                   # (1, K)
    ti = jax.lax.broadcasted_iota(jnp.int32, (C, zhi.shape[-1]), 0) + h * C
    srow = _parity_sign(ti & zhi)                    # (C, K)
    A2 = srow[:, None, :] * smS[g2][None, :, :]      # (C, SUB, K)
    return _mm(A2, wlS[g2], ((2,), (0,)))


def _perm_batched(X, pmid, plo, xc, stages: str = "lm", limbs: int = 3):
    """Batched in-tile permutation: X (S, C, SUB, LANE) with S = planes x
    sides — one MXU stream per limb/stage instead of per-plane calls
    (bf16x3 exact-limb or HIGHEST, as the per-group kernels); the in-chunk
    tile XOR rolls within each C block.

    ``stages`` statically names the matmul stages actually applied ("m" =
    sublane/pmid, "l" = lane/plo): a group whose x has no sublane (or no
    lane) bits carries an identity matrix there, and ~60% of molecular-H
    groups need at most one stage — the order-free builders partition
    groups by stage class so each class's kernel pays only the matmuls it
    needs (the bucketed kernels are MXU-bound on exactly this chain)."""
    if _STREAM_PROBE == "noperm":       # attribution probe (timing only)
        return X
    do_m = "m" in stages
    do_l = "l" in stages
    if not (do_m or do_l):
        return _xor_roll(X, xc, 1)
    # each contraction of axis 2 rotates the trailing (SUB, LANE) pair, so
    # the two-stage chain restores the order by itself; single-stage
    # variants must contract the RIGHT axis ("l": axis 3 directly) or
    # restore it ("m": axis 2 then one f32 transpose after limb summation)
    if _STREAM_MM == "highest":
        if do_m and do_l:
            U = _mm(X, pmid.astype(jnp.float32), ((2,), (0,)))
            V = _mm(U, plo.astype(jnp.float32), ((2,), (0,)))
        elif do_l:
            V = _mm(X, plo.astype(jnp.float32), ((3,), (0,)))
        else:
            V = jnp.swapaxes(_mm(X, pmid.astype(jnp.float32),
                                 ((2,), (0,))), 2, 3)
        return _xor_roll(V, xc, 1)
    pmid16 = pmid.astype(jnp.bfloat16)
    plo16 = plo.astype(jnp.bfloat16)
    V = None
    for limb in _split_limbs(X, limbs):
        if do_m and do_l:
            u = jax.lax.dot_general(limb, pmid16, (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            v = jax.lax.dot_general(u.astype(jnp.bfloat16), plo16,
                                    (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        elif do_l:
            v = jax.lax.dot_general(limb, plo16, (((3,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        else:
            v = jax.lax.dot_general(limb, pmid16, (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        V = v if V is None else V + v
    if do_m and not do_l:
        V = jnp.swapaxes(V, 2, 3)
    return _xor_roll(V, xc, 1)


def _rot_fused_kernel(fmode, xh_ref, mb_ref, nout_ref, ang_ref, xc_ref, xm_ref,
                      xl_ref, act_ref, zr_ref, zc_ref, cre_ref, psi_in_ref,
                      psi_ref, bufA, bufB, pmidS, ploS, smS, wlS, zhiS,
                      sin, sout):
    b = pl.program_id(0)
    xh = xh_ref[b]
    mb = mb_ref[b]
    nout = nout_ref[b]
    C = bufA.shape[2]
    Gcap = act_ref.shape[1]
    _hoist_ctx(b, Gcap, xm_ref, xl_ref, zr_ref, zc_ref, cre_ref,
               pmidS, ploS, smS, wlS, zhiS)

    def in_dmas(i, side):
        slot = i & 1
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        if side == "a":
            return [pltpu.make_async_copy(psi_ref.at[p, pl.ds(h * C, C)],
                                          bufA.at[slot, p], sin.at[slot, p])
                    for p in (0, 1)]
        return [pltpu.make_async_copy(psi_ref.at[p, pl.ds(hh * C, C)],
                                      bufB.at[slot, p], sin.at[slot, 2 + p])
                for p in (0, 1)]

    def out_dmas(i, side):
        slot = i & 1
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        if side == "a":
            return [pltpu.make_async_copy(bufA.at[slot, p],
                                          psi_ref.at[p, pl.ds(h * C, C)],
                                          sout.at[slot, p])
                    for p in (0, 1)]
        return [pltpu.make_async_copy(bufB.at[slot, p],
                                      psi_ref.at[p, pl.ds(hh * C, C)],
                                      sout.at[slot, 2 + p])
                for p in (0, 1)]

    @pl.when(nout > 0)
    def _():
        _start(in_dmas(0, "a"))

        @pl.when(xh > 0)
        def _():
            _start(in_dmas(0, "b"))

    def outer(i, _):
        slot = i & 1
        h = _pair_index(i, xh, mb)

        @pl.when(i + 1 < nout)
        def _():
            # the next in-DMA reloads the other slot; its write-back from
            # iteration i-1 must have landed first
            @pl.when(i >= 1)
            def _():
                _wait(out_dmas(i - 1, "a"))

                @pl.when(xh > 0)
                def _():
                    _wait(out_dmas(i - 1, "b"))

            _start(in_dmas(i + 1, "a"))

            @pl.when(xh > 0)
            def _():
                _start(in_dmas(i + 1, "b"))

        _wait(in_dmas(i, "a"))

        @pl.when(xh > 0)
        def _():
            _wait(in_dmas(i, "b"))

        A = bufA.at[slot]
        Bb = bufB.at[slot]

        def group_body(g2, _):
            @pl.when(act_ref[b, g2] != 0)
            def _():
                ang = ang_ref[b, g2]
                xc = xc_ref[b, g2]
                pmid = pmidS[g2]
                plo = ploS[g2]
                xm_nz = xm_ref[b, g2] != 0
                xl_nz = xl_ref[b, g2] != 0

                # per-group STAGE dispatch: the rotation order is fixed
                # (groups do not commute) so the builder cannot class-sort
                # like the Hamiltonian paths — instead branch per group on
                # which in-tile permutation halves are live (~60% of
                # UCCSD groups have an identity in one; the perm chain is
                # 65% of this kernel's measured time)
                for stages_, cond in (
                        ("lm", jnp.logical_and(xm_nz, xl_nz)),
                        ("l", jnp.logical_and(~xm_nz, xl_nz)),
                        ("m", jnp.logical_and(xm_nz, ~xl_nz)),
                        ("", jnp.logical_and(~xm_nz, ~xl_nz))):
                    @pl.when(jnp.logical_and(cond, xh > 0))
                    def _(stages_=stages_):
                        Fa = _field_from(smS, wlS, zhiS, g2, h, C)
                        Fb = _field_from(smS, wlS, zhiS, g2, h ^ xh, C)
                        X = jnp.stack([A[0], A[1], Bb[0], Bb[1]])
                        P = _perm_batched(X, pmid, plo, xc, stages_)
                        ca, sa = rot_cos_sin(ang, Fa, fmode)
                        cb, sb = rot_cos_sin(ang, Fb, fmode)
                        A[0] = ca * A[0] + sa * P[2]
                        A[1] = ca * A[1] + sa * P[3]
                        Bb[0] = cb * Bb[0] + sb * P[0]
                        Bb[1] = cb * Bb[1] + sb * P[1]

                    @pl.when(jnp.logical_and(cond, xh == 0))
                    def _(stages_=stages_):
                        Fa = _field_from(smS, wlS, zhiS, g2, h, C)
                        X = jnp.stack([A[0], A[1]])
                        P = _perm_batched(X, pmid, plo, xc, stages_)
                        ca, sa = rot_cos_sin(ang, Fa, fmode)
                        A[0] = ca * A[0] + sa * P[0]
                        A[1] = ca * A[1] + sa * P[1]

            return 0

        jax.lax.fori_loop(0, Gcap, group_body, 0)

        _start(out_dmas(i, "a"))

        @pl.when(xh > 0)
        def _():
            _start(out_dmas(i, "b"))

        return 0

    jax.lax.fori_loop(0, nout, outer, 0)

    def drain(i, _):
        _wait(out_dmas(i, "a"))

        @pl.when(xh > 0)
        def _():
            _wait(out_dmas(i, "b"))

        return 0

    jax.lax.fori_loop(jnp.maximum(nout - 2, 0), nout, drain, 0)


def apply_grouped_ops_fused(psi, theta, bxh, bmb, bnout, bop, bxc, bxm,
                            bxl, bact, bzr, bzc, bcre,
                            interpret: Optional[bool] = None,
                            chunk_bits: int = FUSED_CHUNK_BITS,
                            fmode: int = 0):
    """Whole-ansatz rotation sweep with consecutive equal-x_huge groups
    fused into one chunk-pair residency per bucket; psi (2, 2^n)."""
    N = psi.shape[-1]
    T = N >> TILE_BITS
    psi4 = jnp.asarray(psi, jnp.float32).reshape(2, T, SUB, LANE)
    out = apply_grouped_ops_fused4(psi4, theta, bxh, bmb, bnout, bop, bxc,
                                   bxm, bxl, bact, bzr, bzc, bcre,
                                   interpret=interpret,
                                   chunk_bits=chunk_bits, fmode=fmode)
    return out.reshape(2, N)


def apply_grouped_ops_fused4(psi4, theta, bxh, bmb, bnout, bop, bxc, bxm,
                             bxl, bact, bzr, bzc, bcre,
                             interpret: Optional[bool] = None,
                             chunk_bits: int = FUSED_CHUNK_BITS,
                             fmode: int = 0):
    """Fused rotation sweep on the TILED state view (2, T, 128, 128) with
    no reshape at the jit boundary — same rationale as
    apply_grouped_ops_stream4: at 30 qubits the reshape-bitcasts around
    the donated+aliased pallas pair make XLA materialize a defensive
    full-state (8 GB) temp, which OOMs one chip."""
    interpret = _resolve_interpret(interpret)
    B, Gcap, K = bzc.shape[0], bzc.shape[1], bzc.shape[-1]
    C = 1 << chunk_bits
    ang = -jnp.asarray(theta, jnp.float32)[jnp.asarray(bop)] \
        * jnp.asarray(bact, jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Gcap, K, 1), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gcap, 1, K), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gcap, K, 1), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # psi (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),   # bufA (slots)
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),   # bufB
            pltpu.VMEM((Gcap, SUB, SUB), jnp.bfloat16),      # pmidS
            pltpu.VMEM((Gcap, LANE, LANE), jnp.bfloat16),    # ploS
            pltpu.VMEM((Gcap, SUB, K), jnp.float32),         # smS
            pltpu.VMEM((Gcap, K, LANE), jnp.float32),        # wlS
            pltpu.VMEM((Gcap, 1, K), jnp.int32),             # zhiS
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    from functools import partial as _partial
    out = pl.pallas_call(
        _partial(_rot_fused_kernel, fmode),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(psi4.shape, jnp.float32),
        input_output_aliases={11: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(bxh), jnp.asarray(bmb), jnp.asarray(bnout), ang,
      jnp.asarray(bxc), jnp.asarray(bxm), jnp.asarray(bxl),
      jnp.asarray(bact), jnp.asarray(bzr), jnp.asarray(bzc),
      jnp.asarray(bcre), psi4)
    return out


# ------------------------------------------- fused-residency adjoint sweep
#
# Same residency fusion for the reversible adjoint: p and l pairs stay
# resident while a (reversed) run of equal-x_huge groups un-rotates them.
# In-place staging halves VMEM vs the per-group adjoint, which lets the
# adjoint run at the full CHUNK_BITS chunk size (the per-group kernel was
# VMEM-bound at ADJ_CHUNK_BITS) — attacking both round-2 weaknesses #2/#3.
# Per-group gradient entries accumulate in the (Gcap, LANE) output block
# (rows indexed dynamically; padded rows stay zero).

def _adj_fused_kernel(fmode, xh_ref, mb_ref, nout_ref, ang_ref, xc_ref, xm_ref,
                      xl_ref, act_ref, zr_ref, zc_ref, cre_ref, p_in_ref,
                      l_in_ref, p_ref, l_ref, gt_ref, bufPA, bufPB, bufLA,
                      bufLB, pmidS, ploS, smS, wlS, zhiS, sin, sout):
    b = pl.program_id(0)
    xh = xh_ref[b]
    mb = mb_ref[b]
    nout = nout_ref[b]
    C = bufPA.shape[2]
    Gcap = act_ref.shape[1]
    _hoist_ctx(b, Gcap, xm_ref, xl_ref, zr_ref, zc_ref, cre_ref,
               pmidS, ploS, smS, wlS, zhiS)

    gt_ref[...] = jnp.zeros(gt_ref.shape, jnp.float32)

    def in_dmas(i, side):
        slot = i & 1
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        if side == "a":
            return ([pltpu.make_async_copy(p_ref.at[p, pl.ds(h * C, C)],
                                           bufPA.at[slot, p],
                                           sin.at[slot, p])
                     for p in (0, 1)]
                    + [pltpu.make_async_copy(
                        l_ref.at[p, pl.ds(h * C, C)],
                        bufLA.at[slot, p], sin.at[slot, 2 + p])
                       for p in (0, 1)])
        return ([pltpu.make_async_copy(p_ref.at[p, pl.ds(hh * C, C)],
                                       bufPB.at[slot, p], sin.at[slot, 4 + p])
                 for p in (0, 1)]
                + [pltpu.make_async_copy(l_ref.at[p, pl.ds(hh * C, C)],
                                         bufLB.at[slot, p],
                                         sin.at[slot, 6 + p])
                   for p in (0, 1)])

    def out_dmas(i, side):
        slot = i & 1
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        if side == "a":
            return ([pltpu.make_async_copy(bufPA.at[slot, p],
                                           p_ref.at[p, pl.ds(h * C, C)],
                                           sout.at[slot, p])
                     for p in (0, 1)]
                    + [pltpu.make_async_copy(
                        bufLA.at[slot, p], l_ref.at[p, pl.ds(h * C, C)],
                        sout.at[slot, 2 + p]) for p in (0, 1)])
        return ([pltpu.make_async_copy(bufPB.at[slot, p],
                                       p_ref.at[p, pl.ds(hh * C, C)],
                                       sout.at[slot, 4 + p])
                 for p in (0, 1)]
                + [pltpu.make_async_copy(bufLB.at[slot, p],
                                         l_ref.at[p, pl.ds(hh * C, C)],
                                         sout.at[slot, 6 + p])
                   for p in (0, 1)])

    @pl.when(nout > 0)
    def _():
        _start(in_dmas(0, "a"))

        @pl.when(xh > 0)
        def _():
            _start(in_dmas(0, "b"))

    def outer(i, _):
        slot = i & 1
        h = _pair_index(i, xh, mb)

        @pl.when(i + 1 < nout)
        def _():
            @pl.when(i >= 1)
            def _():
                _wait(out_dmas(i - 1, "a"))

                @pl.when(xh > 0)
                def _():
                    _wait(out_dmas(i - 1, "b"))

            _start(in_dmas(i + 1, "a"))

            @pl.when(xh > 0)
            def _():
                _start(in_dmas(i + 1, "b"))

        _wait(in_dmas(i, "a"))

        @pl.when(xh > 0)
        def _():
            _wait(in_dmas(i, "b"))

        PA = bufPA.at[slot]
        PB = bufPB.at[slot]
        LA = bufLA.at[slot]
        LB = bufLB.at[slot]

        def group_body(g2, _):
            @pl.when(act_ref[b, g2] != 0)
            def _():
                ang = ang_ref[b, g2]
                xc = xc_ref[b, g2]
                pmid = pmidS[g2]
                plo = ploS[g2]
                xm_nz = xm_ref[b, g2] != 0
                xl_nz = xl_ref[b, g2] != 0

                # per-group STAGE dispatch (see _rot_fused_kernel): skip
                # the identity permutation matmul stages
                for stages_, cond in (
                        ("lm", jnp.logical_and(xm_nz, xl_nz)),
                        ("l", jnp.logical_and(~xm_nz, xl_nz)),
                        ("m", jnp.logical_and(xm_nz, ~xl_nz)),
                        ("", jnp.logical_and(~xm_nz, ~xl_nz))):
                    @pl.when(jnp.logical_and(cond, xh > 0))
                    def _(stages_=stages_):
                        pha = _field_from(smS, wlS, zhiS, g2, h, C)
                        phb = _field_from(smS, wlS, zhiS, g2, h ^ xh, C)
                        X = jnp.stack([PA[0], PA[1], PB[0], PB[1],
                                       LA[0], LA[1], LB[0], LB[1]])
                        P = _perm_batched(X, pmid, plo, xc, stages_)
                        gt = -2.0 * (jnp.sum(pha * (LA[0] * P[2]
                                                    + LA[1] * P[3]))
                                     + jnp.sum(phb * (LB[0] * P[0]
                                                      + LB[1] * P[1])))
                        ca, sa = rot_cos_sin(ang, pha, fmode)
                        cb, sb = rot_cos_sin(ang, phb, fmode)
                        PA[0] = ca * PA[0] - sa * P[2]
                        PA[1] = ca * PA[1] - sa * P[3]
                        PB[0] = cb * PB[0] - sb * P[0]
                        PB[1] = cb * PB[1] - sb * P[1]
                        LA[0] = ca * LA[0] - sa * P[6]
                        LA[1] = ca * LA[1] - sa * P[7]
                        LB[0] = cb * LB[0] - sb * P[4]
                        LB[1] = cb * LB[1] - sb * P[5]
                        gt_ref[0, g2, :] += jnp.broadcast_to(gt, (LANE,))

                    @pl.when(jnp.logical_and(cond, xh == 0))
                    def _(stages_=stages_):
                        pha = _field_from(smS, wlS, zhiS, g2, h, C)
                        X = jnp.stack([PA[0], PA[1], LA[0], LA[1]])
                        P = _perm_batched(X, pmid, plo, xc, stages_)
                        gt = -2.0 * jnp.sum(pha * (LA[0] * P[0]
                                                   + LA[1] * P[1]))
                        ca, sa = rot_cos_sin(ang, pha, fmode)
                        PA[0] = ca * PA[0] - sa * P[0]
                        PA[1] = ca * PA[1] - sa * P[1]
                        LA[0] = ca * LA[0] - sa * P[2]
                        LA[1] = ca * LA[1] - sa * P[3]
                        gt_ref[0, g2, :] += jnp.broadcast_to(gt, (LANE,))

            return 0

        jax.lax.fori_loop(0, Gcap, group_body, 0)

        _start(out_dmas(i, "a"))

        @pl.when(xh > 0)
        def _():
            _start(out_dmas(i, "b"))

        return 0

    jax.lax.fori_loop(0, nout, outer, 0)

    def drain(i, _):
        _wait(out_dmas(i, "a"))

        @pl.when(xh > 0)
        def _():
            _wait(out_dmas(i, "b"))

        return 0

    jax.lax.fori_loop(jnp.maximum(nout - 2, 0), nout, drain, 0)


def adjoint_sweep_fused(p, lam, theta, bxh, bmb, bnout, bop, bxc, bxm, bxl,
                        bact, bzr, bzc, bcre,
                        interpret: Optional[bool] = None,
                        chunk_bits: int = FUSED_CHUNK_BITS,
                        fmode: int = 0):
    """Reversible adjoint with residency fusion; bucket arrays must be in
    REVERSED group order.  Returns (p_prev, lam_prev, per-(bucket, slot)
    gradient rows (B, Gcap))."""
    interpret = _resolve_interpret(interpret)
    B, Gcap, K = bzc.shape[0], bzc.shape[1], bzc.shape[-1]
    N = p.shape[-1]
    T = N >> TILE_BITS
    C = 1 << chunk_bits
    p4 = jnp.asarray(p, jnp.float32).reshape(2, T, SUB, LANE)
    l4 = jnp.asarray(lam, jnp.float32).reshape(2, T, SUB, LANE)
    ang = -jnp.asarray(theta, jnp.float32)[jnp.asarray(bop)] \
        * jnp.asarray(bact, jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Gcap, K, 1), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gcap, 1, K), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gcap, K, 1), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # p
            pl.BlockSpec(memory_space=pl.ANY),        # l
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, Gcap, LANE), lambda b, *r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=(
            [pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32)
             for _ in range(4)]                    # P/L x A/B staging
            + [pltpu.VMEM((Gcap, SUB, SUB), jnp.bfloat16),   # pmidS
               pltpu.VMEM((Gcap, LANE, LANE), jnp.bfloat16), # ploS
               pltpu.VMEM((Gcap, SUB, K), jnp.float32),      # smS
               pltpu.VMEM((Gcap, K, LANE), jnp.float32),     # wlS
               pltpu.VMEM((Gcap, 1, K), jnp.int32),          # zhiS
               pltpu.SemaphoreType.DMA((2, 8)),
               pltpu.SemaphoreType.DMA((2, 8))]),
    )
    from functools import partial as _partial
    p_out, l_out, gts = pl.pallas_call(
        _partial(_adj_fused_kernel, fmode),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(p4.shape, jnp.float32),
                   jax.ShapeDtypeStruct(l4.shape, jnp.float32),
                   jax.ShapeDtypeStruct((B, Gcap, LANE), jnp.float32)),
        input_output_aliases={11: 0, 12: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(bxh), jnp.asarray(bmb), jnp.asarray(bnout), ang,
      jnp.asarray(bxc), jnp.asarray(bxm), jnp.asarray(bxl),
      jnp.asarray(bact), jnp.asarray(bzr), jnp.asarray(bzc),
      jnp.asarray(bcre), p4, l4)
    return p_out.reshape(2, N), l_out.reshape(2, N), gts[:, :, 0]


# ------------------------------------------------ bucketed H |psi> kernel
#
# H terms are order-free, so groups sharing the same x_huge (the HBM
# chunk-pairing pattern) can share ONE pass over the state: psi and acc
# chunks are DMA'd once per BUCKET and every group in the bucket applies
# its own in-tile permutation and weight field to the resident chunks.
# At 24 qubits this removes ~90% of the H pass's DMA traffic (2766 groups
# collapse to ~200 bucket passes).

HAM_BUCKET_CAP = 16       # groups per bucket (padded; inert groups skipped)


def build_ham_buckets(gham, gcap: int = HAM_BUCKET_CAP,
                      chunk_bits: int = CHUNK_BITS,
                      z_extra: Optional[np.ndarray] = None):
    """Bucket the off-diagonal Hamiltonian groups by x_huge.  Returns
    (prefetch..., streamed...) arrays with a bucket axis: scalars
    (B,)/(B, gcap) and blocks (B, gcap, K, 1)/(B, gcap, 1, K).

    ``z_extra`` (G, Ke) int32 rows ride the same bucketing and are appended
    as a (B, gcap, K, 1) trailing element — the sharded engine passes the
    device-part z masks through so per-device coordinate signs can be
    folded into the coefficients (parallel/sharded_stream.py)."""
    sd = stream_ham_data(gham, chunk_bits=chunk_bits)
    if sd.G == 0:
        return None
    order = np.argsort(sd.x_huge, kind="stable")
    buckets = []
    i = 0
    while i < len(order):
        xh = sd.x_huge[order[i]]
        j = i
        while j < len(order) and sd.x_huge[order[j]] == xh \
                and j - i < gcap:
            j += 1
        buckets.append(order[i:j])
        i = j
    B = len(buckets)
    K = sd.z_r.shape[1]
    bxh = np.zeros(B, np.int32)
    bmb = np.zeros(B, np.int32)
    bnout = np.zeros(B, np.int32)
    bxc = np.zeros((B, gcap), np.int32)
    bxm = np.zeros((B, gcap), np.int32)
    bxl = np.zeros((B, gcap), np.int32)
    bact = np.zeros((B, gcap), np.int32)
    bzr = np.zeros((B, gcap, K, 1), np.int32)
    bzc = np.zeros((B, gcap, 1, K), np.int32)
    bcre = np.zeros((B, gcap, K, 1), np.float32)
    bcim = np.zeros((B, gcap, K, 1), np.float32)
    cim = sd.cim if sd.cim is not None else np.zeros_like(sd.cre)
    bze = None
    if z_extra is not None:
        ze = np.zeros((sd.G, K), np.int32)
        ze[:, : z_extra.shape[1]] = z_extra
        bze = np.zeros((B, gcap, K, 1), np.int32)
    for b, idx in enumerate(buckets):
        g0 = idx[0]
        bxh[b] = sd.x_huge[g0]
        bmb[b] = sd.mb[g0]
        bnout[b] = sd.n_outer[g0]
        m = len(idx)
        bxc[b, :m] = sd.x_chunk[idx]
        bxm[b, :m] = sd.x_mid[idx]
        bxl[b, :m] = sd.x_lane[idx]
        bact[b, :m] = 1
        bzr[b, :m] = sd.z_r[idx]
        bzc[b, :m] = sd.z_c[idx]
        bcre[b, :m] = sd.cre[idx]
        bcim[b, :m] = cim[idx]
        if bze is not None:
            bze[b, :m] = ze[idx][:, :, None]
    base = (bxh, bmb, bnout, bxc, bxm, bxl, bact, bzr, bzc, bcre, bcim)
    return base if bze is None else base + (bze,)


def _ham_bucket_kernel(unroll, stages, real, xh_ref, mb_ref, nout_ref,
                       xc_ref,
                       xm_ref, xl_ref, act_ref, zr_ref, zc_ref, cre_ref,
                       cim_ref, psi_ref, acc_in_ref, acc_ref, bufA, bufB,
                       accA, accB, pmidS, ploS, smS, wlS, *rest):
    # real=True (all cim zero) drops the imaginary weight field: scratch,
    # hoist, per-group matmul, and VPU products (same saving as the
    # expectation kernel — the field is ~40% of these kernels)
    if real:
        wlimS = None
        zhiS, sin, sout = rest
    else:
        wlimS, zhiS, sin, sout = rest
    b = pl.program_id(0)
    xh = xh_ref[b]
    mb = mb_ref[b]
    nout = nout_ref[b]
    C = bufA.shape[2]
    Gcap = act_ref.shape[1]
    # per-bucket hoist: the per-(pair, group) _GroupCtx rebuild made this
    # kernel ~23x compute-bound over its DMA floor at 24q
    _hoist_ctx(b, Gcap, xm_ref, xl_ref, zr_ref, zc_ref, cre_ref,
               pmidS, ploS, smS, wlS, zhiS,
               cim_ref=None if real else cim_ref, wlimS=wlimS)

    def in_dmas(i, side):
        slot = i & 1
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        if side == "a":
            return ([pltpu.make_async_copy(psi_ref.at[p, pl.ds(h * C, C)],
                                           bufA.at[slot, p], sin.at[slot, p])
                     for p in (0, 1)]
                    + [pltpu.make_async_copy(
                        acc_ref.at[p, pl.ds(h * C, C)],
                        accA.at[slot, p], sin.at[slot, 2 + p])
                       for p in (0, 1)])
        return ([pltpu.make_async_copy(psi_ref.at[p, pl.ds(hh * C, C)],
                                       bufB.at[slot, p], sin.at[slot, 4 + p])
                 for p in (0, 1)]
                + [pltpu.make_async_copy(acc_ref.at[p, pl.ds(hh * C, C)],
                                         accB.at[slot, p],
                                         sin.at[slot, 6 + p])
                   for p in (0, 1)])

    def out_dmas(i, side):
        slot = i & 1
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        if side == "a":
            return [pltpu.make_async_copy(accA.at[slot, p],
                                          acc_ref.at[p, pl.ds(h * C, C)],
                                          sout.at[slot, p])
                    for p in (0, 1)]
        return [pltpu.make_async_copy(accB.at[slot, p],
                                      acc_ref.at[p, pl.ds(hh * C, C)],
                                      sout.at[slot, 2 + p])
                for p in (0, 1)]

    def add_group(dst, g2, P0, P1, h):
        Wre = _field_from(smS, wlS, zhiS, g2, h, C)
        if real:
            dst[0] += Wre * P0
            dst[1] += Wre * P1
            return
        Wim = _field_from(smS, wlimS, zhiS, g2, h, C)
        dst[0] += Wre * P0 - Wim * P1
        dst[1] += Wre * P1 + Wim * P0

    @pl.when(nout > 0)
    def _():
        _start(in_dmas(0, "a"))

        @pl.when(xh > 0)
        def _():
            _start(in_dmas(0, "b"))

    def outer(i, _):
        slot = i & 1
        h = _pair_index(i, xh, mb)

        @pl.when(i + 1 < nout)
        def _():
            @pl.when(i >= 1)
            def _():
                _wait(out_dmas(i - 1, "a"))

                @pl.when(xh > 0)
                def _():
                    _wait(out_dmas(i - 1, "b"))

            _start(in_dmas(i + 1, "a"))

            @pl.when(xh > 0)
            def _():
                _start(in_dmas(i + 1, "b"))

        _wait(in_dmas(i, "a"))

        @pl.when(xh > 0)
        def _():
            _wait(in_dmas(i, "b"))

        def group_body(g2, _):
            @pl.when(act_ref[b, g2] != 0)
            def _():
                xc = xc_ref[b, g2]
                pmid = pmidS[g2]
                plo = ploS[g2]

                @pl.when(xh > 0)
                def _():
                    X = jnp.stack([bufB[slot, 0], bufB[slot, 1],
                                   bufA[slot, 0], bufA[slot, 1]])
                    P = _perm_batched(X, pmid, plo, xc, stages)
                    add_group(accA.at[slot], g2, P[0], P[1], h)
                    add_group(accB.at[slot], g2, P[2], P[3], h ^ xh)

                @pl.when(xh == 0)
                def _():
                    X = jnp.stack([bufA[slot, 0], bufA[slot, 1]])
                    P = _perm_batched(X, pmid, plo, xc, stages)
                    add_group(accA.at[slot], g2, P[0], P[1], h)

            return 0

        if unroll:
            # static unroll: H groups in a bucket are independent reads of
            # the SAME resident chunks — straight-line code lets Mosaic
            # overlap their permutation/field matmuls, which the dynamic
            # fori_loop sequences (the H pass is compute-bound ~23x above
            # its DMA floor at 24q)
            for g2s in range(Gcap):
                group_body(g2s, 0)
        else:
            jax.lax.fori_loop(0, Gcap, group_body, 0)

        _start(out_dmas(i, "a"))

        @pl.when(xh > 0)
        def _():
            _start(out_dmas(i, "b"))

        return 0

    jax.lax.fori_loop(0, nout, outer, 0)

    def drain(i, _):
        _wait(out_dmas(i, "a"))

        @pl.when(xh > 0)
        def _():
            _wait(out_dmas(i, "b"))

        return 0

    jax.lax.fori_loop(jnp.maximum(nout - 2, 0), nout, drain, 0)


def ham_apply_bucketed(psi, acc, bxh, bmb, bnout, bxc, bxm, bxl, bact, bzr,
                       bzc, bcre, bcim, interpret: Optional[bool] = None,
                       chunk_bits: int = CHUNK_BITS,
                       unroll: Optional[bool] = None, stages: str = "lm",
                       real: Optional[bool] = None):
    """acc += (off-diagonal grouped H)|psi> with groups BUCKETED by x_huge:
    one state pass per bucket instead of per group.  ``unroll`` statically
    unrolls the in-bucket group loop (OVQE_HAM_UNROLL=1 enables; default
    off pending hardware measurement).  ``stages`` statically certifies
    which in-tile permutation stages the groups need (builder stage
    classes) — identity stages are skipped.  ``real`` statically certifies
    all cim == 0 and skips the imaginary weight field (auto-detected from
    a host numpy bcim; pass explicitly when calling under jit)."""
    interpret = _resolve_interpret(interpret)
    if unroll is None:
        unroll = _os.environ.get("OVQE_HAM_UNROLL", "0") == "1"
    if real is None:
        real = isinstance(bcim, np.ndarray) and not bcim.any()
    B, Gcap, K = bzc.shape[0], bzc.shape[1], bzc.shape[-1]
    N = psi.shape[-1]
    T = N >> TILE_BITS
    C = 1 << chunk_bits
    psi4 = jnp.asarray(psi, jnp.float32).reshape(2, T, SUB, LANE)
    acc4 = jnp.asarray(acc, jnp.float32).reshape(2, T, SUB, LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Gcap, K, 1), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gcap, 1, K), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gcap, K, 1), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gcap, K, 1), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # psi
            pl.BlockSpec(memory_space=pl.ANY),        # acc (aliased)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((Gcap, SUB, SUB), jnp.bfloat16),      # pmidS
            pltpu.VMEM((Gcap, LANE, LANE), jnp.bfloat16),    # ploS
            pltpu.VMEM((Gcap, SUB, K), jnp.float32),         # smS
            pltpu.VMEM((Gcap, K, LANE), jnp.float32),        # wlS
        ] + ([] if real else
             [pltpu.VMEM((Gcap, K, LANE), jnp.float32)]) +   # wlimS
        [
            pltpu.VMEM((Gcap, 1, K), jnp.int32),             # zhiS
            pltpu.SemaphoreType.DMA((2, 8)),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    from functools import partial as _partial
    out = pl.pallas_call(
        _partial(_ham_bucket_kernel, bool(unroll), stages, bool(real)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(acc4.shape, jnp.float32),
        input_output_aliases={12: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(bxh), jnp.asarray(bmb), jnp.asarray(bnout),
      jnp.asarray(bxc), jnp.asarray(bxm), jnp.asarray(bxl),
      jnp.asarray(bact), jnp.asarray(bzr), jnp.asarray(bzc),
      jnp.asarray(bcre), jnp.asarray(bcim), psi4, acc4)
    return out.reshape(2, N)


# --------------------------------------------------- bucketed expectation
#
# <psi|H_offdiag|psi> with the state streamed ONCE per x_huge bucket: the
# per-group expectation kernel sits exactly at its DMA copy floor (24q
# attribution probe), so G passes cost G full-state reads — bucketing
# amortizes one read over up to gcap groups.  Unlike the H-apply route to
# the energy (acc = H|psi>, e = Re<psi|acc>) this needs NO second state:
# at 30 qubits the 8.6 GB accumulator does not fit next to psi on one
# chip, and even where it fits the expectation reads 1 state per bucket
# vs 3 transfers (psi read + acc read/write) for H-apply.

class _HamGroupsView:
    """Duck-typed stand-in for GroupedPauliSum exposing only the fields
    stream_ham_data reads — lets build_ham_buckets run on a row-class
    subset with its own K padding."""

    def __init__(self, n, x, z, a_re, a_im):
        self.n = n
        self.x = x
        self.z = z
        self.a_re = a_re
        self.a_im = a_im


def diag_stream_rows(gham, kd: int = 64, include_const: bool = True):
    """Constant + z-diagonal terms lowered to x=0 grouped rows
    (x, z, a_re, a_im) of kd terms per group.  A z=0 row has field == 1
    everywhere, so the identity constant contributes c_re <psi|psi>
    exactly; at very large n this routes the diagonal through the
    streaming kernels instead of an XLA pass that materializes full-state
    temporaries (8+ GB at 30 qubits)."""
    zd = np.asarray(gham.z_diag, np.int64)
    adr = np.asarray(gham.a_diag_re, np.float64)
    adi = np.asarray(gham.a_diag_im, np.float64)
    if include_const:
        zd = np.concatenate([[0], zd])
        adr = np.concatenate([[gham.c_re], adr])
        adi = np.concatenate([[gham.c_im], adi])
    if not len(zd):
        return None
    gd = -(-len(zd) // kd)
    z = np.zeros((gd, kd), np.int64)
    are = np.zeros((gd, kd), np.float32)
    aim = np.zeros((gd, kd), np.float32)
    for g in range(gd):
        sl = slice(g * kd, min((g + 1) * kd, len(zd)))
        m = sl.stop - sl.start
        z[g, :m] = zd[sl]
        are[g, :m] = adr[sl]
        aim[g, :m] = adi[sl]
    return np.zeros(gd, np.int64), z, are, aim


_HAM_VMEM_BUDGET = 14 << 20   # leave ~2 MB of the 16 MB scoped-VMEM
                              # limit for operand blocks + compiler stack


def _exp_hoist_vmem_est(C: int, gcap: int, K: int, um: int, ul: int,
                        stages: str, real: bool) -> int:
    """Scoped-VMEM estimate for the HOISTED expectation kernel: 2 staging
    buffers + unique-mask permuted-chunk tables + field blocks."""
    tile = SUB * LANE * 4
    est = 2 * (2 * 2 * C * tile)                     # bufA + bufB
    if "m" in stages:
        est += um * 2 * C * tile + um * SUB * SUB * 2
    if "l" in stages:
        est += ul * 2 * C * tile + ul * LANE * LANE * 2
    est += gcap * (SUB * K * 4 + (1 if real else 2) * K * LANE * 4 + K * 4)
    return est


def _ham_apply_vmem_est(C: int, gcap: int, K: int) -> int:
    """Host-side scoped-VMEM estimate for ham_apply_bucketed: 4 staging
    buffers + hoisted per-bucket contexts + the batched-perm X stack.
    The K=64 class at C=8/gcap=16 measured 16.89M on v5e (> the 16 MB
    limit) — per-class chunk_bits selection keeps every class under."""
    staging = 4 * 2 * 2 * C * SUB * LANE * 4
    ctx = gcap * (SUB * SUB * 2 + LANE * LANE * 2 + SUB * K * 4
                  + 2 * K * LANE * 4 + K * 4)
    stack = 8 * C * SUB * LANE * 4
    return staging + ctx + stack


def build_ham_buckets_split(gham, gcap: int = HAM_BUCKET_CAP,
                            small: int = 8, with_diag: bool = False,
                            stage_split: bool = False,
                            chunk_bits: int = CHUNK_BITS):
    """x_huge-bucketed Hamiltonian operands split into K ROW CLASSES: the
    off-diagonal groups of a molecular Hamiltonian are wildly skewed (at
    30q/H15+: 79% of groups carry 4 live rows, 1.4% carry 58 — all padded
    to K=64 by group_pauli_sum).  The bucket kernels are compute-bound
    with per-group field work linear in K, so padding every group to the
    global max wastes ~11x field compute.  Splits groups into a
    K=``small`` class and a K=global class (each padded to its own K) and
    returns a LIST of (stages, chunk_bits, bucket-args) tuples — one
    executable per class.  Each class's chunk_bits is the largest value
    (<= ``chunk_bits``) whose H-apply kernel fits the scoped-VMEM budget
    (_ham_apply_vmem_est): big-K classes hoist big per-bucket contexts
    and drop to half-size chunks; callers must thread the returned
    chunk_bits into ham_apply_bucketed / expectation_bucketed.

    ``stage_split`` further partitions each K class by which in-tile
    permutation stages its groups actually need ("m" = sublane, "l" =
    lane; ~60% of molecular-H groups have x with no bits in one of the
    two in-tile halves, i.e. an identity matrix there): the sum is
    order-free, so each class runs a kernel that pays only its own
    matmul stages.  Without it every class is tagged "lm".

    ``with_diag`` appends the constant + z-diagonal terms as x=0 groups
    (expectation path only: H-apply handles the diagonal separately)."""
    x = np.asarray(gham.x, np.int64)
    z = np.asarray(gham.z)
    are = np.asarray(gham.a_re)
    aim = np.asarray(gham.a_im)
    if with_diag:
        d = diag_stream_rows(gham, kd=max(small, z.shape[1] or small))
        if d is not None:
            kd = d[1].shape[1]
            kk = max(kd, z.shape[1])

            def padk(a):
                out = np.zeros((a.shape[0], kk), a.dtype)
                out[:, : a.shape[1]] = a
                return out

            x = np.concatenate([x, d[0]]) if len(x) else d[0]
            z = np.concatenate([padk(z), padk(d[1])]) if z.size \
                else d[1]
            are = np.concatenate([padk(are), padk(d[2])]) if \
                are.size else d[2]
            aim = np.concatenate([padk(aim), padk(d[3])]) if \
                aim.size else d[3]
    if not len(x):
        return []
    live = (np.abs(are) > 0) | (np.abs(aim) > 0)
    # classify by the HIGHEST live column index, not the live-row count:
    # today's builders (group_pauli_sum / diag_stream_rows) front-pack live
    # rows so the two agree, but a scattered-rows builder must land in the
    # class whose K actually covers its columns
    last_live = np.where(live.any(axis=1),
                         live.shape[1] - 1 - np.argmax(live[:, ::-1], axis=1),
                         -1)
    sel_small = last_live < small
    out = []
    for selk, kc in ((sel_small, small), (~sel_small, z.shape[1])):
        if not selk.any():
            continue
        assert not live[selk][:, kc:].any()
        if stage_split:
            xm_nz = ((x >> 7) & (SUB - 1)) != 0
            xl_nz = (x & (LANE - 1)) != 0
            stage_sels = [("", selk & ~xm_nz & ~xl_nz),
                          ("l", selk & ~xm_nz & xl_nz),
                          ("m", selk & xm_nz & ~xl_nz),
                          ("lm", selk & xm_nz & xl_nz)]
        else:
            stage_sels = [("lm", selk)]
        cb = chunk_bits
        while cb > 2 and _ham_apply_vmem_est(1 << cb, gcap,
                                             kc) > _HAM_VMEM_BUDGET:
            cb -= 1
        for stages, sel in stage_sels:
            if not sel.any():
                continue
            view = _HamGroupsView(gham.n, x[sel], z[sel, :kc],
                                  are[sel, :kc], aim[sel, :kc])
            b = build_ham_buckets(view, gcap=gcap, chunk_bits=cb)
            if b is not None:
                out.append((stages, cb, b))
    return out


def _expect_bucket_kernel(herm, unroll, stages, limbs, real, xh_ref, mb_ref,
                          nout_ref,
                          xc_ref, xm_ref, xl_ref, act_ref, zr_ref, zc_ref,
                          cre_ref, cim_ref, psi_ref, out_ref, bufA, bufB,
                          pmidS, ploS, smS, wlS, *rest):
    # real=True (all cim zero — every molecular Hamiltonian) drops the
    # imaginary weight field entirely: its scratch, hoist, per-group
    # matmul, and VPU products (the field is ~39% of this kernel, probe
    # attribution at 24q)
    if real:
        wlimS = None
        zhiS, eacc, sin = rest
    else:
        wlimS, zhiS, eacc, sin = rest
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    xh = xh_ref[b]
    mb = mb_ref[b]
    nout = nout_ref[b]
    C = bufA.shape[2]
    Gcap = act_ref.shape[1]
    _hoist_ctx(b, Gcap, xm_ref, xl_ref, zr_ref, zc_ref, cre_ref,
               pmidS, ploS, smS, wlS, zhiS,
               cim_ref=None if real else cim_ref, wlimS=wlimS)
    eacc[0, 0] = jnp.float32(0.0)

    def in_dmas(i, side):
        slot = i & 1
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        if side == "a":
            return [pltpu.make_async_copy(psi_ref.at[p, pl.ds(h * C, C)],
                                          bufA.at[slot, p], sin.at[slot, p])
                    for p in (0, 1)]
        return [pltpu.make_async_copy(psi_ref.at[p, pl.ds(hh * C, C)],
                                      bufB.at[slot, p], sin.at[slot, 2 + p])
                for p in (0, 1)]

    def contrib(g2, src, px0, px1, h):
        Wre = _field_from(smS, wlS, zhiS, g2, h, C)
        if real:
            return jnp.sum(Wre * (src[0] * px0 + src[1] * px1))
        Wim = _field_from(smS, wlimS, zhiS, g2, h, C)
        return jnp.sum(Wre * (src[0] * px0 + src[1] * px1)
                       - Wim * (src[0] * px1 - src[1] * px0))

    @pl.when(nout > 0)
    def _():
        _start(in_dmas(0, "a"))

        @pl.when(xh > 0)
        def _():
            _start(in_dmas(0, "b"))

    def outer(i, _):
        slot = i & 1
        h = _pair_index(i, xh, mb)

        @pl.when(i + 1 < nout)
        def _():
            _start(in_dmas(i + 1, "a"))

            @pl.when(xh > 0)
            def _():
                _start(in_dmas(i + 1, "b"))

        _wait(in_dmas(i, "a"))

        @pl.when(xh > 0)
        def _():
            _wait(in_dmas(i, "b"))

        def group_body(g2, _):
            @pl.when(act_ref[b, g2] != 0)
            def _():
                xc = xc_ref[b, g2]
                pmid = pmidS[g2]
                plo = ploS[g2]

                @pl.when(xh > 0)
                def _():
                    if herm:
                        # bra == ket and every group of a compiled REAL
                        # Hamiltonian is Hermitian: the mirror chunk's
                        # contribution equals this one exactly
                        # (M(i^x, i) = conj M(i, i^x)) — one side doubled
                        X = jnp.stack([bufB[slot, 0], bufB[slot, 1]])
                        P = _perm_batched(X, pmid, plo, xc, stages,
                                          limbs=limbs)
                        eacc[0, 0] += 2.0 * contrib(g2, bufA.at[slot],
                                                    P[0], P[1], h)
                    else:
                        X = jnp.stack([bufB[slot, 0], bufB[slot, 1],
                                       bufA[slot, 0], bufA[slot, 1]])
                        P = _perm_batched(X, pmid, plo, xc, stages,
                                          limbs=limbs)
                        eacc[0, 0] += (
                            contrib(g2, bufA.at[slot], P[0], P[1], h)
                            + contrib(g2, bufB.at[slot], P[2], P[3],
                                      h ^ xh))

                @pl.when(xh == 0)
                def _():
                    X = jnp.stack([bufA[slot, 0], bufA[slot, 1]])
                    P = _perm_batched(X, pmid, plo, xc, stages,
                                      limbs=limbs)
                    eacc[0, 0] += contrib(g2, bufA.at[slot], P[0], P[1], h)

            return 0

        if unroll:
            # independent reads of the same resident chunks: straight-line
            # code lets Mosaic overlap the per-group matmul chains
            for g2s in range(Gcap):
                group_body(g2s, 0)
        else:
            jax.lax.fori_loop(0, Gcap, group_body, 0)
        return 0

    jax.lax.fori_loop(0, nout, outer, 0)
    out_ref[0, 0] += eacc[0, 0]


def expectation_bucketed4(psi4, bxh, bmb, bnout, bxc, bxm, bxl, bact, bzr,
                          bzc, bcre, bcim, interpret: Optional[bool] = None,
                          chunk_bits: int = CHUNK_BITS, herm: bool = False,
                          unroll: Optional[bool] = None,
                          stages: str = "lm", limbs: Optional[int] = None,
                          real: Optional[bool] = None):
    """Off-diagonal grouped <psi|H|psi> on the TILED (2, T, 128, 128)
    state view, one state read per x_huge bucket.  herm=True certifies
    every group Hermitian and halves the cross-chunk compute.  ``limbs``
    sets the exact-bf16 splitting depth of the permutation operand: 3
    (the default — bitwise f32); 2 trades ~2^-17 relative element error
    for 14% less wall time — measured 9e-10 absolute on a 24q molecular
    <H>, invisible in a summed scalar.  The in-package energy-only
    builders opt into limbs=2 (this kernel only ever produces the energy
    SCALAR; states evolve through the bitwise-x3 rotation/adjoint
    kernels); OVQE_EXP_MM=bf16x3|bf16x2 forces either globally.  ``real`` statically certifies all cim == 0 and
    skips the imaginary weight field (auto-detected from a host numpy
    bcim; pass explicitly when calling under jit)."""
    interpret = _resolve_interpret(interpret)
    if unroll is None:
        unroll = _os.environ.get("OVQE_HAM_UNROLL", "0") == "1"
    if limbs is None:
        limbs = _exp_mm_limbs(3)
    if real is None:
        real = isinstance(bcim, np.ndarray) and not bcim.any()
    B, Gcap, K = bzc.shape[0], bzc.shape[1], bzc.shape[-1]
    C = 1 << chunk_bits

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Gcap, K, 1), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gcap, 1, K), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gcap, K, 1), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gcap, K, 1), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # psi
        ],
        out_specs=pl.BlockSpec((1, 1), lambda b, *r: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((Gcap, SUB, SUB), jnp.bfloat16),      # pmidS
            pltpu.VMEM((Gcap, LANE, LANE), jnp.bfloat16),    # ploS
            pltpu.VMEM((Gcap, SUB, K), jnp.float32),         # smS
            pltpu.VMEM((Gcap, K, LANE), jnp.float32),        # wlS
        ] + ([] if real else
             [pltpu.VMEM((Gcap, K, LANE), jnp.float32)]) +   # wlimS
        [
            pltpu.VMEM((Gcap, 1, K), jnp.int32),             # zhiS
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    from functools import partial as _partial
    out = pl.pallas_call(
        _partial(_expect_bucket_kernel, bool(herm), bool(unroll), stages,
                 int(limbs), bool(real)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(bxh), jnp.asarray(bmb), jnp.asarray(bnout),
      jnp.asarray(bxc), jnp.asarray(bxm), jnp.asarray(bxl),
      jnp.asarray(bact), jnp.asarray(bzr), jnp.asarray(bzc),
      jnp.asarray(bcre), jnp.asarray(bcim), psi4)
    return out[0, 0]


def expectation_bucketed(psi, bxh, bmb, bnout, bxc, bxm, bxl, bact, bzr,
                         bzc, bcre, bcim, interpret: Optional[bool] = None,
                         chunk_bits: int = CHUNK_BITS, herm: bool = False,
                         unroll: Optional[bool] = None,
                         stages: str = "lm", limbs: Optional[int] = None,
                         real: Optional[bool] = None):
    """As expectation_bucketed4 on the flat (2, N) state view."""
    N = psi.shape[-1]
    T = N >> TILE_BITS
    psi4 = jnp.asarray(psi, jnp.float32).reshape(2, T, SUB, LANE)
    return expectation_bucketed4(psi4, bxh, bmb, bnout, bxc, bxm, bxl,
                                 bact, bzr, bzc, bcre, bcim,
                                 interpret=interpret,
                                 chunk_bits=chunk_bits, herm=herm,
                                 unroll=unroll, stages=stages, limbs=limbs,
                                 real=real)


def _expect_hoist_kernel(stages, limbs, real, xh_ref, mb_ref, nout_ref,
                         xc_ref, ixm_ref, ixl_ref, act_ref, uxm_ref,
                         uxl_ref, zr_ref, zc_ref, cre_ref, cim_ref,
                         psi_ref, out_ref, bufA, bufB, *rest):
    """HOISTED Hermitian bucketed expectation: per chunk-pair the ket
    chunk is sublane-permuted once per DISTINCT x_mid and the bra chunk
    lane-permuted once per DISTINCT x_lane (tables in VMEM scratch); per
    group only a tile roll + field + elementwise contraction remains.
    Valid because the bucket sum is order-free and the lane shift of the
    weight field folds into the coefficients (hoist_bucket_args).  The
    perm chain was 46% of the non-hoisted kernel at 24q with ~1.4-1.5x
    redundancy across groups (measured mask-sharing, H12/H15+)."""
    it = iter(rest)
    XMS = next(it) if "m" in stages else None
    pmuS = next(it) if "m" in stages else None
    ALS = next(it) if "l" in stages else None
    pluS = next(it) if "l" in stages else None
    smS = next(it)
    wlS = next(it)
    wlimS = None if real else next(it)
    zhiS = next(it)
    eacc = next(it)
    sin = next(it)
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[0, 0] = jnp.float32(0.0)

    xh = xh_ref[b]
    mb = mb_ref[b]
    nout = nout_ref[b]
    C = bufA.shape[2]
    Gcap = act_ref.shape[1]
    UM = uxm_ref.shape[1] if XMS is not None else 0
    UL = uxl_ref.shape[1] if ALS is not None else 0

    # once-per-bucket hoists: unique permutation matrices + field blocks
    if XMS is not None:
        def pm_body(u, _):
            pmuS[u] = _perm_matrix(
                jnp.maximum(uxm_ref[b, u], 0)).astype(pmuS.dtype)
            return 0
        jax.lax.fori_loop(0, UM, pm_body, 0)
    if ALS is not None:
        def pl_body(v, _):
            pluS[v] = _perm_matrix(
                jnp.maximum(uxl_ref[b, v], 0)).astype(pluS.dtype)
            return 0
        jax.lax.fori_loop(0, UL, pl_body, 0)

    def fld_body(g2, _):
        zc = zc_ref[0, g2]
        zr = zr_ref[0, g2]
        si = jax.lax.broadcasted_iota(jnp.int32, (SUB, zc.shape[-1]), 0)
        smS[g2] = _parity_sign(si & ((zc >> 7) & (SUB - 1)))
        li = jax.lax.broadcasted_iota(jnp.int32, (zr.shape[0], LANE), 1)
        lane_s = _parity_sign(li & (zr & (LANE - 1)))
        wlS[g2] = cre_ref[0, g2] * lane_s
        if wlimS is not None:
            wlimS[g2] = cim_ref[0, g2] * lane_s
        zhiS[g2] = (zc >> TILE_BITS)
        return 0

    jax.lax.fori_loop(0, Gcap, fld_body, 0)
    eacc[0, 0] = jnp.float32(0.0)

    def in_dmas(i, side):
        slot = i & 1
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        if side == "a":
            return [pltpu.make_async_copy(psi_ref.at[p, pl.ds(h * C, C)],
                                          bufA.at[slot, p], sin.at[slot, p])
                    for p in (0, 1)]
        return [pltpu.make_async_copy(psi_ref.at[p, pl.ds(hh * C, C)],
                                      bufB.at[slot, p], sin.at[slot, 2 + p])
                for p in (0, 1)]

    @pl.when(nout > 0)
    def _():
        _start(in_dmas(0, "a"))

        @pl.when(xh > 0)
        def _():
            _start(in_dmas(0, "b"))

    def outer(i, _):
        slot = i & 1
        h = _pair_index(i, xh, mb)

        @pl.when(i + 1 < nout)
        def _():
            _start(in_dmas(i + 1, "a"))

            @pl.when(xh > 0)
            def _():
                _start(in_dmas(i + 1, "b"))

        _wait(in_dmas(i, "a"))

        @pl.when(xh > 0)
        def _():
            _wait(in_dmas(i, "b"))

        # the KET chunk: the cross-chunk partner when pairing, else the
        # resident chunk itself (herm mode doubles the paired side)
        def ket():
            return jnp.where(xh > 0,
                             jnp.stack([bufB[slot, 0], bufB[slot, 1]]),
                             jnp.stack([bufA[slot, 0], bufA[slot, 1]]))

        if XMS is not None:
            def xm_body(u, _):
                @pl.when(uxm_ref[b, u] >= 0)
                def _():
                    XMS[u] = _perm_batched(ket(), pmuS[u], pmuS[u], 0,
                                           "m", limbs=limbs)
                return 0
            jax.lax.fori_loop(0, UM, xm_body, 0)
        if ALS is not None:
            def al_body(v, _):
                @pl.when(uxl_ref[b, v] >= 0)
                def _():
                    A = jnp.stack([bufA[slot, 0], bufA[slot, 1]])
                    ALS[v] = _perm_batched(A, pluS[v], pluS[v], 0, "l",
                                           limbs=limbs)
                return 0
            jax.lax.fori_loop(0, UL, al_body, 0)

        def group_body(g2, _):
            @pl.when(act_ref[b, g2] != 0)
            def _():
                xc = xc_ref[b, g2]
                X2 = XMS[ixm_ref[b, g2]] if XMS is not None else ket()
                Xr = _xor_roll(X2, xc, 1)
                if ALS is not None:
                    Asrc = ALS[ixl_ref[b, g2]]
                else:
                    Asrc = jnp.stack([bufA[slot, 0], bufA[slot, 1]])
                Wre = _field_from(smS, wlS, zhiS, g2, h, C)
                s_re = Wre * (Asrc[0] * Xr[0] + Asrc[1] * Xr[1])
                if real:
                    c = jnp.sum(s_re)
                else:
                    Wim = _field_from(smS, wlimS, zhiS, g2, h, C)
                    c = jnp.sum(s_re - Wim * (Asrc[0] * Xr[1]
                                              - Asrc[1] * Xr[0]))
                eacc[0, 0] += jnp.where(xh > 0, 2.0, 1.0) * c

            return 0

        jax.lax.fori_loop(0, Gcap, group_body, 0)
        return 0

    jax.lax.fori_loop(0, nout, outer, 0)
    out_ref[0, 0] += eacc[0, 0]


def expectation_hoisted4(psi4, hargs, interpret: Optional[bool] = None,
                         chunk_bits: int = CHUNK_BITS, stages: str = "lm",
                         limbs: Optional[int] = None,
                         real: Optional[bool] = None):
    """Hoisted Hermitian bucketed <psi|H_offdiag|psi> on the tiled state.
    ``hargs`` is the 13-tuple from hoist_bucket_args.  Only Hermitian
    groups are supported (the builder certifies; the non-hoisted kernel
    remains the general path)."""
    (bxh, bmb, bnout, bxc, ixm, ixl, bact, bzr, bzc, bcre, bcim,
     uxm, uxl) = hargs
    interpret = _resolve_interpret(interpret)
    if limbs is None:
        limbs = _exp_mm_limbs(3)
    if real is None:
        real = isinstance(bcim, np.ndarray) and not bcim.any()
    B, Gcap, K = bzc.shape[0], bzc.shape[1], bzc.shape[-1]
    UM, UL = uxm.shape[1], uxl.shape[1]
    C = 1 << chunk_bits

    scratch = [
        pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),       # bufA
        pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),       # bufB
    ]
    if "m" in stages:
        scratch += [pltpu.VMEM((UM, 2, C, SUB, LANE), jnp.float32),  # XMS
                    pltpu.VMEM((UM, SUB, SUB), jnp.bfloat16)]        # pmuS
    if "l" in stages:
        scratch += [pltpu.VMEM((UL, 2, C, SUB, LANE), jnp.float32),  # ALS
                    pltpu.VMEM((UL, LANE, LANE), jnp.bfloat16)]      # pluS
    scratch += [
        pltpu.VMEM((Gcap, SUB, K), jnp.float32),             # smS
        pltpu.VMEM((Gcap, K, LANE), jnp.float32),            # wlS
    ]
    if not real:
        scratch += [pltpu.VMEM((Gcap, K, LANE), jnp.float32)]  # wlimS
    scratch += [
        pltpu.VMEM((Gcap, 1, K), jnp.int32),                 # zhiS
        pltpu.SMEM((1, 1), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 4)),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Gcap, K, 1), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gcap, 1, K), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gcap, K, 1), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gcap, K, 1), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # psi
        ],
        out_specs=pl.BlockSpec((1, 1), lambda b, *r: (0, 0),
                               memory_space=pltpu.SMEM),
        scratch_shapes=scratch,
    )
    from functools import partial as _partial
    out = pl.pallas_call(
        _partial(_expect_hoist_kernel, stages, int(limbs), bool(real)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(bxh), jnp.asarray(bmb), jnp.asarray(bnout),
      jnp.asarray(bxc), jnp.asarray(ixm), jnp.asarray(ixl),
      jnp.asarray(bact), jnp.asarray(uxm), jnp.asarray(uxl),
      jnp.asarray(bzr), jnp.asarray(bzc), jnp.asarray(bcre),
      jnp.asarray(bcim), psi4)
    return out[0, 0]


def hoist_bucket_args(bargs, um_cap: int = 8, ul_cap: int = 8):
    """Rewrite x_huge bucket args for the HOISTED expectation kernel.

    The bucketed expectation is order-free, so the per-group in-tile
    permutation factors across the bucket: the ket chunk is
    sublane-permuted ONCE per distinct x_mid and the bra chunk
    lane-permuted ONCE per distinct x_lane — the lane shift of the weight
    field folds into the coefficients as the scalar sign
    (-1)^parity(z_lane & x_lane) (substitute c -> c^x_lane in the
    contraction).  Per group only a tile roll + elementwise contraction
    remains.  Buckets whose distinct-mask counts exceed the caps are
    split (groups sorted by (x_mid, x_lane) first — the sum is
    order-free).

    In: (bxh, bmb, bnout, bxc, bxm, bxl, bact, bzr, bzc, bcre, bcim).
    Out: (bxh, bmb, bnout, bxc, ixm, ixl, bact, bzr, bzc, bcre', bcim',
    uxm, uxl) where ixm/ixl index per-slot into the (B, cap) unique-mask
    tables (padded with -1) and the coefficients carry the fold sign."""
    (bxh, bmb, bnout, bxc, bxm, bxl, bact, bzr, bzc, bcre, bcim) = [
        np.asarray(a) for a in bargs]
    B, gcap = bact.shape
    K = bzr.shape[2]
    out_rows = []        # (src_bucket, slot_indices ordered)
    for b in range(B):
        slots = np.where(bact[b] != 0)[0]
        if not len(slots):
            continue
        order = slots[np.lexsort((bxl[b, slots], bxm[b, slots]))]
        cur: List[int] = []
        um: set = set()
        ul: set = set()
        for s in order:
            m_, l_ = int(bxm[b, s]), int(bxl[b, s])
            nm = um | {m_}
            nl = ul | {l_}
            if cur and (len(nm) > um_cap or len(nl) > ul_cap
                        or len(cur) >= gcap):
                out_rows.append((b, cur))
                cur, um, ul = [], set(), set()
                nm, nl = {m_}, {l_}
            cur.append(int(s))
            um, ul = nm, nl
        if cur:
            out_rows.append((b, cur))
    B2 = len(out_rows)
    oxh = np.zeros(B2, bxh.dtype)
    omb = np.zeros(B2, bmb.dtype)
    onout = np.zeros(B2, bnout.dtype)
    oxc = np.zeros((B2, gcap), bxc.dtype)
    ixm = np.zeros((B2, gcap), np.int32)
    ixl = np.zeros((B2, gcap), np.int32)
    oact = np.zeros((B2, gcap), bact.dtype)
    ozr = np.zeros((B2, gcap, K, 1), bzr.dtype)
    ozc = np.zeros((B2, gcap, 1, K), bzc.dtype)
    ocre = np.zeros((B2, gcap, K, 1), bcre.dtype)
    ocim = np.zeros((B2, gcap, K, 1), bcim.dtype)
    uxm = np.full((B2, um_cap), -1, np.int32)
    uxl = np.full((B2, ul_cap), -1, np.int32)
    for b2, (b, slots) in enumerate(out_rows):
        oxh[b2] = bxh[b]
        omb[b2] = bmb[b]
        onout[b2] = bnout[b]
        ums = sorted({int(bxm[b, s]) for s in slots})
        uls = sorted({int(bxl[b, s]) for s in slots})
        uxm[b2, : len(ums)] = ums
        uxl[b2, : len(uls)] = uls
        for j, s in enumerate(slots):
            oxc[b2, j] = bxc[b, s]
            ixm[b2, j] = ums.index(int(bxm[b, s]))
            ixl[b2, j] = uls.index(int(bxl[b, s]))
            oact[b2, j] = 1
            ozr[b2, j] = bzr[b, s]
            ozc[b2, j] = bzc[b, s]
            # fold the lane shift of the weight field: wl_k(c ^ xl) =
            # wl_k(c) * (-1)^parity((z_lane_k) & xl)
            lane_z = np.asarray(bzr[b, s, :, 0], np.int64) & (LANE - 1)
            eps = 1.0 - 2.0 * (np.vectorize(_popcount_np)(
                lane_z & int(bxl[b, s])) & 1)
            ocre[b2, j, :, 0] = bcre[b, s, :, 0] * eps
            ocim[b2, j, :, 0] = bcim[b, s, :, 0] * eps
    return (oxh, omb, onout, oxc, ixm, ixl, oact, ozr, ozc, ocre, ocim,
            uxm, uxl)


def _popcount_np(v):
    return bin(int(v)).count("1")


def _bucket_segments(bargs, seg_groups: int, act_idx: int = 6):
    """Split bucket arrays into segments of ~seg_groups ACTIVE groups per
    device call (fixed shapes per segment for executable reuse)."""
    bact = bargs[act_idx]
    B = len(bact)
    per_bucket = np.sum(bact, axis=1)
    segs = []
    start = 0
    acc = 0
    for b in range(B):
        acc += int(per_bucket[b])
        if acc >= seg_groups and b + 1 > start:
            segs.append((start, b + 1))
            start = b + 1
            acc = 0
    if start < B:
        segs.append((start, B))
    if not segs:
        return []
    b_pad = max(hi - lo for lo, hi in segs)

    def pad(a, lo, hi):
        out = np.zeros((b_pad,) + a.shape[1:], a.dtype)
        out[: hi - lo] = a[lo:hi]
        return out

    return [tuple(jnp.asarray(pad(a, lo, hi)) for a in bargs)
            for lo, hi in segs]


# ----------------------------------------------------- pool overlap screen

def _pool_stream_kernel(xh_ref, mb_ref, nout_ref, xc_ref, xm_ref, xl_ref,
                        zr_ref, zc_ref, cre_ref, cim_ref, sig_ref, psi_ref,
                        out_ref, sigA, sigB, bufA, bufB, racc, iacc, sin):
    """Per-group complex overlap v_g = <sigma| (group of A_i) |psi> — the
    ADAPT gradient screen v_i = <H psi|A_i|psi> batched over (op, x) groups
    with both states streamed from HBM."""
    g = pl.program_id(0)
    xh = xh_ref[g]
    mb = mb_ref[g]
    nout = nout_ref[g]
    ctx = _GroupCtx(xm_ref[g], xl_ref[g], xc_ref[g], zr_ref[0], zc_ref[0],
                    cre_ref[0], cim_ref[0])
    C = bufA.shape[2]
    racc[0, 0] = jnp.float32(0.0)
    iacc[0, 0] = jnp.float32(0.0)

    def in_dmas(i, side):
        slot = i & 1
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        if side == "a":
            return ([pltpu.make_async_copy(sig_ref.at[p, pl.ds(h * C, C)],
                                           sigA.at[slot, p], sin.at[slot, p])
                     for p in (0, 1)]
                    + [pltpu.make_async_copy(
                        psi_ref.at[p, pl.ds(h * C, C)],
                        bufA.at[slot, p], sin.at[slot, 2 + p])
                       for p in (0, 1)])
        return ([pltpu.make_async_copy(sig_ref.at[p, pl.ds(hh * C, C)],
                                       sigB.at[slot, p], sin.at[slot, 4 + p])
                 for p in (0, 1)]
                + [pltpu.make_async_copy(psi_ref.at[p, pl.ds(hh * C, C)],
                                         bufB.at[slot, p],
                                         sin.at[slot, 6 + p])
                   for p in (0, 1)])

    def contrib(sig, partner, h):
        """sum_j conj(sigma_j) (W(j) psi_{j^x})_j over chunk tiles."""
        px0 = ctx.perm(partner[0])
        px1 = ctx.perm(partner[1])
        Wre = ctx.field("re", h, C)
        Wim = ctx.field("im", h, C)
        zr_ = Wre * px0 - Wim * px1
        zi_ = Wre * px1 + Wim * px0
        re = jnp.sum(sig[0] * zr_ + sig[1] * zi_)
        im = jnp.sum(sig[0] * zi_ - sig[1] * zr_)
        return re, im

    @pl.when(nout > 0)
    def _():
        _start(in_dmas(0, "a"))

        @pl.when(xh > 0)
        def _():
            _start(in_dmas(0, "b"))

    def outer(i, _):
        slot = i & 1
        h = _pair_index(i, xh, mb)

        @pl.when(i + 1 < nout)
        def _():
            _start(in_dmas(i + 1, "a"))

            @pl.when(xh > 0)
            def _():
                _start(in_dmas(i + 1, "b"))

        _wait(in_dmas(i, "a"))

        @pl.when(xh > 0)
        def _():
            _wait(in_dmas(i, "b"))
            rA, iA = contrib(sigA.at[slot], bufB.at[slot], h)
            rB, iB = contrib(sigB.at[slot], bufA.at[slot], h ^ xh)
            racc[0, 0] += rA + rB
            iacc[0, 0] += iA + iB

        @pl.when(xh == 0)
        def _():
            rA, iA = contrib(sigA.at[slot], bufA.at[slot], h)
            racc[0, 0] += rA
            iacc[0, 0] += iA

        return 0

    jax.lax.fori_loop(0, nout, outer, 0)
    li = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    out_ref[g % 8, :] = jnp.where(
        li == 0, racc[0, 0], jnp.where(li == 1, iacc[0, 0], 0.0))[0]


def pool_overlap_stream(sigma, psi, x_huge, mb, n_outer, x_chunk, x_mid,
                        x_lane, z_r, z_c, cre, cim,
                        interpret: Optional[bool] = None):
    """Per-group (re, im) of <sigma| group |psi>, both states streamed from
    HBM.  Returns a (G, 2) array; callers segment-sum rows into operators."""
    interpret = _resolve_interpret(interpret)
    G0 = z_c.shape[0]
    (x_huge, mb, n_outer, x_chunk, x_mid, x_lane, z_r, z_c, cre,
     cim) = _pad_group8([x_huge, mb, n_outer, x_chunk, x_mid, x_lane,
                         z_r, z_c, cre, cim])
    G, K = z_c.shape[0], z_c.shape[-1]
    N = psi.shape[-1]
    T = N >> TILE_BITS
    C = 1 << CHUNK_BITS
    sig4 = jnp.asarray(sigma, jnp.float32).reshape(2, T, SUB, LANE)
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
            pl.BlockSpec(memory_space=pl.ANY),        # sigma
            pl.BlockSpec(memory_space=pl.ANY),        # psi
        ],
        out_specs=pl.BlockSpec((8, LANE), lambda g, *r: (g // 8, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 8)),
        ],
    )
    rows = pl.pallas_call(
        _pool_stream_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(x_huge), jnp.asarray(mb), jnp.asarray(n_outer),
      jnp.asarray(x_chunk), jnp.asarray(x_mid), jnp.asarray(x_lane),
      jnp.asarray(z_r), jnp.asarray(z_c), jnp.asarray(cre), jnp.asarray(cim),
      sig4, psi4)
    return rows[:G0, :2]


# ------------------------------------------- bucketed pool overlap screen
#
# Pool overlaps are order-free sums, so groups sharing an x_huge bucket
# (as the H apply) share ONE two-state pass: sig/psi chunk pairs are
# DMA'd once per bucket and every group accumulates its own (re, im) row.
# This removes the per-group state passes that made the 26q ADAPT screen
# the dominant outer-iteration cost (round-2 VERDICT item 3).

def build_pool_buckets(sd: StreamGroupData, gcap: int = HAM_BUCKET_CAP):
    """Bucket pool StreamGroupData by x_huge (stable order).  Returns
    (bxh, bmb, bnout, bxc, bxm, bxl, bact, bzr, bzc, bcre, bcim,
    slot_group) where slot_group (B, gcap) maps slots to original group
    indices (-1 for padding)."""
    if sd.G == 0:
        return None
    order = np.argsort(sd.x_huge[: sd.G], kind="stable")
    order = [g for g in order if sd.n_outer[g] > 0]
    if not order:
        return None
    buckets = []
    cur: List[int] = []
    for g in order:
        if cur and (sd.x_huge[g] != sd.x_huge[cur[-1]]
                    or len(cur) >= gcap):
            buckets.append(cur)
            cur = []
        cur.append(int(g))
    if cur:
        buckets.append(cur)
    B = len(buckets)
    K = sd.z_r.shape[1]
    bxh = np.zeros(B, np.int32)
    bmb = np.zeros(B, np.int32)
    bnout = np.zeros(B, np.int32)
    bxc = np.zeros((B, gcap), np.int32)
    bxm = np.zeros((B, gcap), np.int32)
    bxl = np.zeros((B, gcap), np.int32)
    bact = np.zeros((B, gcap), np.int32)
    bzr = np.zeros((B, gcap, K, 1), np.int32)
    bzc = np.zeros((B, gcap, 1, K), np.int32)
    bcre = np.zeros((B, gcap, K, 1), np.float32)
    bcim = np.zeros((B, gcap, K, 1), np.float32)
    slot_group = np.full((B, gcap), -1, np.int64)
    cim = sd.cim if sd.cim is not None else np.zeros_like(sd.cre)
    for b, idx in enumerate(buckets):
        g0 = idx[0]
        bxh[b] = sd.x_huge[g0]
        bmb[b] = sd.mb[g0]
        bnout[b] = sd.n_outer[g0]
        m = len(idx)
        bxc[b, :m] = sd.x_chunk[idx]
        bxm[b, :m] = sd.x_mid[idx]
        bxl[b, :m] = sd.x_lane[idx]
        bact[b, :m] = 1
        bzr[b, :m] = sd.z_r[idx]
        bzc[b, :m] = sd.z_c[idx]
        bcre[b, :m] = sd.cre[idx]
        bcim[b, :m] = cim[idx]
        slot_group[b, :m] = idx
    return (bxh, bmb, bnout, bxc, bxm, bxl, bact, bzr, bzc, bcre, bcim,
            slot_group)


def _pool_bucket_kernel(stages, limbs, real, xh_ref, mb_ref, nout_ref,
                        xc_ref,
                        xm_ref, xl_ref,
                        act_ref, zr_ref, zc_ref, cre_ref, cim_ref, sig_ref,
                        psi_ref, out_ref, sigA, sigB, bufA, bufB, pmidS,
                        ploS, smS, wlS, *rest):
    # real=True certifies every pool coefficient real (UCCSD/GSD pools
    # compile that way): the imaginary weight field drops out of the
    # screen — the complex overlap structure lives in the STATES
    if real:
        wlimS = None
        zhiS, sin = rest
    else:
        wlimS, zhiS, sin = rest
    b = pl.program_id(0)
    xh = xh_ref[b]
    mb = mb_ref[b]
    nout = nout_ref[b]
    C = bufA.shape[2]
    Gcap = act_ref.shape[1]
    _hoist_ctx(b, Gcap, xm_ref, xl_ref, zr_ref, zc_ref, cre_ref,
               pmidS, ploS, smS, wlS, zhiS,
               cim_ref=None if real else cim_ref, wlimS=wlimS)

    out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)

    def in_dmas(i, side):
        slot = i & 1
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        if side == "a":
            return ([pltpu.make_async_copy(sig_ref.at[p, pl.ds(h * C, C)],
                                           sigA.at[slot, p], sin.at[slot, p])
                     for p in (0, 1)]
                    + [pltpu.make_async_copy(
                        psi_ref.at[p, pl.ds(h * C, C)],
                        bufA.at[slot, p], sin.at[slot, 2 + p])
                       for p in (0, 1)])
        return ([pltpu.make_async_copy(sig_ref.at[p, pl.ds(hh * C, C)],
                                       sigB.at[slot, p], sin.at[slot, 4 + p])
                 for p in (0, 1)]
                + [pltpu.make_async_copy(psi_ref.at[p, pl.ds(hh * C, C)],
                                         bufB.at[slot, p],
                                         sin.at[slot, 6 + p])
                   for p in (0, 1)])

    def contrib(g2, sig, px0, px1, h):
        Wre = _field_from(smS, wlS, zhiS, g2, h, C)
        if real:
            zr_, zi_ = Wre * px0, Wre * px1
        else:
            Wim = _field_from(smS, wlimS, zhiS, g2, h, C)
            zr_ = Wre * px0 - Wim * px1
            zi_ = Wre * px1 + Wim * px0
        re = jnp.sum(sig[0] * zr_ + sig[1] * zi_)
        im = jnp.sum(sig[0] * zi_ - sig[1] * zr_)
        return re, im

    @pl.when(nout > 0)
    def _():
        _start(in_dmas(0, "a"))

        @pl.when(xh > 0)
        def _():
            _start(in_dmas(0, "b"))

    def outer(i, _):
        slot = i & 1
        h = _pair_index(i, xh, mb)

        @pl.when(i + 1 < nout)
        def _():
            _start(in_dmas(i + 1, "a"))

            @pl.when(xh > 0)
            def _():
                _start(in_dmas(i + 1, "b"))

        _wait(in_dmas(i, "a"))

        @pl.when(xh > 0)
        def _():
            _wait(in_dmas(i, "b"))

        def group_body(g2, _):
            @pl.when(act_ref[b, g2] != 0)
            def _():
                xc = xc_ref[b, g2]
                pmid = pmidS[g2]
                plo = ploS[g2]

                @pl.when(xh > 0)
                def _():
                    X = jnp.stack([bufB[slot, 0], bufB[slot, 1],
                                   bufA[slot, 0], bufA[slot, 1]])
                    P = _perm_batched(X, pmid, plo, xc, stages,
                                      limbs=limbs)
                    rA, iA = contrib(g2, sigA.at[slot], P[0], P[1], h)
                    rB, iB = contrib(g2, sigB.at[slot], P[2], P[3], h ^ xh)
                    li = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
                    row = jnp.where(li == 0, rA + rB,
                                    jnp.where(li == 1, iA + iB, 0.0))
                    out_ref[0, g2, :] += row[0]

                @pl.when(xh == 0)
                def _():
                    X = jnp.stack([bufA[slot, 0], bufA[slot, 1]])
                    P = _perm_batched(X, pmid, plo, xc, stages,
                                      limbs=limbs)
                    rA, iA = contrib(g2, sigA.at[slot], P[0], P[1], h)
                    li = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
                    row = jnp.where(li == 0, rA,
                                    jnp.where(li == 1, iA, 0.0))
                    out_ref[0, g2, :] += row[0]

            return 0

        jax.lax.fori_loop(0, Gcap, group_body, 0)
        return 0

    jax.lax.fori_loop(0, nout, outer, 0)


def pool_overlap_bucketed(sigma, psi, bxh, bmb, bnout, bxc, bxm, bxl, bact,
                          bzr, bzc, bcre, bcim,
                          interpret: Optional[bool] = None,
                          chunk_bits: int = FUSED_CHUNK_BITS,
                          stages: str = "lm", limbs: Optional[int] = None,
                          real: Optional[bool] = None):
    """Per-(bucket, slot) complex overlaps <sigma| group |psi> with both
    states streamed ONCE per x_huge bucket.  Returns (B, Gcap, 2).
    ``stages`` statically certifies which in-tile permutation stages the
    groups need (caller class-sorts — overlaps are order-free);
    ``limbs`` as expectation_bucketed4 (bitwise x3 default; the
    in-package screen builders opt into the cheap x2 — scalars only,
    never state evolution); ``real`` statically certifies all cim == 0
    and skips the imaginary weight field."""
    interpret = _resolve_interpret(interpret)
    if limbs is None:
        limbs = _exp_mm_limbs(3)
    if real is None:
        real = isinstance(bcim, np.ndarray) and not bcim.any()
    B, Gcap, K = bzc.shape[0], bzc.shape[1], bzc.shape[-1]
    N = psi.shape[-1]
    T = N >> TILE_BITS
    C = 1 << chunk_bits
    sig4 = jnp.asarray(sigma, jnp.float32).reshape(2, T, SUB, LANE)
    psi4 = jnp.asarray(psi, jnp.float32).reshape(2, T, SUB, LANE)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Gcap, K, 1), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gcap, 1, K), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gcap, K, 1), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gcap, K, 1), lambda b, *r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # sigma
            pl.BlockSpec(memory_space=pl.ANY),        # psi
        ],
        out_specs=pl.BlockSpec((1, Gcap, LANE), lambda b, *r: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32),
            pltpu.VMEM((Gcap, SUB, SUB), jnp.bfloat16),      # pmidS
            pltpu.VMEM((Gcap, LANE, LANE), jnp.bfloat16),    # ploS
            pltpu.VMEM((Gcap, SUB, K), jnp.float32),         # smS
            pltpu.VMEM((Gcap, K, LANE), jnp.float32),        # wlS
        ] + ([] if real else
             [pltpu.VMEM((Gcap, K, LANE), jnp.float32)]) +   # wlimS
        [
            pltpu.VMEM((Gcap, 1, K), jnp.int32),             # zhiS
            pltpu.SemaphoreType.DMA((2, 8)),
        ],
    )
    from functools import partial as _partial
    rows = pl.pallas_call(
        _partial(_pool_bucket_kernel, stages, int(limbs), bool(real)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Gcap, LANE), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(jnp.asarray(bxh), jnp.asarray(bmb), jnp.asarray(bnout),
      jnp.asarray(bxc), jnp.asarray(bxm), jnp.asarray(bxl),
      jnp.asarray(bact), jnp.asarray(bzr), jnp.asarray(bzc),
      jnp.asarray(bcre), jnp.asarray(bcim), sig4, psi4)
    return rows[:, :, :2]


def _sd_select(sd: StreamGroupData, idx: np.ndarray) -> StreamGroupData:
    """Group subset of a StreamGroupData (order-free consumers only)."""
    return StreamGroupData(
        n=sd.n, T=sd.T, C=sd.C, x_lane=sd.x_lane[idx], x_mid=sd.x_mid[idx],
        x_chunk=sd.x_chunk[idx], x_huge=sd.x_huge[idx], mb=sd.mb[idx],
        n_outer=sd.n_outer[idx], z_r=sd.z_r[idx], z_c=sd.z_c[idx],
        cre=sd.cre[idx], cim=None if sd.cim is None else sd.cim[idx],
        op=None if sd.op is None else sd.op[idx], fmode=sd.fmode)


def build_streaming_pool_gradient_fn(gpool, lham, seg: Optional[int] = None):
    """Streaming ADAPT pool screen: grads_host(psi) -> complex (n_ops,)
    v_i = <H psi|A_i|psi>.  ``lham`` supplies H|psi> (the objective's
    streaming Hamiltonian service); group segments respect the device-call
    watchdog.  Default: x_huge-BUCKETED overlaps (one sig/psi pass per
    bucket); OVQE_STREAM_FUSE=0 restores the per-group kernel.  Mirrors
    grouped.build_grouped_pool_gradient_fn."""
    n = gpool.n
    if seg is None:
        seg = max(8, stream_segment_groups(n) // 2)   # 2 streamed states
    sd = build_stream_data(n, gpool.x, gpool.z, gpool.a_re, op=gpool.op,
                           coef_im=gpool.a_im)
    n_ops = gpool.n_ops
    fuse = _fuse_policy("pool")

    if fuse and sd.G:
        sd = build_stream_data(n, gpool.x, gpool.z, gpool.a_re, op=gpool.op,
                               coef_im=gpool.a_im,
                               chunk_bits=FUSED_CHUNK_BITS)
        # STAGE classes (overlaps are order-free, like the H paths): each
        # class's kernel statically skips the identity in-tile
        # permutation matmuls its groups don't need
        xm_nz = sd.x_mid != 0
        xl_nz = sd.x_lane != 0
        classes = [("", ~xm_nz & ~xl_nz), ("l", ~xm_nz & xl_nz),
                   ("m", xm_nz & ~xl_nz), ("lm", xm_nz & xl_nz)]
        dev = []
        for stages, selc in classes:
            idx = np.where(selc)[0]
            if not len(idx):
                continue
            bargs = build_pool_buckets(_sd_select(sd, idx))
            if bargs is None:
                continue
            slot_group = bargs[-1]
            op_of_slot = np.where(
                slot_group >= 0,
                np.asarray(sd.op)[idx][np.clip(slot_group, 0, None)], 0)
            live = (slot_group >= 0).astype(np.float32)
            dev += [(stages, tuple(jnp.asarray(a) for a in s))
                    for s in _bucket_segments(
                        bargs[:-1] + (op_of_slot, live), seg)]

        from functools import partial as _partial

        # UCCSD/GSD pools compile to purely real coefficients — certify
        # once and the screen kernel drops its imaginary weight field
        pool_real = sd.cim is None or not np.asarray(sd.cim).any()

        @_partial(jax.jit, static_argnums=(0,))
        def _seg_overlap_b(stages, sig, psi, bxh, bmb, bnout, bxc, bxm,
                           bxl, bact, bzr, bzc, bcre, bcim, ops, liv):
            rows = pool_overlap_bucketed(sig, psi, bxh, bmb, bnout, bxc,
                                         bxm, bxl, bact, bzr, bzc, bcre,
                                         bcim, stages=stages,
                                         real=pool_real,
                                         limbs=_exp_mm_limbs(2))
            return rows * liv[:, :, None]

        @jax.jit
        def _acc_b(vre, vim, rows, ops):
            flat = ops.reshape(-1)
            return (vre.at[flat].add(rows[:, :, 0].reshape(-1)),
                    vim.at[flat].add(rows[:, :, 1].reshape(-1)))

        def grads_host(psi) -> np.ndarray:
            psi = jnp.asarray(psi, jnp.float32)
            sig = lham(psi)
            vre = jnp.zeros(n_ops, jnp.float32)
            vim = jnp.zeros(n_ops, jnp.float32)
            for st_, s in dev:
                rows = _seg_overlap_b(st_, sig, psi, *s)
                vre, vim = _acc_b(vre, vim, rows, s[-2])
            out = np.asarray(jnp.stack([vre, vim]), dtype=np.float64)
            return out[0] + 1j * out[1]

        return grads_host

    hargs = (sd.x_huge, sd.mb, sd.n_outer, sd.x_chunk, sd.x_mid, sd.x_lane,
             sd.z_r, sd.z_c, sd.cre, sd.cim)
    segments = _segments(hargs, seg)
    op_segments = _segments((sd.op,), seg)
    dev = [tuple(jnp.asarray(a) for a in s) for s in segments]

    @jax.jit
    def _seg_overlap(sig, psi, xh, mb_, nout, xc, xm, xl, zr, zc, cre, cim):
        return pool_overlap_stream(sig, psi, xh, mb_, nout, xc, xm, xl,
                                   zr, zc, cre, cim)

    @jax.jit
    def _acc(vre, vim, rows, op):
        return (vre.at[op].add(rows[:, 0]), vim.at[op].add(rows[:, 1]))

    def grads_host(psi) -> np.ndarray:
        psi = jnp.asarray(psi, jnp.float32)   # on-device dtype coercion
        sig = lham(psi)
        vre = jnp.zeros(n_ops, jnp.float32)
        vim = jnp.zeros(n_ops, jnp.float32)
        for s, (ops,) in zip(dev, op_segments):
            rows = _seg_overlap(sig, psi, *s)
            vre, vim = _acc(vre, vim, rows, jnp.asarray(ops))
        out = np.asarray(jnp.stack([vre, vim]), dtype=np.float64)
        return out[0] + 1j * out[1]

    return grads_host


# ------------------------------------------------------- reversible adjoint

def _adj_stream_kernel(fmode, xh_ref, mb_ref, nout_ref, xc_ref, xm_ref,
                       xl_ref, ang_ref, zr_ref, zc_ref, cre_ref, p_in_ref,
                       l_in_ref,
                       p_ref, l_ref, gt_ref, bufPA, bufPB, bufLA, bufLB,
                       outPA, outPB, outLA, outLB, gacc, sin, sout):
    g = pl.program_id(0)
    xh = xh_ref[g]
    mb = mb_ref[g]
    nout = nout_ref[g]
    ang = ang_ref[g]
    ctx = _GroupCtx(xm_ref[g], xl_ref[g], xc_ref[g], zr_ref[0], zc_ref[0],
                    cre_ref[0])
    C = bufPA.shape[2]
    gacc[0, 0] = jnp.float32(0.0)

    def in_dmas(i, side):
        slot = i & 1
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        if side == "a":
            return ([pltpu.make_async_copy(p_ref.at[p, pl.ds(h * C, C)],
                                           bufPA.at[slot, p],
                                           sin.at[slot, p])
                     for p in (0, 1)]
                    + [pltpu.make_async_copy(
                        l_ref.at[p, pl.ds(h * C, C)],
                        bufLA.at[slot, p], sin.at[slot, 2 + p])
                       for p in (0, 1)])
        return ([pltpu.make_async_copy(p_ref.at[p, pl.ds(hh * C, C)],
                                       bufPB.at[slot, p], sin.at[slot, 4 + p])
                 for p in (0, 1)]
                + [pltpu.make_async_copy(l_ref.at[p, pl.ds(hh * C, C)],
                                         bufLB.at[slot, p],
                                         sin.at[slot, 6 + p])
                   for p in (0, 1)])

    def out_dmas(i, side):
        slot = i & 1
        h = _pair_index(i, xh, mb)
        hh = h ^ xh
        if side == "a":
            return ([pltpu.make_async_copy(outPA.at[slot, p],
                                           p_ref.at[p, pl.ds(h * C, C)],
                                           sout.at[slot, p])
                     for p in (0, 1)]
                    + [pltpu.make_async_copy(
                        outLA.at[slot, p], l_ref.at[p, pl.ds(h * C, C)],
                        sout.at[slot, 2 + p]) for p in (0, 1)])
        return ([pltpu.make_async_copy(outPB.at[slot, p],
                                       p_ref.at[p, pl.ds(hh * C, C)],
                                       sout.at[slot, 4 + p])
                 for p in (0, 1)]
                + [pltpu.make_async_copy(outLB.at[slot, p],
                                         l_ref.at[p, pl.ds(hh * C, C)],
                                         sout.at[slot, 6 + p])
                   for p in (0, 1)])

    def unrot(dstP, dstL, srcP, srcL, pP, pL, h):
        """Un-rotate chunk (srcP, srcL) given partner chunks (pP, pL) and
        accumulate the gradient contribution of its tiles."""
        ph = ctx.field("re", h, C)
        c, sn = rot_cos_sin(ang, ph, fmode)
        pxp0 = ctx.perm(pP[0])
        pxp1 = ctx.perm(pP[1])
        gt = -2.0 * jnp.sum(ph * (srcL[0] * pxp0 + srcL[1] * pxp1))
        dstP[0] = c * srcP[0] - sn * pxp0
        dstP[1] = c * srcP[1] - sn * pxp1
        dstL[0] = c * srcL[0] - sn * ctx.perm(pL[0])
        dstL[1] = c * srcL[1] - sn * ctx.perm(pL[1])
        return gt

    @pl.when(nout > 0)
    def _():
        _start(in_dmas(0, "a"))

        @pl.when(xh > 0)
        def _():
            _start(in_dmas(0, "b"))

    def outer(i, _):
        slot = i & 1
        h = _pair_index(i, xh, mb)

        @pl.when(i + 1 < nout)
        def _():
            _start(in_dmas(i + 1, "a"))

            @pl.when(xh > 0)
            def _():
                _start(in_dmas(i + 1, "b"))

        _wait(in_dmas(i, "a"))

        # the slot's previous write-back must land before its staging
        # buffers are overwritten
        @pl.when(i >= 2)
        def _():
            _wait(out_dmas(i - 2, "a"))

            @pl.when(xh > 0)
            def _():
                _wait(out_dmas(i - 2, "b"))

        @pl.when(xh > 0)
        def _():
            _wait(in_dmas(i, "b"))
            gA = unrot(outPA.at[slot], outLA.at[slot],
                       bufPA.at[slot], bufLA.at[slot],
                       bufPB.at[slot], bufLB.at[slot], h)
            gB = unrot(outPB.at[slot], outLB.at[slot],
                       bufPB.at[slot], bufLB.at[slot],
                       bufPA.at[slot], bufLA.at[slot], h ^ xh)
            gacc[0, 0] += gA + gB
            _start(out_dmas(i, "a"))
            _start(out_dmas(i, "b"))

        @pl.when(xh == 0)
        def _():
            gA = unrot(outPA.at[slot], outLA.at[slot],
                       bufPA.at[slot], bufLA.at[slot],
                       bufPA.at[slot], bufLA.at[slot], h)
            gacc[0, 0] += gA
            _start(out_dmas(i, "a"))

        return 0

    jax.lax.fori_loop(0, nout, outer, 0)

    def drain(i, _):
        _wait(out_dmas(i, "a"))

        @pl.when(xh > 0)
        def _():
            _wait(out_dmas(i, "b"))

        return 0

    jax.lax.fori_loop(jnp.maximum(nout - 2, 0), nout, drain, 0)

    # per-group gradient entry: row g % 8 of the (G // 8)-blocked output
    gt_ref[g % 8, :] = jnp.broadcast_to(gacc[0, 0], (LANE,))


def adjoint_sweep_stream(p, lam, x_huge, mb, n_outer, x_chunk, x_mid, x_lane,
                         angles, z_r, z_c, cre,
                         interpret: Optional[bool] = None,
                         chunk_bits: int = ADJ_CHUNK_BITS, fmode: int = 0):
    """Reversible adjoint over grouped rotations, both states streamed from
    HBM; operands must be passed in REVERSED group order.  Returns
    (p_prev, lam_prev, per-group gradient entries); angles = -theta[op] per
    (reversed) group."""
    interpret = _resolve_interpret(interpret)
    G0 = z_c.shape[0]
    (x_huge, mb, n_outer, x_chunk, x_mid, x_lane, angles, z_r, z_c,
     cre) = _pad_group8([x_huge, mb, n_outer, x_chunk, x_mid, x_lane,
                         angles, z_r, z_c, cre])
    G, K = z_c.shape[0], z_c.shape[-1]
    N = p.shape[-1]
    T = N >> TILE_BITS
    C = 1 << chunk_bits       # must match the operands' geometry
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
            [pltpu.VMEM((2, 2, C, SUB, LANE), jnp.float32)
             for _ in range(8)]                    # in + out staging (slots)
            + [pltpu.SMEM((1, 1), jnp.float32),
               pltpu.SemaphoreType.DMA((2, 8)),
               pltpu.SemaphoreType.DMA((2, 8))]),
    )
    from functools import partial as _partial
    p_out, l_out, gts = pl.pallas_call(
        _partial(_adj_stream_kernel, fmode),
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


# ------------------------------------------------- segmented energy builder
#
# The axon backend kills device calls past ~10 s; one streaming group costs
# ~2 full-state HBM passes, so calls are chunked to a fixed number of groups
# per pallas_call and driven from a host loop (psi / lam staying on device).
# Fixed segment shapes mean ONE compiled executable per kernel per bucket.

# ~1.5 ms per group at 2^24 amplitudes (measured, benchmarks/
# bench_streaming.py) -> 6e10 group-amplitude units keep a call near ~5 s
STREAM_CALL_BUDGET = 6.0e10


def stream_segment_groups(n: int, minimum: int = 8) -> int:
    s = max(int(STREAM_CALL_BUDGET / float(1 << n)), minimum)
    return 1 << (s.bit_length() - 1)     # power of two, rounded down


def pad_stream_args(args, g_pad: int):
    """Pad the group axis with inert groups: n_outer = 0 makes a padded
    group's outer loop run zero iterations (no DMA, no writes)."""
    G = len(args[0])
    if g_pad < G:
        raise ValueError(f"g_pad={g_pad} < G={G}")
    pad = g_pad - G

    def p(a):
        return np.pad(np.asarray(a), [(0, pad)] + [(0, 0)] * (a.ndim - 1))

    return tuple(None if a is None else p(a) for a in args)


def _segments(args, seg: int):
    """Split padded stream args into per-segment tuples.  The segment size
    is capped at the next power of two >= G (padding 5 groups to a budget
    sized for thousands would dominate the call)."""
    G = len(args[0])
    if G:
        seg = min(seg, 1 << (G - 1).bit_length() if G > 1 else 1)
    n_seg = max(1, -(-G // seg))
    padded = pad_stream_args(args, n_seg * seg)
    return [tuple(None if a is None else a[i * seg:(i + 1) * seg]
                  for a in padded) for i in range(n_seg)]


def build_streaming_energy_fn(gham, seg: Optional[int] = None):
    """Streaming-kernel (energy, energy_and_grad, forward, lham, expect,
    prepare_seq).

    ``prepare_seq(seq_stream_args(...))`` lowers an ansatz ONCE to
    device-resident per-segment operand tuples; energy / energy_and_grad /
    forward take that prepared object.  The Hamiltonian runs through the
    streaming expectation / H-apply kernels with the diagonal (x=0) part and
    the identity constant handled by single-pass XLA programs (and the
    energy recovered as e = Re<psi|lam> + const <psi|psi> from ONE H pass
    per iteration, as in the grouped segmented builder)."""
    from functools import partial

    from . import grouped as gr
    from .statevector import default_rdtype

    n = gham.n
    if seg is None:
        seg = stream_segment_groups(n)
    rd = default_rdtype()
    hermitian = gham.hermitian
    # every molecular Hamiltonian compiles to purely real group
    # coefficients: certify it once and the bucketed kernels drop the
    # imaginary weight field (its matmul is ~40% of their compute)
    ham_real = not np.asarray(gham.a_im).any()
    zd, adr, adi = gham.z_diag, gham.a_diag_re, gham.a_diag_im
    c_re = np.asarray(gham.c_re, rd)

    # the budget is calibrated to the 1-state rotation kernel; the H-apply
    # streams psi + acc (read/write) and the adjoint streams p and l both
    # ways — halve their segments so every device call sees the same bound
    seg2 = max(8, seg // 2)
    hd = stream_ham_data(gham)
    # H|psi> runs BUCKETED by x_huge: one state pass per bucket instead of
    # per group (order-free sum; ~90% less DMA traffic at 24+ qubits).
    # Buckets are K-CLASS split: most molecular H groups carry <= 8 live
    # rows while the global pad K is 64 — per-class padding cuts the
    # (compute-bound) per-group field work up to 8x.
    # buckets partition by K row class AND perm-stage class (the sum is
    # order-free): each class's kernel pays only the field depth and the
    # in-tile permutation matmul stages its groups actually need.  The
    # same operand arrays feed the H-apply AND expectation kernels.
    hb_classes = (build_ham_buckets_split(gham, stage_split=True)
                  if hd.G else [])
    hb_segments = [(st_, cb, s) for st_, cb, b in hb_classes
                   for s in _bucket_segments(b, seg2)]
    # EXPECTATION segments: OVQE_EXP_HOIST=1 routes Hermitian classes
    # with in-tile perms through the HOISTED kernel (one sublane perm per
    # distinct x_mid + one lane perm per distinct x_lane per chunk pair —
    # the order-free factorization of the perm chain, which is 46% of the
    # plain kernel).  Default OFF: measured on v5e/24q the hoisted pass
    # is SLOWER (0.687 s vs 0.654 plain at C=4, 0.604 at C=8) — the
    # VMEM permuted-chunk-table writes + per-group dynamic-indexed reads
    # cost more than the 1.5x matmul-stage saving, and the tables force
    # half-size chunks (benchmarks/probe_exp_variants.py).  Kept as an
    # A/B-able variant; values match the plain kernel to 1e-10.
    _hoist = (_os.environ.get("OVQE_EXP_HOIST", "0") == "1" and hermitian
              and hd.G)
    if _hoist:
        eb_segments = []
        for st_, cbc, b in build_ham_buckets_split(
                gham, stage_split=True, chunk_bits=EXP_HOIST_CHUNK_BITS):
            if st_:
                gc, Kc = b[6].shape[1], b[8].shape[-1]
                caps = 8
                while caps > 2 and _exp_hoist_vmem_est(
                        1 << cbc, gc, Kc, caps, caps, st_,
                        ham_real) > _HAM_VMEM_BUDGET:
                    caps -= 2
                hargs = hoist_bucket_args(b, um_cap=caps, ul_cap=caps)
                eb_segments += [("hoist", st_, cbc, s)
                                for s in _bucket_segments(hargs, seg2)]
            else:
                eb_segments += [("plain", st_, cbc, s)
                                for s in _bucket_segments(b, seg2)]
    else:
        eb_segments = [("plain", st_, cbc, s)
                       for st_, cbc, s in hb_segments]
    # per-group expectation operands only matter when the bucketed path is
    # unavailable — don't pin unused device arrays otherwise
    h_segments = ([tuple(jnp.asarray(a) for a in s)
                   for s in _segments(ham_stream_args(hd), seg2)]
                  if hd.G and not hb_segments else [])

    @jax.jit
    def _diag_expect(psi):
        R, lanes = gr._lane_split(n)
        acc = c_re * jnp.sum(psi * psi)
        if len(zd):
            p2 = (psi[0] * psi[0] + psi[1] * psi[1]).reshape(R, lanes)
            acc = acc + jnp.sum(jnp.asarray(adr, psi.dtype)
                                * gr._group_bilinear(p2, zd, n))
        return acc

    @partial(jax.jit, static_argnames=("include_const",))
    def _diag_ham(psi, include_const: bool = True):
        acc = c_re * psi if include_const else jnp.zeros_like(psi)
        if len(zd):
            w_re = gr._sign_field(zd, jnp.asarray(adr, psi.dtype),
                                  n).reshape(-1)
            acc = acc + w_re[None, :] * psi
            if not hermitian:
                w_im = gr._sign_field(zd, jnp.asarray(adi, psi.dtype),
                                      n).reshape(-1)
                acc = acc + jnp.stack([-w_im * psi[1], w_im * psi[0]])
        return acc

    fuse = _fuse_policy("seq")

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(12,))
    def _rot_seg(psi, theta, xh, mb_, nout, xc, xm, xl, op, zr, zc, cre,
                 fmode=0):
        return apply_grouped_ops_stream(psi, theta, xh, mb_, nout, xc, xm,
                                        xl, op, zr, zc, cre, fmode=fmode)

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(13,))
    def _rotb_seg(psi, theta, bxh, bmb, bnout, bop, bxc, bxm, bxl, bact,
                  bzr, bzc, bcre, fmode=0):
        return apply_grouped_ops_fused(psi, theta, bxh, bmb, bnout, bop,
                                       bxc, bxm, bxl, bact, bzr, bzc, bcre,
                                       fmode=fmode)

    @partial(jax.jit, donate_argnums=(0, 1), static_argnums=(14,))
    def _adjb_seg(p, l, theta, bxh, bmb, bnout, bop, bxc, bxm, bxl, bact,
                  bzr, bzc, bcre, fmode=0):
        return adjoint_sweep_fused(p, l, theta, bxh, bmb, bnout, bop, bxc,
                                   bxm, bxl, bact, bzr, bzc, bcre,
                                   fmode=fmode)

    @partial(jax.jit, donate_argnums=(0,))
    def _grad_addb(grad, bop, bact, gts):
        upd = (gts * bact.astype(gts.dtype)).reshape(-1)
        return grad.at[bop.reshape(-1)].add(upd.astype(grad.dtype))

    @partial(jax.jit, donate_argnums=(1,))
    def _ham_seg(psi, acc, xh, mb_, nout, xc, xm, xl, zr, zc, cre, cim):
        return ham_apply_stream(psi, acc, xh, mb_, nout, xc, xm, xl,
                                zr, zc, cre, cim)

    @jax.jit
    def _exp_seg(psi, xh, mb_, nout, xc, xm, xl, zr, zc, cre, cim):
        # herm: compiled REAL-coefficient Hamiltonian groups are Hermitian
        return expectation_stream(psi, xh, mb_, nout, xc, xm, xl,
                                  zr, zc, cre, cim, herm=True)

    @partial(jax.jit, donate_argnums=(0, 1), static_argnums=(13,))
    def _adj_seg(p, l, theta, xh, mb_, nout, xc, xm, xl, op, zr, zc, cre,
                 fmode=0):
        angles = -jnp.asarray(theta, jnp.float32)[op]
        p, l, gts = adjoint_sweep_stream(p, l, xh, mb_, nout, xc, xm, xl,
                                         angles, zr, zc, cre, fmode=fmode)
        return p, l, gts

    @partial(jax.jit, donate_argnums=(0,))
    def _grad_add(grad, op, gts):
        return grad.at[op].add(gts.astype(grad.dtype))

    def prepare_seq(gseq):
        """Lower a GroupedOpSequence to device-resident per-segment operand
        tuples — once per bind.  Default: residency-FUSED buckets (one
        state pass per consecutive equal-x_huge run; the in-place fused
        adjoint fits full-size chunks, lifting the old ADJ_CHUNK_BITS VMEM
        bound).  OVQE_STREAM_FUSE=0 restores the per-group kernels (which
        stream the adjoint at half-size chunks)."""
        if gseq is None or gseq.n_groups == 0:
            return {"mode": "plain", "fwd": [], "adj": [], "fmode": 0}
        fm = getattr(gseq, "fmode", 0)
        if fuse:
            sd = stream_seq_data(gseq, chunk_bits=FUSED_CHUNK_BITS)
            sd_rev = _reverse_sd(sd)
            fb = build_seq_buckets(sd)
            ab = build_seq_buckets(sd_rev)
            fwd = [tuple(jnp.asarray(a) for a in s)
                   for s in _bucket_segments(fb, seg, act_idx=7)]
            adj = [tuple(jnp.asarray(a) for a in s)
                   for s in _bucket_segments(ab, seg2, act_idx=7)]
            return {"mode": "fused", "fwd": fwd, "adj": adj, "fmode": fm}
        fwd_args = seq_stream_args(stream_seq_data(gseq))
        adj_args = seq_stream_args(
            stream_seq_data(gseq, chunk_bits=ADJ_CHUNK_BITS))
        fwd = [tuple(jnp.asarray(a) for a in s)
               for s in _segments(fwd_args, seg)]
        rev = [tuple(jnp.asarray(np.ascontiguousarray(np.asarray(a)[::-1]))
                     for a in s)
               for s in reversed(_segments(adj_args, seg2))]
        return {"mode": "plain", "fwd": fwd, "adj": rev, "fmode": fm}

    @jax.jit
    def _fresh_copy(x):
        # the cached device-resident psi0 master must never be donated
        return x + jnp.float32(0.0)

    def forward(theta, psi0, prepared):
        if isinstance(psi0, jax.Array):
            psi = _fresh_copy(psi0)
        else:
            psi = jnp.asarray(np.asarray(psi0, np.float32))
        theta = jnp.asarray(np.asarray(theta, np.float32))
        rot = _rotb_seg if prepared["mode"] == "fused" else _rot_seg
        fm = prepared.get("fmode", 0)
        for s in prepared["fwd"]:
            psi = rot(psi, theta, *s, fm)
        return psi

    @partial(jax.jit, donate_argnums=(3,), static_argnums=(0, 1))
    def _hamb_seg(stages, cb, psi, acc, bxh, bmb, bnout, bxc, bxm, bxl,
                  bact, bzr, bzc, bcre, bcim):
        return ham_apply_bucketed(psi, acc, bxh, bmb, bnout, bxc, bxm,
                                  bxl, bact, bzr, bzc, bcre, bcim,
                                  chunk_bits=cb, stages=stages,
                                  real=ham_real)

    def _lham(psi, include_const: bool = True):
        acc = _diag_ham(psi, include_const=include_const)
        for st_, cb, s in hb_segments:
            acc = _hamb_seg(st_, cb, psi, acc, *s)
        return acc

    @partial(jax.jit, static_argnums=(0, 1))
    def _expb_seg(stages, cb, psi, bxh, bmb, bnout, bxc, bxm, bxl, bact,
                  bzr, bzc, bcre, bcim):
        return expectation_bucketed(psi, bxh, bmb, bnout, bxc, bxm, bxl,
                                    bact, bzr, bzc, bcre, bcim,
                                    chunk_bits=cb, herm=hermitian,
                                    stages=stages, real=ham_real,
                                    limbs=_exp_mm_limbs(2))

    @partial(jax.jit, static_argnums=(0, 1))
    def _exph_seg(stages, cb, psi, *s):
        psi4 = jnp.asarray(psi, jnp.float32).reshape(
            2, psi.shape[-1] >> TILE_BITS, SUB, LANE)
        return expectation_hoisted4(psi4, s, chunk_bits=cb, stages=stages,
                                    real=ham_real, limbs=_exp_mm_limbs(2))

    def _expectation(psi):
        # energy-only: the bucketed EXPECTATION kernel reads the state
        # ONCE per x_huge bucket with no accumulator state (the H-apply
        # route costs psi-read + acc-read/write per bucket and a second
        # full state — which does not even fit next to psi at 30q), and
        # the Hermitian certificate halves its cross-chunk compute.
        # energy_and_grad keeps the H-apply route: it needs lam anyway.
        if eb_segments:
            acc = _diag_expect(psi)
            for kind, st_, cb, s in eb_segments:
                if kind == "hoist":
                    acc = acc + _exph_seg(st_, cb, psi, *s)
                else:
                    acc = acc + _expb_seg(st_, cb, psi, *s)
            return float(acc)
        acc = _diag_expect(psi)
        for s in h_segments:
            acc = acc + _exp_seg(psi, *s)
        return float(acc)

    def energy(theta, psi0, prepared):
        return _expectation(forward(theta, psi0, prepared))

    @jax.jit
    def _dot_energy(psi, lam0):
        return jnp.sum(psi * lam0) + c_re * jnp.sum(psi * psi)

    @jax.jit
    def _add_const(psi, lam0):
        return lam0 + c_re * psi

    def energy_and_grad(theta, psi0, prepared):
        theta_f = jnp.asarray(np.asarray(theta, np.float32))
        psi = forward(theta_f, psi0, prepared)
        lam0 = _lham(psi, include_const=False)
        e = float(_dot_energy(psi, lam0))
        lam = _add_const(psi, lam0)
        n_params = int(np.shape(theta)[0])
        grad = jnp.zeros(n_params, jnp.float32)
        p, l = psi, lam
        fm = prepared.get("fmode", 0)
        if prepared["mode"] == "fused":
            for s in prepared["adj"]:
                p, l, gts = _adjb_seg(p, l, theta_f, *s, fm)
                grad = _grad_addb(grad, s[3], s[7], gts)
        else:
            for s in prepared["adj"]:
                p, l, gts = _adj_seg(p, l, theta_f, *s, fm)
                grad = _grad_add(grad, s[6], gts)
        return e, np.asarray(grad, dtype=float)

    return (energy, energy_and_grad, forward, _lham, _expectation,
            prepare_seq)


def build_streaming_energy_xl_fn(gseq, gham, hf_init: int,
                                 seg: Optional[int] = None,
                                 interpret: Optional[bool] = None):
    """Single-chip LARGE-N ENERGY-ONLY evaluator — the 30-qubit path.

    At 30 qubits the 8.6 GB split-real state is the only full-state buffer
    one v5e chip can afford, so every stage must avoid flat (2, 2^n)
    round-trips:

    * the state lives in the TILED pallas-native shape (2, T, 128, 128)
      across the whole host loop — reshape-bitcasts at the jit boundary
      around a donated+aliased pallas pair make XLA's buffer assignment
      materialize a DEFENSIVE full-state copy (OOM on one chip);
    * the HF one-hot is built ON DEVICE directly in the tiled layout (a
      flat zeros + reshape materializes the same defensive copy, and a
      host transfer of 8.6 GB would ride the tunnel for minutes);
    * the rotation sweep is in-place (input_output_aliases + donated
      carry) through the residency-FUSED stage-dispatch kernels
      (OVQE_STREAM_FUSE=0 restores the per-group kernels);
    * <psi|H|psi> runs through the read-only BUCKETED Hermitian
      expectation kernel with the constant + z-diagonal terms folded in
      as x=0 groups (a z=0 row has field == 1, so it contributes exactly
      c_re <psi|psi>) — the XLA alternatives materialize full-state or
      (R, K_d) temps.

    Returns ``energy_host(theta) -> float``.  Reference delta: the
    reference walls at ~14 dense / ~20 sparse qubits on its scipy stack
    (SURVEY §2.2); full 30q ITERATIONS (energy + adjoint needs 4 streamed
    states = 34 GB) belong to the multi-chip composition
    (parallel/sharded_stream.py)."""
    from functools import partial

    # this path hard-certifies herm=True into its bucketed-expectation
    # segments; a non-Hermitian grouped Hamiltonian would silently return
    # a wrong energy, so refuse it up front (every molecular H — and any
    # real-coefficient Pauli sum — qualifies)
    if not grouped_hermitian_operator(gham):
        raise ValueError("build_streaming_energy_xl_fn requires an "
                         "operator-Hermitian grouped Hamiltonian (its "
                         "expectation segments certify herm=True); use "
                         "build_streaming_energy_fn")
    n = gham.n
    if seg is None:
        seg = stream_segment_groups(n)
    T = 1 << (n - TILE_BITS)
    fm = getattr(gseq, "fmode", 0)

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(12,))
    def _rot4_seg(psi4, theta, xh, mb_, nout, xc, xm, xl, op, zr, zc, cre,
                  fmode=0):
        return apply_grouped_ops_stream4(psi4, theta, xh, mb_, nout, xc,
                                         xm, xl, op, zr, zc, cre,
                                         fmode=fmode, interpret=interpret)

    @partial(jax.jit, donate_argnums=(0,), static_argnums=(13,))
    def _rotb4_seg(psi4, theta, bxh, bmb, bnout, bop, bxc, bxm, bxl, bact,
                   bzr, bzc, bcre, fmode=0):
        return apply_grouped_ops_fused4(psi4, theta, bxh, bmb, bnout, bop,
                                        bxc, bxm, bxl, bact, bzr, bzc,
                                        bcre, fmode=fmode,
                                        interpret=interpret)

    # diagonal rows fold into the expectation buckets as x=0 groups, so
    # their imaginary parts — and the constant's — count toward the
    # certificate too
    ham_real = not (np.asarray(gham.a_im).any()
                    or np.asarray(gham.a_diag_im).any()
                    or float(getattr(gham, "c_im", 0.0)) != 0.0)

    @partial(jax.jit, static_argnums=(0, 1))
    def _expb4_seg(stages, cb, psi4, bxh, bmb, bnout, bxc, bxm, bxl, bact,
                   bzr, bzc, bcre, bcim):
        return expectation_bucketed4(psi4, bxh, bmb, bnout, bxc, bxm, bxl,
                                     bact, bzr, bzc, bcre, bcim,
                                     chunk_bits=cb, herm=True,
                                     stages=stages, interpret=interpret,
                                     real=ham_real,
                                     limbs=_exp_mm_limbs(2))

    @partial(jax.jit, static_argnums=(0, 1))
    def _exph4_seg(stages, cb, psi4, *s):
        return expectation_hoisted4(psi4, s, chunk_bits=cb, stages=stages,
                                    interpret=interpret, real=ham_real,
                                    limbs=_exp_mm_limbs(2))

    hf_t, hf_r = divmod(int(hf_init), SUB * LANE)
    hf_s, hf_l = divmod(hf_r, LANE)

    @jax.jit
    def _make_hf():
        psi = jnp.zeros((2, T, SUB, LANE), jnp.float32)
        return psi.at[0, hf_t, hf_s, hf_l].set(1.0)

    fuse = _fuse_policy("seq")
    if fuse and gseq.n_groups:
        fb = build_seq_buckets(
            stream_seq_data(gseq, chunk_bits=FUSED_CHUNK_BITS))
        fwd = [tuple(jnp.asarray(a) for a in s)
               for s in _bucket_segments(fb, seg, act_idx=7)]
    elif gseq.n_groups:
        fwd = [tuple(jnp.asarray(a) for a in s)
               for s in _segments(seq_stream_args(stream_seq_data(gseq)),
                                  seg)]
    else:
        fwd = []
    seg2 = max(8, seg // 2)
    # OVQE_EXP_HOIST=1 rides the hoisted kernel for in-tile-perm classes
    # (measured SLOWER on v5e — see build_streaming_energy_fn; default
    # off); the perm-free class (incl. the folded diagonal) always stays
    # on the plain bucketed kernel
    _hoist = (_os.environ.get("OVQE_EXP_HOIST", "0") == "1"
              and gham.hermitian)
    hsegs = []
    for st_, cb, b in build_ham_buckets_split(
            gham, with_diag=True, stage_split=True,
            chunk_bits=EXP_HOIST_CHUNK_BITS if _hoist else CHUNK_BITS):
        if _hoist and st_:
            gc, Kc = b[6].shape[1], b[8].shape[-1]
            caps = 8
            while caps > 2 and _exp_hoist_vmem_est(
                    1 << cb, gc, Kc, caps, caps, st_,
                    ham_real) > _HAM_VMEM_BUDGET:
                caps -= 2
            hargs = hoist_bucket_args(b, um_cap=caps, ul_cap=caps)
            hsegs += [("hoist", st_, cb, tuple(jnp.asarray(a) for a in s))
                      for s in _bucket_segments(hargs, seg2)]
        else:
            hsegs += [("plain", st_, cb, tuple(jnp.asarray(a) for a in s))
                      for s in _bucket_segments(b, seg2)]

    def energy_host(theta) -> float:
        psi = _make_hf()
        theta = jnp.asarray(np.asarray(theta, np.float32))
        rot = _rotb4_seg if (fuse and gseq.n_groups) else _rot4_seg
        for s in fwd:
            psi = rot(psi, theta, *s, fm)
        acc = jnp.float32(0.0)
        for kind, st_, cb, s in hsegs:
            if kind == "hoist":
                acc = acc + _exph4_seg(st_, cb, psi, *s)
            else:
                acc = acc + _expb4_seg(st_, cb, psi, *s)
        return float(acc)

    return energy_host
