"""Single-device JAX statevector engine — split-real representation.

The differentiable statevector core that unifies the reference's two state
representations (myQLM circuit jobs + scipy sparse `expm_multiply` chains —
SURVEY.md §0) into one jittable engine.

TPU-native design choice: the state is stored as TWO REAL PLANES
``psi[2, 2^n]`` (psi[0]=Re, psi[1]=Im) and every complex multiplication is
written out in real arithmetic.  Rationale:

* the axon TPU backend's complex lowering is unreliable (complex D2H is
  UNIMPLEMENTED and several fused complex ops fail depending on lowering),
* TPUs have no complex ALU anyway — XLA emulates complex via real pairs,
  so explicit planes cost nothing and open the door to Pallas kernels
  (Mosaic has no complex support at all),
* host transfers of real planes always work.

Engine features:

* Pauli application by index XOR + popcount sign (no operator matrices)
* exact rotations exp(i a sigma) = cos a + i sin a * sigma
* Trotter-1 ansatz application as `lax.scan` over compiled term arrays
* <psi|H|psi> and H|psi> over compiled Pauli sums
* reversible adjoint-mode gradients (O(1) state memory: the backward pass
  un-applies rotations instead of storing residuals), replacing the
  reference's finite-difference BFGS oracle (get_energy_ucc.py:158-175)
* dynamic-ansatz variants taking padded term arrays as ARGUMENTS so ADAPT
  loops and experiment sweeps reuse one compiled executable

Complex Pauli-term coefficients enter as separate (re, im) coefficient
vectors; kappa = (-i)^nY is folded per term the same way.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .compile import CompiledOpSequence, CompiledPauliSum


def default_cdtype():
    """Logical complex dtype (host-side); device planes use the matching
    real dtype."""
    return jnp.complex128 if jax.config.read("jax_enable_x64") else jnp.complex64


def default_rdtype():
    return np.float64 if jax.config.read("jax_enable_x64") else np.float32


# ------------------------------------------------------------- state setup

def hf_state(n: int, hf_init: int, dtype=None) -> np.ndarray:
    """|hf_init> as split-real planes (2, 2^n); hf_init bits use qubit0 = MSB
    (reference from_ket_to_vector, molecule_factory.py:494-499).  Host numpy
    so jitted closures embed it as a constant."""
    rd = default_rdtype() if dtype is None else (
        np.float64 if dtype == jnp.complex128 else np.float32)
    psi = np.zeros((2, 1 << n), dtype=rd)
    psi[0, hf_init] = 1.0
    return psi


def complex_to_planes(vec: np.ndarray) -> np.ndarray:
    rd = default_rdtype()
    return np.stack([np.real(vec), np.imag(vec)]).astype(rd)


def planes_to_complex(planes) -> np.ndarray:
    arr = np.asarray(planes, dtype=np.float64)
    return arr[0] + 1j * arr[1]


def to_host(psi) -> np.ndarray:
    """Device planes -> host complex vector (real-only transfers)."""
    return planes_to_complex(np.asarray(psi))


def _indices(dim: int) -> jnp.ndarray:
    return jax.lax.iota(jnp.int32, dim)


def norm(psi) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(psi * psi))


# --------------------------------------------------------- pauli primitives
#
# XOR application strategy: XLA lowers dynamic gathers on TPU to a serial
# path (~200 us for a 2^16 gather, ~32 ms at 2^20 — measured on v5e).  The
# index-XOR permutation is instead decomposed as
#   * one XOR over the low lane bits  -> a (lanes x lanes) permutation
#     matmul on the MXU, with the permutation matrix built in-program from
#     the dynamic mask (P[k, j] = (k ^ j == x_lo)), and
#   * conditional `flip`s over the high (row) bits -> fast vectorized
#     reverses selected by jnp.where.
# Both are fully dynamic in the mask, so the scan-over-terms programs keep
# one compiled executable.  CPU keeps the plain gather (fast there).

_LANE_BITS = 7  # 128 lanes


def _use_mxu_xor() -> bool:
    return jax.default_backend() not in ("cpu",)


# ------------------------------------------------------- matmul precision
#
# Every matmul in the engine has one EXACT operand: a signed permutation /
# sign matrix with entries in {0, +-1}, representable in bf16 without error.
# Full f32 precision therefore only requires splitting the OTHER (state)
# operand into bf16 limbs:  X = hi + lo (+ lo2),  A@X = A@hi + A@lo (+...).
# Per-limb products are exact bf16 multiplies with f32 MXU accumulation, so
#   bf16x2: 2 MXU passes, residual ~2^-18 |X|   (vs f32's 2^-24)
#   bf16x3: 3 MXU passes, residual ~2^-27 |X|   (better than f32)
# against Precision.HIGHEST's 6 passes for an f32 x f32 product (XLA splits
# BOTH operands — wasted on the exact side).  Mode applies on accelerators
# only; CPU/f64 paths always use HIGHEST.

import os as _os

_MM_MODES = ("highest", "bf16x2", "bf16x3")
_MM_MODE = _os.environ.get("OVQE_MM", "highest").lower()
if _MM_MODE not in _MM_MODES:
    raise ValueError(f"OVQE_MM must be one of {_MM_MODES}, got {_MM_MODE!r}")


def set_matmul_mode(mode: str) -> str:
    """Set the engine-wide matmul mode ('highest' | 'bf16x2' | 'bf16x3');
    returns the previous mode.  Takes effect at the next trace (callers
    cache jitted programs — rebuild objectives after switching)."""
    global _MM_MODE
    if mode not in _MM_MODES:
        raise ValueError(f"mode must be one of {_MM_MODES}, got {mode!r}")
    prev, _MM_MODE = _MM_MODE, mode
    return prev


def matmul_mode() -> str:
    return _MM_MODE


def _split_bf16(x, limbs: int):
    """f32 -> bf16 limbs.  The textbook split ``r = x - bf16(x)`` MISCOMPILES
    on the axon TPU backend: the subtraction is evaluated at bf16 precision
    (even behind an optimization_barrier), silently zeroing every low limb.
    The hi limb is therefore produced by BITMASK truncation (top 16 bits of
    the f32 representation are exactly representable in bf16) and the
    residual subtraction is exact in f32."""
    parts = []
    r = x
    for _ in range(limbs - 1):
        ri = jax.lax.bitcast_convert_type(r, jnp.uint32)
        h = jax.lax.bitcast_convert_type(
            ri & np.uint32(0xFFFF0000), jnp.float32)
        parts.append(h.astype(jnp.bfloat16))
        r = r - h
    parts.append(r.astype(jnp.bfloat16))
    return parts


def exact_dot(a, b, dims, exact_side: str, out_dtype=None):
    """lax.dot_general(a, b, dims) where the ``exact_side`` operand ('a' or
    'b') has only {0, +-1} entries; the other operand is limb-split per the
    engine matmul mode."""
    out_dtype = out_dtype or (b.dtype if exact_side == "a" else a.dtype)
    if (_MM_MODE == "highest" or out_dtype == jnp.float64
            or not _use_mxu_xor()):
        return jax.lax.dot_general(a, b, dims,
                                   preferred_element_type=out_dtype,
                                   precision=jax.lax.Precision.HIGHEST)
    limbs = 2 if _MM_MODE == "bf16x2" else 3
    if exact_side == "a":
        a16 = a.astype(jnp.bfloat16)
        out = None
        for p in _split_bf16(b, limbs):
            c = jax.lax.dot_general(a16, p, dims,
                                    preferred_element_type=out_dtype)
            out = c if out is None else out + c
    else:
        b16 = b.astype(jnp.bfloat16)
        out = None
        for p in _split_bf16(a, limbs):
            c = jax.lax.dot_general(p, b16, dims,
                                    preferred_element_type=out_dtype)
            out = c if out is None else out + c
    return out


def _bit_groups(n_bits: int):
    """Split n_bits into groups of <= _LANE_BITS, LSB group first."""
    groups = []
    remaining = n_bits
    while remaining > 0:
        g = min(remaining, _LANE_BITS)
        groups.append(g)
        remaining -= g
    return groups  # [lsb group, ..., msb group]


def _xor_permute_hybrid(psi, x, z=None):
    """Alternative formulation: lane-group XOR as one signed permutation
    matmul, row-bit XORs as conditional flips.  More array passes than the
    group-matmul path (kept for reference/experiments; not auto-selected)."""
    N = psi.shape[-1]
    n_bits = N.bit_length() - 1
    lane_bits = min(n_bits, _LANE_BITS)
    row_bits = n_bits - lane_bits
    lanes = 1 << lane_bits

    t = psi.reshape((2,) + (2,) * row_bits + (lanes,))
    for r in range(row_bits):
        bit = (x >> (n_bits - 1 - r)) & 1
        t = jnp.where(bit.astype(bool), jnp.flip(t, axis=r + 1), t)
    t = t.reshape(2, N // lanes, lanes)
    li = jax.lax.iota(jnp.int32, lanes)
    P = ((li[:, None] ^ li[None, :]) == (x & (lanes - 1))).astype(psi.dtype)
    if z is not None:
        zg = z & (lanes - 1)
        sgn = (1.0 - 2.0 * (jax.lax.population_count(li & zg) & 1)
               ).astype(psi.dtype)
        P = P * sgn[None, :]
    out = jax.lax.dot_general(t, P, (((2,), (0,)), ((), ())),
                              preferred_element_type=psi.dtype,
                              precision=jax.lax.Precision.HIGHEST)
    out = out.reshape(2, N)
    if z is not None and row_bits > 0:
        # row part of the sign (lane part folded into P above)
        idx_rows = jax.lax.iota(jnp.int32, N // lanes)
        z_rows = z >> lane_bits
        sgn_rows = (1.0 - 2.0 * (jax.lax.population_count(idx_rows & z_rows)
                                 & 1)).astype(psi.dtype)
        out = (out.reshape(2, N // lanes, lanes)
               * sgn_rows[None, :, None]).reshape(2, N)
    return out


def _xor_permute(psi, x, z=None):
    """s_z(j) * psi[..., j ^ x] over the flat amplitude axis, gather-free:
    the XOR is applied one bit-group at a time as a (2^g x 2^g) signed
    permutation matmul on the MXU, with each P built in-program from the
    dynamic masks.  The sign (-1)^popcount(j & z) factorizes over bit groups
    and is folded into each group's P — zero extra array passes."""
    N = psi.shape[-1]
    n_bits = N.bit_length() - 1
    groups = _bit_groups(n_bits)            # lsb-first
    dims = tuple(1 << g for g in reversed(groups))  # msb-first axis sizes
    t = psi.reshape((2,) + dims)
    shift = 0
    for gi, g in enumerate(groups):          # lsb group = last axis
        size = 1 << g
        axis = 1 + (len(groups) - 1 - gi)
        xg = (x >> shift) & (size - 1)
        li = jax.lax.iota(jnp.int32, size)
        P = ((li[:, None] ^ li[None, :]) == xg).astype(psi.dtype)
        if z is not None:
            zg = (z >> shift) & (size - 1)
            sgn = (1.0 - 2.0 * (jax.lax.population_count(li & zg) & 1)
                   ).astype(psi.dtype)
            P = P * sgn[None, :]
        # single-pass bf16 would be catastrophic for a statevector
        # permutation; exact_dot does HIGHEST or limb-split per the engine
        # matmul mode (P is the exact {0,+-1} side)
        t = jnp.moveaxis(
            exact_dot(jnp.moveaxis(t, axis, -1), P,
                      (((t.ndim - 1,), (0,)), ((), ())),
                      exact_side="b", out_dtype=psi.dtype),
            -1, axis)
        shift += g
    return t.reshape(2, N)


def _signed_gather(psi, x, z):
    """s(j) * psi[j ^ x] on both planes; s(j) = (-1)^popcount(j & z)."""
    if _use_mxu_xor():
        return _xor_permute(psi, x, z)
    idx = _indices(psi.shape[1])
    sgn = (1.0 - 2.0 * (jax.lax.population_count(idx & z) & 1)).astype(psi.dtype)
    return sgn[None, :] * psi[:, idx ^ x]


def _cmul_planes(t, c_re, c_im):
    """(c_re + i c_im) * t for planes t."""
    return jnp.stack([c_re * t[0] - c_im * t[1],
                      c_re * t[1] + c_im * t[0]])


def pauli_apply_single(psi, x, z, k_re, k_im):
    """kappa * sigma0 |psi> for one compiled Pauli string (masks traced
    scalars; kappa = (-i)^nY given as its real/imag parts)."""
    return _cmul_planes(_signed_gather(psi, x, z), k_re, k_im)


def pauli_rotation(psi, angle, x, z, k_re, k_im):
    """exp(i * angle * kappa-sigma) |psi> (exact: (kappa sigma)^2 = I for
    Hermitian terms)."""
    sp = pauli_apply_single(psi, x, z, k_re, k_im)
    c, s = jnp.cos(angle), jnp.sin(angle)
    # cos(a) psi + i sin(a) (sigma psi):  i*(x+iy) = (-y, x)
    return jnp.stack([c * psi[0] - s * sp[1],
                      c * psi[1] + s * sp[0]])


def _unrotate_with(psi, sp, angle):
    """R^dagger psi given sigma|psi> already computed."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack([c * psi[0] + s * sp[1],
                      c * psi[1] - s * sp[0]])


# ----------------------------------------------------------- ansatz apply

def apply_ops(psi, theta, x, z, k_re, k_im, w, op_index, reverse: bool = False,
              sign: float = 1.0):
    """Apply prod_t exp(-i sign * theta[op(t)] w_t sigma_t) via scan.

    Evolution convention: exp(-i theta G) for a Hermitian generator
    G = i(T - T†), i.e. exp(theta (T - T†)) — matching the reference's
    sparse path expm_multiply(theta A) (fermionic_adapt_vqe.py:12-38) and
    its circuit path, so MP2 initial parameters land on the correct side
    of HF."""
    psi = jnp.asarray(psi)

    def step(p, term):
        xt, zt, kr, ki, wt, ot = term
        angle = -sign * theta[ot] * wt
        return pauli_rotation(p, angle, xt, zt, kr, ki), None

    out, _ = jax.lax.scan(step, psi, (x, z, k_re, k_im, w, op_index),
                          reverse=reverse)
    return out


# ------------------------------------------------------------- expectation

def ham_apply(psi, x, z, a_re, a_im, c_re, c_im):
    """H|psi> = const*psi + sum_k a_k sigma0_k|psi> (a = w * kappa folded)."""
    psi = jnp.asarray(psi)

    def step(acc, term):
        xt, zt, ar, ai = term
        t = _signed_gather(psi, xt, zt)
        return acc + _cmul_planes(t, ar, ai), None

    acc0 = _cmul_planes(psi, c_re, c_im)
    out, _ = jax.lax.scan(step, acc0, (x, z, a_re, a_im))
    return out


def expectation(psi, x, z, a_re, a_im, c_re, c_im):
    """Re <psi|H|psi>."""
    psi = jnp.asarray(psi)

    def step(acc, term):
        xt, zt, ar, ai = term
        t = _signed_gather(psi, xt, zt)
        # Re <psi| (ar + i ai) |t> = ar*Re<psi|t> - ai*Im<psi|t>
        re_ov = jnp.sum(psi[0] * t[0] + psi[1] * t[1])
        im_ov = jnp.sum(psi[0] * t[1] - psi[1] * t[0])
        return acc + ar * re_ov - ai * im_ov, None

    # accumulate the Pauli terms from zero and add the (often large) identity
    # offset at the end — keeps f32 accumulation away from catastrophic
    # cancellation against e.g. the -3683 Ha constant of the battery app
    zero = jnp.zeros((), dtype=psi.dtype)
    tot, _ = jax.lax.scan(step, zero, (x, z, a_re, a_im))
    return tot + c_re * jnp.sum(psi * psi)


def overlap_re_im(bra, ket):
    """(Re, Im) of <bra|ket> for plane states."""
    re = jnp.sum(bra[0] * ket[0] + bra[1] * ket[1])
    im = jnp.sum(bra[0] * ket[1] - bra[1] * ket[0])
    return re, im


# ------------------------------------------------- energy with adjoint grad

def _adjoint_sweep(theta, psi, lam, x, z, k_re, k_im, w, op_index):
    """Shared reverse sweep: walks the rotation sequence backwards from
    (psi_K, lam_K) and accumulates dE/dtheta."""
    def step(carry, term):
        p, l, grad = carry
        xt, zt, kr, ki, wt, ot = term
        angle = -theta[ot] * wt      # forward rotation angle (see apply_ops)
        sp = pauli_apply_single(p, xt, zt, kr, ki)
        # E depends on the rotation angle a via dE/da = -2 Im <lam|sigma psi>;
        # with a = -theta*w the theta-gradient is +2 Im <lam|sigma psi> * w
        _, im_ov = overlap_re_im(l, sp)
        gt = 2.0 * im_ov * wt
        p_prev = _unrotate_with(p, sp, angle)
        l_prev = pauli_rotation(l, -angle, xt, zt, kr, ki)
        grad = grad.at[ot].add(gt)
        return (p_prev, l_prev, grad), None

    grad0 = jnp.zeros_like(theta)
    (_, _, grad), _ = jax.lax.scan(
        step, (psi, lam, grad0), (x, z, k_re, k_im, w, op_index), reverse=True)
    return grad


def build_energy_fn(psi0, seq: CompiledOpSequence, ham: CompiledPauliSum,
                    cdtype=None):
    """(jitted energy(theta), jitted forward(theta)) with a reversible
    adjoint custom VJP — O(1) state memory."""
    sx, sz, skr, ski, sw, sop = seq_as_device(seq, cdtype)
    hx, hz, har, hai, hcr, hci = as_device(ham, cdtype)
    psi0 = np.asarray(psi0)

    def _forward(theta):
        return apply_ops(psi0, theta, sx, sz, skr, ski, sw, sop)

    @jax.custom_vjp
    def energy(theta):
        return expectation(_forward(theta), hx, hz, har, hai, hcr, hci)

    def fwd(theta):
        psi = _forward(theta)
        return expectation(psi, hx, hz, har, hai, hcr, hci), (theta, psi)

    def bwd(res, g):
        theta, psi = res
        lam = ham_apply(psi, hx, hz, har, hai, hcr, hci)
        grad = _adjoint_sweep(theta, psi, lam, sx, sz, skr, ski, sw, sop)
        return (grad * g,)

    energy.defvjp(fwd, bwd)
    return jax.jit(energy), jax.jit(_forward)


# ----------------------------------------------- dynamic-ansatz energy+grad

def build_dynamic_energy_fn(ham: CompiledPauliSum, cdtype=None):
    """Jitted (energy, energy_and_grad) with the ROTATION SEQUENCE AS
    ARGUMENTS (padded, dynamic data): one compilation serves every ansatz
    whose padded term count matches — ADAPT outer loops and experiment
    sweeps reuse the same executable.  Padding terms carry w=0/op_index=0:
    zero rotation, zero gradient."""
    hx, hz, har, hai, hcr, hci = as_device(ham, cdtype)

    @jax.jit
    def energy(theta, psi0, sx, sz, skr, ski, sw, sop):
        psi = apply_ops(psi0, theta, sx, sz, skr, ski, sw, sop)
        return expectation(psi, hx, hz, har, hai, hcr, hci)

    @jax.jit
    def energy_and_grad(theta, psi0, sx, sz, skr, ski, sw, sop):
        psi = apply_ops(psi0, theta, sx, sz, skr, ski, sw, sop)
        e = expectation(psi, hx, hz, har, hai, hcr, hci)
        lam = ham_apply(psi, hx, hz, har, hai, hcr, hci)
        grad = _adjoint_sweep(theta, psi, lam, sx, sz, skr, ski, sw, sop)
        return e, grad

    return energy, energy_and_grad


def pad_sequence(seq: CompiledOpSequence, k_pad: int,
                 n_ops_pad: int | None = None) -> CompiledOpSequence:
    """Pad flat term arrays to k_pad so differently-sized ansaetze share one
    jit executable (identity terms: masks 0, w 0, op_index 0)."""
    k = seq.n_terms
    if k_pad < k:
        raise ValueError(f"k_pad={k_pad} < n_terms={k}")
    pad = k_pad - k
    return CompiledOpSequence(
        n=seq.n,
        x=np.pad(seq.x, (0, pad)),
        z=np.pad(seq.z, (0, pad)),
        kappa=np.pad(seq.kappa, (0, pad), constant_values=1.0),
        w=np.pad(seq.w, (0, pad)),
        op_index=np.pad(seq.op_index, (0, pad)),
        n_ops=n_ops_pad if n_ops_pad is not None else seq.n_ops,
    )


def bucket_size(k: int, minimum: int = 8) -> int:
    b = minimum
    while b < k:
        b *= 2
    return b


# ------------------------------------------------------ segmented execution
#
# The axon backend enforces a per-device-call execution budget (calls much
# past ~10 s kill the worker).  For large statevectors the Hamiltonian and
# ansatz term scans are therefore SEGMENTED: fixed-shape jitted pieces are
# called repeatedly from the host, carrying (psi / lambda / grad) device
# arrays between calls.  Segment shapes are padded so every segment reuses
# one executable.

# work budget per device call, in (terms x amplitudes) units; an H10-scale
# call (3e10) measured ~8 s on v5e — stay a factor ~2 under that
_CALL_WORK_BUDGET = 1.6e10


def segment_size(n: int, minimum: int = 256) -> int:
    """Terms per device call for an n-qubit state."""
    k = int(_CALL_WORK_BUDGET / float(1 << n))
    k = max(k, minimum)
    return 1 << (k.bit_length() - 1)  # round down to a power of two


def build_segmented_energy_fn(ham: CompiledPauliSum, cdtype=None,
                              seg: int | None = None):
    """Segmented (energy, energy_and_grad) for large n: same math as
    build_dynamic_energy_fn, executed as a host loop over fixed-shape jitted
    segment programs."""
    n = ham.n
    K = ham.n_terms
    if seg is None:
        # cap by the actual term count: no point padding past one segment
        seg = min(segment_size(n), bucket_size(max(K, 1)))
    rd = default_rdtype()

    # pad the Hamiltonian into (n_seg, seg) blocks (zero-coefficient padding)
    n_seg = max(1, -(-K // seg))
    pad = n_seg * seg - K
    a = ham.coeffs()
    hx = np.pad(ham.x, (0, pad)).reshape(n_seg, seg)
    hz = np.pad(ham.z, (0, pad)).reshape(n_seg, seg)
    har = np.pad(np.real(a).astype(rd), (0, pad)).reshape(n_seg, seg)
    hai = np.pad(np.imag(a).astype(rd), (0, pad)).reshape(n_seg, seg)
    c_re = np.asarray(np.real(ham.const), dtype=rd)

    @jax.jit
    def _expect_seg(psi, acc, x, z, ar, ai):
        def step(a_, term):
            xt, zt, art, ait = term
            t = _signed_gather(psi, xt, zt)
            re_ov = jnp.sum(psi[0] * t[0] + psi[1] * t[1])
            im_ov = jnp.sum(psi[0] * t[1] - psi[1] * t[0])
            return a_ + art * re_ov - ait * im_ov, None
        out, _ = jax.lax.scan(step, acc, (x, z, ar, ai))
        return out

    @jax.jit
    def _ham_seg(psi, acc, x, z, ar, ai):
        def step(a_, term):
            xt, zt, art, ait = term
            t = _signed_gather(psi, xt, zt)
            return a_ + _cmul_planes(t, art, ait), None
        out, _ = jax.lax.scan(step, acc, (x, z, ar, ai))
        return out

    @jax.jit
    def _apply_seg(psi, theta, x, z, kr, ki, w, op):
        return apply_ops(psi, theta, x, z, kr, ki, w, op)

    @jax.jit
    def _adjoint_seg(theta, p, l, grad, x, z, kr, ki, w, op):
        def step(carry, term):
            p_, l_, g_ = carry
            xt, zt, krt, kit, wt, ot = term
            angle = -theta[ot] * wt
            sp = pauli_apply_single(p_, xt, zt, krt, kit)
            _, im_ov = overlap_re_im(l_, sp)
            gt = 2.0 * im_ov * wt
            p_prev = _unrotate_with(p_, sp, angle)
            l_prev = pauli_rotation(l_, -angle, xt, zt, krt, kit)
            return (p_prev, l_prev, g_.at[ot].add(gt)), None
        (p, l, grad), _ = jax.lax.scan(step, (p, l, grad),
                                       (x, z, kr, ki, w, op), reverse=True)
        return p, l, grad

    def _seq_segments(seq_args):
        sx, sz, skr, ski, sw, sop = seq_args
        Kq = len(sx)
        ns = max(1, -(-Kq // seg))
        padq = ns * seg - Kq
        return (np.pad(sx, (0, padq)).reshape(ns, seg),
                np.pad(sz, (0, padq)).reshape(ns, seg),
                np.pad(skr, (0, padq), constant_values=1.0).reshape(ns, seg),
                np.pad(ski, (0, padq)).reshape(ns, seg),
                np.pad(sw, (0, padq)).reshape(ns, seg),
                np.pad(sop, (0, padq)).reshape(ns, seg))

    def forward(theta, psi0, seq_args):
        segs = _seq_segments(seq_args)
        psi = jnp.asarray(psi0)
        theta = jnp.asarray(theta, dtype=float)
        for i in range(segs[0].shape[0]):
            psi = _apply_seg(psi, theta, *(s[i] for s in segs))
        return psi

    def _expectation(psi):
        acc = jnp.zeros((), dtype=psi.dtype)
        for i in range(n_seg):
            acc = _expect_seg(psi, acc, hx[i], hz[i], har[i], hai[i])
        return float(acc) + float(c_re) * float(jnp.sum(psi * psi))

    def _lham(psi):
        acc = _cmul_planes(psi, jnp.asarray(c_re, psi.dtype),
                           jnp.asarray(0.0, psi.dtype))
        for i in range(n_seg):
            acc = _ham_seg(psi, acc, hx[i], hz[i], har[i], hai[i])
        return acc

    def energy(theta, psi0, seq_args):
        return _expectation(forward(theta, psi0, seq_args))

    def energy_and_grad(theta, psi0, seq_args):
        theta = jnp.asarray(theta, dtype=float)
        psi = forward(theta, psi0, seq_args)
        e = _expectation(psi)
        lam = _lham(psi)
        segs = _seq_segments(seq_args)
        grad = jnp.zeros(theta.shape, dtype=default_rdtype())
        p, l = psi, lam
        for i in reversed(range(segs[0].shape[0])):
            p, l, grad = _adjoint_seg(theta, p, l, grad,
                                      *(s[i] for s in segs))
        return e, np.asarray(grad, dtype=float)

    return energy, energy_and_grad, forward


# -------------------------------------------------- batched ADAPT screening

def pool_overlaps(psi, sigma, x, z, a_re, a_im, op_index, n_ops: int):
    """(Re, Im) of v_i = <sigma| A_i |psi> for every pool operator in ONE
    fused pass — replaces the reference's per-operator sparse-matvec loops
    (adapt/fermionic_adapt_vqe.py:110-122, adapt/qubit_adapt_vqe.py:462-470,
    which even rebuilds per-op 2^n CSR matrices every outer iteration)."""
    psi = jnp.asarray(psi)
    sigma = jnp.asarray(sigma)

    def step2(acc, term):
        xt, zt, ar, ai, ot = term
        t = _signed_gather(psi, xt, zt)
        re_ov, im_ov = overlap_re_im(sigma, t)
        acc_re, acc_im = acc
        acc_re = acc_re.at[ot].add(ar * re_ov - ai * im_ov)
        acc_im = acc_im.at[ot].add(ar * im_ov + ai * re_ov)
        return (acc_re, acc_im), None

    z0 = jnp.zeros(n_ops, dtype=psi.dtype)
    (vre, vim), _ = jax.lax.scan(step2, (z0, z0), (x, z, a_re, a_im, op_index))
    return vre, vim


def build_pool_gradient_fn(seq: CompiledOpSequence, ham: CompiledPauliSum,
                           cdtype=None):
    """host-complex overlaps v_i = <H psi|A_i psi> for a fixed pool +
    Hamiltonian (two jitted programs; results cross to host as real pairs)."""
    px, pz, pkr, pki, pw, pop = seq_as_device(seq, cdtype)
    rd = default_rdtype()
    wk = (seq.w * seq.kappa)
    pa_re = np.real(wk).astype(rd)
    pa_im = np.imag(wk).astype(rd)
    hx, hz, har, hai, hcr, hci = as_device(ham, cdtype)
    n_ops = seq.n_ops

    @jax.jit
    def _sigma(psi):
        return ham_apply(psi, hx, hz, har, hai, hcr, hci)

    @jax.jit
    def _overlaps(psi, sigma):
        vre, vim = pool_overlaps(psi, sigma, px, pz, pa_re, pa_im, pop, n_ops)
        return jnp.stack([vre, vim])

    def grads_host(psi) -> np.ndarray:
        psi = jnp.asarray(psi)
        out = np.asarray(_overlaps(psi, _sigma(psi)), dtype=np.float64)
        return out[0] + 1j * out[1]

    return grads_host


# -------------------------------------------------------------- gate layer

def apply_x(psi, q: int, n: int):
    idx = _indices(psi.shape[1])
    return psi[:, idx ^ (1 << (n - 1 - q))]


def _single_qubit_rotation(psi, theta, q: int, n: int, pauli: str):
    mask = 1 << (n - 1 - q)
    if pauli == "X":
        x, z, kr, ki = mask, 0, 1.0, 0.0
    elif pauli == "Y":
        x, z, kr, ki = mask, mask, 0.0, -1.0   # kappa = -i
    else:  # Z
        x, z, kr, ki = 0, mask, 1.0, 0.0
    return pauli_rotation(psi, -theta / 2.0, jnp.int32(x), jnp.int32(z),
                          jnp.asarray(kr, psi.dtype), jnp.asarray(ki, psi.dtype))


def apply_rx(psi, theta, q: int, n: int):
    return _single_qubit_rotation(psi, theta, q, n, "X")


def apply_ry(psi, theta, q: int, n: int):
    return _single_qubit_rotation(psi, theta, q, n, "Y")


def apply_rz(psi, theta, q: int, n: int):
    return _single_qubit_rotation(psi, theta, q, n, "Z")


def apply_h(psi, q: int, n: int):
    mask = 1 << (n - 1 - q)
    idx = _indices(psi.shape[1])
    bit = ((idx & mask) != 0)[None, :]
    flipped = psi[:, idx ^ mask]
    s = jnp.asarray(1.0 / np.sqrt(2.0), psi.dtype)
    return s * jnp.where(bit, flipped - psi, psi + flipped)


def apply_cnot(psi, control: int, target: int, n: int):
    idx = _indices(psi.shape[1])
    cmask = 1 << (n - 1 - control)
    tmask = 1 << (n - 1 - target)
    src = jnp.where((idx & cmask) != 0, idx ^ tmask, idx)
    return psi[:, src]


# ------------------------------------------------------------ host wrappers
#
# Operator arrays are HOST numpy arrays closed over by jitted functions
# (embedded as constants at trace time); everything is real-typed.

def as_device(csum: CompiledPauliSum, cdtype=None):
    rd = default_rdtype()
    a = csum.coeffs()
    return (csum.x, csum.z,
            np.real(a).astype(rd), np.imag(a).astype(rd),
            np.asarray(np.real(csum.const), dtype=rd),
            np.asarray(np.imag(csum.const), dtype=rd))


def seq_as_device(seq: CompiledOpSequence, cdtype=None):
    rd = default_rdtype()
    return (seq.x, seq.z,
            np.real(seq.kappa).astype(rd), np.imag(seq.kappa).astype(rd),
            np.real(seq.w).astype(rd), seq.op_index)
