"""Field-value-mode rotation kernels (grouped.rot_cos_sin).

The rotation kernels may replace full-state elementwise cos/sin with an
even/odd interpolation in the field F whenever the host proves F takes only
small-integer values (grouped.group_field_mode: GF(2)-span enumeration of
achievable sign patterns).  UCCSD / sUPCCGSD groups are exact Givens
rotations (F in {-1,0,1} -> fmode 1); spin_complement_gsd reaches fmode 2;
singlet_sd carries irrational 1/sqrt(12) coefficients -> fmode 0 (general
kernel).  Reference semantics: same Trotter-1 evolutions as
get_energy_ucc.py:42-49 — the mode only changes HOW cos/sin are evaluated.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openvqe_tpu.sim import grouped as gr
from openvqe_tpu.sim import streaming as st
from openvqe_tpu.sim.compile import compile_op_sequence


def _grouped(mol, gen, mult=1j):
    from openvqe_tpu.models.molecule_factory import MoleculeFactory
    out = MoleculeFactory().generate_cluster_ops(mol, gen, "JW")
    pool = [op * mult for op in out[2]]
    n = pool[0].nbqbits
    return gr.group_op_sequence(compile_op_sequence(pool, n)), n


def test_field_mode_detection():
    gs, _ = _grouped("H4", "UCCSD")
    assert gs.fmode == 1
    gs, _ = _grouped("H4", "spin_complement_gsd")
    assert gs.fmode == 2
    gs, _ = _grouped("H4", "singlet_sd")
    assert gs.fmode == 0


def test_group_field_mode_exact_enumeration():
    # single Pauli string, s=+-1: always fmode 1
    assert gr.group_field_mode(np.array([0b1011]), np.array([1.0])) == 1
    # two strings with s=1/2 each and INDEPENDENT z-bits reach +-1 and 0
    assert gr.group_field_mode(np.array([0b01, 0b10]),
                               np.array([0.5, 0.5])) == 1
    # same but s=1.0 each reaches +-2
    assert gr.group_field_mode(np.array([0b01, 0b10]),
                               np.array([1.0, 1.0])) == 2
    # irrational coefficient -> not provably integer
    assert gr.group_field_mode(np.array([0b01, 0b10]),
                               np.array([0.5, 1 / np.sqrt(2)])) == 0
    # IDENTICAL z-masks: achievable sums are +-(a+b) only — integer
    assert gr.group_field_mode(np.array([0b11, 0b11]),
                               np.array([0.75, 0.25])) == 1
    # all-zero coefficients (padding): identity group
    assert gr.group_field_mode(np.array([0b11]), np.array([0.0])) == 1


def test_rot_cos_sin_values():
    ang = jnp.float32(0.37)
    for fmode, fmax in ((1, 1), (2, 2)):
        F = jnp.asarray(np.arange(-fmax, fmax + 1, dtype=np.float32))
        c, s = gr.rot_cos_sin(ang, F, fmode)
        np.testing.assert_allclose(np.asarray(c), np.cos(0.37 * np.asarray(F)),
                                   rtol=0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(s), np.sin(0.37 * np.asarray(F)),
                                   rtol=0, atol=1e-7)


@pytest.mark.parametrize("gen,mol", [("UCCSD", "H4"),
                                     ("spin_complement_gsd", "H4")])
def test_poly_vs_trig_grouped_parity(gen, mol):
    gs, n = _grouped(mol, gen)
    assert gs.fmode > 0
    rd = gs.s.dtype          # engine real dtype (f64 under the test conftest)
    rng = np.random.RandomState(3)
    theta = jnp.asarray(rng.uniform(-0.5, 0.5, gs.n_ops).astype(rd))
    psi0 = rng.normal(size=(2, 2 ** n)).astype(rd)
    psi0 /= np.linalg.norm(psi0)
    a0 = np.asarray(gr.apply_grouped_ops(psi0, theta, *gr.seq_as_device(gs),
                                         fmode=0))
    a1 = np.asarray(gr.apply_grouped_ops(psi0, theta, *gr.seq_as_device(gs),
                                         fmode=gs.fmode))
    np.testing.assert_allclose(a1, a0, rtol=0, atol=5e-6)
    # adjoint parity (state and gradient)
    lam = rng.normal(size=(2, 2 ** n)).astype(rd)
    g0 = jnp.zeros(gs.n_ops, rd)
    r0 = gr.grouped_adjoint_sweep(theta, jnp.asarray(a0), jnp.asarray(lam),
                                  g0, *gr.seq_as_device(gs), fmode=0)
    r1 = gr.grouped_adjoint_sweep(theta, jnp.asarray(a1), jnp.asarray(lam),
                                  g0, *gr.seq_as_device(gs), fmode=gs.fmode)
    for x, y in zip(r0, r1):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=0, atol=5e-5)


def test_poly_streaming_kernels_interpret():
    """Streaming rotation/adjoint/fused kernels, fmode 1 vs the XLA grouped
    reference (single-Pauli groups: F in {-1, +1} exactly)."""
    rng = np.random.RandomState(1)
    n = st.MIN_N
    G = 12
    x = rng.randint(1, 2 ** n, size=G).astype(np.int64)
    z = rng.randint(0, 2 ** n, size=(G, 1)).astype(np.int64)
    coef = np.ones((G, 1), np.float32)
    op = np.arange(G, dtype=np.int32)
    theta = jnp.asarray(rng.uniform(-0.5, 0.5, G).astype(np.float32))
    psi = rng.normal(size=(2, 2 ** n)).astype(np.float32)
    psi /= np.linalg.norm(psi)
    ref = np.asarray(gr.apply_grouped_ops(
        psi, theta, x.astype(np.int32), z.astype(np.int32), coef, op))

    sd = st.build_stream_data(n, x, z, coef, op=op, fmode=1)
    out = np.asarray(st.apply_grouped_ops_stream(
        psi, theta, *st.seq_stream_args(sd), interpret=True, fmode=1))
    np.testing.assert_allclose(out, ref, rtol=0, atol=2e-7)

    # fused rotation
    sdf = st.build_stream_data(n, x, z, coef, op=op,
                               chunk_bits=st.FUSED_CHUNK_BITS, fmode=1)
    fb = st.build_seq_buckets(sdf)
    outf = np.asarray(st.apply_grouped_ops_fused(
        psi, theta, *fb, interpret=True, fmode=1))
    np.testing.assert_allclose(outf, ref, rtol=0, atol=2e-7)

    # adjoint (per-group streaming)
    lam = rng.normal(size=(2, 2 ** n)).astype(np.float32)
    g0 = jnp.zeros(G, jnp.float32)
    pr, lr, gref = gr.grouped_adjoint_sweep(
        theta, jnp.asarray(ref), jnp.asarray(lam), g0,
        x.astype(np.int32), z.astype(np.int32), coef, op)
    sda = st.build_stream_data(
        n, x[::-1].copy(), z[::-1].copy(), coef[::-1].copy(),
        op=op[::-1].copy(), chunk_bits=st.ADJ_CHUNK_BITS, fmode=1)
    xh, mb, nout, xc, xm, xl, opo, zr, zc, cre = st.seq_stream_args(sda)
    ang = -np.asarray(theta)[np.asarray(opo)]
    p2, l2, gts = st.adjoint_sweep_stream(
        jnp.asarray(ref), jnp.asarray(lam), xh, mb, nout, xc, xm, xl, ang,
        zr, zc, cre, interpret=True, fmode=1)
    gsum = np.zeros(G, np.float32)
    np.add.at(gsum, np.asarray(opo), np.asarray(gts))
    np.testing.assert_allclose(np.asarray(p2), np.asarray(pr),
                               rtol=0, atol=2e-7)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(lr),
                               rtol=0, atol=2e-7)
    np.testing.assert_allclose(gsum, np.asarray(gref), rtol=0, atol=1e-5)

    # fused adjoint
    ab = st.build_seq_buckets(st._reverse_sd(sdf))
    p3, l3, gts3 = st.adjoint_sweep_fused(
        jnp.asarray(ref), jnp.asarray(lam), theta, *ab, interpret=True,
        fmode=1)
    gsum3 = np.zeros(G, np.float32)
    np.add.at(gsum3, np.asarray(ab[3]).ravel(),
              (np.asarray(gts3) * np.asarray(ab[7])).ravel())
    np.testing.assert_allclose(np.asarray(p3), np.asarray(pr),
                               rtol=0, atol=2e-7)
    np.testing.assert_allclose(gsum3, np.asarray(gref), rtol=0, atol=1e-5)


def test_objective_poly_vs_trig(monkeypatch):
    """VQEObjective with auto fmode vs OVQE_FMODE=0 (trig kernels): same
    energies and gradients to f32 rounding on H4 UCCSD."""
    from openvqe_tpu.models.molecule_factory import MoleculeFactory
    from openvqe_tpu.sim.objective import VQEObjective

    f = MoleculeFactory()
    pool = f.generate_cluster_ops("H4", "UCCSD")[2]
    out = f.generate_hamiltonian("H4")
    hamiltonian_sp = out[1]
    hf = f.find_hf_init(out[0], out[2], out[3], out[4])
    gens = [op * 1j for op in pool]
    rng = np.random.RandomState(0)
    theta = rng.uniform(-0.1, 0.1, len(gens))

    bound = VQEObjective(hamiltonian_sp).bind(gens, hf)
    assert bound._fmode == 1
    e1, g1 = bound.energy_and_grad(theta)

    monkeypatch.setenv("OVQE_FMODE", "0")
    bound0 = VQEObjective(hamiltonian_sp).bind(gens, hf)
    assert bound0._fmode == 0
    e0, g0 = bound0.energy_and_grad(theta)

    assert abs(e1 - e0) < 5e-6
    np.testing.assert_allclose(g1, g0, rtol=0, atol=5e-5)
