"""The sparse-support oracle (sim/oracle.py) must agree exactly with the
single-device statevector engine — it is the independent arbiter the
multi-chip dry run checks the 2^30 sharded state against, so it gets its
own dual validation here at a size where the dense engine is cheap."""

import numpy as np
import pytest

from openvqe_tpu.ops.pauli import PauliSum
from openvqe_tpu.sim import oracle as orc
from openvqe_tpu.sim import statevector as sv
from openvqe_tpu.sim.compile import compile_op_sequence, compile_pauli_sum


def _random_problem(n, n_gens, n_ham, seed, multi_term_gens=False):
    rng = np.random.default_rng(seed)

    def rand_string(min_weight=1):
        while True:
            s = "".join(rng.choice(list("IXYZ"), p=[0.5, 0.17, 0.17, 0.16])
                        for _ in range(n))
            if n - s.count("I") >= min_weight:
                return s

    def hermitian_gen():
        # Hermitian PauliSum with real coefficients (what
        # compile_op_sequence requires); single- or two-term
        ps = PauliSum.from_term(n, float(rng.normal()), rand_string())
        if multi_term_gens:
            ps = ps + PauliSum.from_term(n, float(rng.normal()),
                                         rand_string())
        return ps

    gens = [hermitian_gen() for _ in range(n_gens)]
    ham = PauliSum.identity(n, float(rng.normal()))
    for _ in range(n_ham):
        ham = ham + PauliSum.from_term(n, float(rng.normal()),
                                       rand_string())
    theta = rng.normal(size=n_gens) * 0.4
    hf = int(rng.integers(0, 1 << n))
    return gens, ham, theta, hf


@pytest.mark.parametrize("multi", [False, True])
def test_oracle_matches_engine(multi):
    n = 10
    gens, ham, theta, hf = _random_problem(n, 4, 6, seed=3,
                                           multi_term_gens=multi)
    seq = compile_op_sequence(gens, n)
    cham = compile_pauli_sum(ham, n)

    energy, fwd = sv.build_energy_fn(sv.hf_state(n, hf), seq, cham)
    import jax
    import jax.numpy as jnp
    e_eng = float(energy(jnp.asarray(theta)))
    g_eng = np.asarray(jax.grad(lambda t: energy(t))(jnp.asarray(theta)))

    e_orc, g_orc = orc.sparse_energy_and_grad(theta, seq, cham, hf)
    assert abs(e_orc - e_eng) < 1e-9, (e_orc, e_eng)
    assert np.allclose(g_orc, g_eng, atol=1e-7), (g_orc, g_eng)

    # AMPLITUDE-level parity — the load-bearing assertion.  Energy alone
    # cannot distinguish exp(-i theta w sigma) (the engine's realized
    # sign) from exp(+i...): <psi*|H|psi*> == <psi|H|psi> for every
    # Hermitian H, and odd-Y pools turn the wrong sign into a mere
    # theta-reflection.  The +i variant shipped briefly and passed the
    # energy checks while diverging 6.7e-3 Ha on x-coupled Hamiltonians.
    planes = np.asarray(fwd(jnp.asarray(theta)))
    psi_eng = planes[0] + 1j * planes[1]
    state = orc.sparse_forward(theta, seq, hf)
    for b, a in state.items():
        assert abs(a - psi_eng[b]) < 1e-9, (b, a, psi_eng[b])
    # everything outside the oracle support must be zero
    mask = np.ones(1 << n, bool)
    mask[list(state)] = False
    assert np.max(np.abs(psi_eng[mask])) < 1e-12


def test_oracle_sign_catches_x_coupled_hamiltonian():
    """The failure shape that exposed the sign: off-diagonal H terms
    whose XOR mask EQUALS a generator's (so <psi|H|psi> actually sees
    the flipped amplitudes) — regression for the H16 mesh-check bug."""
    import jax
    import jax.numpy as jnp

    n = 8
    rng = np.random.default_rng(11)
    gens = []
    for qs in ([0, 1, 2, 3], [2, 3, 4, 5]):
        s1 = ["I"] * n
        s2 = ["I"] * n
        for q in qs[:3]:
            s1[q] = "X"
            s2[q] = "Y"
        s1[qs[3]] = "Y"
        s2[qs[3]] = "X"
        gens.append(PauliSum.from_term(n, float(rng.normal() * 0.4),
                                       "".join(s1))
                    + PauliSum.from_term(n, float(rng.normal() * 0.4),
                                         "".join(s2)))
    ham = PauliSum.identity(n, 0.1)
    zs = ["I"] * n
    zs[1] = "Z"
    ham = ham + PauliSum.from_term(n, 0.8, "".join(zs))
    for g in gens:                       # x-matched off-diagonal terms
        (x, z), _c = next(iter(g))
        from openvqe_tpu.ops.pauli import xz_to_string
        chars, _ph = xz_to_string(x, z, n)
        # the Pauli STRING with a real coefficient is Hermitian by itself
        ham = ham + PauliSum.from_term(n, 0.6, chars)
    theta = rng.normal(size=2) * 0.4
    hf = 0b0011

    seq = compile_op_sequence(gens, n)
    cham = compile_pauli_sum(ham, n)
    energy, _ = sv.build_energy_fn(sv.hf_state(n, hf), seq, cham)
    e_eng = float(energy(jnp.asarray(theta)))
    g_eng = np.asarray(jax.grad(lambda t: energy(t))(jnp.asarray(theta)))
    e_orc, g_orc = orc.sparse_energy_and_grad(theta, seq, cham, hf)
    assert abs(e_orc - e_eng) < 1e-9, (e_orc, e_eng)
    assert np.linalg.norm(g_eng) > 1e-3          # non-vacuous
    assert np.allclose(g_orc, g_eng, atol=1e-7), (g_orc, g_eng)


def test_oracle_support_is_sparse():
    n = 30   # full state would be 8 GiB — the oracle never touches it
    gens, ham, theta, hf = _random_problem(n, 2, 4, seed=7)
    seq = compile_op_sequence(gens, n)
    cham = compile_pauli_sum(ham, n)
    state = orc.sparse_forward(theta, seq, hf)
    assert len(state) <= 4
    assert abs(sum(abs(a) ** 2 for a in state.values()) - 1.0) < 1e-12
    e, g = orc.sparse_energy_and_grad(theta, seq, cham, hf)
    assert np.isfinite(e) and np.all(np.isfinite(g))
