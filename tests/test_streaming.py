"""Parity tests for the streaming (HBM-resident) Pallas kernels against the
XLA grouped path — interpret mode on the CPU mesh (hardware parity is
asserted by scripts/tpu_smoke.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openvqe_tpu.sim import grouped as gr
from openvqe_tpu.sim import streaming as st

N = 18  # smallest size with chunk pairing (T=16 tiles, C=8, H=2 chunks)


def _random_groups(rng, G, K, n, odd_y=True):
    """Random grouped term arrays (x (G,), z (G,K), coef (G,K))."""
    x = rng.integers(0, 1 << n, size=G).astype(np.int32)
    x[0] = 0                                   # exercise the x_top==0 path
    x[1] = 3                                   # in-tile only
    x[2] = (5 << st.TILE_BITS) | 9             # in-chunk tile bits + in-tile
    z = rng.integers(0, 1 << n, size=(G, K)).astype(np.int32)
    coef = rng.normal(size=(G, K)).astype(np.float32) * 0.3
    return x, z, coef


def _random_state(rng, n):
    psi = rng.normal(size=(2, 1 << n)).astype(np.float32)
    psi /= np.linalg.norm(psi)
    return psi


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(7)
    G, K = 6, 4
    x, z, coef = _random_groups(rng, G, K, N)
    op = np.arange(G, dtype=np.int32) % 3
    theta = rng.normal(size=3).astype(np.float32) * 0.2
    psi = _random_state(rng, N)
    return x, z, coef, op, theta, psi


def test_rotation_sweep_parity(data):
    x, z, coef, op, theta, psi = data
    ref = gr.apply_grouped_ops(jnp.asarray(psi), jnp.asarray(theta),
                               jnp.asarray(x), jnp.asarray(z),
                               jnp.asarray(coef), jnp.asarray(op))
    sd = st.build_stream_data(N, x, z, coef, op=op)
    out = st.apply_grouped_ops_stream(psi, theta, *st.seq_stream_args(sd),
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)


def test_expectation_parity(data):
    x, z, coef, op, theta, psi = data
    rng = np.random.default_rng(8)
    cim = rng.normal(size=coef.shape).astype(np.float32) * 0.1

    # reference: scan accumulation of the off-diagonal grouped expectation
    n = N
    R, lanes = gr._lane_split(n)
    tot = jnp.zeros((), jnp.float32)

    def step(acc, g):
        xg, zg, ar, ai = g
        px = gr.xor_perm(jnp.asarray(psi), xg)
        P = (psi[0] * px[0] + psi[1] * px[1]).reshape(R, lanes)
        Q = (psi[0] * px[1] - psi[1] * px[0]).reshape(R, lanes)
        acc = acc + jnp.sum(ar * gr._group_bilinear(P, zg, n))
        acc = acc - jnp.sum(ai * gr._group_bilinear(Q, zg, n))
        return acc, None

    ref, _ = jax.lax.scan(step, tot, (jnp.asarray(x), jnp.asarray(z),
                                      jnp.asarray(coef), jnp.asarray(cim)))

    sd = st.build_stream_data(N, x, z, coef, coef_im=cim)
    out = st.expectation_stream(psi, *st.ham_stream_args(sd), interpret=True)
    np.testing.assert_allclose(float(out), float(ref), rtol=0, atol=1e-5)


def test_expectation_herm_parity(data):
    """herm=True (one contrib doubled per chunk pair) must match the
    general path on HERMITIAN groups: row (cre + i cim) X^x Z^z is
    self-adjoint iff the imaginary part sits exactly on the rows with
    odd parity(x & z) — the structure every compiled real-coefficient
    Hamiltonian has."""
    x, z, coef, op, theta, psi = data
    parity = np.zeros_like(z)
    for g in range(z.shape[0]):
        parity[g] = [bin(int(x[g]) & int(zk)).count("1") & 1 for zk in z[g]]
    cre = np.where(parity == 0, coef, 0.0).astype(np.float32)
    cim = np.where(parity == 1, coef, 0.0).astype(np.float32)

    sd = st.build_stream_data(N, x, z, cre, coef_im=cim)
    ref = st.expectation_stream(psi, *st.ham_stream_args(sd),
                                interpret=True, herm=False)
    out = st.expectation_stream(psi, *st.ham_stream_args(sd),
                                interpret=True, herm=True)
    np.testing.assert_allclose(float(out), float(ref), rtol=0, atol=1e-5)
    assert abs(float(ref)) > 1e-6          # non-trivial value


def test_ham_apply_parity(data):
    x, z, coef, op, theta, psi = data
    rng = np.random.default_rng(9)
    cim = rng.normal(size=coef.shape).astype(np.float32) * 0.1

    def step(a, g):
        xg, zg, ar, ai = g
        px = gr.xor_perm(jnp.asarray(psi), xg)
        w_re = gr._sign_field(zg, ar, N).reshape(-1)
        w_im = gr._sign_field(zg, ai, N).reshape(-1)
        a = a + jnp.stack([w_re * px[0] - w_im * px[1],
                           w_re * px[1] + w_im * px[0]])
        return a, None

    ref, _ = jax.lax.scan(step, jnp.zeros_like(jnp.asarray(psi)),
                          (jnp.asarray(x), jnp.asarray(z),
                           jnp.asarray(coef), jnp.asarray(cim)))

    sd = st.build_stream_data(N, x, z, coef, coef_im=cim)
    acc0 = np.zeros_like(psi)
    out = st.ham_apply_stream(psi, acc0, *st.ham_stream_args(sd),
                              interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_objective_streaming_end_to_end(monkeypatch):
    """VQEObjective with the streaming path forced (interpret mode on CPU)
    reproduces the XLA grouped objective: energy, gradient, ham services."""
    from openvqe_tpu.ops.pauli import PauliSum
    from openvqe_tpu.sim.objective import VQEObjective

    n = N
    rng = np.random.default_rng(3)
    ham = PauliSum.identity(n, 0.31)
    for _ in range(5):
        s = "".join(rng.choice(list("IXYZ")) for _ in range(n))
        ham = ham + PauliSum.from_term(n, float(rng.normal()), s)

    gens = []
    for _ in range(3):
        while True:
            s = "".join(rng.choice(list("IXYZ"), p=[0.6, 0.15, 0.15, 0.1])
                        for _ in range(n))
            if s.count("Y") % 2 == 1:
                break
        gens.append(PauliSum.from_term(n, 0.5, s))
    theta = rng.normal(size=3) * 0.3
    hf = 0b11

    # the CI mesh runs x64; the streaming path is f32-only, so force both
    # objectives to f32 for a like-for-like comparison
    import jax.numpy as jnp
    monkeypatch.setattr("openvqe_tpu.sim.statevector.default_rdtype",
                        lambda: np.float32)
    monkeypatch.setattr("openvqe_tpu.sim.grouped.default_rdtype",
                        lambda: np.float32)
    monkeypatch.setattr("openvqe_tpu.sim.statevector.default_cdtype",
                        lambda: jnp.complex64)

    ref_obj = VQEObjective(ham, segmented=True)
    assert not ref_obj._streaming
    e_ref, g_ref = ref_obj.bind(gens, hf).energy_and_grad(theta)

    monkeypatch.setattr("openvqe_tpu.sim.streaming.streaming_supported",
                        lambda n: True)
    st_obj = VQEObjective(ham, segmented=True)
    assert st_obj._streaming
    bound = st_obj.bind(gens, hf)
    assert bound._stargs is not None
    e_st, g_st = bound.energy_and_grad(theta)
    assert abs(e_st - e_ref) < 1e-5
    np.testing.assert_allclose(g_st, g_ref, rtol=1e-4, atol=1e-5)
    assert abs(bound.energy(theta) - e_ref) < 1e-5

    psi = np.asarray(ref_obj.bind(gens, hf).forward(theta))
    np.testing.assert_allclose(np.asarray(bound.forward(theta)), psi,
                               rtol=0, atol=1e-6)
    lam_ref = np.asarray(ref_obj.ham_apply(psi))
    lam_st = np.asarray(st_obj.ham_apply(psi))
    np.testing.assert_allclose(lam_st, lam_ref, rtol=1e-5, atol=1e-6)
    assert abs(st_obj.expectation(psi) - ref_obj.expectation(psi)) < 1e-5


def test_stream_policy_env(monkeypatch):
    """OVQE_STREAM policy wiring: 0 disables, force enables wherever
    supported (including non-segmented sizes)."""
    from openvqe_tpu.ops.pauli import PauliSum
    from openvqe_tpu.sim.objective import VQEObjective

    ham = PauliSum.identity(N, 0.1) + PauliSum.from_term(
        N, 0.5, "XX" + "I" * (N - 2))
    monkeypatch.setattr("openvqe_tpu.sim.streaming.streaming_supported",
                        lambda n: True)
    monkeypatch.setattr("openvqe_tpu.sim.statevector.default_rdtype",
                        lambda: np.float32)
    monkeypatch.setenv("OVQE_STREAM", "0")
    assert not VQEObjective(ham, segmented=True)._streaming
    monkeypatch.setenv("OVQE_STREAM", "force")
    obj = VQEObjective(ham, segmented=False)
    assert obj._streaming and not obj._pallas


def test_deep_pipeline_parity(data):
    """chunk_bits=1 at N=18 gives 8 chunks -> up to 8 outer iterations per
    group, executing the double-buffer wait paths (i >= 2 out-DMA waits,
    write-back-before-staging-reload) that the default geometry (2 chunks)
    leaves statically dead in CI."""
    x, z, coef, op, theta, psi = data
    ref = gr.apply_grouped_ops(jnp.asarray(psi), jnp.asarray(theta),
                               jnp.asarray(x), jnp.asarray(z),
                               jnp.asarray(coef), jnp.asarray(op))
    sd = st.build_stream_data(N, x, z, coef, op=op, chunk_bits=1)
    out = st.apply_grouped_ops_stream(psi, theta, *st.seq_stream_args(sd),
                                      interpret=True, chunk_bits=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-6)

    rng = np.random.default_rng(12)
    cim = rng.normal(size=coef.shape).astype(np.float32) * 0.1

    def step(a, g):
        xg, zg, ar, ai = g
        px = gr.xor_perm(jnp.asarray(psi), xg)
        w_re = gr._sign_field(zg, ar, N).reshape(-1)
        w_im = gr._sign_field(zg, ai, N).reshape(-1)
        a = a + jnp.stack([w_re * px[0] - w_im * px[1],
                           w_re * px[1] + w_im * px[0]])
        return a, None

    refh, _ = jax.lax.scan(step, jnp.zeros_like(jnp.asarray(psi)),
                           (jnp.asarray(x), jnp.asarray(z),
                            jnp.asarray(coef), jnp.asarray(cim)))
    sdh = st.build_stream_data(N, x, z, coef, coef_im=cim, chunk_bits=1)
    outh = st.ham_apply_stream(psi, np.zeros_like(psi),
                               *st.ham_stream_args(sdh), interpret=True,
                               chunk_bits=1)
    np.testing.assert_allclose(np.asarray(outh), np.asarray(refh),
                               rtol=0, atol=1e-5)


def test_pool_overlap_parity(data, monkeypatch):
    """Streaming ADAPT screen == the XLA grouped pool-gradient overlaps."""
    x, z, coef, op, theta, psi = data
    rng = np.random.default_rng(11)
    cim = rng.normal(size=coef.shape).astype(np.float32) * 0.1
    sigma = _random_state(rng, N)
    n_ops = 3

    from openvqe_tpu.sim.grouped import GroupedPool
    gpool = GroupedPool(n=N, x=x, z=z, a_re=coef, a_im=cim, op=op,
                        n_ops=n_ops)
    grads = st.build_streaming_pool_gradient_fn(
        gpool, lham=lambda p: jnp.asarray(sigma))
    v_st = grads(psi)

    # reference: explicit per-group overlaps on the scan path
    vre = np.zeros(n_ops)
    vim = np.zeros(n_ops)
    for g in range(len(x)):
        px = np.asarray(gr.xor_perm(jnp.asarray(psi), jnp.int32(x[g])))
        w_re = np.asarray(gr._sign_field(jnp.asarray(z[g]),
                                         jnp.asarray(coef[g]), N)).reshape(-1)
        w_im = np.asarray(gr._sign_field(jnp.asarray(z[g]),
                                         jnp.asarray(cim[g]), N)).reshape(-1)
        zr_ = w_re * px[0] - w_im * px[1]
        zi_ = w_re * px[1] + w_im * px[0]
        vre[op[g]] += float(np.sum(sigma[0] * zr_ + sigma[1] * zi_))
        vim[op[g]] += float(np.sum(sigma[0] * zi_ - sigma[1] * zr_))

    np.testing.assert_allclose(np.real(v_st), vre, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.imag(v_st), vim, rtol=1e-4, atol=1e-5)

    # FUSED branch (OVQE_STREAM_FUSE=1): stage-class-partitioned bucketed
    # overlaps must agree with the per-group branch
    monkeypatch.setenv("OVQE_STREAM_FUSE", "1")
    grads_f = st.build_streaming_pool_gradient_fn(
        gpool, lham=lambda p: jnp.asarray(sigma))
    v_f = grads_f(psi)
    monkeypatch.delenv("OVQE_STREAM_FUSE")
    np.testing.assert_allclose(np.real(v_f), vre, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.imag(v_f), vim, rtol=1e-4, atol=1e-5)


def test_bucketed_ham_parity(data):
    """x_huge-bucketed H apply == the per-group scan reference, including
    multi-bucket splits (cap=2 forces several buckets per x_huge)."""
    x, z, coef, op, theta, psi = data
    rng = np.random.default_rng(13)
    cim = rng.normal(size=coef.shape).astype(np.float32) * 0.1

    def step(a, g):
        xg, zg, ar, ai = g
        px = gr.xor_perm(jnp.asarray(psi), xg)
        w_re = gr._sign_field(zg, ar, N).reshape(-1)
        w_im = gr._sign_field(zg, ai, N).reshape(-1)
        a = a + jnp.stack([w_re * px[0] - w_im * px[1],
                           w_re * px[1] + w_im * px[0]])
        return a, None

    ref, _ = jax.lax.scan(step, jnp.zeros_like(jnp.asarray(psi)),
                          (jnp.asarray(x), jnp.asarray(z),
                           jnp.asarray(coef), jnp.asarray(cim)))

    from openvqe_tpu.sim.grouped import GroupedPauliSum
    gham = GroupedPauliSum(
        n=N, z_diag=np.zeros(0, np.int32), a_diag_re=np.zeros(0, np.float32),
        a_diag_im=np.zeros(0, np.float32), x=x, z=z, a_re=coef, a_im=cim,
        c_re=0.0, c_im=0.0, n_terms=x.size * z.shape[1], hermitian=False)
    bargs = st.build_ham_buckets(gham, gcap=2)
    out = st.ham_apply_bucketed(psi, np.zeros_like(psi), *bargs,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)

    # real certificate (cim == 0 auto-detected from the host arrays):
    # the kernel variant without the imaginary weight field must match
    # the general kernel run on the same real-only set
    gham_r = GroupedPauliSum(
        n=N, z_diag=np.zeros(0, np.int32), a_diag_re=np.zeros(0, np.float32),
        a_diag_im=np.zeros(0, np.float32), x=x, z=z, a_re=coef,
        a_im=np.zeros_like(cim), c_re=0.0, c_im=0.0,
        n_terms=x.size * z.shape[1], hermitian=False)
    bargs_r = st.build_ham_buckets(gham_r, gcap=2)
    out_r = st.ham_apply_bucketed(psi, np.zeros_like(psi), *bargs_r,
                                  interpret=True)          # real=True path
    out_g = st.ham_apply_bucketed(psi, np.zeros_like(psi), *bargs_r,
                                  interpret=True, real=False)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_g),
                               rtol=0, atol=1e-6)


def test_adjoint_parity(data):
    x, z, coef, op, theta, psi = data
    rng = np.random.default_rng(10)
    lam = _random_state(rng, N)
    grad0 = jnp.zeros(3, jnp.float32)
    p_ref, l_ref, g_ref = gr.grouped_adjoint_sweep(
        jnp.asarray(theta), jnp.asarray(psi), jnp.asarray(lam), grad0,
        jnp.asarray(x), jnp.asarray(z), jnp.asarray(coef), jnp.asarray(op))

    sd = st.build_stream_data(N, x, z, coef, op=op,
                              chunk_bits=st.ADJ_CHUNK_BITS)
    rev = slice(None, None, -1)
    angles = -np.asarray(theta)[sd.op[rev]]
    p_out, l_out, gts = st.adjoint_sweep_stream(
        psi, lam, sd.x_huge[rev], sd.mb[rev], sd.n_outer[rev],
        sd.x_chunk[rev], sd.x_mid[rev], sd.x_lane[rev], angles,
        sd.z_r[rev], sd.z_c[rev], sd.cre[rev], interpret=True)
    grad = jax.ops.segment_sum(gts, jnp.asarray(sd.op[rev]), num_segments=3)
    np.testing.assert_allclose(np.asarray(p_out), np.asarray(p_ref),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(l_out), np.asarray(l_ref),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_rotation_parity(data):
    """Residency-fused rotation sweep (one state pass per equal-x_huge run)
    == the XLA grouped path, including forced tiny buckets."""
    x, z, coef, op, theta, psi = data
    ref = gr.apply_grouped_ops(jnp.asarray(psi), jnp.asarray(theta),
                               jnp.asarray(x), jnp.asarray(z),
                               jnp.asarray(coef), jnp.asarray(op))
    sd = st.build_stream_data(N, x, z, coef, op=op,
                              chunk_bits=st.FUSED_CHUNK_BITS)
    for gcap in (2, st.ROT_BUCKET_CAP):
        bargs = st.build_seq_buckets(sd, gcap=gcap)
        out = st.apply_grouped_ops_fused(psi, theta, *bargs, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=1e-6)


def test_fused_adjoint_parity(data):
    """Residency-fused adjoint (pairs resident across a reversed run,
    in-place staging, per-slot gradient rows) == the XLA grouped adjoint."""
    x, z, coef, op, theta, psi = data
    rng = np.random.default_rng(21)
    lam = _random_state(rng, N)
    grad0 = jnp.zeros(3, jnp.float32)
    p_ref, l_ref, g_ref = gr.grouped_adjoint_sweep(
        jnp.asarray(theta), jnp.asarray(psi), jnp.asarray(lam), grad0,
        jnp.asarray(x), jnp.asarray(z), jnp.asarray(coef), jnp.asarray(op))

    sd = st.build_stream_data(N, x, z, coef, op=op,
                              chunk_bits=st.FUSED_CHUNK_BITS)
    rev = slice(None, None, -1)
    sd_rev = st.StreamGroupData(
        n=sd.n, T=sd.T, C=sd.C, x_lane=sd.x_lane[rev], x_mid=sd.x_mid[rev],
        x_chunk=sd.x_chunk[rev], x_huge=sd.x_huge[rev], mb=sd.mb[rev],
        n_outer=sd.n_outer[rev], z_r=sd.z_r[rev], z_c=sd.z_c[rev],
        cre=sd.cre[rev], cim=None, op=sd.op[rev])
    for gcap in (2, st.ROT_BUCKET_CAP):
        bargs = st.build_seq_buckets(sd_rev, gcap=gcap)
        p_out, l_out, gts = st.adjoint_sweep_fused(
            psi, lam, jnp.asarray(theta), *bargs, interpret=True)
        bop, bact = bargs[3], bargs[7]
        grad = np.zeros(3)
        np.add.at(grad, bop.reshape(-1),
                  (np.asarray(gts) * bact).reshape(-1))
        np.testing.assert_allclose(np.asarray(p_out), np.asarray(p_ref),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(l_out), np.asarray(l_ref),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(grad, np.asarray(g_ref), rtol=1e-4,
                                   atol=1e-5)


def test_pool_bucketed_parity(data):
    """x_huge-bucketed pool screen (one sig/psi pass per bucket, per-slot
    overlap rows) == the per-group reference."""
    x, z, coef, op, theta, psi = data
    rng = np.random.default_rng(22)
    cim = rng.normal(size=coef.shape).astype(np.float32) * 0.1
    sigma = _random_state(rng, N)
    n_ops = 3

    sd = st.build_stream_data(N, x, z, coef, coef_im=cim, op=op,
                              chunk_bits=st.FUSED_CHUNK_BITS)
    vre_ref = np.zeros(n_ops)
    vim_ref = np.zeros(n_ops)
    for g in range(len(x)):
        px = np.asarray(gr.xor_perm(jnp.asarray(psi), jnp.int32(x[g])))
        w_re = np.asarray(gr._sign_field(jnp.asarray(z[g]),
                                         jnp.asarray(coef[g]),
                                         N)).reshape(-1)
        w_im = np.asarray(gr._sign_field(jnp.asarray(z[g]),
                                         jnp.asarray(cim[g]), N)).reshape(-1)
        zr_ = w_re * px[0] - w_im * px[1]
        zi_ = w_re * px[1] + w_im * px[0]
        vre_ref[op[g]] += float(np.sum(sigma[0] * zr_ + sigma[1] * zi_))
        vim_ref[op[g]] += float(np.sum(sigma[0] * zi_ - sigma[1] * zr_))

    for gcap in (2, st.HAM_BUCKET_CAP):
        bargs = st.build_pool_buckets(sd, gcap=gcap)
        slot_group = bargs[-1]
        rows = np.asarray(st.pool_overlap_bucketed(sigma, psi, *bargs[:-1],
                                                   interpret=True))
        vre = np.zeros(n_ops)
        vim = np.zeros(n_ops)
        live = slot_group >= 0
        ops_of_slot = np.where(live, op[np.clip(slot_group, 0, None)], 0)
        np.add.at(vre, ops_of_slot[live], rows[:, :, 0][live])
        np.add.at(vim, ops_of_slot[live], rows[:, :, 1][live])
        np.testing.assert_allclose(vre, vre_ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(vim, vim_ref, rtol=1e-4, atol=1e-5)


def test_bucketed_expectation_parity():
    """Bucketed expectation (one state READ per x_huge bucket) == per-group
    expectation kernel + numpy diagonal, through the K-CLASS split builder
    (ragged live rows force both the K=8 and the K=global class; gcap=2
    forces multi-bucket splits) with the constant + z-diagonal folded in
    as x=0 groups."""
    rng = np.random.default_rng(14)
    G, K = 8, 12
    x, z, coef = _random_groups(rng, G, K, N)
    cim = rng.normal(size=coef.shape).astype(np.float32) * 0.1
    live = np.array([2, 3, 12, 5, 1, 9, 4, 12])
    for g in range(G):
        coef[g, live[g]:] = 0.0
        cim[g, live[g]:] = 0.0
    psi = _random_state(rng, N)
    zd = rng.integers(0, 1 << N, size=5).astype(np.int32)
    adr = rng.normal(size=5).astype(np.float32)

    from openvqe_tpu.sim.grouped import GroupedPauliSum
    gham = GroupedPauliSum(
        n=N, z_diag=zd, a_diag_re=adr, a_diag_im=np.zeros(5, np.float32),
        x=x, z=z, a_re=coef, a_im=cim, c_re=0.37, c_im=0.0,
        n_terms=int(live.sum()) + 6, hermitian=False)

    # off-diagonal reference: the (validated) per-group expectation kernel
    sd = st.stream_ham_data(gham)
    ref = float(st.expectation_stream(psi, *st.ham_stream_args(sd),
                                      interpret=True))
    # diagonal + constant reference in numpy
    idx = np.arange(1 << N, dtype=np.int64)
    p2 = psi[0].astype(np.float64) ** 2 + psi[1].astype(np.float64) ** 2
    ref += 0.37 * p2.sum()
    for zk, ak in zip(zd, adr):
        signs = 1.0 - 2.0 * (np.bitwise_count(idx & int(zk)) & 1)
        ref += float(ak) * np.sum(signs * p2)

    classes = st.build_ham_buckets_split(gham, gcap=2, small=8,
                                         with_diag=True)
    assert len(classes) == 2                     # K=8 and K=12 class
    ks = sorted(b[7].shape[2] for _, _, b in classes)
    assert ks == [8, 12]
    # every off-diagonal group lands in exactly one class
    assert sum(int(b[6].sum()) for _, _, b in classes) == G + 1  # + diag
    tot = sum(float(st.expectation_bucketed(psi, *b, interpret=True,
                                            chunk_bits=cb, stages=st_))
              for st_, cb, b in classes)
    np.testing.assert_allclose(tot, ref, rtol=0, atol=2e-4)

    # perm-STAGE classes (identity matmul stages skipped statically) must
    # partition the same groups and give the same value
    sclasses = st.build_ham_buckets_split(gham, gcap=2, small=8,
                                          with_diag=True, stage_split=True)
    assert sum(int(b[6].sum()) for _, _, b in sclasses) == G + 1
    assert len({st_ for st_, _, _ in sclasses}) >= 2
    tot2 = sum(float(st.expectation_bucketed(psi, *b, interpret=True,
                                             chunk_bits=cb, stages=st_))
               for st_, cb, b in sclasses)
    np.testing.assert_allclose(tot2, ref, rtol=0, atol=2e-4)


def test_bucketed_expectation_herm_parity():
    """herm=True (A-side doubled per chunk pair) == the general bucketed
    path on Hermitian-structured groups."""
    rng = np.random.default_rng(15)
    G, K = 6, 8
    x, z, coef = _random_groups(rng, G, K, N)
    parity = np.zeros_like(z)
    for g in range(G):
        parity[g] = [bin(int(x[g]) & int(zk)).count("1") & 1 for zk in z[g]]
    cre = np.where(parity == 0, coef, 0.0).astype(np.float32)
    cim = np.where(parity == 1, coef, 0.0).astype(np.float32)
    psi = _random_state(rng, N)

    from openvqe_tpu.sim.grouped import GroupedPauliSum
    gham = GroupedPauliSum(
        n=N, z_diag=np.zeros(0, np.int32),
        a_diag_re=np.zeros(0, np.float32),
        a_diag_im=np.zeros(0, np.float32), x=x, z=z, a_re=cre, a_im=cim,
        c_re=0.0, c_im=0.0, n_terms=G * K, hermitian=True)
    classes = st.build_ham_buckets_split(gham, gcap=2, small=8,
                                         stage_split=True)
    vals = {}
    for herm in (False, True):
        vals[herm] = sum(float(st.expectation_bucketed(psi, *b,
                                                       interpret=True,
                                                       chunk_bits=cb,
                                                       herm=herm,
                                                       stages=st_))
                         for st_, cb, b in classes)
    np.testing.assert_allclose(vals[True], vals[False], rtol=0, atol=1e-5)
    assert abs(vals[False]) > 1e-6


def test_energy_xl_parity(monkeypatch):
    """build_streaming_energy_xl_fn (the 30-qubit single-chip energy-only
    path: tiled in-place carry + on-device HF + diag-folded bucketed
    expectation) == the XLA grouped energy, fused and per-group modes."""
    from openvqe_tpu.ops.pauli import PauliSum
    from openvqe_tpu.sim.compile import compile_op_sequence, compile_pauli_sum

    n = N
    rng = np.random.default_rng(11)
    ham = PauliSum.identity(n, 0.17)
    for _ in range(2):      # z-diagonal terms (exercise the diag fold)
        zs = "".join(rng.choice(list("IZ"), p=[0.5, 0.5]) for _ in range(n))
        ham = ham + PauliSum.from_term(n, float(rng.normal()), zs)
    for _ in range(6):      # off-diagonal terms
        s = "".join(rng.choice(list("IXYZ"), p=[0.55, 0.16, 0.17, 0.12])
                    for _ in range(n))
        if s.count("I") < n and (s.count("X") + s.count("Y")) > 0:
            ham = ham + PauliSum.from_term(n, float(rng.normal() * 0.5), s)

    gens = []
    for _ in range(3):
        while True:
            s = "".join(rng.choice(list("IXYZ"), p=[0.6, 0.15, 0.15, 0.1])
                        for _ in range(n))
            if s.count("Y") % 2 == 1:
                break
        gens.append(PauliSum.from_term(n, 0.5, s))
    theta = (rng.normal(size=3) * 0.3).astype(np.float32)
    hf = 0b110

    gseq = gr.group_op_sequence(compile_op_sequence(gens, n))
    gham = gr.group_pauli_sum(compile_pauli_sum(ham, n))

    # grouped f32 reference on the HF one-hot
    psi0 = np.zeros((2, 1 << n), np.float32)
    psi0[0, hf] = 1.0
    th = jnp.asarray(theta)
    psi = gr.apply_grouped_ops(jnp.asarray(psi0), th, jnp.asarray(gseq.x),
                               jnp.asarray(gseq.z),
                               jnp.asarray(gseq.s, jnp.float32).astype(
                                   jnp.float32),
                               jnp.asarray(gseq.op))
    hargs = tuple(np.asarray(a, np.float32)
                  if isinstance(a, (np.ndarray, float))
                  and np.asarray(a).dtype.kind == "f" else a
                  for a in gr.ham_as_device(gr.group_pauli_sum(
                      compile_pauli_sum(ham, n))))
    e_ref = float(gr.grouped_expectation(psi, *hargs))

    for fuse_env, hoist_env in (("1", "0"), ("0", "0"), ("1", "1")):
        monkeypatch.setenv("OVQE_STREAM_FUSE", fuse_env)
        monkeypatch.setenv("OVQE_EXP_HOIST", hoist_env)
        energy = st.build_streaming_energy_xl_fn(gseq, gham, hf,
                                                 interpret=True)
        e_xl = energy(theta)
        assert abs(e_xl - e_ref) < 1e-5, (fuse_env, hoist_env, e_xl, e_ref)


def test_hoisted_expectation_parity():
    """HOISTED bucketed expectation (one sublane perm per distinct x_mid,
    one lane perm per distinct x_lane, lane sign folded into the
    coefficients) == the plain bucketed kernel, for real and complex
    coefficient sets and with tiny unique-mask caps forcing bucket
    splits."""
    rng = np.random.default_rng(21)
    G, K = 12, 8
    x, z, coef = _random_groups(rng, G, K, N)
    # force in-tile mask SHARING across groups (the hoist win) plus the
    # stage-class corners: identical xm with differing xl and vice versa
    x[3] = (int(x[2]) & ~((1 << st.TILE_BITS) - 1)) | (9 << 7) | 5
    x[4] = (int(x[3]) & ~0x7F) | 11
    x[5] = (int(x[3]) & 0x7F) | (int(x[3]) & (0x7F << 7))
    x[6] = 9 << 7                              # sublane-only ("m" class)
    x[7] = 11                                  # lane-only ("l" class)
    parity = np.zeros_like(z)
    for g in range(G):
        parity[g] = [bin(int(x[g]) & int(zk)).count("1") & 1 for zk in z[g]]
    psi = _random_state(rng, N)
    psi4 = psi.reshape(2, (1 << N) >> st.TILE_BITS, 128, 128)

    from openvqe_tpu.sim.grouped import GroupedPauliSum
    for tag, cre, cim in (
            ("real", coef.astype(np.float32), np.zeros_like(coef)),
            ("cplx", np.where(parity == 0, coef, 0.0).astype(np.float32),
             np.where(parity == 1, coef, 0.0).astype(np.float32))):
        gham = GroupedPauliSum(
            n=N, z_diag=np.zeros(0, np.int32),
            a_diag_re=np.zeros(0, np.float32),
            a_diag_im=np.zeros(0, np.float32), x=x, z=z, a_re=cre,
            a_im=cim, c_re=0.0, c_im=0.0, n_terms=G * K,
            hermitian=(tag == "cplx"))
        classes = st.build_ham_buckets_split(gham, gcap=4, small=8,
                                             stage_split=True)
        # the hoisted kernel always applies the Hermitian doubling, so
        # the consistent reference is the herm=True plain kernel (exact
        # for Hermitian-structured sets; same convention on random ones)
        ref = sum(float(st.expectation_bucketed(
            psi, *b, interpret=True, chunk_bits=cb, stages=st_,
            herm=True)) for st_, cb, b in classes)
        for caps in (8, 2):
            tot = 0.0
            for st_, cb, b in classes:
                if not st_:
                    tot += float(st.expectation_bucketed(
                        psi, *b, interpret=True, chunk_bits=cb,
                        stages=st_, herm=True))
                    continue
                hargs = st.hoist_bucket_args(b, um_cap=caps, ul_cap=caps)
                tot += float(st.expectation_hoisted4(
                    psi4, hargs, interpret=True, chunk_bits=cb,
                    stages=st_))
            np.testing.assert_allclose(tot, ref, rtol=0, atol=2e-4,
                                       err_msg=f"{tag} caps={caps}")


def test_grouped_hermitian_operator_certificate():
    """grouped_hermitian_operator must accept every real-coefficient Pauli
    sum (odd-Y strings compile to imaginary coefficients, so
    gham.hermitian is False there) and reject operator-level
    non-Hermitian sums; build_streaming_energy_xl_fn refuses the latter
    (round-3 ADVICE: it hard-certifies herm=True)."""
    from openvqe_tpu.ops.pauli import PauliSum
    from openvqe_tpu.sim.compile import compile_op_sequence, compile_pauli_sum

    n = N
    herm = (PauliSum.from_term(n, 0.7, "XY" + "I" * (n - 2))     # odd Y
            + PauliSum.from_term(n, -0.3, "Z" * n)
            + PauliSum.identity(n, 0.11))
    gh = gr.group_pauli_sum(compile_pauli_sum(herm, n))
    assert not gh.hermitian                     # imaginary compiled coef
    assert st.grouped_hermitian_operator(gh)    # but operator-Hermitian

    nonherm = herm + PauliSum.from_term(n, 0.4j, "XX" + "I" * (n - 2))
    gn = gr.group_pauli_sum(compile_pauli_sum(nonherm, n))
    assert not st.grouped_hermitian_operator(gn)

    gens = [PauliSum.from_term(n, 0.5, "Y" + "I" * (n - 1))]
    gseq = gr.group_op_sequence(compile_op_sequence(gens, n))
    with pytest.raises(ValueError, match="Hermitian"):
        st.build_streaming_energy_xl_fn(gseq, gn, hf_init=0)


def test_buckets_split_scattered_live_rows():
    """build_ham_buckets_split classifies by the highest LIVE COLUMN, not
    the live-row count: a group with few live rows scattered past the
    small-K boundary must land in the big-K class (round-3 ADVICE: the
    old count-based classing asserted on such builders)."""
    from openvqe_tpu.sim.grouped import GroupedPauliSum

    K = 16
    x = np.asarray([3, 5], np.int32)
    z = np.zeros((2, K), np.int32)
    a_re = np.zeros((2, K), np.float32)
    # group 0: 2 live rows, front-packed -> small class
    z[0, :2] = [1, 2]
    a_re[0, :2] = [0.4, -0.2]
    # group 1: 2 live rows but one sits at column 12 (> small=8) ->
    # must class as big-K despite the tiny live count
    z[1, 0] = 4
    z[1, 12] = 6
    a_re[1, 0] = 0.3
    a_re[1, 12] = 0.1
    gham = GroupedPauliSum(
        n=N, z_diag=np.zeros(0, np.int32),
        a_diag_re=np.zeros(0, np.float32),
        a_diag_im=np.zeros(0, np.float32), x=x, z=z, a_re=a_re,
        a_im=np.zeros_like(a_re), c_re=0.0, c_im=0.0, n_terms=4,
        hermitian=True)
    classes = st.build_ham_buckets_split(gham, small=8)
    ks = sorted(b[7].shape[-2] for _, _, b in classes)   # bzr (B,gcap,K,1)
    assert ks == [8, K], ks

    # numerics: class sum == direct grouped expectation
    rng = np.random.default_rng(3)
    psi = _random_state(rng, N)
    tot = sum(float(st.expectation_bucketed(
        psi, *b, interpret=True, chunk_bits=cb, stages=st_, herm=True))
        for st_, cb, b in classes)
    pj = jnp.asarray(psi)
    ref = 0.0
    for g in range(2):
        px = gr.xor_perm(pj, int(x[g]))
        w = np.zeros(1 << N, np.float32)
        idx = np.arange(1 << N)
        for k in range(K):
            if a_re[g, k]:
                w += a_re[g, k] * (1.0 - 2.0 * (
                    np.bitwise_count(idx & int(z[g, k])) % 2))
        ref += float(np.sum(np.asarray(pj) * (w[None, :] * np.asarray(px))))
    np.testing.assert_allclose(tot, ref, rtol=0, atol=5e-5)
