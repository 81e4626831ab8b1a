"""Hardware parity + per-group timing for the streaming kernels.

Usage: python benchmarks/bench_streaming.py [n] [G]    (default 24 256)
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (standalone runs)

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovqe_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from openvqe_tpu.sim import grouped as gr
from openvqe_tpu.sim import streaming as st


def parity(n=18, G=6, K=4):
    rng = np.random.default_rng(7)
    x = rng.integers(0, 1 << n, size=G).astype(np.int32)
    x[0] = 0
    x[1] = 3
    x[2] = (5 << st.TILE_BITS) | 9
    z = rng.integers(0, 1 << n, size=(G, K)).astype(np.int32)
    coef = (rng.normal(size=(G, K)) * 0.3).astype(np.float32)
    op = (np.arange(G) % 3).astype(np.int32)
    theta = (rng.normal(size=3) * 0.2).astype(np.float32)
    psi = rng.normal(size=(2, 1 << n)).astype(np.float32)
    psi /= np.linalg.norm(psi)

    ref = np.asarray(gr.apply_grouped_ops(
        jnp.asarray(psi), jnp.asarray(theta), jnp.asarray(x), jnp.asarray(z),
        jnp.asarray(coef), jnp.asarray(op)))
    sd = st.build_stream_data(n, x, z, coef, op=op)
    out = np.asarray(st.apply_grouped_ops_stream(
        psi, theta, *st.seq_stream_args(sd)))
    d = np.max(np.abs(out - ref))
    print(f"parity rot n={n}: maxdiff={d:.2e} "
          f"{'OK' if d < 1e-6 else 'FAIL'}", flush=True)

    cim = (rng.normal(size=(G, K)) * 0.1).astype(np.float32)
    sdh = st.build_stream_data(n, x, z, coef, coef_im=cim)
    acc0 = np.zeros_like(psi)
    outh = np.asarray(st.ham_apply_stream(psi, acc0,
                                          *st.ham_stream_args(sdh)))

    def step(a, g):
        xg, zg, ar, ai = g
        px = gr.xor_perm(jnp.asarray(psi), xg)
        w_re = gr._sign_field(zg, ar, n).reshape(-1)
        w_im = gr._sign_field(zg, ai, n).reshape(-1)
        return a + jnp.stack([w_re * px[0] - w_im * px[1],
                              w_re * px[1] + w_im * px[0]]), None

    refh, _ = jax.lax.scan(step, jnp.zeros_like(jnp.asarray(psi)),
                           (jnp.asarray(x), jnp.asarray(z),
                            jnp.asarray(coef), jnp.asarray(cim)))
    dh = np.max(np.abs(outh - np.asarray(refh)))
    print(f"parity ham n={n}: maxdiff={dh:.2e} "
          f"{'OK' if dh < 1e-5 else 'FAIL'}", flush=True)

    es = float(st.expectation_stream(psi, *st.ham_stream_args(sdh)))
    er = float(jnp.sum(jnp.asarray(psi) * refh))
    # reference: <psi|H_offdiag|psi> with complex weights = psi . (H psi)_re
    print(f"parity expect n={n}: |d|={abs(es - er):.2e} "
          f"{'OK' if abs(es - er) < 1e-5 else 'FAIL'}", flush=True)

    lam = rng.normal(size=(2, 1 << n)).astype(np.float32)
    lam /= np.linalg.norm(lam)
    g0 = jnp.zeros(3, jnp.float32)
    pr, lr, gref = gr.grouped_adjoint_sweep(
        jnp.asarray(theta), jnp.asarray(psi), jnp.asarray(lam), g0,
        jnp.asarray(x), jnp.asarray(z), jnp.asarray(coef), jnp.asarray(op))
    rev = slice(None, None, -1)
    sda = st.build_stream_data(n, x, z, coef, op=op,
                               chunk_bits=st.ADJ_CHUNK_BITS)
    angles = -np.asarray(theta)[sda.op[rev]]
    po, lo, gts = st.adjoint_sweep_stream(
        psi, lam, sda.x_huge[rev], sda.mb[rev], sda.n_outer[rev],
        sda.x_chunk[rev], sda.x_mid[rev], sda.x_lane[rev], angles,
        sda.z_r[rev], sda.z_c[rev], sda.cre[rev])
    ga = np.asarray(jax.ops.segment_sum(gts, jnp.asarray(sda.op[rev]),
                                        num_segments=3))
    da = max(np.max(np.abs(np.asarray(po) - np.asarray(pr))),
             np.max(np.abs(np.asarray(lo) - np.asarray(lr))),
             np.max(np.abs(ga - np.asarray(gref))))
    print(f"parity adj n={n}: maxdiff={da:.2e} "
          f"{'OK' if da < 1e-4 else 'FAIL'}", flush=True)


def bench(n, G, K=8):
    rng = np.random.default_rng(1)
    x = rng.integers(1, 1 << n, size=G).astype(np.int32)
    z = rng.integers(0, 1 << n, size=(G, K)).astype(np.int32)
    coef = (rng.normal(size=(G, K)) * 0.1).astype(np.float32)
    op = (np.arange(G) % 64).astype(np.int32)
    theta = (rng.normal(size=64) * 0.1).astype(np.float32)
    psi = rng.normal(size=(2, 1 << n)).astype(np.float32)
    psi /= np.linalg.norm(psi)
    psi_d = jnp.asarray(psi)

    sd = st.build_stream_data(n, x, z, coef, op=op)
    sargs = st.seq_stream_args(sd)

    rot = jax.jit(lambda p, th: st.apply_grouped_ops_stream(p, th, *sargs))
    out = rot(psi_d, theta)
    jax.block_until_ready(out)
    t0 = time.time()
    out = rot(out, theta)
    jax.block_until_ready(out)
    dt = time.time() - t0
    print(f"stream rot n={n} G={G}: {dt:.3f}s = {1e3 * dt / G:.3f} ms/group",
          flush=True)

    # XLA grouped comparison
    xla = jax.jit(lambda p, th: gr.apply_grouped_ops(
        p, th, jnp.asarray(x), jnp.asarray(z), jnp.asarray(coef),
        jnp.asarray(op)))
    out2 = xla(psi_d, jnp.asarray(theta))
    jax.block_until_ready(out2)
    t0 = time.time()
    out2 = xla(out2, jnp.asarray(theta))
    jax.block_until_ready(out2)
    dt2 = time.time() - t0
    print(f"xla    rot n={n} G={G}: {dt2:.3f}s = {1e3 * dt2 / G:.3f} ms/group"
          f"  -> stream speedup {dt2 / dt:.2f}x", flush=True)

    # adjoint
    lam = out
    rev = slice(None, None, -1)
    angles = -theta[sd.op[rev]]
    sd_adj = st.build_stream_data(n, x, z, coef, op=op,
                                  chunk_bits=st.ADJ_CHUNK_BITS)
    adj = jax.jit(lambda p, l: st.adjoint_sweep_stream(
        p, l, sd_adj.x_huge[rev], sd_adj.mb[rev], sd_adj.n_outer[rev],
        sd_adj.x_chunk[rev], sd_adj.x_mid[rev], sd_adj.x_lane[rev], angles,
        sd_adj.z_r[rev], sd_adj.z_c[rev], sd_adj.cre[rev]))
    r = adj(out, lam)
    jax.block_until_ready(r[0])
    t0 = time.time()
    r = adj(out, lam)
    jax.block_until_ready(r[0])
    dt3 = time.time() - t0
    print(f"stream adj n={n} G={G}: {dt3:.3f}s = {1e3 * dt3 / G:.3f} ms/group",
          flush=True)

    # ham apply
    sdh = st.build_stream_data(n, x, z, coef, coef_im=coef)
    hargs = st.ham_stream_args(sdh)
    ham = jax.jit(lambda p, a: st.ham_apply_stream(p, a, *hargs))
    acc = jnp.zeros_like(psi_d)
    r = ham(psi_d, acc)
    jax.block_until_ready(r)
    acc = jnp.zeros_like(psi_d)
    t0 = time.time()
    r = ham(psi_d, acc)
    jax.block_until_ready(r)
    dt4 = time.time() - t0
    print(f"stream ham n={n} G={G}: {dt4:.3f}s = {1e3 * dt4 / G:.3f} ms/group",
          flush=True)

    exp = jax.jit(lambda p: st.expectation_stream(p, *hargs))
    e = exp(psi_d)
    jax.block_until_ready(e)
    t0 = time.time()
    e = exp(psi_d)
    jax.block_until_ready(e)
    dt5 = time.time() - t0
    print(f"stream exp n={n} G={G}: {dt5:.3f}s = {1e3 * dt5 / G:.3f} ms/group",
          flush=True)


def bench_fused(n, G, K=8, run_len=14):
    """Fused-residency kernels on an equal-x_huge RUN workload (run_len=14
    matches the measured fusion factor of real UCCSD sequences at 20-24q:
    H10 875 groups -> 62 buckets, H12 1818 -> 132)."""
    rng = np.random.default_rng(2)
    lift = st.TILE_BITS + st.FUSED_CHUNK_BITS
    span = (1 << (n - lift)) - 1
    huge = rng.integers(0, span + 1, size=G // run_len + 1)
    x = ((huge[np.arange(G) // run_len] << lift)
         | rng.integers(1, 1 << lift, size=G)).astype(np.int64)
    z = rng.integers(0, 1 << n, size=(G, K)).astype(np.int64)
    coef = (rng.normal(size=(G, K)) * 0.1).astype(np.float32)
    op = (np.arange(G) % 64).astype(np.int32)
    theta = (rng.normal(size=64) * 0.1).astype(np.float32)
    psi = rng.normal(size=(2, 1 << n)).astype(np.float32)
    psi /= np.linalg.norm(psi)
    psi_d = jnp.asarray(psi)

    sdF = st.build_stream_data(n, x, z, coef, op=op,
                               chunk_bits=st.FUSED_CHUNK_BITS)
    fb = st.build_seq_buckets(sdF)
    B = len(fb[0])
    print(f"fused workload n={n} G={G}: {B} buckets "
          f"({G/B:.1f}x fusion)", flush=True)

    rotf = jax.jit(lambda p, th: st.apply_grouped_ops_fused(p, th, *fb))
    sd = st.build_stream_data(n, x, z, coef, op=op)
    out = rotf(psi_d, theta)
    jax.block_until_ready(out)
    t0 = time.time()
    out = rotf(out, theta)
    _ = float(jnp.sum(out))        # force completion past aliasing
    dt = time.time() - t0
    print(f"FUSED rot n={n} G={G}: {dt:.3f}s = {1e3 * dt / G:.3f} ms/group",
          flush=True)

    sargs = st.seq_stream_args(sd)
    rot = jax.jit(lambda p, th: st.apply_grouped_ops_stream(p, th, *sargs))
    out2 = rot(psi_d, theta)
    jax.block_until_ready(out2)
    t0 = time.time()
    out2 = rot(out2, theta)
    _ = float(jnp.sum(out2))
    dt2 = time.time() - t0
    print(f"pergrp rot n={n} G={G}: {dt2:.3f}s = {1e3 * dt2 / G:.3f} "
          f"ms/group -> fused speedup {dt2 / dt:.2f}x", flush=True)

    # fused adjoint (full-size chunks) vs per-group (half-size chunks)
    lam = jnp.asarray(psi)
    ab = st.build_seq_buckets(st._reverse_sd(sdF))
    adjf = jax.jit(lambda p, l, th: st.adjoint_sweep_fused(p, l, th, *ab))
    r = adjf(psi_d, lam, theta)
    jax.block_until_ready(r[2])
    t0 = time.time()
    r = adjf(psi_d, lam, theta)
    _ = float(jnp.sum(r[2])) + float(jnp.sum(r[0]))
    dt3 = time.time() - t0
    print(f"FUSED adj n={n} G={G}: {dt3:.3f}s = {1e3 * dt3 / G:.3f} "
          f"ms/group", flush=True)

    rev = slice(None, None, -1)
    sd_adj = st.build_stream_data(n, x, z, coef, op=op,
                                  chunk_bits=st.ADJ_CHUNK_BITS)
    angles = -theta[sd_adj.op[rev]]
    adj = jax.jit(lambda p, l: st.adjoint_sweep_stream(
        p, l, sd_adj.x_huge[rev], sd_adj.mb[rev], sd_adj.n_outer[rev],
        sd_adj.x_chunk[rev], sd_adj.x_mid[rev], sd_adj.x_lane[rev], angles,
        sd_adj.z_r[rev], sd_adj.z_c[rev], sd_adj.cre[rev]))
    r2 = adj(psi_d, lam)
    jax.block_until_ready(r2[2])
    t0 = time.time()
    r2 = adj(psi_d, lam)
    _ = float(jnp.sum(r2[2])) + float(jnp.sum(r2[0]))
    dt4 = time.time() - t0
    print(f"pergrp adj n={n} G={G}: {dt4:.3f}s = {1e3 * dt4 / G:.3f} "
          f"ms/group -> fused speedup {dt4 / dt3:.2f}x", flush=True)

    # bucketed pool screen vs per-group
    cim = (rng.normal(size=(G, K)) * 0.1).astype(np.float32)
    sdp = st.build_stream_data(n, x, z, coef, coef_im=cim, op=op)
    pb = st.build_pool_buckets(st.build_stream_data(
        n, x, z, coef, coef_im=cim, op=op,
        chunk_bits=st.FUSED_CHUNK_BITS))
    sig = jnp.asarray(psi)
    poolf = jax.jit(lambda s_, p_: st.pool_overlap_bucketed(s_, p_,
                                                            *pb[:-1]))
    rowsf = poolf(sig, psi_d)
    jax.block_until_ready(rowsf)
    t0 = time.time()
    rowsf = poolf(sig, psi_d)
    jax.block_until_ready(rowsf)
    dt5 = time.time() - t0
    print(f"FUSED pool n={n} G={G}: {dt5:.3f}s = {1e3 * dt5 / G:.3f} "
          f"ms/group", flush=True)

    pargs = st.ham_stream_args(sdp)
    pool = jax.jit(lambda s_, p_: st.pool_overlap_stream(
        s_, p_, pargs[0], pargs[1], pargs[2], pargs[3], pargs[4], pargs[5],
        pargs[6], pargs[7], pargs[8], pargs[9]))
    rows = pool(sig, psi_d)
    jax.block_until_ready(rows)
    t0 = time.time()
    rows = pool(sig, psi_d)
    jax.block_until_ready(rows)
    dt6 = time.time() - t0
    print(f"pergrp pool n={n} G={G}: {dt6:.3f}s = {1e3 * dt6 / G:.3f} "
          f"ms/group -> fused speedup {dt6 / dt5:.2f}x", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    parity()
    bench(n, G)
    bench_fused(n, G)
