"""Auditable hardware-efficiency table for the streaming kernels.

Round-3 VERDICT item 9: put %-of-HBM-bandwidth and MXU-efficiency
columns next to the per-group kernel timings, with the derivation
explicit enough to check by hand.

Model (all per GROUP at n qubits, N = 2^n f32 amplitudes per plane):

  HBM bytes/group — every per-group kernel makes exactly one streaming
  pass over its resident states (sim/streaming.py chunk-pair DMA):
    rotation   : read 2 planes + write 2 planes          = 16 N bytes
    adjoint    : 2 states (psi, lambda) read + write      = 32 N bytes
    expectation: read-only pass over 2 planes             =  8 N bytes
    H apply    : read psi (2) + read/accumulate acc (2x2) = 24 N bytes

  MXU FLOPs/group — the in-tile index-XOR runs as permutation matmuls
  (_GroupCtx.perm): 2 stages (sublane P_mid, lane P_lo) x 3 bf16 limbs
  = 6 MXU passes, each contracting a 128-sized axis (2*128 FLOPs per
  element) -> 1536 N FLOPs per permuted plane.  Calls per group:
    rotation 2 planes, expectation 2, H apply 2, adjoint 4 (both
    planes of both states)  [streaming.py:490-493, 658-661, 2698-2701,
    3251-3257].  The sign/weight field matmul adds 2*K_pad FLOPs per
    element (K_pad = 8 here) — ~0.5% of the perm chain; excluded.

  Roofline (speed of light) per group:
    t_SoL = max(bytes / HBM_peak, perm_flops / MXU_peak)
    %SoL  = t_SoL / t_measured.
  The achieved GB/s and TFLOP/s columns are both computed over the FULL
  measured kernel time (bandwidth and matmuls run CONCURRENTLY — the
  chunk-pair DMA double-buffers while the MXU permutes the resident
  tiles — so per-phase timings are not separable and each column is the
  sustained rate of that engine across the whole kernel).

  Overlap diagnostic — the OVQE_STREAM_PROBE=noperm A/B removes the
  permutation matmuls; the time delta is the NON-overlapped part of the
  perm chain.  perm_flops / delta above the MXU peak is therefore not a
  rate: it is evidence that most of the perm chain hides behind DMA.
  The table reports the delta and the hidden fraction
  (1 - delta / (perm_flops / MXU_peak) clamped to [0, 1]) instead of a
  bogus %-of-peak.

Peaks (TPU v5e defaults, overridable via OVQE_PEAK_HBM_GBS /
OVQE_PEAK_MXU_TFLOPS): HBM 819 GB/s, bf16 MXU 197 TFLOP/s.

Usage:
  python benchmarks/efficiency_table.py [n] [G]        (default 24 256)
  python benchmarks/efficiency_table.py --replay FILE  (re-emit the table
      from a prior run's per-cell JSON lines without touching the TPU)
Each (kernel, probe) cell runs in its own subprocess (the probe env is
read at import).  Prints one JSON line per measurement, then the
markdown table.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_HBM_GBS = float(os.environ.get("OVQE_PEAK_HBM_GBS", 819.0))
PEAK_MXU_TFLOPS = float(os.environ.get("OVQE_PEAK_MXU_TFLOPS", 197.0))

BYTES_PER_N = {"rot": 16, "adj": 32, "exp": 8, "ham": 24}
PERM_PLANES = {"rot": 2, "adj": 4, "exp": 2, "ham": 2}
PERM_FLOPS_PER_ELEM = 6 * 2 * 128          # 6 bf16 passes x 128-contraction


def _child(kernel, n, G, probe):
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/ovqe_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from openvqe_tpu.sim import streaming as st

    rng = np.random.default_rng(7)
    K = 8
    x = rng.integers(1, 1 << n, size=G).astype(np.int64)
    z = rng.integers(0, 1 << n, size=(G, K)).astype(np.int64)
    coef = (rng.normal(size=(G, K)) * 0.1).astype(np.float32)
    op = np.arange(G, dtype=np.int32)
    theta = (rng.normal(size=G) * 0.2).astype(np.float32)
    psi = rng.normal(size=(2, 1 << n)).astype(np.float32)
    psi /= np.linalg.norm(psi)
    psi_d = jnp.asarray(psi)
    th_d = jnp.asarray(theta)

    def force(v):
        return float(jnp.sum(jnp.asarray(v)[..., :8]))

    if kernel == "rot":
        sd = st.build_stream_data(n, x, z, coef, op=op, fmode=1)
        args = tuple(jnp.asarray(a) for a in st.seq_stream_args(sd))
        fn = jax.jit(lambda p, t: st.apply_grouped_ops_stream(
            p, t, *args, fmode=1))
        run = lambda: force(fn(psi_d, th_d))
    elif kernel == "adj":
        rev = slice(None, None, -1)
        sda = st.build_stream_data(n, x, z, coef, op=op, fmode=1,
                                   chunk_bits=st.ADJ_CHUNK_BITS)
        angles = jnp.asarray(-theta[sda.op[rev]])
        aargs = tuple(jnp.asarray(a) for a in (
            sda.x_huge[rev], sda.mb[rev], sda.n_outer[rev],
            sda.x_chunk[rev], sda.x_mid[rev], sda.x_lane[rev]))
        zargs = tuple(jnp.asarray(a) for a in (sda.z_r[rev], sda.z_c[rev],
                                               sda.cre[rev]))
        lam_d = jnp.asarray(psi[::-1])
        fn = jax.jit(lambda p, l: st.adjoint_sweep_stream(
            p, l, *aargs, angles, *zargs, fmode=1))
        run = lambda: force(fn(psi_d, lam_d)[0])
    elif kernel == "exp":
        sdh = st.build_stream_data(n, x, z, coef)      # real coefficients
        hargs = tuple(jnp.asarray(a) for a in st.ham_stream_args(sdh))
        fn = jax.jit(lambda p: st.expectation_stream(p, *hargs))
        run = lambda: float(fn(psi_d))
    elif kernel == "ham":
        sdh = st.build_stream_data(n, x, z, coef)
        hargs = tuple(jnp.asarray(a) for a in st.ham_stream_args(sdh))
        fn = jax.jit(lambda p, a: st.ham_apply_stream(p, a, *hargs))
        acc0 = jnp.zeros_like(psi_d)
        run = lambda: force(fn(psi_d, acc0))
    else:
        raise SystemExit(f"unknown kernel {kernel}")

    run()                                   # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.time()
        run()
        ts.append(time.time() - t0)
    dt = sorted(ts)[1]
    print(json.dumps({"kernel": kernel, "probe": probe or "full",
                      "n": n, "G": G,
                      "ms_per_group": round(dt * 1e3 / G, 4)}), flush=True)


def emit_table(t, n, G):
    """t: {(kernel, probe): ms_per_group}.  Prints the markdown table +
    one machine-readable JSON summary line; returns the rows."""
    N = 1 << n
    print(f"\n| kernel | ms/group | HBM bytes | GB/s (%{PEAK_HBM_GBS:.0f}) "
          f"| perm TFLOP/s (%{PEAK_MXU_TFLOPS:.0f}) | t_SoL ms | %SoL "
          f"| noperm delta |")
    print("|---|---|---|---|---|---|---|---|")
    rows = []
    for kernel in ("rot", "adj", "exp", "ham"):
        if (kernel, "full") not in t:
            continue
        ms = t[(kernel, "full")]
        nbytes = BYTES_PER_N[kernel] * N
        flops = PERM_PLANES[kernel] * PERM_FLOPS_PER_ELEM * N
        gbs = nbytes / (ms * 1e-3) / 1e9
        tfps = flops / (ms * 1e-3) / 1e12
        t_hbm_ms = nbytes / (PEAK_HBM_GBS * 1e9) * 1e3
        t_mxu_ms = flops / (PEAK_MXU_TFLOPS * 1e12) * 1e3
        t_sol_ms = max(t_hbm_ms, t_mxu_ms)
        row = {"kernel": kernel, "n": n, "G": G, "ms_per_group": ms,
               "bytes_per_group": nbytes, "perm_flops_per_group": flops,
               "hbm_gbs": round(gbs, 1),
               "hbm_pct": round(100 * gbs / PEAK_HBM_GBS, 1),
               "mxu_tflops": round(tfps, 1),
               "mxu_pct": round(100 * tfps / PEAK_MXU_TFLOPS, 1),
               "t_sol_ms": round(t_sol_ms, 4),
               "sol_pct": round(100 * t_sol_ms / ms, 1),
               "bound": "HBM" if t_hbm_ms >= t_mxu_ms else "MXU"}
        over = ""
        if (kernel, "noperm") in t:
            dms = max(ms - t[(kernel, "noperm")], 0.0)
            hidden = min(max(1.0 - dms / t_mxu_ms, 0.0), 1.0)
            row.update({"noperm_delta_ms": round(dms, 4),
                        "perm_hidden_frac": round(hidden, 3)})
            over = (f"{row['noperm_delta_ms']} ms "
                    f"({100 * hidden:.0f}% hidden)")
        print(f"| {kernel} | {ms} | {BYTES_PER_N[kernel]}N = "
              f"{nbytes / 1e6:.0f} MB | {row['hbm_gbs']} "
              f"({row['hbm_pct']}%) | {row['mxu_tflops']} "
              f"({row['mxu_pct']}%) | {row['t_sol_ms']} ({row['bound']}) | "
              f"{row['sol_pct']}% | {over or '—'} |")
        rows.append(row)
    print(json.dumps({"n": n, "G": G, "peak_hbm_gbs": PEAK_HBM_GBS,
                      "peak_mxu_tflops": PEAK_MXU_TFLOPS, "rows": rows}),
          flush=True)
    return rows


def main():
    if os.environ.get("_EFF_CHILD"):
        _child(os.environ["_EFF_CHILD"], int(sys.argv[1]), int(sys.argv[2]),
               os.environ.get("OVQE_STREAM_PROBE", ""))
        return
    if len(sys.argv) > 2 and sys.argv[1] == "--replay":
        t, meta = {}, None
        with open(sys.argv[2]) as f:
            for line in f:
                if line.startswith("{") and "ms_per_group" in line:
                    row = json.loads(line)
                    if "probe" in row:
                        t[(row["kernel"], row["probe"])] = row["ms_per_group"]
                        meta = (row["n"], row["G"])
        emit_table(t, *meta)
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    G = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cells = [("rot", ""), ("rot", "noperm"), ("adj", ""), ("adj", "noperm"),
             ("exp", ""), ("exp", "noperm"), ("ham", ""), ("ham", "noperm")]
    t = {}
    for kernel, probe in cells:
        env = dict(os.environ, _EFF_CHILD=kernel, OVQE_STREAM_PROBE=probe)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(n), str(G)],
            env=env, capture_output=True, text=True)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                row = json.loads(line)
                t[(kernel, row["probe"])] = row["ms_per_group"]
                print(line, flush=True)
        if (kernel, probe or "full") not in t:
            print(f"FAILED {kernel}/{probe}: {out.stderr[-800:]}",
                  flush=True)
            return
    emit_table(t, n, G)


if __name__ == "__main__":
    main()
