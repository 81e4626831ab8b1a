"""A/B the bucketed-expectation kernel variants on hardware at 24 qubits:
baseline (C=8, 3 limbs, fori group loop), unrolled group loop, C=16
chunks, and 2-limb perms — against the H12/24q Hamiltonian's real group
structure.  Values must agree (bf16x2 to ~1e-5).

Usage: python benchmarks/probe_exp_variants.py
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # repo root (standalone runs)

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ovqe_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from openvqe_tpu.sim import grouped as gr
from openvqe_tpu.sim import streaming as st


def main():
    from openvqe_tpu.chem.frontend import compute_molecule
    from openvqe_tpu.ops.hamiltonian import (ElectronicStructureHamiltonian,
                                             convert_to_h_integrals)
    from openvqe_tpu.sim.compile import compile_pauli_sum

    md = compute_molecule([("H", (0, 0, 1.0 * k)) for k in range(12)],
                          "sto-3g", charge=0, spin=0, run_fci_flag=False)
    hpq, hpqrs = convert_to_h_integrals(md.one_body_integrals,
                                        md.two_body_integrals)
    esh = ElectronicStructureHamiltonian(hpq, hpqrs, md.nuclear_repulsion)
    hsp = esh.to_spin("JW")
    n = hsp.nbqbits
    gham = gr.group_pauli_sum(compile_pauli_sum(hsp, n))
    print(json.dumps({"n": n, "h_groups": int(gham.n_groups)}), flush=True)

    rng = np.random.default_rng(0)
    psi = rng.normal(size=(2, 1 << n)).astype(np.float32)
    psi /= np.linalg.norm(psi)
    psi_dev = jnp.asarray(psi)

    seg2 = max(8, st.stream_segment_groups(n) // 2)

    # the all-real certificate must ride a STATIC arg under jit (the
    # library builders do the same: streaming.build_streaming_energy_fn)
    ham_real = not np.asarray(gham.a_im).any()

    @partial(jax.jit, static_argnums=(0, 1, 2, 3))
    def seg_e(stages, cb, unroll, limbs, psi, *args):
        return st.expectation_bucketed(psi, *args, herm=True,
                                       chunk_bits=cb, unroll=unroll,
                                       stages=stages, limbs=limbs,
                                       real=ham_real)

    def run(tag, cb, unroll, limbs, reps=3):
        # thread the PER-CLASS chunk_bits through (the VMEM guard may
        # lower it below the requested cb; mixing them corrupts the DMA
        # pairing and kills the backend)
        classes = st.build_ham_buckets_split(gham, stage_split=True,
                                             chunk_bits=cb)
        segs = [(st_, cbc, tuple(jnp.asarray(a) for a in s))
                for st_, cbc, b in classes
                for s in st._bucket_segments(b, seg2)]

        def once():
            acc = jnp.float32(0.0)
            for st_, cbc, s in segs:
                acc = acc + seg_e(st_, cbc, unroll, limbs, psi_dev, *s)
            return float(acc)

        v = once()                       # compile + warm
        t0 = time.time()
        for _ in range(reps):
            v = once()
        dt = (time.time() - t0) / reps
        print(json.dumps({"variant": tag,
                          "ms_per_group": round(1e3 * dt / gham.n_groups,
                                                4),
                          "s_per_pass": round(dt, 4), "value": v}),
              flush=True)
        return v

    # measured 2026-08-17: unroll 2x SLOWER (0.717 vs 0.359 ms/group);
    # C=16 exceeds the 16 MB scoped-VMEM limit by 888K — both dropped
    v0 = run("base C8 x3", 3, False, 3)
    v2 = run("C8 x2limb", 3, False, 2)
    print(json.dumps({"bf16x2_abs_err": abs(v2 - v0)}), flush=True)

    # HOISTED kernel: one sublane perm per distinct x_mid + one lane perm
    # per distinct x_lane per chunk pair (library default for Hermitian H)
    def run_hoisted(tag, cb, limbs, caps=8, reps=3):
        classes = st.build_ham_buckets_split(gham, stage_split=True,
                                             chunk_bits=cb)
        segs = []
        for st_, cbc, b in classes:
            if st_:
                hargs = st.hoist_bucket_args(b, um_cap=caps, ul_cap=caps)
                segs += [("hoist", st_, cbc,
                          tuple(jnp.asarray(a) for a in s))
                         for s in st._bucket_segments(hargs, seg2)]
            else:
                segs += [("plain", st_, cbc,
                          tuple(jnp.asarray(a) for a in s))
                         for s in st._bucket_segments(b, seg2)]

        @partial(jax.jit, static_argnums=(0, 1, 2))
        def seg_h(stages, cbc, limbs, psi, *args):
            psi4 = psi.reshape(2, psi.shape[-1] >> st.TILE_BITS, 128, 128)
            return st.expectation_hoisted4(psi4, args, chunk_bits=cbc,
                                           stages=stages, limbs=limbs,
                                           real=ham_real)

        def once():
            acc = jnp.float32(0.0)
            for kind, st_, cbc, s in segs:
                if kind == "hoist":
                    acc = acc + seg_h(st_, cbc, limbs, psi_dev, *s)
                else:
                    acc = acc + seg_e(st_, cbc, False, limbs, psi_dev, *s)
            return float(acc)

        v = once()
        t0 = time.time()
        for _ in range(reps):
            v = once()
        dt = (time.time() - t0) / reps
        print(json.dumps({"variant": tag,
                          "ms_per_group": round(1e3 * dt / gham.n_groups,
                                                4),
                          "s_per_pass": round(dt, 4), "value": v}),
              flush=True)
        return v

    # measured 2026-08-18 (v5e): plain C4 0.654, HOISTED C4 0.687 —
    # the hoist LOSES (VMEM table writes + dynamic-indexed per-group
    # reads exceed the 1.5x matmul-stage saving); caps=12 tables blow
    # the 16M scoped-VMEM limit.  OVQE_EXP_HOIST stays default-off.
    v4 = run("plain C4 x2limb", 2, False, 2)
    vh = run_hoisted("HOISTED C4 x2limb", 2, 2)
    print(json.dumps({"hoisted_abs_err": abs(vh - v0),
                      "plain_c4": v4}), flush=True)


if __name__ == "__main__":
    main()
