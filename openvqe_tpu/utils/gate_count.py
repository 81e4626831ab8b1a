"""Analytic gate counting for CNOT-staircase Pauli-evolution circuits.

The reference counts gates by string-matching reprs of the emitted myQLM
circuit (common_files/circuit.py:186-205; "_2" -> RX, "_4" -> RY at
adapt/fermionic_adapt_vqe.py:581-583).  This framework never emits circuits
— the engine applies exp(i theta w sigma) directly — so the counts are
computed analytically from the same staircase construction the reference's
``build_ucc_ansatz`` uses:

for each Pauli string of weight w (> 0):
    CNOT: 2*(w-1)        (up and down the parity ladder)
    H:    2 * (#X)       (X-basis change, both sides)
    RX:   2 * (#Y)       (Y-basis change RX(+-pi/2), both sides)
    RZ:   1              (the rotation itself)
plus one X gate per occupied orbital of the HF initializer.
"""

from __future__ import annotations

from typing import Dict, Iterable, Sequence

from ..ops.pauli import PauliSum, _popcount


def staircase_gate_counts(ops: Sequence[PauliSum],
                          hf_init: int = 0) -> Dict[str, int]:
    counts = {"CNOT": 0, "H": 0, "RX": 0, "RY": 0, "RZ": 0, "X": 0}
    counts["X"] = _popcount(hf_init)
    for op in ops:
        for (x, z), c in op:
            if abs(c) == 0.0:
                continue
            n_y = _popcount(x & z)
            n_x = _popcount(x & ~z)
            w = _popcount(x | z)
            if w == 0:
                continue
            counts["CNOT"] += 2 * (w - 1)
            counts["H"] += 2 * n_x
            counts["RX"] += 2 * n_y
            counts["RZ"] += 1
    return counts


def yordanov_gate_counts(excitations: Sequence[Sequence[int]],
                         hf_init: int = 0) -> Dict[str, int]:
    """Gate counts of the Yordanov staircase-CNOT efficient circuits
    (reference common_files/circuit.py:13-93): single fermionic evolution
    (fig 2.13) and double fermionic evolution (fig 2.14)."""
    counts = {"CNOT": 0, "H": 0, "RX": 0, "RY": 0, "RZ": 0, "X": 0}
    counts["X"] = _popcount(hf_init)
    for exci in excitations:
        e = sorted(exci)
        if len(e) == 2:
            i, j = e
            counts["CNOT"] += 3 + 2 * max(0, j - i - 2)
            counts["RY"] += 3
            counts["RZ"] += 3
            counts["H"] += 1
        elif len(e) == 4:
            a, b, c, d = e
            counts["CNOT"] += 14 + 2 * max(0, b - a - 2) + 2 * max(0, d - c - 2)
            counts["RY"] += 8
            counts["H"] += 6
        else:
            raise ValueError(f"excitation of length {len(exci)} unsupported")
    return counts


def count(gate: str, ops: Sequence[PauliSum], hf_init: int = 0) -> int:
    """Reference-compatible single-gate counter (circuit.py:186-205);
    accepts the "_2"/"_4" aliases used at fermionic_adapt_vqe.py:581-583."""
    alias = {"_2": "RX", "_4": "RY"}
    return staircase_gate_counts(ops, hf_init).get(alias.get(gate, gate), 0)
