"""Molecule definition table.

Same symbols, geometries (Angstrom), charges, spins, and basis sets as the
reference's hard-coded table (molecule_factory.py:39-304), re-expressed as a
declarative dict.  The sparse-factory variant's deltas
(molecule_factory_with_sparse.py: H6 at r=1.5, extra HD+) are exposed via
``variant="sparse"``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np


@dataclass(frozen=True)
class MoleculeSpec:
    r: float
    geometry: List[Tuple[str, Tuple[float, float, float]]]
    charge: int
    spin: int
    basis: str


def _chain(symbol: str, n: int, r: float) -> List[Tuple[str, Tuple[float, float, float]]]:
    return [(symbol, (0.0, 0.0, k * r)) for k in range(n)]


def _build_table() -> Dict[str, MoleculeSpec]:
    t: Dict[str, MoleculeSpec] = {}
    t["LIH"] = MoleculeSpec(1.45, [("Li", (0, 0, 0)), ("H", (0, 0, 1.45))], 0, 0, "sto-3g")
    t["H2"] = MoleculeSpec(0.75, _chain("H", 2, 0.75), 0, 0, "6-31g")
    t["H4"] = MoleculeSpec(0.85, _chain("H", 4, 0.85), 0, 0, "sto-3g")
    t["H6"] = MoleculeSpec(1.0, _chain("H", 6, 1.0), 0, 0, "sto-3g")
    t["H8"] = MoleculeSpec(1.0, _chain("H", 8, 1.0), 0, 0, "sto-3g")
    t["H10"] = MoleculeSpec(1.0, _chain("H", 10, 1.0), 0, 0, "sto-3g")
    t["BeH2"] = MoleculeSpec(1.4, [("Be", (0, 0, 0)), ("H", (0, 0, 1.4)),
                                   ("H", (0, 0, -1.4))], 0, 0, "sto-3g")
    t["HeH+"] = MoleculeSpec(1.0, [("He", (0, 0, 0)), ("H", (0, 0, 1.0))], 1, 0, "6-31g")
    t["HF"] = MoleculeSpec(1.0, [("F", (0, 0, 0)), ("H", (0, 0, 1.0))], 0, 0, "sto-3g")
    t["HO"] = MoleculeSpec(1.8, [("H", (0, 0, 0)), ("O", (0, 0, 1.8))], -1, 0, "sto-3g")

    r = 1.0285
    theta = 0.538 * np.pi
    t["H2O"] = MoleculeSpec(r, [
        ("O", (0, 0, 0)),
        ("H", (0, 0, r)),
        ("H", (0, r * np.sin(np.pi - theta), r * np.cos(np.pi - theta))),
    ], 0, 0, "sto-3g")

    r = 1.0703
    th = (100.107 / 180) * np.pi
    zc = np.sqrt(1 - 4 * np.sin(th / 2) ** 2 / 3) * r
    t["NH3"] = MoleculeSpec(r, [
        ("N", (0, 0, 0)),
        ("H", (0, 2 * (np.sin(th / 2) / np.sqrt(3)) * r, zc)),
        ("H", (np.sin(th / 2) * r, -np.sin(th / 2) / np.sqrt(3) * r, zc)),
        ("H", (-np.sin(th / 2) * r, -np.sin(th / 2) / np.sqrt(3) * r, zc)),
    ], 0, 0, "sto-3g")

    t["CO2"] = MoleculeSpec(1.22, [
        ("C", (0.0, 0.0, 8.261342997000753e-07)),
        ("O", (1.0990287608769004e-18, 2.7114450405987004e-19, 1.2236575813458745)),
        ("O", (2.696319376811295e-22, 2.4247676462727696e-23, -1.2236561920609494)),
    ], 0, 0, "sto-3g")
    t["SO2"] = MoleculeSpec(1.0, [("S", (0, 0, 0)), ("O", (0, 1.2371, 0.7215)),
                                  ("O", (0, -1.2371, 0.7215))], 0, 0, "sto-3g")
    t["Cl2"] = MoleculeSpec(1.0, [("Cl", (0, 0, 0)), ("Cl", (0, 0, 1.9879))], 0, 0, "sto-3g")
    t["S2"] = MoleculeSpec(1.0, [("S", (0, 0, 0)), ("S", (0, 0, 1.8892))], 0, 0, "sto-3g")
    t["C2H2"] = MoleculeSpec(1.0, [("C", (0, 0, 0.6063)), ("C", (0, 0, -0.6063)),
                                   ("H", (0, 0, 1.6941)), ("H", (0, 0, -1.6941))],
                             0, 0, "sto-3g")
    t["CO"] = MoleculeSpec(1.0, [("C", (0, 0, 0)), ("O", (0, 0, 1.1282))], 0, 0, "sto-3g")
    t["N2"] = MoleculeSpec(1.0, [("N", (0, 0, 0.5488)), ("N", (0, 0, -0.5488))],
                           0, 0, "sto-3g")
    t["F2"] = MoleculeSpec(1.0, [("F", (0, 0, 0)), ("F", (0, 0, 1.4119))], 0, 0, "sto-3g")
    t["CH4"] = MoleculeSpec(1.0, [("C", (0, 0, 0)),
                                  ("H", (0.6276, 0.6276, 0.6276)),
                                  ("H", (0.6276, -0.6276, -0.6276)),
                                  ("H", (-0.6276, 0.6276, -0.6276)),
                                  ("H", (-0.6276, -0.6276, 0.6276))], 0, 0, "sto-3g")
    t["C2H4"] = MoleculeSpec(1.0, [("C", (0, 0, 0.6695)), ("C", (0, 0, -0.6695)),
                                   ("H", (0, 0.9289, 1.2321)), ("H", (0, -0.9289, 1.2321)),
                                   ("H", (0, 0.9289, -1.2321)), ("H", (0, -0.9289, -1.2321))],
                             0, 0, "sto-3g")
    t["CHN"] = MoleculeSpec(1.0, [("C", (0, 0, 0)), ("H", (0, 0, 1.0640)),
                                  ("N", (0, 0, -1.1560))], 0, 0, "sto-3g")
    t["O2"] = MoleculeSpec(1.0, [("O", (0, 0, 0)), ("O", (0, 0, 1.2075))], 0, 0, "sto-3g")
    t["NO"] = MoleculeSpec(1.0, [("N", (0, 0, 0)), ("O", (0, 0, 1.1508))], 1, 0, "sto-3g")
    return t


_TABLE = _build_table()


def _sparse_table() -> Dict[str, MoleculeSpec]:
    t = dict(_TABLE)
    # deltas of the sparse-factory variant (molecule_factory_with_sparse.py:83-88)
    t["H6"] = MoleculeSpec(1.5, _chain("H", 6, 1.5), 0, 0, "sto-3g")
    t["HD+"] = MoleculeSpec(1.0, _chain("H", 2, 1.0), 1, 0, "6-31g")
    return t


_SPARSE_TABLE = _sparse_table()


def get_molecule(symbol: str, variant: str = "dense") -> MoleculeSpec:
    table = _SPARSE_TABLE if variant == "sparse" else _TABLE
    if symbol not in table:
        raise KeyError(f"unknown molecule {symbol!r}; known: {sorted(table)}")
    return table[symbol]


def available_molecules(variant: str = "dense"):
    return sorted((_SPARSE_TABLE if variant == "sparse" else _TABLE).keys())
